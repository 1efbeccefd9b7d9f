import com.tdunning.math.stats.AVLTreeDigest;
import com.tdunning.math.stats.Centroid;
import com.tdunning.math.stats.MergingDigest;
import com.tdunning.math.stats.TDigest;
import com.tdunning.math.stats.datasketches.kll.KllDoublesSketch;
import com.tdunning.math.stats.datasketches.req.ReqSketch;
import com.tdunning.math.stats.datasketches.req.ReqSketchBuilder;
import org.apache.datasketches.memory.Memory;

import java.io.IOException;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.Locale;

/**
 * Cross-validation harness: drives the reference t-digest implementation
 * (compiled in place from /root/reference, never copied) so the Python port's
 * wire codecs and query behavior can be checked against the real thing.
 *
 * Commands (all file paths; doubles files are raw little-endian float64):
 *   merging-build <compression> <in.doubles> <out.bin> <out_small.bin> <out.json> [cdf.doubles]
 *   merging-read  <in.bin> <out.json> [cdf.doubles]
 *   avl-build     <compression> <in.doubles> <out.bin> <out_small.bin> <out.json> [cdf.doubles]
 *   avl-read      <in.bin> <out.json> [cdf.doubles]
 *   kll-build     <k> <in.doubles> <out.bin> <out.json>
 *   kll-read      <in.bin> <out.json>
 *   kll-roundtrip <in.bin> <out.bin>           (heapify then re-serialize)
 *   req-build     <k> <hra:0|1> <in.doubles> <out.bin> <out.json>
 *   req-read      <in.bin> <out.json>
 *   req-roundtrip <in.bin> <out.bin>
 */
public final class Harness {
    private static final double[] Q_GRID = {
        0.0001, 0.001, 0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 0.9999
    };

    public static void main(String[] args) throws Exception {
        switch (args[0]) {
            case "merging-build": {
                MergingDigest d = new MergingDigest(Double.parseDouble(args[1]));
                for (double v : readDoubles(args[2])) {
                    d.add(v);
                }
                d.compress();
                ByteBuffer buf = ByteBuffer.allocate(d.byteSize());
                d.asBytes(buf);
                Files.write(Paths.get(args[3]), sliceToArray(buf));
                ByteBuffer sbuf = ByteBuffer.allocate(d.smallByteSize());
                d.asSmallBytes(sbuf);
                Files.write(Paths.get(args[4]), sliceToArray(sbuf));
                writeSummary(d, args[5], args.length > 6 ? args[6] : null);
                break;
            }
            case "merging-read": {
                MergingDigest d = MergingDigest.fromBytes(
                        ByteBuffer.wrap(Files.readAllBytes(Paths.get(args[1]))));
                writeSummary(d, args[2], args.length > 3 ? args[3] : null);
                break;
            }
            case "avl-build": {
                AVLTreeDigest d = new AVLTreeDigest(Double.parseDouble(args[1]));
                for (double v : readDoubles(args[2])) {
                    d.add(v);
                }
                d.compress();
                ByteBuffer buf = ByteBuffer.allocate(d.byteSize());
                d.asBytes(buf);
                Files.write(Paths.get(args[3]), sliceToArray(buf));
                ByteBuffer sbuf = ByteBuffer.allocate(d.smallByteSize());
                d.asSmallBytes(sbuf);
                Files.write(Paths.get(args[4]), sliceToArray(sbuf));
                writeSummary(d, args[5], args.length > 6 ? args[6] : null);
                break;
            }
            case "avl-read": {
                AVLTreeDigest d = AVLTreeDigest.fromBytes(
                        ByteBuffer.wrap(Files.readAllBytes(Paths.get(args[1]))));
                writeSummary(d, args[2], args.length > 3 ? args[3] : null);
                break;
            }
            case "kll-build": {
                KllDoublesSketch sk = new KllDoublesSketch(Integer.parseInt(args[1]));
                for (double v : readDoubles(args[2])) {
                    sk.update(v);
                }
                Files.write(Paths.get(args[3]), sk.toByteArray());
                writeKllSummary(sk, args[4]);
                break;
            }
            case "kll-read": {
                KllDoublesSketch sk = KllDoublesSketch.heapify(
                        Memory.wrap(Files.readAllBytes(Paths.get(args[1]))));
                writeKllSummary(sk, args[2]);
                break;
            }
            case "kll-roundtrip": {
                KllDoublesSketch sk = KllDoublesSketch.heapify(
                        Memory.wrap(Files.readAllBytes(Paths.get(args[1]))));
                Files.write(Paths.get(args[2]), sk.toByteArray());
                break;
            }
            case "req-build": {
                ReqSketchBuilder b = ReqSketch.builder()
                        .setK(Integer.parseInt(args[1]))
                        .setHighRankAccuracy("1".equals(args[2]));
                ReqSketch sk = b.build();
                for (double v : readDoubles(args[3])) {
                    sk.update(v);
                }
                Files.write(Paths.get(args[4]), sk.toByteArray());
                writeReqSummary(sk, args[5]);
                break;
            }
            case "req-read": {
                ReqSketch sk = ReqSketch.heapify(
                        Memory.wrap(Files.readAllBytes(Paths.get(args[1]))));
                writeReqSummary(sk, args[2]);
                break;
            }
            case "req-roundtrip": {
                ReqSketch sk = ReqSketch.heapify(
                        Memory.wrap(Files.readAllBytes(Paths.get(args[1]))));
                Files.write(Paths.get(args[2]), sk.toByteArray());
                break;
            }
            case "merging-merge": {
                // args: compression outPrefix in1.doubles [in2.doubles ...]
                // Builds one digest per input file, dumps every part state
                // (<prefix>_partI.bin), then merges them all with the
                // reference's bulk path (MergingDigest.add(List)) ->
                // <prefix>_result.bin / .json. N parts = the MegaMerge shape.
                double compression = Double.parseDouble(args[1]);
                String prefix = args[2];
                java.util.List<TDigest> parts = new java.util.ArrayList<>();
                for (int a = 3; a < args.length; a++) {
                    MergingDigest d = new MergingDigest(compression);
                    for (double v : readDoubles(args[a])) {
                        d.add(v);
                    }
                    d.compress();
                    ByteBuffer pb = ByteBuffer.allocate(d.byteSize());
                    d.asBytes(pb);
                    Files.write(Paths.get(prefix + "_part" + (a - 3) + ".bin"),
                            sliceToArray(pb));
                    parts.add(d);
                }
                MergingDigest merged = new MergingDigest(compression);
                merged.add(parts);
                merged.compress();
                ByteBuffer bm = ByteBuffer.allocate(merged.byteSize());
                merged.asBytes(bm);
                Files.write(Paths.get(prefix + "_result.bin"), sliceToArray(bm));
                writeSummary(merged, prefix + "_result.json", null);
                break;
            }
            case "avl-merge": {
                // args: compression outPrefix in1.doubles [in2.doubles ...]
                // Per-part AVL digests dumped, then merged with the
                // reference's add(List) re-clustering path.
                double c = Double.parseDouble(args[1]);
                String pfx = args[2];
                java.util.List<TDigest> ps = new java.util.ArrayList<>();
                for (int a = 3; a < args.length; a++) {
                    AVLTreeDigest d = new AVLTreeDigest(c);
                    for (double v : readDoubles(args[a])) {
                        d.add(v);
                    }
                    d.compress();
                    ByteBuffer pb = ByteBuffer.allocate(d.byteSize());
                    d.asBytes(pb);
                    Files.write(Paths.get(pfx + "_part" + (a - 3) + ".bin"),
                            sliceToArray(pb));
                    ps.add(d);
                }
                AVLTreeDigest merged = new AVLTreeDigest(c);
                merged.add(ps);
                merged.compress();
                writeSummary(merged, pfx + "_result.json", null);
                break;
            }
            case "fhisto-build": {
                // args: min max binsPerDecade in.doubles out.oos out.json
                com.tdunning.math.stats.FloatHistogram h =
                        new com.tdunning.math.stats.FloatHistogram(
                                Double.parseDouble(args[1]),
                                Double.parseDouble(args[2]),
                                Double.parseDouble(args[3]));
                for (double v : readDoubles(args[4])) {
                    h.add(v);
                }
                java.io.ByteArrayOutputStream bos = new java.io.ByteArrayOutputStream();
                java.io.ObjectOutputStream oos = new java.io.ObjectOutputStream(bos);
                h.writeObject(oos);
                oos.flush();
                Files.write(Paths.get(args[5]), bos.toByteArray());
                long[] counts = h.getCounts();
                StringBuilder sb = new StringBuilder("{\"counts\":[");
                for (int i = 0; i < counts.length; i++) {
                    if (i > 0) {
                        sb.append(',');
                    }
                    sb.append(counts[i]);
                }
                sb.append("]}");
                Files.write(Paths.get(args[6]), sb.toString().getBytes("UTF-8"));
                break;
            }
            case "s64-compress": {
                // in: raw LE longs (uncompressed); out: compressed words as LE longs
                double[] dIn = readDoubles(args[1]);   // reuse LE reader bitwise
                long[] vals = new long[dIn.length];
                for (int i = 0; i < dIn.length; i++) {
                    vals[i] = Double.doubleToRawLongBits(dIn[i]);
                }
                java.nio.LongBuffer lb = java.nio.LongBuffer.allocate(vals.length + 1);
                com.tdunning.math.stats.Simple64.compress(lb, vals, 0, vals.length);
                ByteBuffer ob = ByteBuffer.allocate(8 * lb.position())
                        .order(ByteOrder.LITTLE_ENDIAN);
                int nWords = lb.position();
                lb.flip();
                for (int i = 0; i < nWords; i++) {
                    ob.putLong(lb.get());
                }
                Files.write(Paths.get(args[2]), ob.array());
                break;
            }
            case "s64-decompress": {
                // in: compressed LE longs + expected count; out: LE longs
                byte[] raw = Files.readAllBytes(Paths.get(args[1]));
                int n = Integer.parseInt(args[2]);
                java.nio.LongBuffer lb = java.nio.LongBuffer.allocate(raw.length / 8);
                ByteBuffer ib = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN);
                while (ib.remaining() >= 8) {
                    lb.put(ib.getLong());
                }
                long[] vals = new long[n];
                com.tdunning.math.stats.Simple64.decompress(lb, vals);
                ByteBuffer ob = ByteBuffer.allocate(8 * n).order(ByteOrder.LITTLE_ENDIAN);
                for (long v : vals) {
                    ob.putLong(v);
                }
                Files.write(Paths.get(args[3]), ob.array());
                break;
            }
            case "compare": {
                // Comparison/Dist behavioral vectors: two digests built from
                // the two input files, then chi2/ks between them plus the
                // exact Dist oracle on the first dataset.
                double[] in1 = readDoubles(args[1]);
                double[] in2 = readDoubles(args[2]);
                MergingDigest d1 = new MergingDigest(100);
                MergingDigest d2 = new MergingDigest(100);
                for (double v : in1) {
                    d1.add(v);
                }
                for (double v : in2) {
                    d2.add(v);
                }
                d1.compress();
                d2.compress();
                // digest states out, so Python can run ITS comparison
                // functions on the identical centroid sets
                ByteBuffer b1 = ByteBuffer.allocate(d1.byteSize());
                d1.asBytes(b1);
                Files.write(Paths.get(args[3] + ".d1.bin"), sliceToArray(b1));
                ByteBuffer b2 = ByteBuffer.allocate(d2.byteSize());
                d2.asBytes(b2);
                Files.write(Paths.get(args[3] + ".d2.bin"), sliceToArray(b2));
                // Dist indexes the array AS GIVEN (caller sorts; the
                // reference tests Arrays.sort first)
                double[] sorted1 = in1.clone();
                java.util.Arrays.sort(sorted1);
                double[] qCuts = {0.1, 0.25, 0.5, 0.75, 0.9};
                StringBuilder sb = new StringBuilder();
                sb.append("{\"chi2\":").append(fmt(
                        com.tdunning.math.stats.Comparison.compareChi2(d1, d2, qCuts)));
                sb.append(",\"ks\":").append(fmt(
                        com.tdunning.math.stats.Comparison.ks(d1, d2)));
                sb.append(",\"llr_2x2\":").append(fmt(
                        com.tdunning.math.stats.Comparison.llr(
                                new double[][]{{110, 20}, {60, 45}})));
                sb.append(",\"dist_cdf\":{");
                boolean first = true;
                for (double x : new double[]{in1[0], in1[7], in1[42], 0.0, 1e9}) {
                    if (!first) {
                        sb.append(',');
                    }
                    first = false;
                    sb.append('"').append(x).append("\":").append(fmt(
                            com.tdunning.math.stats.Dist.cdf(x, sorted1)));
                }
                sb.append("},\"dist_quantile\":{");
                first = true;
                for (double q : Q_GRID) {
                    if (!first) {
                        sb.append(',');
                    }
                    first = false;
                    sb.append('"').append(q).append("\":").append(fmt(
                            com.tdunning.math.stats.Dist.quantile(q, sorted1)));
                }
                sb.append("}}");
                Files.write(Paths.get(args[3]), sb.toString().getBytes("UTF-8"));
                break;
            }
            case "scales": {
                // Behavioral parity surface for SURVEY.md §2.2: every scale
                // function's k/q/max over a (q, delta, n) grid.
                double[] qs = {0.0, 1e-6, 1e-4, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.9999, 1.0 - 1e-6, 1.0};
                double[] ks = {-10.0, -1.0, 0.0, 0.5, 1.0, 5.0, 20.0, 50.0};
                double[][] dn = {{100, 1000}, {100, 1_000_000}, {200, 50_000}, {20, 500}};
                StringBuilder sb = new StringBuilder("{");
                boolean firstFn = true;
                for (com.tdunning.math.stats.ScaleFunction fn
                        : com.tdunning.math.stats.ScaleFunction.values()) {
                    if (!firstFn) {
                        sb.append(',');
                    }
                    firstFn = false;
                    sb.append('"').append(fn.name()).append("\":[");
                    boolean firstCfg = true;
                    for (double[] cfg : dn) {
                        if (!firstCfg) {
                            sb.append(',');
                        }
                        firstCfg = false;
                        double norm = fn.normalizer(cfg[0], cfg[1]);
                        sb.append("{\"delta\":").append(fmt(cfg[0]))
                          .append(",\"n\":").append(fmt(cfg[1]))
                          .append(",\"normalizer\":").append(fmt(norm))
                          .append(",\"k\":[");
                        for (int i = 0; i < qs.length; i++) {
                            if (i > 0) {
                                sb.append(',');
                            }
                            sb.append(fmt(fn.k(qs[i], norm)));
                        }
                        sb.append("],\"q\":[");
                        for (int i = 0; i < ks.length; i++) {
                            if (i > 0) {
                                sb.append(',');
                            }
                            sb.append(fmt(fn.q(ks[i], norm)));
                        }
                        sb.append("],\"max\":[");
                        for (int i = 0; i < qs.length; i++) {
                            if (i > 0) {
                                sb.append(',');
                            }
                            sb.append(fmt(fn.max(qs[i], norm)));
                        }
                        sb.append("]}");
                    }
                    sb.append(']');
                }
                sb.append('}');
                Files.write(Paths.get(args[1]), sb.toString().getBytes("UTF-8"));
                break;
            }
            default:
                throw new IllegalArgumentException("unknown command: " + args[0]);
        }
    }

    private static double[] readDoubles(String path) throws IOException {
        byte[] raw = Files.readAllBytes(Paths.get(path));
        ByteBuffer bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN);
        double[] out = new double[raw.length / 8];
        for (int i = 0; i < out.length; i++) {
            out[i] = bb.getDouble();
        }
        return out;
    }

    private static byte[] sliceToArray(ByteBuffer buf) {
        byte[] out = new byte[buf.position()];
        buf.flip();
        buf.get(out);
        return out;
    }

    private static void writeSummary(TDigest d, String outPath, String cdfPath)
            throws IOException {
        StringBuilder sb = new StringBuilder();
        sb.append("{\"count\":").append(fmt(d.size()));
        sb.append(",\"min\":").append(fmt(d.getMin()));
        sb.append(",\"max\":").append(fmt(d.getMax()));
        sb.append(",\"compression\":").append(fmt(d.compression()));
        sb.append(",\"centroid_count\":").append(d.centroidCount());
        sb.append(",\"quantiles\":{");
        boolean first = true;
        for (double q : Q_GRID) {
            if (!first) {
                sb.append(',');
            }
            first = false;
            sb.append('"').append(q).append("\":").append(fmt(d.quantile(q)));
        }
        sb.append("},\"cdf\":{");
        first = true;
        if (cdfPath != null) {
            for (double x : readDoubles(cdfPath)) {
                if (!first) {
                    sb.append(',');
                }
                first = false;
                sb.append('"').append(x).append("\":").append(fmt(d.cdf(x)));
            }
        }
        sb.append("},\"centroids\":[");
        first = true;
        for (Centroid c : d.centroids()) {
            if (!first) {
                sb.append(',');
            }
            first = false;
            sb.append('[').append(fmt(c.mean())).append(',').append(fmt(c.count())).append(']');
        }
        sb.append("]}");
        Files.write(Paths.get(outPath), sb.toString().getBytes("UTF-8"));
    }

    private static double[] rankProbes(double min, double max) {
        double[] fr = {0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0};
        double[] out = new double[fr.length];
        for (int i = 0; i < fr.length; i++) {
            out[i] = min + fr[i] * (max - min);
        }
        return out;
    }

    private static void writeKllSummary(KllDoublesSketch sk, String outPath) throws IOException {
        StringBuilder sb = new StringBuilder();
        sb.append("{\"n\":").append(sk.getN());
        sb.append(",\"k\":").append(sk.getK());
        sb.append(",\"num_retained\":").append(sk.getNumRetained());
        sb.append(",\"min\":").append(fmt(sk.getMinValue()));
        sb.append(",\"max\":").append(fmt(sk.getMaxValue()));
        sb.append(",\"quantiles\":{");
        boolean first = true;
        for (double q : Q_GRID) {
            if (!first) {
                sb.append(',');
            }
            first = false;
            sb.append('"').append(q).append("\":").append(fmt(sk.getQuantile(q)));
        }
        sb.append("},\"ranks\":{");
        first = true;
        for (double x : rankProbes(sk.getMinValue(), sk.getMaxValue())) {
            if (!first) {
                sb.append(',');
            }
            first = false;
            sb.append('"').append(x).append("\":").append(fmt(sk.getRank(x)));
        }
        sb.append("}}");
        Files.write(Paths.get(outPath), sb.toString().getBytes("UTF-8"));
    }

    private static void writeReqSummary(ReqSketch sk, String outPath) throws IOException {
        StringBuilder sb = new StringBuilder();
        sb.append("{\"n\":").append(sk.getN());
        sb.append(",\"k\":").append(sk.getK());
        sb.append(",\"num_retained\":").append(sk.getRetainedItems());
        sb.append(",\"min\":").append(fmt(sk.getMinValue()));
        sb.append(",\"max\":").append(fmt(sk.getMaxValue()));
        sb.append(",\"hra\":").append(sk.getHighRankAccuracy());
        sb.append(",\"quantiles\":{");
        boolean first = true;
        for (double q : Q_GRID) {
            if (!first) {
                sb.append(',');
            }
            first = false;
            sb.append('"').append(q).append("\":").append(fmt(sk.getQuantile(q)));
        }
        sb.append("},\"ranks\":{");
        first = true;
        for (double x : rankProbes(sk.getMinValue(), sk.getMaxValue())) {
            if (!first) {
                sb.append(',');
            }
            first = false;
            sb.append('"').append(x).append("\":").append(fmt(sk.getRank(x)));
        }
        sb.append("}}");
        Files.write(Paths.get(outPath), sb.toString().getBytes("UTF-8"));
    }

    private static String fmt(double v) {
        if (Double.isNaN(v)) {
            return "\"nan\"";
        }
        if (Double.isInfinite(v)) {
            return v > 0 ? "\"inf\"" : "\"-inf\"";
        }
        return String.format(Locale.ROOT, "%.17g", v);
    }
}
