"""t_digest_spark — a PySpark-native distributed t-digest quantile-sketch library.

Built from scratch against the behavioral contract of PavelVesely/t-digest
(the KDD'21 research fork of tdunning/t-digest). The kernel is NumPy
(vectorized centroid-array MergingDigest strategy); the distribution layer is
idiomatic PySpark: Arrow-batched ``mapInPandas`` partial aggregation +
``applyInPandas`` merge of serialized digests — never per-row Python.

Layout:
  core.py                the digest kernel (sort+sweep merge, quantile/cdf/trimmed_mean)
  scales.py              scale functions K_0..K_3 (vectorized)
  serde.py               byte codecs (verbose codec wire-compatible with the
                         reference's MergingDigest.asBytes) + Spark row adapters
  operators/aggregation  partial+final mergeable aggregation over DataFrames
  operators/dedup        exact & approximate dedup (minhash-LSH, simhash, jaccard)
  operators/similarity   embedding similarity search (brute-force + LSH-bucketed)
  operators/text         language-id, quality scoring, token counts, fingerprints
  operators/multimodal   binary-column plumbing (decode stubbed; schema real)
  operators/histogram    fixed-bin mergeable histograms (log/linear)
  operators/checkpoint   resumable parquet digest checkpoints with lineage
  sketches/              KLL + REQ quantile sketches, count-min, Bloom, HLL wrappers
  streaming/             applyInPandasWithState digest accumulation + windows
  sources/               deterministic synthetic source-code table + parquet readers
  functions/             scalar query UDFs + comparison stats + SQL registration
  plans/                 SparkSession builders with scale-oriented confs
"""

from t_digest_spark.core import TDigest, Dist
from t_digest_spark.scales import SCALES
from t_digest_spark.sketches import BloomFilter, CountMinSketch, KllSketch
from t_digest_spark.sketches.req import ReqSketch

__all__ = ["TDigest", "Dist", "SCALES", "KllSketch", "ReqSketch",
           "CountMinSketch", "BloomFilter"]
__version__ = "0.1.0"
