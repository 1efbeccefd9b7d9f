"""Pipeline operators (dedup / similarity / text / multimodal): direct tests
with constructed inputs and Python oracles — the planted-duplicate recall
checks the entry queries can't express."""

import hashlib
import itertools

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.operators.dedup import (char_shingles, dedup_exact,
                                            minhash_lsh_candidates,
                                            ngram_jaccard_pairs, simhash,
                                            simhash_near_dups)
from t_digest_spark.operators.multimodal import (decode_stub, extract_features,
                                                 frame_sample, synthetic_media)
from t_digest_spark.operators.similarity import (brute_force_topk, lsh_topk,
                                                 with_norm)
from t_digest_spark.operators.text import (fingerprint, lang_id, quality_score,
                                           token_count)


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("pipeline-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


# --------------------------------------------------------------------- dedup

def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))


def test_dedup_exact_classes(spark):
    texts = ["alpha beta", "alpha beta", "gamma", "alpha beta", "delta"]
    out = {r.doc_id: r for r in dedup_exact(_docs(spark, texts)).collect()}
    assert set(out) == {0, 2, 4}           # lowest id survives per class
    assert out[0].dup_count == 3
    assert out[2].dup_count == 1
    sha = hashlib.sha256(b"alpha beta").hexdigest()
    assert out[0].content_sha == sha


def test_ngram_jaccard_exact_value(spark):
    a = "abcdefgh"
    b = "abcdefxy"
    df = _docs(spark, [a, b])
    rows = ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
    # python oracle on distinct character trigrams
    sa = {a[i:i + 3] for i in range(len(a) - 2)}
    sb = {b[i:i + 3] for i in range(len(b) - 2)}
    want = len(sa & sb) / len(sa | sb)
    assert len(rows) == 1
    assert rows[0].jaccard == pytest.approx(want)


def _near_dup_corpus(rng, n_base=40, n_pairs=10):
    """Base docs of random words; for n_pairs of them add a copy with one
    word changed (high Jaccard near-dup)."""
    words = [f"w{i:03d}" for i in range(300)]
    texts = []
    for i in range(n_base):
        texts.append(" ".join(rng.choice(words, 60)))
    for i in range(n_pairs):
        toks = texts[i].split()
        toks[7] = "CHANGED"
        texts.append(" ".join(toks))
    truth = {(i, n_base + i) for i in range(n_pairs)}
    return texts, truth


def test_minhash_lsh_recall(spark):
    rng = np.random.default_rng(13)
    texts, truth = _near_dup_corpus(rng)
    cands = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(
        _docs(spark, texts), num_hashes=64, bands=16, n=5).collect()}
    found = truth & cands
    assert len(found) / len(truth) >= 0.9   # banded-LSH recall on ~0.9-Jaccard pairs
    # precision sanity: candidates shouldn't explode to all pairs
    assert len(cands) < 200


def test_simhash_near_dups_planted(spark):
    rng = np.random.default_rng(29)
    texts, truth = _near_dup_corpus(rng)
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dups(
        _docs(spark, texts), max_hamming=6).collect()}
    hit = sum(1 for t in truth if t in pairs)
    assert hit / len(truth) >= 0.9
    assert all(h <= 6 for h in pairs.values())


def test_simhash_identical_is_zero(spark):
    s = simhash(_docs(spark, ["same text here", "same text here"]))
    vals = [r.simhash for r in s.collect()]
    assert vals[0] == vals[1]


# ---------------------------------------------------------------- similarity

def _emb(spark, vecs):
    return spark.createDataFrame(pd.DataFrame({
        "vec_id": range(len(vecs)),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs]}))


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 16))
    df = _emb(spark, vecs)
    out = brute_force_topk(df, df.where(F.col("vec_id") < 5), k=3)
    got = {(r.query_id, r.rank): r.corpus_id for r in out.collect()}
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for qi in range(5):
        order = sorted((j for j in range(30) if j != qi),
                       key=lambda j: (-sims[qi, j], j))
        for rank, j in enumerate(order[:3], start=1):
            assert got[(qi, rank)] == j, (qi, rank)


def test_brute_force_topk_survives_zero_vector(spark):
    """A zero-norm embedding (real corpora contain them) must not kill the
    job with ANSI DIVIDE_BY_ZERO; the shared cosine guard maps it to
    -Infinity so it ranks last both as corpus row and as query."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((10, 8))
    vecs[3] = 0.0                       # zero corpus/query vector
    df = _emb(spark, vecs)
    out = brute_force_topk(df, df.where(F.col("vec_id").isin(0, 3)), k=3)
    rows = out.collect()
    # corpus row 3 never appears in another query's top-3 (9 candidates,
    # 3 slots, -inf ranks last); query 3's results exist with cosine=-inf
    assert all(r.corpus_id != 3 for r in rows if r.query_id == 0)
    q3 = [r for r in rows if r.query_id == 3]
    assert len(q3) == 3 and all(r.cosine == float("-inf") for r in q3)


def test_lsh_topk_recall_vs_brute_force(spark):
    """Planted-cluster corpus (true neighbors at cosine ~0.95): multi-table
    sign-LSH must recover most brute-force top-k pairs. Purely random
    gaussian data has no meaningful neighbors (best cosine ~0.4 at n=200,
    d=64) and single-table recall is (1-theta/pi)^planes ~ 0.04 — which is
    why both the operator default and this test use several tables."""
    rng = np.random.default_rng(8)
    centers = rng.standard_normal((40, 64))
    vecs = np.vstack([c + 0.18 * rng.standard_normal((5, 64)) for c in centers])
    df = _emb(spark, vecs)
    exact = {(r.query_id, r.corpus_id)
             for r in brute_force_topk(df, df, k=4).collect()}
    approx = {(r.query_id, r.corpus_id)
              for r in lsh_topk(df, k=4, dim=64, n_planes=8, n_tables=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.8, recall


# ----------------------------------------------------------------------- text

def test_token_count_oracle(spark):
    t = "hello world, this is a test!"
    row = token_count(_docs(spark, [t])).collect()[0]
    assert row.ws_tokens == 6
    assert row.n_chars_computed == len(t)


def test_lang_id_markers(spark):
    rows = lang_id(_docs(spark, [
        "the cat and the dog of a house",
        "el perro y la casa de que hablamos y el gato",
        "der Hund und die Katze ist das Haus",
    ])).collect()
    assert [r.pred_lang for r in sorted(rows, key=lambda r: r.doc_id)] == \
        ["en", "es", "de"]


def test_quality_score_ranges(spark):
    rows = quality_score(_docs(spark, [
        "the quick brown fox jumps over the lazy dog",
        "!!! ??? ### $$$ %%%",
    ])).collect()
    good, bad = sorted(rows, key=lambda r: r.doc_id)
    assert good.stopword_ratio > bad.stopword_ratio
    assert bad.punct_ratio > 0.5 > good.punct_ratio


def test_fingerprint_determinism(spark):
    rows = fingerprint(_docs(spark, ["abc", "abc", "abd"])).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].fp_full == by_id[1].fp_full
    assert by_id[0].fp_full != by_id[2].fp_full
    assert by_id[0].content_sha == hashlib.sha256(b"abc").hexdigest()


# ----------------------------------------------------------------- multimodal

def test_multimodal_plumbing(spark):
    media = synthetic_media(spark.range(0, 50), kind="image")
    feats = extract_features(media, dim=8, fake=True).collect()
    assert len(feats) == 50
    assert all(len(r.feature) == 8 for r in feats)
    # deterministic: same payload -> same feature
    again = extract_features(synthetic_media(spark.range(0, 50), kind="image"),
                             dim=8, fake=True).collect()
    a = {r.media_id: list(r.feature) for r in feats}
    b = {r.media_id: list(r.feature) for r in again}
    assert a == b


def test_frame_sample_counts(spark):
    media = synthetic_media(spark.range(0, 32), kind="video")
    frames = frame_sample(media, every_n=4)
    got = {r.media_id: r.n for r in
           frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for mid in range(32):
        n_frames = 1 + (mid % 16)
        assert got[mid] == (n_frames - 1) // 4 + 1, mid


def test_decode_raises_on_unknown_format():
    with pytest.raises(NotImplementedError, match="builtin decoders"):
        decode_stub(b"bytes", "image")
    with pytest.raises(NotImplementedError, match="no decode path"):
        decode_stub(b"bytes", "video")


def _make_wav(freq=440.0, rate=8000, n=4000, width=2, chans=1) -> bytes:
    import io as _io
    import wave as _wave
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t)
    if width == 2:
        pcm = (x * 32000).astype("<i2")
    else:
        pcm = ((x * 120) + 128).astype(np.uint8)
    if chans == 2:
        pcm = np.repeat(pcm, 2)
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(chans)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _make_bmp(width=8, height=4, top_down=False) -> bytes:
    import struct as _struct
    stride = (width * 3 + 3) & ~3
    img = np.arange(height * width * 3, dtype=np.uint8).reshape(
        height, width, 3)
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for r in order:
        row = img[r, :, ::-1].tobytes()          # RGB -> BGR on disk
        rows.append(row + b"\x00" * (stride - len(row)))
    raster = b"".join(rows)
    h = height if not top_down else -height
    header = (b"BM" + _struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
              + _struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0,
                             len(raster), 2835, 2835, 0, 0))
    return header + raster, img


def test_real_wav_decode_and_features():
    """The stdlib WAV path decodes real PCM audio: a pure sine's FFT-bin
    feature must concentrate its energy in the bin containing the tone."""
    from t_digest_spark.operators.multimodal import (_real_features,
                                                     decode_media)
    wav = _make_wav(freq=440.0, rate=8000, n=4000)
    x, rate = decode_media(wav, "audio")
    assert rate == 8000 and len(x) == 4000
    assert np.max(np.abs(x)) == pytest.approx(32000 / 32768, abs=1e-3)
    vec = _real_features(wav, "audio", dim=16)
    # 440 Hz at rate 8000 over rfft of 4000 pts -> index 220 of 2001,
    # bins of ~125 -> bin 1
    assert int(np.argmax(vec)) == 1
    # stereo + 8-bit variants round-trip too
    x2, _ = decode_media(_make_wav(width=1, chans=2), "audio")
    assert len(x2) == 4000


def test_real_bmp_ppm_decode():
    from t_digest_spark.operators.multimodal import decode_media
    header, img = _make_bmp(width=8, height=4)
    assert np.array_equal(decode_media(header, "image"), img)
    header_td, img_td = _make_bmp(width=5, height=3, top_down=True)
    assert np.array_equal(decode_media(header_td, "image"), img_td)
    ppm = (b"P6\n# c\n5 3\n255\n"
           + np.arange(45, dtype=np.uint8).tobytes())
    assert decode_media(ppm, "image").shape == (3, 5, 3)


def test_extract_features_auto_mode_records_decoder(spark):
    """mode='auto': decodable rows go through the real path, undecodable
    rows fall back to the fake with the decoder column recording which."""
    import pandas as _pd
    wav = _make_wav()
    rows = _pd.DataFrame({
        "media_id": [1, 2], "kind": ["audio", "image"],
        "payload": [wav, b"JPEG-without-PIL"],
        "width": [0, 8], "height": [0, 8],
        "sample_rate": [8000, 0], "n_frames": [1, 1]})
    media = spark.createDataFrame(rows)
    got = {r.media_id: r for r in
           extract_features(media, dim=8, mode="auto").collect()}
    assert got[1].decoder == "real"
    assert got[2].decoder == "fake"
    assert len(got[1].feature) == 8 and len(got[2].feature) == 8


def test_extract_features_auto_mode_survives_corrupt_payloads(spark):
    """mode='auto' must not kill the job on payloads whose decoder raises
    something OTHER than NotImplementedError: an MP3/OGG byte string hits
    the stdlib WAV parser (wave.Error: no RIFF id), a truncated BMP raises
    from np.frombuffer — both fall back per row, recorded as 'fake'."""
    import pandas as _pd
    rows = _pd.DataFrame({
        "media_id": [1, 2, 3],
        "kind": ["audio", "image", "image"],
        # ID3-tagged MP3 prefix; BMP magic then garbage; truncated PPM
        "payload": [b"ID3\x04\x00" + b"\xff" * 64,
                    b"BM" + b"\x00" * 10, b"P6\n5 3\n255\n\x01"],
        "width": [0, 8, 5], "height": [0, 8, 3],
        "sample_rate": [8000, 0, 0], "n_frames": [1, 1, 1]})
    media = spark.createDataFrame(rows)
    got = {r.media_id: r for r in
           extract_features(media, dim=8, mode="auto").collect()}
    assert [got[i].decoder for i in (1, 2, 3)] == ["fake"] * 3
    assert all(len(got[i].feature) == 8 for i in (1, 2, 3))


def test_avl_add_values_rejects_mismatched_weights():
    """zip() truncation guard: misaligned values/weights must raise, not
    silently drop the tail (pre-batch code raised IndexError here)."""
    from t_digest_spark.avl import AVLTreeDigest
    d = AVLTreeDigest(100.0)
    with pytest.raises(ValueError, match="weights length"):
        d.add_values([1.0, 2.0, 3.0], weights=[1.0, 1.0])
    assert d.total == 0.0  # nothing partially added


def test_pil_branch_by_mock(monkeypatch):
    """When PIL is installed, image decode routes through it (covered by
    injecting a stub PIL module)."""
    import sys as _sys
    import types as _types
    from t_digest_spark.operators import multimodal as mm

    class _FakeImg:
        def convert(self, m):
            return np.zeros((2, 2, 3), dtype=np.uint8)

    pil = _types.ModuleType("PIL")
    pil_image = _types.ModuleType("PIL.Image")
    pil_image.open = lambda buf: _FakeImg()
    pil.Image = pil_image
    monkeypatch.setitem(_sys.modules, "PIL", pil)
    monkeypatch.setitem(_sys.modules, "PIL.Image", pil_image)
    out = mm.decode_media(b"anything", "image")
    assert out.shape == (2, 2, 3)


def test_probe_codecs_flags():
    from t_digest_spark.operators.multimodal import probe_codecs
    caps = probe_codecs()
    assert caps["wav_stdlib"] and caps["bmp_builtin"]
    assert set(caps) >= {"pil", "soundfile"}


def test_embedding_near_dups_planted(spark):
    rng = np.random.default_rng(31)
    base = rng.standard_normal((60, 64))
    dups = base[:12] + 0.02 * rng.standard_normal((12, 64))  # cosine ~0.999
    df = _emb(spark, np.vstack([base, dups]))
    from t_digest_spark.operators.similarity import embedding_near_dups
    pairs = {(r.id_a, r.id_b) for r in embedding_near_dups(
        df, threshold=0.95, dim=64, n_planes=8, n_tables=4).collect()}
    truth = {(i, 60 + i) for i in range(12)}
    assert len(truth & pairs) / len(truth) >= 0.9


def test_topk_per_key_matches_window_reference(spark):
    """topk_per_key == the classic window top-k on adversarial shapes: ties
    on the order value, keys confined to one partition (threshold fallback),
    keys with fewer than k rows."""
    import pandas as pd
    from pyspark.sql.window import Window
    from t_digest_spark.operators.topk import topk_per_key

    rng = np.random.default_rng(31)
    n = 5000
    pdf = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "hot"], n, p=[0.05, 0.3, 0.3, 0.35]),
        "id": np.arange(n, dtype=np.int64),
        "v": np.round(rng.uniform(0, 10, n), 1),   # heavy ties at 1 decimal
        "pay": rng.integers(0, 100, n),
    })
    # a key with fewer than k rows and a single-partition key
    extra = pd.DataFrame({"k": ["tiny", "tiny"], "id": [90001, 90002],
                          "v": [99.0, 98.0], "pay": [1, 2]})
    df = spark.createDataFrame(pd.concat([pdf, extra])).repartition(8, "id")

    got = (topk_per_key(df, ["k"], "v", 5, tiebreak_cols=["id"],
                        payload_cols=["pay"])
           .orderBy("k", "rnk").toPandas())
    w = Window.partitionBy("k").orderBy(F.desc("v"), F.asc("id"))
    want = (df.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= 5)
            .select("k", "rnk", "v", "id", "pay")
            .orderBy("k", "rnk").toPandas())
    pd.testing.assert_frame_equal(
        got[["k", "rnk", "v", "id", "pay"]].reset_index(drop=True),
        want.reset_index(drop=True))


def test_simhash_matches_wide_aggregate_formulation(spark):
    """The exploded-bit-vote simhash must emit bit-identical signatures to
    the direct 63-conditional-sum formulation it replaced."""
    from t_digest_spark.operators.dedup import simhash
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where(F.col("doc_id") < 60).select("doc_id", "text"))
    got = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    toks = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("tok")) \
               .where(F.length("tok") > 0)
    h = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = h.groupBy("doc_id").agg(*[
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << b).cast("long")) != 0, 1)
              .otherwise(-1)).alias(f"b{b}") for b in range(63)])
    sig = F.lit(0).cast("long")
    for b in range(63):
        sig = sig + F.when(F.col(f"b{b}") > 0,
                           F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    want = {r.doc_id: r.simhash for r in votes.select("doc_id", sig.alias("simhash")).collect()}
    assert got == want


def test_auto_n_planes_occupancy_scaling():
    """Auto-sized planes keep expected bucket occupancy ~constant: doubling
    the corpus adds a plane instead of doubling occupancy."""
    from t_digest_spark.operators.similarity import auto_n_planes
    assert auto_n_planes(0) == 4
    assert auto_n_planes(60) == 4               # floor
    assert auto_n_planes(16 * (1 << 10)) == 10
    assert auto_n_planes(16 * (1 << 11)) == 11
    assert auto_n_planes(10**12) == 24          # capped
    for n in (10**4, 10**6, 10**8):
        p = auto_n_planes(n)
        assert n / (1 << p) <= 16 * 1.01 or p == 24


def test_lsh_candidate_observation(spark):
    """Candidate-pair accounting: the Observation reports the pair count the
    join actually produced (no silent caps)."""
    from pyspark.sql import Observation
    from t_digest_spark.operators.similarity import lsh_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    obs = Observation("lsh_cands")
    out = lsh_topk(emb, k=3, dim=64, n_planes=6, observation=obs)
    n_results = out.count()
    got = obs.get
    assert got["n_candidate_pairs"] >= n_results
    assert got["n_candidate_pairs"] > 0


def test_cosine_pairs_udf_matches_fold(spark):
    """The vectorized re-rank cosine equals the JVM fold cosine to 1e-12."""
    from t_digest_spark.operators.similarity import (_dot, cosine_pairs_udf,
                                                     with_norm)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .where(F.col("vec_id") < 40)
    a = with_norm(emb).select(F.col("vec_id").alias("ia"),
                              F.col("_vec").alias("va"),
                              F.col("_norm").alias("na"))
    b = with_norm(emb).select(F.col("vec_id").alias("ib"),
                              F.col("_vec").alias("vb"),
                              F.col("_norm").alias("nb"))
    pairs = a.crossJoin(b).where(F.col("ia") < F.col("ib"))
    from t_digest_spark.operators.similarity import cosine_pair_col
    both = pairs.select(
        (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("fold"),
        cosine_pairs_udf()("va", "vb").alias("blas"),
        cosine_pair_col(F.col("va"), F.col("vb"),
                        F.col("na"), F.col("nb")).alias("col_norms"),
        cosine_pair_col(F.col("va"), F.col("vb")).alias("col_inline")).toPandas()
    assert (both["fold"] - both["blas"]).abs().max() < 1e-12
    assert (both["fold"] - both["col_norms"]).abs().max() < 1e-12
    assert (both["fold"] - both["col_inline"]).abs().max() < 1e-12


def test_table_loader_catalog_and_file_modes(spark, monkeypatch):
    """Catalog-first loader: file fallback without a catalog; with
    SPARK_GRAFT_CATALOG set, resolution goes through spark.read.table on the
    qualified name (exercised against a temp-view-backed name since no
    Iceberg jars ship in this sandbox)."""
    from t_digest_spark.sources.tables import load_table
    df = load_table(spark, "region", "/root/testdata/sf0.001")
    assert df.count() == 5
    # catalog mode: qualify through spark_catalog.default (the built-in),
    # backed by a temp table we create for the test
    spark.read.parquet("/root/testdata/sf0.001/region.parquet") \
        .write.mode("overwrite").saveAsTable("default.region")
    try:
        monkeypatch.setenv("SPARK_GRAFT_CATALOG", "spark_catalog")
        got = load_table(spark, "region")
        assert got.count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS default.region")


def test_ivf_recall_vs_brute_force(spark):
    """IVF on a planted-cluster corpus (true neighbors at cosine ~0.95):
    Lloyd cells align with the planted clusters, so nprobe=2 of k=16 cells
    recovers most brute-force top-1 pairs. (The driver's embeddings table
    is isotropic — no corpus structure for ANY coarse quantizer to exploit
    — hence the planted corpus here, like the LSH recall gate above.)"""
    from t_digest_spark.operators.ivf import ivf_topk, ivf_train
    from t_digest_spark.operators.similarity import brute_force_topk
    rng = np.random.default_rng(12)
    centers = rng.standard_normal((16, 64))
    vecs = np.vstack([c + 0.18 * rng.standard_normal((12, 64)) for c in centers])
    df = _emb(spark, vecs)
    cents = ivf_train(df, k=16, dim=64, iters=2)
    assert cents.shape == (16, 64)
    approx = ivf_topk(df, cents, k=1, nprobe=2)
    exact = brute_force_topk(df, df, k=1)
    a = {(r.query_id, r.corpus_id) for r in approx.collect()}
    e = {(r.query_id, r.corpus_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.8, recall


def test_ivf_train_deterministic(spark):
    from t_digest_spark.operators.ivf import ivf_train
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = ivf_train(emb, k=4, dim=64, iters=1)
    c2 = ivf_train(emb, k=4, dim=64, iters=1)
    assert (c1 == c2).all()


def test_ivf_identical_vectors_same_cell(spark):
    """A clone lands in its source's cell (deterministic argmax), so planted
    pairs are always candidates at any nprobe."""
    from t_digest_spark.operators.ivf import ivf_index, ivf_train
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    clones = emb.where(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label")
    u = emb.unionByName(clones)
    cents = ivf_train(emb, k=8, dim=64, iters=1)
    cells = {r.vec_id: r.cell for r in ivf_index(u, cents).select("vec_id", "cell").collect()}
    for i in range(30):
        assert cells[i] == cells[i + 1_000_000]


def test_minhash_signature_semantics_locked(spark):
    """The signature kernel must emit bit-identical signatures to an
    independent spelled-out formulation (locks the splitmix mix constants
    and rolling-code base against accidental drift)."""
    from t_digest_spark.operators.dedup import _minhash_sig_udf
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where(F.col("doc_id") < 80).select("doc_id", "text"))
    pdf = docs.toPandas()
    # add edge cases: empty text and shorter-than-n text
    pdf = pd.concat([pdf, pd.DataFrame({"doc_id": [9001, 9002],
                                        "text": ["", "ab"]})],
                    ignore_index=True)
    got = next(_minhash_sig_udf(64, 5)(iter([pdf])))
    sig_got = {int(r.doc_id): list(r.sig) for r in got.itertuples()}

    # independent spelled-out formulation
    mults = ((np.arange(1, 65, dtype=np.uint64)
              * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1))
    for _, row in pdf.iterrows():
        b = np.frombuffer(row.text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if b.size < 5:
            want = np.full(64, np.iinfo(np.int64).max, dtype=np.int64)
        else:
            code = np.zeros(b.size - 4, dtype=np.uint64)
            for k in range(5):
                code = code * np.uint64(257) + b[k:b.size - 4 + k].astype(np.uint64)
            code = np.unique(code)
            z = code[:, None] * mults[None, :]
            z ^= z >> np.uint64(33)
            z *= np.uint64(0xFF51AFD7ED558CCD)
            z ^= z >> np.uint64(33)
            want = (z.min(axis=0) >> np.uint64(1)).astype(np.int64)
        assert sig_got[int(row.doc_id)] == list(want), row.doc_id


def test_topk_per_key_null_order_values(spark):
    """NULL order values are excluded consistently (not ranked, not
    threshold-poisoning)."""
    from t_digest_spark.operators.topk import topk_per_key
    pdf = pd.DataFrame({"k": ["a"] * 6, "id": range(6),
                        "v": [1.0, None, 3.0, None, 5.0, 2.0]})
    df = spark.createDataFrame(pdf)
    got = (topk_per_key(df, ["k"], "v", 2, tiebreak_cols=["id"])
           .orderBy("rnk").collect())
    assert [(r.rnk, r.v) for r in got] == [(1, 5.0), (2, 3.0)]


def test_topk_per_key_null_keys_ranked(spark):
    """NULL key values form their own ranked group (null-safe threshold
    join), matching the Window.partitionBy semantics."""
    from t_digest_spark.operators.topk import topk_per_key
    pdf = pd.DataFrame({"k": ["a", "a", None, None, None],
                        "id": range(5),
                        "v": [5.0, 4.0, 9.0, 8.0, 7.0]})
    df = spark.createDataFrame(pdf)
    got = (topk_per_key(df, ["k"], "v", 2, tiebreak_cols=["id"])
           .collect())
    nulls = sorted([(r.rnk, r.v) for r in got if r.k is None])
    assert nulls == [(1, 9.0), (2, 8.0)]


def test_cosine_udf_zero_norm_ranks_last(spark):
    from t_digest_spark.operators.similarity import (cosine_pair_col,
                                                     cosine_pairs_udf)
    pdf = pd.DataFrame({
        "a": [np.ones(4, dtype=np.float32), np.zeros(4, dtype=np.float32)],
        "b": [np.ones(4, dtype=np.float32), np.ones(4, dtype=np.float32)]})
    out = spark.createDataFrame(pdf).select(
        cosine_pairs_udf()("a", "b").alias("c"),
        cosine_pair_col(F.col("a").cast("array<double>"),
                        F.col("b").cast("array<double>")).alias("j")).collect()
    assert out[0].c == pytest.approx(1.0)
    assert out[1].c == float("-inf")        # never NaN, never >= threshold
    assert out[0].j == pytest.approx(1.0)
    assert out[1].j == float("-inf")        # JVM path: same guard


def test_jaccard_duplicate_candidates_not_multiplied(spark):
    from t_digest_spark.operators.dedup import ngram_jaccard_pairs
    docs = _docs(spark, ["abcdefgh", "abcdefgh"])
    dup_cands = spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 0], "id_b": [1, 1]}))
    rows = ngram_jaccard_pairs(docs, n=3, threshold=0.0,
                               candidates=dup_cands).collect()
    assert len(rows) == 1 and rows[0].jaccard == pytest.approx(1.0)


def test_avl_serde_rejects_fractional_weights():
    from t_digest_spark.avl import AVLTreeDigest
    d = AVLTreeDigest()
    d.add(1.0, 0.3)
    with pytest.raises(ValueError, match="integer"):
        d.to_bytes()


def test_asof_join_matches_python_oracle(spark):
    """asof_join == a per-key Python point-in-time lookup, including the
    >= tie convention and the no-prior-row NULL case."""
    from t_digest_spark.operators.temporal import asof_join
    import datetime as dt
    base = dt.datetime(2026, 1, 1)
    left = pd.DataFrame({
        "k": ["a", "a", "a", "b", "c"],
        "ts": [base + dt.timedelta(minutes=m) for m in (0, 10, 20, 5, 1)],
        "lv": [1.0, 2.0, 3.0, 4.0, 5.0]})
    right = pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "ts": [base + dt.timedelta(minutes=m) for m in (5, 20, 5, 30)],
        "rv": [10.0, 20.0, 30.0, 40.0]})
    out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    ["k"], "ts", ["rv"]).collect()
    got = {(r.k, r.lv): r.asof_rv for r in out}
    assert got[("a", 1.0)] is None          # no prior right row
    assert got[("a", 2.0)] == 10.0          # ts=10 -> right at 5
    assert got[("a", 3.0)] == 20.0          # tie at ts=20 matches (>=)
    assert got[("b", 4.0)] == 30.0          # tie at ts=5 matches
    assert got[("c", 5.0)] is None          # key with no right rows


def test_range_join_matches_nested_loop(spark):
    """Bin-bucketed range join == the nested-loop BETWEEN join, including
    intervals spanning many bins and values on bin edges."""
    from t_digest_spark.operators.rangejoin import range_join
    rng = np.random.default_rng(77)
    left = spark.createDataFrame(pd.DataFrame({
        "i": range(500), "v": rng.uniform(0, 100, 500)}))
    iv = spark.createDataFrame(pd.DataFrame({
        "iid": range(20),
        "lo": rng.uniform(0, 90, 20),
        "hi": 0.0})).withColumn("hi", F.col("lo") + (F.col("iid") + 1) * 3.0)
    got = {(r.i, r.iid) for r in
           range_join(left, "v", iv, "lo", "hi", bin_width=5.0).collect()}
    want = {(r.i, r.iid) for r in
            left.crossJoin(iv).where((F.col("v") >= F.col("lo"))
                                     & (F.col("v") < F.col("hi"))).collect()}
    assert got == want and len(want) > 0


def test_consistent_sample_properties(spark):
    """Entity-consistent Bernoulli sampling: deterministic, cross-table
    consistent, fraction-accurate, and a pushed-down codegen filter."""
    import pyspark.sql.functions as F
    from t_digest_spark.operators.sample import (consistent_sample,
                                                 sample_predicate,
                                                 sample_threshold)
    df = spark.range(0, 20_000).selectExpr("id AS user_id",
                                           "id % 7 AS payload")
    s1 = consistent_sample(df, "user_id", 0.2)
    s2 = consistent_sample(df, "user_id", 0.2)
    assert s1.count() == s2.count()                      # deterministic
    n = s1.count()
    assert abs(n / 20_000 - 0.2) < 0.02                  # Bernoulli(0.2)
    # cross-table consistency: the same users are kept in a second table
    other = spark.range(0, 20_000).selectExpr("id AS user_id")
    kept1 = {r.user_id for r in s1.select("user_id").collect()}
    kept2 = {r.user_id for r in
             consistent_sample(other, "user_id", 0.2).collect()}
    assert kept1 == kept2
    # nested fractions: a 10% sample is a subset of the 20% sample
    kept10 = {r.user_id for r in
              consistent_sample(df, "user_id", 0.1).select("user_id").collect()}
    assert kept10 <= kept1
    # different seed -> different (but still deterministic) sample
    kept_seeded = {r.user_id for r in
                   consistent_sample(df, "user_id", 0.2, seed="v2")
                   .select("user_id").collect()}
    assert kept_seeded != kept1
    # edge fractions
    assert consistent_sample(df, "user_id", 0.0).count() == 0
    assert consistent_sample(df, "user_id", 1.0).count() == 20_000
    assert len(sample_threshold(0.5)) == 32


def test_stratified_sample(spark):
    """Per-stratum fractions via a codegen CASE; shared key hash means the
    sample nests across strata fractions."""
    import pyspark.sql.functions as F
    from t_digest_spark.operators.sample import (consistent_sample,
                                                 stratified_sample)
    df = spark.range(0, 30_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' "
        "ELSE 'sw' END AS lang")
    out = stratified_sample(df, "doc_id", "lang",
                            {"en": 0.1, "de": 0.5, "sw": 1.0})
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["sw"] == 10_000                        # keep-all stratum
    assert abs(counts["en"] / 10_000 - 0.1) < 0.02
    assert abs(counts["de"] / 10_000 - 0.5) < 0.03
    # unknown stratum falls back to default=0.0
    extra = spark.range(0, 100).selectExpr("id AS doc_id", "'fr' AS lang")
    assert stratified_sample(extra, "doc_id", "lang", {"en": 0.5}).count() == 0
    # nesting: en@10% is a subset of a flat 50% sample on the same key
    en_ids = {r.doc_id for r in out.where("lang='en'").collect()}
    flat50 = {r.doc_id for r in
              consistent_sample(df, "doc_id", 0.5).select("doc_id").collect()}
    assert en_ids <= flat50


def test_consistent_sample_null_keys(spark):
    """NULL keys form one shared entity: kept at fraction 1.0 (no silent
    drop), all-or-nothing at intermediate fractions, dropped at 0.0."""
    import pyspark.sql.functions as F
    from t_digest_spark.operators import consistent_sample, stratified_sample
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        .alias("user_id"), (F.col("id") % 3).cast("string").alias("lang"))
    n_null = df.where("user_id IS NULL").count()
    assert consistent_sample(df, "user_id", 1.0).count() == 1000
    assert consistent_sample(df, "user_id", 0.0).count() == 0
    kept_nulls = (consistent_sample(df, "user_id", 0.5)
                  .where("user_id IS NULL").count())
    assert kept_nulls in (0, n_null)          # one shared fate
    strat = stratified_sample(df, "user_id", "lang",
                              {"0": 1.0, "1": 1.0, "2": 1.0})
    assert strat.count() == 1000


def test_sample_key_encoding_injective(spark):
    """No genuine key value can collide with the NULL entity (or any other
    key): real keys encode as 'k:<value>', NULL as the distinct 'null:'."""
    from t_digest_spark.operators.sample import _key_expr
    df = spark.createDataFrame(
        [(None,), ("null:",), ("~~null_key~~",), ("k:x",), ("x",)],
        "k string")
    encoded = [r.e for r in df.select(_key_expr("k", None).alias("e")).collect()]
    assert len(set(encoded)) == 5


def test_bucket_pairs_equals_self_join(spark):
    """_bucket_pairs (one aggregation) must emit EXACTLY the pair set of
    the self-join it replaced, directed and undirected, including under
    duplicate ids and hot buckets."""
    import random
    from pyspark.sql import functions as F
    from t_digest_spark.operators.similarity import _bucket_pairs

    rng = random.Random(17)
    rows = []
    for _ in range(400):
        rows.append((rng.randrange(60),            # ids collide across rows
                     rng.randrange(4),             # lsh_table
                     rng.randrange(8)))            # lsh_bucket (hot buckets)
    b = spark.createDataFrame(rows, "vec_id long, lsh_table int, lsh_bucket int")

    l, r = b.alias("l"), b.alias("r")
    join_directed = {(x.query_id, x.corpus_id) for x in
                     l.join(r, (F.col("l.lsh_table") == F.col("r.lsh_table"))
                            & (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
                            & (F.col("l.vec_id") != F.col("r.vec_id")))
                     .select(F.col("l.vec_id").alias("query_id"),
                             F.col("r.vec_id").alias("corpus_id"))
                     .distinct().collect()}
    agg_directed = {(x.query_id, x.corpus_id) for x in
                    _bucket_pairs(b, "vec_id", directed=True).collect()}
    assert agg_directed == join_directed

    join_undirected = {(x.id_a, x.id_b) for x in
                       l.join(r, (F.col("l.lsh_table") == F.col("r.lsh_table"))
                              & (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
                              & (F.col("l.vec_id") < F.col("r.vec_id")))
                       .select(F.col("l.vec_id").alias("id_a"),
                               F.col("r.vec_id").alias("id_b"))
                       .distinct().collect()}
    agg_undirected = {(x.id_a, x.id_b) for x in
                      _bucket_pairs(b, "vec_id", directed=False).collect()}
    assert agg_undirected == join_undirected
    assert all(a != bb for a, bb in agg_undirected)   # no self-pairs ever


def test_ivf_empty_corpus(spark):
    """ivf_train on an empty corpus returns a 0-centroid model and
    ivf_topk short-circuits to an empty result instead of crashing."""
    from t_digest_spark.operators.ivf import ivf_topk, ivf_train
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    cents = ivf_train(empty, k=4, dim=8, iters=1)
    assert cents.shape == (0, 8)
    out = ivf_topk(empty, cents, k=3)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "corpus_id", "rank", "cosine"}


def test_corrupt_vectors_excluded_everywhere(spark):
    """Corrupt embeddings (wrong dim, NULL/NaN/inf components, overflow
    magnitudes) are excluded from every vector operator, and a NaN cosine
    never outranks a real neighbor (Spark sorts NaN greatest, so an
    unguarded NaN pair would silently displace true top-k results)."""
    from t_digest_spark.operators.ivf import ivf_index, ivf_topk, ivf_train
    from t_digest_spark.operators.similarity import (cosine_pair_col,
                                                     embedding_near_dups,
                                                     well_formed_col)
    dim = 8
    rng = np.random.default_rng(7)
    clean = [(i, [float(x) for x in rng.standard_normal(dim)])
             for i in range(40)]
    # one clone pair so top-1 has a known answer
    clean.append((1000, list(clean[0][1])))
    corrupt = [
        (2001, [float("nan")] + [0.1] * (dim - 1)),
        (2002, [None] + [0.1] * (dim - 1)),
        (2003, [float("inf")] + [0.1] * (dim - 1)),
        (2004, [1e200] + [0.1] * (dim - 1)),
        (2005, [0.5] * (dim // 2)),
        (2006, []),
    ]
    df = spark.createDataFrame(clean + corrupt,
                               "vec_id long, embedding array<double>")

    n_wf = df.where(well_formed_col(F.col("embedding"), dim)).count()
    assert n_wf == len(clean)

    # brute force with dim: corrupt ids appear on neither side
    bf = brute_force_topk(df, df.where(F.col("vec_id").isin(0, 1000)),
                          k=3, dim=dim).toPandas()
    assert not set(bf.corpus_id) & {c[0] for c in corrupt}
    top1 = bf[(bf.query_id == 1000) & (bf["rank"] == 1)]
    assert list(top1.corpus_id) == [0]       # clone wins, no NaN above it

    # LSH near-dups: planted clone found, no corrupt id in any pair
    nd = embedding_near_dups(df, threshold=0.99, dim=dim,
                             n_planes=4, n_tables=2).toPandas()
    assert {(0, 1000)} <= set(zip(nd.id_a, nd.id_b))
    assert not (set(nd.id_a) | set(nd.id_b)) & {c[0] for c in corrupt}

    # IVF: train/index/probe all survive the ragged rows and exclude them
    cents = ivf_train(df, k=4, dim=dim, iters=1)
    assert np.isfinite(cents).all()
    idx = ivf_index(df, cents)
    assert idx.count() == len(clean)
    ivf = ivf_topk(df, cents, k=3, nprobe=2).toPandas()
    assert not set(ivf.corpus_id) & {c[0] for c in corrupt}
    assert not set(ivf.query_id) & {c[0] for c in corrupt}

    # defense-in-depth guard: degenerate pairs score -inf, never NaN/NULL
    pairs = df.alias("a").crossJoin(df.alias("b")).select(
        cosine_pair_col(F.col("a.embedding"), F.col("b.embedding"))
        .alias("c"))
    bad = pairs.where(F.isnan("c") | F.col("c").isNull()).count()
    assert bad == 0


# ----------------------------------- content-prefix cap / streaming field count

def test_field_count_matches_size_split(spark):
    """_field_count (regexp_count+1) is bit-identical to size(split(...)) —
    the identity token_count/quality_score rely on to avoid materializing a
    length-proportional array per row."""
    from t_digest_spark.operators.text import _field_count
    cases = ["", " ", "   ", "a", "a b", " a  b ", "a\tb\nc d", "a,b;;c--d",
             "no_separators_at_all", "trailing spaces  ", "\n\n\n",
             "多 空格  测试 行", "punct!only?here", "x" * 500,
             ("word " * 200).strip()]
    df = spark.createDataFrame(pd.DataFrame({"t": cases}))
    for sep in (r"\s+", r"[^\w]+"):
        rows = df.select(
            "t",
            _field_count(F.col("t"), sep).alias("fc"),
            F.size(F.split(F.col("t"), sep)).alias("ss")).collect()
        for r in rows:
            assert r.fc == r.ss, (sep, repr(r.t), r.fc, r.ss)
        # trimmed form, exactly as token_count applies it
        rows = df.select(
            "t",
            _field_count(F.trim(F.col("t")), sep).alias("fc"),
            F.size(F.split(F.trim(F.col("t")), sep)).alias("ss")).collect()
        for r in rows:
            assert r.fc == r.ss, ("trim", sep, repr(r.t), r.fc, r.ss)


def test_char_shingles_prefix_cap_semantics(spark):
    """max_chars bounds the shingled prefix exactly; None disables the cap."""
    df = _docs(spark, ["abcdefghij"])
    capped = sorted(r.shingle for r in
                    char_shingles(df, n=3, max_chars=5).collect())
    assert capped == ["abc", "bcd", "cde"]          # shingles of "abcde" only
    full = char_shingles(df, n=3, max_chars=None).collect()
    assert len(full) == 8                            # all 10-3+1 trigrams


def test_giant_documents_capped_signatures(spark):
    """Two multi-hundred-kB docs identical in the first CONTENT_PREFIX_CAP
    chars but wildly divergent after it: the cap makes every similarity
    signature treat them as exact dups (capped texts equal), and the
    per-task work stays bounded regardless of document length."""
    from t_digest_spark.operators.dedup import CONTENT_PREFIX_CAP
    prefix = ("lorem ipsum dolor sit amet " * 5000)[:CONTENT_PREFIX_CAP + 37]
    a = prefix + (" unique tail alpha zz " * 2000)
    b = prefix + (" different ending omega qq " * 3000)
    assert len(a) > CONTENT_PREFIX_CAP and len(b) > CONTENT_PREFIX_CAP
    df = _docs(spark, [a, b])

    sh = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert sh[0] == sh[1]                            # capped texts identical

    cand = minhash_lsh_candidates(df, num_hashes=16, bands=8, n=5).collect()
    assert any({r.id_a, r.id_b} == {0, 1} for r in cand)

    pairs = ngram_jaccard_pairs(df, n=4, threshold=0.99).collect()
    assert len(pairs) == 1 and pairs[0].jaccard == 1.0

    # exact dedup stays FULL-content: the tails differ, so no collapse
    assert dedup_exact(df).count() == 2


def test_count_word_matches_replace_diff(spark):
    """_count_word (regexp_count on the padded string) equals the
    replace-diff arithmetic the SQL oracles use — one left-to-right
    non-overlapping scan either way, including the shared-space
    undercount on back-to-back markers (padded ' a a a ' counts 2 for
    'a': matches at 0-2 and 4-6; only the middle 'a' loses its space)."""
    from t_digest_spark.operators.text import _count_word
    cases = ["the cat", "the the the", "a a a", " a ", "a", "", "xthe they",
             "the", "the ", " the", "and the of to a", "多 的 是 的 多",
             ("the quick " * 50).strip(), "no markers here at all",
             "punct, the! and? of."]
    df = spark.createDataFrame(pd.DataFrame({"t": cases}))
    for w in ["the", "a", "的"]:
        needle = f" {w} "
        padded = F.concat(F.lit(" "), F.col("t"), F.lit(" "))
        replace_diff = ((F.length(padded)
                         - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
                        / F.length(F.lit(needle))).cast("long")
        rows = df.select("t", _count_word("t", w).alias("rc"),
                         replace_diff.alias("rd")).collect()
        for r in rows:
            assert r.rc == r.rd, (w, repr(r.t), r.rc, r.rd)


def test_punct_count_matches_replace_form(spark):
    """regexp_count on the negated class == length(regexp_replace(class,''))
    for both punct classes in token_count / quality_score."""
    cases = ["hello, world!", "", "   ", "no punct", "!!!", "a,b;;c--d",
             "中文，标点。测试", "mixed 中文 and ascii!?", "\n\t.", "100%"]
    df = spark.createDataFrame(pd.DataFrame({"t": cases}))
    for cls in (r"[\w\s]", r"[a-zA-Z0-9\s一-鿿]"):
        neg = "[^" + cls[1:]
        rows = df.select(
            "t",
            F.regexp_count(F.col("t"), F.lit(neg)).alias("rc"),
            F.length(F.regexp_replace(F.col("t"), cls, "")).alias("rl")).collect()
        for r in rows:
            assert r.rc == r.rl, (cls, repr(r.t), r.rc, r.rl)


def test_counting_identities_property(spark):
    """Property check of the three regexp_count identities on randomized
    unicode strings (hypothesis-generated corpus, ONE Spark job per batch —
    per-example jobs would dominate the suite): field count == size(split),
    punct count == length(regexp_replace), marker count == replace-diff.
    Alphabet mixes ASCII word/punct chars, exotic whitespace, CJK, NFD
    combining marks, astral-plane emoji, and RTL — the byte-vs-codepoint
    seams where Java regex forms could plausibly diverge from each other."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from t_digest_spark.operators.text import _count_word, _field_count

    tokens = (list(" \t\n\r\x0b\f") + list("abcZ09_") + list(",.!?-;") +
              list("中文的") + ["\u00e9", "e\u0301", "\u00a0", "\u2003",
                               "\U0001F600", "\u0639", "\U0001D11E", "the", " the "])
    strings = st.lists(st.sampled_from(tokens), max_size=40).map("".join)

    @given(st.lists(strings, min_size=1, max_size=8))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def check(texts):
        df = spark.createDataFrame(pd.DataFrame({"t": texts}))
        tr = F.trim(F.col("t"))
        padded = F.concat(F.lit(" "), F.col("t"), F.lit(" "))
        needle = " the "
        replace_diff = ((F.length(padded)
                         - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
                        / F.length(F.lit(needle))).cast("long")
        rows = df.select(
            "t",
            _field_count(tr, r"\s+").alias("fc_ws"),
            F.size(F.split(tr, r"\s+")).alias("ss_ws"),
            _field_count(tr, r"[^\w]+").alias("fc_w"),
            F.size(F.split(tr, r"[^\w]+")).alias("ss_w"),
            F.regexp_count(F.col("t"), F.lit(r"[^\w\s]")).alias("pc"),
            F.length(F.regexp_replace(F.col("t"), r"[\w\s]", "")).alias("pl"),
            F.regexp_count(F.col("t"),
                           F.lit(r"[^a-zA-Z0-9\s一-鿿]")).alias("qc"),
            F.length(F.regexp_replace(F.col("t"), r"[a-zA-Z0-9\s一-鿿]",
                                      "")).alias("ql"),
            _count_word("t", "the").alias("wc"),
            replace_diff.alias("wr")).collect()
        for r in rows:
            assert r.fc_ws == r.ss_ws, ("ws", repr(r.t))
            assert r.fc_w == r.ss_w, ("word", repr(r.t))
            assert r.pc == r.pl, ("punct", repr(r.t))
            assert r.qc == r.ql, ("qpunct", repr(r.t))
            assert r.wc == r.wr, ("marker", repr(r.t))

    check()


def test_cosine_clamp_clone_pairs(spark):
    """Clone and anti-clone pairs must score EXACTLY +/-1.0: the raw fold
    rounds dot/(sqrt(n)*sqrt(n)) to 1+1ulp for ~1/4 of real vectors
    (sqrt(x)^2 != x), DuckDB's list_cosine_similarity clamps, and the
    driver's hash compare is exact — the sf0.01-base adversarial sweep
    caught this as a 2e-16 mismatch on an injected clone. Both cosine
    paths (Catalyst fold + Arrow UDF) carry the clamp; the -inf
    degenerate sentinel survives it."""
    from t_digest_spark.operators.similarity import (cosine_pair_col,
                                                     cosine_pairs_udf)
    rng = np.random.default_rng(11)
    vecs = [[float(np.float32(x)) for x in rng.normal(size=64)]
            for _ in range(64)]
    df = spark.createDataFrame(pd.DataFrame({
        "a": vecs,
        "b": vecs,                                    # clones
        "c": [[-x for x in v] for v in vecs],         # anti-clones
        "z": [[0.0] * 64] * 64,                       # degenerate
    }))
    rows = df.select(
        "a",
        cosine_pair_col(F.col("a"), F.col("b")).alias("self_cos"),
        cosine_pair_col(F.col("a"), F.col("c")).alias("anti_cos"),
        cosine_pair_col(F.col("a"), F.col("z")).alias("zero_cos"),
        cosine_pairs_udf()(F.col("a"), F.col("b")).alias("self_udf"),
        cosine_pairs_udf()(F.col("a"), F.col("c")).alias("anti_udf"),
        cosine_pairs_udf()(F.col("a"), F.col("z")).alias("zero_udf")).collect()
    import duckdb
    con = duckdb.connect()
    for r in rows:
        v = [float(x) for x in r.a]
        nv = [-x for x in v]
        d_self = con.execute(
            "SELECT list_cosine_similarity($1::DOUBLE[], $2::DOUBLE[])",
            [v, v]).fetchone()[0]
        d_anti = con.execute(
            "SELECT list_cosine_similarity($1::DOUBLE[], $2::DOUBLE[])",
            [v, nv]).fetchone()[0]
        # the contract: the Catalyst fold (every oracle-gated call site)
        # is BIT-equal to the oracle engine — never above 1 (the clamp
        # removes the 1+1ulp excess), while 1-1ulp self-cosines are
        # legitimate and both engines return them. The Arrow UDF uses
        # einsum (pairwise/SIMD summation, different rounding) and is not
        # oracle-gated: clamped and within 1 ulp is its contract.
        assert r.self_cos == d_self, (r.self_cos, d_self)
        assert r.anti_cos == d_anti, (r.anti_cos, d_anti)
        assert abs(r.self_udf - d_self) < 5e-16 and r.self_udf <= 1.0
        assert abs(r.anti_udf - d_anti) < 5e-16 and r.anti_udf >= -1.0
        assert abs(r.self_cos - 1.0) < 5e-16 and r.self_cos <= 1.0
        assert abs(r.anti_cos + 1.0) < 5e-16 and r.anti_cos >= -1.0
        assert r.zero_cos == float("-inf") and r.zero_udf == float("-inf")
