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
  sources/               deterministic synthetic source-code table + parquet readers
  functions/             scalar query helpers exposed as pandas UDFs
  plans/                 SparkSession builders with scale-oriented confs
"""

from t_digest_spark.core import TDigest, Dist
from t_digest_spark.scales import SCALES

__all__ = ["TDigest", "Dist", "SCALES"]
__version__ = "0.1.0"
