from t_digest_spark.operators.aggregation import (avltree_aggregate,
                                                  tdigest_aggregate,
                                                  tdigest_merge,
                                                  tdigest_partial_build,
                                                  tdigest_quantile_aggregate)
from t_digest_spark.operators.rangejoin import range_join
from t_digest_spark.operators.rank import digest_rank_lookup
from t_digest_spark.operators.sample import (consistent_sample,
                                             sample_predicate,
                                             sample_threshold,
                                             stratified_sample)
from t_digest_spark.operators.temporal import asof_join
from t_digest_spark.operators.topk import topk_per_key

__all__ = ["tdigest_aggregate", "tdigest_merge", "tdigest_partial_build",
           "tdigest_quantile_aggregate", "avltree_aggregate",
           "topk_per_key", "asof_join", "range_join",
           "digest_rank_lookup", "consistent_sample", "sample_predicate",
           "sample_threshold", "stratified_sample"]
