from t_digest_spark.operators.aggregation import (tdigest_aggregate,
                                                  tdigest_merge,
                                                  tdigest_partial_build,
                                                  tdigest_quantile_aggregate)

__all__ = ["tdigest_aggregate", "tdigest_merge", "tdigest_partial_build",
           "tdigest_quantile_aggregate"]
