from t_digest_spark.sources.synthetic import source_code_table
from t_digest_spark.sources.tables import load_table, load_tables

__all__ = ["source_code_table", "load_table", "load_tables"]
