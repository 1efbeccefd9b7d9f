"""Table loaders: catalog-first (Iceberg-shaped), parquet-file fallback.

The north rule names an Iceberg-shaped warehouse. All engine code is
format-agnostic DataFrame algebra, so the ONLY format-aware point is this
loader: when a catalog is configured (``SPARK_GRAFT_CATALOG`` env var or the
``catalog=`` argument — e.g. an Iceberg ``SparkCatalog``/``SparkSessionCatalog``
registered via ``spark.sql.catalog.<name>`` configs), tables resolve through
``spark.read.table("<catalog>.<db>.<name>")`` and inherit everything the
catalog provides (snapshot isolation, hidden partitioning, metadata-pruned
scans). Without one (this sandbox ships no Iceberg jars — checked
/opt/spark/jars), the driver's parquet layout (TESTDATA.md) is read
directly; Catalyst still gets pushdown/pruning from the parquet source.

The catalog mode is EXECUTED in CI against Spark's built-in
``spark_catalog`` (V2SessionCatalog) with external parquet tables
(tests/test_sources.py) — the same 3-part-identifier resolution an
Iceberg SparkSessionCatalog deployment hits; only the jars differ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _catalog_prefix(catalog: str | None) -> str | None:
    """Resolved '<catalog>.<namespace>' prefix, or None for file mode."""
    cat = catalog or os.environ.get("SPARK_GRAFT_CATALOG")
    if not cat:
        return None
    ns = os.environ.get("SPARK_GRAFT_NAMESPACE", "default")
    return f"{cat}.{ns}"


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None,
               catalog: str | None = None) -> DataFrame:
    prefix = _catalog_prefix(catalog)
    if prefix is not None:
        return spark.read.table(f"{prefix}.{name}")
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str | None = None,
                catalog: str | None = None) -> dict:
    return {t: load_table(spark, t, sf_dir, catalog) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None,
                   catalog: str | None = None) -> None:
    for name, df in load_tables(spark, sf_dir, catalog).items():
        df.createOrReplaceTempView(name)
