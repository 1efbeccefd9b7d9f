"""Catalog-first loader: the spark.read.table path EXECUTES.

No Iceberg jars ship in this sandbox, but the loader's catalog mode is
catalog-implementation-agnostic — it resolves a 3-part identifier through
whatever TableCatalog is registered. Spark's built-in ``spark_catalog``
(V2SessionCatalog) is such a catalog, so registering the driver parquet as
external tables in a database and pointing SPARK_GRAFT_CATALOG at it runs
the very same code an Iceberg SparkSessionCatalog deployment would hit.
"""

import os

import pytest


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    from t_digest_spark.plans import get_spark
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark("source-tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.sql.warehouse.dir": wh})
    yield s
    s.stop()


def test_catalog_mode_resolves_through_spark_read_table(spark, monkeypatch):
    from t_digest_spark.sources.tables import load_table
    sf_dir = "/root/testdata/sf0.001"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat_test")
    for name in ("events", "orders"):
        spark.sql(f"""
            CREATE TABLE IF NOT EXISTS spark_catalog.graft_cat_test.{name}
            USING parquet LOCATION '{os.path.join(sf_dir, name + ".parquet")}'
        """)
    monkeypatch.setenv("SPARK_GRAFT_CATALOG", "spark_catalog")
    monkeypatch.setenv("SPARK_GRAFT_NAMESPACE", "graft_cat_test")
    ev = load_table(spark, "events")
    assert ev.count() == spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")).count()
    # pushdown still reaches the scan through the catalog table
    plan = (ev.where("event_type = 'click'").select("user_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "event_type" in plan
    # explicit catalog argument beats the env var
    orders = load_table(spark, "orders", catalog="spark_catalog")
    assert orders.columns[0].startswith("o_")


def test_file_mode_fallback(spark, monkeypatch):
    from t_digest_spark.sources.tables import load_table
    monkeypatch.delenv("SPARK_GRAFT_CATALOG", raising=False)
    df = load_table(spark, "nation", sf_dir="/root/testdata/sf0.001")
    assert df.count() == 25
