"""Iceberg catalog write path — runs only when an Iceberg runtime is
actually on the classpath (the sandbox container ships none, so this
self-skips with a reason; on a real cluster it round-trips one partitioned
table through DataFrameWriterV2)."""

import pytest
from pyspark.sql import functions as F


def _iceberg_available(spark) -> bool:
    from casualty_linking_spark.plans.storage import use_iceberg

    if not use_iceberg(spark):
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_partitioned_roundtrip(spark):
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg catalog configured / runtime jar on classpath")

    from casualty_linking_spark.plans.storage import write_table_iceberg

    df = spark.createDataFrame(
        [("s1", "p", "o1", "g1"), ("s2", "p", "o2", "g2")],
        "subj string, pred string, obj string, graph_kind string",
    )
    write_table_iceberg(df, "spark_catalog.default.kg_test_triples", partition_by=["graph_kind"])
    back = spark.table("spark_catalog.default.kg_test_triples")
    assert back.count() == 2
    assert back.filter(F.col("graph_kind") == "g1").count() == 1
    # idempotent re-create (the pipeline's overwrite contract)
    write_table_iceberg(df, "spark_catalog.default.kg_test_triples", partition_by=["graph_kind"])
    assert spark.table("spark_catalog.default.kg_test_triples").count() == 2


def test_write_table_scopes_overwrite_mode_conf(spark, tmp_path):
    """write_table's dynamic-partition-overwrite conf must be scoped to the
    write: session-global flips would silently change the overwrite
    semantics of a caller's own partitioned writes."""
    from casualty_linking_spark.plans.storage import write_table

    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, None)
    df = spark.createDataFrame(
        [("s1", "g1"), ("s2", "g2")], "subj string, graph_kind string"
    )
    write_table(df, str(tmp_path / "t"), partition_by=["graph_kind"])
    assert spark.conf.get(key, None) == before
    assert spark.read.parquet(str(tmp_path / "t")).count() == 2
