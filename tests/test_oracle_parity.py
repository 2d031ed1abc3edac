"""Local mirror of the driver's DuckDB-oracle gate: every QUERIES entry runs
on Spark and on DuckDB at sf0.001 and must match exactly.

Round-5 hardening: the stateful/streaming queries additionally run at the
driver's own scale, sf0.01 — both round-4 driver reds (the sessionizer
replay's late-data drop, the HUGEINT oracle rendering) were invisible at
sf0.001/8-cores. Together with the 64-file replay in the harness itself and
the dtype-strict compare_frames, reverting either round-5 fix makes THIS
suite fail, not just the driver."""

import duckdb
import pytest

from casualty_linking_spark.queries import QUERIES
from tests.conftest import SF_DIR, SF_DIR_01, TABLES, compare_frames

# queries whose execution profile depends on parallelism / micro-batching /
# accumulated state — the class the sf0.001 leg can't vouch for
STATEFUL_STREAMING = [
    "kg_streaming_sessions",
    "kg_streaming_silver",
    "dedup_streaming_exact",
    "events_streaming_rollup",
    "events_rollup",
    "events_sessions",
    "events_streaming_interval_join",
]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_01}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn, oracle = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    if oracle is None:
        assert sdf.count() >= 0
        return
    ddf = duck.execute(oracle()).fetchdf()
    compare_frames(sdf, ddf)


@pytest.mark.parametrize("name", STATEFUL_STREAMING)
def test_stateful_query_matches_oracle_at_sf01(spark, duck01, name):
    fn, oracle = QUERIES[name]
    sdf = fn(spark, SF_DIR_01)
    assert oracle is not None, name
    ddf = duck01.execute(oracle()).fetchdf()
    compare_frames(sdf, ddf)
