"""Local mirror of the driver's DuckDB-oracle gate: every QUERIES entry runs
on Spark and on DuckDB at sf0.001 and must match exactly."""

import pytest

from casualty_linking_spark.queries import QUERIES
from tests.conftest import SF_DIR, compare_frames


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn, oracle = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    if oracle is None:
        assert sdf.count() >= 0
        return
    ddf = duck.execute(oracle()).fetchdf()
    compare_frames(sdf, ddf)
