import duckdb
import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from casualty_linking_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="casualty_linking_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _dtype_class(dtype) -> str:
    """'i' integer-kind, 'f' float-kind, '' anything else."""
    k = getattr(dtype, "kind", "")
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    return ""


def compare_frames(sdf, duck_df, keys=None):
    """Order-insensitive comparison mirroring the driver's check: sort columns
    by name, sort rows, compare values (dates/timestamps as ISO strings,
    NaN/None unified).

    DTYPE-CLASS STRICT (round-5 hardening): the driver hashes rendered
    values, so a column fetched as float64 on one side and int64 on the
    other mismatches there even when ``0.0 == 0`` — exactly how the DuckDB
    HUGEINT (uncast ``sum(BIGINT)``) reds shipped in round 4 while this
    mirror stayed green. An int-kind column on one side vs a float-kind
    column on the other now fails, UNLESS the int side contains nulls
    (pandas itself upcasts nullable ints to float64, so that case is a
    fetch artifact both the driver's sides share, not an engine mismatch)."""
    import pandas as pd

    a = sdf.toPandas()
    b = duck_df
    assert sorted(a.columns) == sorted(b.columns), (sorted(a.columns), sorted(b.columns))
    cols = sorted(a.columns)
    a = a[cols].copy()
    b = b[cols].copy()

    for c in cols:
        ca, cb = _dtype_class(a[c].dtype), _dtype_class(b[c].dtype)
        if {ca, cb} == {"i", "f"}:
            float_side = a[c] if ca == "f" else b[c]
            int_is_nullable_upcast = float_side.isna().any()
            assert int_is_nullable_upcast, (
                f"column {c}: dtype class mismatch spark={a[c].dtype} duck={b[c].dtype} "
                "(int-vs-float with no nulls — the driver's value-hash would differ; "
                "CAST the oracle aggregate, cf. DuckDB sum(BIGINT)->HUGEINT->float64)"
            )

    import datetime as dt

    def _nv(v):
        if v is None:
            return None
        try:
            if pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
        if isinstance(v, (pd.Timestamp, dt.datetime, dt.date)):
            return pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(v, float):
            return round(v, 9)
        try:
            import numpy as np
            if isinstance(v, np.floating):
                return round(float(v), 9)
            if isinstance(v, np.integer):
                return int(v)
        except ImportError:
            pass
        return v

    def norm(df):
        df = df.astype(object)
        for c in df.columns:
            # NB: Series.map silently skips NaN -> plain comprehension; the
            # explicit object dtype stops pandas re-coercing None back to NaN
            df[c] = pd.Series([_nv(v) for v in df[c]], dtype=object, index=df.index)
        return df.sort_values(
            cols, key=lambda s: pd.Series([(v is None, str(v)) for v in s], index=s.index)
        ).reset_index(drop=True)

    a, b = norm(a), norm(b)
    assert len(a) == len(b), f"row counts differ: spark={len(a)} duck={len(b)}"
    for c in cols:
        mism = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(a[c], b[c]))
            if (x != y and not (x is None and y is None))
        ]
        assert not mism, f"column {c}: {len(mism)} mismatches, first: {mism[:3]}"
