"""Person-name unification (reference src/process.py:78-111 `unify_names` and
src/converters.py:61-94 `convert_person_name`).

Implemented as Arrow-batched pandas UDFs: the rule chains are regex rewrites
plus Python ``str.title()`` — title-casing capitalizes after *any* non-letter
(``'(ent. x)'.title()`` → ``'(Ent. X)'``), which Spark's ``initcap`` (word =
whitespace-delimited) cannot reproduce, so exact parity requires the
vectorized pandas path. No per-row Python at the Spark level.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F, types as T


def unify_family_py(family: str) -> str:
    """Scalar mirror of unify_family_name (src/process.py:82-89); used by the
    oracle-SQL renderer and golden tests."""
    f = re.sub(r"(\w)0(\w)", r"\1O\2", family or "")
    f = re.sub(r"\s+", " ", f)
    f = f.replace("%", "/")
    f = re.sub(r"(\w\w\s+)(E(?:NT)?\.)\s?(\w+)", r"\1(ent. \3)", f)
    return f.title().replace("(Ent.", "(ent.").replace("Von", "von")


def unify_given_py(given: str) -> str:
    """Scalar mirror of unify_given_name (src/process.py:91-95)."""
    return (given or "").title().replace("%", "/")


def _unify_family_series(s: pd.Series) -> pd.Series:
    """Mirror of unify_family_name (src/process.py:82-89)."""
    s = s.fillna("")
    s = s.str.replace(r"(\w)0(\w)", r"\1O\2", regex=True)
    s = s.str.replace(r"\s+", " ", regex=True)
    s = s.str.replace("%", "/", regex=False)
    s = s.str.replace(r"(\w\w\s+)(E(?:NT)?\.)\s?(\w+)", r"\1(ent. \3)", regex=True)
    s = s.str.title().str.replace("(Ent.", "(ent.", regex=False).str.replace("Von", "von", regex=False)
    return s


def _unify_given_series(s: pd.Series) -> pd.Series:
    """Mirror of unify_given_name (src/process.py:91-95)."""
    s = s.fillna("")
    return s.str.title().str.replace("%", "/", regex=False)


@F.pandas_udf(T.StringType())
def unify_family_name(s: pd.Series) -> pd.Series:
    return _unify_family_series(s)


@F.pandas_udf(T.StringType())
def unify_given_name(s: pd.Series) -> pd.Series:
    return _unify_given_series(s)


_RE_NAME_SPLIT = re.compile(
    r"([A-ZÅÄÖÜÉÓÁ/\-]+(?:\s+\(?E(?:NT)?[\.\s]+[A-ZÅÄÖÜÉÓÁ/\-]+)?\)?)\s*(?:(VON))?,?\s*([A-ZÅÄÖÜÉÓÁ/\- \(\)0-9,.]*)"
)
_RE_PREV_NAME = re.compile(r"([A-ZÅÄÖÜÉÓÁ/\-]{2}) +\(?(E(?:NT)?[\.\s]+)([A-ZÅÄÖÜÉÓÁ/\-]+)\)?")


def convert_person_name_py(raw_name: str) -> tuple[str, str, str]:
    """Pure-python mirror of convert_person_name (src/converters.py:61-94):
    split raw 'LAST, FIRST ...' into (firstnames, lastname, fullname) with
    previous-name syntax normalized to '(ent. X)'."""
    fullname = (raw_name or "").upper()
    m = _RE_NAME_SPLIT.search(fullname)
    lastname, extra, firstnames = m.groups() if m else (fullname, None, "")
    lastname = _RE_PREV_NAME.sub(r"\1 (ent. \3)", str(lastname))
    lastname = lastname.title().replace("(Ent. ", "(ent. ")
    firstnames = (firstnames or "").title()
    if extra:
        lastname = " ".join([extra.lower(), lastname])
    fullname = lastname + (", " + firstnames if firstnames else "")
    return firstnames, lastname, fullname


_NAME_STRUCT = T.StructType(
    [
        T.StructField("given", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("full", T.StringType()),
    ]
)


@F.pandas_udf(_NAME_STRUCT)
def convert_person_name(s: pd.Series) -> pd.DataFrame:
    parts = [convert_person_name_py(v) for v in s.fillna("")]
    return pd.DataFrame(parts, columns=["given", "family", "full"])


def strip_prev_name(family_col):
    """'Heino (ent. Vanha)' -> 'Heino Vanha'? No — the reference keeps only the
    captured previous name in place: re.sub(r'\\(ent\\.\\s*(.+)\\)', r'\\1', family)
    (src/linker.py:70). JVM-side regexp_replace."""
    return F.regexp_replace(family_col, r"\(ent\.\s*(.+)\)", "$1")
