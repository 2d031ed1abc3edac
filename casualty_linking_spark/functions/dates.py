"""Date conversion & validation (reference semantics: src/converters.py:22-58,
src/validators.py:14-39) as pure JVM-side Column expressions — no UDFs.

The reference's date cell is a union type date|dirty-string|null
(SURVEY.md §1.2); Spark has no unions, so a converted date becomes the column
pair ``(date, str)``: ``date`` is the parsed DATE (century-repaired), ``str``
is the *cleaned* string when unparseable (the reference keeps the cleaned
``datestr``, not the raw, src/converters.py:56), and both are null for
all-'x' unknown-date markers (src/converters.py:32-34).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, functions as F

# Hard-coded typo repairs, verbatim from reference src/converters.py:38-42.
TYPO_FIXES = [
    ("26.02.0194", "26.02.1944"),
    ("03.07.0194", "03.07.1944"),
    ("13.09.0194", "13.09.1943"),
    ("18.09.0041", "18.09.1941"),
    ("16.12.0199", "16.12.1939"),
]


def clean_date_str(raw: Column) -> Column:
    """strip, O->0, ','->'.', then the five typo fixes (src/converters.py:37-42)."""
    c = F.replace(F.replace(F.trim(raw), F.lit("O"), F.lit("0")), F.lit(","), F.lit("."))
    for bad, good in TYPO_FIXES:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


def is_unknown_date(raw: Column) -> Column:
    """All characters are 'x' (ignoring dots): an explicit unknown marker
    (src/converters.py:32)."""
    stripped = F.lower(F.replace(raw, F.lit("."), F.lit("")))
    return raw.isNotNull() & (F.length(stripped) > 0) & stripped.rlike("^x+$")


def convert_dates(raw: Column) -> tuple[Column, Column]:
    """Return (date_col, str_col) per the union-type encoding above."""
    cleaned = clean_date_str(raw)
    parsed = F.try_to_timestamp(cleaned, F.lit("d.M.yyyy")).cast("date")
    year = F.year(parsed)
    # Century repair: years rendered 09xx/10xx are 19xx (src/converters.py:47-48).
    repaired = F.when(
        year.between(900, 1099),
        F.make_date(year % 100 + 1900, F.month(parsed), F.dayofmonth(parsed)),
    ).otherwise(parsed)

    empty = raw.isNull() | (F.length(F.trim(raw)) == 0)
    unknown = is_unknown_date(raw)

    date_col = F.when(empty | unknown, F.lit(None).cast("date")).otherwise(repaired)
    str_col = (
        F.when(empty | unknown, F.lit(None).cast("string"))
        .when(repaired.isNotNull(), F.lit(None).cast("string"))
        .otherwise(cleaned)
    )
    return date_col, str_col


def validate_dates(
    date_col: Column,
    str_col: Column,
    after: datetime.date = datetime.date(1939, 11, 28),
    before: datetime.date = datetime.date(1945, 4, 25),
) -> Column:
    """Finnish error strings, verbatim semantics of src/validators.py:14-39:
    unparseable non-'xx' strings are invalid; parsed dates must fall in
    [after, before]. The 'xx'-prefixed unresolved strings pass silently."""
    return (
        # NB: the 'xx' prefix check is case-sensitive in the reference
        # (src/validators.py:28 compares resolved[:2] != 'xx' directly).
        F.when(str_col.isNotNull() & (F.substring(str_col, 1, 2) != F.lit("xx")),
               F.lit("Päivämäärä ei ole kelvollinen"))
        .when(date_col.isNotNull() & (date_col < F.lit(after)), F.lit("Päivämäärä liian varhainen"))
        .when(date_col.isNotNull() & (date_col > F.lit(before)), F.lit("Päivämäärä liian myöhäinen"))
        .otherwise(F.lit(None).cast("string"))
    )


def date_cmp_str(date_col: Column, str_col: Column) -> Column:
    """The string the reference would see for ``str(literal)`` — ISO date when
    parsed, else the cleaned string (drives the Winter-War string compare,
    src/linker.py:189-190)."""
    return F.coalesce(F.date_format(date_col, "yyyy-MM-dd"), str_col)


def strip_dash(raw: Column) -> Column:
    """strip_dash (src/converters.py:97-98): lone '-' becomes empty."""
    return F.when(F.trim(raw) == "-", F.lit("")).otherwise(raw)


def validate_mother_tongue(resolved: Column, original: Column) -> Column:
    """validate_mother_tongue (src/validators.py:50-54): any non-empty
    original that is not the 'X' marker is flagged 'Epäselvä arvo'."""
    return F.when(
        original.isNotNull()
        & (F.length(F.trim(original)) > 0)
        & (F.upper(original) != "X"),
        F.lit("Epäselvä arvo"),
    )


# DuckDB renderings of the same logic, for oracle_sql().

def duckdb_clean_expr(raw: str) -> str:
    c = f"replace(replace(trim({raw}), 'O', '0'), ',', '.')"
    for bad, good in TYPO_FIXES:
        c = f"replace({c}, '{bad}', '{good}')"
    return c


def duckdb_convert_date_exprs(raw: str) -> tuple[str, str]:
    """(date_expr, str_expr) matching convert_dates()."""
    cleaned = duckdb_clean_expr(raw)
    parsed = f"CAST(try_strptime({cleaned}, '%d.%m.%Y') AS DATE)"
    repaired = (
        f"CASE WHEN year({parsed}) BETWEEN 900 AND 1099 "
        f"THEN make_date(year({parsed}) % 100 + 1900, month({parsed}), day({parsed})) "
        f"ELSE {parsed} END"
    )
    empty = f"({raw} IS NULL OR length(trim({raw})) = 0)"
    unknown = f"regexp_full_match(lower(replace({raw}, '.', '')), 'x+')"
    date_expr = f"CASE WHEN {empty} OR {unknown} THEN NULL ELSE {repaired} END"
    str_expr = (
        f"CASE WHEN {empty} OR {unknown} THEN NULL "
        f"WHEN ({repaired}) IS NOT NULL THEN NULL ELSE {cleaned} END"
    )
    return date_expr, str_expr
