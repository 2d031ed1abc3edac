"""T2 — the silver casualty-record table: scan-time cleaning, declarative
converters, validators and the quarantine sidecar.

This re-expresses the reference's CSV scan converters
(src/csv_to_rdf.py:123-162), the CASUALTY_MAPPING converter/validator chains
(src/mapping.py:96-317) and the name unification of src/process.py:78-111 as
one ``select`` over the raw record DataFrame — every rule is a Column
expression (JVM codegen) except the title-casing name unifier (Arrow pandas
UDF, see functions/names.py). The error side-channel (reference
output/errors.csv, src/csv_to_rdf.py:202-203) becomes the ``record_errors``
DataFrame.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, functions as F

from .. import namespaces as NS
from ..dims import CODE_TABLES, URI_MAPPINGS
from ..functions import dates as D
from ..functions import names as N

MUNICIPALITY_PREFIX = NS.MUNICIPALITIES + "k"

# Columns cleaned with x_stripper at scan time (src/csv_to_rdf.py:135-149):
# lowercase 'x' and empty become null; uppercase 'X' survives (and later
# mints a kX municipality URI — vestigial check in convert_graveyards never
# fires on URIs, see src/csv_to_rdf.py:99).
X_STRIPPED = ["askunta", "kirjkunta", "haavkunta", "katokunta", "kuolinkunta", "skunta", "hkunta"]
UPPERCASED = ["kansallisuus", "kansalaisuus"]


def _x_strip(c: Column) -> Column:
    t = F.trim(c)
    return F.when(t.isin("x", ""), F.lit(None)).otherwise(t)


def _enum_map(kind: str) -> dict[str, str]:
    ns, table = CODE_TABLES[kind]
    return {k: ns + v for k, v in table.items() if k is not None}


def _enum_col(c: Column, kind: str) -> Column:
    """convert_from_dict semantics (src/converters.py:101-102): unknown or
    missing key falls back to the None -> Tuntematon default row."""
    ns, table = CODE_TABLES[kind]
    mapping = _enum_map(kind)
    default = ns + table[None]
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    # try_element_at: missing/null key -> null -> Tuntematon default
    return F.coalesce(F.try_element_at(m, F.coalesce(c, F.lit("\x00"))), F.lit(default))


def _urify(c: Column) -> Column:
    """urify (src/converters.py:105-107): null-safe prefixing."""
    return F.when(c.isNotNull() & (c != ""), F.concat(F.lit(MUNICIPALITY_PREFIX), c))


def _filter_additional_information(c: Column) -> Column:
    """filter_additional_information (src/converters.py:110-115): values that
    are a substring of any denylisted execution term are blanked."""
    low = F.lower(c)
    hit = (
        (F.instr(F.lit("kuolemanrangaistus"), low) > 0)
        | (F.instr(F.lit("teloitettu"), low) > 0)
        | (F.instr(F.lit("ammuttu"), low) > 0)
    )
    return F.when(c.isNotNull() & hit, F.lit(None)).otherwise(c)


def _fix_rank_literal(c: Column) -> Column:
    """The two literal-object repairs of URI_MAPPINGS (src/process.py:24-25)
    applied at the column level (equivalent to the triple-level rewrite since
    rank_literal triples come from this column)."""
    out = c
    for bad, good in URI_MAPPINGS[:2]:
        out = F.when(out == bad, F.lit(good)).otherwise(out)
    return out


DATE_FIELDS = {
    # column -> (validator after, validator before); None = no validator
    "saika": (datetime.date(1860, 1, 1), datetime.date(1935, 1, 1)),
    "haavaika": (datetime.date(1939, 11, 28), datetime.date(1945, 4, 25)),
    "katoaika": (datetime.date(1939, 11, 28), datetime.date(1945, 4, 25)),
    "kuolinaika": (datetime.date(1939, 11, 30), None),  # before = today
}
DATE_TARGETS = {
    "saika": "date_of_birth",
    "haavaika": "date_of_wounding",
    "katoaika": "date_of_going_mia",
    "kuolinaika": "date_of_death",
}


# The silver converter projection is a pure function of column NAMES, so its
# Column trees are built once and shared (same reasoning as
# extract._MENTION_COLS: hundreds of py4j round trips per rebuild, measured
# ~0.8 s of driver time inside the timed flagship at sf0.1).
_SILVER_COLS: list[Column] | None = None


def _silver_cols() -> list[Column]:
    cols: list[Column] = [F.col("conv_id"), F.col("person_id"), F.col("record_uri")]

    cols += [
        F.col("snimi").alias("family_name_raw"),
        F.col("enimet").alias("given_names_raw"),
        # P5 name unification (unify_names, src/process.py:78-111)
        N.unify_family_name(F.col("snimi")).alias("family_name"),
        N.unify_given_name(F.col("enimet")).alias("given_names"),
        _enum_col(F.col("ssaaty"), "marital").alias("marital_uri"),
        _enum_col(F.col("spuoli"), "gender").alias("gender_uri"),
        _enum_col(F.col("kansalaisuus"), "citizenship").alias("citizenship_uri"),
        _enum_col(F.col("kansallisuus"), "nationality").alias("nationality_uri"),
        _enum_col(F.col("aidinkieli"), "language").alias("mother_tongue_uri"),
        _enum_col(F.col("menehtluokka"), "perishing").alias("perishing_uri"),
        # int(x) if x.isnumeric() else None (src/mapping.py:163)
        F.when(F.col("lastenlkm").rlike("^[0-9]+$"), F.col("lastenlkm").cast("int"))
        .alias("number_of_children"),
        F.col("ammatti").alias("occupation_literal"),
        _fix_rank_literal(F.col("sotarvo")).alias("rank_literal"),
        F.col("joskoodi").alias("unit_code"),
        F.col("josnimi").alias("unit_literal"),
        _urify(F.col("skunta")).alias("municipality_of_birth"),
        _urify(F.col("kirjkunta")).alias("municipality_of_domicile"),
        _urify(F.col("askunta")).alias("municipality_of_residence"),
        _urify(F.col("haavkunta")).alias("municipality_of_wounding"),
        _urify(F.col("katokunta")).alias("municipality_of_going_mia"),
        _urify(F.col("kuolinkunta")).alias("municipality_of_death"),
        _urify(F.col("hkunta")).alias("municipality_of_burial"),
        F.col("haavpaikka").alias("place_of_wounding"),
        F.col("katopaikka").alias("place_of_going_mia_literal"),
        F.col("kuolinpaikka").alias("place_of_death_literal"),
        F.col("hmaa").alias("graveyard_number"),
        F.col("hpaikka").alias("place_of_burial_number"),
        _filter_additional_information(F.col("vapaa_paikkatieto")).alias("additional_information"),
    ]

    for src_col, tgt in DATE_TARGETS.items():
        d, s = D.convert_dates(F.col(src_col))
        cols += [d.alias(tgt), s.alias(tgt + "_str"), F.col(src_col).alias(tgt + "_raw")]

    # prefLabel 'Family, Given' (src/process.py:108-109) — references the
    # unified output columns, so the name-unifier UDFs are evaluated once.
    cols.append(
        F.concat_ws(", ", F.col("family_name"), F.col("given_names")).alias("pref_label")
    )
    return cols


def build_records(raw: DataFrame) -> DataFrame:
    """Raw records (extract.mentions_to_raw_records output) -> silver record."""
    global _SILVER_COLS
    if _SILVER_COLS is None:
        _SILVER_COLS = _silver_cols()

    # scan-time cleaning
    for c in X_STRIPPED:
        raw = raw.withColumn(c, _x_strip(F.col(c)))
    for c in UPPERCASED:
        raw = raw.withColumn(c, F.upper(F.trim(F.col(c))))
    raw = raw.withColumn("ammatti", F.lower(F.trim(F.col("ammatti"))))

    rec = raw.select(*_SILVER_COLS[:-1])
    return rec.withColumn("pref_label", _SILVER_COLS[-1])


def record_errors(records: DataFrame) -> DataFrame:
    """Quarantine rows mirroring output/errors.csv (person_id, name, column,
    error, original value) — src/csv_to_rdf.py:63-66."""
    name = F.concat_ws(" ", F.col("family_name_raw"), F.col("given_names_raw"))
    parts = []
    for src_col, (after, before) in DATE_FIELDS.items():
        tgt = DATE_TARGETS[src_col]
        err = D.validate_dates(
            F.col(tgt), F.col(tgt + "_str"), after=after,
            before=before or datetime.date.today(),
        )
        parts.append(
            records.select(
                F.col("person_id").cast("string").alias("person_id"),
                name.alias("name"),
                F.lit(src_col.upper()).alias("column"),
                err.alias("error"),
                F.col(tgt + "_raw").alias("value"),
            ).filter(F.col("error").isNotNull())
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
