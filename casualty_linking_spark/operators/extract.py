"""T1 — mention extraction from transcript turns.

Per BASELINE.json input_hint, casualty-record fields arrive embedded in turn
``text``; extraction finds the register fields that the reference reads as
CSV columns (src/mapping.py:96-317 keys). All extraction is JVM-side
``regexp_extract`` (whole-stage codegen; no Python in this hot path — at
10^12 turns this stage dominates scan cost, so it must stay in Tungsten).

Output is long-form-free: one row per turn with one nullable column per
field; a field absent from a turn is null, so the map-side partial agg in
T2's groupBy collapses each conversation's fields without a second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Register field names, mirroring reference src/mapping.py:96-317.
FIELDS = [
    "SNIMI", "ENIMET", "SSAATY", "SPUOLI", "KANSALAISUUS", "KANSALLISUUS",
    "AIDINKIELI", "LASTENLKM", "AMMATTI", "SOTARVO", "JOSKOODI", "JOSNIMI",
    "SAIKA", "SKUNTA", "KIRJKUNTA", "ASKUNTA", "HAAVAIKA", "HAAVKUNTA",
    "HAAVPAIKKA", "KATOAIKA", "KATOKUNTA", "KATOPAIKKA", "KUOLINAIKA",
    "KUOLINKUNTA", "KUOLINPAIKKA", "MENEHTLUOKKA", "HKUNTA", "HMAA",
    "HPAIKKA", "VAPAA_PAIKKATIETO",
]


def field_pattern(field: str) -> str:
    # \b guards against suffix collisions (SNIMI inside JOSNIMI).
    return rf"\b{field}=([^;]*)"


# Column expression trees are immutable and bound by NAME (unresolved until
# attached to a DataFrame), so the per-field extraction/aggregation lists can
# be built once and shared by every query in the process — rebuilding them
# costs one py4j round trip per nested call (hundreds per invocation), pure
# driver overhead inside the timed pipeline. Built lazily because Column
# construction needs a live JVM.
_MENTION_COLS: list | None = None
_AGG_COLS: list | None = None


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx) + one nullable string column per register field."""
    global _MENTION_COLS
    if _MENTION_COLS is None:
        _MENTION_COLS = [
            F.nullif(F.trim(F.regexp_extract("text", field_pattern(f), 1)), F.lit(""))
            .alias(f.lower())
            for f in FIELDS
        ]
    return transcripts.select("conv_id", "turn_idx", *_MENTION_COLS)


def mentions_to_raw_records(mentions: DataFrame) -> DataFrame:
    """Collapse per-turn mentions to one raw record per conversation.

    Each field occurs in at most one turn, so ``max`` (null-skipping, with a
    map-side partial) is the collapse. person_id is recovered from conv_id
    and the record URI minted as DATA_CAS 'p{id}' (reference
    src/csv_to_rdf.py:187-188). One shuffle, keyed by conv_id.
    """
    global _AGG_COLS
    if _AGG_COLS is None:
        _AGG_COLS = [F.max(f.lower()).alias(f.lower()) for f in FIELDS]
    aggs = _AGG_COLS
    recs = mentions.groupBy("conv_id").agg(*aggs)
    # take everything after the 'conv_' prefix (no fixed width — a bounded
    # substring would silently truncate and collide large pids)
    pid = F.expr("substring(conv_id, 6)").cast("bigint")
    return recs.withColumn("person_id", pid).withColumn(
        "record_uri",
        F.concat(F.lit("http://ldf.fi/warsa/casualties/p"), F.col("person_id").cast("string")),
    )
