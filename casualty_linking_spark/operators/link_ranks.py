"""J3 — rank linking: rank literal -> rank ontology URI.

Reference behavior (link_ranks call, src/linker.py:267-270): after the
URI_MAPPINGS literal repairs ('Alipuseeri'->'Aliupseeri', 'Alikers'->
'Alikersantti', src/process.py:24-25, applied in the records stage), the
SOTARVO literal is matched against rank prefLabels/altLabels by
case-insensitive label equality. Spark plan: broadcast hash equi-join on
lower(label) + deterministic per-record argmax (prefLabel over altLabel,
then rank_uri — the reference's dict iteration order is made a stable total
order, SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import namespaces as NS

# Per-call Column pieces built once per process (immutable, name-bound; the
# same py4j-overhead rationale as the other linkers' memoized trees).
_MISC: dict | None = None


def _misc() -> dict:
    global _MISC
    if _MISC is None:
        _MISC = {
            "join_cond": F.lower(F.trim(F.col("rank_literal"))) == F.lower(F.col("label")),
            "w": Window.partitionBy("rank_literal").orderBy(
                F.col("is_pref").desc(), F.col("rank_uri").asc()
            ),
            "row": [
                F.col("record_uri").alias("subj"),
                F.lit(NS.cas("rank")).alias("pred"),
                F.col("rank_uri").alias("obj"),
                F.lit("uri").alias("obj_type"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("string").alias("datatype"),
                F.lit("rank_links").alias("graph_kind"),
            ],
        }
    return _MISC


def link_ranks(records: DataFrame, rank_labels: DataFrame) -> DataFrame:
    """-> triples (record_uri, SCHEMA_CAS.rank, rank_uri).

    Resolution happens per DISTINCT literal (the rank vocabulary is a few
    hundred strings at any corpus size), so the only full-data operation is
    a broadcast hash join — no shuffle of the record stream at all.
    coalesce(1) after the vocabulary distinct: same single-task reasoning
    as the unit/occupation linkers."""
    m = _misc()
    recs = records.filter(F.col("rank_literal").isNotNull()).select(
        "record_uri", "rank_literal"
    )
    lits = recs.select("rank_literal").distinct().coalesce(1)
    cands = lits.join(F.broadcast(rank_labels), m["join_cond"])
    best_lit = cands.withColumn("rn", F.row_number().over(m["w"])).filter(F.col("rn") == 1)
    best = recs.join(F.broadcast(best_lit.select("rank_literal", "rank_uri")), "rank_literal")
    return best.select(*m["row"])
