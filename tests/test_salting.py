"""Skew-salting invariance: salted and unsalted person-linkage produce
identical links (salting only re-shapes the shuffle, never the result)."""

from casualty_linking_spark import dims, synth
from casualty_linking_spark.operators import extract, records as R
from casualty_linking_spark.operators.link_persons import casualty_features, link_persons
from casualty_linking_spark.operators.link_ranks import link_ranks
from casualty_linking_spark.operators.link_units import link_units


def test_salted_linkage_matches_unsalted(spark):
    rec = R.build_records(
        extract.mentions_to_raw_records(
            extract.extract_mentions(synth.transcripts_range(spark, 200))
        )
    ).localCheckpoint(eager=True)
    rl = link_ranks(rec, dims.dim_rank_labels(spark))
    ul, _ = link_units(rec, dims.dim_unit_labels(spark))
    feats = casualty_features(
        rec, rl, ul, dims.dim_ranks(spark), dims.dim_municipalities(spark)
    ).localCheckpoint(eager=True)

    spark.range(200).selectExpr("id AS pid").createOrReplaceTempView("range_pids")
    actors = spark.sql(
        "WITH " + synth.synth_sql("spark", pid_source="range_pids") + ",\n"
        + synth.actors_sql("spark") + "\nSELECT * FROM actors"
    )

    plain = {(r.subj, r.obj) for r in link_persons(feats, actors, salt_buckets=1).collect()}
    salted = {(r.subj, r.obj) for r in link_persons(feats, actors, salt_buckets=4).collect()}
    assert plain == salted
    assert len(plain) > 100
