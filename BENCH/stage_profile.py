import time, sys
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
from casualty_linking_spark.session import get_spark
from casualty_linking_spark import dims, synth
from casualty_linking_spark.operators import extract, records as REC
from casualty_linking_spark.operators.link_occupations import link_occupations
from casualty_linking_spark.operators.link_ranks import link_ranks
from casualty_linking_spark.operators.link_units import link_units
from casualty_linking_spark.operators.triples import records_to_triples, union_graphs
cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(cores=cores)
def tt(label, fn):
    t0=time.perf_counter(); r=fn(); print(label, round(time.perf_counter()-t0,2), flush=True); return r

if "--pipeline" in sys.argv:
    # Per-stage walls of a full Pipeline.run (stage = parquet write + manifest):
    # the unit-linker cost must appear ONCE (t3_unit_stage) with
    # t3_unit_links / t3_related_periods as cheap filters over its parquet.
    import tempfile
    from casualty_linking_spark.plans.pipeline import Pipeline
    t = synth.transcripts_range(spark, n)
    p = Pipeline(spark, tempfile.mkdtemp(prefix="stageprof_"), t)
    orig = p._stage
    def timed_stage(name, inputs, build, **kw):
        t0 = time.perf_counter()
        out = orig(name, inputs, build, **kw)
        print(f"stage {name}", round(time.perf_counter() - t0, 2), flush=True)
        return out
    p._stage = timed_stage
    tt("pipeline_total", lambda: p.run().count())
    spark.stop()
    sys.exit(0)
# warmup small
t = synth.transcripts_range(spark, 2000)
rec0 = REC.build_records(extract.mentions_to_raw_records(extract.extract_mentions(t))).localCheckpoint(eager=True)
d = dims.broadcast_dims(spark)
union_graphs(records_to_triples(rec0, d["cemeteries"]), link_ranks(rec0, d["rank_labels"]), link_occupations(rec0, d["occupations"]), *link_units(rec0, d["unit_labels"])).count()
print("warmed", flush=True)
t = synth.transcripts_range(spark, n)
rec = tt("silver", lambda: REC.build_records(extract.mentions_to_raw_records(extract.extract_mentions(t))).localCheckpoint(eager=True))
tt("cas", lambda: records_to_triples(rec, d["cemeteries"]).count())
tt("rank", lambda: link_ranks(rec, d["rank_labels"]).count())
tt("occ", lambda: link_occupations(rec, d["occupations"]).count())
tt("unit", lambda: link_units(rec, d["unit_labels"])[0].count())
spark.stop()
