"""Semantic + plan-shape tests for the training-data curation operators
(operators/curation.py): deterministic split, stratified quota sampling,
token-budget sequence packing, SemDeDup-style semantic dedup.

The oracle-parity leg lives in the contract queries (curation_split /
curation_quota / curation_pack / dedup_semantic); these tests pin the
SEMANTICS (recomputed independently in pandas/numpy) and the physical-plan
posture (split is zero-shuffle; packing shuffles exactly once, on shard)."""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _md5(s) -> str:
    return hashlib.md5(str(s).encode()).hexdigest()


# --------------------------------------------------------------------------
# corpus_split
# --------------------------------------------------------------------------

def test_split_is_zero_shuffle_and_deterministic(spark):
    from casualty_linking_spark.operators.curation import corpus_split

    df = corpus_split(_docs(spark))
    assert "Exchange" not in _plan(df), _plan(df)

    a = df.orderBy("doc_id").toPandas()
    b = corpus_split(_docs(spark)).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b)

    # membership depends only on doc_id: recompute one row by hand
    row = a.iloc[0]
    bucket = int(_md5(row.doc_id)[:2], 16)
    assert row.bucket == bucket
    expect = "train" if bucket < 192 else ("val" if bucket < 224 else "test")
    assert row.split == expect


def test_split_fractions_near_nominal(spark):
    from casualty_linking_spark.operators.curation import corpus_split

    counts = dict(
        corpus_split(_docs(spark)).groupBy("split").count().collect()
        and {
            r["split"]: r["count"]
            for r in corpus_split(_docs(spark)).groupBy("split").count().collect()
        }
    )
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    # 75/12.5/12.5 nominal; md5 is uniform, n=500 -> generous tolerance
    assert 0.65 <= counts["train"] / n <= 0.85
    assert 0.05 <= counts["val"] / n <= 0.20
    assert 0.05 <= counts["test"] / n <= 0.20


def test_split_stable_under_corpus_growth(spark):
    """Adding documents never moves an existing one between splits — the
    eval-contamination guarantee."""
    from casualty_linking_spark.operators.curation import corpus_split

    full = corpus_split(_docs(spark)).toPandas().set_index("doc_id")["split"]
    half = (
        corpus_split(_docs(spark).filter(F.col("doc_id") % 2 == 0))
        .toPandas()
        .set_index("doc_id")["split"]
    )
    joined = half.to_frame("h").join(full.to_frame("f"))
    assert (joined.h == joined.f).all()


# --------------------------------------------------------------------------
# quota_sample
# --------------------------------------------------------------------------

def test_quota_sample_semantics(spark):
    from casualty_linking_spark.operators.curation import quota_sample

    quota = 3
    got = quota_sample(_docs(spark), quota=quota).toPandas()
    docs = _docs(spark).select("doc_id", "lang", "source").toPandas()
    docs["key"] = docs.doc_id.map(_md5)

    # independent recompute: per stratum, the `quota` smallest md5 keys
    for (lang, source), grp in docs.groupby(["lang", "source"]):
        expect = grp.sort_values(["key", "doc_id"]).head(quota).doc_id.tolist()
        sel = got[(got.lang == lang) & (got.source == source)]
        assert sorted(sel.doc_id) == sorted(expect), (lang, source)
        assert sorted(sel.sample_rank) == list(range(1, len(expect) + 1))


# --------------------------------------------------------------------------
# pack_sequences
# --------------------------------------------------------------------------

def test_pack_sequences_semantics(spark):
    from casualty_linking_spark.operators.curation import pack_sequences

    budget, shards = 64, 4
    got = (
        pack_sequences(_docs(spark), budget=budget, n_shards=shards)
        .toPandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    docs = _docs(spark).select("doc_id", "text").toPandas()
    docs["n_tokens"] = docs.text.map(lambda t: len([w for w in str(t).split() if w]))
    docs["shard"] = docs.doc_id.map(lambda i: int(_md5(i)[:2], 16) % shards)
    docs["key"] = docs.doc_id.map(_md5)

    assert len(got) == len(docs)
    assert got.n_tokens.sum() == docs.n_tokens.sum()  # every token packed once

    for shard, grp in docs.groupby("shard"):
        grp = grp.sort_values(["key", "doc_id"]).reset_index(drop=True)
        start = grp.n_tokens.cumsum() - grp.n_tokens
        seq = shard * 1_000_000 + (start // budget)
        sel = got[got.shard == shard].reset_index(drop=True)
        assert sel.doc_id.tolist() == grp.doc_id.tolist()  # layout order
        assert sel.pos.tolist() == list(range(1, len(grp) + 1))
        assert sel.seq_id.tolist() == seq.tolist()

    # bin-start rule: a doc's sequence is exactly floor(start/budget), so a
    # sequence's token sum may undershoot the budget when its predecessor
    # overflowed into its offset range — what must hold is that each
    # sequence's docs START inside its own budget window
    for row_start, row_seq, row_shard in zip(
        got.groupby("shard").n_tokens.cumsum() - got.n_tokens, got.seq_id, got.shard
    ):
        local_bin = row_seq - row_shard * 1_000_000
        assert local_bin * budget <= row_start < (local_bin + 1) * budget


def test_pack_sequences_single_shuffle_on_shard(spark):
    from casualty_linking_spark.operators.curation import pack_sequences

    plan = _plan(pack_sequences(_docs(spark)))
    n_exchange = plan.count("Exchange ")
    assert n_exchange == 1, plan
    assert "hashpartitioning(shard" in plan, plan


# --------------------------------------------------------------------------
# semantic_dedup
# --------------------------------------------------------------------------

def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_semantic_dedup_rule_recomputed(spark):
    """Independent numpy recompute of the SemDeDup rule: x is dropped iff a
    lower-id same-cell neighbor has cosine >= tau, dup_of is the smallest
    such neighbor."""
    from casualty_linking_spark.operators.curation import semantic_dedup
    from casualty_linking_spark.operators.similarity_search import (
        N_IVF_CELLS, ivf_seed_centroids,
    )

    tau = 0.2
    got = semantic_dedup(_embs(spark), tau=tau).toPandas().set_index("vec_id")
    embs = _embs(spark).toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in embs.itertuples()}
    cents = {
        int(r["cell_id"]): np.array(r["cv"], dtype=np.float64)
        for r in ivf_seed_centroids(_embs(spark), N_IVF_CELLS).collect()
    }

    # recompute cell assignment (argmax cosine, cell_id tie-break asc)
    cells = {}
    for vid, v in vecs.items():
        best = max(sorted(cents), key=lambda c: (_cos(v, cents[c]), -c))
        cells[vid] = best
    assert {v: got.loc[v].cell_id for v in vecs} == cells

    for vid in sorted(vecs):
        prior = [
            p for p in sorted(vecs)
            if p < vid and cells[p] == cells[vid] and _cos(vecs[p], vecs[vid]) >= tau
        ]
        row = got.loc[vid]
        if prior:
            assert not row.kept and int(row.dup_of) == prior[0], vid
        else:
            assert row.kept and pd.isna(row.dup_of), vid


def test_semantic_dedup_accepts_trained_centroids(spark):
    """kmeans_centroids drops in for the seed quantizer; invariants hold for
    ANY centroid set: one row per vector, dup_of strictly below vec_id,
    kept rows have no dup_of."""
    from casualty_linking_spark.operators.curation import semantic_dedup
    from casualty_linking_spark.operators.similarity_search import kmeans_centroids

    embs = _embs(spark)
    out = semantic_dedup(
        embs, tau=0.2, centroids=kmeans_centroids(embs, n_cells=4)
    ).toPandas()
    assert len(out) == embs.count()
    assert out.vec_id.is_unique
    dropped = out[~out.kept]
    assert (dropped.dup_of < dropped.vec_id).all()
    assert out[out.kept].dup_of.isna().all()


# --------------------------------------------------------------------------
# mixture_sample
# --------------------------------------------------------------------------

def test_mixture_sample_rates_and_zero_weight(spark):
    from casualty_linking_spark.operators.curation import (
        MIXTURE_SALT, mixture_sample,
    )

    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    got = mixture_sample(_docs(spark), weights, default_weight=0.25).toPandas()
    docs = _docs(spark).select("doc_id", "source").toPandas()

    # zero-weight source fully dropped, weight-1.0 source fully kept
    assert not (got.source == "src2").any()
    assert (got.source == "src0").sum() == (docs.source == "src0").sum()

    # independent recompute of the salted-bucket rule for every doc
    kept = set(got.doc_id)
    for r in docs.itertuples():
        b = int(_md5(f"{r.doc_id}{MIXTURE_SALT}")[:2], 16)
        edge = round(weights.get(r.source, 0.25) * 256)
        assert (r.doc_id in kept) == (b < edge), (r.doc_id, r.source)


def test_mixture_sample_is_zero_shuffle_and_validates(spark):
    import pytest

    from casualty_linking_spark.operators.curation import mixture_sample

    df = mixture_sample(_docs(spark), {"src0": 0.5})
    assert "Exchange" not in _plan(df), _plan(df)
    with pytest.raises(ValueError, match="must be in \\[0, 1\\]"):
        mixture_sample(_docs(spark), {"src0": 1.5})


def test_mixture_salt_decorrelated_from_split(spark):
    """Mixing must not bias split membership: among survivors of a 50%
    mixture, the train fraction stays near the 75% nominal (same-hash
    sampling would skew it hard)."""
    from casualty_linking_spark.operators.curation import corpus_split, mixture_sample

    kept = mixture_sample(_docs(spark), {}, default_weight=0.5).select("doc_id")
    split = corpus_split(_docs(spark)).select("doc_id", "split")
    frac = (
        kept.join(split, "doc_id").toPandas().split.eq("train").mean()
    )
    assert 0.65 <= frac <= 0.85, frac


# --------------------------------------------------------------------------
# corpus_vocab
# --------------------------------------------------------------------------

def test_corpus_vocab_recomputed(spark):
    from collections import Counter

    from casualty_linking_spark.operators.text_analysis import corpus_vocab

    top_n = 5
    got = corpus_vocab(_docs(spark), top_n=top_n).toPandas()
    docs = _docs(spark).select("text").toPandas()
    cnt = Counter()
    import re
    for t in docs.text:
        cnt.update(w for w in re.split(r"\W+", str(t).lower()) if w)
    total = sum(cnt.values())
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]

    assert list(got.word) == [w for w, _ in expect]
    assert list(got.n) == [n for _, n in expect]
    assert list(got["rank"]) == list(range(1, top_n + 1))
    cum = 0
    for i, (_, n) in enumerate(expect):
        cum += n
        assert abs(got.cum_frac[i] - round(cum / total, 6)) < 1e-9


def test_corpus_vocab_plans_take_ordered(spark):
    """The top-n must be a distributed TakeOrdered, never a global sort of
    the vocabulary."""
    from casualty_linking_spark.operators.text_analysis import corpus_vocab

    plan = _plan(corpus_vocab(_docs(spark), top_n=10))
    assert "TakeOrderedAndProject" in plan, plan


def _tfdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_hand_corpus(spark):
    """Hand-checked smoothed TF-IDF: N=3 tokenized docs (NULL text ignored),
    tf * ln((N+1)/(df+1)) rounded to 6 dp, ranked per doc."""
    import math

    from casualty_linking_spark.operators.text_analysis import tfidf_top_terms

    docs = _tfdocs(spark, [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry banana cherry"),
        (4, None),
    ])
    out = {
        (r.doc_id, r.word): (r.tf, r.df, r.tfidf, r.rank)
        for r in tfidf_top_terms(docs, k=5).collect()
    }
    # df: apple 1, banana 3, cherry 2; N = 3
    assert out[(1, "apple")] == (2, 1, round(2 * math.log(4 / 2), 6), 1)
    assert out[(1, "banana")] == (1, 3, 0.0, 2)
    assert out[(2, "cherry")] == (1, 2, round(math.log(4 / 3), 6), 1)
    assert out[(3, "cherry")] == (2, 2, round(2 * math.log(4 / 3), 6), 1)
    assert (4, None) not in {(d, None) for d, _ in out}  # no rows for NULL doc
    assert all(d != 4 for d, _ in out)


def test_tfidf_tie_breaks_alphabetically_and_k_cuts(spark):
    from casualty_linking_spark.operators.text_analysis import tfidf_top_terms

    docs = _tfdocs(spark, [(1, "zeta alpha"), (2, "filler words here")])
    out = tfidf_top_terms(docs, k=1).collect()
    by_doc = {r.doc_id: r for r in out}
    # doc 1: zeta and alpha have identical (tf=1, df=1) => identical tfidf;
    # the word tie-break must pick 'alpha', and k=1 keeps exactly one row
    assert len(out) == len(by_doc) == 2
    assert by_doc[1].word == "alpha" and by_doc[1].rank == 1


def test_bigram_model_conditional_probabilities(spark):
    """Bigrams never cross documents; P(w2|w1) normalizes over each w1's
    continuations; single-word and NULL docs contribute nothing."""
    from casualty_linking_spark.operators.text_analysis import bigram_model

    docs = _tfdocs(spark, [
        (1, "a b a b"),
        (2, "b a"),
        (3, "a c"),
        (4, "solo"),
        (5, None),
    ])
    out = {(r.w1, r.w2): (r.n, r.p) for r in bigram_model(docs).collect()}
    # doc1: (a,b)x2 (b,a)x1; doc2: (b,a); doc3: (a,c)
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("a", "c")] == (1, round(1 / 3, 6))
    assert out[("b", "a")] == (2, 1.0)
    assert len(out) == 3
