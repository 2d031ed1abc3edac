"""Training-data curation operators: the selection / packaging stages a
large-scale LLM data pipeline runs AFTER cleaning and dedup — deterministic
corpus splitting, stratified quota sampling, token-budget sequence packing,
and semantic (embedding-cluster) deduplication.

Reference scope note: the reference pipeline (SemanticComputing/
Casualty-linking) stops at emitting enrichment links; these operators cover
the downstream corpus-curation stages a transcript-scale deployment of the
same engine needs (SURVEY.md §2's training-data family). Algorithms derive
from public work: SemDeDup (Abbas et al., arXiv:2303.09540), Gopher/C4-style
quota curation, and the standard concat-then-chunk sequence packing used by
LLM data loaders.

All determinism comes from md5 over stable ids — reproducible in any engine
(the DuckDB oracles rebuild identical output), no RNG state. That property
is what makes a 100 TB curation run auditable and re-runnable: membership of
a document in train/val/test or in a sample depends only on its id, never on
partitioning, task order, or cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text_analysis import token_count_ws

HEX = "0123456789abcdef"


def hash_bucket(id_col: Column, buckets: int = 256, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from the first two hex chars of
    md5(id || salt) — 256 base buckets, so ``buckets`` must divide into that
    space evenly for unbiased splits (use 2/4/8/.../256). Pure projection:
    fuses into any scan, zero shuffle, engine-independent (DuckDB renders
    the same value via nibble lookup). Independent sampling decisions over
    the same ids (split vs mixture vs packing shard) use distinct ``salt``s
    so their buckets are uncorrelated."""
    if not 1 <= buckets <= 256:
        raise ValueError(f"buckets must be in [1, 256], got {buckets}")
    key = id_col.cast("string")
    if salt:
        key = F.concat(key, F.lit(salt))
    b = F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("int")
    return b % buckets if buckets < 256 else b


def duckdb_hash_bucket(id_expr: str, buckets: int = 256, salt: str = "") -> str:
    """DuckDB rendering of :func:`hash_bucket` (nibble-lookup hex parse)."""
    key = f"CAST({id_expr} AS VARCHAR)"
    if salt:
        key = f"{key} || '{salt}'"
    h = f"md5({key})"
    raw = (
        f"((instr('{HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + instr('{HEX}', substr({h}, 2, 1)) - 1)"
    )
    return raw if buckets == 256 else f"({raw} % {buckets})"


MIXTURE_SALT = "|mix"


def mixture_sample(
    documents: DataFrame, weights: dict[str, float], default_weight: float = 1.0
) -> DataFrame:
    """(doc_id, lang, source) — deterministic data-mixing downsample: a
    document from ``source`` s survives iff its salted hash bucket falls
    below ``round(weights.get(s, default) * 256)``. This is how a training
    mix ("keep 100% of books, 25% of web crawl, ...") is applied at corpus
    scale: a zero-shuffle filter fused into the scan, reproducible (bucket
    depends only on doc_id), stable under corpus growth, and salted
    independently from :func:`corpus_split` so mixing never biases
    train/val/test membership. Weights outside [0, 1] are rejected rather
    than clamped silently."""
    for s, w in {**weights, "<default>": default_weight}.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"mixture weight for {s!r} must be in [0, 1], got {w}")
    b = hash_bucket(F.col("doc_id"), salt=MIXTURE_SALT)
    edge = F.lit(round(default_weight * 256))
    for s, w in sorted(weights.items()):
        edge = F.when(F.col("source") == s, F.lit(round(w * 256))).otherwise(edge)
    return documents.filter(b < edge).select("doc_id", "lang", "source")


def corpus_split(
    documents: DataFrame, train: float = 0.75, val: float = 0.125
) -> DataFrame:
    """(doc_id, lang, source, bucket, split) — deterministic train/val/test
    assignment by hash bucket. Membership depends only on doc_id: growing
    the corpus, re-partitioning, or re-running never moves a document
    between splits (the property that keeps eval sets uncontaminated across
    pipeline re-runs). Zero-shuffle projection — at 100 TB this fuses into
    the scan that writes the partitioned output
    (``.write.partitionBy("split")``)."""
    t_edge = round(256 * train)
    v_edge = round(256 * (train + val))
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < t_edge, F.lit("train"))
        .when(b < v_edge, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.select(
        "doc_id", "lang", "source", b.alias("bucket"), split.alias("split")
    )


def quota_sample(documents: DataFrame, quota: int = 40) -> DataFrame:
    """(doc_id, lang, source, sample_rank) — per-(lang, source) stratum, the
    ``quota`` documents with the smallest md5(doc_id), ranked. A determinate
    "uniform N per stratum" sample: the md5 order is a fixed random
    permutation, so this is reservoir sampling with a reproducible seed and
    no RNG state.

    Scale: one shuffle on the stratum key. Stratum cardinality is small
    (languages × sources) but strata are huge at 100 TB; because the rank
    key IS the hash, a two-phase plan stays exact: broadcast per-stratum
    counts, pre-filter ``md5 < quantile-estimate`` (keeping a safety
    oversample), then window only the survivors — the window's sort then
    touches ~quota·oversample rows per stratum instead of the full stratum.
    The single-phase shape below is the oracle-checked contract; the
    pre-filter is an optimization gated on stratum size at deploy time."""
    order_key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang", "source").orderBy(order_key.asc(), F.col("doc_id").asc())
    return (
        documents.select("doc_id", "lang", "source")
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )


def pack_sequences(
    documents: DataFrame, budget: int = 256, n_shards: int = 8
) -> DataFrame:
    """(doc_id, shard, pos, n_tokens, seq_id) — concat-then-chunk sequence
    packing: documents are laid out in a deterministic order (md5 within
    hash shard) and assigned to fixed token-budget sequences by the offset
    at which they START (bin-start rule): ``seq = floor(start_offset /
    budget)``. Whole documents are never split here — the downstream
    tokenizer splits at exact token boundaries; this operator decides
    grouping, the expensive distributed part.

    Semantics of the bin-start rule: a document belongs to the sequence
    whose offset window [k·budget, (k+1)·budget) contains its start offset.
    A longer-than-budget document overflows into the next window(s), so bin
    ids may skip and the following sequence can hold fewer than ``budget``
    tokens (its window is partly filled by the overflow) — the downstream
    tokenizer's exact chunking absorbs those residuals. Sequences are
    identified, not dense-numbered.

    Scale: ONE shuffle (hash-partition by shard) and a per-shard sort —
    never a global sort. ``n_shards`` is sized to the cluster (one shard ≈
    one task's worth of corpus); packing is embarrassingly parallel across
    shards, and the layout is stable under re-runs because order depends
    only on ids."""
    toks = token_count_ws(F.col("text")).alias("n_tokens")
    order_key = F.md5(F.col("doc_id").cast("string"))
    d = documents.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), buckets=n_shards).alias("shard"),
        toks,
        order_key.alias("_ord"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_ord").asc(), F.col("doc_id").asc())
    cum = F.sum("n_tokens").over(w)
    return (
        d.withColumn("pos", F.row_number().over(w))
        .withColumn(
            "seq_id",
            F.col("shard").cast("long") * 1_000_000
            + F.floor((cum - F.col("n_tokens")) / budget),
        )
        .select("doc_id", "shard", "pos", "n_tokens", "seq_id")
    )


def semantic_dedup(
    embeddings: DataFrame,
    tau: float = 0.2,
    n_cells: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cell_id, kept, dup_of) — SemDeDup (Abbas et al.,
    arXiv:2303.09540): cluster the embedding space coarsely, then drop a
    document when a same-cluster neighbor exceeds cosine ``tau``. Keeps the
    lowest vec_id of each within-cell neighborhood: x is dropped iff some
    y < x in its cell has cosine(x, y) ≥ tau; ``dup_of`` is the smallest
    such y (NULL for kept rows). Unlike pairwise LSH near-dup
    (dedup.embedding_near_dup_pairs) this prunes by SEMANTIC redundancy —
    same-meaning documents that share no shingles — the curation step shown
    to improve LLM training efficiency on web corpora.

    Scale: cell assignment is the shuffle-free literal-centroid expression
    shared with the IVF index (similarity_search._assign_cells); the only
    shuffle is the within-cell self-join, whose cost is Σ|cell|², bounded by
    training k-means with n_cells ∝ corpus size so cells stay ~constant
    (kmeans_centroids drops in via ``centroids``, same as ivf_topk). The
    seed-centroid default keeps the operator oracle-reproducible."""
    from .similarity_search import _as_double, _assign_cells, cosine, ivf_seed_centroids

    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    cents = centroids if centroids is not None else ivf_seed_centroids(embeddings, n_cells)
    # materialize the cell assignment once (lazy checkpoint): it feeds BOTH
    # self-join sides and the final join-back, and the renamed projections
    # defeat exchange reuse — without this the corpus-wide assignment
    # expression runs three times (in production the assignment IS a
    # persisted table, cf. ivf_write's partition keys)
    assigned = _assign_cells(e, "vec_id", "v", cents, n_keep=1).localCheckpoint(eager=False)

    a = assigned.select(
        F.col("cell_id"), F.col("vec_id").alias("prior_id"), F.col("v").alias("pv")
    )
    b = assigned.select("cell_id", "vec_id", "v")
    dups = (
        b.join(a.hint("shuffle_hash"), "cell_id")
        .filter(F.col("prior_id") < F.col("vec_id"))
        .filter(cosine(F.col("pv"), F.col("v")) >= tau)
        .groupBy("vec_id")
        .agg(F.min("prior_id").alias("dup_of"))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )
