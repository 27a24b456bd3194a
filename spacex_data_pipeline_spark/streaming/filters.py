"""Streaming training-data filter — the engine's core use case as a stream.

A crawl feed filtered ON ARRIVAL: per-document quality scoring plus
benchmark decontamination, all STATELESS (narrow maps + one broadcast),
so the stream needs no watermark, no state store, and restarts are free.
The batch twin is the same column expressions over the same operators
(`operators/text.py`, `operators/dedup.contamination_flags`); replay
equality is proven in tests/test_streaming.py.

Contamination here rides as a broadcast ARRAY overlap instead of the
batch path's shingle anti-join: the benchmark's distinct k-gram set is
packed into ONE row (`pack_benchmark_shingles`) and every document row
checks `arrays_overlap` against it — per-row, map-side, streaming-safe.
Equivalent to the join for any benchmark that fits a broadcast (they all
do — eval sets are tiny next to a crawl); the join form remains the
batch/backfill path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import normalize_text, shingles_from_words
from ..operators.text import punct_ratio


def pack_benchmark_shingles(
    benchmark: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """ONE row holding the benchmark's distinct word-k-shingles as an
    array — the broadcastable form of the decontamination set. Build
    once per benchmark release, reuse across micro-batches."""
    sh = benchmark.select(
        F.explode(
            shingles_from_words(F.split(normalize_text(F.col(text_col)), " "), k)
        ).alias("s")
    )
    return sh.agg(F.collect_set("s").alias("__bench"))


def training_filter_stream(
    docs: DataFrame,
    bench_packed: DataFrame,
    min_quality: float = 0.5,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keep/drop decision for a document stream:
    (id, quality, contaminated, keep). Works identically on a batch
    DataFrame — same expressions, two execution modes.

    quality is the length/diversity/punctuation blend of
    ``operators.text.quality_score`` (token array projected once — the
    expression-inlining discipline); contaminated is an arrays_overlap
    against the broadcast benchmark shingle set. Everything is a narrow
    map over the stream; the only non-map input is the one-row broadcast.
    """
    t = F.col(text_col)
    toks = F.col("__toks")
    with_toks = docs.select(
        F.col(id_col),
        t,
        F.split(normalize_text(t), " ").alias("__toks"),
    ).crossJoin(F.broadcast(bench_packed))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    length_credit = F.least(F.length(t).cast("double") / F.lit(500.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tok
    quality = (
        length_credit * F.lit(0.4)
        + diversity * F.lit(0.4)
        + (F.lit(1.0) - punct_ratio(t)) * F.lit(0.2)
    )
    contaminated = F.coalesce(
        F.arrays_overlap(shingles_from_words(toks, k), F.col("__bench")),
        F.lit(False),  # empty benchmark -> overlap is NULL, not a match
    )
    return with_toks.select(
        F.col(id_col),
        F.round(quality, 6).alias("quality"),
        contaminated.alias("contaminated"),
        ((F.round(quality, 6) >= min_quality) & ~contaminated).alias("keep"),
    )


def pack_trigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE row holding the corpus-trigram LM as a broadcastable map
    (trigram → occurrence count) plus the total mass — the frozen-model
    form of operators/text.trigram_typicality's corpus statistics.
    Production shape: train nightly on the corpus snapshot, broadcast
    into the scoring stream; the map is bounded by |charset|³."""
    from ..operators.text import char_trigrams

    norm = docs.select(normalize_text(F.col(text_col)).alias("__s"))
    occ = norm.select(F.explode(char_trigrams(F.col("__s"))).alias("tri"))
    m = occ.groupBy("tri").agg(F.count(F.lit(1)).alias("c"))
    return m.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("tri", "c")))
        ).alias("__model"),
        F.sum("c").alias("__tt"),
    )


def typicality_stream(
    docs: DataFrame,
    model_packed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents ON ARRIVAL against a frozen trigram model — the
    streaming twin of text.trigram_typicality, STATELESS (one broadcast
    + narrow maps, no watermark, no state store). Works identically on
    a batch frame; for any document whose trigrams all appear in the
    model (every doc of the training corpus itself), the score is
    BIT-IDENTICAL to the batch operator: the per-doc numerator is an
    integer fold (order-free), and the final multiply+divide is the
    same two IEEE ops. Unseen trigrams count 0 — a fully-novel doc
    scores 0.0, the correct 'atypical' extreme; sub-3-char docs score
    NULL with 0 trigrams, matching batch."""
    from ..operators.text import char_trigrams

    t = docs.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__s")
    ).crossJoin(F.broadcast(model_packed))
    w = t.select(
        F.col(id_col), char_trigrams(F.col("__s")).alias("__tris"), "__model", "__tt"
    )
    num = F.aggregate(
        F.col("__tris"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.coalesce(F.element_at(F.col("__model"), x), F.lit(0).cast("long")),
    )
    n = F.size(F.col("__tris"))
    return w.select(
        F.col(id_col),
        n.cast("int").alias("n_trigrams"),
        F.when(
            n > 0,
            num.cast("double")
            / (F.col("__tt").cast("double") * n.cast("double")),
        ).alias("typicality"),
    )


def pack_model_weights(weights: DataFrame, dims: int = 32) -> DataFrame:
    """ONE row holding both model weight vectors as dims-element arrays
    (position = bucket) — the broadcastable form of
    ``operators.text.model_weights``'s output for the stateless
    streaming gate. Fit offline on a corpus snapshot, pack once, reuse
    across micro-batches (the pack_benchmark_shingles pattern). Buckets
    absent from the fit corpus weigh 0."""
    filled = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda b: F.coalesce(
            F.element_at(F.map_from_entries(F.col("__m")), b), F.lit(0).cast("long")
        ),
    )
    packed = weights.agg(
        F.collect_list(F.struct(F.col("bucket").cast("long"), F.col("w_cls"))).alias(
            "__m"
        ),
        F.collect_list(
            F.struct(F.col("bucket").cast("long"), F.col("w_dsir"))
        ).alias("__m2"),
    )
    return packed.select(
        filled.alias("w_cls_arr"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda b: F.coalesce(
                F.element_at(F.map_from_entries(F.col("__m2")), b),
                F.lit(0).cast("long"),
            ),
        ).alias("w_dsir_arr"),
    )


def model_gate_stream(
    docs: DataFrame,
    weights_packed: DataFrame,
    dims: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based curation ON ARRIVAL: each document's classifier and
    DSIR scores computed as a PER-ROW fold over its tokens against the
    broadcast packed weight vectors — no per-doc groupBy, no state, no
    watermark; restarts are free (the training_filter_stream
    discipline). Emits ``(id, s_cls, s_dsir, keep)`` with
    keep := both scores positive — the same gate prep-training's
    --model-filter applies in batch.

    Exactness: Σ_token w[bucket(token)] ≡ Σ_bucket tf·w_b — integer
    addition is associative, so the per-row fold equals the batch
    aggregation EXACTLY for any token order (replay == batch proven in
    tests/test_streaming.py). The md5 bucket is the same
    oracle-replayable hash the batch path uses."""
    from ..functions.hashing import md5_int60
    from ..operators.text import tokens

    t = docs.withColumn("__toks", tokens(F.col(text_col)))
    buckets = F.transform(
        F.col("__toks"), lambda tok: (md5_int60(tok) % dims).cast("int")
    )
    t = t.crossJoin(F.broadcast(weights_packed)).withColumn("__b", buckets)
    fold = lambda arr: F.aggregate(  # noqa: E731
        F.col("__b"),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(F.col(arr), b + 1),
    )
    return t.select(
        F.col(id_col),
        fold("w_cls_arr").alias("s_cls"),
        fold("w_dsir_arr").alias("s_dsir"),
    ).withColumn("keep", (F.col("s_cls") > 0) & (F.col("s_dsir") > 0))
