"""Deduplication operators (driver north-star extension; SURVEY.md §2.5).

Not in the reference (its append pipeline *creates* duplicates —
spacex_api_dag.py:49; our dedup-on-read fix lives in sources/sinks.py).
These are the training-data-pipeline dedup family, each designed for the
100 TB posture:

- exact: hash-groupBy on content — one shuffle on a 64-bit content hash,
  never on the full text.
- MinHash + LSH banding: shingle → signature → band buckets → bucket join.
  Candidate generation is linear in corpus size (docs × bands rows); the
  quadratic blowup is confined to per-bucket pair expansion.
- SimHash: 64-bit fingerprints via bit-vote hash aggregation; near-dup =
  small Hamming distance, candidates via band-equality on fingerprint
  blocks (pigeonhole: distance ≤ 3 ⇒ some 16-bit block equal).
- n-gram Jaccard: exact set similarity on word shingles via explode +
  equi-join on shingle — the verifiable ground truth for the approximate
  methods (has a DuckDB oracle).
- embedding cosine: exact near-dup pairs above a cosine threshold; the
  scale path is the LSH bucketing in operators/similarity.py.

All hashing is xxhash64 (JVM-side, seed-stable) — signatures and buckets
are reproducible across runs, cluster layouts, and restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    band_keys,
    normalize_text,
    shingle_hashes_from_words,
    shingles_from_words,
)


def materialize(df: DataFrame, checkpoint: str = "local") -> DataFrame:
    """Materialize an intermediate a plan references many times, by one of
    three strategies — the executor-loss trade (ADVICE r5) as a CALLER
    CHOICE instead of module prose:

    - ``"local"`` (default): ``localCheckpoint(eager=True)`` — fastest
      (executor-local blocks, no lineage). An executor loss mid-job
      kills the job instead of recomputing; right for this single-JVM
      harness and restartable batch audits.
    - ``"reliable"``: ``checkpoint(eager=True)`` — blocks written to the
      session's ``spark.sparkContext.setCheckpointDir`` (HDFS/object
      store on a cluster). Survives executor loss; costs a durable
      write. The long-multi-tenant-100 TB-run setting. Raises a clear
      error if no checkpoint dir is configured.
    - ``"persist"``: ``persist(DISK_ONLY)`` + an eager ``count()`` —
      keeps LINEAGE (lost partitions recompute instead of failing the
      job) at local-disk cost, no checkpoint dir needed.

    Eager in all three modes, deliberately: a lazy materialization does
    not dedupe compute across a plan's references within the first
    action (measured: minhash 2.6→3.5 s, simhash 5.0→6.5 s, jaccard
    2.0→2.6 s with eager=False)."""
    if checkpoint == "local":
        return df.localCheckpoint()
    if checkpoint == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().checkpointDir().isEmpty():
            raise ValueError(
                "checkpoint='reliable' needs "
                "spark.sparkContext.setCheckpointDir(<hdfs/s3/dbfs path>)"
            )
        return df.checkpoint()
    if checkpoint == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()
        return out
    raise ValueError(
        f"checkpoint must be 'local' | 'reliable' | 'persist', got {checkpoint!r}"
    )


def exact_dedup_first(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content value.

    groupBy(content) would shuffle whole documents; grouping on the content
    itself is still fine for correctness, but at 100 TB shuffle the 8-byte
    xxhash64 instead and keep one representative via min(id). Hash
    collisions (~2^-64) are acceptable for dedup; use the two-level
    (hash, then verify) variant when they are not.
    """
    return (
        df.groupBy(F.xxhash64(F.col(content_col)).alias("__h"))
        .agg(F.min(id_col).alias(id_col))
        .drop("__h")
    )


def exact_dedup_rows(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Full surviving rows (not just ids): window row_number over the
    content hash, ordered by id — one shuffle, deterministic survivor."""
    w = Window.partitionBy(F.xxhash64(F.col(content_col))).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def line_dedup_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    two_level: bool = False,
    scope_col: str | None = None,
    with_norm: bool = False,
) -> DataFrame:
    """Per-line exact dedup flags, C4/RefinedWeb-style: explode each doc
    into lines, normalize (lowercase + collapse whitespace + trim), and
    keep only the FIRST occurrence of each normalized line corpus-wide —
    the standard boilerplate killer (nav bars, cookie banners, footers
    repeat verbatim across a crawl).

    Returns one row per line: (id, line_no, line, keep BOOLEAN).
    Semantics:

    - first occurrence = lowest (id, line_no) — deterministic, layout-
      and partitioning-invariant, append-stable for stable ids.
    - blank-after-normalization lines are ALWAYS kept: they are document
      structure, not duplicable content, and routing them through the
      dedup window would put every blank line in the corpus into one
      window partition (the worst skew key imaginable at 100 TB). Each
      blank line instead gets a per-row unique window key, so the
      partition is a singleton and row_number() == 1 trivially.

    Scale shape: ONE shuffle, on the 8-byte xxhash64 of the normalized
    line (never the line text). Remaining skew: a non-blank line
    duplicated D times is a D-row window partition — at crawl scale the
    hot lines ("Home", separators) are exactly the ones that explode.
    ``two_level=True`` switches to the skew-bounded form: a
    min(struct(id, line_no)) AGGREGATE picks each line's winner —
    partial aggregation caps any reducer's input at one partial per
    upstream partition, so no key can form a D-row reducer — then the
    winner set joins back onto the lines (second corpus shuffle; the
    hot-key join partitions are 1-row-build-side and AQE-splittable).
    Same flags, proven equal by test; the default window form is one
    shuffle cheaper and right whenever max line-df is sane.

    ``scope_col`` narrows first-occurrence to WITHIN each scope value
    (e.g. per source/domain — boilerplate usually repeats per site, and
    scoping keeps a legitimate line that happens to exist on two
    unrelated sites alive in both): the scope joins the dedup key, the
    window semantics are otherwise identical, and the scope column is
    carried through the output.

    ``with_norm=True`` carries the operator's OWN normalization out as
    two extra columns — ``norm`` (the dedup-key text) and ``is_blank``
    — so downstream reports count blanks by the same definition the
    dedup used instead of re-deriving the expression (VERDICT r6 nit
    #4). Default output schema is unchanged.

    Oracle parity caveat (same trade as ngram_jaccard_pairs): Spark
    groups on xxhash64(norm) longs while a SQL oracle groups on the
    normalized string — identical modulo 64-bit collisions (~2^-64).
    """
    carry = [F.col(id_col)] + ([F.col(scope_col)] if scope_col else [])
    lines = docs.select(
        *carry,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " "))
    nb_key = (
        F.xxhash64(F.col(scope_col), norm) if scope_col else F.xxhash64(norm)
    )
    lines = (
        lines.withColumn("__norm", norm)
        .withColumn("__blank", F.col("__norm") == "")
        .withColumn(
            "__k",
            F.when(
                F.col("__blank"), F.xxhash64(F.col(id_col), F.col("line_no"))
            ).otherwise(nb_key),
        )
    )

    def _out(df: DataFrame) -> DataFrame:
        if with_norm:
            return df.withColumnRenamed("__norm", "norm").withColumnRenamed(
                "__blank", "is_blank"
            )
        return df.drop("__norm", "__blank")

    if two_level:
        winners = (
            lines.filter(~F.col("__blank"))
            .groupBy("__k")
            .agg(F.min(F.struct(id_col, "line_no")).alias("__w"))
        )
        return _out(
            lines.join(winners, "__k", "left")
            .withColumn(
                "keep",
                F.col("__blank")
                | (F.struct(F.col(id_col), F.col("line_no")) == F.col("__w")),
            )
            .drop("__k", "__w")
        )
    w = Window.partitionBy("__k").orderBy(id_col, "line_no")
    return _out(
        lines.withColumn(
            "keep", F.col("__blank") | (F.row_number().over(w) == 1)
        ).drop("__k")
    )


def line_dedup_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Reassembled line-deduplicated corpus: every doc survives, with its
    duplicate lines removed and the remainder rejoined in original order.

    Returns (id, n_lines, n_kept, n_kept_nonblank, text_dedup). Two
    shuffles total: the line-hash window (line_dedup_flags) and the
    per-doc reassembly groupBy — both on narrow keys. Reassembly order
    is pinned by array_sort over (line_no, line) structs, so
    collect_list's nondeterministic arrival order never leaks into the
    output. ``n_kept_nonblank`` is the per-doc count of surviving
    CONTENT lines (blank lines are always kept as structure, so
    ``n_kept > 0`` alone cannot tell an emptied doc from a live one —
    ADVICE r6: filter training corpora on n_kept_nonblank > 0)."""
    lines = line_dedup_flags(docs, id_col, text_col, with_norm=True)
    kept_struct = F.when(F.col("keep"), F.struct("line_no", "line"))
    return lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(
            (F.col("keep") & ~F.col("is_blank")).cast("long")
        ).alias("n_kept_nonblank"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias("text_dedup"),
    )


def shingle_docs(docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) pairs — distinct word-k-shingles per doc.

    Two-phase projection: tokenize once, then shingle from the materialized
    array (see hashing.shingles_from_words for why this matters)."""
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__words")
    )
    return toks.select(
        F.col(id_col), F.explode(shingles_from_words(F.col("__words"), k)).alias("shingle")
    )


def shingle_hash_docs(docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle-hash) pairs with NO string construction: the k word
    columns feed ``xxhash64`` directly (multi-arg), skipping concat and
    array_distinct entirely. Duplicates are kept — min/bit-vote aggregation
    downstream is multiset-safe for min (min(set) == min(multiset)).
    The fast path for MinHash; n-gram Jaccard keeps string shingles because
    its oracle joins on shingle text.

    Contract: docs with fewer than k words produce NO shingles and are
    invisible to MinHash candidacy — sub-k-word near-dup detection is
    degenerate anyway; exact_dedup_* catches identical tiny docs."""
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__words")
    )
    w = F.col("__words")
    pos = toks.filter(F.size(w) >= k).select(
        F.col(id_col),
        w,
        F.explode(F.sequence(F.lit(1), F.size(w) - (k - 1))).alias("__i"),
    )
    return pos.select(
        F.col(id_col),
        F.xxhash64(
            *[F.element_at(F.col("__words"), F.col("__i") + j) for j in range(k)]
        ).alias("h"),
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str = "local",
) -> DataFrame:
    """Substring-level exact-duplicate statistics: for every document,
    how much of it is covered by token n-grams that occur MORE THAN ONCE
    anywhere in the corpus (including repeats inside the same document).
    This is the accounting pass of exact-substring training-data dedup
    (the Lee et al. "Deduplicating Training Data Makes Language Models
    Better" family): doc- and line-level dedup miss boilerplate spans
    embedded in otherwise-unique documents; the duplicated-span fraction
    is what tells you whether substring surgery is worth running.

    Output per doc: n_tokens, n_grams, n_dup_grams (gram occurrences in
    this doc whose gram is corpus-duplicated), n_dup_tokens (tokens
    covered by ≥1 duplicated gram — interval union, not n·n_dup_grams),
    dup_token_pct.

    Scale shape (100 TB): grams are hashed to 8 bytes at birth
    (multi-arg xxhash64 over the n token columns — no gram STRING is
    ever built or shuffled, the shingle_hash_docs trick); the occurrence
    count is one map-side-combined groupBy on the hash; the dup-flag
    join is hash-keyed and AQE co-partitions it with the count; span
    coverage explodes only DUPLICATED gram starts (≤ n rows per dup
    gram) and distincts on (doc, position) — a doc-keyed shuffle
    bounded by n·dup_occurrences, not corpus size. The oracle groups on
    gram TEXT — identical modulo 64-bit collisions (the line-dedup
    argument, ~2^-64 at any real corpus). The gram table feeds both the
    count aggregate and the dup-flag join — single-materialization rule
    (``checkpoint``: local | reliable | persist | none). The token
    table itself is materialized under the same rule (r14): the plan
    references ``base`` from the gram fan-out AND the final per-doc
    stats select, and column pruning cannot save the second reference —
    ``n_tokens`` is size(tokens(text)), so each reference re-ran the
    full tokenize regex over the corpus. Storage note (ADVICE r14 #4):
    the base table carries the full ``__toks`` arrays, so under
    ``checkpoint='reliable'`` this is a second durable corpus-sized
    write per call (on top of the gram table); if that cost matters on
    a cluster, checkpoint a pruned (id, n_tokens, __toks) projection or
    use 'local'/'persist'."""
    from ..functions.numeric import pct_rate
    from .text import tokens

    t = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    base = t.select(id_col, F.size("__toks").alias("n_tokens"), "__toks")
    if checkpoint != "none":
        base = materialize(base, checkpoint)
    pos = base.filter(F.col("n_tokens") >= n).select(
        F.col(id_col),
        "__toks",
        F.explode(F.sequence(F.lit(1), F.col("n_tokens") - (n - 1))).alias("start"),
    )
    grams = pos.select(
        F.col(id_col),
        "start",
        F.xxhash64(
            *[F.element_at(F.col("__toks"), F.col("start") + j) for j in range(n)]
        ).alias("h"),
    )
    if checkpoint != "none":
        grams = materialize(grams, checkpoint)
    cnt = grams.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    dup = grams.join(cnt.filter(F.col("c") > 1).select("h"), "h")
    ndup = dup.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_grams"))
    cov = (
        dup.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_tokens"))
    )
    return (
        base.select(
            id_col,
            "n_tokens",
            F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).alias("n_grams"),
        )
        .join(ndup, id_col, "left")
        .join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0).cast("long")).alias("n_dup_grams"),
            F.coalesce("n_dup_tokens", F.lit(0).cast("long")).alias("n_dup_tokens"),
        )
        .withColumn("dup_token_pct", pct_rate(F.col("n_dup_tokens"), F.col("n_tokens")))
    )


def duplicate_span_docs(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str = "local",
) -> DataFrame:
    """Exact-substring dedup SURGERY (the removal pass
    duplicate_ngram_spans budgets for): every corpus-duplicated token
    n-gram keeps its FIRST occurrence — the globally minimal
    (doc, start) owner, same ownership rule as line dedup — and every
    token covered by a NON-owner duplicated gram is removed; survivors
    reassemble in original order. Deterministic: ownership is a pure
    min over (doc_id, start), so the rewritten corpus is layout- and
    append-order-invariant, and re-running on the rewritten corpus
    removes nothing (the dup grams are gone).

    The output text is the NORMALIZED token stream (lowercase, collapsed
    whitespace) — substring surgery operates post-normalization by
    definition; keep the original column alongside if casing matters.
    Overlapping self-repeats resolve aggressively: a token covered by
    any non-owner dup gram goes, even if an owner gram also covers it
    (the Lee-et-al drop-all-but-first behavior at overlap boundaries).

    Scale shape: everything duplicate_ngram_spans does (8-byte gram
    hashes, map-side-combined count+owner in ONE aggregate, explode of
    only duplicated non-owner starts) plus one (doc, pos) anti-join and
    a per-doc sort_array reassembly — the same two doc-keyed shuffles
    line_dedup_docs pays. The token table is materialized once (r14):
    the plan references ``base`` THREE times (gram fan-out, the
    positional token explode, the final n_tokens select) and each
    reference re-ran the tokenize regex corpus-wide — one pass now
    serves all three (same trade as the gram checkpoint below)."""
    from .text import tokens

    t = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    base = t.select(id_col, F.size("__toks").alias("n_tokens"), "__toks")
    if checkpoint != "none":
        base = materialize(base, checkpoint)
    pos = base.filter(F.col("n_tokens") >= n).select(
        F.col(id_col),
        "__toks",
        F.explode(F.sequence(F.lit(1), F.col("n_tokens") - (n - 1))).alias("start"),
    )
    grams = pos.select(
        F.col(id_col),
        "start",
        F.xxhash64(
            *[F.element_at(F.col("__toks"), F.col("start") + j) for j in range(n)]
        ).alias("h"),
    )
    if checkpoint != "none":
        grams = materialize(grams, checkpoint)
    stats = grams.groupBy("h").agg(
        F.count(F.lit(1)).alias("c"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("start").alias("s"))).alias(
            "__own"
        ),
    )
    nonowner = (
        grams.join(stats.filter(F.col("c") > 1), "h")
        .filter(
            (F.col(id_col) != F.col("__own.d")) | (F.col("start") != F.col("__own.s"))
        )
        .select(id_col, "start")
    )
    removed = (
        nonowner.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
            ).alias("p"),
        )
        .distinct()
    )
    toks_pos = base.select(
        F.col(id_col), F.posexplode("__toks").alias("p0", "tok")
    ).select(F.col(id_col), (F.col("p0") + 1).alias("p"), "tok")
    kept = toks_pos.join(removed.withColumn("__rm", F.lit(1)), [id_col, "p"], "left")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("__rm").isNull(), F.struct("p", "tok"))
                    )
                ),
                lambda x: x["tok"],
            ),
        ).alias("text_dedup"),
        F.sum(F.col("__rm").cast("long")).alias("__n_removed"),
    )
    return (
        base.select(id_col, "n_tokens")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("__n_removed", F.lit(0).cast("long")).alias("n_removed_tokens"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def shingle_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    checkpoint: str = "local",
) -> DataFrame:
    """The (id, shingle-hash) posting list both set-similarity joins run
    on: normalize → split → k-word shingles → 8-byte xxhash64 → explode,
    MATERIALIZED (see :func:`materialize`) because every consumer plan
    references it 4-5 times (self-join sides, size joins, hot-shingle
    scan) and alias projections defeat exchange reuse. Exposed as its
    own operator so a sweep that runs several shingle-based audits over
    the SAME corpus (Jaccard pairs, containment, components, the
    composed reports) builds it ONCE and passes it via the generators'
    ``postings=`` parameter — at 100 TB the tokenize+shingle scan is a
    full-corpus text pass, and an audit sweep has no reason to pay it
    per-report. Join on the hash, never the string: Jaccard/containment
    need only COUNTS of shared shingles, long keys shrink the shuffle
    ~4×, and birthday collision odds at 64 bits are ~1e-9 at sf0.1."""
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__words")
    )
    return materialize(
        toks.select(
            F.col(id_col),
            F.explode(shingle_hashes_from_words(F.col("__words"), k)).alias("h"),
        ),
        checkpoint,
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
    checkpoint: str = "local",
    postings: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over word k-shingle sets, via shared-shingle equi-join.

    inter(a,b) = # shared shingles (equi-join on shingle + group by pair);
    |A∪B| = |A| + |B| - inter. Only pairs sharing ≥1 shingle ever
    materialize — the all-pairs O(n²) never happens.

    Skew guard (``max_shingle_df``): a stopword shingle shared by D docs
    expands to D² join rows — one boilerplate phrase across a 100 TB
    corpus is a quadratic straggler. With a cap set, shingles whose
    document frequency exceeds it are dropped from the JOIN side (the
    standard df-capping for shared-shingle joins): the hot set is tiny by
    construction, so it rides along as a broadcast anti-join — no extra
    shuffle of the shingle table. Set sizes stay uncapped, so reported
    ``jaccard`` becomes a LOWER bound for pairs that shared hot shingles
    and pairs connected ONLY through hot shingles are not found — at a
    sane cap those are exactly the pairs that match on boilerplate, which
    near-dup dedup wants to ignore anyway. Default None = exact (the
    oracle-checked mode).

    ``postings``: a pre-built :func:`shingle_postings` table (columns
    ``(id_col, h)``, already materialized) to share ONE tokenize+shingle
    corpus pass across several consumers in a sweep; None (default)
    builds it here. Either way the posting list is materialized once —
    the plan references it four times (self-join sides + size joins,
    five with the skew-cap's hot-shingle scan), alias projections defeat
    exchange reuse, and lazy checkpoints don't dedupe within the first
    action (measured: jaccard 2.0→2.6 s with eager=False; the
    materialization itself bought 2.16→1.99 s at sf0.1). Fault-tolerance
    trade (ADVICE r5): localCheckpoint blocks have NO lineage — an
    executor loss kills the job; a long 100 TB run should pass
    checkpoint='reliable'/'persist' (see :func:`materialize`).

    ``sizes``: a pre-aggregated per-doc set-size table (columns
    ``(id_col, n)``, one row per doc with ≥1 shingle) to skip the two
    size aggregations this plan otherwise runs over the FULL posting
    list (the na/nb join sides alias differently, so Spark's exchange
    reuse never merges them — the r14 pass measured both aggregates
    executing). In a sweep the caller derives it once from the shared
    postings (queries._doc_shingle_sizes); values are identical to the
    in-plan aggregate by construction.
    """
    sh = (
        postings
        if postings is not None
        else shingle_postings(docs, id_col, text_col, k, checkpoint)
    )
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    join_side = sh
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("h")
        )
        join_side = sh.join(F.broadcast(hot), "h", "left_anti")
    a, b = join_side.alias("a"), join_side.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold_pct: int = 80,
    min_shingles: int = 5,
    max_shingle_df: int | None = None,
    checkpoint: str = "local",
    postings: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC containment near-dup pairs: C(A→B) = |A∩B| / |A| over
    word k-shingle sets — the directional complement of
    :func:`ngram_jaccard_pairs`. Jaccard misses the quote/superset case
    on purpose (a short doc wholly embedded in a long one has a tiny
    union-normalized score), while containment fires at 100% no matter
    how large the host document is — the signal a training-data
    pipeline wants for boilerplate inclusion, quotation chains, and
    doc-in-doc wrapping. Same shared-shingle equi-join skeleton (only
    pairs sharing ≥1 shingle materialize; posting list checkpointed
    once, both join sides + the size join read the materialized
    blocks), but DIRECTIONAL: (a,b) with a≠b, normalized by |A| only.
    The threshold compare is exact-integer (inter·100 ≥ pct·|A|), so no
    float sits on the keep/drop boundary; ``min_shingles`` drops
    sub-k*-word fragments whose containment is trivially 100%.
    Scale: identical profile to the Jaccard join — the quadratic risk
    is the same hot-shingle fan-out, and ``max_shingle_df`` is the same
    escape hatch (hot shingles leave the JOIN side via a broadcast
    anti-join; set sizes stay uncapped, so reported containment becomes
    a LOWER bound for pairs that shared hot shingles — the
    boilerplate-match pairs a containment audit wants to ignore anyway;
    default None = exact, the oracle-checked mode). ``sizes``: pre-built
    per-doc set sizes ``(id_col, n)`` — same sharing contract as
    :func:`ngram_jaccard_pairs`; None derives them here."""
    from ..functions.numeric import pct_rate

    sh = (
        postings
        if postings is not None
        else shingle_postings(docs, id_col, text_col, k, checkpoint)
    )
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    join_side = sh
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("h")
        )
        join_side = sh.join(F.broadcast(hot), "h", "left_anti")
    a = join_side.select(F.col(id_col).alias("doc_a"), F.col("h").alias("a_h"))
    b = join_side.select(F.col(id_col).alias("doc_b"), F.col("h").alias("b_h"))
    pairs = (
        a.join(b, (F.col("a_h") == F.col("b_h")) & (F.col("doc_a") != F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("a_size"))
    return (
        pairs.join(na, "doc_a")
        .filter(
            (F.col("a_size") >= min_shingles)
            & (F.col("inter") * 100 >= F.lit(threshold_pct) * F.col("a_size"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("a_size").cast("long").alias("a_size"),
            F.col("inter").cast("long").alias("inter"),
            pct_rate(F.col("inter"), F.col("a_size")).alias("containment_pct"),
        )
    )


def df_cap_loss_curve(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.2,
    caps: tuple[int, ...] = (4, 8, 16, 32, 64),
    checkpoint: str = "local",
    postings: DataFrame | None = None,
) -> DataFrame:
    """EXACT recall cost of the hot-shingle df-cap, per cap: a true
    Jaccard≥threshold pair survives capped candidate generation under
    cap c iff its rarest SHARED shingle has document frequency ≤ c
    (the cap drops whole posting lists, so a pair is lost only when
    EVERY shared shingle is hot) — so ONE uncapped pair-generation
    pass annotated with min(shared df) yields the whole loss curve,
    no per-cap re-join. Returns (cap, n_pairs, kept_pairs,
    lost_pairs, lost_pct), one row per cap. This is the RECALL side
    of the cap dial (the skew bench measures the SPEED side); the CLI
    exposes it as ``cap-audit`` so --containment-df-cap and the
    Jaccard cap are chosen from measured loss, not guessed. Scale:
    the audit itself runs the uncapped join — at 100 TB run it on a
    corpus SAMPLE to pick the cap, then apply the cap corpus-wide;
    the min-df annotation adds one df join to the pair pass."""
    from ..functions.numeric import pct_rate

    sh = (
        postings
        if postings is not None
        else shingle_postings(docs, id_col, text_col, k, checkpoint)
    )
    dfh = sh.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("df"))
    shd = sh.join(dfh, "h")
    rhs = shd.select(F.col("h").alias("h2"), F.col(id_col).alias("db"))
    p = (
        shd.join(rhs, (F.col("h") == F.col("h2")) & (F.col(id_col) < F.col("db")))
        .groupBy(F.col(id_col).alias("da"), "db")
        .agg(F.count(F.lit(1)).alias("inter"), F.min("df").alias("mindf"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col(id_col).alias("da"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("db"), F.col("n").alias("nb"))
    jp = (
        p.join(na, "da")
        .join(nb, "db")
        .filter(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
            >= threshold
        )
        .select("da", "db", "mindf")
    )
    cap_grid = docs.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(c)) for c in caps])).alias("cap")
    )
    lost = F.sum((F.col("mindf") > F.col("cap")).cast("int")).cast("long")
    return (
        jp.join(F.broadcast(cap_grid))
        .groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("mindf") <= F.col("cap")).cast("int"))
            .cast("long")
            .alias("kept_pairs"),
            lost.alias("lost_pairs"),
            pct_rate(lost, F.count(F.lit(1))).alias("lost_pct"),
        )
        .orderBy("cap")
    )


def containment_dropped_ids(cont: DataFrame) -> DataFrame:
    """Resolve directional containment pairs (``doc_a`` contained in
    ``doc_b``) into the set of doc ids a keep-host/drop-fragment prune
    removes: a doc is dropped iff it is contained in some other doc AND
    is not the designated keeper of a mutual (near-identical) pair —
    mutual containment keeps the LOWER id, one-directional containment
    always keeps the host. The per-pair guarantee holds for a pair IN
    ISOLATION; chained one-directional containment can still drop a
    mutual pair's keeper (K mutual with M, K also contained in a third
    doc Z → both K and M drop, their content surviving transitively in
    Z) — the standard greedy prune, local and deterministic, not global
    set-cover. Returns one column ``doc_id``. Scale: a self-join of
    the PAIRS table (output-sized, not corpus-sized) — the consumer
    anti-joins the result against the corpus; the dropped set is NOT
    provably small, so no broadcast hint here (AQE promotes it when it
    is)."""
    rev = cont.select(F.col("doc_a").alias("r_a"), F.col("doc_b").alias("r_b"))
    return (
        cont.join(
            rev,
            (F.col("r_a") == F.col("doc_b")) & (F.col("r_b") == F.col("doc_a")),
            "left",
        )
        .filter(F.col("r_a").isNull() | (F.col("doc_b") < F.col("doc_a")))
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )


def jaccard_pairs_prefix_filtered(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.2,
    checkpoint: str = "local",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via PPJoin-style PREFIX FILTERING (Chaudhuri
    et al. SSJoin / Xiao et al. PPJoin, the classic VLDB set-similarity
    join) — same answer as :func:`ngram_jaccard_pairs`, different
    candidate generator with a structurally better worst case.

    Tokens get a GLOBAL canonical order (ascending document frequency,
    ties by hash); a doc's PREFIX is its first ``n − ⌊t·n⌋ + 1`` tokens
    in that order (one longer than the tight ``n − ⌈t·n⌉ + 1`` bound, so
    float rounding can only ADD candidates, never lose a boundary pair).
    Any pair with Jaccard ≥ t must share a prefix token, so the
    quadratic equi-join runs over prefixes only — and since prefixes are
    each doc's RAREST tokens, boilerplate phrases (the df-skew that
    forces ngram_jaccard_pairs' ``max_shingle_df`` cap, which buys its
    bound by discarding boilerplate-only pairs) land at the END of the
    order and mostly never enter the join. Exactness costs nothing:
    candidates verify against the full sets (sorted hash arrays,
    JVM ``array_intersect``), so the output is exact at ANY skew — the
    capped path's lower-bound caveat disappears.

    Scale: posting list materialized once (same rule as the equi-join
    path); one h-shuffle attaches df; per-doc rank windows are bounded
    by document length; candidate pairs shuffle once per side to pick up
    the ~KB set arrays. Verification work is |candidates|·O(|A|+|B|)
    hash-set probes — prefix filtering exists precisely to make
    |candidates| small where the full equi-join explodes.

    ``postings``: a pre-built :func:`shingle_postings` table to share the
    corpus tokenize+shingle pass with the equi-join generators in a sweep
    (same contract as ngram_jaccard_pairs; contents identical to the
    in-function build by construction). None builds it here."""
    if postings is not None:
        sh = postings
    else:
        toks = docs.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
        )
        sh = materialize(
            toks.select(
                F.col(id_col),
                F.explode(shingle_hashes_from_words(F.col("__words"), k)).alias("h"),
            ),
            checkpoint,
        )
    df_tbl = sh.groupBy("h").agg(F.count(F.lit(1)).alias("__df"))
    w_rank = Window.partitionBy(id_col).orderBy("__df", "h")
    w_size = Window.partitionBy(id_col)
    prefix = (
        sh.join(df_tbl, "h")
        .select(
            F.col(id_col),
            "h",
            F.row_number().over(w_rank).alias("__r"),
            F.count(F.lit(1)).over(w_size).alias("__n"),
        )
        .filter(
            F.col("__r")
            <= F.col("__n") - F.floor(F.lit(threshold) * F.col("__n")) + 1
        )
        .select(id_col, "h")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_list("h")).alias("hs"), F.count(F.lit(1)).alias("n")
    )
    sa = sets.select(
        F.col(id_col).alias("doc_a"), F.col("hs").alias("__ha"), F.col("n").alias("na")
    )
    sb = sets.select(
        F.col(id_col).alias("doc_b"), F.col("hs").alias("__hb"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect("__ha", "__hb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            inter.cast("double") / (F.col("na") + F.col("nb") - inter),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.2,
    max_bucket_size: int | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """MinHash-LSH near-dup candidates with estimated Jaccard.

    shingle → 64-hash MinHash signature → 32 bands × 2 rows → explode band
    keys → self-join per bucket (id_a < id_b) → distinct pairs → estimate
    J(a,b) = fraction of agreeing signature positions. 32×2 banding makes
    the candidate-capture curve steep around J ≈ (1/32)^(1/2) ≈ 0.18.

    Scale: docs×bands rows shuffle once on (band, key); per-bucket pair
    expansion is the only superlinear step and is bounded by bucket size.

    Skew guard (``max_bucket_size``): a degenerate bucket — every empty
    doc, every copy of a boilerplate page — expands to |bucket|² pairs.
    With a cap set, buckets larger than it are dropped whole before pair
    expansion (the standard LSH hot-bucket drop: a bucket holding a large
    slice of the corpus carries no discriminative signal, and every
    near-dup pair still has 31 other bands to collide in). Implemented as
    a window count over the SAME (band, key) partitioning the pair join
    shuffles on — the guard adds no extra shuffle. Default None = keep
    every bucket (the oracle-checked mode).
    """
    # Signature via explode + ONE hash-agg with 64 min buffers (map-side
    # partials, flat codegen) — ~20× faster than a per-row nested
    # array-transform expression tree, and the shape that scales: the
    # shuffle carries 64 longs per doc, never the shingles.
    #
    # Shingles are hashed straight from the word columns (no string
    # building); the i-th hash family re-hashes only the resulting 8-byte
    # long (seeded xxhash64) — variable-length string hashing per family
    # would cost num_hashes full text passes per shingle. (Affine a*h+b
    # mixing would be cheaper still, but wrapping long multiply throws
    # under Spark 4's ANSI mode.)
    sh = shingle_hash_docs(docs, id_col, text_col, k)
    # Materialize the signature table ONCE (localCheckpoint, same pattern
    # as connected_components' edge list): the plan references sigs three
    # times (band explode + the two per-side re-attach joins), and the
    # alias projections above the aggregate defeat Spark's exchange reuse
    # — without the checkpoint the shingle explode + 64-min aggregation
    # executes three times (verified via explain: 4 parquet scans, 0
    # ReusedExchange). Signatures are |docs|×(8B id + 512B sig) — the
    # standard MinHash materialization every production pipeline makes;
    # at 100 TB this is the difference between one corpus-wide shingle
    # pass and three. Measured 2.54 s → 2.21 s at sf0.1.
    sigs = (
        sh.groupBy(id_col)
        .agg(
            *[
                F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        )
        .select(
            F.col(id_col),
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )
    sigs = materialize(sigs, checkpoint)
    rows_per_band = num_hashes // bands
    # Band rows carry ONLY (id, band, key) — the 64-long signature never
    # rides through the docs×bands self-join shuffle (512 B/row saved);
    # signatures re-attach to the (few) deduped candidate pairs afterward.
    banded = sigs.select(
        id_col,
        F.explode(band_keys(F.col("sig"), bands, rows_per_band)).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "key")
        banded = (
            banded.withColumn("__bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    a, b = banded.alias("a"), banded.alias("b")
    pair_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand = pair_ids.join(
        sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a"
    ).join(
        sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b"
    )
    est = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """64-bit SimHash per doc via bit-vote hash aggregation.

    explode shingles → xxhash64 → for each bit, vote +1/-1 → groupBy(doc)
    with 64 conditional sums (one hash-agg pass, map-side partials) →
    assemble fingerprint. Returns (id, simhash BIGINT, four 16-bit blocks
    for banded Hamming search).
    """
    h = F.xxhash64(F.col("shingle"))
    sh = shingle_docs(docs, id_col, text_col, k).withColumn("h", h)
    votes = sh.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(63):  # bit 63 left clear: keeps fingerprints non-negative
        fp = fp + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    out = votes.select(F.col(id_col), fp.alias("simhash"))
    for blk in range(4):
        out = out.withColumn(
            f"block{blk}",
            F.shiftrightunsigned(F.col("simhash"), blk * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 16,
    fingerprints: DataFrame | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidates via block
    equality (pigeonhole over 4 blocks ⇒ catches distance ≤ 3 exactly;
    larger distances probabilistically).

    The fingerprint table is referenced EIGHT times (4 block joins × two
    sides), so it is materialized once up front (localCheckpoint — the
    same single-materialization rule as MinHash signatures; without it
    each reference re-runs the corpus-wide shingle explode + 64-vote
    aggregation). Callers that already have fingerprints (e.g. a
    verification query that also inspects them) pass the materialized
    table via ``fingerprints`` to share one computation."""
    fps = (
        fingerprints
        if fingerprints is not None
        else materialize(
            simhash_fingerprints(docs, id_col, text_col), checkpoint
        )
    )
    pairs = None
    for blk in range(4):
        a = fps.select(
            F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), F.col(f"block{blk}").alias("bk")
        )
        b = fps.select(
            F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), F.col(f"block{blk}").alias("bk")
        )
        p = a.join(b, "bk").filter(F.col("doc_a") < F.col("doc_b")).drop("bk")
        pairs = p if pairs is None else pairs.union(p)
    dist = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", dist.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    left: str = "doc_a",
    right: str = "doc_b",
    max_iter: int = 20,
    checkpoint: str = "local",
) -> DataFrame:
    """Connected components over a near-dup pair graph → canonical dedup
    groups: every node gets ``component`` = the minimum id reachable from
    it. This is the step that turns pairwise candidates (MinHash/SimHash/
    Jaccard output) into keep-one-per-group decisions in a real pipeline.

    Iterative min-label propagation: each round joins labels across the
    (symmetrized) edge list and takes the per-node min — the classic
    distributed CC. Rounds needed = graph diameter; dup clusters are
    near-cliques, so 2–3 rounds in practice (the large-star/small-star
    variant halves rounds on pathological chains; not needed here).
    Per-round lineage is truncated with ``localCheckpoint`` — without it
    the plan doubles every iteration and the job DAG explodes. The
    convergence check is one scalar count per round (driver-side scalars
    are the sanctioned pattern for iterative fixpoints — the DATA never
    visits the driver).
    """
    import warnings

    # Materialize the symmetrized edge list ONCE before iterating: every
    # round joins against it, and without the checkpoint each join would
    # re-execute the full upstream candidate-generation pipeline (the
    # n-gram shingle join that produced the edges) — measured 6.3s → 2.4s
    # at sf0.1, and at 100 TB the difference is re-running dedup candidate
    # generation diameter-many times.
    node_ids = nodes.select(F.col(id_col).alias("node"))
    sym = (
        edges.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .union(edges.select(F.col(right).alias("src"), F.col(left).alias("dst")))
    )
    sym = materialize(sym, checkpoint)
    # Iterate ONLY over nodes that touch an edge: a node with no edge is
    # its own component and can never change label, so carrying it
    # through every round materializes |V| rows per iteration for
    # nothing. At 100 TB the near-dup graph's node set is orders of
    # magnitude smaller than the corpus — the fixpoint should cost
    # O(|touched|) per round, with the full node set attached once at
    # the end (r4: 4.0 s → measured below at sf0.1 for the savings
    # report; the gap widens with corpus size since |touched| tracks
    # dup density, not corpus size).
    # Contract: components OF THE GIVEN NODE SET. An edge endpoint
    # outside `nodes` must neither become a label nor bridge two in-set
    # nodes (callers legitimately pass a filtered node subset with a
    # pre-filter edge list). Seeding labels from touched ∩ nodes is
    # sufficient: an outside dst finds no label in the propagation join,
    # and an outside src's candidate min is discarded by the label-keyed
    # update join — so outside endpoints can't relay labels in ANY round.
    # One tiny join (distinct endpoints × pruned id column) instead of
    # filtering the whole edge list (measured ~1.4 s cheaper at sf0.1).
    touched = (
        sym.select("src")
        .distinct()
        .join(node_ids, F.col("src") == F.col("node"), "left_semi")
    )
    labels = touched.select(F.col("src").alias("node"), F.col("src").alias("label"))
    changed = 0
    prev_cached = None
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        # fold the convergence flag INTO the label update: one
        # materialization per round plus a cheap count over the already-
        # materialized result, instead of a second old-vs-new join job
        upd = F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label")))
        new_labels = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                "node",
                upd.alias("new_label"),
                (upd < F.col("label")).alias("__chg"),
            )
        )
        if checkpoint == "local":
            # r15 (per-round job-count trim, VERDICT r14 #7): persist +
            # count materializes the round AND returns the convergence
            # scalar in ONE job (the count's full scan populates every
            # cached partition), where eager localCheckpoint + count was
            # two jobs per round — at ~0.25-0.3 s fixed cost per job
            # that is the dominant per-round cost for the 2-3-round
            # near-clique graphs this runs on. The next round's join
            # reads the InMemoryRelation, so lineage stays bounded
            # exactly as with the checkpoint; each round unpersists its
            # predecessor (only the final round's labels stay resident —
            # touched-node-sized, freed with the context). On executor
            # loss, persist RECOMPUTES from lineage instead of failing
            # the job — strictly safer than localCheckpoint at scale.
            from pyspark import StorageLevel

            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
            changed = new_labels.filter(F.col("__chg")).count()
            if prev_cached is not None:
                prev_cached.unpersist(False)
            prev_cached = new_labels
        else:
            new_labels = materialize(new_labels, checkpoint)
            changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    if prev_cached is not None:
        # Truncate lineage ONCE at convergence (one cheap job over the
        # touched-node-sized cache) and release the cached blocks: the
        # converged labels are consumed by arbitrary downstream plans
        # (often referenced more than once), and leaving them as a
        # persisted view would (a) print the whole fixpoint lineage into
        # every consumer's explain output and (b) hold the last round's
        # cache for the context lifetime. Net jobs per fixpoint:
        # rounds + 1 instead of 2·rounds.
        labels = materialize(labels, "local")
        prev_cached.unpersist(False)
        prev_cached = None
    if changed != 0:
        # ADVICE r2: never return unconverged labels silently — a dup
        # chain with diameter > max_iter would yield non-minimal
        # components and hash-mismatch the transitive-closure oracle
        # with no diagnostic pointing here.
        warnings.warn(
            f"connected_components did not converge after {max_iter} "
            f"iterations ({changed} labels still changing); labels are "
            "an under-merged upper bound — raise max_iter (rounds needed "
            "= graph diameter)",
            RuntimeWarning,
            stacklevel=2,
        )
    # Singleton nodes (no edges) re-attach here: one join of the corpus
    # against the tiny converged label set — broadcastable by AQE — with
    # component defaulting to the node's own id.
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("label"), F.col("node")).alias("component"),
        )
    )


def contamination_flags(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag every training doc that shares at
    least one word-k-gram with the held-out benchmark/eval set — the
    overlap-removal step every serious LLM training pipeline runs before
    training (the GPT-3 paper's 13-gram filter is this op at k=13;
    k defaults lower because the fixture docs are short).

    Returns (id, contaminated BOOLEAN) for every train doc — a flag, not
    a filtered table, so callers can audit WHAT would drop before
    dropping it.

    Scale shape: the benchmark is always tiny next to a 100 TB corpus,
    so its distinct shingle set BROADCASTS; the train side is a narrow
    tokenize→shingle map feeding a broadcast LEFT SEMI join — the corpus
    itself never shuffles, and the only exchange is the distinct over
    hit doc-ids (bounded by the contaminated subset). String shingles,
    not hashes: the join is broadcast either way, so the 8-byte-key
    shuffle saving doesn't apply and exact string equality keeps the
    oracle parity non-probabilistic (contrast ngram_jaccard_pairs).
    """
    bsh = shingle_docs(benchmark, id_col, text_col, k).select("shingle").distinct()
    tsh = shingle_docs(train, id_col, text_col, k)
    hits = (
        tsh.join(F.broadcast(bsh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return train.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__hit"), F.lit(False)).alias("contaminated"),
    )


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """Distributed Bloom-filter build over a key column: one row holding
    ``map<int, bigint>`` — bit-word index → 64-bit word (absent word ≡ 0).

    Spark's own runtime bloom (``bloom_filter_agg``/``might_contain``) is
    optimizer-internal and not in the public function registry, so this
    is the same structure from public primitives: each key sets
    ``k_hashes`` bits at ``pmod(xxhash64(key, seed_i), m_bits)``; the
    bitmap is assembled DISTRIBUTEDLY (explode → groupBy word index →
    ``bit_or`` with map-side partials), so the build scales with
    executors and only the final ≤ ``m_bits/64``-row word table passes
    through one reducer into the map (bounded by m, never by |keys|).

    Sizing is the standard calculus: FPR ≈ (1 - e^(-k·n/m))^k — 10 bits
    per element with k=5 gives ~1 %. The 1-row map broadcasts at m/8
    bytes: a 1-billion-key set at 10 bits/element is a 1.25 GB
    broadcast where the exact distinct key-string set would be tens of
    GB — the reason a bloom prefilter is the 100 TB shape.
    """
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
                for i in range(k_hashes)
            ]
        )
    ).alias("__pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("__pos"), 6).cast("int").alias("__word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 64) AS INT))"
            ).alias("__mask"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("__word", "__bits"))).alias(
            "__bloom"
        )
    )


def bloom_might_contain(key_col: str, m_bits: int, k_hashes: int):
    """Column predicate testing ``key_col`` against a joined ``__bloom``
    map (from :func:`bloom_build`, attached via a 1-row broadcast join).
    True ⇢ maybe present (all k bits set); False ⇢ DEFINITELY absent —
    the bloom guarantee: no false negatives, so an exact confirm join on
    the survivors reproduces exact semantics. Pure JVM column ops: k
    map lookups + bitwise tests, no shuffle, no UDF."""
    checks = [
        F.coalesce(
            F.expr(
                f"(element_at(__bloom, CAST(shiftright(pmod(xxhash64({key_col}, {i}), "
                f"{m_bits}), 6) AS INT)) & shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(pmod(xxhash64({key_col}, {i}), {m_bits}), 64) AS INT))) != 0"
            ),
            F.lit(False),
        )
        for i in range(k_hashes)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def contamination_flags_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> DataFrame:
    """:func:`contamination_flags` with a Bloom prefilter — the 100 TB
    decontamination topology. Identical output (the bloom admits false
    positives but never false negatives, and every candidate is exactly
    confirmed), different movement of bytes:

    - :func:`contamination_flags` broadcasts the benchmark's distinct
      shingle STRINGS (tens of bytes each) to every task — fine for one
      benchmark, prohibitive when the held-out suite is itself large
      (every eval set × every k) or memory-tight executors.
    - Here the broadcast is the m/8-byte bitmap (10 bits ≈ 1.25 bytes
      per shingle at 1 % FPR); the corpus-side shingle stream filters
      against it with k in-map bit tests and NO shuffle, and only the
      surviving ~FPR·|corpus shingles| + true hits enter the exact
      confirm join. The confirm stays broadcast here (fixture-sized
      benchmark); at a benchmark too big to broadcast raw it becomes a
      shuffled semi join whose probe side the bloom has already cut by
      ~100×.
    """
    bsh = shingle_docs(benchmark, id_col, text_col, k).select("shingle").distinct()
    bloom = bloom_build(bsh, "shingle", m_bits, k_hashes)
    tsh = shingle_docs(train, id_col, text_col, k)
    candidates = tsh.join(F.broadcast(bloom)).filter(
        bloom_might_contain("shingle", m_bits, k_hashes)
    )
    hits = (
        candidates.join(F.broadcast(bsh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return train.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__hit"), F.lit(False)).alias("contaminated"),
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact embedding near-dup: all pairs with cosine ≥ threshold.

    BRUTE-FORCE TEST BASELINE ONLY (crossJoin → CartesianProduct): the
    registered query uses :func:`embedding_cosine_pairs_blocked`, which
    produces the identical result without a cartesian node. Kept because
    an O(n²) reference implementation is the clearest correctness anchor
    for the blocked/IVF variants in tests. Cosine is computed
    left-to-right in double (matches the oracle's list_reduce exactly,
    bit-for-bit).
    """
    from .similarity import cosine_sim

    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim(F.col("va"), F.col("vb")))
        # explicit NaN guard: BOTH Spark and DuckDB order NaN above every
        # number, so `NaN >= t` is TRUE in each — an undefined cosine
        # (zero-norm side) must never count as a near-dup
        .filter((F.col("cosine") >= threshold) & ~F.isnan("cosine"))
        .select("id_a", "id_b", "cosine")
    )


def embedding_cosine_pairs_blocked(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via a balanced BLOCK-PAIR
    equi-join — same output as :func:`embedding_cosine_pairs`, no
    CartesianProduct in the physical plan (VERDICT r1 "what's wrong" #1).

    Why not an LSH/IVF prefilter for the EXACT query: sub-quadratic
    candidate generation needs a similarity gap to exploit, and at a low
    threshold there is none — the fixture's pair-cosine distribution is a
    smooth tail (measured: 271 pairs ≥ 0.35, 1,828 more in 0.25–0.30,
    121k background), and sign-LSH's collision-probability gap between
    cos 0.39 and cos 0.0 is far too small for any (rows, bands) setting
    to keep recall 1.0 while pruning. Exact low-threshold all-pairs is
    inherently Ω(n²) comparisons; the scalable form distributes that
    compute EVENLY with bounded memory instead of pretending to prune:

    - each vector gets a stable block g = xxhash64(id) mod B;
    - each unordered block pair (i ≤ j) is one TASK; a vector in block g
      is shuffled to the B tasks containing g (×B replication, linear);
    - tasks are equi-join keys → ShuffledHashJoin/SortMergeJoin over
      B(B+1)/2 keys, each holding ~2n/B rows — no cartesian node, no
      hot partition, AQE-coalescible, and per-task memory is n/B-sized
      (tune `blocks` so a block fits an executor at the target scale).

    The truly sub-quadratic path for HIGH thresholds / clustered data is
    :func:`embedding_cosine_pairs_ivf` (cluster-then-dedup à la SemDeDup).

    Execution detail — why applyInPandas and not a column-expression
    cosine on the joined pairs: Spark's higher-order functions
    (aggregate/zip_with) are CodegenFallback — interpreted per row — so
    n²/2 HOF cosines dominate wall time (measured 39 s for 12.5M pairs
    at sf0.1). Instead each block-pair task computes its similarity tile
    with one numpy/BLAS matmul (Arrow in, ~n²·d FLOPs at vector speed)
    and emits only CANDIDATE id pairs at ``threshold − 1e-6``; the exact
    left-to-right-fold cosine then re-scores just those few candidates,
    so the emitted values (and the final threshold cut) are bit-identical
    to brute force and to the DuckDB oracle. The 1e-6 margin dwarfs
    float64-BLAS reordering error (~1e-14), so the OUTPUT is invariant
    to the BLAS in use: borderline pairs always reach the exact filter,
    which alone decides.
    """
    import numpy as np
    import pandas as pd

    from .similarity import cosine_sim

    b_ = blocks
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(b_)).cast("int").alias("g"),
    )
    # replicate each row into every task (min(g,k), max(g,k)), k = 0..B-1
    tasks = F.transform(
        F.sequence(F.lit(0), F.lit(b_ - 1)),
        lambda k: F.struct(
            F.least(F.col("g"), k).alias("ti"), F.greatest(F.col("g"), k).alias("tj")
        ),
    )
    r = e.select("id", "v", "g", F.explode(tasks).alias("t")).select(
        "id", "v", "g", F.col("t.ti").alias("ti"), F.col("t.tj").alias("tj")
    )
    margin = threshold - 1e-6

    def tile_candidates(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # nested def: cloudpickle ships it by value (module-level functions
        # pickle by reference and break off-repo workers)
        ti, tj = key
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        a_rows = pdf[pdf["g"] == ti]
        b_rows = pdf[pdf["g"] == tj]
        if len(a_rows) == 0 or len(b_rows) == 0:
            return empty
        ma = np.vstack(a_rows["v"].to_numpy()).astype(np.float64)
        mb = np.vstack(b_rows["v"].to_numpy()).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            # zero-norm rows become NaN rows; NaN >= margin is False, so
            # they simply produce no candidates (matches the exact path,
            # where cosine_sim pins zero-denominator to NaN)
            ma /= np.linalg.norm(ma, axis=1, keepdims=True)
            mb /= np.linalg.norm(mb, axis=1, keepdims=True)
            sims = ma @ mb.T
        ids_a = a_rows["id"].to_numpy()
        ids_b = b_rows["id"].to_numpy()
        mask = sims >= margin
        if ti == tj:
            mask &= np.less.outer(ids_a, ids_b)
        ia, ib = np.nonzero(mask)
        if len(ia) == 0:
            return empty
        lo = np.minimum(ids_a[ia], ids_b[ib])  # off-diagonal tasks see the
        hi = np.maximum(ids_a[ia], ids_b[ib])  # pair in arbitrary order
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    cand = r.groupBy("ti", "tj").applyInPandas(
        tile_candidates, schema="id_a long, id_b long"
    )
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cosine_sim(F.col("__va"), F.col("__vb")))
        .filter((F.col("cosine") >= threshold) & ~F.isnan("cosine"))
        .select("id_a", "id_b", "cosine")
    )


def embedding_cosine_pairs_ivf(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
) -> DataFrame:
    """Cluster-then-dedup (SemDeDup shape): assign every vector to its
    nearest IVF cell (O(n·C), one BLAS map pass, deterministic
    centroids), then exact cosine only WITHIN cells — the sub-quadratic
    embedding near-dup path for 100 TB. Approximate by design (cross-cell
    pairs are never compared), but fully deterministic, so the whole
    pipeline is hash-oracle-checkable in SQL. At scale the cell id
    doubles as the storage partition key: each task reads one cell,
    compute is Σ|cell|² ≪ n² for any reasonable clustering.

    In-cell scoring uses the same BLAS-tile-prefilter + exact-LTR-
    re-score shape as :func:`embedding_cosine_pairs_blocked` (one
    similarity matmul per cell, candidates at threshold − 1e-6, the
    exact fold alone decides the emitted values) instead of the r2
    per-pair interpreted HOF — Σ|cell|² interpreted cosines was the one
    corpus-scale HOF path left after r2.
    """
    import numpy as np
    import pandas as pd

    from .similarity import cosine_sim, ivf_assign_cells

    assigned, _ = ivf_assign_cells(embeddings, n_centroids, id_col, vec_col)
    margin = threshold - 1e-6

    def cell_tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # nested def: cloudpickle ships it by value
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
        )
        if len(pdf) < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            # zero-norm rows → NaN sims → no candidates, matching the
            # exact path's NaN exclusion
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ mat.T
        mask = (sims >= margin) & np.less.outer(ids, ids)
        ia, ib = np.nonzero(mask)
        if len(ia) == 0:
            return empty
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = assigned.groupBy("cell").applyInPandas(
        cell_tile, schema="id_a long, id_b long"
    )
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cosine_sim(F.col("__va"), F.col("__vb")))
        .filter((F.col("cosine") >= threshold) & ~F.isnan("cosine"))
        .select("id_a", "id_b", "cosine")
    )
