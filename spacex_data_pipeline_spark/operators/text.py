"""Text-analysis operators (driver north-star extension; SURVEY.md §2.5).

Per-document feature extraction for a training-data pipeline: token
counting, quality scoring, language identification, fingerprinting. All of
it is built-in column expressions (codegen'd, zero Python in the hot path)
— a deliberate contrast with the typical pandas implementation; at 100 TB
these run as narrow map stages with no shuffle at all.

Oracle notes: token definitions are chosen so Spark regex (Java) and
DuckDB regex (RE2) agree: character classes and ``+`` quantifiers only, no
lookaround. Ratios do exactly one double division (IEEE-deterministic
cross-engine); see functions/numeric.py for why chained double products
are avoided.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import normalize_text, rolling_hash

# BPE-ish pretokenizer: letter runs, digit runs, single other-symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# Tiny marker lexicons for the n-gram/marker language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with", "for"),
    "es": ("el", "la", "los", "las", "que", "con"),
    "de": ("der", "die", "das", "und", "mit", "ist"),
    "fr": ("le", "la", "les", "des", "est", "avec"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (empty text → empty array)."""
    t = normalize_text(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the BPE pretokenizer regex — the cheap
    stand-in for exact BPE at corpus-scan time."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


def char_ratio_counter(chars_per_token: float):
    """Token-count model ``ceil(n_chars / chars_per_token)`` — the
    fixed-ratio estimate (≈4 chars/token for English BPE vocabularies is
    the published rule of thumb). Pure Column arithmetic: zero regex,
    zero Python — the cheapest way to budget in LLM-tokenizer units at
    corpus-scan scale."""
    r = float(chars_per_token)
    return lambda col: F.ceil(F.length(col) / F.lit(r)).cast("int")


def pandas_tokenizer_counter(count_fn):
    """Wrap a REAL tokenizer's per-string count (e.g.
    ``lambda s: len(enc.encode(s))`` for a tiktoken/HF encoding) as an
    Arrow-batched token counter. This is the sanctioned Python surface —
    a pandas_udf over Arrow batches, never a row-at-a-time Python UDF —
    so an exact-BPE budget costs one vectorized scan column, not a
    per-row interpreter round trip. Nulls count as 0."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # explicit returnType + locally-bound pd: the module's postponed
    # annotations (string 'pd.Series') would not resolve for the
    # type-hint inferrer with pandas imported only in this scope
    def _count(s):
        return s.map(lambda t: count_fn(t) if t is not None else 0).astype("int32")

    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    u = pandas_udf(_count, "int")
    return lambda col: u(col)


def resolve_token_counter(counter="whitespace"):
    """Resolve a token-counting MODEL to a Column function — the
    pluggable surface every token-mass consumer (corpus budgets, mixture
    reports, sequence packing, length bucketing) accepts (VERDICT r6
    missing #3: whitespace counts are a fine corpus-accounting proxy,
    but a real LLM pipeline budgets in tokenizer units):

    - ``"whitespace"`` (default): normalized whitespace tokens — the
      oracle-parity baseline every registered entry uses.
    - ``"bpe"``: the BPE-pretokenizer regex count (JVM regex, no
      Python).
    - a number: chars-per-token ratio model (``char_ratio_counter``).
    - a callable ``Column -> Column``: used as-is — pass
      ``pandas_tokenizer_counter(...)`` for a real tokenizer.
    """
    if callable(counter):
        return counter
    if counter == "whitespace":
        return token_count
    if counter == "bpe":
        return bpe_token_count
    if isinstance(counter, (int, float)) and not isinstance(counter, bool):
        return char_ratio_counter(counter)
    raise ValueError(
        "counter must be 'whitespace' | 'bpe' | chars-per-token number | "
        f"Column->Column callable, got {counter!r}"
    )


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return n_punct.cast("double") / F.greatest(F.length(col), F.lit(1))


def _with_tokens(docs: DataFrame, id_col: str, text_col: str, extra: list[str] | None = None) -> DataFrame:
    """Project the token array ONCE before deriving features — an inline
    ``tokens(col)`` would be re-expanded (regex chain and all) into every
    expression that references it (see hashing.shingles_from_words)."""
    return docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("__toks"),
        *(extra or []),
    )


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc stats: chars, whitespace tokens, BPE-ish tokens, average
    word length, punctuation ratio, stopword ratio."""
    t = F.col(text_col)
    toks = F.col("__toks")
    n_tok = F.size(toks)
    word_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, v: a + v
    )
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return _with_tokens(docs, id_col, text_col).select(
        F.col(id_col),
        F.length(t).cast("int").alias("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        bpe_token_count(t).cast("int").alias("n_bpe_tokens"),
        (word_chars.cast("double") / F.greatest(n_tok, F.lit(1))).alias("avg_word_len"),
        punct_ratio(t).alias("punct_ratio"),
        (n_stop.cast("double") / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: length credit + lexical diversity,
    penalized by punctuation excess. Components are each one division;
    the blend is a left-assoc add chain (deterministic cross-engine)."""
    t = F.col(text_col)
    toks = F.col("__toks")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    length_credit = F.least(F.length(t).cast("double") / F.lit(500.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tok
    punct_penalty = punct_ratio(t)
    score = length_credit * F.lit(0.4) + diversity * F.lit(0.4) + (F.lit(1.0) - punct_penalty) * F.lit(0.2)
    return _with_tokens(docs, id_col, text_col).select(
        F.col(id_col),
        F.round(length_credit, 6).alias("length_credit"),
        F.round(diversity, 6).alias("diversity"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID with a CJK fast path.

    Scores each language by marker-token hits; ties break by fixed language
    order (en > es > de > fr). Documents containing CJK codepoints are
    'zh' outright. A real pipeline swaps in fastText/CLD3 via a Pandas
    UDF; the heuristic IS the 100 TB prefilter."""
    toks = F.col("__toks")

    def marker_hits(markers: tuple[str, ...]):
        # single-arg lambda: a default arg would make PySpark treat it as
        # the (value, index) two-arg higher-order-function form
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    has_cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")) > 0
    best = F.greatest(*scores.values())
    guess = (
        F.when(has_cjk, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["es"] == best, F.lit("es"))
        .when(scores["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return _with_tokens(docs, id_col, text_col).select(
        F.col(id_col),
        *[s.cast("int").alias(f"score_{lang}") for lang, s in scores.items()],
        guess.alias("lang_guess"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Two content fingerprints: md5 (exact-dup key) and a 31-base
    polynomial rolling hash mod 2^31-1 (cheap shift-friendly key; the
    building block for Rabin-Karp-style chunking)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.md5(t).alias("md5_hex"),
        rolling_hash(t).alias("rhash"),
    )


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every word k-gram, slide a window of ``window``
    consecutive hashes, keep the MIN of each window, emit the distinct
    selected hashes as (id, fp) rows.

    Guarantee: any two documents sharing a run of at least
    ``window + k - 1`` tokens share at least one fingerprint — local
    similarity detection whose fingerprint density is ~2/(window+1) of
    the k-gram count, independent of document length. The pair search
    downstream is a plain equi-join on fp (same shape and skew story as
    the shingle join; reuse ``max_shingle_df``-style caps there).

    Entirely JVM-side expression work — one narrow map then one explode;
    no shuffle. The k-gram hash here is the first 15 hex digits of md5
    (60 bits) so the DuckDB oracle can replicate fingerprint SELECTION
    exactly (min-of-window depends on hash VALUES, so oracle parity
    needs an identical hash on both engines — the same reason
    sampling.py's bucketing is md5-based). A production variant swaps
    xxhash64 for md5 (4× cheaper; the algorithm is hash-agnostic).

    Short docs: fewer than k tokens → no k-grams → no fingerprints
    (mirrors shingle_hash_docs' contract); fewer than window k-grams →
    one window over what exists.
    """
    # Two-phase projection (the shingles_from_words rule): materialize the
    # token array BEFORE the gram lambda references it — codegen inlines
    # expression trees into every lambda reference, so an inline
    # split(normalize) would re-run the regex chain k times per gram
    # (measured 4.06 s → 0.99 s at sf0.1 for this operator).
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__w")
    )
    words = F.col("__w")
    n = F.size(words)
    n_grams = n - (k - 1)
    gram_hash = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat_ws(
                    " ", *[F.element_at(words, i + j) for j in range(k)]
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    # guard: F.sequence(1, stop) with stop < 1 generates a DESCENDING
    # sequence, not an empty one — gate short docs explicitly
    hs = F.when(n_grams >= 1, F.transform(F.sequence(F.lit(1), n_grams), gram_hash)).otherwise(
        F.array().cast("array<bigint>")
    )
    with_hs = toks.select(F.col(id_col), hs.alias("__hs"))
    m = F.size(F.col("__hs"))
    n_windows = m - (window - 1)
    sel = (
        F.when(
            n_windows >= 1,
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(F.col("__hs"), j, window)),
            ),
        )
        .when(m >= 1, F.array(F.array_min(F.col("__hs"))))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return with_hs.select(
        F.col(id_col), F.explode(F.array_distinct(sel)).alias("fp")
    )


def winnowing_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """Local-similarity pair search over winnowing fingerprints: equi-join
    docs on shared fingerprints, keep pairs sharing ≥ ``min_shared`` —
    the consumer that turns :func:`winnowing_fingerprints` into a dedup/
    plagiarism candidate generator. By the winnowing guarantee every
    pair sharing a ≥ window+k-1 token run appears here (with
    ``min_shared=1``); higher ``min_shared`` trades recall on single
    short overlaps for precision.

    Same scale story as the shingle join: only pairs sharing a
    fingerprint materialize, and fingerprint density is ~2/(window+1)
    of the k-gram count, so the join input is ~4× smaller than the raw
    shingle join's at these parameters. ``max_fp_df`` is the same
    hot-key guard as ngram_jaccard_pairs' ``max_shingle_df`` (a
    boilerplate fingerprint shared by D docs is a D² blowup): hot
    fingerprints are dropped via broadcast anti-join, no extra shuffle.
    The fingerprint table is referenced by both join sides —
    materialized once per the single-materialization rule."""
    from .dedup import materialize

    fps = materialize(
        winnowing_fingerprints(docs, id_col, text_col, k, window), checkpoint
    )
    join_side = fps
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_fp_df)
            .select("fp")
        )
        join_side = fps.join(F.broadcast(hot), "fp", "left_anti")
    a, b = join_side.alias("a"), join_side.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-level term statistics: per-(doc, term) frequency and per-term
    document frequency — the exact-integer core of TF-IDF (the float IDF
    weighting lives in :func:`tfidf_top_terms`; ln() is libm-dependent and
    engines disagree in the last ulp, so the oracle-checked surface stays
    integral).

    Two hash aggregations, both on (term[, doc]) keys; the token explode is
    a narrow map. At 100 TB the df aggregate is the only corpus-wide
    shuffle and it moves (term, count) pairs — vocabulary-sized, not
    corpus-sized, after map-side partial aggregation.
    """
    toks = _with_tokens(docs, id_col, text_col).select(
        F.col(id_col), F.explode("__toks").alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(df_, "term").select(id_col, "term", "tf", "df")


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 5,
) -> DataFrame:
    """Top-n characteristic terms per doc by tf·idf with *ratio* idf
    (idf = N/df), deterministic tie-break on the term string.

    Why not ln(N/df): ln is libm-dependent — Java's Math.log and DuckDB's
    C log may disagree in the last ulp on identical inputs, which poisons
    both the emitted score and (via near-ties) the rank. N/df is one IEEE
    divide and tf·(N/df) one IEEE multiply — both correctly rounded and
    bit-identical cross-engine, so score AND ranking are hash-checkable.
    ln is a monotone transform of idf, so per-term idf order is unchanged;
    the tf-weighted ranking is the standard "raw idf" tf-idf variant.

    N rides in as a broadcast 1-row aggregate (crossJoin) instead of a
    driver-side docs.count(): the whole operator stays ONE lazy plan — no
    eager extra job per invocation, and no collected scalar to go stale
    if `docs` changes underneath (VERDICT r1 "what's wrong" #3).
    """
    from pyspark.sql import Window

    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    scored = (
        term_frequencies(docs, id_col, text_col)
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf").cast("double") * (F.col("__n_docs") / F.col("df")))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "term", "tf", "df", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def bm25_tf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The corpus inverted-index base behind :func:`bm25_topk` — per-doc
    term frequencies ``(id, term, tf)``, LAZY. Split out (r15) so a
    sweep-level share can materialize it once and hand the same table to
    every BM25 consumer (df/dl/total-mass all derive from it); the
    operator builds it itself when no ``tf=`` is passed."""
    toks = _with_tokens(docs, id_col, text_col).select(
        F.col(id_col), F.posexplode("__toks").alias("pos", "term")
    )
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    docs: DataFrame,
    query_doc_ids: list[int],
    n_query_terms: int = 3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str = "local",
    tf: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k retrieval over the corpus: each query is the first
    ``n_query_terms`` distinct terms (by first occurrence) of a query
    document; every corpus document that matches ≥1 query term is scored

        score(q, d) = Σ_t idf_r(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))

    with the *ratio* idf idf_r = (N − df + 0.5)/(df + 0.5) — the log-free
    variant for the same reason tfidf_top_terms uses N/df: ln is
    libm-dependent across engines while −, +, ·, / are correctly-rounded
    IEEE and bit-identical, so score AND ranking are hash-checkable.
    ln is monotone in the classic Robertson idf argument, so per-term idf
    ORDER matches textbook BM25; only the scale differs (documented
    variant, not an approximation of the ranking function's shape).

    Determinism: every per-term score is one fixed expression tree of
    correctly-rounded IEEE ops; the per-(query, doc) total folds the term
    scores LEFT-TO-RIGHT in term-sorted order (F.aggregate over a
    sort_array'd collect_list — the zscore discipline), so the double is
    bit-identical to DuckDB's list_reduce over list(... ORDER BY term).

    Scale shape (100 TB): tf/df/dl are the term_frequencies aggregates —
    map-side-combined, vocabulary-sized after the combine; query terms are
    a ≤|q|·n_terms broadcast (inverted-index probe, never a corpus×corpus
    join); only MATCHING (query, doc) rows are scored; the final top-k is
    the exact TWO-LEVEL rank (bucket by pmod(doc_id, n_buckets), keep each
    bucket's top-k by (score DESC, doc_id), then rank the ≤k·B survivors) —
    no corpus-sized single-reducer window survives (the
    contrastive_pairs_embeddings discipline; total order ⇒ identical to
    the direct rank, which is what the oracle runs).

    The tf table is referenced by FOUR branches (df, dl, total-mass,
    matching) — the single-materialization rule (dedup.py): it is
    checkpointed once via ``checkpoint`` ("local" default | "reliable"
    | "persist" | "none" to keep the plan fully lazy), so the corpus is
    tokenized once, not four times. In production the tf/df/dl tables
    ARE the stored inverted index, built once per corpus snapshot —
    and ``tf=`` (r15) lets a sweep hand that shared materialized index
    in so it is also built once per SWEEP, not once per consumer (the
    dedup ``postings=`` pattern; the share builds through
    :func:`bm25_tf`, the same code path, so values are identical). The
    query-term probe still tokenizes only the ≤|q| query docs (the
    ``isin`` filter pushes below the explode into the scan).
    """
    from pyspark.sql import Window

    from .dedup import materialize

    toks = _with_tokens(docs, id_col, text_col).select(
        F.col(id_col), F.posexplode("__toks").alias("pos", "term")
    )
    if tf is None:
        tf = bm25_tf(docs, id_col, text_col)
        if checkpoint != "none":
            tf = materialize(tf, checkpoint)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N over ALL docs (incl. token-less ones); total token mass from tf —
    # both ride as a broadcast 1-row aggregate, no driver-side collect.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    tot = tf.agg(F.sum("tf").cast("double").alias("__tot_tokens"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))

    # Query terms: first n distinct terms of each query doc, ranked by
    # first-occurrence position (ties impossible: positions are distinct).
    qw = Window.partitionBy("query_id").orderBy("first_pos", "term")
    qterms = (
        toks.filter(F.col(id_col).isin(query_doc_ids))
        .groupBy(F.col(id_col).alias("query_id"), "term")
        .agg(F.min("pos").alias("first_pos"))
        .withColumn("qrn", F.row_number().over(qw))
        .filter(F.col("qrn") <= n_query_terms)
        .select("query_id", "term")
    )

    matched = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_.join(F.broadcast(qterms.select("term").distinct()), "term")), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(tot))
    )
    idf = (F.col("__n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    avgdl = F.col("__tot_tokens") / F.col("__n_docs")
    tfc = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    scored_terms = matched.select(
        "query_id", F.col(id_col), "term", (idf * tfc).alias("score_t")
    )
    g = scored_terms.groupBy("query_id", id_col).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "score_t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["score_t"],
        ).alias("score")
    )
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col(id_col), F.lit(n_buckets))
    ).orderBy(F.col("score").desc(), id_col)
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), id_col)
    return (
        g.withColumn("__brn", F.row_number().over(w1))
        .filter(F.col("__brn") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "score")
    )


def char_trigrams(s: Column) -> Column:
    """Sliding character trigrams of a MATERIALIZED normalized-text
    column (empty array under 3 chars). ``s`` must be a projected
    column, not an inline normalize expression — the inlining rule
    (shingles_from_words): codegen re-expands the full regex chain into
    every lambda reference otherwise."""
    return F.when(
        F.length(s) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - 2), lambda i: s.substr(i, F.lit(3))
        ),
    ).otherwise(F.array().cast("array<string>"))


def trigram_tf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The corpus trigram pass behind :func:`trigram_typicality` — per-doc
    char-trigram term frequencies ``(id, tri, tf)``, LAZY. Split out (r15)
    so a sweep-level share can materialize it once and hand the same table
    to every typicality consumer; the operator builds it itself when no
    ``tf=`` is passed."""
    norm = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__s"))
    occ = norm.select(
        F.col(id_col), F.explode(char_trigrams(F.col("__s"))).alias("tri")
    )
    return occ.groupBy(id_col, "tri").agg(F.count(F.lit(1)).alias("tf"))


def trigram_typicality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
    with_sums: bool = False,
    checkpoint: str = "local",
    tf: DataFrame | None = None,
    model: DataFrame | None = None,
) -> DataFrame:
    """Corpus-LM quality proxy (the CCNet idea — score every document by
    a language model of the corpus and filter the tail): a character
    TRIGRAM frequency model trained on the corpus itself, each document
    scored by its mean trigram probability

        typicality(d) = (1/|d|) Σ_occ c(tri)/T = Σ_tri tf_d·c(tri) / (T·|d|)

    Low typicality = character sequences rare in the corpus — mojibake,
    binary spill, wrong-language fragments; the standard cheap stand-in
    for perplexity when no external LM ships with the pipeline.

    Hash-exactness by ALGEBRA, not accumulation order: the middle form
    above is all INTEGER sums (Σ tf·c is a BIGINT), so the only floating
    ops are one multiply and one divide at the very end — no
    order-dependent double summation, no libm log (same reason
    tfidf_top_terms uses ratio idf: this is the monotone log-free twin
    of mean log-prob for RANKING within a fixed corpus... strictly it is
    the arithmetic rather than geometric mean, the documented variant).

    Scale shape (100 TB): the model is the trigram occurrence count —
    char-trigram vocabulary is bounded by |charset|³ (≤ ~1M for ASCII-ish
    corpora), so it BROADCASTS; scoring is a map-side broadcast join on
    the per-doc tf table plus one doc-keyed integer aggregation. The
    trigram explode is the only corpus-sized intermediate and it carries
    (id, 3 chars). Docs under 3 normalized chars score NULL (n_trigrams
    0). ``with_sums=True`` also emits the exact integer numerators
    (``sum_tf_c``, ``corpus_trigrams``) so any regrouping (per source,
    per split) can rebuild an exact group typicality without ever
    summing doubles. Overflow headroom: Σ tf·c stays under 2⁶³ while
    corpus_trigrams · max_doc_tf < 9.2e18 — at ~10¹⁵ total trigrams
    (≈100 TB of text) that allows per-doc trigram repeats up to ~9000;
    beyond that, pre-divide c by a power of two or switch the sum to
    DECIMAL(38,0).

    ``tf=`` / ``model=`` (r15): a caller that already holds the
    materialized per-doc tf table (and optionally the trigram model
    aggregated from it) passes the handles in and the corpus pass is not
    rebuilt — the ``postings=``/``sizes=`` sharing pattern from
    operators/dedup. Values are identical by construction (the share
    builds via :func:`trigram_tf`, the same code path).
    """
    norm = docs.select(
        F.col(id_col), *[F.col(c) for c in keep], normalize_text(F.col(text_col)).alias("__s")
    )
    if tf is None:
        tf = trigram_tf(docs, id_col, text_col)
        # The model and total derive from tf (Σ tf per trigram ==
        # occurrence count), and tf feeds the scoring join too — so tf is
        # the one corpus-pass product, materialized once (the
        # single-materialization rule; "none" keeps the plan fully lazy).
        if checkpoint != "none":
            from .dedup import materialize

            tf = materialize(tf, checkpoint)
    if model is None:
        model = tf.groupBy("tri").agg(F.sum("tf").alias("c"))
    tot = model.agg(F.sum("c").alias("__tt"))
    per_doc = (
        tf.join(F.broadcast(model), "tri")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * F.col("c")).alias("__num"),
            F.sum("tf").alias("__ntri"),
        )
    )
    extra = (
        [
            F.coalesce("__num", F.lit(0)).cast("long").alias("sum_tf_c"),
            F.col("__tt").cast("long").alias("corpus_trigrams"),
        ]
        if with_sums
        else []
    )
    return (
        norm.select(id_col, *keep)
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            *keep,
            F.coalesce("__ntri", F.lit(0)).cast("int").alias("n_trigrams"),
            (
                F.col("__num").cast("double")
                / (F.col("__tt").cast("double") * F.col("__ntri").cast("double"))
            ).alias("typicality"),
            *extra,
        )
    )


def pack_token_bins(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    shards: int = 32,
    counter="whitespace",
) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget bins — the
    step that turns a deduped corpus into training-sequence groups.

    Greedy streaming packing in deterministic order, SHARD-PARALLEL: a
    single global running sum would serialize the corpus through one
    partition, so documents first hash into ``shards`` independent
    streams (doc_id mod shards — deterministic, append-stable), and each
    shard packs by running token count: bin = floor(cum_before / budget).
    One shuffle on the shard key; the window is a running integer sum.
    Oversized docs (> budget) get a bin of their own and overflow it —
    callers chunk those first (chunk_documents). Exact integer
    arithmetic end-to-end, so the assignment is oracle-checkable.
    ``counter`` swaps the token-count model (resolve_token_counter) —
    pack in tokenizer units by passing "bpe", a chars-per-token ratio,
    or a pandas_tokenizer_counter; whitespace stays the oracle default.
    """
    from pyspark.sql import Window

    cnt = resolve_token_counter(counter)
    toks = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
        cnt(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    # floor, not cast: a double→int CAST truncates in Spark but ROUNDS in
    # DuckDB — floor division is the portable exact form (oracle uses //)
    return toks.select(
        F.col(id_col),
        "shard",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("bin_idx"),
    )


# PII patterns, deliberately inside the RE2 ∩ Java regex subset (char
# classes, bounded quantifiers, \b) so Spark and the DuckDB oracle agree.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII scrub — the standard pre-training redaction pass: emails,
    phone numbers, IPv4 addresses replaced with typed placeholders, plus
    per-category hit flags. A pure narrow map (chained regexp_replace,
    codegen'd, no shuffle): at 100 TB this fuses into the ingest scan.
    Patterns apply in declaration order to the progressively-redacted
    text (an email never half-matches as a phone)."""
    out = F.col(text_col)
    flags = []
    for name, pat, repl in PII_PATTERNS:
        flags.append(F.col(text_col).rlike(pat).alias(f"has_{name}"))
        out = F.regexp_replace(out, pat, repl)
    return docs.select(F.col(id_col), out.alias("redacted"), *flags)


def chunk_documents(docs: DataFrame, size: int = 16, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixed-size word-window chunking via a Python UDTF — the
    table-function surface (one input row → N output rows with their own
    schema), completing the scalar/grouped/table UDF triple. Chunking into
    training-window-sized pieces is the canonical LLM-pipeline use.

    The UDTF class is built inside the registration helper so cloudpickle
    ships it by value (module-level classes pickle by reference and break
    on workers — see streaming/stateful.py). Row-at-a-time Python is the
    UDTF contract; for bulk chunking prefer the pure-column equivalent
    (explode over a sequence) — this operator exists to exercise and
    document the UDTF path.
    """
    spark = docs.sparkSession
    _ensure_chunk_udtf(spark)
    docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).createOrReplaceTempView("__chunk_src")
    out = spark.sql(
        "SELECT c.* FROM __chunk_src, "
        f"LATERAL __chunk_doc(doc_id, text, {int(size)}) AS c"
    )
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out


# Sessions that already registered the __chunk_doc UDTF. Re-registering
# under the same name is functionally harmless but emits a
# SimpleTableFunctionRegistry "replaced a previously registered function"
# WARN on every call (VERDICT r10 hygiene #2) — register once per live
# session instead. WeakSet so a torn-down session doesn't pin memory and
# a recreated one re-registers cleanly.
_CHUNK_UDTF_SESSIONS: "weakref.WeakSet" = None  # type: ignore[assignment]


def _ensure_chunk_udtf(spark) -> None:
    global _CHUNK_UDTF_SESSIONS
    import weakref

    if _CHUNK_UDTF_SESSIONS is None:
        _CHUNK_UDTF_SESSIONS = weakref.WeakSet()
    if spark in _CHUNK_UDTF_SESSIONS:
        return
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_words int")
    class ChunkDoc:
        def eval(self, doc_id, text, size):  # noqa: ANN001
            step = max(int(size), 1)
            words = (text or "").split()
            for i in range(0, max(len(words), 1), step):
                piece = words[i : i + step]
                yield doc_id, i // step, " ".join(piece), len(piece)

    spark.udtf.register("__chunk_doc", ChunkDoc)
    _CHUNK_UDTF_SESSIONS.add(spark)


def chunk_documents_columnar(
    docs: DataFrame,
    size: int = 16,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pure-column bulk chunker — the SCALE path the UDTF chunker's
    docstring points at: explode over a computed chunk-index sequence,
    slice the projected token array per index. Zero Python, narrow map +
    generate, no shuffle. With ``overlap`` > 0, consecutive chunks share
    that many tokens (stride = size − overlap) — the RAG-retrieval
    windowing where a fact straddling a boundary must appear whole in
    at least one chunk.

    Contract (matches the UDTF at overlap=0, equivalence-tested): chunks
    are word slices of ``size`` starting every stride tokens; the last
    chunk may be shorter; an empty/whitespace doc yields ONE empty
    chunk. ``overlap`` must be < ``size``.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"overlap must be in [0, size); got {overlap} vs {size}")
    stride = size - overlap
    # Case-PRESERVING whitespace split (Python str.split semantics — the
    # UDTF contract), NOT tokens() (which lowercases): collapse ALL
    # whitespace to single spaces then trim, so tabs/newlines at the
    # edges can't produce phantom empty tokens (F.trim strips spaces
    # only — found by review, mirrored in the oracle in lockstep)
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    raw = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )
    toks = docs.select(F.col(id_col), raw.alias("__toks"))
    n = F.size(F.col("__toks"))
    # number of stride-aligned starts covering the doc; empty doc → 1
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.ceil((n - size) / F.lit(stride)).cast("int") + 1
    )
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    piece = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, size)
    return toks.select(F.col(id_col), idx, F.col("__toks")).select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("int").alias("n_words"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Repetition quality rule (the Gopher/MassiveText family): per doc,
    the most frequent word n-gram and the fraction of the document's
    characters it covers — the filter that catches looping/boilerplate
    generations exact-dedup misses. Returns
    (id, top_ngram, top_count, char_frac).

    Counts are MULTISET n-gram counts (no array_distinct — repetition is
    the signal). Ties break on the lexicographically smallest n-gram, so
    the result is deterministic and SQL-replicable. One shuffle on
    (id, ngram) for the count, one on id for the arg-max window; the
    division is a single double op (cross-engine IEEE-identical), with
    the denominator clamped so an empty doc yields 0.0, not a
    divide-by-zero.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__len"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
    )
    w_ = F.col("__words")
    grams = toks.select(
        F.col(id_col),
        F.col("__len"),
        F.explode(
            F.when(
                F.size(w_) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(w_) - n),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(w_, i + j + 1) for j in range(n)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ngram"),
    )
    counts = grams.groupBy(id_col, "__len", "ngram").agg(
        F.count(F.lit(1)).alias("top_count")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("top_count").desc(), F.col("ngram"))
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return top.select(
        F.col(id_col),
        F.col("ngram").alias("top_ngram"),
        F.col("top_count"),
        (
            (F.col("top_count") * F.length(F.col("ngram"))).cast("double")
            / F.greatest(F.col("__len"), F.lit(1))
        ).alias("char_frac"),
    )


def bigram_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Collocation / phrase mining over the corpus: for every adjacent
    word pair occurring ≥ ``min_count`` times, the lift ratio
    ``count(ab)·T / (count(a)·count(b))`` — the PMI statistic without
    the log (ln is libm-dependent and engines disagree in the last ulp;
    the RATIO is one integer product per side and a single IEEE divide,
    so it hash-matches exactly and orders identically to PMI). The
    vocabulary-building step that decides which word pairs become
    single tokens.

    Scale: token/bigram explodes are narrow maps; the aggregations
    shuffle (term, count) pairs — vocabulary-sized after map-side
    partials, never corpus-sized. T (total bigram count) arrives via a
    broadcast 1-row aggregate inside the same plan (no driver count).
    """
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__w")
    )
    w_ = F.col("__w")
    bi = toks.filter(F.size(w_) >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(w_) - 1),
                lambda i: F.struct(
                    F.element_at(w_, i).alias("w1"),
                    F.element_at(w_, i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    uni = toks.select(F.explode(w_).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    pair = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    total = bi.agg(F.count(F.lit(1)).alias("t"))
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    return (
        pair.filter(F.col("c_ab") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c_ab").alias("pair_count"),
            (
                (F.col("c_ab") * F.col("t")).cast("double")
                / (F.col("c_a") * F.col("c_b"))
            ).alias("lift"),
        )
    )


def word_vocab(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(word, wcount)`` type table of the corpus's whitespace tokens.

    The BPE-training substrate: the ONE corpus-sized shuffle happens
    here (token explode + groupBy with map-side partials); everything
    downstream — pair mining, merge learning — runs over the TYPE table,
    which Heaps' law keeps orders of magnitude smaller than the corpus
    (this is exactly how production BPE trainers scale: count words
    once, then iterate on the weighted vocabulary)."""
    t = _with_tokens(docs, id_col, text_col)
    return (
        t.select(F.explode("__toks").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def bpe_pair_counts(
    vocab: DataFrame, word_col: str = "word", count_col: str = "wcount"
) -> DataFrame:
    """Adjacent character-pair statistics over a weighted vocabulary —
    the argmax candidate table of BPE's first merge iteration:
    ``pair_count`` = corpus occurrences (Σ wcount over every adjacent
    position, overlapping occurrences counted as BPE trainers do) and
    ``n_words`` = distinct word types containing the pair.

    Scale: runs over the TYPE table (see word_vocab) — the explode is
    |vocab| × avg_word_len rows of 2-char strings, the aggregate is
    alphabet²-sized after map-side partials. Zero Python; substring and
    sequence are codegen'd expressions."""
    w, c = F.col(word_col), F.col(count_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.length(w) - 1),
        lambda i: F.substring(w, i, F.lit(2)),
    )
    return (
        vocab.filter(F.length(w) >= 2)
        .select(w.alias("__word"), c.alias("__wc"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(
            F.sum("__wc").alias("pair_count"),
            F.count_distinct(F.col("__word")).alias("n_words"),
        )
    )


def _merge_pair(syms: Column, left: Column, right: Column) -> Column:
    """Left-to-right single-pass merge of adjacent (left, right) symbol
    occurrences in a symbol array — the BPE apply step as a pure fold
    (``aggregate``), matching the reference trainer's greedy scan:
    in 'aaa' with pair (a,a) the first two symbols merge and the third
    survives alone."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(
    vocab: DataFrame,
    n_merges: int = 10,
    word_col: str = "word",
    count_col: str = "wcount",
    checkpoint: str = "local",
) -> list[tuple[int, str, str, int]]:
    """Greedy BPE training over a weighted vocabulary: ``n_merges``
    iterations of (count adjacent symbol pairs) → (merge the argmax
    pair corpus-wide). Returns ``[(step, left, right, pair_count)]`` —
    the learned merge table, in order.

    Distribution contract: each iteration is ONE aggregation over the
    type table (pair, Σwcount) plus a narrow map applying the merge —
    the corpus itself is never touched after word_vocab. The argmax is
    the sanctioned driver-side scalar per iteration (exactly the
    k-means-inertia pattern, similarity.py): one 4-field row collected
    per merge, deterministic via the (count DESC, left, right) total
    order. The evolving symbol table is re-materialized each step
    (strategy knob, operators/dedup.materialize) so step k+1's scan
    does not replay steps 1..k's folds.

    Pair counting counts overlapping occurrences (standard trainer
    behavior); the apply step merges left-to-right non-overlapping
    (_merge_pair), so 'aaa' contributes 2 to (a,a)'s count but yields
    ['aa','a'] after the merge — property-tested against a pure-Python
    reference model in tests/test_properties.py."""
    from .dedup import materialize

    w = F.col(word_col)
    syms = vocab.filter(F.length(w) >= 1).select(
        F.col(count_col).alias("__wc"),
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.substring(w, i, F.lit(1)),
        ).alias("__syms"),
    )
    syms = materialize(syms, checkpoint)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        s = F.col("__syms")
        adj = F.zip_with(
            F.slice(s, 1, F.size(s) - 1),
            F.slice(s, 2, F.size(s) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        best = (
            syms.filter(F.size(s) >= 2)
            .select(F.col("__wc"), F.explode(adj).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("__wc").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, count = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((step, left, right, count))
        syms = materialize(
            syms.select(
                "__wc", _merge_pair(s, F.lit(left), F.lit(right)).alias("__syms")
            ),
            checkpoint,
        )
    return merges


def length_bucketed_batches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 64,
    batch_size: int = 8,
    counter="whitespace",
) -> DataFrame:
    """Length-bucketed batch assignment for inference/training: docs are
    bucketed by token count (width ``bucket_width``) and numbered into
    batches of ``batch_size`` WITHIN their bucket, so every batch holds
    similar-length sequences and padding waste is bounded by the bucket
    width — the standard dynamic-batching layout.

    All-integer arithmetic (token count, floor-div bucket, row_number,
    floor-div batch index) — engine-exact by construction. One shuffle
    on the bucket key; batch ids are deterministic via the (n_tokens,
    id) total order within each bucket.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        resolve_token_counter(counter)(F.col(text_col)).alias("n_tokens"),
    )
    b = toks.withColumn(
        "bucket", F.floor(F.col("n_tokens") / bucket_width).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy("n_tokens", id_col)
    return b.withColumn(
        "batch_idx",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("int"),
    ).select(id_col, F.col("n_tokens").cast("int").alias("n_tokens"), "bucket", "batch_idx")


def textrank_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_iter: int = 5,
    min_len: int = 3,
    checkpoint: str = "local",
) -> DataFrame:
    """Corpus-level TextRank keyword scores: PageRank (damping 0.85,
    ``n_iter`` fixed iterations) over the word co-occurrence graph —
    nodes are content words (length ≥ ``min_len``, non-stopword),
    undirected edges are adjacency counts in the filtered token
    sequence.

    Exactness design: ranks live in SCALED INTEGERS (1.0 ≡ 1_000_000)
    and every update is integer multiply/divide —
    ``r' = 150000 + (85·Σ((r·w) div W_u)) div 100`` — so the fixpoint
    math is BIGINT-exact and bit-identical cross-engine (float PageRank
    sums are order-dependent; decimal division scale rules differ
    between engines; integer div agrees everywhere for positives).

    Scale: ONE corpus pass builds the weighted edge list (bigram
    explode + count — vocabulary²-bounded but co-occurrence-sparse in
    practice); each iteration is one (src-keyed) join + one (dst-keyed)
    aggregate over edges, with the rank table materialized per step
    (the CC-fixpoint discipline, dedup.py) so step k+1 never replays
    1..k. Returns (word, rank_score, degree)."""
    from .dedup import materialize

    fw = F.filter(
        tokens(F.col(text_col)),
        lambda w: (F.length(w) >= min_len) & ~w.isin(*STOPWORDS),
    )
    t = docs.select(fw.alias("__fw"))
    w_ = F.col("__fw")
    bi = (
        t.filter(F.size(w_) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(w_) - 1),
                    lambda i: F.struct(
                        F.element_at(w_, i).alias("src"),
                        F.element_at(w_, i + 1).alias("dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .filter(F.col("src") != F.col("dst"))
    )
    und = bi.union(bi.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ed = und.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    wu = ed.groupBy("src").agg(F.sum("w").alias("wu"))
    edges = materialize(ed.join(wu, "src"), checkpoint)
    nodes = edges.select(F.col("src").alias("word")).distinct()
    degree = edges.groupBy(F.col("src").alias("word")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    ranks = nodes.select("word", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["word"])
            .select(F.col("dst"), F.expr("(r * w) div wu").alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("c"))
        )
        ranks = materialize(
            nodes.join(contrib, nodes["word"] == contrib["dst"], "left")
            .select(
                "word",
                F.expr(
                    "150000 + ((85 * coalesce(c, 0L)) div 100)"
                ).alias("r"),
            ),
            checkpoint,
        )
    return ranks.join(degree, "word").select(
        "word", F.col("r").alias("rank_score"), F.col("degree").cast("long").alias("degree")
    )


def inverted_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: list[str] | None = None,
) -> DataFrame:
    """Positional inverted-index postings ``(doc_id, pos, term)`` —
    the retrieval-engine substrate (BM25 ranks, phrase/proximity
    queries, collocation windows all consume this table). ``terms``
    restricts the postings to a term set BEFORE anything downstream —
    for a known query the filter lands pre-explode (a narrow scan
    predicate), so the posting build for a phrase query moves only the
    phrase terms' rows, never the corpus's."""
    t = _with_tokens(docs, id_col, text_col)
    if terms is not None:
        # prune docs that can't contribute before exploding
        t = t.filter(F.arrays_overlap(F.col("__toks"), F.array(*[F.lit(x) for x in terms])))
    out = t.select(
        F.col(id_col), F.posexplode("__toks").alias("pos", "term")
    )
    if terms is not None:
        out = out.filter(F.col("term").isin(*terms))
    return out


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase query via positional posting intersection: term i
    of the phrase matches at ``start + i``, so each join step is an
    equi-join on ``(doc_id, start)`` — the classic positional-index
    phrase plan. Returns ``(doc_id, n_matches, first_pos)``.

    Scale: postings are filtered to the phrase's terms before the
    explode (inverted_postings ``terms=``), so k−1 joins move only
    phrase-term postings; after the first shuffle on (doc_id, pos) the
    subsequent joins reuse the same partitioning (one exchange, k−1
    co-partitioned joins). Equivalence with a direct array scan is
    pytest-locked; the join path is the one that generalizes to an
    index SERVED from storage rather than rebuilt per query."""
    terms = [t for t in str(phrase).strip().lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one term")
    post = inverted_postings(docs, id_col, text_col, terms=sorted(set(terms)))
    starts = post.filter(F.col("term") == terms[0]).select(id_col, "pos")
    for i, term in enumerate(terms[1:], 1):
        nxt = post.filter(F.col("term") == term).select(
            F.col(id_col), (F.col("pos") - i).alias("pos")
        )
        starts = starts.join(nxt, [id_col, "pos"])
    return starts.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("pos").cast("int").alias("first_pos"),
    )


def persist_text_index(
    docs: DataFrame,
    path: str,
    n_term_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the BM25 serving index (bm25_topk's docstring
    promise made concrete): the tf postings written as parquet
    PARTITIONED BY an md5 term bucket — a query lists only its terms'
    bucket directories, never the corpus — with the per-doc length
    DENORMALIZED into each posting row (classic posting-list layout:
    scoring needs dl, and a doc-keyed side table could not be
    partition-pruned by term), plus the 1-row (n_docs, tot_tokens)
    stats table. Build once per corpus snapshot; the serve path
    (:func:`search_text_index`) never touches the text corpus.

    The bucket function is the md5 prefix (sampling.hash_bucket), NOT
    xxhash64, deliberately: the client must compute a term's bucket
    WITHOUT a Spark job (hashlib.md5 in plain Python matches), the same
    reason ANN serving computes probe cells client-side."""
    _write_index_delta(docs, path, n_term_buckets, id_col, text_col, mode="overwrite")


def _index_postings(docs, n_term_buckets, id_col, text_col):
    """(postings with denormalized dl + term_bucket, doclens) for a doc
    batch — the shared build step of persist and incremental update."""
    from .sampling import hash_bucket

    toks = _with_tokens(docs, id_col, text_col).select(
        F.col(id_col), F.explode("__toks").alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    post = tf.join(dl, id_col).withColumn(
        "term_bucket", hash_bucket(F.col("term"), "tix", n_term_buckets).cast("int")
    )
    # every indexed doc appears in doclens, even all-stopword/empty ones
    # (dl=0) — doclens is the index's doc-id REGISTRY, consulted by the
    # update collision guard and the tombstone path
    doclens = (
        docs.select(F.col(id_col))
        .join(dl, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("dl"), F.lit(0)).cast("bigint").alias("dl"),
            F.pmod(F.col(id_col), F.lit(n_term_buckets)).cast("int").alias(
                "doc_bucket"
            ),
        )
    )
    return post, doclens


def _write_index_delta(docs, path, n_term_buckets, id_col, text_col, mode):
    post, doclens = _index_postings(docs, n_term_buckets, id_col, text_col)
    post.write.mode(mode).partitionBy("term_bucket").parquet(path + "/postings")
    doclens.write.mode(mode).partitionBy("doc_bucket").parquet(path + "/doclens")
    batch = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        post.agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("tot_tokens"))
    )
    if mode == "overwrite":
        stats = batch
    else:
        old = batch.sparkSession.read.parquet(path + "/stats").collect()[0]
        new = batch.collect()[0]
        stats = batch.sparkSession.createDataFrame(
            [(old.n_docs + new.n_docs, old.tot_tokens + new.tot_tokens)],
            "n_docs bigint, tot_tokens bigint",
        )
    # tiny 1-row table; for append the counts are pre-collected above, so
    # the overwrite never reads the path it replaces
    stats.write.mode("overwrite").parquet(path + "/stats.__new__")
    import shutil

    shutil.rmtree(path + "/stats", ignore_errors=True)
    import os

    os.rename(path + "/stats.__new__", path + "/stats")


def update_text_index(
    spark,
    new_docs: DataFrame,
    path: str,
    n_term_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incrementally ADD a doc batch to a persisted text index — the
    nightly-crawl-delta path: only the new batch is tokenized; its
    posting files APPEND into the term-bucket directories (existing
    files never rewritten — object-store-append cheap) and the 1-row
    stats table is replaced with the summed counts. df is derived from
    postings AT SERVE TIME, so appended postings are correct
    immediately, with no index-wide df rebuild.

    Append-only by contract: an id already in the index (or tombstoned)
    raises — updating a live doc is tombstone + re-add under a NEW id,
    or a full rebuild; silently appending would double-count the doc in
    df/tf. The guard reads ONLY the doclens partitions the new ids hash
    to (partition-pruned doc-id registry), never the posting bodies."""
    ids = new_docs.select(F.col(id_col)).distinct()
    buckets = [
        r[0]
        for r in ids.select(
            F.pmod(F.col(id_col), F.lit(n_term_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    ]
    import os

    # tombstone guard first: a tombstoned id is still in the doclens
    # registry, and "tombstoned" is the actionable diagnosis
    if os.path.isdir(path + "/tombstones"):
        n_dead = (
            spark.read.parquet(path + "/tombstones")
            .join(F.broadcast(ids), id_col, "left_semi")
            .count()
        )
        if n_dead:
            raise ValueError(
                f"update_text_index: {n_dead} incoming id(s) are tombstoned — "
                "the serve-time anti-join would hide the new postings; "
                "compact the index or use fresh ids"
            )
    existing = (
        spark.read.parquet(path + "/doclens")
        .filter(F.col("doc_bucket").isin(buckets))
        .join(F.broadcast(ids), id_col, "left_semi")
    )
    n_clash = existing.count()
    if n_clash:
        raise ValueError(
            f"update_text_index: {n_clash} incoming id(s) already indexed — "
            "tombstone first or rebuild; appending would double-count df/tf"
        )
    _write_index_delta(new_docs, path, n_term_buckets, id_col, text_col, mode="append")


def tombstone_text_index(
    spark,
    path: str,
    ids: list[int],
    n_term_buckets: int = 64,
    id_col: str = "doc_id",
) -> None:
    """Logically DELETE docs from a persisted text index by appending
    (doc_id, dl) tombstones — the Lucene deleted-docs move: no posting
    file is touched; the serve path anti-joins the (tiny, broadcast)
    tombstone set BEFORE computing df and subtracts (count, Σdl) from
    the stats, so served scores are EXACTLY those of an index rebuilt
    without the docs (test-pinned). Physical reclamation is a later
    compaction (rebuild from the surviving corpus); tombstones are the
    serving-correct bridge until then.

    dl rides into the tombstone from the doclens registry (partition-
    pruned by doc-id bucket) — the stats correction needs it, and the
    posting bodies are never scanned. Unknown ids raise.
    ``n_term_buckets`` must match the build's (it sets the doclens
    partition modulus)."""
    dl_reg = spark.read.parquet(path + "/doclens")
    buckets = sorted({i % n_term_buckets for i in ids})
    found = (
        dl_reg.filter(F.col("doc_bucket").isin(buckets))
        .filter(F.col(id_col).isin(ids))
        .select(id_col, "dl")
    )
    rows = found.collect()
    if len(rows) != len(set(ids)):
        missing = set(ids) - {r[0] for r in rows}
        raise ValueError(f"tombstone_text_index: ids not in index: {sorted(missing)}")
    spark.createDataFrame(rows, f"{id_col} bigint, dl bigint").write.mode(
        "append"
    ).parquet(path + "/tombstones")


def compact_text_index(spark, path: str, id_col: str = "doc_id") -> int:
    """Physically reclaim tombstoned docs: rewrite postings and doclens
    WITHOUT the dead ids (keeping the partition layouts), fold the
    serve-time stats corrections into the stored stats, and drop the
    tombstone table — after which the index is byte-equivalent in served
    results (same anti-join algebra, now applied at rest) and the dead
    ids become re-addable. The tombstone → compact split is the standard
    index lifecycle: deletes stay cheap at serve time, and the full
    partition rewrite amortizes over a maintenance window. Returns the
    number of docs reclaimed; no-op (0) without tombstones.

    Staged-rename swap like sinks._staged_swap: a crash mid-compaction
    leaves either the old layout (tombstones intact) or a complete new
    one; the in-between rename gap is the documented non-atomicity of
    path-based tables."""
    import os
    import shutil

    if not os.path.isdir(path + "/tombstones"):
        return 0
    dead = (
        spark.read.parquet(path + "/tombstones")
        .groupBy(id_col)
        .agg(F.max("dl").alias("dl"))
    )
    corr = dead.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("toks")
    ).collect()[0]
    old_stats = spark.read.parquet(path + "/stats").collect()[0]

    live_post = spark.read.parquet(path + "/postings").join(
        F.broadcast(dead), id_col, "left_anti"
    )
    live_post.write.mode("overwrite").partitionBy("term_bucket").parquet(
        path + "/postings.__new__"
    )
    live_dl = spark.read.parquet(path + "/doclens").join(
        F.broadcast(dead), id_col, "left_anti"
    )
    live_dl.write.mode("overwrite").partitionBy("doc_bucket").parquet(
        path + "/doclens.__new__"
    )
    spark.createDataFrame(
        [(old_stats.n_docs - corr.n, old_stats.tot_tokens - corr.toks)],
        "n_docs bigint, tot_tokens bigint",
    ).write.mode("overwrite").parquet(path + "/stats.__new__")

    for sub in ("postings", "doclens", "stats"):
        shutil.rmtree(path + f"/{sub}")
        os.rename(path + f"/{sub}.__new__", path + f"/{sub}")
    shutil.rmtree(path + "/tombstones")
    return int(corr.n)


def search_text_index(
    spark,
    path: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_term_buckets: int = 64,
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Serve a BM25 query from a persisted text index: term buckets are
    computed CLIENT-SIDE (pure-Python md5 — no Spark job), the posting
    read carries a static partition filter on those buckets (plan shows
    PartitionFilters: only the query's directories are listed), df
    comes from the read postings themselves, and scoring is bit-
    identical to bm25_topk's (ratio idf, term-sorted LTR fold, exact
    two-level rank) — equivalence is test-pinned. Returns
    (doc_id, rank, score).

    Tombstones (:func:`tombstone_text_index`), when present, are
    applied BEFORE the df computation — the anti-join removes dead
    postings so df, n_docs and avgdl all equal an index rebuilt without
    the dead docs, exactly (test-pinned); the tombstone set broadcasts
    (deletes between compactions are small next to the corpus)."""
    import hashlib
    import os

    from pyspark.sql import Window

    terms = sorted(set(terms))
    buckets = sorted(
        {
            int(hashlib.md5((t + "tix").encode()).hexdigest()[:8], 16)
            % n_term_buckets
            for t in terms
        }
    )
    post = (
        spark.read.parquet(path + "/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    stats = spark.read.parquet(path + "/stats")
    if os.path.isdir(path + "/tombstones"):
        # a doc may be tombstoned twice across appended batches
        dead = spark.read.parquet(path + "/tombstones").groupBy(id_col).agg(
            F.max("dl").alias("dl")
        )
        post = post.join(F.broadcast(dead), id_col, "left_anti")
        corr = dead.agg(
            F.count(F.lit(1)).alias("__dead_n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("__dead_toks"),
        )
        stats = stats.crossJoin(F.broadcast(corr)).select(
            (F.col("n_docs") - F.col("__dead_n")).alias("n_docs"),
            (F.col("tot_tokens") - F.col("__dead_toks")).alias("tot_tokens"),
        )
    df_ = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    m = (
        post.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__n_docs", F.col("n_docs").cast("double"))
        .withColumn("__tot", F.col("tot_tokens").cast("double"))
    )
    idf = (F.col("__n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    avgdl = F.col("__tot") / F.col("__n_docs")
    tfc = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    g = (
        m.select(F.col(id_col), "term", (idf * tfc).alias("score_t"))
        .groupBy(id_col)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "score_t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["score_t"],
            ).alias("score")
        )
    )
    w1 = Window.partitionBy(F.pmod(F.col(id_col), F.lit(n_buckets))).orderBy(
        F.col("score").desc(), id_col
    )
    w2 = Window.partitionBy(F.lit(1)).orderBy(F.col("score").desc(), id_col)
    return (
        g.withColumn("__brn", F.row_number().over(w1))
        .filter(F.col("__brn") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "score")
    )


def bpe_apply_merges(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge table (bpe_learn_merges' output) to the
    corpus: every word splits to characters, then each merge replays in
    training order (the exact tokenizer-apply rule — order matters, a
    later merge can consume an earlier merge's output). Returns
    ``(id, n_words, n_tokens)`` where n_tokens is the corpus token
    count under the learned vocabulary — the number a token budget
    would use once the tokenizer is trained.

    Scale: a pure narrow map — |merges| chained array folds per word,
    zero shuffle; for production-sized merge tables (10k+) switch the
    apply to an Arrow-batched pandas UDF wrapping a real tokenizer
    (pandas_tokenizer_counter), which is the same trade the token-count
    models document."""
    toks = _with_tokens(docs, id_col, text_col)
    syms_of = lambda w: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.substring(w, i, F.lit(1)),
    )
    per_word = F.transform(F.col("__toks"), lambda w: syms_of(w))
    for _, left, right, _count in merges:
        per_word_prev = per_word
        per_word = F.transform(
            per_word_prev, lambda s: _merge_pair(s, F.lit(left), F.lit(right))
        )
    n_tokens = F.aggregate(
        F.transform(per_word, lambda s: F.size(s)), F.lit(0), lambda a, v: a + v
    )
    return toks.select(
        F.col(id_col),
        F.size(F.col("__toks")).cast("int").alias("n_words"),
        n_tokens.cast("int").alias("n_tokens"),
    )


def hashed_features(
    docs: DataFrame,
    dims: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    signed: bool = True,
    extra: list[str] | None = None,
) -> DataFrame:
    """Hashing-trick bag-of-words features (Weinberger et al. 2009): every
    token hashes to ``bucket = h % dims`` with a sign drawn from the next
    hash bit (``h % 2*dims >= dims`` → −1), and per-(doc, bucket) weights
    are the signed occurrence sums — the fixed-width, vocabulary-free
    feature map every large-scale linear model / DSIR-style selector
    consumes. Returns ``(id, *extra, bucket, weight)`` sparse rows;
    with ``signed=True`` exact-zero weights (sign cancellations) are
    dropped — they are indistinguishable from absent features in a
    sparse representation. ``signed=False`` yields plain tf counts
    (naive-Bayes-style consumers).

    The hash is the md5-derived 60-bit integer (functions/hashing.
    md5_int60) so a SQL oracle replays bucket AND sign bit exactly.

    Scale shape: token explode (narrow) → ONE map-side-combined shuffle
    on (id, bucket) whose key cardinality is |docs|·dims regardless of
    vocabulary size — feature hashing's whole point at 100 TB: no
    vocabulary build pass, no OOV handling, bounded width. ``extra``
    columns (labels/source) ride the same shuffle instead of joining a
    corpus-sized table back on afterwards."""
    from ..functions.hashing import md5_int60

    extra = extra or []
    t = _with_tokens(docs, id_col, text_col, extra).select(
        F.col(id_col), *extra, F.explode("__toks").alias("__tok")
    )
    t = t.select(
        F.col(id_col), *extra, md5_int60(F.col("__tok")).alias("__h")
    ).select(
        F.col(id_col),
        *extra,
        (F.col("__h") % dims).alias("bucket"),
        (
            F.when(F.col("__h") % (2 * dims) >= dims, F.lit(-1)).otherwise(F.lit(1))
            if signed
            else F.lit(1)
        ).alias("__s"),
    )
    out = t.groupBy(F.col(id_col), *extra, F.col("bucket")).agg(
        F.sum("__s").cast("long").alias("weight")
    )
    return out.filter(F.col("weight") != 0) if signed else out


def model_weights(
    docs: DataFrame,
    target_source: str,
    dims: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    positive_lang: str = "en",
    tf: DataFrame | None = None,
) -> DataFrame:
    """The dims-sized weight table both corpus-fit linear models share:
    ``(bucket, w_cls, w_dsir)`` — the classifier cross-difference and the
    DSIR affinity cross-difference (see model_scores). Fit ONCE on a
    corpus snapshot, then broadcast to batch scorers (model_scores) or
    pack into one row for the stateless streaming gate
    (streaming.filters.pack_model_weights / model_gate_stream).

    ``tf`` may pass a precomputed hashed-feature table
    ``(id, lang, source, bucket, w)`` so fit and scoring share one
    subtree (model_scores does — the identical exchange is then reused
    by Spark instead of re-tokenizing)."""
    if tf is None:
        tf = hashed_features(
            docs, dims=dims, id_col=id_col, text_col=text_col,
            signed=False, extra=[lang_col, source_col],
        ).select(
            F.col(id_col), F.col(lang_col), F.col(source_col),
            "bucket", F.col("weight").alias("w"),
        )
    model = tf.groupBy("bucket").agg(
        F.sum(F.when(F.col(lang_col) == positive_lang, F.col("w")).otherwise(0)).alias("pos_b"),
        F.sum(F.when(F.col(lang_col) != positive_lang, F.col("w")).otherwise(0)).alias("neg_b"),
        F.sum(F.when(F.col(source_col) == target_source, F.col("w")).otherwise(0)).alias("t_b"),
        F.sum("w").alias("r_b"),
    )
    tot = model.agg(
        F.sum("pos_b").alias("t_pos"),
        F.sum("neg_b").alias("t_neg"),
        F.sum("t_b").alias("t_tot"),
        F.sum("r_b").alias("r_tot"),
    )
    return model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (F.col("pos_b") * F.col("t_neg") - F.col("neg_b") * F.col("t_pos"))
        .cast("long")
        .alias("w_cls"),
        (F.col("t_b") * F.col("r_tot") - F.col("r_b") * F.col("t_tot"))
        .cast("long")
        .alias("w_dsir"),
    )


def model_scores(
    docs: DataFrame,
    target_source: str,
    dims: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    positive_lang: str = "en",
) -> DataFrame:
    """Per-document scores from the two corpus-fit linear models over ONE
    shared hashed-feature pass (the queries.model_curation_report
    composition, exposed for pipeline/CLI use): the NB-style
    ``positive_lang`` discriminant (s_cls) and the DSIR-style
    ``target_source`` affinity (s_dsir), both exact-integer cross-
    difference weights (see hashed_nb_lang_classifier /
    dsir_importance_scores for the algebra and its headroom bound).
    Returns ``(id, source, n_tokens, s_cls, s_dsir)`` — a doc passes the
    standard curation gate when BOTH scores are positive. Scale: one
    (id, bucket) shuffle for tf, one dims-sized model broadcast back,
    one id-keyed score aggregation; k models share the single pass."""
    from .dedup import materialize

    # r14: tf feeds model_weights (which re-inlines it per model
    # aggregate) AND the scoring join — the corpus feature pass executed
    # 3x per call. Materialize the single pass the docstring promises.
    tf = materialize(
        hashed_features(
            docs, dims=dims, id_col=id_col, text_col=text_col,
            signed=False, extra=[lang_col, source_col],
        ).select(
            F.col(id_col), F.col(lang_col), F.col(source_col),
            "bucket", F.col("weight").alias("w"),
        )
    )
    wt = model_weights(
        docs, target_source, dims=dims, id_col=id_col, text_col=text_col,
        lang_col=lang_col, source_col=source_col, positive_lang=positive_lang,
        tf=tf,
    )
    return (
        tf.join(F.broadcast(wt), "bucket")
        .groupBy(F.col(id_col), F.col(source_col))
        .agg(
            F.sum("w").cast("long").alias("n_tokens"),
            F.sum(F.col("w") * F.col("w_cls")).cast("long").alias("s_cls"),
            F.sum(F.col("w") * F.col("w_dsir")).cast("long").alias("s_dsir"),
        )
    )
