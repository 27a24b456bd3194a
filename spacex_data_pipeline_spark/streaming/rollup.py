"""Streaming windowed rollups — watermarked tumbling + session windows.

These are the streaming twins of the batch queries ``events_hourly_rollup``
and ``sessionize_events`` (same grouping semantics; a replay of the stream
reproduces the batch result — tested in tests/test_streaming.py).

Late data: the watermark bounds state. At 100 TB-scale streams the
watermark IS the memory ceiling — without it, windowed state grows without
bound. 2 hours here; production tunes it to the source's real lateness.

Session windows use the BUILT-IN ``F.session_window`` (gap-merging state
store handled by Spark) rather than a hand-rolled applyInPandasWithState —
Spark-first: custom stateful Python only when built-ins can't express the
semantics, and gap sessionization is expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour counts/sums per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def hopping_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Hopping 10-min windows every 5 min per event_type — the streaming
    twin of the batch ``hopping_window_event_counts`` query (each event
    lands in exactly two hops; the watermark evicts closed hops)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("hop_start"), "event_type", "n")
    )


def session_rollup_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user via the built-in session_window
    state store (merges windows as events arrive; watermark evicts)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def session_sequences_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the batch ``session_sequences_events`` query:
    one time-ordered event-type sequence string per (user, session),
    assembled ON ARRIVAL. collect_list's cross-micro-batch order is
    arrival order, so the canonical in-session order is restored at emit
    by array_sort over (ts, event_id, type) structs — replay therefore
    yields exactly the batch twin's sequences (tested). State per open
    session is the session's own events (bounded by session length,
    evicted by the watermark), never stream length."""
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ),
        " ",
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            seq.alias("seq"),
        )
        .select("user_id", "first_ts", "n_events", "seq")
    )


def heavy_hitters_stream(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming running key-frequency table — the on-arrival twin of
    checks.heavy_hitters' count stage. A plain streaming groupBy count:
    state is one row per key (bounded by key cardinality, not stream
    length), partial counts merge map-side per micro-batch, and a replay
    delivers exactly the batch counts (tested). The consumer ranks the
    handful of rows it reads — a global top-k SORT inside the stream
    would force complete-mode output; keeping the stream as counts lets
    it run in update mode against a key-value sink at any scale."""
    return events.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("freq"))


def cms_cells_stream(
    events: DataFrame, key_col: str = "user_id", d: int = 3, w: int = 64
) -> DataFrame:
    """Streaming count-min sketch cell store — the on-arrival twin of the
    batch per-day grid in queries.cms_mergeable_user_counts (same
    functions.hashing.cms_bucket hash, so a replay populates IDENTICAL
    cells — tested). Each arriving event increments its d cells; state is
    one row per (day, seed, bucket) — bounded by d·|days|·w, never by
    stream length — and the grid stays mergeable-by-addition, so the
    serving layer answers any date range's frequency estimates from the
    stored cells without replaying the stream. Update-mode friendly: no
    sort, no global state."""
    from ..functions.hashing import cms_bucket

    seeds = F.array(*[F.lit(i) for i in range(d)])
    return (
        events.select(
            F.to_date("ts").alias("day"), F.explode(seeds).alias("seed"), key_col
        )
        .groupBy(
            "day", "seed", cms_bucket(F.col("seed"), F.col(key_col), w).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ab_conversion_stream(
    events: DataFrame, dedup_watermark: str | None = None
) -> DataFrame:
    """Streaming per-arm conversion counters — the on-arrival twin of
    ``queries.ab_test_purchase_conversion``'s sufficient statistics: the
    arm comes from the SAME ``sampling.hash_bucket(user_id, 'ab', 2)``
    pure function (assignment must reproduce on any executor, any day —
    never a stored table), conversion is first-purchase-per-user
    (``dropDuplicates`` keyed on user), and the output is the 2-row
    per-arm converted-user count a serving layer combines with the
    exposure denominator to run the z-test continuously.

    Replay semantics: re-delivered purchase events dedup against the
    user key, so an at-least-once source cannot inflate conversions
    (tested — a second replay adds nothing). State is one key per
    CONVERTED user — bounded by converted-user cardinality, not stream
    length; pass ``dedup_watermark`` to bound it further when the
    product allows conversion-window semantics (state then drops for
    users idle past the horizon — the standard state/semantics trade)."""
    from ..operators.sampling import hash_bucket

    p = events.filter(F.col("event_type") == "purchase")
    if dedup_watermark is not None:
        p = p.withWatermark("ts", dedup_watermark)
        deduped = p.dropDuplicatesWithinWatermark(["user_id"])
    else:
        deduped = p.dropDuplicates(["user_id"])
    return (
        deduped.select(hash_bucket(F.col("user_id"), "ab", 2).alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).cast("long").alias("converted_users"))
    )


def ohlc_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch ``ohlc_daily_events`` entry: daily
    OHLC bars per event type built incrementally as ticks arrive —
    open/close are min_by/max_by on the (ts, event_id) order struct,
    which are ordinary declarative aggregates, so the state store
    carries four decimals and a struct per open bar (never the ticks)
    and late data within the watermark amends the bar in place. The
    exchange-feed shape: bars are queryable all day and finalize when
    the watermark passes midnight."""
    val = F.col("value").cast("decimal(8,2)")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts", "event_type", val.alias("__val"), key.alias("__k")
        )
        .groupBy(F.window("ts", "1 day"), F.col("event_type"))
        .agg(
            F.min_by("__val", "__k").cast("double").alias("open"),
            F.max("__val").cast("double").alias("high"),
            F.min("__val").cast("double").alias("low"),
            F.max_by("__val", "__k").cast("double").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.to_date(F.col("window.start")).alias("day"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def bitmap_distinct_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch ``bitmap_distinct_users_daily`` entry:
    EXACT daily distinct users with BOUNDED state — normally streaming
    exact-distinct means an unbounded seen-id store; packing ids into
    62-bit words makes it an ordinary bit_or aggregate whose state is
    at most |id-space|/62 words per open day, merged associatively as
    microbatches arrive. Emits the MERGEABLE STATE — (day, word,
    bitmap, n) rows — not the final count: the exact distinct count is
    the consumer's one-line rollup ``sum(bit_count(__bm)) GROUP BY
    day`` (a second stateful aggregate in the same stream would hit
    Spark's multi-aggregation restriction; the batch twin includes the
    rollup, and the parity test applies it to this output). Bit/word
    use pmod + exact-multiple floor-div, matching the batch twin, so
    negative ids set well-defined bits instead of being sign-masked by
    the JVM shift."""
    word_mask = F.expr("shiftleft(1L, cast(pmod(user_id, 62) as int))")
    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            F.expr("(user_id - pmod(user_id, 62)) div 62").alias("word"),
            word_mask.alias("__m"),
        )
        .groupBy(F.window("ts", "1 day"), F.col("word"))
        .agg(F.bit_or("__m").alias("__bm"), F.count(F.lit(1)).alias("__n"))
        .select(
            F.to_date(F.col("window.start")).alias("day"),
            "word",
            "__bm",
            "__n",
        )
    )


def moments_store_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch ``moments_store_merge_orders``
    store shape, built over the event stream: per-day exact moments
    partials — (day, n, Σcents, Σcents²) — accumulated on arrival as
    an ordinary watermarked aggregate (counts and sums merge
    associatively, so state per open day is THREE numbers). Like
    bitmap_distinct_stream, this emits the MERGEABLE STATE, not a
    final statistic: any-range mean/variance is the consumer's
    addition-then-one-cast rollup, and the parity test rolls the
    streamed store into the same exact wide-integer variance the
    batch arithmetic produces. Cents are the money snap's exact
    integers; Σcents² accumulates in DECIMAL(38,0) (int64 overflows
    within ~900 rows of cent² terms)."""
    cents = (F.col("value").cast("decimal(8,2)") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .select("ts", cents.alias("__c"))
        .groupBy(F.window("ts", "1 day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__c").cast("long").alias("s"),
            F.sum(
                F.col("__c").cast("decimal(19,0)")
                * F.col("__c").cast("decimal(19,0)")
            ).alias("ss"),
        )
        .select(F.to_date(F.col("window.start")).alias("day"), "n", "s", "ss")
    )


def quantile_histogram_stream(
    events: DataFrame, bin_cents: int = 1000, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the fixed-bin quantile-histogram store (the
    ``quantile_sketch_store_orders`` store shape, VERDICT r10 #5) over
    the event VALUE stream: per-day (day, bin, n) cells where
    bin = cents DIV bin_cents — the money snap's exact integer cents
    through a truncating integer division, no float anywhere —
    accumulated on arrival as an ordinary watermarked aggregate. Counts
    merge by ADDITION, so state per open day is the day's occupied
    bins (≤ |value domain| / bin_cents cells), never the ticks, and
    the fifth mergeable store (HLL / CMS / bitmap / moments /
    histogram) gets its on-arrival twin. Like the other store twins
    this emits the MERGEABLE STATE, not a final statistic: any date
    range's quantile estimate is the consumer's addition + cumulative
    rollup (first bin whose cumulative count reaches ceil(q·N), the
    true quantile provably inside [bin·w, (bin+1)·w) cents), and the
    parity test rolls the streamed store into exactly the answers the
    batch arithmetic produces."""
    cents = (F.col("value").cast("decimal(8,2)") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .select("ts", cents.alias("__c"))
        .groupBy(
            F.window("ts", "1 day"),
            F.expr(f"__c div {int(bin_cents)}").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.to_date(F.col("window.start")).alias("day"), "bin", "n")
    )


def hll_registers_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch ``hll_register_store_users`` store:
    per-day HLL registers accumulated on arrival. A register is a MAX
    monoid — associative AND idempotent — so microbatch merges, replays
    and late data (inside the watermark) all land on exactly the batch
    cells, and state per open day is at most 256 ints regardless of
    stream volume. The sixth and last mergeable store gets its
    on-arrival form (HLL-registers / CMS / bitmap / moments / histogram
    / the DataSketches HLL whose opaque bytes the register store
    exists to make verifiable). Emits the MERGEABLE STATE; any range's
    deterministic raw estimate is the consumer's MAX-merge + the exact
    dyadic harmonic sum (see the batch entry), and the parity test
    reproduces the batch entry's per-day and ALL rows from the
    streamed cells."""
    from ..functions.hashing import hll_register

    reg, rho = hll_register(F.col("user_id"))
    return (
        events.withWatermark("ts", watermark)
        .select("ts", reg.alias("reg"), rho.alias("rho"))
        .groupBy(F.window("ts", "1 day"), F.col("reg"))
        .agg(F.max("rho").alias("rho"))
        .select(F.to_date(F.col("window.start")).alias("day"), "reg", "rho")
    )
