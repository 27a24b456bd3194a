"""Custom stateful streaming operator: per-user first-seen dedup.

``session_window``/watermarked aggs cover windowed state (streaming/
rollup.py); this is the case Spark has no built-in for — emit only the
FIRST occurrence of each (user, event_type), forever, with the seen-set as
explicit state. Implemented with ``applyInPandasWithState`` (Arrow-batched
per-group state function), per the preference order in SURVEY.md §2.5:
built-ins first, grouped Pandas state only where built-ins can't express
the semantics.

State per user is the set of seen event types — bounded by the type
vocabulary, so the state store stays O(users × types) regardless of stream
length; the batch twin (row_number = 1 per (user, type)) is the replay.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def first_seen_stream(events: DataFrame) -> DataFrame:
    """events stream → first (user, event_type) occurrences, stateful.

    The state function is NESTED so cloudpickle serializes it BY VALUE: a
    module-level function pickles by reference, and Python workers (which
    don't import this package) would die with ModuleNotFoundError — found
    by driving the stream from a foreign cwd. Rule for every UDF in this
    package: define the worker-side function inside the operator.
    """
    out_cols = [f.name for f in OUTPUT_SCHEMA.fields]

    def first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set[str] = set(state.get[0]) if state.exists else set()
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                if row.event_type not in seen:
                    seen.add(row.event_type)
                    out.append(
                        {
                            "user_id": row.user_id,
                            "event_type": row.event_type,
                            "first_ts": row.ts,
                            "event_id": row.event_id,
                        }
                    )
        state.update((sorted(seen),))
        yield pd.DataFrame(out, columns=out_cols)

    return events.groupBy("user_id").applyInPandasWithState(
        first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("min_event_id", T.LongType()),
        T.StructField("max_event_id", T.LongType()),
    ]
)


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user lifetime event totals via ``transformWithStateInPandas`` —
    Spark 4's successor to ``applyInPandasWithState`` (explicit typed
    state handles instead of one packed state tuple; timers and TTL when
    needed). Kept alongside :func:`first_seen_stream` so the package
    exercises BOTH stateful APIs: migrating a 100 TB pipeline means
    running them side by side for a while.

    Emits the UPDATED running totals for every user seen in each
    micro-batch; outputs are exact integers (count + min/max event id),
    so replay comparisons against the batch twin are value-exact with
    no float-order caveats. State per user is three longs — O(users),
    unbounded by stream length.

    Runtime gate: the transformWithState worker protocol speaks
    protobuf over a local state server; containers without
    ``google.protobuf`` (this one — installs are out of bounds) crash
    the Python driver worker at start. The test skips on that import;
    :func:`first_seen_stream` (applyInPandasWithState, no protobuf
    dependency) is the stateful path that runs everywhere.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_cols = [f.name for f in RUNNING_TOTALS_SCHEMA.fields]

    # Nested class: cloudpickle must serialize BY VALUE (module-level
    # classes pickle by reference and Python workers don't import this
    # package — the first_seen_stream rule).
    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState(
                "totals", "n long, lo long, hi long"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, lo, hi = 0, None, None
            if self._tot.exists():
                n, lo, hi = self._tot.get()
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                b_lo = int(pdf["event_id"].min())
                b_hi = int(pdf["event_id"].max())
                lo = b_lo if lo is None else min(lo, b_lo)
                hi = b_hi if hi is None else max(hi, b_hi)
            self._tot.update((n, lo, hi))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "min_event_id": lo, "max_event_id": hi}],
                columns=out_cols,
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


LOCF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.DateType()),
        T.StructField("close_locf", T.DoubleType()),
        T.StructField("fill_status", T.StringType()),
    ]
)
# last emitted day (epoch-day ordinal) + its close in exact cents — two
# longs per user, O(users) regardless of stream length or gap width.
LOCF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_day_ord", T.LongType()),
        T.StructField("last_close_cents", T.LongType()),
    ]
)


def locf_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``resample_user_daily_locf`` entry —
    the classic stateful-stream shape (VERDICT r8 #6): per user, carry
    the last observed daily close forward across silent days as the
    stream advances, emitting one (user, day) row per calendar day from
    the user's FIRST observation through their latest ('observed' on
    days with readings — close = last reading under the (ts, event_id)
    total order — 'carried' on the gap days between them).

    Contract vs the batch twin: the batch grid spans the corpus
    [min(ts), max(ts)] for every user, labels days before a user's
    first reading 'missing', and carries the tail forward to the corpus
    end. A stream knows neither corpus bound, so this emits exactly the
    batch rows inside each user's own [first, last] observation span —
    the batch-parity test asserts precisely that restriction, and a
    consumer extends the tail by applying the state's last close to its
    query horizon. State per user is two longs (last day ordinal +
    close in exact integer cents; doubles only at emit, same
    correctly-rounded cents/100 value as the batch entry's
    decimal(8,2)→double cast). Arrival discipline: the ENTIRE
    micro-batch for a group is materialized (Spark hands it to the UDF
    as multiple ~10k-row Arrow chunks in no guaranteed order, so a
    per-chunk sort would silently mis-fold any group larger than one
    chunk — e.g. an availableNow backfill drain) and sorted once by
    (ts, event_id) before the single fold; buffering the batch is the
    only way to honor the total order given two longs of state. A row
    whose day strictly precedes the already-emitted frontier is
    dropped (append mode cannot retract an emitted day) — set the
    source watermark to the event-time disorder bound
    (event_disorder_report) so such rows are late-data policy, not
    silent loss. A SAME-day reading arriving after its day was emitted
    in a prior trigger (an open day straddling two triggers — normal
    in-order arrival, not late data) cannot amend the emitted row, but
    it DOES advance the carried close in state, so every subsequent
    'carried' day uses the day's true close; only the already-emitted
    observed row itself is frozen.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_locf_fold(),
        outputStructType=LOCF_OUTPUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_locf_fold():
    """Factory for the per-group micro-batch fold behind
    :func:`locf_stream`. A FACTORY (not a module-level fold) for two
    reasons: the returned nested function cloudpickles BY VALUE (the
    first_seen_stream rule — workers that never import this package
    must still unpickle it), and the unit tests
    (tests/test_streaming.py) can still build one and drive it with a
    stub GroupState to pin the chunk-order and same-day-across-trigger
    contracts without a streaming query."""

    def locf(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import datetime as _dt
        from decimal import ROUND_HALF_UP, Decimal

        out_cols = [f.name for f in LOCF_OUTPUT_SCHEMA.fields]
        _EPOCH = _dt.date(1970, 1, 1)
        last_ord, last_cents = state.get if state.exists else (None, None)
        out: list[dict[str, Any]] = []
        # Materialize the whole micro-batch before sorting: the iterator
        # yields arbitrary-order Arrow chunks, and the fold is
        # order-sensitive (a later chunk holding earlier days would be
        # dropped by the frontier check or fill gaps with a stale close).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                day = row.ts.date()
                day_ord = (day - _EPOCH).days
                if last_ord is not None and day_ord < last_ord:
                    continue  # behind the emitted frontier (late data)
                # exact 2-decimal cents, HALF_UP like the decimal cast
                cents = int(
                    Decimal(repr(float(row.value)))
                    .scaleb(2)
                    .to_integral_value(ROUND_HALF_UP)
                )
                if last_ord is None:
                    out.append(
                        {
                            "user_id": key[0],
                            "day": day,
                            "close_locf": cents / 100.0,
                            "fill_status": "observed",
                        }
                    )
                elif day_ord == last_ord:
                    # same day: amend the close in place (day already
                    # appended this batch — rewrite its pending row).
                    # If the day was emitted in a PRIOR trigger the row
                    # is frozen (append mode), but state still advances
                    # below so later carried days use the true close.
                    if out and out[-1]["day"] == day:
                        out[-1]["close_locf"] = cents / 100.0
                else:
                    for g in range(last_ord + 1, day_ord):
                        out.append(
                            {
                                "user_id": key[0],
                                "day": _EPOCH + _dt.timedelta(days=g),
                                "close_locf": last_cents / 100.0,
                                "fill_status": "carried",
                            }
                        )
                    out.append(
                        {
                            "user_id": key[0],
                            "day": day,
                            "close_locf": cents / 100.0,
                            "fill_status": "observed",
                        }
                    )
                last_ord, last_cents = day_ord, cents
        if last_ord is not None:
            state.update((last_ord, last_cents))
        yield pd.DataFrame(out, columns=out_cols)

    return locf

ATTRIBUTION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("p_event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("attributed_type", T.StringType()),
        T.StructField("lat_us", T.LongType()),
        T.StructField("val_cents", T.LongType()),
    ]
)
# latest touch per user: event-time micros + event id (the batch total
# order's tiebreak) + type — two longs and a short string per user,
# O(users) regardless of stream length.
ATTRIBUTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("touch_us", T.LongType()),
        T.StructField("touch_eid", T.LongType()),
        T.StructField("touch_type", T.StringType()),
    ]
)


def attribution_stream(
    events: DataFrame, lookback_seconds: int = 3600
) -> DataFrame:
    """Streaming twin of the batch ``attribution_last_touch`` entry
    (VERDICT r9 #3 — the last driver-green batch family with no
    streaming twin): every purchase credits the user's most recent
    view/click within the lookback, else 'direct', emitted ON ARRIVAL
    as one append-mode row per purchase (the batch entry's per-type
    rollup is a stateless aggregation any consumer runs downstream —
    the parity test folds the streamed rows back to the batch totals).

    Same state discipline as :func:`locf_stream`: per user the state is
    just the LATEST touch (event-time micros + event id + type — the
    (ts, side, event_id) total order the batch window uses, with
    touches sorting before a same-timestamp purchase), each micro-batch
    is fully materialized and sorted once before the fold, and late
    data follows the append-mode contract — a purchase arriving BEHIND
    a newer touch in state attributes as-of correctly only if the
    stored touch still precedes it (the state cannot resurrect an
    older touch), and an already-emitted purchase row is never
    retracted; size the source watermark by ``event_disorder_report``
    so those rows are policy, not silent loss. A late-arriving touch
    that is OLDER than the stored one never regresses state (the
    (ts_us, event_id) guard), so replays are idempotent per trigger.

    Exactness mirrors the batch entry: purchase values fold to exact
    HALF_UP cents, latency is exact integer microseconds; the only
    doubles appear in the consumer's mean, built from these integers
    with the batch entry's own expression tree."""
    lookback_us = int(lookback_seconds) * 1_000_000

    return (
        events.filter(
            F.col("event_type").isin("view", "click", "purchase")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_attribution_fold(lookback_us),
            outputStructType=ATTRIBUTION_OUTPUT_SCHEMA,
            stateStructType=ATTRIBUTION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _make_attribution_fold(lookback_us: int):
    """Factory for :func:`attribution_stream`'s per-group fold — nested
    so cloudpickle serializes by value (the first_seen_stream rule) and
    unit tests can drive one with a stub GroupState."""

    def attribute(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from decimal import ROUND_HALF_UP, Decimal

        out_cols = [f.name for f in ATTRIBUTION_OUTPUT_SCHEMA.fields]
        t_us, t_eid, t_type = state.get if state.exists else (None, None, None)
        out: list[dict[str, Any]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            # the batch window's total order: (ts, side, event_id) with
            # touches (side 0) before a same-timestamp purchase (side 1)
            pdf = pdf.assign(
                __side=(pdf["event_type"] == "purchase").astype("int64")
            ).sort_values(["ts", "__side", "event_id"])
            for row in pdf.itertuples(index=False):
                ev_us = row.ts.value // 1_000
                if row.event_type != "purchase":
                    # newest-touch guard: a late touch older than the
                    # stored one must not regress state
                    if t_us is None or (ev_us, row.event_id) > (t_us, t_eid):
                        t_us, t_eid, t_type = ev_us, row.event_id, row.event_type
                    continue
                in_window = (
                    t_us is not None
                    and t_us <= ev_us  # as-of: only touches at/before the purchase
                    and t_us >= ev_us - lookback_us
                )
                cents = int(
                    Decimal(repr(float(row.value)))
                    .scaleb(2)
                    .to_integral_value(ROUND_HALF_UP)
                )
                out.append(
                    {
                        "user_id": key[0],
                        "p_event_id": row.event_id,
                        "ts": row.ts,
                        "attributed_type": t_type if in_window else "direct",
                        "lat_us": (ev_us - t_us) if in_window else None,
                        "val_cents": cents,
                    }
                )
        if t_us is not None:
            state.update((t_us, t_eid, t_type))
        yield pd.DataFrame(out, columns=out_cols)

    return attribute

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("lat", T.LongType()),
    ]
)
# latest view / latest click per user in event-time micros — two longs,
# O(users); latency needs only the LAST prior stage event, never a
# range scan.
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
    ]
)


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the funnel-latency attribution underneath the
    batch ``funnel_stage_latency_quantiles`` entry: every click emits
    its latency from the user's most recent prior view
    ('view_to_click') and every purchase from the most recent prior
    click ('click_to_purchase'), on arrival, append-mode — the exact
    per-pair rows the batch entry's two as-of passes produce, so a
    consumer folds them through the same integer-exact rank math for
    live per-stage percentiles (the parity test does precisely that
    and reproduces the batch entry's P50/P90 rows).

    Same discipline as :func:`attribution_stream`: per user the state
    is the LATEST view and LATEST click (event-time micros — last-prior
    semantics never need the second-newest), each micro-batch is
    materialized and sorted once into (ts, side, event_id) order with
    views < clicks < purchases at equal timestamps (the batch join's
    INCLUSIVE ``prior.ts <= event.ts`` bound), and latencies are
    truncated epoch-second differences exactly like the batch's
    ``unix_timestamp`` arithmetic. Late data: an event arriving behind
    a NEWER stored prior-stage event cannot recover the older one (two
    longs of state) and emits nothing — size the watermark by
    event_disorder_report; stale events never regress state."""
    return (
        events.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_funnel_fold(),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _make_funnel_fold():
    """Factory for :func:`funnel_stream`'s per-group fold — nested so
    cloudpickle serializes by value (the first_seen_stream rule) and
    unit tests can drive one with a stub GroupState."""

    def funnel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        out_cols = [f.name for f in FUNNEL_OUTPUT_SCHEMA.fields]
        v_us, c_us = state.get if state.exists else (None, None)
        out: list[dict[str, Any]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            side = pdf["event_type"].map({"view": 0, "click": 1, "purchase": 2})
            pdf = pdf.assign(__side=side).sort_values(["ts", "__side", "event_id"])
            for row in pdf.itertuples(index=False):
                ev_us = row.ts.value // 1_000
                if row.event_type == "view":
                    if v_us is None or ev_us >= v_us:
                        v_us = ev_us
                elif row.event_type == "click":
                    if v_us is not None and v_us <= ev_us:
                        out.append(
                            {
                                "user_id": key[0],
                                "stage": "view_to_click",
                                "event_id": row.event_id,
                                # truncated epoch-second difference —
                                # the batch unix_timestamp arithmetic
                                "lat": ev_us // 1_000_000 - v_us // 1_000_000,
                            }
                        )
                    if c_us is None or ev_us >= c_us:
                        c_us = ev_us
                else:  # purchase
                    if c_us is not None and c_us <= ev_us:
                        out.append(
                            {
                                "user_id": key[0],
                                "stage": "click_to_purchase",
                                "event_id": row.event_id,
                                "lat": ev_us // 1_000_000 - c_us // 1_000_000,
                            }
                        )
        if v_us is not None or c_us is not None:
            state.update((v_us, c_us))
        yield pd.DataFrame(out, columns=out_cols)

    return funnel


GAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("gap_sec", T.LongType()),
    ]
)
# last event per (user, type): event-time micros + event id — two longs,
# O(users·types) state, the same footprint class as the LOCF register.
GAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
    ]
)


def gap_dispersion_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``interarrival_dispersion_events``
    entry: one append-mode row per NEW inter-arrival gap of a
    (user, type) pair, carrying the exact truncated-epoch-second gap —
    the per-type (n, Σg, Σg²) dispersion cells are a stateless
    downstream aggregation of these rows with the batch entry's own
    integer expressions (the attribution_stream philosophy: stream the
    grain, fold the rollup anywhere).

    State per (user, type) is the LAST event's (event-time micros,
    event id) — the same (ts, event_id) total order the batch window
    sorts by. Each micro-batch is fully materialized and sorted before
    the fold (the locf_stream chunk-order rule), so within-batch
    disorder is invisible. Late-data contract (append mode): a
    cross-batch event at or behind the stored (ts, id) is SKIPPED — an
    emitted gap cannot be retracted and re-split, so such rows are
    policy (size the source watermark by ``event_disorder_report``),
    and the guard doubles as replay idempotence: re-delivered events
    compare <= state and emit nothing. Gap arithmetic mirrors the
    batch entry exactly: truncated epoch seconds (us // 1e6
    difference), so the downstream fold hash-matches the oracle-checked
    batch row."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _gap_fold,
        outputStructType=GAP_OUTPUT_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _gap_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_us, last_eid = state.get if state.exists else (None, None)
    out: list[dict[str, Any]] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for row in pdf.itertuples(index=False):
            ev_us = row.ts.value // 1_000
            if last_us is not None and (ev_us, row.event_id) <= (last_us, last_eid):
                continue  # late or replayed: never re-split an emitted gap
            if last_us is not None:
                out.append(
                    {
                        "user_id": key[0],
                        "event_type": key[1],
                        "event_id": row.event_id,
                        # truncated epoch-second difference — the batch
                        # entry's cast("long") arithmetic
                        "gap_sec": ev_us // 1_000_000 - last_us // 1_000_000,
                    }
                )
            last_us, last_eid = ev_us, row.event_id
    if last_us is not None:
        state.update((last_us, last_eid))
    yield pd.DataFrame(out, columns=[f.name for f in GAP_OUTPUT_SCHEMA.fields])


WEEKLY_FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("week", T.DateType()),
        T.StructField("is_new", T.BooleanType()),
    ]
)
WEEKLY_STATE_SCHEMA = T.StructType(
    [T.StructField("weeks", T.ArrayType(T.LongType()))]
)


def weekly_first_seen_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``new_vs_returning_users_weekly``
    entry: one append-mode row per NEW (user, ISO week) observation,
    flagged is_new on the user's FIRST observed week — the weekly
    growth-accounting rollup (active / new / returning per week) is a
    stateless downstream aggregation of these rows with the batch
    entry's own expressions (the gap_dispersion_stream philosophy:
    stream the grain, fold the rollup anywhere).

    State per user is the set of already-emitted week keys
    (epoch-days of the week's Monday — the same Monday truncation as
    the batch entry's date_trunc('week')), bounded by |weeks|, so the
    state store stays O(users × weeks-active) regardless of stream
    length. Replay idempotence: a re-delivered (user, week) is in the
    set and emits nothing. Late-data contract (append mode): is_new
    reflects ARRIVAL order — a user's first week to ARRIVE is their
    new week; an earlier calendar week arriving later emits
    is_new = false because the already-emitted row cannot be
    retracted (same policy as the gap twin; size the source watermark
    by event_disorder_report). With time-ordered arrival — the
    fixture drain and any watermarked production source — the folded
    rollup hash-matches the oracle-checked batch entry."""
    out_cols = [f.name for f in WEEKLY_FIRST_SEEN_SCHEMA.fields]

    def weekly_fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import datetime as dt

        epoch = dt.date(1970, 1, 1)
        weeks: set[int] = set(state.get[0]) if state.exists else set()
        out: list[dict[str, Any]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                monday = (row.ts - pd.Timedelta(days=int(row.ts.dayofweek))).date()
                wd = (monday - epoch).days
                if wd in weeks:
                    continue
                out.append(
                    {
                        "user_id": key[0],
                        "week": monday,
                        "is_new": not weeks,
                    }
                )
                weeks.add(wd)
        state.update((sorted(weeks),))
        yield pd.DataFrame(out, columns=out_cols)

    return events.groupBy("user_id").applyInPandasWithState(
        weekly_fold,
        outputStructType=WEEKLY_FIRST_SEEN_SCHEMA,
        stateStructType=WEEKLY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
