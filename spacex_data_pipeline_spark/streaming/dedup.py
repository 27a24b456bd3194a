"""Streaming deduplication — the streaming twin of the dedup family.

The reference's daily append DUPLICATES its full snapshot every run
(spacex_api_dag.py:49; SURVEY.md §2.4). In a streaming ingest the same
failure mode appears as re-delivered files/events; the fix is built-in:
``dropDuplicates`` on a stream keeps per-key state so each key is emitted
exactly once.

Two variants:
- :func:`dedup_stream_exact` — unbounded state (every key ever seen);
  correct forever, state grows with distinct keys. For replay/backfill.
- :func:`dedup_stream_within_watermark` — state bounded by the watermark
  (``dropDuplicatesWithinWatermark``): a duplicate arriving later than the
  watermark delay slips through, but state is O(keys-per-window) — the
  only shape that survives an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_exact(events: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    return events.dropDuplicates(key_cols or ["event_id"])


def dedup_stream_within_watermark(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )


def dedup_stream_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Line-level dedup ON ARRIVAL — the streaming twin of
    ``operators.dedup.line_dedup_flags``: explode each incoming document
    into lines, normalize (lower + collapse whitespace + trim), and emit
    each distinct non-blank line exactly once stream-wide via
    ``dropDuplicates`` state keyed on the 8-byte line hash. Blank lines
    pass through unconditionally (document structure, not duplicable
    content — and keying them would collapse every blank line in the
    stream onto one state entry).

    Compose AFTER doc-level dedup (``dedup_stream_exact`` on the doc
    key): blank lines pass this stage per document, so a re-delivered
    document would re-emit its blanks unless the doc stage already
    suppressed the re-delivery (the composition the parity test runs).

    Emits kept lines as (id, line_no, line). Semantics difference from
    the batch form, stated plainly: batch picks the globally minimal
    (id, line_no) owner per line; a stream can only pick ARRIVAL order
    (state cannot see the future) — the kept-line SET is identical, the
    surviving owner may differ. State is unbounded (every distinct line
    hash ever seen — the exact-dedup trade dedup_stream_exact
    documents); bound it with ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` upstream when lines carry event
    time. Reassembling documents is a foreachBatch/batch concern —
    a per-doc aggregate has no meaning while the doc's lines are still
    being deduped against future arrivals."""
    from pyspark.sql import functions as F

    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " "))
    lines = lines.withColumn("__blank", norm == "").withColumn(
        "__h", F.xxhash64(norm)
    )
    kept = lines.filter(~F.col("__blank")).dropDuplicates(["__h"]).unionByName(
        lines.filter(F.col("__blank"))
    )
    return kept.select(id_col, "line_no", "line")
