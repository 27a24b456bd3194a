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
