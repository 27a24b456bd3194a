"""Structured Streaming ingest — the streaming twin of the batch ELT path.

The reference has no streaming at all (SURVEY.md §2.4): its 'incrementality'
is Airflow re-running a full-snapshot fetch daily. The Spark-native upgrade
path is a file-source stream: landed JSON/parquet files become micro-batches,
the staging transform is the SAME DataFrame code as batch (one definition,
two execution modes), and ``availableNow`` gives catch-up-then-stop
semantics — i.e. exactly the reference's daily batch, but incremental,
checkpointed, and exactly-once into the warehouse sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events_from_files(
    spark: SparkSession, path: str, fmt: str = "parquet", max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream with a pinned schema (no inference — a streaming
    source must never re-infer mid-stream). ``maxFilesPerTrigger`` bounds
    micro-batch size so state stores and sinks see steady load."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def run_available_now(
    stream_df: DataFrame, checkpoint: str, query_name: str, output_mode: str = "append"
) -> None:
    """Drain everything currently available into an in-memory table and
    stop — the batch-parity harness used by tests (``complete`` for
    aggregations so final windows are emitted without waiting on the
    watermark). Production sinks swap ``format("memory")`` for
    parquet/Delta with the same checkpoint semantics."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_upsert(
    stream_df: DataFrame, checkpoint: str, out_path: str, key: str
) -> None:
    """Streaming MERGE (the CDC-apply sink): every micro-batch UPSERTS
    into a keyed parquet table via ``foreachBatch`` +
    ``sinks.upsert_by_key`` — late corrections and re-sent records
    REPLACE their key's row instead of appending a duplicate, which is
    what an append sink would do with them. The first batch bootstraps
    the table (empty write + upsert, so intra-batch dedupe runs on batch
    one too).

    Delivery semantics: the checkpoint makes each source file processed
    once across restarts; WITHIN a batch, foreachBatch is at-least-once
    on retry — safe here because upsert_by_key is IDEMPOTENT (same batch
    re-applied selects the same deterministic survivor per key and
    replaces the same rows), which is the standard recipe for
    effectively-exactly-once through foreachBatch. The path-based
    rewrite cost contract is upsert_by_key's (partition at 100 TB)."""
    from ..sources.sinks import upsert_by_key

    def apply(batch_df: DataFrame, _batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        if not os.path.isdir(out_path):
            batch_df.limit(0).write.mode("overwrite").parquet(out_path)
        upsert_by_key(spark, batch_df, out_path, key)

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_to_parquet(stream_df: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain to a parquet sink with a RESUMABLE checkpoint — unlike the
    memory sink, this supports stop/restart across runs: re-invoking with
    the same checkpoint processes only newly-arrived files and appends only
    their results (the incremental daily-load loop). Append mode only."""
    q = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
