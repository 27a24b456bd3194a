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
