"""Fixture-table catalog.

The driver materializes a deterministic star schema (TESTDATA.md) as one
parquet file per table. This module is the single place that knows the table
list and how to load/register it, mirroring what the reference gets from
Postgres schemas ``raw`` / ``analytics`` (SURVEY.md §1.4).

Scans stay fully declarative (``spark.read.parquet``) so Catalyst performs
column pruning and predicate pushdown into the parquet reader — check with
``df.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The fixture generator has shipped events.ts under two physical
        # types across rounds: parquet TIMESTAMP(NANOS) (which Spark's
        # reader rejects unless nanosAsLong maps it to LONG) and plain
        # TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Normalize both to a
        # session-tz TIMESTAMP so every downstream operator sees one type.
        #
        # The nanosAsLong conf is session-wide and is set at session build
        # time (session.build_session). For externally-built sessions we
        # set it here too — and deliberately do NOT restore it afterward:
        # the parquet scan is lazy, and flipping the conf back before
        # execution makes the deferred read fail (verified). The session
        # therefore reads ALL nanos-timestamp parquet as LONG; this module
        # is the single place that converts.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            # nanos epoch as LONG: truncate to micros with integer `div`
            # (ns values exceed 2^53 — double math would corrupt them).
            # DuckDB truncates ns->us identically.
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if ts_type == "timestamp_ntz":
            # session tz is pinned to UTC (session.py), so this cast is
            # value-identical and keeps the public schema stable.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
