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
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects. Read nanos as LONG and truncate to microseconds with
        # integer `div` (ns epoch values exceed 2^53 — double math would
        # corrupt them). DuckDB truncates ns->us identically.
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
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
