"""File-format sources/sinks: parquet (primary), CSV, JSON — schema-pinned.

The reference's only storage is Postgres (SURVEY.md §1.4); an engine a
reference user can switch to needs file interchange as first-class:
landed-API JSON (S1/S2's scale path), CSV exports, and the parquet
warehouse. Rules applied everywhere:

- **Schema is always supplied** (`spark.read.schema(...)`) — inference
  costs an extra full pass and can drift between files; a 100 TB lake
  cannot re-infer per job.
- Writes go through a deterministic column order so file layouts are
  stable across runs.
- Partitioned parquet writes (`partition_by`) enable partition pruning:
  a filter on the partition column skips entire directories — verified by
  plan assertion in tests/test_sources.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet_partitioned(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Partitioned warehouse write — the layout that turns a filter on the
    partition column into directory pruning instead of a scan."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_parquet_evolved(
    spark: SparkSession,
    path: str,
    target: T.StructType,
    defaults: dict | None = None,
) -> DataFrame:
    """Read a path table whose files were written under EVOLVING schemas
    (a long-lived ingest adds columns over the years; old files lack
    them) and CONFORM every row to ``target``:

    - columns missing from old files surface as their ``defaults`` value
      (typed null when absent) — mergeSchema already nulls them per-file;
      the coalesce makes the backfill policy explicit,
    - columns not in ``target`` are dropped (projection),
    - matching columns cast to the target type (widenings like int→long
      ride the cast; ANSI makes a narrowing that loses data throw
      rather than corrupt).

    ``mergeSchema`` unions the file footers' schemas, which reads every
    footer — fine per-partition, wasteful corpus-wide; at 100 TB the
    declared schema lives in a metastore/table format and this is the
    path-table fallback. The conform step is the part that stays: every
    reader sees ONE stable schema no matter which era of file it hits."""
    from pyspark.sql import functions as F

    raw = spark.read.option("mergeSchema", "true").parquet(path)
    defaults = defaults or {}
    cols = []
    for f in target.fields:
        if f.name in raw.columns:
            c = F.col(f.name).cast(f.dataType)
            if f.name in defaults:
                c = F.coalesce(c, F.lit(defaults[f.name]).cast(f.dataType))
            cols.append(c.alias(f.name))
        else:
            cols.append(F.lit(defaults.get(f.name)).cast(f.dataType).alias(f.name))
    return raw.select(*cols)
