"""Staging transform — the reference's dbt staging view, Spark-native.

``dbt/models/staging/stg_spacex_launches.sql:3-24`` is a CTE that casts raw
text columns and derives ``year``:

    date_utc::timestamptz     -> F.to_timestamp  (P3; null on unparsable)
    success::boolean          -> cast("boolean") (P4, 3-valued)
    date_part('year', ...)    -> F.year          (P7)
    launch_id/rocket rename   -> select aliases  (P1/P2)

All row-level expressions (SURVEY.md §2.2) — pure narrow transforms, no
shuffle, fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stg_spacex_launches(raw: DataFrame) -> DataFrame:
    """Raw launches (strings + nullable scalars) → typed staging relation.

    Output schema mirrors stg_spacex_launches.sql:15-23:
    launch_id, name, date_utc TIMESTAMP, year INT, success BOOLEAN,
    rocket, details, load_ts TIMESTAMP.
    """
    # try_to_timestamp, not to_timestamp: Spark 4 runs ANSI mode by default,
    # where a malformed literal *throws*; the reference coerces to NULL
    # (pandas errors="coerce", spacex_api_dag.py:40).
    ts = F.try_to_timestamp(F.col("date_utc"))
    return raw.select(
        F.col("launch_id"),
        F.col("name"),
        ts.alias("date_utc"),
        F.year(ts).cast("int").alias("year"),
        F.col("success").cast("boolean").alias("success"),
        F.col("rocket"),
        F.col("details"),
        F.col("load_ts"),
    )
