"""Materialization layer — what dbt does for the reference, collapsed.

The reference's dbt project materializes staging as a VIEW and marts as
TABLEs (dbt_project.yml:14-20, S6/S7 in SURVEY.md §2.1); ``ref()`` induces
the model DAG. Spark-native: a model is a function returning a DataFrame;
``ref()`` is function composition; a VIEW is a (temp) view over the logical
plan; a TABLE is a parquet CTAS. Lineage IS the logical plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Model = Callable[[SparkSession], DataFrame]


def materialize_view(df: DataFrame, name: str) -> DataFrame:
    """dbt ``materialized='view'`` — lazy, re-planned per query; views
    expand into consumers' logical plans so Catalyst prunes/pushes through
    them (SURVEY.md §4)."""
    df.createOrReplaceTempView(name)
    return df


def materialize_table(
    df: DataFrame,
    path: str,
    name: str | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """dbt ``materialized='table'`` — eager CTAS to parquet; returns the
    re-read DataFrame so downstream models consume the materialized form."""
    w = df.write.mode("overwrite").format("parquet")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    out = df.sparkSession.read.parquet(path)
    if name:
        out.createOrReplaceTempView(name)
    return out


def run_dag(spark: SparkSession, models: dict[str, Model]) -> dict[str, DataFrame]:
    """Run models in declaration order (a dict preserves insertion order);
    each model may reference earlier ones via the temp-view catalog —
    the 2-model chain of the reference needs nothing fancier."""
    out: dict[str, DataFrame] = {}
    for name, model in models.items():
        out[name] = materialize_view(model(spark), name)
    return out
