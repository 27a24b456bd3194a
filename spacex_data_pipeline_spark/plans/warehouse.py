"""Warehouse layout + the reference pipeline end-to-end, Spark-native.

The reference's declared flow (README.md:5):

    SpaceX API → raw.spacex_launches → analytics.stg_spacex_launches (VIEW)
               → analytics.fct_spacex_launches_by_year (TABLE)

Here: `raw/` and `analytics/` are path-based warehouse namespaces of
parquet tables; the dbt layer collapses into two model functions composed
through the materialization helpers (plans/materialize.py). One call —
:func:`run_spacex_pipeline` — replaces the Airflow DAG + dbt run pair
(SURVEY.md §3.1-§3.2), with the duplication bug fixed by snapshot
idempotency.

Scale: the raw table partitions by ingest date at a daily cadence; the
staging view is pure metadata (Catalyst inlines it, pruning/pushdown flow
through); the mart is a tiny CTAS rebuilt per run. Nothing here changes
shape at 1000 executors — the heavy lifting is all inside the two model
queries.
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..operators.marts import fct_spacex_launches_by_year
from ..operators.staging import stg_spacex_launches
from ..sources import rest_api, sinks
from .materialize import materialize_table, materialize_view


class Warehouse:
    """Path-based raw/analytics namespaces (the reference's Postgres
    schemas, SURVEY.md §1.4)."""

    def __init__(self, root: str):
        self.root = root

    def path(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema, table)


def run_spacex_pipeline(
    spark: SparkSession,
    warehouse: Warehouse,
    fetch: Callable[[], Sequence[dict[str, Any]]],
    load_ts: dt.datetime | None = None,
    mode: str = "snapshot",
) -> DataFrame:
    """The whole reference, one call: extract → load raw → staging view →
    mart CTAS. Returns the mart DataFrame.

    ``mode='append'`` reproduces the reference's duplicating daily append
    (spacex_api_dag.py:49) for fidelity; ``'snapshot'`` (default) is the
    idempotent fix — re-running a day replaces it instead of doubling it.
    Readers of the append-mode table should go through
    ``sinks.dedup_on_read``.
    """
    raw_path = warehouse.path("raw", "spacex_launches")
    raw = rest_api.ingest(spark, fetch, load_ts=load_ts)
    if mode == "append":
        sinks.append(raw, raw_path)
    else:
        sinks.write_snapshot(raw, raw_path)

    raw_tbl = spark.read.schema(rest_api.RAW_SCHEMA).parquet(raw_path)
    stg = materialize_view(stg_spacex_launches(raw_tbl), "stg_spacex_launches")
    mart = materialize_table(
        fct_spacex_launches_by_year(stg),
        warehouse.path("analytics", "fct_spacex_launches_by_year"),
        name="fct_spacex_launches_by_year",
    )
    return mart
