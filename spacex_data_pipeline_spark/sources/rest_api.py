"""REST/JSON ingest — the reference's extract path, Spark-native.

The reference fetches the SpaceX API v4 launches snapshot with ``requests``,
flattens with ``pd.json_normalize``, projects 7 columns, coerces dtypes and
stamps a batch ``load_ts`` (airflow/dags/spacex_api_dag.py:32-44; one-shot
variant README.md:59-82). Re-design:

- The HTTP GET stays a driver-side concern (it is one small snapshot), but
  behind an injectable ``fetch`` callable so tests use fixtures and a real
  deployment could swap in "list landed JSON files on object store".
- Normalization happens on an explicit ``StructType`` — no schema inference
  (SURVEY.md §1.3: inferred-on-ingest is the reference's weakness).
- At 100 TB scale the same schema drives ``spark.read.schema(s).json(path)``
  over landed files — :func:`read_landed_json`.

The canonical raw schema is the union of the reference's two ingest variants
(SURVEY.md §1.3 decision): DAG contributes ``flight_number``/``upcoming``,
README loader contributes ``launch_id``/``rocket``.
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

API_URL = "https://api.spacexdata.com/v4/launches"
HTTP_TIMEOUT_S = 30  # spacex_api_dag.py:32

# Raw landing schema: every field as-received (strings), typed later by
# staging — mirrors the reference where raw.spacex_launches lands as text
# and stg_spacex_launches.sql:7-8 casts.
RAW_SCHEMA = T.StructType(
    [
        T.StructField("launch_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("date_utc", T.StringType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("rocket", T.StringType()),
        T.StructField("details", T.StringType()),
        T.StructField("flight_number", T.LongType()),
        T.StructField("upcoming", T.BooleanType()),
        T.StructField("load_ts", T.TimestampType()),
    ]
)

# Projection of the nested API payload → raw columns
# (spacex_api_dag.py:36-38 + README.md:69-75 rename id→launch_id).
_FIELD_MAP = {
    "launch_id": "id",
    "name": "name",
    "date_utc": "date_utc",
    "success": "success",
    "rocket": "rocket",
    "details": "details",
    "flight_number": "flight_number",
    "upcoming": "upcoming",
}


def http_fetch(url: str = API_URL, timeout: int = HTTP_TIMEOUT_S) -> list[dict[str, Any]]:
    """Live fetch (network-gated; tests inject fixtures instead)."""
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "spacex-data-pipeline-spark"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        if resp.status // 100 != 2:  # r.raise_for_status() twin
            raise RuntimeError(f"GET {url} -> HTTP {resp.status}")
        return json.loads(resp.read())


def normalize(
    spark: SparkSession,
    payload: Sequence[dict[str, Any]],
    load_ts: dt.datetime | None = None,
) -> DataFrame:
    """JSON payload → raw DataFrame with the canonical schema.

    ``load_ts`` is one constant per batch, computed driver-side — the
    reference stamps a single ``datetime.utcnow()`` for the whole batch
    (spacex_api_dag.py:44), NOT a per-row now(); replicated deliberately.
    Type coercion is cast-with-null-on-error, matching pandas
    ``errors="coerce"`` (spacex_api_dag.py:40-43).
    """
    stamp = load_ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

    def coerce(rec: dict[str, Any]) -> tuple:
        vals: list[Any] = []
        for raw_col, api_col in _FIELD_MAP.items():
            v = rec.get(api_col)
            if raw_col == "launch_id" and v is None:
                v = rec.get("launch_id")
            if raw_col in ("success", "upcoming"):
                v = bool(v) if isinstance(v, bool) else None
            elif raw_col == "flight_number":
                try:
                    v = int(v) if v is not None else None
                except (TypeError, ValueError):
                    v = None
            elif v is not None:
                v = str(v)
            vals.append(v)
        vals.append(stamp)
        return tuple(vals)

    return spark.createDataFrame([coerce(r) for r in payload], schema=RAW_SCHEMA)


def ingest(
    spark: SparkSession,
    fetch: Callable[[], Sequence[dict[str, Any]]] = http_fetch,
    load_ts: dt.datetime | None = None,
) -> DataFrame:
    """extract_and_load, minus the load: fetch → normalize → raw DataFrame."""
    return normalize(spark, fetch(), load_ts=load_ts)


def read_landed_json(spark: SparkSession, path: str) -> DataFrame:
    """Scale path: schema-pinned scan over landed JSON files.

    ``from_json``-free — the reader itself applies the schema, so corrupt
    records null out per-column exactly like the coerce path above.
    """
    api_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("date_utc", T.StringType()),
            T.StructField("success", T.BooleanType()),
            T.StructField("rocket", T.StringType()),
            T.StructField("details", T.StringType()),
            T.StructField("flight_number", T.LongType()),
            T.StructField("upcoming", T.BooleanType()),
        ]
    )
    return (
        spark.read.schema(api_schema)
        .json(path)
        .withColumnRenamed("id", "launch_id")
        .withColumn("load_ts", F.current_timestamp())
    )


def read_landed_json_quarantine(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned JSON scan that QUARANTINES corrupt lines instead of
    silently nulling them: rows that fail to parse keep their raw text
    in ``_corrupt_record`` (all data columns null), so the caller splits
    good from bad with one filter and bad lines survive for replay —
    the ingest-hygiene variant of :func:`read_landed_json` a production
    feed needs (a poisoned line must neither kill the 100 TB job nor
    vanish).

    PERMISSIVE + columnNameOfCorruptRecord is Spark's per-record
    dead-letter mechanism; the quarantine column costs nothing on clean
    data (null column, prunable).
    """
    api_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("date_utc", T.StringType()),
            T.StructField("success", T.BooleanType()),
            T.StructField("rocket", T.StringType()),
            T.StructField("details", T.StringType()),
            T.StructField("flight_number", T.LongType()),
            T.StructField("upcoming", T.BooleanType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    return (
        spark.read.schema(api_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumnRenamed("id", "launch_id")
    )
