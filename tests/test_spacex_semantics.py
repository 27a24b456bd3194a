"""Golden tests locking the reference's exact semantics (SURVEY.md §5 item 2).

Fixture characteristics required by FIXTURES.md §A: null ``success`` rows
(must count as FAILURES — fct_spacex_launches_by_year.sql:7, README.md:140),
a year with 0 successes and one with 0 failures, an unparsable ``date_utc``
(→ NULL after cast — spacex_api_dag.py:40 ``errors="coerce"``), multi-year
coverage, and duplicated ``launch_id`` across two simulated ingest batches
(the reference's append duplication, spacex_api_dag.py:49).
"""

from __future__ import annotations

import datetime as dt

import pytest

from spacex_data_pipeline_spark.operators.marts import fct_spacex_launches_by_year
from spacex_data_pipeline_spark.operators.staging import stg_spacex_launches
from spacex_data_pipeline_spark.sources import rest_api, sinks

BATCH_TS = dt.datetime(2024, 6, 1, 12, 0, 0)

PAYLOAD = [
    # 2020: 2 success, 1 failure -> 66.67
    {"id": "a1", "name": "L1", "date_utc": "2020-01-05T10:00:00.000Z", "success": True,
     "rocket": "r1", "details": None, "flight_number": 1, "upcoming": False},
    {"id": "a2", "name": "L2", "date_utc": "2020-03-05T10:00:00.000Z", "success": True,
     "rocket": "r1", "details": "ok", "flight_number": 2, "upcoming": False},
    {"id": "a3", "name": "L3", "date_utc": "2020-06-05T10:00:00.000Z", "success": False,
     "rocket": "r2", "details": "boom", "flight_number": 3, "upcoming": False},
    # 2021: all success (0 failures) -> 100.0
    {"id": "b1", "name": "L4", "date_utc": "2021-02-01T00:00:00.000Z", "success": True,
     "rocket": "r1", "details": None, "flight_number": 4, "upcoming": False},
    # 2022: success NULL + explicit failure -> 0 successes, 2 failures
    {"id": "c1", "name": "L5", "date_utc": "2022-07-01T00:00:00.000Z", "success": None,
     "rocket": "r2", "details": None, "flight_number": None, "upcoming": None},
    {"id": "c2", "name": "L6", "date_utc": "2022-08-01T00:00:00.000Z", "success": False,
     "rocket": "r2", "details": None, "flight_number": 6, "upcoming": False},
    # unparsable date -> NULL year group
    {"id": "d1", "name": "L7", "date_utc": "not-a-date", "success": True,
     "rocket": "r1", "details": None, "flight_number": 7, "upcoming": False},
]


@pytest.fixture(scope="module")
def mart_rows(spark):
    raw = rest_api.normalize(spark, PAYLOAD, load_ts=BATCH_TS)
    fct = fct_spacex_launches_by_year(stg_spacex_launches(raw))
    return {r["year"]: r for r in fct.collect()}


def test_raw_schema_and_coercion(spark):
    raw = rest_api.normalize(spark, PAYLOAD, load_ts=BATCH_TS)
    assert [f.name for f in raw.schema.fields] == [
        "launch_id", "name", "date_utc", "success", "rocket",
        "details", "flight_number", "upcoming", "load_ts",
    ]
    rows = {r["launch_id"]: r for r in raw.collect()}
    assert rows["c1"]["success"] is None
    assert rows["c1"]["flight_number"] is None
    assert all(r["load_ts"] == BATCH_TS for r in rows.values())  # one stamp per batch


def test_unparsable_date_coerces_to_null(spark):
    raw = rest_api.normalize(spark, PAYLOAD, load_ts=BATCH_TS)
    stg = stg_spacex_launches(raw)
    bad = {r["launch_id"]: r for r in stg.collect()}["d1"]
    assert bad["date_utc"] is None and bad["year"] is None


def test_null_success_counts_as_failure(mart_rows):
    y2022 = mart_rows[2022]
    assert y2022["launches"] == 2
    assert y2022["successes"] == 0
    assert y2022["failures"] == 2  # NULL success -> CASE ELSE branch
    assert y2022["success_rate_pct"] == 0.0


def test_rate_rounding_and_invariants(mart_rows):
    assert mart_rows[2020]["success_rate_pct"] == 66.67  # round(200/3, 2)
    assert mart_rows[2021]["success_rate_pct"] == 100.0
    for r in mart_rows.values():
        assert r["successes"] + r["failures"] == r["launches"]


def test_zero_failure_and_null_year_groups(mart_rows):
    assert mart_rows[2021]["failures"] == 0
    assert None in mart_rows  # unparsable date row groups under NULL year
    assert mart_rows[None]["launches"] == 1


def test_append_duplication_and_dedup_on_read(spark, tmp_path):
    """The reference's daily append duplicates the full snapshot
    (SURVEY.md §2.4); dedup_on_read must restore one row per launch_id,
    keeping the newest batch."""
    path = str(tmp_path / "raw_launches")
    b1 = rest_api.normalize(spark, PAYLOAD, load_ts=BATCH_TS)
    b2 = rest_api.normalize(spark, PAYLOAD, load_ts=BATCH_TS + dt.timedelta(days=1))
    sinks.append(b1, path)
    sinks.append(b2, path)
    raw = spark.read.parquet(path)
    assert raw.count() == 2 * len(PAYLOAD)  # reference behavior: duplicated
    deduped = sinks.dedup_on_read(raw, "launch_id")
    assert deduped.count() == len(PAYLOAD)
    assert all(
        r["load_ts"] == BATCH_TS + dt.timedelta(days=1) for r in deduped.collect()
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"year", "launches", "successes", "failures", "success_rate_pct"} <= set(df.columns)


def test_full_pipeline_end_to_end(spark, tmp_path):
    """README.md:5 flow in one call: API fixture → raw → staging view →
    mart table; snapshot mode is idempotent across re-runs."""
    from spacex_data_pipeline_spark.plans.warehouse import Warehouse, run_spacex_pipeline

    wh = Warehouse(str(tmp_path / "wh"))
    mart1 = run_spacex_pipeline(spark, wh, fetch=lambda: PAYLOAD, load_ts=BATCH_TS)
    rows1 = {r["year"]: r for r in mart1.collect()}
    assert rows1[2020]["success_rate_pct"] == 66.67
    # re-run same snapshot: no duplication (unlike the reference's append)
    mart2 = run_spacex_pipeline(
        spark, wh, fetch=lambda: PAYLOAD, load_ts=BATCH_TS + dt.timedelta(days=1)
    )
    assert {r["year"]: r["launches"] for r in mart2.collect()} == {
        y: r["launches"] for y, r in rows1.items()
    }
    # the staging view is queryable by name (dbt ref() equivalent)
    assert spark.table("stg_spacex_launches").count() == len(PAYLOAD)
    # append mode reproduces the reference's duplication
    wh2 = Warehouse(str(tmp_path / "wh2"))
    run_spacex_pipeline(spark, wh2, fetch=lambda: PAYLOAD, load_ts=BATCH_TS, mode="append")
    mart3 = run_spacex_pipeline(
        spark, wh2, fetch=lambda: PAYLOAD,
        load_ts=BATCH_TS + dt.timedelta(days=1), mode="append",
    )
    assert {r["year"]: r["launches"] for r in mart3.collect()} == {
        y: 2 * r["launches"] for y, r in rows1.items()
    }
