"""Driver-window rotation invariants (VERDICT r2 "next round" #1).

The driver's correctness harness hash-checks exactly the FIRST 50 entries
of ``queries()`` insertion order. These tests pin the window's
composition so a refactor can't silently rotate an unverified entry out
of driver sight, and assert the rotation leaves the registry itself
intact (same 83 entries, same callables, every entry still covered by
the local oracle replica in test_oracle_parity.py).
"""

from __future__ import annotations

from spacex_data_pipeline_spark.queries import DRIVER_WINDOW, REGISTRY, queries

# Entries that had a green driver CORRECTNESS row in r01/r02 and are
# rotated OUT of the r03 window — their only gate this round is the local
# replica, which is exactly as strict (rows + schema + value multiset).
# new in r3 but past the hard-50 window; its components are windowed
# (funnel_view_click_purchase) and it is locked by the local replica
NEW_AWAITING_WINDOW = {"funnel_conversion_rates"}

PREVIOUSLY_DRIVER_GREEN = {
    # fct_orders_by_year additionally re-runs every round as the driver's
    # entry() smoke query
    "fct_orders_by_year",
    "stg_events_typed",
    "dedup_exact_docs",
    "window_running_customer_spend",
    "sessionize_events",
    "events_hourly_rollup",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "multimodal_decode",
    "dedup_embedding_cosine",
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "similarity_ann_lsh",
    "similarity_topk_cosine",
    "q5_nation_revenue",
    "dedup_embedding_cosine_ivf",
    "fct_events_by_day",
    "raw_count_orders",
    "top_years_desc",
    "semi_customers_with_open_orders",
    "anti_customers_without_orders",
    "window_top3_orders_per_customer",
    "setop_union_customers",
    "setop_intersect_customers",
    "setop_except_customers",
    "distinct_status_priority",
    "rollup_orders",
    "cube_lineitem_flags",
    "pivot_priority_by_status",
    "scalar_functions_part",
    "scalar_dates_orders",
    "filter_pushdown_lineitem",
    "count_distinct_customers_by_status",
    "median_quantity_by_flag",
    "approx_distinct_parts",
    "approx_quantiles_lineitem",
    "dedup_latest_order_per_customer",
    "text_stats_docs",
    "text_quality_docs",
    "text_langid_docs",
    "text_fingerprints_docs",
    "multimodal_media_meta",
    "left_join_customer_order_stats",
    "full_outer_year_activity",
    "cross_join_region_status",
    "subquery_above_nation_avg",
    "having_active_customers",
    "string_predicates_part",
    "order_nulls_and_offset",
}


def test_window_is_the_first_50_entries():
    assert len(DRIVER_WINDOW) == 50
    assert list(queries())[:50] == list(DRIVER_WINDOW)


def test_window_covers_every_never_driver_checked_entry():
    """Everything outside the window must have a prior driver-green row —
    i.e. no entry may end the round with zero driver verification ever."""
    outside = set(REGISTRY) - set(DRIVER_WINDOW)
    assert outside == PREVIOUSLY_DRIVER_GREEN | NEW_AWAITING_WINDOW


def test_rotation_preserves_the_registry():
    assert len(REGISTRY) >= 100
    assert len(set(DRIVER_WINDOW)) == 50
    # every windowed entry is oracle-backed (the driver records a full
    # rows+schema+hash row for each, never the weaker rows-only check)
    missing_oracle = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert not missing_oracle


def test_no_registry_entry_emits_nested_output(spark, sf_oracle):
    """The driver's canonicalizer pandas-sorts every output column and
    crashes on unhashable cells (r3: 3 driver-err rows from array-typed
    columns). Registry outputs must therefore be scalar-only — string
    lists get array_join'ed, float arrays get posexplode'd to
    (id, pos, value) rows. Library operators may still return arrays;
    this guards only the ``queries()`` projections the driver hashes.
    Schema inspection is lazy (plan-build only, no execution)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, q in REGISTRY.items():
        schema = q.fn(spark, sf_oracle).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, f"nested output columns would crash the driver: {offenders}"
