"""Driver-window rotation invariants (VERDICT r2 "next round" #1).

The driver's correctness harness hash-checks exactly the FIRST 50 entries
of ``queries()`` insertion order. These tests pin the window's
composition so a refactor can't silently rotate an unverified entry out
of driver sight, and assert the rotation leaves the registry itself
intact (same 100+ entries, same callables, every entry still covered by
the local oracle replica in test_oracle_parity.py).
"""

from __future__ import annotations

from spacex_data_pipeline_spark.queries import DRIVER_WINDOW, REGISTRY, queries

# r5: every registry entry outside the window has at least one green
# driver CORRECTNESS row (r1-r4) under an unchanged implementation -
# their gate this round is the local replica, which is exactly as strict
# (rows + schema + value multiset).
NEW_AWAITING_WINDOW: set[str] = set()

PREVIOUSLY_DRIVER_GREEN = {
    # -- green in r4 under the current implementation (48 of the 50
    #    r4-window rows; the 2 changed this round are re-windowed) --
    "fct_events_by_day",
    "stg_events_typed",
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q5_nation_revenue",
    "semi_customers_with_open_orders",
    "anti_customers_without_orders",
    "window_running_customer_spend",
    "window_top3_orders_per_customer",
    "setop_intersect_customers",
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
    "dedup_exact_docs",
    "dedup_latest_order_per_customer",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_ivf",
    "similarity_topk_cosine",
    "similarity_ann_lsh",
    "text_stats_docs",
    "text_quality_docs",
    "text_langid_docs",
    "text_fingerprints_docs",
    "multimodal_media_meta",
    "multimodal_decode",
    "sessionize_events",
    "events_hourly_rollup",
    "left_join_customer_order_stats",
    "full_outer_year_activity",
    "cross_join_region_status",
    "subquery_above_nation_avg",
    "having_active_customers",
    "string_predicates_part",
    "similarity_ivf_topk",
    "array_agg_nations_per_region",
    "embeddings_unit_norm",
    "embeddings_random_projection",
    "funnel_conversion_rates",
    "dedup_cluster_representatives",
    # -- r3-era rows deferred to r6 by the r5 rotation (trivial
    #    scalar/CASE/date/window one-liners, unchanged since r3) --
    "histogram_order_totalprice",
    "sample_orders_deterministic",
    "stratified_sample_orders",
    "split_documents_train_val_test",
    "map_functions_events",
    "corr_exact_by_flag",
    "window_distribution_stats",
    "window_range_frame_events",
    "window_lag_lead_first",
    "stddev_exact_by_flag",
    "sql_api_returned_revenue",
    "union_all_order_events",
    "coalesce_case_scalar",
    "explode_token_table",
    "date_arithmetic_orders",
    "grouping_sets_orders",
    "mode_priority_per_status",
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
    Schema inspection builds plans only — except entries composing the
    eagerly-checkpointed dedup intermediates (shingle/signature/
    fingerprint tables, the CC fixpoint), which materialize those at
    build by deliberate design (see ngram_jaccard_pairs' comment)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, q in REGISTRY.items():
        schema = q.fn(spark, sf_oracle).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, f"nested output columns would crash the driver: {offenders}"
