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

# r6: every registry entry outside the window has at least one green
# driver CORRECTNESS row (r1-r5) under an unchanged implementation -
# their gate this round is the local replica, which is exactly as strict
# (rows + schema + value multiset).
NEW_AWAITING_WINDOW: set[str] = set()

PREVIOUSLY_DRIVER_GREEN = {
    # -- green in r5 under the current implementation (44 of the 50
    #    r5-window rows; the 6 changed this round are re-windowed) --
    "applyinpandas_zscore",
    "array_functions_embeddings",
    "asof_join_last_purchase",
    "asof_join_next_purchase",
    "bigram_collocations_docs",
    "chunk_documents_overlap",
    "corpus_token_budget",
    "customer_spend_deciles",
    "data_quality_orders",
    "data_quality_relationships",
    "decontaminate_docs",
    "dedup_components_docs",
    "dedup_cross_split_leakage",
    "dedup_minhash_lsh_verify",
    "distinct_status_priority",
    "fct_orders_by_year",
    "funnel_view_click_purchase",
    "hopping_window_event_counts",
    "interval_join_view_purchase",
    "knn_label_agreement",
    "length_bucketed_batches_docs",
    "multimodal_frame_sample",
    "order_nulls_and_offset",
    "pack_documents_token_bins",
    "pipeline_training_data_prep",
    "quality_filter_funnel",
    "raw_count_orders",
    "resample_user_daily_gapfill",
    "salted_join_order_nations",
    "setop_except_customers",
    "setop_union_customers",
    "shard_documents_for_training",
    "snapshot_diff_orders",
    "source_mixture_report",
    "source_token_budget_cap",
    "split_contamination_stats",
    "text_redact_pii",
    "text_repetition_stats",
    "text_term_frequencies",
    "text_tfidf_top_terms",
    "top_years_desc",
    "udtf_chunk_documents",
    "window_running_distinct_users",
    "winnowing_near_pairs_docs",
    # -- r4-era rows deferred to r7 by the r6 rotation (low-risk
    #    relational one-liners and stable aggregates, unchanged since
    #    their r4 green rows) --
    "anti_customers_without_orders",
    "approx_distinct_parts",
    "approx_quantiles_lineitem",
    "array_agg_nations_per_region",
    "count_distinct_customers_by_status",
    "cross_join_region_status",
    "cube_lineitem_flags",
    "embeddings_random_projection",
    "embeddings_unit_norm",
    "fct_events_by_day",
    "filter_pushdown_lineitem",
    "full_outer_year_activity",
    "funnel_conversion_rates",
    "having_active_customers",
    "left_join_customer_order_stats",
    "median_quantity_by_flag",
    "pivot_priority_by_status",
    "q3_unshipped_revenue",
    "rollup_orders",
    "scalar_dates_orders",
    "scalar_functions_part",
    "semi_customers_with_open_orders",
    "setop_intersect_customers",
    "stg_events_typed",
    "string_predicates_part",
    "subquery_above_nation_avg",
    "window_running_customer_spend",
    "window_top3_orders_per_customer",
    "text_fingerprints_docs",
    "text_langid_docs",
    "dedup_latest_order_per_customer",
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
