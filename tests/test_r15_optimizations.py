"""Focused equivalence tests for the r15 optimization pass.

Same contract as tests/test_r14_optimizations.py: every r15 change is an
internals-only rewrite (shared materialized pass / fewer jobs / guarded
physical fan-out) with a bit-identical output contract; these pin each
rewrite against its unoptimized form ON THE SAME INPUT so a future edit
cannot silently turn an optimization into a behavior change. The oracle
parity suite re-proves the end results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacex_data_pipeline_spark import catalog
from spacex_data_pipeline_spark.operators.dedup import (
    connected_components,
    materialize,
)
from spacex_data_pipeline_spark.operators.text import (
    bm25_tf,
    bm25_topk,
    trigram_tf,
    trigram_typicality,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_trigram_typicality_shared_tf_model_equivalence(spark, sf_smoke):
    """trigram_typicality with pre-materialized tf=/model= handles returns
    exactly the rows of the self-built form (the r15 _doc_trigram_model
    sweep-share contract), including the keep=/with_sums= variant."""
    docs = catalog.table(spark, sf_smoke, "documents")
    tf = materialize(trigram_tf(docs))
    model = materialize(tf.groupBy("tri").agg(F.sum("tf").alias("c")))
    assert _rows(trigram_typicality(docs, tf=tf, model=model)) == _rows(
        trigram_typicality(docs)
    )
    assert _rows(
        trigram_typicality(
            docs, keep=("source",), with_sums=True, tf=tf, model=model
        )
    ) == _rows(trigram_typicality(docs, keep=("source",), with_sums=True))


def test_bm25_topk_shared_tf_equivalence(spark, sf_smoke):
    """bm25_topk with a pre-materialized tf= inverted-index base returns
    exactly the rows of the self-built form (the r15 _doc_bm25_tf
    sweep-share contract)."""
    docs = catalog.table(spark, sf_smoke, "documents")
    tf = materialize(bm25_tf(docs))
    assert _rows(bm25_topk(docs, [0, 1, 2], k=10, tf=tf)) == _rows(
        bm25_topk(docs, [0, 1, 2], k=10)
    )


def test_cc_persist_loop_matches_lazy_form(spark):
    """connected_components' r15 one-job-per-round persist loop
    (checkpoint='local' path) returns exactly the labels of the
    unchanged two-job materialize path (checkpoint='persist') on a graph
    with a diameter-3 chain, a near-clique, singletons, and
    out-of-node-set edge endpoints."""
    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain, diameter 3
            (5, 6), (6, 7), (5, 7),          # near-clique
            (8, 99),                         # endpoint outside node set
        ],
        "doc_a long, doc_b long",
    )
    got = _rows(connected_components(nodes, edges))
    want = _rows(connected_components(nodes, edges, checkpoint="persist"))
    assert got == want
    comp = dict((r[0], r[1]) for r in got)
    assert comp[4] == 1 and comp[7] == 5 and comp[0] == 0
    # the outside endpoint neither bridges nor becomes a label
    assert comp[8] == 8 and 99 not in comp


def test_fanout_guard_never_fires_at_fixture_scale(spark, sf_smoke):
    """The bytes-guarded single-split fan-out must be a no-op on every
    local fixture (all far below the 1 GiB floor): no Repartition node
    in any bare table scan."""
    for name in catalog.TABLES:
        df = catalog.table(spark, sf_smoke, name)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Repartition" not in plan, name


def test_fanout_guard_fires_above_floor_and_keeps_pushdown(
    spark, sf_smoke, monkeypatch
):
    """With the floor lowered below fixture size, the guard repartitions
    the single-split scan to defaultParallelism AND Catalyst still pushes
    filters/pruning through the repartition into the parquet scan —
    values unchanged."""
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_MIN_BYTES", "1")
    fanned = catalog.table(spark, sf_smoke, "orders")
    monkeypatch.delenv("SPARK_GRAFT_FANOUT_MIN_BYTES")
    plain = catalog.table(spark, sf_smoke, "orders")
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    q = fanned.filter(F.col("o_totalprice") > 100000).select(
        "o_orderkey", "o_totalprice"
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan
    assert _rows(q) == _rows(
        plain.filter(F.col("o_totalprice") > 100000).select(
            "o_orderkey", "o_totalprice"
        )
    )
