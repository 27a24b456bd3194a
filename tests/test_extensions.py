"""Cross-method invariants for the LLM-pipeline extension operators.

The oracle parity suite pins exact results; these tests pin the *relations
between* methods (approximate finds what exact finds, plumbing invariants
hold) — the properties that must survive any future tuning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacex_data_pipeline_spark import catalog
from spacex_data_pipeline_spark.operators import dedup, multimodal, similarity
from spacex_data_pipeline_spark.operators.sessionize import sessionize


@pytest.fixture(scope="module")
def docs(spark, sf_oracle):
    return catalog.table(spark, sf_oracle, "documents")


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }


def test_minhash_recovers_strong_near_dups(docs, exact_pairs):
    strong = {p for p, j in exact_pairs.items() if j >= 0.8}
    assert strong, "fixture should contain planted near-dups"
    mh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_candidates(docs, threshold=0.2).collect()
    }
    recovered = strong & mh
    assert len(recovered) / len(strong) >= 0.9


def test_simhash_close_for_strong_near_dups(docs, exact_pairs):
    strong = {p for p, j in exact_pairs.items() if j >= 0.9}
    sh = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_near_pairs(docs).collect()}
    hit = [p for p in strong if p in sh and sh[p] <= 8]
    assert len(hit) / max(len(strong), 1) >= 0.8


def test_exact_dedup_matches_distinct_count(spark, sf_oracle, docs):
    n_distinct = docs.select("text").distinct().count()
    assert dedup.exact_dedup_first(docs, "text", "doc_id").count() == n_distinct
    assert dedup.exact_dedup_rows(docs, "text", "doc_id").count() == n_distinct


def test_ann_recall_floor(spark, sf_oracle):
    emb = catalog.table(spark, sf_oracle, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_lsh_topk(emb, qids, k=10).collect()
    }
    # uniform-random fixture embeddings are LSH's worst case; clustered
    # real embeddings concentrate far harder. Floor, not target.
    assert len(exact & ann) / len(exact) >= 0.3


def test_ann_results_subset_of_exact_cosine(spark, sf_oracle):
    """Every ANN hit must carry the same cosine the exact path computes."""
    emb = catalog.table(spark, sf_oracle, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.cosine_topk(emb, [0, 1], k=500).collect()
    }
    for r in similarity.ann_lsh_topk(emb, [0, 1], k=10).collect():
        assert exact[(r.query_id, r.neighbor_id)] == r.cosine


def test_multimodal_decode_invariants(docs):
    media = multimodal.documents_as_media(docs)
    decoded = multimodal.decode_image_meta(media)
    bad = decoded.filter(
        (F.col("n_pixels") != F.col("width").cast("long") * F.col("height"))
        | (F.col("width") <= 0)
        | (F.col("height") <= 0)
    )
    assert bad.count() == 0
    assert decoded.count() == docs.count()


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        multimodal.real_decoder(b"\x89PNG")


def test_frame_sample_plan(docs):
    media = multimodal.documents_as_media(docs)
    frames = multimodal.frame_sample_plan(media, every_nth=10)
    assert frames.filter(F.col("frame_idx") % 10 != 0).count() == 0
    assert frames.count() > 0


def test_sessionize_invariants(spark, sf_oracle):
    ev = catalog.table(spark, sf_oracle, "events")
    sess = sessionize(ev)
    assert sess.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    assert sess.filter(F.col("session_start") > F.col("session_end")).count() == 0
    # session ids are 1..k contiguous per user
    per_user = sess.groupBy("user_id").agg(
        F.min("session_id").alias("lo"),
        F.max("session_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    assert per_user.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0


def test_zscore_grouped_map(spark, sf_oracle):
    import statistics

    from spacex_data_pipeline_spark.operators.similarity import zscore_mean_per_label

    emb = catalog.table(spark, sf_oracle, "embeddings")
    rows = zscore_mean_per_label(emb).collect()
    assert len(rows) == emb.count()
    per: dict[int, list[float]] = {}
    for r in rows:
        per.setdefault(r.label, []).append(r.z)
    for zs in per.values():
        assert abs(statistics.mean(zs)) < 1e-12
        assert abs(statistics.stdev(zs) - 1) < 1e-9
    # deterministic across shuffles
    again = zscore_mean_per_label(emb).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_recall_and_probe_monotonicity(spark, sf_oracle):
    """IVF with n_probe = n_centroids must equal exact brute force; fewer
    probes trade recall for partition pruning."""
    emb = catalog.table(spark, sf_oracle, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    full_probe = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(emb, qids, k=10, n_centroids=8, n_probe=8).collect()
    }
    assert full_probe == exact  # probing every cell == exact search
    partial = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(emb, qids, k=10, n_centroids=8, n_probe=3).collect()
    }
    assert len(exact & partial) / len(exact) >= 0.3
