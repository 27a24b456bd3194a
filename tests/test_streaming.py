"""Streaming/batch parity: a replay of the stream reproduces the batch
result (the property that makes the streaming layer a drop-in incremental
upgrade of the reference's daily full-refresh — SURVEY.md §3.1 redesign)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacex_data_pipeline_spark import catalog
from spacex_data_pipeline_spark.operators.sessionize import sessionize
from spacex_data_pipeline_spark.streaming.ingest import (
    run_available_now,
    stream_events_from_files,
)
from spacex_data_pipeline_spark.streaming.rollup import (
    hopping_rollup_stream,
    hourly_rollup_stream,
    session_rollup_stream,
)


@pytest.fixture(scope="module")
def landed_events(spark, sf_oracle, tmp_path_factory):
    """Re-land the events table as clean microsecond parquet — the shape a
    streaming file source would actually receive (the raw fixture's
    nanos-timestamp encoding is a batch-catalog concern)."""
    path = str(tmp_path_factory.mktemp("landed") / "events")
    catalog.table(spark, sf_oracle, "events").write.mode("overwrite").parquet(path)
    return path


def test_stream_hourly_matches_batch(spark, sf_oracle, landed_events, tmp_path):
    stream = stream_events_from_files(spark, landed_events)
    assert stream.isStreaming
    run_available_now(
        hourly_rollup_stream(stream),
        str(tmp_path / "ckpt_hourly"),
        "hourly_out",
        output_mode="complete",
    )
    got = {
        (r.hour_start, r.event_type): (r.n, r.total_value)
        for r in spark.table("hourly_out").collect()
    }
    batch = catalog.table(spark, sf_oracle, "events")
    from spacex_data_pipeline_spark.functions.numeric import dsum

    want = {
        (r.hour_start, r.event_type): (r.n, r.total_value)
        for r in batch.groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .collect()
    }
    assert got == want


def test_stream_hopping_matches_batch(spark, sf_oracle, landed_events, tmp_path):
    """Sliding-window streaming == the batch hopping query (which is
    itself oracle-checked), closing the loop stream → batch → DuckDB."""
    from spacex_data_pipeline_spark.queries import REGISTRY

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        hopping_rollup_stream(stream),
        str(tmp_path / "ckpt_hopping"),
        "hopping_out",
        output_mode="complete",
    )
    got = {
        (r.hop_start, r.event_type): r.n for r in spark.table("hopping_out").collect()
    }
    want = {
        (r.hop_start, r.event_type): r.n
        for r in REGISTRY["hopping_window_event_counts"].fn(spark, sf_oracle).collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, sf_oracle, landed_events, tmp_path):
    """Watermarked stream-stream interval join replayed over the full
    stream == the batch interval join (itself oracle-checked)."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.joins import (
        view_purchase_interval_join_stream,
    )

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        view_purchase_interval_join_stream(stream),
        str(tmp_path / "ckpt_ssj"),
        "ssj_out",
        output_mode="append",
    )
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.table("ssj_out").collect()
    }
    want = {
        (r.purchase_id, r.view_id)
        for r in REGISTRY["interval_join_view_purchase"].fn(spark, sf_oracle).collect()
    }
    assert got == want


def test_stream_sessions_match_batch_sessionize(spark, sf_oracle, landed_events, tmp_path):
    """Built-in session_window grouping == hand-rolled lag/cumsum batch
    sessionization: same (user, session_start, n_events) triples."""
    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        session_rollup_stream(stream, gap="30 minutes"),
        str(tmp_path / "ckpt_sess"),
        "sessions_out",
        output_mode="complete",
    )
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.table("sessions_out").collect()
    }
    batch = sessionize(catalog.table(spark, sf_oracle, "events"), gap_minutes=30)
    want = {
        (r.user_id, r.session_start, r.n_events) for r in batch.collect()
    }
    assert got == want


def test_stream_session_sequences_match_batch(spark, sf_oracle, landed_events, tmp_path):
    """On-arrival sequence assembly == the batch session_sequences_events
    query: same (user, session-start, n_events, sequence) tuples — the
    array_sort at emit erases collect_list's arrival-order dependence."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.rollup import session_sequences_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        session_sequences_stream(stream, gap="30 minutes"),
        str(tmp_path / "ckpt_seq"),
        "seq_out",
        output_mode="complete",
    )
    got = {
        (r.user_id, r.first_ts, r.n_events, r.seq)
        for r in spark.table("seq_out").collect()
    }
    batch = REGISTRY["session_sequences_events"].fn(spark, sf_oracle)
    # the batch twin keys sessions by per-user ordinal and reports
    # duration; compare on the shared identity (user, start ts) instead
    from pyspark.sql import functions as F  # noqa: F811 — local alias

    b = batch  # (user_id, session_id, n_events, dur_seconds, seq)
    sess_start = REGISTRY["sessionize_events"].fn(spark, sf_oracle).select(
        "user_id", "session_id", "session_start"
    )
    joined = b.join(sess_start, ["user_id", "session_id"])
    want = {
        (r.user_id, r.session_start, r.n_events, r.seq) for r in joined.collect()
    }
    assert got == want


def test_incremental_catchup(spark, sf_oracle, landed_events, tmp_path):
    """availableNow with a persistent checkpoint: a second run over the same
    files processes nothing new (exactly-once file tracking)."""
    ckpt = str(tmp_path / "ckpt_inc")
    stream = stream_events_from_files(spark, landed_events)
    counted = stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
    run_available_now(counted, ckpt, "inc_out", output_mode="complete")
    n_first = spark.table("inc_out").collect()[0]["n"]
    assert n_first == catalog.table(spark, sf_oracle, "events").count()
    # re-run with same checkpoint: no new files -> count unchanged
    stream2 = stream_events_from_files(spark, landed_events)
    counted2 = stream2.groupBy().agg(F.count(F.lit(1)).alias("n"))
    run_available_now(counted2, ckpt, "inc_out2", output_mode="complete")
    rows = spark.table("inc_out2").collect()
    assert rows == [] or rows[0]["n"] == n_first


def test_stateful_first_seen_matches_batch(spark, sf_oracle, landed_events, tmp_path):
    """applyInPandasWithState first-seen dedup == batch row_number-first
    per (user, event_type)."""
    from pyspark.sql import Window

    from spacex_data_pipeline_spark.streaming.stateful import first_seen_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        first_seen_stream(stream),
        str(tmp_path / "ckpt_fs"),
        "first_seen_out",
        output_mode="append",
    )
    got = {
        (r.user_id, r.event_type, r.first_ts, r.event_id)
        for r in spark.table("first_seen_out").collect()
    }
    batch = catalog.table(spark, sf_oracle, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    want = {
        (r.user_id, r.event_type, r.ts, r.event_id)
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == want


def test_stream_dedup_across_redelivered_files(spark, sf_oracle, tmp_path):
    """Re-delivering the same events in a second file (the reference's
    append-duplication failure mode, streamed) yields each event_id exactly
    once through dropDuplicates state."""
    import os

    from spacex_data_pipeline_spark.streaming.dedup import dedup_stream_exact
    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )

    landed = str(tmp_path / "dup_events")
    os.makedirs(landed)
    ev = catalog.table(spark, sf_oracle, "events").limit(2000)
    ev.coalesce(1).write.mode("append").parquet(landed)      # delivery 1
    ev.coalesce(1).write.mode("append").parquet(landed)      # re-delivery

    out = str(tmp_path / "dedup_out")
    stream = stream_events_from_files(spark, landed)
    run_available_now_to_parquet(
        dedup_stream_exact(stream), str(tmp_path / "ck_dd"), out
    )
    got = spark.read.parquet(out)
    assert got.count() == 2000
    assert got.select("event_id").distinct().count() == 2000


def test_stream_upsert_applies_corrections_not_duplicates(spark, sf_oracle, tmp_path):
    """The CDC-apply sink: a correction file re-sending known event_ids
    with NEW values must REPLACE those rows (append would duplicate
    them); unrelated rows survive; a later incremental run with the same
    checkpoint processes only newly-arrived files and upserts them too."""
    import os

    from spacex_data_pipeline_spark.streaming.ingest import run_available_now_upsert

    landed = str(tmp_path / "cdc_events")
    os.makedirs(landed)
    ev = catalog.table(spark, sf_oracle, "events").limit(1000)
    ev.coalesce(1).write.mode("append").parquet(landed)  # initial load
    # correction: 50 known ids re-sent with value bumped by 1000
    corrections = (
        ev.filter(F.col("event_id") < 50)
        .withColumn("value", F.col("value") + 1000.0)
    )
    corrections.coalesce(1).write.mode("append").parquet(landed)

    out, ck = str(tmp_path / "cdc_out"), str(tmp_path / "ck_cdc")
    stream = stream_events_from_files(spark, landed, max_files_per_trigger=1)
    run_available_now_upsert(stream, ck, out, key="event_id")

    got = spark.read.parquet(out)
    assert got.count() == 1000  # replaced, not appended
    assert got.select("event_id").distinct().count() == 1000
    base = {r.event_id: r.value for r in ev.collect()}
    for r in got.filter(F.col("event_id") < 50).collect():
        assert r.value == pytest.approx(base[r.event_id] + 1000.0)
    # restart with the same checkpoint: only the NEW file is processed
    late = (
        ev.filter(F.col("event_id").isin([0, 1]))
        .withColumn("value", F.lit(-1.0))
    )
    late.coalesce(1).write.mode("append").parquet(landed)
    run_available_now_upsert(
        stream_events_from_files(spark, landed, max_files_per_trigger=1),
        ck, out, key="event_id",
    )
    got2 = spark.read.parquet(out)
    assert got2.count() == 1000
    assert {
        r.value for r in got2.filter(F.col("event_id").isin([0, 1])).collect()
    } == {-1.0}


def test_stream_static_enrichment_matches_batch(spark, sf_oracle, landed_events, tmp_path):
    """Stream-static join: every micro-batch enriches against the static
    dimension with zero join state; replay equals the batch join."""
    from spacex_data_pipeline_spark.streaming.joins import enrich_stream_with_dim

    ev = catalog.table(spark, sf_oracle, "events")
    # a static 'user dimension': per-user lifetime event count
    dim = ev.groupBy("user_id").count().withColumnRenamed("count", "n_events")

    stream = stream_events_from_files(spark, landed_events)
    enriched = enrich_stream_with_dim(
        stream.select("event_id", "user_id"), dim
    )
    run_available_now(
        enriched, str(tmp_path / "ck"), "enriched_out"
    )
    got = {
        (r.event_id, r.user_id, r.n_events)
        for r in spark.table("enriched_out").collect()
    }
    want = {
        (r.event_id, r.user_id, r.n_events)
        for r in enrich_stream_with_dim(
            ev.select("event_id", "user_id"), dim
        ).collect()
    }
    assert got == want and len(got) == ev.count()


def test_streaming_training_filter_matches_batch(spark, sf_oracle, tmp_path):
    """The stateless streaming quality+decontamination filter replays to
    exactly the batch result, and its contamination flags agree with the
    batch anti-join operator (dedup.contamination_flags)."""
    from spacex_data_pipeline_spark.operators.dedup import contamination_flags
    from spacex_data_pipeline_spark.streaming.filters import (
        pack_benchmark_shingles,
        training_filter_stream,
    )

    docs = catalog.table(spark, sf_oracle, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    packed = pack_benchmark_shingles(bench, k=5)

    land = str(tmp_path / "docs")
    train.write.mode("overwrite").parquet(land)
    stream = (
        spark.readStream.schema(train.schema).format("parquet").load(land)
    )
    out = training_filter_stream(stream, packed, min_quality=0.5, k=5)
    assert out.isStreaming
    run_available_now(out, str(tmp_path / "ck"), "filtered_out")

    got = {
        r.doc_id: (r.quality, r.contaminated, r.keep)
        for r in spark.table("filtered_out").collect()
    }
    want = {
        r.doc_id: (r.quality, r.contaminated, r.keep)
        for r in training_filter_stream(train, packed, min_quality=0.5, k=5).collect()
    }
    assert got == want and len(got) == train.count()

    # flags agree with the batch anti-join formulation
    join_flags = {
        r.doc_id: r.contaminated
        for r in contamination_flags(train, bench, k=5).collect()
    }
    overlap_flags = {d: c for d, (_, c, _) in got.items()}
    assert overlap_flags == join_flags
    assert any(join_flags.values())  # fixture plants real overlaps


def test_stream_dedup_within_watermark_bounds_state(spark, sf_oracle, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving inside the
    watermark window are suppressed exactly like the unbounded variant —
    but with O(keys-per-window) state, the only shape that survives an
    unbounded stream. Re-delivered batch = every event still exactly
    once."""
    import os

    from spacex_data_pipeline_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )
    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )

    landed = str(tmp_path / "wm_events")
    os.makedirs(landed)
    ev = catalog.table(spark, sf_oracle, "events").limit(1000)
    ev.coalesce(1).write.mode("append").parquet(landed)  # delivery 1
    ev.coalesce(1).write.mode("append").parquet(landed)  # re-delivery

    out = str(tmp_path / "wm_out")
    stream = stream_events_from_files(spark, landed)
    run_available_now_to_parquet(
        dedup_stream_within_watermark(stream, watermark="4 hours"),
        str(tmp_path / "ck_wm"),
        out,
    )
    got = spark.read.parquet(out)
    assert got.count() == 1000
    assert got.select("event_id").distinct().count() == 1000


def test_transform_with_state_running_totals_match_batch(spark, sf_oracle, tmp_path):
    """transformWithStateInPandas (the Spark-4 stateful API): after the
    stream drains, each user's LAST emitted running total equals the
    batch aggregate — exact-integer outputs, no float-order caveats.

    Skips where google.protobuf is absent (the TWS worker protocol
    needs it; this container has no protobuf and installs are out of
    bounds) — the applyInPandasWithState twin above runs everywhere."""
    pytest.importorskip("google.protobuf")
    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )
    from spacex_data_pipeline_spark.streaming.stateful import running_totals_stream

    landed = str(tmp_path / "rt_events")
    ev = catalog.table(spark, sf_oracle, "events").limit(3000)
    ev.coalesce(1).write.mode("append").parquet(landed)

    out = str(tmp_path / "rt_out")
    stream = stream_events_from_files(spark, landed)
    run_available_now_to_parquet(
        running_totals_stream(stream), str(tmp_path / "ck_rt"), out
    )
    got = spark.read.parquet(out)
    # one emission per (user, batch); keep the final state per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, want.collect()))


def test_stream_line_dedup_matches_batch_kept_set(spark, sf_oracle, tmp_path):
    """Streaming line dedup emits exactly one copy of each distinct
    non-blank normalized line plus every blank line — same kept-line SET
    as the batch form (survivor identity may differ: the stream keeps
    arrival order, batch keeps min (id, line_no)) — and re-delivering
    the same documents adds nothing."""
    import os

    from pyspark.sql import functions as F

    from spacex_data_pipeline_spark.operators.dedup import line_dedup_flags
    from spacex_data_pipeline_spark.streaming.dedup import (
        dedup_stream_exact,
        dedup_stream_lines,
    )
    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )

    docs = spark.createDataFrame(
        [
            (1, "Home\nunique alpha\n\nfooter text"),
            (2, "home\nunique beta\n\nFooter   Text\nunique beta"),
            (3, "Home\n\nunique gamma"),
        ],
        "doc_id long, text string",
    )
    landed = str(tmp_path / "line_docs")
    os.makedirs(landed)
    docs.coalesce(1).write.mode("append").parquet(landed)  # delivery 1
    docs.coalesce(1).write.mode("append").parquet(landed)  # re-delivery

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .format("parquet")
        .load(landed)
    )
    out = str(tmp_path / "line_out")
    # production composition: doc-level dedup first (kills re-delivery),
    # THEN line dedup — blank lines pass the line stage per document, so
    # without the doc stage a re-delivered doc re-emits its blanks
    run_available_now_to_parquet(
        dedup_stream_lines(dedup_stream_exact(stream, ["doc_id"])),
        str(tmp_path / "ck_lines"),
        out,
    )
    got = spark.read.parquet(out)
    norm = F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " "))
    batch = line_dedup_flags(docs).filter("keep")
    # same number of kept lines as ONE batch pass (re-delivery added none)
    assert got.count() == batch.count()
    # identical kept normalized-line multisets
    assert sorted(
        r.n for r in got.select(norm.alias("n")).collect()
    ) == sorted(r.n for r in batch.select(norm.alias("n")).collect())
    # every distinct non-blank line exactly once; blanks all survive
    nb = got.filter(norm != "")
    assert nb.count() == nb.select(norm.alias("n")).distinct().count()
    assert got.filter(norm == "").count() == 3


def test_streaming_typicality_matches_batch(spark, sf_oracle, tmp_path):
    """The frozen-model streaming typicality scorer replays the batch
    operator bit-for-bit on the training corpus itself (integer-fold
    numerator — order-free; same final two IEEE ops), and scores a
    fully-novel doc 0.0 (every trigram unseen) and a sub-3-char doc
    NULL."""
    from spacex_data_pipeline_spark.operators.text import trigram_typicality
    from spacex_data_pipeline_spark.streaming.filters import (
        pack_trigram_model,
        typicality_stream,
    )

    docs = catalog.table(spark, sf_oracle, "documents")
    packed = pack_trigram_model(docs)

    land = str(tmp_path / "docs_typ")
    docs.select("doc_id", "text").write.mode("overwrite").parquet(land)
    stream = spark.readStream.schema("doc_id long, text string").format(
        "parquet"
    ).load(land)
    out = typicality_stream(stream, packed)
    assert out.isStreaming
    run_available_now(out, str(tmp_path / "ck_typ"), "typ_out")

    got = {
        r.doc_id: (r.n_trigrams, r.typicality)
        for r in spark.table("typ_out").collect()
    }
    want = {
        r.doc_id: (r.n_trigrams, r.typicality)
        for r in trigram_typicality(docs).collect()
    }
    assert got == want and len(got) == docs.count()

    novel = spark.createDataFrame(
        [(9001, "zzqxj"), (9002, "ab")], "doc_id long, text string"
    )
    extra = {r.doc_id: r for r in typicality_stream(novel, packed).collect()}
    assert extra[9001].typicality == 0.0 and extra[9001].n_trigrams == 3
    assert extra[9002].typicality is None and extra[9002].n_trigrams == 0


def test_stream_heavy_hitter_counts_match_batch(spark, sf_oracle, landed_events, tmp_path):
    """The streaming key-frequency state equals the batch groupBy count
    after a full replay — so a consumer ranking the state table sees
    exactly checks.heavy_hitters' answer."""
    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now,
        stream_events_from_files,
    )
    from spacex_data_pipeline_spark.streaming.rollup import heavy_hitters_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        heavy_hitters_stream(stream),
        str(tmp_path / "ckpt_hh"),
        "hh_out",
        output_mode="complete",
    )
    got = {(r.user_id): r.freq for r in spark.table("hh_out").collect()}
    batch = catalog.table(spark, sf_oracle, "events")
    want = {
        r.user_id: r.freq
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("freq")).collect()
    }
    assert got == want


def test_stream_cms_cells_match_batch_grid(spark, sf_oracle, landed_events, tmp_path):
    """A replay of the stream populates exactly the batch sketch's
    per-day cell grid — so estimates served from streamed cells equal
    estimates served from a batch backfill, the property that lets the
    two paths share one store."""
    from spacex_data_pipeline_spark.functions.hashing import cms_bucket
    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now,
        stream_events_from_files,
    )
    from spacex_data_pipeline_spark.streaming.rollup import cms_cells_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        cms_cells_stream(stream),
        str(tmp_path / "ckpt_cms"),
        "cms_out",
        output_mode="complete",
    )
    got = {
        (str(r.day), r.seed, r.bucket): r.n for r in spark.table("cms_out").collect()
    }
    ev = catalog.table(spark, sf_oracle, "events")
    seeds = F.array(*[F.lit(i) for i in range(3)])
    want = {
        (str(r.day), r.seed, r.bucket): r.n
        for r in ev.select(
            F.to_date("ts").alias("day"), F.explode(seeds).alias("seed"), "user_id"
        )
        .groupBy(
            "day", "seed", cms_bucket(F.col("seed"), F.col("user_id"), 64).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 100


def test_streaming_model_gate_matches_batch(spark, sf_oracle, tmp_path):
    """The stateless per-row model gate replays the batch model_scores
    decisions EXACTLY on arrival: offline-fit weights packed into one
    broadcast row, scores folded per document token — integer addition
    is associative, so stream == batch bit-for-bit; docs with no tokens
    score (0, 0) and are dropped by the gate the same way the batch
    filter drops them (no positive score)."""
    from spacex_data_pipeline_spark.operators.text import model_scores, model_weights
    from spacex_data_pipeline_spark.streaming.filters import (
        model_gate_stream,
        pack_model_weights,
    )
    from spacex_data_pipeline_spark.streaming.ingest import run_available_now

    docs = catalog.table(spark, sf_oracle, "documents")
    packed = pack_model_weights(model_weights(docs, "src0"))

    land = str(tmp_path / "docs_gate")
    docs.select("doc_id", "text").write.mode("overwrite").parquet(land)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .format("parquet")
        .load(land)
    )
    out = model_gate_stream(stream, packed)
    assert out.isStreaming
    run_available_now(out, str(tmp_path / "ck_gate"), "gate_out")

    got = {
        r.doc_id: (r.s_cls, r.s_dsir, r.keep) for r in spark.table("gate_out").collect()
    }
    want = {
        r.doc_id: (r.s_cls, r.s_dsir)
        for r in model_scores(docs, "src0").collect()
    }
    assert len(got) == docs.count()
    for did, (s_cls, s_dsir) in want.items():
        g = got[did]
        assert (g[0], g[1]) == (s_cls, s_dsir)
        assert g[2] == (s_cls > 0 and s_dsir > 0)


def test_stream_ab_conversion_matches_batch_and_replay_adds_nothing(
    spark, sf_oracle, landed_events, tmp_path
):
    """The streaming per-arm converted-user counters equal the batch
    ab_test sufficient statistics after a replay in which EVERY file is
    delivered twice (the at-least-once shape) — the user-keyed dedup
    absorbs duplicate deliveries, so counts match one batch pass."""
    import os

    from spacex_data_pipeline_spark.operators.sampling import hash_bucket
    from spacex_data_pipeline_spark.streaming.rollup import ab_conversion_stream

    # land every event file TWICE — the at-least-once re-delivery shape
    doubled = str(tmp_path / "events_doubled")
    os.makedirs(doubled)
    ev = catalog.table(spark, sf_oracle, "events")
    ev.coalesce(2).write.mode("append").parquet(doubled)
    ev.coalesce(2).write.mode("append").parquet(doubled)

    stream = stream_events_from_files(spark, doubled)
    run_available_now(
        ab_conversion_stream(stream),
        str(tmp_path / "ckpt_ab"),
        "ab_out",
        output_mode="complete",
    )
    got = {r.arm: r.converted_users for r in spark.table("ab_out").collect()}
    batch = catalog.table(spark, sf_oracle, "events")
    want = {
        r.arm: r.converted_users
        for r in batch.filter(F.col("event_type") == "purchase")
        .select(hash_bucket(F.col("user_id"), "ab", 2).alias("arm"), "user_id")
        .groupBy("arm")
        .agg(F.countDistinct("user_id").alias("converted_users"))
        .collect()
    }
    assert got == want


def test_stream_ohlc_matches_batch_entry(spark, sf_oracle, landed_events, tmp_path):
    """Streaming daily OHLC bars == the oracle-checked batch entry
    (stream → batch → DuckDB loop): open/close via min_by/max_by on the
    (ts, event_id) struct must pick the same ticks incrementally that
    the batch aggregate picks in one pass."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.rollup import ohlc_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        ohlc_stream(stream),
        str(tmp_path / "ckpt_ohlc"),
        "ohlc_out",
        output_mode="complete",
    )
    got = {
        (r.day, r.event_type): (r.open, r.high, r.low, r.close, r.n_events)
        for r in spark.table("ohlc_out").collect()
    }
    want = {
        (r.day, r.event_type): (r.open, r.high, r.low, r.close, r.n_events)
        for r in REGISTRY["ohlc_daily_events"].fn(spark, sf_oracle).collect()
    }
    assert got == want


def test_stream_bitmap_distinct_matches_batch_entry(spark, sf_oracle, landed_events, tmp_path):
    """Streaming exact-distinct via bitmap words == the oracle-checked
    batch entry: OR-ing word masks across microbatches must lose no
    member, and the popcount rollup of the streamed word table equals
    the batch per-day distinct count exactly."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.rollup import bitmap_distinct_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        bitmap_distinct_stream(stream),
        str(tmp_path / "ckpt_bitmap"),
        "bitmap_out",
        output_mode="complete",
    )
    got = {
        r.day: (r.distinct, r.n)
        for r in spark.table("bitmap_out")
        .groupBy("day")
        .agg(
            F.sum(F.bit_count("__bm")).cast("long").alias("distinct"),
            F.sum("__n").cast("long").alias("n"),
        )
        .collect()
    }
    want = {
        r.day: (r.distinct_users_bitmap, r.n_events)
        for r in REGISTRY["bitmap_distinct_users_daily"].fn(spark, sf_oracle).collect()
    }
    assert got == want


def test_stream_locf_matches_batch_inside_user_spans(spark, sf_oracle, landed_events, tmp_path):
    """Stateful streaming LOCF == the oracle-checked batch entry inside
    each user's [first, last] observation span (the part of the batch
    grid a stream can know: no corpus bounds, so no leading 'missing'
    rows and no tail-carry past the user's latest reading)."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.stateful import locf_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        locf_stream(stream),
        str(tmp_path / "ckpt_locf"),
        "locf_out",
        output_mode="append",
    )
    got = {
        (r.user_id, r.day, r.close_locf, r.fill_status)
        for r in spark.table("locf_out").collect()
    }
    batch = REGISTRY["resample_user_daily_locf"].fn(spark, sf_oracle)
    spans = (
        catalog.table(spark, sf_oracle, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("d0"),
            F.max(F.to_date("ts")).alias("d1"),
        )
    )
    want = {
        (r.user_id, r.day, r.close_locf, r.fill_status)
        for r in batch.join(spans, "user_id")
        .filter(F.col("day").between(F.col("d0"), F.col("d1")))
        .collect()
    }
    assert got == want
    assert any(s == "carried" for _, _, _, s in got)  # gaps actually filled


def test_stream_locf_carries_state_across_restarts(spark, tmp_path):
    """The LOCF frontier survives a stop/restart: a second availableNow
    drain over newly-landed later days fills the gap from the FIRST
    run's last close — state round-trips through the checkpoint."""
    import datetime as dt
    import os

    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )
    from spacex_data_pipeline_spark.streaming.stateful import locf_stream

    landed = str(tmp_path / "locf_events")
    os.makedirs(landed)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, d, h), 1, "m", float(v), "{}")
                for i, (d, h, v) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    out = str(tmp_path / "locf_out_pq")
    ck = str(tmp_path / "ck_locf")
    # run 1: days 1 and 2 (two readings on day 1 — close is the later)
    mk([(1, 9, 10.0), (1, 17, 11.5), (2, 9, 12.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(landed)
    run_available_now_to_parquet(
        locf_stream(stream_events_from_files(spark, landed)), ck, out
    )
    # run 2: day 5 lands later — days 3, 4 must carry 12.0
    mk([(5, 9, 20.0)]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now_to_parquet(
        locf_stream(stream_events_from_files(spark, landed)), ck, out
    )
    got = sorted(
        (r.day, r.close_locf, r.fill_status)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (dt.date(2024, 1, 1), 11.5, "observed"),
        (dt.date(2024, 1, 2), 12.0, "observed"),
        (dt.date(2024, 1, 3), 12.0, "carried"),
        (dt.date(2024, 1, 4), 12.0, "carried"),
        (dt.date(2024, 1, 5), 20.0, "observed"),
    ]


class _StubGroupState:
    """Minimal GroupState double for driving _locf_fold directly —
    the exists/get/update surface the fold actually touches."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _locf_chunk(rows):
    """rows: list of (event_id, 'YYYY-MM-DD HH', value)."""
    import pandas as pd

    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(f"{r[1]}:00:00") for r in rows],
            "user_id": [7] * len(rows),
            "value": [r[2] for r in rows],
        }
    )


def test_locf_fold_is_chunk_order_insensitive():
    """A group's micro-batch arrives as multiple Arrow chunks in no
    guaranteed order (e.g. an availableNow backfill drain past
    maxRecordsPerBatch). The fold must materialize and sort the WHOLE
    batch first: a later chunk holding earlier days must neither be
    dropped by the frontier check nor fill gaps with the wrong close."""
    from spacex_data_pipeline_spark.streaming.stateful import _make_locf_fold
    _locf_fold = _make_locf_fold()

    state = _StubGroupState()
    # chunk 1 holds day 5, chunk 2 holds days 1-2 — reversed delivery
    chunks = [
        _locf_chunk([(3, "2024-01-05 09", 20.0)]),
        _locf_chunk([(1, "2024-01-01 09", 10.0), (2, "2024-01-02 09", 12.5)]),
    ]
    (out,) = list(_locf_fold((7,), iter(chunks), state))
    got = [
        (str(r.day), r.close_locf, r.fill_status)
        for r in out.itertuples(index=False)
    ]
    assert got == [
        ("2024-01-01", 10.0, "observed"),
        ("2024-01-02", 12.5, "observed"),
        ("2024-01-03", 12.5, "carried"),
        ("2024-01-04", 12.5, "carried"),
        ("2024-01-05", 20.0, "observed"),
    ]
    import datetime as dt

    assert state.get == ((dt.date(2024, 1, 5) - dt.date(1970, 1, 1)).days, 2000)


def test_locf_fold_same_day_later_trigger_advances_state():
    """An open day straddling two triggers: the second trigger's same-day
    reading can't amend the already-emitted row (append mode), but it
    MUST advance the carried close in state so subsequent carried days
    use the day's true close."""
    from spacex_data_pipeline_spark.streaming.stateful import _make_locf_fold
    _locf_fold = _make_locf_fold()

    state = _StubGroupState()
    # trigger 1: day 1 closes at 10.0 (emitted)
    (o1,) = list(_locf_fold((7,), iter([_locf_chunk([(1, "2024-01-01 09", 10.0)])]), state))
    assert [(str(r.day), r.close_locf) for r in o1.itertuples(index=False)] == [
        ("2024-01-01", 10.0)
    ]
    # trigger 2: a later same-day reading — no new row, but state advances
    (o2,) = list(_locf_fold((7,), iter([_locf_chunk([(2, "2024-01-01 17", 11.0)])]), state))
    assert len(o2) == 0
    assert state.get[1] == 1100
    # trigger 3: day 3 lands — the gap day 2 carries the TRUE close 11.0
    (o3,) = list(_locf_fold((7,), iter([_locf_chunk([(3, "2024-01-03 09", 20.0)])]), state))
    assert [
        (str(r.day), r.close_locf, r.fill_status)
        for r in o3.itertuples(index=False)
    ] == [("2024-01-02", 11.0, "carried"), ("2024-01-03", 20.0, "observed")]


def test_retention_from_streamed_bitmap_store_matches_batch_entry(
    spark, sf_oracle, landed_events, tmp_path
):
    """The bitmap words a STREAM accumulates are the same mergeable store
    the batch set-algebra entries consume: computing the lag retention
    curve from the streamed (day, word, bitmap) table reproduces the
    oracle-checked bitmap_retention_lag_curve rows exactly — i.e. the
    store really is merge-any-range, not a batch-only artifact."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.rollup import bitmap_distinct_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        bitmap_distinct_stream(stream),
        str(tmp_path / "ckpt_bm_ret"),
        "bm_ret_words",
        output_mode="complete",
    )
    w = spark.table("bm_ret_words").select("day", "word", F.col("__bm").alias("bm"))
    base = w.groupBy("day").agg(F.sum(F.bit_count("bm")).cast("long").alias("active"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    dmax = w.agg(F.max("day").alias("dmax"))
    a = w.select(
        F.col("day").alias("a_day"),
        F.col("word").alias("a_word"),
        F.col("bm").alias("a_bm"),
    )
    c = w.select(
        F.col("day").alias("c_day"),
        F.col("word").alias("c_word"),
        F.col("bm").alias("c_bm"),
    )
    ret = (
        a.crossJoin(F.broadcast(lags))
        .join(
            c,
            (F.col("a_word") == F.col("c_word"))
            & (F.col("c_day") == F.date_add(F.col("a_day"), F.col("lag"))),
        )
        .groupBy(F.col("lag").alias("r_lag"), "a_day")
        .agg(
            F.sum(F.bit_count(F.col("a_bm").bitwiseAND(F.col("c_bm"))))
            .cast("long")
            .alias("retained")
        )
    )
    got = {
        (r.lag, r.base_active, r.retained)
        for r in base.crossJoin(F.broadcast(lags))
        .crossJoin(F.broadcast(dmax))
        .filter(F.date_add(F.col("day"), F.col("lag")) <= F.col("dmax"))
        .join(
            ret,
            (F.col("lag") == F.col("r_lag")) & (F.col("day") == F.col("a_day")),
            "left",
        )
        .select(
            "lag",
            "active",
            F.coalesce("retained", F.lit(0).cast("long")).alias("retained"),
        )
        .groupBy(F.col("lag").cast("long").alias("lag"))
        .agg(
            F.sum("active").cast("long").alias("base_active"),
            F.sum("retained").cast("long").alias("retained"),
        )
        .collect()
    }
    want = {
        (r.lag, r.base_active, r.retained)
        for r in REGISTRY["bitmap_retention_lag_curve"].fn(spark, sf_oracle).collect()
    }
    assert got == want


def test_stream_attribution_matches_batch_entry(spark, sf_oracle, landed_events, tmp_path):
    """Stateful streaming last-touch attribution == the oracle-checked
    batch entry: folding the streamed per-purchase rows with the batch
    entry's own aggregate expressions reproduces its per-type totals
    exactly (count, exact revenue cents, and the IEEE-identical mean
    latency)."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.stateful import attribution_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        attribution_stream(stream),
        str(tmp_path / "ckpt_attr"),
        "attr_out",
        output_mode="append",
    )
    got = {
        (r.attributed_type, r.n_purchases, r.revenue_cents, r.mean_latency_sec)
        for r in spark.table("attr_out")
        .groupBy("attributed_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("val_cents").cast("long").alias("revenue_cents"),
            (
                F.sum("lat_us").cast("double")
                / F.nullif(F.count("lat_us"), F.lit(0)).cast("double")
                / F.lit(1000000.0)
            ).alias("mean_latency_sec"),
        )
        .collect()
    }
    want = {
        (r.attributed_type, r.n_purchases, r.revenue_cents, r.mean_latency_sec)
        for r in REGISTRY["attribution_last_touch"].fn(spark, sf_oracle).collect()
    }
    assert got == want
    assert len(want) >= 2  # at least direct + one touch type exercised


def test_stream_attribution_carries_state_across_restarts(spark, tmp_path):
    """The latest-touch state survives a stop/restart: purchases landing
    in a SECOND availableNow drain attribute against the FIRST run's
    touch (inside the lookback) and fall back to 'direct' outside it."""
    import datetime as dt
    import os

    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )
    from spacex_data_pipeline_spark.streaming.stateful import attribution_stream

    landed = str(tmp_path / "attr_events")
    os.makedirs(landed)

    def mk(rows):
        return spark.createDataFrame(
            [
                (eid, dt.datetime(2024, 1, 1, h, m), 1, typ, float(v), "{}")
                for eid, (h, m, typ, v) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    out = str(tmp_path / "attr_out_pq")
    ck = str(tmp_path / "ck_attr")
    # run 1: a view at 09:00, purchase at 09:30 -> attributed to the view
    mk([(9, 0, "view", 0.0), (9, 30, "purchase", 10.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(landed)
    run_available_now_to_parquet(
        attribution_stream(stream_events_from_files(spark, landed)), ck, out
    )
    # run 2: purchase at 09:55 (inside 1h of the run-1 view -> view),
    # then a click at 10:05 and purchase at 10:20 -> click
    mk(
        [(9, 55, "purchase", 20.0), (10, 5, "click", 0.0), (10, 20, "purchase", 30.0)]
    ).coalesce(1).write.mode("append").parquet(landed)
    run_available_now_to_parquet(
        attribution_stream(stream_events_from_files(spark, landed)), ck, out
    )
    got = sorted(
        (r.ts, r.attributed_type, r.lat_us, r.val_cents)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (dt.datetime(2024, 1, 1, 9, 30), "view", 30 * 60 * 1_000_000, 1000),
        (dt.datetime(2024, 1, 1, 9, 55), "view", 55 * 60 * 1_000_000, 2000),
        (dt.datetime(2024, 1, 1, 10, 20), "click", 15 * 60 * 1_000_000, 3000),
    ]


def _attr_chunk(rows):
    """rows: list of (event_id, 'HH:MM', event_type, value)."""
    import pandas as pd

    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(f"2024-01-01 {r[1]}:00") for r in rows],
            "user_id": [7] * len(rows),
            "event_type": [r[2] for r in rows],
            "value": [r[3] for r in rows],
        }
    )


def test_attribution_fold_chunk_order_and_asof_guards():
    """Unit contracts on the fold itself: (a) multi-chunk micro-batches
    are materialized and sorted before folding, so a later chunk
    holding the EARLIER touch still attributes the purchase; (b) a
    same-timestamp touch sorts before the purchase (the batch window's
    side order); (c) a purchase arriving behind a NEWER stored touch
    attributes 'direct', never to a future touch."""
    from spacex_data_pipeline_spark.streaming.stateful import (
        _make_attribution_fold,
    )

    fold = _make_attribution_fold(3600 * 1_000_000)
    state = _StubGroupState()
    # (a)+(b): purchase chunk delivered first, its touches second
    chunks = [
        _attr_chunk([(3, "09:30", "purchase", 10.0)]),
        _attr_chunk([(1, "09:00", "view", 0.0), (2, "09:30", "click", 0.0)]),
    ]
    (out,) = list(fold((7,), iter(chunks), state))
    assert [(r.attributed_type, r.lat_us) for r in out.itertuples(index=False)] == [
        ("click", 0)
    ]
    # (c): a purchase OLDER than the stored click must not credit it
    (out2,) = list(fold((7,), iter([_attr_chunk([(0, "09:10", "purchase", 5.0)])]), state))
    assert [(r.attributed_type, r.lat_us is None) for r in out2.itertuples(index=False)] == [
        ("direct", True)
    ]
    # and a stale touch never regresses state (idempotent replays)
    (out3,) = list(fold((7,), iter([_attr_chunk([(1, "09:00", "view", 0.0)])]), state))
    assert len(out3) == 0
    assert state.get[2] == "click"


def test_stream_funnel_matches_batch_entry(spark, sf_oracle, landed_events, tmp_path):
    """Stateful streaming funnel attribution == the oracle-checked batch
    entry: folding the streamed per-pair (stage, lat) rows through the
    batch entry's own integer-exact rank math reproduces its per-stage
    (n_pairs, P50, P90) rows exactly."""
    import collections

    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.stateful import funnel_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        funnel_stream(stream),
        str(tmp_path / "ckpt_funnel"),
        "funnel_out",
        output_mode="append",
    )
    by_stage = collections.defaultdict(list)
    for r in spark.table("funnel_out").collect():
        by_stage[r.stage].append(r.lat)
    got = {}
    for stage, lats in by_stage.items():
        lats.sort()
        n = len(lats)
        p50 = lats[max(1, (50 * n + 99) // 100) - 1]
        p90 = lats[max(1, (90 * n + 99) // 100) - 1]
        got[stage] = (n, p50, p90)
    want = {
        r.stage: (r.n_pairs, r.p50_s, r.p90_s)
        for r in REGISTRY["funnel_stage_latency_quantiles"]
        .fn(spark, sf_oracle)
        .collect()
    }
    assert got == want
    assert set(got) == {"view_to_click", "click_to_purchase"}


def test_funnel_fold_inclusive_ties_and_state():
    """Unit contracts: (a) chunk-order insensitivity (later chunk holds
    the earlier view); (b) same-timestamp events resolve in funnel
    order (view ≤ click ≤ purchase — the batch join's inclusive
    bound), so a simultaneous view+click+purchase chain emits two
    zero-latency pairs; (c) a click with no prior view emits nothing
    but still arms the purchase stage."""
    from spacex_data_pipeline_spark.streaming.stateful import _make_funnel_fold

    fold = _make_funnel_fold()
    state = _StubGroupState()
    chunks = [
        _attr_chunk([(5, "09:30", "click", 0.0)]),
        _attr_chunk([(1, "09:00", "view", 0.0)]),
    ]
    (out,) = list(fold((7,), iter(chunks), state))
    assert [(r.stage, r.lat) for r in out.itertuples(index=False)] == [
        ("view_to_click", 1800)
    ]
    # (b) simultaneous chain at 10:00 — ties resolve view<click<purchase
    chain = _attr_chunk(
        [(8, "10:00", "purchase", 1.0), (7, "10:00", "click", 0.0), (6, "10:00", "view", 0.0)]
    )
    (out2,) = list(fold((7,), iter([chain]), state))
    assert [(r.stage, r.lat) for r in out2.itertuples(index=False)] == [
        ("view_to_click", 0),
        ("click_to_purchase", 0),
    ]
    # (c) fresh user: click-without-view emits nothing, arms purchase
    s2 = _StubGroupState()
    (o3,) = list(fold((9,), iter([_attr_chunk([(1, "09:00", "click", 0.0)])]), s2))
    assert len(o3) == 0
    (o4,) = list(fold((9,), iter([_attr_chunk([(2, "09:20", "purchase", 1.0)])]), s2))
    assert [(r.stage, r.lat) for r in o4.itertuples(index=False)] == [
        ("click_to_purchase", 1200)
    ]


def test_stream_funnel_carries_state_across_restarts(spark, tmp_path):
    """view/click registers survive a stop/restart: a purchase landing in
    a SECOND availableNow drain attributes to the FIRST run's click."""
    import datetime as dt
    import os

    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )
    from spacex_data_pipeline_spark.streaming.stateful import funnel_stream

    landed = str(tmp_path / "funnel_events")
    os.makedirs(landed)

    def mk(rows):
        return spark.createDataFrame(
            [
                (eid, dt.datetime(2024, 1, 1, h, m), 1, typ, 0.0, "{}")
                for eid, (h, m, typ) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    out = str(tmp_path / "funnel_out_pq")
    ck = str(tmp_path / "ck_funnel")
    mk([(9, 0, "view"), (9, 10, "click")]).coalesce(1).write.mode("append").parquet(
        landed
    )
    run_available_now_to_parquet(
        funnel_stream(stream_events_from_files(spark, landed)), ck, out
    )
    mk([(9, 40, "purchase")]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now_to_parquet(
        funnel_stream(stream_events_from_files(spark, landed)), ck, out
    )
    got = sorted(
        (r.stage, r.lat) for r in spark.read.parquet(out).collect()
    )
    assert got == [("click_to_purchase", 30 * 60), ("view_to_click", 10 * 60)]


def test_stream_moments_store_matches_batch_partials(spark, sf_oracle, landed_events, tmp_path):
    """The moments partials a STREAM accumulates are the same mergeable
    store the batch arithmetic consumes: per-day (n, Σcents, Σcents²)
    off the stream equals the batch computation exactly (wide-integer
    Σx² included), and rolling the streamed store to months reproduces
    the batch-derived exact variance numerator n·Σx² − (Σx)² — i.e.
    the store really is merge-any-range on arrival."""
    from spacex_data_pipeline_spark.streaming.rollup import moments_store_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        moments_store_stream(stream),
        str(tmp_path / "ckpt_moments"),
        "moments_out",
        output_mode="complete",
    )
    got = {
        r.day: (r.n, r.s, str(r.ss))
        for r in spark.table("moments_out").collect()
    }
    ev = catalog.table(spark, sf_oracle, "events")
    cents = (F.col("value").cast("decimal(8,2)") * 100).cast("long")
    batch = (
        ev.select(F.to_date("ts").alias("day"), cents.alias("__c"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__c").cast("long").alias("s"),
            F.sum(
                F.col("__c").cast("decimal(19,0)")
                * F.col("__c").cast("decimal(19,0)")
            ).alias("ss"),
        )
    )
    want = {r.day: (r.n, r.s, str(r.ss)) for r in batch.collect()}
    assert got == want
    # merge-any-range: monthly variance numerator from the streamed store
    # == from the batch partials (pure addition + exact wide integers)
    def monthly(df):
        m = df.groupBy(F.trunc("day", "month").alias("month")).agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s").cast("long").alias("s"),
            F.sum("ss").alias("ss"),
        )
        return {
            r.month: str(
                int(r.n) * int(r.ss) - int(r.s) * int(r.s)
            )
            for r in m.collect()
        }

    assert monthly(spark.table("moments_out")) == monthly(batch)


def test_stream_quantile_histogram_matches_batch_store(
    spark, sf_oracle, landed_events, tmp_path
):
    """The fixed-bin histogram cells a STREAM accumulates are the same
    mergeable quantile store the batch arithmetic consumes: per-day
    (day, bin, n) off the stream equals the batch computation exactly
    (pure integer cents DIV bin-width), and rolling the streamed store
    to the full range brackets the EXACT q-quantile of the raw values
    inside each claimed [lo, hi) bin — the store really answers
    any-range quantiles by addition, no rescan."""
    import math

    from spacex_data_pipeline_spark.streaming.rollup import (
        quantile_histogram_stream,
    )

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        quantile_histogram_stream(stream),
        str(tmp_path / "ckpt_qhist"),
        "qhist_out",
        output_mode="complete",
    )
    got = {(r.day, r.bin): r.n for r in spark.table("qhist_out").collect()}
    ev = catalog.table(spark, sf_oracle, "events")
    cents = (F.col("value").cast("decimal(8,2)") * 100).cast("long")
    batch = (
        ev.select(F.to_date("ts").alias("day"), cents.alias("__c"))
        .select("day", F.expr("__c div 1000").alias("bin"))
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    want = {(r.day, r.bin): r.n for r in batch.collect()}
    assert got == want

    # any-range rollup: merged bins -> first bin whose cumulative count
    # reaches ceil(q*N) must bracket the exact q-quantile of raw cents
    merged = sorted(
        (r.bin, r.n)
        for r in spark.table("qhist_out")
        .groupBy("bin")
        .agg(F.sum("n").cast("long").alias("n"))
        .collect()
    )
    all_cents = sorted(
        r.c for r in ev.select(cents.alias("c")).collect()
    )
    n_total = len(all_cents)
    for q in (0.5, 0.9, 0.99):
        rank = math.ceil(q * n_total)
        cum = 0
        for b, n in merged:
            cum += n
            if cum >= rank:
                hit = b
                break
        exact = all_cents[rank - 1]
        assert hit * 1000 <= exact < (hit + 1) * 1000


def test_stream_quantile_histogram_merges_across_restarts(spark, tmp_path):
    """Cells accumulated across TWO availableNow drains (a stop/restart
    with new files in between) merge by addition into exactly the batch
    store over the union — same-day late arrivals inside the watermark
    amend the day's cells rather than forking them."""
    import datetime as dt
    import os

    from spacex_data_pipeline_spark.streaming.rollup import (
        quantile_histogram_stream,
    )

    landed = str(tmp_path / "qhist_events")
    os.makedirs(landed)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, d, h), 1, "view", v, "{}")
                for i, (d, h, v) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    first = [(1, 9, 4.00), (1, 10, 12.50), (1, 11, 12.75)]
    second = [(1, 12, 4.25), (2, 9, 99.99)]  # same-day amend + new day
    mk(first).coalesce(1).write.mode("append").parquet(landed)
    ck = str(tmp_path / "ck_qhist")
    run_available_now(
        quantile_histogram_stream(stream_events_from_files(spark, landed)),
        ck,
        "qhist_restart_out",
        output_mode="complete",
    )
    mk(second).coalesce(1).write.mode("append").parquet(landed)
    run_available_now(
        quantile_histogram_stream(stream_events_from_files(spark, landed)),
        ck,
        "qhist_restart_out",
        output_mode="complete",
    )
    got = sorted(
        (str(r.day), r.bin, r.n)
        for r in spark.table("qhist_restart_out").collect()
    )
    assert got == [
        ("2024-01-01", 0, 2),  # 400 and 425 cents -> bin 0, amended to 2
        ("2024-01-01", 1, 2),  # 1250, 1275 cents -> bin 1
        ("2024-01-02", 9, 1),  # 9999 cents -> bin 9
    ]


def test_stream_hll_registers_match_batch_store(
    spark, sf_oracle, landed_events, tmp_path
):
    """The HLL registers a STREAM accumulates are the same mergeable
    store the batch entry consumes: per-day (reg, max-rho) cells off
    the stream equal the batch computation exactly, and rolling the
    streamed cells through the exact dyadic harmonic sum reproduces
    the oracle-checked entry's per-day AND merged-ALL estimate rows —
    max-merge on arrival really is the batch store."""
    from spacex_data_pipeline_spark.functions.hashing import (
        HLL_REGISTERS,
        HLL_RHO_CAP,
        hll_register,
    )
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.rollup import hll_registers_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        hll_registers_stream(stream),
        str(tmp_path / "ckpt_hll"),
        "hll_out",
        output_mode="complete",
    )
    got = {(r.day, r.reg): r.rho for r in spark.table("hll_out").collect()}
    ev = catalog.table(spark, sf_oracle, "events")
    reg, rho = hll_register(F.col("user_id"))
    batch = (
        ev.select(F.to_date("ts").alias("day"), reg.alias("reg"), rho.alias("rho"))
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    want = {(r.day, r.reg): r.rho for r in batch.collect()}
    assert got == want

    # rolling the streamed store reproduces the registry entry's rows
    def est_rows(cells, keys):
        s = (
            F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - rho)"))
            + (F.lit(HLL_REGISTERS) - F.count(F.lit(1))) * F.lit(1 << HLL_RHO_CAP)
        ).cast("long")
        return cells.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("nonzero_regs"), s.alias("__s")
        )

    daily = {
        (str(r.day), r.nonzero_regs, 4.2399330249068963e20 / float(r["__s"]))
        for r in est_rows(spark.table("hll_out"), ["day"]).collect()
    }
    merged = est_rows(
        spark.table("hll_out").groupBy("reg").agg(F.max("rho").alias("rho")), []
    ).collect()[0]
    daily.add(
        ("ALL", merged.nonzero_regs, 4.2399330249068963e20 / float(merged["__s"]))
    )
    entry = {
        (r.day, r.nonzero_regs, r.est_users)
        for r in REGISTRY["hll_register_store_users"].fn(spark, sf_oracle).collect()
    }
    assert daily == entry


def test_stream_hll_registers_idempotent_across_restarts(spark, tmp_path):
    """Registers are max-monoids: a second availableNow drain that
    RE-DELIVERS an already-counted user changes nothing (idempotent),
    while a genuinely new user max-merges in — the at-least-once
    safety the docstring claims, pinned."""
    import datetime as dt
    import os

    from spacex_data_pipeline_spark.functions.hashing import hll_register
    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now,
        stream_events_from_files,
    )
    from spacex_data_pipeline_spark.streaming.rollup import hll_registers_stream

    landed = str(tmp_path / "hll_events")
    os.makedirs(landed)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1, 9 + i), uid, "view", 0.0, "{}")
                for i, uid in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    ck = str(tmp_path / "ck_hll")
    mk([42, 7]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now(
        hll_registers_stream(stream_events_from_files(spark, landed)),
        ck,
        "hll_restart_out",
        output_mode="complete",
    )
    first = sorted(
        (str(r.day), r.reg, r.rho) for r in spark.table("hll_restart_out").collect()
    )
    # re-deliver user 42, add user 123456789
    mk([42, 123456789]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now(
        hll_registers_stream(stream_events_from_files(spark, landed)),
        ck,
        "hll_restart_out",
        output_mode="complete",
    )
    second = sorted(
        (str(r.day), r.reg, r.rho) for r in spark.table("hll_restart_out").collect()
    )
    want = {}
    for uid in (42, 7, 123456789):
        row = (
            spark.createDataFrame([(uid,)], "user_id long")
            .select(*hll_register(F.col("user_id")))
            .collect()[0]
        )
        key = ("2024-01-01", row[0])
        want[key] = max(want.get(key, 0), row[1])
    assert second == sorted((d, r, v) for (d, r), v in want.items())
    # the re-delivered user contributed nothing new beyond the first drain
    assert set(first) <= set(second)


def test_stream_gap_dispersion_matches_batch_entry(
    spark, sf_oracle, landed_events, tmp_path
):
    """Stateful streaming gap extraction == the oracle-checked batch
    dispersion entry: folding the streamed per-gap rows with the batch
    entry's own exact-integer expressions reproduces its per-type
    (n, Σg, mean milli, dispersion milli) rows exactly."""
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.stateful import gap_dispersion_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        gap_dispersion_stream(stream),
        str(tmp_path / "ckpt_gap"),
        "gap_out",
        output_mode="append",
    )
    folded = (
        spark.table("gap_out")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap_sec").cast("long").alias("sum_gap_sec"),
            F.sum(F.col("gap_sec").cast("decimal(38,0)") * F.col("gap_sec")).alias(
                "sum_gap2"
            ),
        )
        .select(
            "event_type",
            "n_gaps",
            "sum_gap_sec",
            F.expr(
                "CAST((CAST(sum_gap_sec AS DECIMAL(38,0)) * 1000) div n_gaps AS LONG)"
            ).alias("mean_gap_milli"),
            F.expr(
                "CAST(((CAST(n_gaps AS DECIMAL(38,0)) * sum_gap2"
                " - CAST(sum_gap_sec AS DECIMAL(38,0)) * sum_gap_sec) * 1000)"
                " div nullif(CAST(n_gaps AS DECIMAL(38,0)) * sum_gap_sec, 0) AS LONG)"
            ).alias("dispersion_milli"),
        )
    )
    got = {tuple(r) for r in folded.collect()}
    want = {
        tuple(r)
        for r in REGISTRY["interarrival_dispersion_events"].fn(spark, sf_oracle).collect()
    }
    assert got == want and len(want) >= 2


def test_stream_gap_dispersion_state_across_restarts(spark, tmp_path):
    """The last-event register survives a stop/restart: events landing
    in a SECOND availableNow drain emit gaps against the FIRST run's
    last event, and a replayed stale event emits nothing."""
    import datetime as dt
    import os

    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )
    from spacex_data_pipeline_spark.streaming.stateful import gap_dispersion_stream

    landed = str(tmp_path / "gap_events")
    os.makedirs(landed)

    def mk(rows):
        return spark.createDataFrame(
            [
                (eid, dt.datetime(2024, 1, 1, h, m), 1, "view", 0.0, "{}")
                for eid, (h, m) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    out = str(tmp_path / "gap_out_pq")
    ck = str(tmp_path / "ck_gap")
    mk([(9, 0)]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now_to_parquet(
        gap_dispersion_stream(stream_events_from_files(spark, landed)), ck, out
    )
    # run 2: 09:10 and 09:40 -> gaps 600 s (vs run 1's 09:00) and 1800 s
    mk([(9, 10), (9, 40)]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now_to_parquet(
        gap_dispersion_stream(stream_events_from_files(spark, landed)), ck, out
    )
    got = sorted(r.gap_sec for r in spark.read.parquet(out).collect())
    assert got == [600, 1800]


def test_gap_fold_chunk_order_and_replay_guards():
    """Unit contracts on the fold: (a) reversed chunk delivery within a
    micro-batch still folds in (ts, event_id) order; (b) a stale
    replayed event emits nothing and never regresses state."""
    import pandas as pd

    from spacex_data_pipeline_spark.streaming.stateful import _gap_fold

    def chunk(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [pd.Timestamp(f"2024-01-01 {r[1]}:00") for r in rows],
                "user_id": [7] * len(rows),
                "event_type": ["view"] * len(rows),
                "value": [0.0] * len(rows),
            }
        )

    state = _StubGroupState()
    # chunk holding the LATER event delivered first
    chunks = [chunk([(3, "09:40")]), chunk([(1, "09:00"), (2, "09:10")])]
    (out,) = list(_gap_fold((7, "view"), iter(chunks), state))
    assert [int(g) for g in out["gap_sec"]] == [600, 1800]
    # stale replay: event 2 again — skipped, state still at event 3
    (out2,) = list(_gap_fold((7, "view"), iter([chunk([(2, "09:10")])]), state))
    assert len(out2) == 0
    assert state.get[1] == 3


def test_stream_weekly_first_seen_matches_batch_entry(
    spark, sf_oracle, landed_events, tmp_path
):
    """Stateful streaming weekly first-seen == the oracle-checked batch
    growth-accounting entry: folding the streamed (user, week, is_new)
    rows with the batch entry's own expressions reproduces its per-week
    (active, new, returning, new_pct) rows exactly."""
    from spacex_data_pipeline_spark.functions.numeric import pct_rate
    from spacex_data_pipeline_spark.queries import REGISTRY
    from spacex_data_pipeline_spark.streaming.stateful import weekly_first_seen_stream

    stream = stream_events_from_files(spark, landed_events)
    run_available_now(
        weekly_first_seen_stream(stream),
        str(tmp_path / "ckpt_wfs"),
        "wfs_out",
        output_mode="append",
    )
    folded = (
        spark.table("wfs_out")
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.sum(F.col("is_new").cast("int")).cast("long").alias("new_users"),
            F.sum((~F.col("is_new")).cast("int")).cast("long").alias(
                "returning_users"
            ),
            pct_rate(
                F.sum(F.col("is_new").cast("int")).cast("long"),
                F.count(F.lit(1)),
            ).alias("new_pct"),
        )
    )
    got = {tuple(r) for r in folded.collect()}
    want = {
        tuple(r)
        for r in REGISTRY["new_vs_returning_users_weekly"].fn(spark, sf_oracle).collect()
    }
    assert got == want and len(want) >= 3


def test_stream_weekly_first_seen_state_across_restarts(spark, tmp_path):
    """The seen-weeks register survives a stop/restart: a second drain's
    same-week event emits nothing (replay-idempotent), the next week
    emits returning, and a brand-new user emits new."""
    import datetime as dt
    import os

    from spacex_data_pipeline_spark.streaming.ingest import (
        run_available_now_to_parquet,
    )
    from spacex_data_pipeline_spark.streaming.stateful import weekly_first_seen_stream

    landed = str(tmp_path / "wfs_events")
    os.makedirs(landed)

    def mk(rows):
        return spark.createDataFrame(
            [
                (eid, dt.datetime(2024, 1, day, 12, 0), uid, "view", 0.0, "{}")
                for eid, (uid, day) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    out = str(tmp_path / "wfs_out_pq")
    ck = str(tmp_path / "ck_wfs")
    # 2024-01-01 is a Monday: week keys are Jan 1 / Jan 8
    mk([(1, 1)]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now_to_parquet(
        weekly_first_seen_stream(stream_events_from_files(spark, landed)), ck, out
    )
    # run 2: user 1 again in week 1 (silent), user 1 in week 2
    # (returning), user 2 first time (new)
    mk([(1, 3), (1, 8), (2, 9)]).coalesce(1).write.mode("append").parquet(landed)
    run_available_now_to_parquet(
        weekly_first_seen_stream(stream_events_from_files(spark, landed)), ck, out
    )
    got = sorted(
        (r.user_id, r.week.isoformat(), r.is_new)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "2024-01-01", True),
        (1, "2024-01-08", False),
        (2, "2024-01-08", True),
    ]
