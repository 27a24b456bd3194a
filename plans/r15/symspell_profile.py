#!/usr/bin/env python
"""Stage-isolated profile of symspell_neighbor_pairs_customers (VERDICT
r14 #8) — time each pipeline stage with the noop sink to locate the cost
before deciding whether any §3 join-pruning band is worth it (and whether
it is even legal: n_candidate_pairs is a DECLARED OUTPUT, so any band
that prunes candidates changes results; see OPTIMIZATION_r15.md).

Usage: python plans/r15/symspell_profile.py [passes]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import machine_calibration  # noqa: E402
from spacex_data_pipeline_spark.operators.dedup import materialize  # noqa: E402
from spacex_data_pipeline_spark.queries import REGISTRY, _t  # noqa: E402
from spacex_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="symspell-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    cal_pre = machine_calibration()

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = F.expr(
        "concat(array(c_name), transform(sequence(1, length(c_name)),"
        " i -> concat(substring(c_name, 1, i - 1),"
        " substring(c_name, i + 1, length(c_name)))))"
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    stages: dict[str, list[float]] = {}

    def rec(name, fn):
        stages.setdefault(name, []).append(timed(fn))

    # counts once for context
    v0 = materialize(c.select("c_custkey", "c_name", F.explode(variants).alias("key")))
    a0 = v0.select(F.col("c_custkey").alias("a_key"), F.col("c_name").alias("a_name"), F.col("key").alias("a_k"))
    b0 = v0.select(F.col("c_custkey").alias("b_key"), F.col("c_name").alias("b_name"), F.col("key").alias("b_k"))
    cand0 = a0.join(b0, (F.col("a_k") == F.col("b_k")) & (F.col("a_key") < F.col("b_key")))
    meta = {
        "n_names": c.count(),
        "n_variant_rows": v0.count(),
        "n_candidates_with_dups": cand0.count(),
        "n_distinct_pairs": cand0.select("a_key", "a_name", "b_key", "b_name").distinct().count(),
    }
    print(meta, flush=True)

    for _p in range(passes):
        # stage 1: variant explode + eager checkpoint (as the entry does)
        t0 = time.perf_counter()
        v = materialize(c.select("c_custkey", "c_name", F.explode(variants).alias("key")))
        stages.setdefault("s1_variants_checkpoint", []).append(
            round(time.perf_counter() - t0, 3))
        a = v.select(F.col("c_custkey").alias("a_key"), F.col("c_name").alias("a_name"), F.col("key").alias("a_k"))
        b = v.select(F.col("c_custkey").alias("b_key"), F.col("c_name").alias("b_name"), F.col("key").alias("b_k"))
        j = a.join(b, (F.col("a_k") == F.col("b_k")) & (F.col("a_key") < F.col("b_key"))).select(
            "a_key", "a_name", "b_key", "b_name")
        rec("s2_join_only", lambda: noop(j))
        p = j.distinct()
        rec("s3_join_plus_distinct", lambda: noop(p))
        ver = p.select(F.levenshtein("a_name", "b_name").alias("dist"))
        rec("s4_plus_levenshtein_agg", lambda: noop(ver.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("dist") <= 1, 1).otherwise(0)).alias("e1"))))
        rec("s5_nkeys_count_distinct", lambda: noop(
            v.agg(F.count_distinct("key").alias("nk"))))
        rec("full_entry", lambda: noop(
            REGISTRY["symspell_neighbor_pairs_customers"].fn(spark, sf_dir)))

    cal_post = machine_calibration()
    out = {
        "meta": meta,
        "stages_min": {k: min(v) for k, v in stages.items()},
        "stages_all": stages,
        "calibration_pre": cal_pre,
        "calibration_post": cal_post,
    }
    with open(os.path.join(REPO, "plans", "r15", "symspell_profile.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["stages_min"], indent=2))
    print("probes:", cal_pre.get("par_over_single"), cal_post.get("par_over_single"))
    spark.stop()


if __name__ == "__main__":
    main()
