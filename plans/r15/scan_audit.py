#!/usr/bin/env python
"""Re-run the r14 plan audit over every bench entry: count `Scan parquet`,
`Exchange`, and `ReusedExchange` nodes in each entry's final
explain('formatted') plan. High scan counts = a subtree re-inlined k times
(alias projections defeat exchange reuse in this codebase — ReusedExchange
was 0 in every r14 plan). Worst-first worklist for optimization round 2.

Note (ADVICE r14 #3): building an entry's DataFrame executes its eager
localCheckpoint jobs, so this audit pays real execution cost — run it on
an otherwise idle repo, not mid-bench.

Usage: python plans/r15/scan_audit.py [out.json]
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bench import EXTENDED, HEADLINE, OVERRIDES  # noqa: E402
from spacex_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from spacex_data_pipeline_spark.session import build_session  # noqa: E402

SCAN = re.compile(r"^\(\d+\) Scan parquet", re.M)
EXCH = re.compile(r"^\(\d+\) Exchange$", re.M)
REUSED = re.compile(r"^\(\d+\) ReusedExchange", re.M)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "plans", "r15", "scan_audit.json"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="scan-audit",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.debug.maxToStringFields": "2000",
        },
    )
    rows = {}
    for name in list(HEADLINE) + list(EXTENDED):
        fn = OVERRIDES.get(name) or REGISTRY[name].fn
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            rows[name] = {
                "scans": len(SCAN.findall(plan)),
                "exchanges": len(EXCH.findall(plan)),
                "reused": len(REUSED.findall(plan)),
                "build_sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": str(e)[:200]}
        print(name, rows[name], flush=True)
    ranked = dict(
        sorted(
            rows.items(),
            key=lambda kv: -(kv[1].get("scans", 0) * 100 + kv[1].get("exchanges", 0)),
        )
    )
    with open(out_path, "w") as f:
        json.dump(ranked, f, indent=2)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
