#!/usr/bin/env python
"""Capture .explain('formatted') for a list of registry queries into
plans/r15/<name>_<suffix>.txt — the judge-auditable evidence for plan
claims in OPTIMIZATION_r15.md.

Usage: python plans/r15/capture_plans.py <suffix> [name ...]
With no names, captures the bench HEADLINE set.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bench import HEADLINE, OVERRIDES  # noqa: E402
from spacex_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from spacex_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r15")
    spark = build_session(app_name="plan-capture")
    for name in names:
        fn = OVERRIDES.get(name) or REGISTRY[name].fn
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
