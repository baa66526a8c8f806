"""Capture `.explain("formatted")` for headline queries into plans/r07/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix = "before" | "after" (file name part)
Writes plans/r07/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401


def main() -> None:
    import __spark_entry__ as entrymod
    import aws_sdk_pandas_spark as asps
    from bench import _BENCH_QUERIES

    suffix = sys.argv[1]
    names = sys.argv[2:] or _BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = asps.get_spark(app_name="capture-plans")
    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
