"""Capture `.explain("formatted")` for headline queries into plans/r07/.

Usage: python tools/capture_plans.py <suffix> [--inline-checkpoints] [query ...]
  suffix = "before" | "after" (file name part)
Writes plans/r07/<query>_<suffix>.txt

--inline-checkpoints: monkeypatches DataFrame.localCheckpoint to identity
while BUILDING the dumped plan, so operators that eagerly checkpoint an
intermediate or their (small) result still dump the full logical pipeline
instead of a bare `Scan ExistingRDD` over the checkpointed blocks.  The
executed plan at runtime inserts an RDD scan at each marked point; the
dump carries a banner saying so.  Only safe for non-iterative queries
(a driver-loop fixpoint relies on real checkpoints to bound plan growth).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401

BANNER = (
    "NOTE: captured with DataFrame.localCheckpoint patched to identity so the\n"
    "full operator pipeline is visible; at runtime each checkpoint boundary\n"
    "executes this same subtree once and replaces it with an RDD scan.\n\n"
)


def main() -> None:
    import __spark_entry__ as entrymod
    import aws_sdk_pandas_spark as asps
    from bench import _BENCH_QUERIES

    args = [a for a in sys.argv[1:]]
    inline = "--inline-checkpoints" in args
    if inline:
        args.remove("--inline-checkpoints")
    suffix = args[0]
    names = args[1:] or _BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = asps.get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07"
    )
    os.makedirs(outdir, exist_ok=True)

    # Spark 4: concrete frames are pyspark.sql.classic.dataframe.DataFrame,
    # which overrides localCheckpoint — patch the concrete class.
    from pyspark.sql.classic.dataframe import DataFrame

    orig_ckpt = DataFrame.localCheckpoint
    if inline:
        DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
    try:
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                if inline:
                    fh.write(BANNER)
                fh.write(plan)
            print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange)")
    finally:
        DataFrame.localCheckpoint = orig_ckpt  # type: ignore[assignment]


if __name__ == "__main__":
    main()
