"""Re-time specific ``queries()`` entries min-of-N interleaved (warm
session, noop sink) — the stable companion to registry_time_sweep.py.

Usage: python tools/retime.py name [name ...]   (env: ROUNDS, SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: F401


def main() -> int:
    import __spark_entry__ as entrymod
    import aws_sdk_pandas_spark as asps

    names = sys.argv[1:]
    rounds = int(os.environ.get("ROUNDS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = asps.get_spark(app_name="retime")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._load(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}")
        return 1
    runs: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            spark.sparkContext.setJobDescription(f"retime:{name}:{r}")
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(time.monotonic() - t0)
    for name in names:
        ts = runs[name]
        print(f"{name}: min={min(ts):.2f}s runs={['%.2f' % t for t in ts]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
