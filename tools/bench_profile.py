"""Per-query job/stage profiler for the headline bench suite.

Runs each headline query exactly like bench.py (same session factory, same
warm-up), with ``spark.eventLog.enabled`` so the breakdown can be read
offline from the event log: per query -> jobs -> stages with duration,
task count, shuffle read/write bytes, and input bytes.  Guide §1: measure
first, label jobs, know where the time goes before touching anything.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_profile.py [query ...]
Writes /tmp/asps_profile_report.json and prints a human summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = "/tmp/asps_spark_events"


def main() -> None:
    import shutil

    shutil.rmtree(EVENT_DIR, ignore_errors=True)
    os.makedirs(EVENT_DIR, exist_ok=True)

    import __spark_entry__ as entrymod
    import aws_sdk_pandas_spark as asps
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = asps.get_spark(
        app_name="bench_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext

    names = sys.argv[1:] or [
        "q01_pricing_summary",
        "q03_shipping_priority",
        "q05_local_supplier_volume",
        "q06_revenue_forecast",
        "q10_returned_items",
        "events_daily_stats",
        "events_top_users",
        "doc_lang_stats",
        "doc_quality_scores",
        "doc_ngram_jaccard_dups",
        "dedup_minhash_lsh",
        "emb_knn_cosine",
        "agg_rollup",
        "window_running_total",
        "vectors_query_filtered",
        "logs_insights_stats",
        "asof_join_events",
        "sessionize_events",
        "interval_join_purchases",
    ]
    qs = entrymod.queries()

    # same warm-up as bench.py
    entrymod._load(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return s + int(np.int64(1))

    spark.range(100_000).repartition(32).select(F.sum(_warm(F.col("id")))).collect()

    from aws_sdk_pandas_spark.operators.dedup import (
        minhash_duplicates,
        ngram_jaccard_duplicates,
    )

    sliver = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1000)
    for _ in range(2):
        minhash_duplicates(sliver, "doc_id", "text", threshold=0.5).count()
    ngram_jaccard_duplicates(sliver, "doc_id", "text", n=3, threshold=0.2).count()

    # two sweeps: first is cold-ish, second approximates bench steady state
    walls: dict[str, list[float]] = defaultdict(list)
    for sweep in range(2):
        for name in names:
            sc.setJobGroup(f"{name}@{sweep}", name)
            t0 = time.time()
            fn = qs[name]
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            df.count()
            walls[name].append(time.time() - t0)
            if sweep == 1:
                print(f"# {name}: build={t_build:.3f}s total={walls[name][-1]:.3f}s",
                      file=sys.stderr)
            sc.setJobGroup("", "")
    spark.stop()  # flush event log

    # ---- parse event log ----
    logs = []
    for root, _dirs, files in os.walk(EVENT_DIR):
        for f in files:
            if "appstatus" not in f:
                logs.append(os.path.join(root, f))
    report: dict[str, dict] = {}
    stage_to_group: dict[int, str] = {}
    stage_submit: dict[int, float] = {}
    for lf in logs:
        with open(lf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    group = props.get("spark.jobGroup.id", "")
                    for sinfo in ev.get("Stage Infos", []):
                        stage_to_group[sinfo["Stage ID"]] = group
                elif et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    group = stage_to_group.get(sid, "")
                    if "@" not in group:
                        continue
                    qname, sweep = group.rsplit("@", 1)
                    key = f"{qname}@{sweep}"
                    rep = report.setdefault(key, {"stages": []})
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    acc = {a["Name"]: a.get("Value") for a in si.get("Accumulables", [])}

                    def _num(x):
                        try:
                            return int(x)
                        except (TypeError, ValueError):
                            return 0

                    rep["stages"].append(
                        {
                            "stage": sid,
                            "name": si.get("Stage Name", "")[:60],
                            "ms": (comp - sub) if sub and comp else None,
                            "tasks": si.get("Number of Tasks"),
                            "shuffle_read": _num(acc.get("internal.metrics.shuffleRead.remoteBytesRead", 0))
                            + _num(acc.get("internal.metrics.shuffleRead.localBytesRead", 0)),
                            "shuffle_write": _num(acc.get("internal.metrics.shuffleWrite.bytesWritten", 0)),
                            "input": _num(acc.get("internal.metrics.input.bytesRead", 0)),
                            "exec_run_ms": _num(acc.get("internal.metrics.executorRunTime", 0)),
                            "python_ms": _num(acc.get("internal.metrics.executorRunTime", 0)) and None,
                        }
                    )

    out = {"walls": {k: [round(x, 3) for x in v] for k, v in walls.items()}, "queries": {}}
    for key, rep in sorted(report.items()):
        qname, sweep = key.rsplit("@", 1)
        if sweep != "1":
            continue
        stages = sorted(rep["stages"], key=lambda s: -(s["ms"] or 0))
        total_ms = sum(s["ms"] or 0 for s in rep["stages"])
        out["queries"][qname] = {
            "wall_s": walls[qname][1] if len(walls[qname]) > 1 else None,
            "sum_stage_ms": total_ms,
            "n_stages": len(rep["stages"]),
            "top_stages": stages[:8],
        }

    with open("/tmp/asps_profile_report.json", "w") as fh:
        json.dump(out, fh, indent=1)
    for qname, q in out["queries"].items():
        print(f"\n== {qname}: wall={q['wall_s']}s stages={q['n_stages']} sum_stage={q['sum_stage_ms']}ms")
        for s in q["top_stages"][:5]:
            print(
                f"   stage {s['stage']:>4} {s['ms'] or 0:>6}ms tasks={s['tasks']:>3} "
                f"sread={s['shuffle_read']:>9} swrite={s['shuffle_write']:>9} input={s['input']:>10} "
                f"execms={s['exec_run_ms']:>7}  {s['name']}"
            )


if __name__ == "__main__":
    main()
