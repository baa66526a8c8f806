"""Spill-under-memory-pressure probe (VERDICT round-1 item 7).

The one 100x-scale property the sf0.1 bench can't show is memory
behavior: does a shuffle larger than executor memory COMPLETE VIA SPILL
rather than OOM?  This script builds a deliberately oversized shape —
a multi-GB shuffle forced through very few, very large partitions inside
a ~1 GiB heap — runs the two memory-hungry operator classes (external
sort, hash aggregation with per-key state), and reports the task-metric
spill counters from Spark's own REST API.  A healthy result is
memoryBytesSpilled/diskBytesSpilled > 0 and a completed job; an OOM or
a zero-spill pass (data accidentally fit) both fail the probe.

Run it in its own process so the constrained session can't pollute the
shared test session:

    python tools/spill_probe.py [n_rows]

Output: one JSON line {"rows": ..., "ops": {"sort": {...}, "agg": {...}}}.
"""

from __future__ import annotations

import json
import sys
import urllib.request


def _spill_metrics(ui_base: str) -> dict[str, int]:
    apps = json.loads(urllib.request.urlopen(f"{ui_base}/api/v1/applications").read())
    app_id = apps[0]["id"]
    stages = json.loads(
        urllib.request.urlopen(f"{ui_base}/api/v1/applications/{app_id}/stages").read()
    )
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    shuffle = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return {"memoryBytesSpilled": mem, "diskBytesSpilled": disk, "shuffleWriteBytes": shuffle}


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("spill-probe")
        # the squeeze: ~1 GiB heap, 4 shuffle partitions -> each sort/agg
        # partition must process GBs through ~100s of MB of execution memory
        .config("spark.driver.memory", "1g")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4444")
        .getOrCreate()
    )
    ui = "http://localhost:4444"

    # ~120 B/row logical: key + two payload strings
    df = (
        spark.range(0, n, 1, 32)
        .select(
            F.col("id"),
            (F.col("id") % 5_000_000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("p1"),
            F.sha1(F.col("id").cast("string")).alias("p2"),
        )
    )

    results = {}

    # 1) external sort: 4 fat partitions each sorted on the random-ish
    #    payload key through the UnsafeExternalSorter (the write consumes
    #    rows in order, so Catalyst cannot eliminate the sort the way it
    #    does under an order-insensitive aggregate)
    before = _spill_metrics(ui)
    df.repartition(4).sortWithinPartitions("p1").write.mode("overwrite").format(
        "noop"
    ).save()
    after = _spill_metrics(ui)
    results["sort"] = {k: after[k] - before[k] for k in after} | {"completed": True}

    # 2) hash aggregation with per-key state: 5M distinct keys x collected
    #    payload forces the hash map past execution memory into
    #    sort-based fallback + spill
    before = _spill_metrics(ui)
    agg_cnt = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"), F.collect_list("p1").alias("ps"))
        .select(F.count(F.lit(1)))
        .collect()[0][0]
    )
    after = _spill_metrics(ui)
    results["agg"] = {
        k: after[k] - before[k] for k in after
    } | {"completed": agg_cnt == min(n, 5_000_000)}

    # 3) the corpus-dedup shape (dedup_lines/remove_repeated_spans family):
    #    posexplode fan-out -> wide hash aggregate on a 2-key composite ->
    #    join back — the fan-out multiplies the shuffle past the heap, the
    #    aggregate carries min-struct state per key
    before = _spill_metrics(ui)
    lines = (
        spark.range(0, max(n // 8, 1), 1, 32)
        .select(
            F.col("id").alias("doc"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda i: F.md5((F.col("id") * 8 + i).cast("string")),
                )
            ).alias("ln", "line"),
        )
        .select(
            "doc",
            "ln",
            F.xxhash64("line").alias("k1"),
            F.xxhash64(F.concat(F.lit("\x01"), F.col("line"))).alias("k2"),
        )
    )
    dup = (
        lines.groupBy("k1", "k2")
        .agg(F.count(F.lit(1)).alias("c"), F.min(F.struct("doc", "ln")).alias("keep"))
    )
    dedup_cnt = (
        lines.join(dup, ["k1", "k2"]).select(F.count(F.lit(1))).collect()[0][0]
    )
    after = _spill_metrics(ui)
    results["explode_agg_join"] = {
        k: after[k] - before[k] for k in after
    } | {"completed": dedup_cnt == (n // 8) * 8}

    ok = all(
        r["completed"] and (r["memoryBytesSpilled"] > 0 or r["diskBytesSpilled"] > 0)
        for r in results.values()
    )
    print(json.dumps({"rows": n, "ops": results, "spill_probe_ok": ok}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
