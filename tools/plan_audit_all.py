"""Registry-wide physical-plan audit: every `queries()` entry.

For each of the ~340 registry queries, builds the DataFrame at sf0.001 and
inspects the ANALYZED/physical plan for the smells the optimization guide
calls out:

- BatchEvalPython            -> row-at-a-time Python (guide §4.1)
- CartesianProduct / BroadcastNestedLoopJoin
- duplicated Python UDF      -> the §4.4 filter-pushdown duplication:
                                the same UDF evaluated in 2+ plan nodes
- scan without column pruning when the query clearly projects

Usage: python tools/plan_audit_all.py [sf_dir] [name ...]
Prints one line per query; summary at the end.  Exit 1 if any smell.
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401


def main() -> int:
    import __spark_entry__ as entrymod
    import aws_sdk_pandas_spark as asps

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = asps.get_spark(app_name="plan-audit-all")
    qs = entrymod.queries()

    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            errors[name] = traceback.format_exc(limit=1).splitlines()[-1][:120]
            continue
        smells: list[str] = []
        if "BatchEvalPython" in plan:
            smells.append("ROW-AT-A-TIME-PYTHON")
        if "CartesianProduct" in plan:
            smells.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            # a cross join whose build side is a no-grouping aggregate is
            # the deliberate one-row totals/span broadcast (attach a global
            # scalar to every row) — constant-size build at any data scale,
            # not a smell.  Flag only NLJs without such a build side nearby.
            lines = plan.splitlines()
            suspicious = False
            for i, ln in enumerate(lines):
                if "BroadcastNestedLoopJoin" not in ln:
                    continue
                ctx = "\n".join(lines[i : i + 20])
                if "HashAggregate(keys=[]" not in ctx and "keys=[], functions=[" not in ctx:
                    suspicious = True
            if suspicious:
                smells.append("NESTED-LOOP-JOIN")
        # §4.4 duplicated-UDF detection: same `<fn>(...)#<exprid>` result id
        # evaluated by more than one Arrow/Batch eval node.  InMemoryRelation
        # blocks print their (already materialized) lineage too — strip those
        # repeated sections first to avoid false positives.
        live = re.sub(r"\+- InMemoryRelation[\s\S]*?(?=\n\S|\Z)", "", plan)
        evals = re.findall(r"(?:ArrowEvalPython|BatchEvalPython) \[([^\]]*)\]", live)
        seen: set[str] = set()
        dups: set[str] = set()
        for e in evals:
            for call in re.findall(r"(\w+\([^)]*\)#\d+)", e):
                if call in seen:
                    dups.add(call.split("#")[0][:40])
                seen.add(call)
        if dups:
            smells.append(f"DUPLICATED-PY-EVAL({','.join(sorted(dups))})")
        if smells:
            flagged[name] = smells
            print(f"{name:40s} <<< {', '.join(smells)}")
    print(f"\naudited {len(qs) if not only else len(only)} queries: "
          f"{len(flagged)} flagged, {len(errors)} errored")
    for n, e in errors.items():
        print(f"  ERROR {n}: {e}")
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    sys.exit(main())
