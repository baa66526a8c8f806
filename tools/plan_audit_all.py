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
            # a cross join whose BUILD side is a no-grouping aggregate is
            # the deliberate one-row totals/span broadcast (attach a global
            # scalar to every row) — constant-size build at any data scale,
            # not a smell.  Extract the actual build subtree by the plan
            # tree's indentation (a fixed line window fails when the
            # stream side is deep) and check it for a keys=[] aggregate.
            # A second deliberate family broadcasts a side bounded by the
            # OPERATOR's contract rather than an aggregate (a query set, a
            # capped eval set, an anchor set) — whitelisted by name below,
            # with the contract reference.
            BOUNDED_BUILD_OK = {
                "emb_knn_batch",          # broadcast(queries): |Q| bounded by construction (knn_batch docstring)
                "docs_decontaminate_embedding",  # eval set, max_eval-guarded (decontaminate_by_embedding)
                "emb_hard_negatives",     # anchor set broadcast, bounded by the sampled anchors
                "events_ab_test",         # build = control-variant aggregate row (one row per variant)
                "events_ratio_ab_test",   # same: variant-keyed aggregate, cardinality = variants
            }
            lines = plan.splitlines()
            suspicious = False
            for i, ln in enumerate(lines):
                if "BroadcastNestedLoopJoin" not in ln:
                    continue
                t = ln.index("BroadcastNestedLoopJoin") - 3  # child-marker col
                # direct children carry ":-"/"+-" at column t+3
                kids = [
                    j
                    for j in range(i + 1, len(lines))
                    if len(lines[j]) > t + 4 and lines[j][t + 3 : t + 5] in (":-", "+-")
                ]
                build_right = "BuildLeft" not in ln
                if not kids:
                    suspicious = True
                    continue
                start = kids[-1] if build_right and len(kids) > 1 else kids[0]
                # subtree of the last child runs until a marker STRICTLY
                # left of the children's marker column (a sibling or
                # ancestor elsewhere in the tree)
                def _marker_col(s: str) -> int:
                    cols = [s.find(":-"), s.find("+-")]
                    cols = [c for c in cols if c >= 0]
                    return min(cols) if cols else -1

                end = len(lines)
                for j in range(start + 1, len(lines)):
                    mc = _marker_col(lines[j])
                    if 0 <= mc < t + 3:
                        end = j
                        break
                build = "\n".join(lines[start:end])
                if "keys=[]" not in build:
                    suspicious = True
            if suspicious and name not in BOUNDED_BUILD_OK:
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
