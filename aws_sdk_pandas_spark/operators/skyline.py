"""Skyline / Pareto-front queries: multi-criteria selection without a
scalarizing weight — "all documents not beaten on BOTH quality and
novelty", "cheapest-and-largest parts".  The operator the weighted-score
rank can't replace: a single weighted sum bakes in a tradeoff; the
skyline returns every defensible tradeoff and lets the downstream
policy choose.

Scale shape (the classic two-phase skyline): each partition computes
its LOCAL front with an Arrow-batched kernel (a point dominated
anywhere is dominated by a point that survives locally, so the global
front is a subset of the union of local fronts), then the
survivor set — typically orders of magnitude smaller than the input —
is folded in one final pass.  Worst case (perfectly anti-correlated
criteria) the front IS the dataset; ``max_candidates`` guards the
collapse step with an actionable error instead of an OOM.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _front_mask(crit: np.ndarray) -> np.ndarray:
    """Boolean mask of non-dominated rows for an (n, d) all-maximize
    criteria matrix.  Sort by the first criterion descending (ties by
    the rest) so a dominator always precedes what it dominates; each
    candidate then only checks the kept set."""
    order = np.lexsort(tuple(-crit[:, i] for i in range(crit.shape[1] - 1, -1, -1)))
    kept_idx: list[int] = []
    kept: list[np.ndarray] = []
    for i in order:
        row = crit[i]
        if kept:
            k = np.asarray(kept)
            dominated = bool(
                ((k >= row).all(axis=1) & (k > row).any(axis=1)).any()
            )
            if dominated:
                continue
        kept_idx.append(i)
        kept.append(row)
    mask = np.zeros(len(crit), dtype=bool)
    mask[kept_idx] = True
    return mask


def pareto_front(
    df: DataFrame,
    *,
    maximize: list[str] | None = None,
    minimize: list[str] | None = None,
    max_candidates: int = 1_000_000,
) -> DataFrame:
    """Rows not dominated under the given criteria: another row
    dominates when it is ≥ on every criterion (after flipping
    ``minimize`` columns) and strictly better on at least one.
    Duplicate criterion vectors never dominate each other — all copies
    survive.  Rows with a NULL criterion are excluded (their dominance
    is undefined).

    Returns the input columns, unchanged, filtered to the front.
    """
    maxs = list(maximize or [])
    mins = list(minimize or [])
    if not maxs and not mins:
        raise ValueError("need at least one criterion")
    cols = df.columns
    crit_exprs = [F.col(c).cast("double") for c in maxs] + [
        (-F.col(c).cast("double")) for c in mins
    ]
    # NaN criteria make every dominance comparison false, so a NaN row
    # could never be pruned and would pollute every front — exclude
    # them with the NULLs
    ok = F.lit(True)
    for c in maxs + mins:
        cc = F.col(c).cast("double")
        ok = ok & cc.isNotNull() & ~F.isnan(cc)
    base = df.where(ok).withColumn("__crit", F.array(*crit_exprs))
    d = len(crit_exprs)
    schema = base.schema

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-batch fronts are a CORRECT filter (a globally-non-dominated
        # point is non-dominated in every subset), and keep memory at
        # Arrow-batch size during the scan phase
        for pdf in batches:
            if len(pdf) == 0:
                continue
            crit = np.stack(pdf["__crit"].to_numpy()).astype(np.float64)
            yield pdf[_front_mask(crit.reshape(len(pdf), d))]

    def _exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the FINAL pass must see the whole survivor set at once — a
        # per-batch front would let cross-batch dominated rows through
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        crit = np.stack(pdf["__crit"].to_numpy()).astype(np.float64)
        yield pdf[_front_mask(crit.reshape(len(pdf), d))]

    # localCheckpoint: the survivor set feeds both the guard count and
    # the final pass — materialize once instead of recomputing the scan
    local = base.mapInPandas(_local, schema).localCheckpoint(eager=True)
    n_candidates = local.count()
    if n_candidates > max_candidates:
        raise ValueError(
            f"pareto_front: {n_candidates} local-front survivors exceed "
            f"max_candidates={max_candidates} — the criteria are close to "
            "anti-correlated (the front IS the data); discretize a criterion "
            "or raise the cap deliberately"
        )
    final = local.repartition(1).mapInPandas(_exact, schema)
    return final.select(*cols)
