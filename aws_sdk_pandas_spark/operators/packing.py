"""Sequence packing for training-data pipelines.

Pre-training data loaders consume fixed-token-budget sequences, so the
curation layer must assign documents to sequences deterministically —
the same corpus must pack identically on every rerun and engine.

Semantics here are *chunk packing*: documents are laid out in a
deterministic order and a sequence boundary falls every ``budget``
tokens of the running total; a document belongs to the sequence in
which it STARTS (downstream loaders truncate/pad the straddle).  This
is a pure prefix-sum, so it distributes as one window aggregation —
unlike first-fit bin packing, which is inherently sequential per bin
and would serialize the corpus through one node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    *,
    by: list[str] | None = None,
    order_cols: list[str] | None = None,
    out_col: str = "seq_id",
) -> DataFrame:
    """Assign each row a sequence id so consecutive rows (in
    ``order_cols`` order, within each ``by`` group) fill ``budget``
    tokens per sequence.

    ``by`` is the shard key (e.g. language, domain, or a hash shard) —
    packing is independent per group, which is what makes it
    distributed: one shuffle on the group key, a running sum within
    each group, no global order.  With ``by=None`` the whole input is
    one group — correct, but single-partition; shard first at scale.

    Returns the input plus ``out_col`` (0-based within each group).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    by = list(by or [])
    order = [F.col(c) for c in (order_cols or [token_col])]
    w = Window.partitionBy(*by).orderBy(*order) if by else Window.orderBy(*order)
    running = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        out_col,
        F.floor((running - F.col(token_col)) / F.lit(budget)).cast("bigint"),
    )

