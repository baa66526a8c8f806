"""Sampling / capping operators for dataset curation.

Training-data pipelines constantly need "at most N documents per domain"
and "x% of each stratum" — both must be deterministic (reruns produce
the same corpus) and shuffle-minimal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cap_per_group(
    df: DataFrame,
    by: list[str],
    n: int,
    *,
    order_col: str | Column | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the domain-capping step.

    ``order_col`` picks WHICH rows survive (e.g. a quality score,
    descending); default is a deterministic pseudo-random order derived
    from a hash of the whole row and ``seed`` (stable across reruns and
    partitionings, unlike ``rand()``).  One shuffle on the group keys.
    """
    if order_col is None:
        order = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed)).asc()
    elif isinstance(order_col, str):
        order = F.col(order_col).desc()
    else:
        order = order_col
    w = Window.partitionBy(*by).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    *,
    seed: int = 42,
    key_col: str | None = None,
    algo: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the seeded hash
    of the row (or of ``key_col`` when given — all rows sharing the key
    then decide together, the leak-free form) falls below the stratum's
    fraction.  Unlike ``DataFrame.sampleBy`` the decision is a pure
    function of row content — reruns and repartitions select the same
    rows.

    ``algo="md5"`` (requires ``key_col``) makes the decision re-derivable
    by any engine from ``md5(key || ':' || seed)``, for cross-engine
    audits of what was sampled.
    """
    if algo == "md5":
        if key_col is None:
            raise ValueError("algo='md5' requires key_col=")
        u = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed)))), 1, 8
            ),
            16,
            10,
        ).cast("long") / F.lit(float(1 << 32))
    elif algo == "xxhash64":
        hash_cols = [F.col(key_col)] if key_col is not None else [F.col(c) for c in df.columns]
        u = (
            F.xxhash64(*hash_cols, F.lit(seed)).bitwiseAND(
                F.lit((1 << 63) - 1)
            )
            / F.lit(float(1 << 63))
        )
    else:
        raise ValueError(f"unknown stratified_sample algo: {algo!r}")
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col(strata_col)]
    return df.where(frac.isNotNull() & (u < frac))
