"""Privacy / data-governance operators for dataset release: the
k-anonymity audit and deterministic-noise differentially-private
aggregate release.

These complement the PII scrub (``functions/text.redact_pii``) and
the Clean Rooms k-threshold enforcement (``cleanrooms.py`` — the
reference enforces it server-side via the analysis-rule JSON,
``cleanrooms/_read.py``): scrubbing removes direct identifiers, the
operators here quantify and bound what the QUASI-identifiers still
leak before a table leaves the boundary.

The AUDIT side of this story already lives in ``dq.py``
(``k_anonymity`` / ``risky_classes`` / ``l_diversity``, gates
``customer_k_anonymity`` etc.) — this module deliberately adds only
what that family lacks:

- :func:`suppress_small_classes` — the enforcement sibling: drop (or
  NULL out the quasi columns of) every row whose equivalence class is
  smaller than k.  Aggregation + broadcast-threshold semi/anti join
  when the class count is small, plain shuffle join otherwise —
  Catalyst picks.
- :func:`dp_aggregate` — per-group aggregate release with Laplace
  noise at scale ``sensitivity/epsilon``.  The noise is
  md5-DETERMINISTIC (``_md5_uniform`` over group key + seed, the
  repo-wide canonical hash-to-uniform), so a release is reproducible
  and auditable cross-engine — the DuckDB oracle re-derives the SAME
  noise from the same keys, which is what makes this family
  hash-checkable at all.  A deterministic seed means the *formal* DP
  guarantee holds against parties who don't know the seed (the usual
  trusted-curator model); rotate the seed per release.

At 100 TB: everything here is one hash aggregation keyed by the
quasi/group columns (map-side combined) plus O(groups) work; nothing
is collected to the driver.

Reference parity anchor: k-threshold suppression mirrors
``cleanrooms/_read.py``'s aggregation analysis rule; the audit and DP
release are beyond-reference, same family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument
from aws_sdk_pandas_spark.operators.sampling import _md5_uniform


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    mode: str = "drop",
) -> DataFrame:
    """Enforce k-anonymity: rows whose quasi-identifier equivalence
    class has fewer than ``k`` members are ``drop``-ed, or with
    ``mode="null"`` kept with every quasi column NULLed (the class
    collapses into the suppressed pool; counts survive for volume
    accounting)."""
    if mode not in ("drop", "null"):
        raise InvalidArgument(f"mode must be drop|null, got {mode!r}")
    if not quasi_cols:
        raise InvalidArgument("quasi_cols must name at least one column")
    sizes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__class_n")
    )
    # rename the size-frame keys so a derived quasi column can never
    # self-resolve into a trivially-true predicate
    renamed = sizes
    for c in quasi_cols:
        renamed = renamed.withColumnRenamed(c, f"__k_{c}")
    joined = df.join(
        renamed,
        on=[
            F.col(c).eqNullSafe(F.col(f"__k_{c}")) for c in quasi_cols
        ],
        how="left",
    ).drop(*[f"__k_{c}" for c in quasi_cols])
    if mode == "drop":
        return joined.where(F.col("__class_n") >= k).drop("__class_n")
    out = joined
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(F.col("__class_n") >= k, F.col(c))
        )
    return out.drop("__class_n")


def _laplace_noise(key: Column, seed: int, scale: float) -> Column:
    """Deterministic Laplace(0, scale) via inverse CDF of the
    md5-uniform: ``-scale * sign(u-1/2) * ln(1 - 2|u-1/2|)``.  The
    uniform is half-open [0,1); u=1/2 maps to exactly 0 noise and the
    log argument stays in (0,1]."""
    u = _md5_uniform(key, seed)
    c = u - F.lit(0.5)
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(c)
    return (
        F.lit(-scale)
        * F.signum(c)
        * F.log(F.when(mag <= 0, F.lit(1e-12)).otherwise(mag))
    )


def dp_aggregate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    agg: str = "sum",
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    seed: int = 0,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group ``sum`` or ``count`` release with deterministic
    Laplace noise at scale ``sensitivity/epsilon``; emits the noisy
    value (``<agg>_<value_col>_dp``) only — the true aggregate never
    leaves the plan.  Noise keys on the GROUP (concat of group values,
    NULLs as a sentinel) + ``seed``: rerunning the release reproduces
    it; a new seed is a new epsilon spend."""
    if agg not in ("sum", "count"):
        raise InvalidArgument(f"agg must be sum|count, got {agg!r}")
    if epsilon <= 0 or sensitivity <= 0:
        raise InvalidArgument("epsilon and sensitivity must be > 0")
    if not group_cols:
        raise InvalidArgument("group_cols must name at least one column")
    scale = sensitivity / epsilon
    true_agg = (
        F.sum(F.col(value_col)) if agg == "sum" else F.count(F.col(value_col))
    )
    grouped = df.groupBy(*group_cols).agg(true_agg.cast("double").alias("__t"))
    key = F.concat_ws(
        "", *[
            F.coalesce(F.col(c).cast("string"), F.lit("__null__"))
            for c in group_cols
        ]
    )
    name = out_col or f"{agg}_{value_col}_dp"
    return grouped.select(
        *group_cols,
        F.round(F.col("__t") + _laplace_noise(key, seed, scale), 6).alias(name),
    )
