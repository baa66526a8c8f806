"""Row-level dataset diff: what changed between two snapshots.

The validation complement of `s3.merge_datasets`/`copy_objects`
(reference awswrangler/s3/_copy.py): after a backfill, a migration, or
a vendor re-delivery, the operational question is "which rows were
added / removed / changed?".  One full-outer join keyed on the business
key answers it; row content is compared through a PORTABLE md5 row hash
(concat_ws over stringified columns with a null sentinel), so the same
diff re-derives on any engine for audit.

Scale shape: one hash shuffle on the key columns; the row hash is
computed map-side in whole-stage codegen (no UDF), so the join carries
(keys + 32-byte hash), not the full row payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x00<NULL>"


def row_hash(cols: list[str]) -> Column:
    """Portable md5 row fingerprint over ``cols`` (unit-separator joined,
    explicit null sentinel — ``concat_ws`` alone would silently skip
    nulls and collide ``(a, NULL)`` with ``(NULL, a)``).

    Caveat: values compare through their STRING forms; floats may
    stringify differently across engines — prefer
    strings/ints/dates/decimals in cross-engine audits.
    """
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def diff_frames(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff snapshot B against snapshot A: returns ``keys... ,
    change_type`` with ``added`` (key only in B), ``removed`` (only in
    A), ``changed`` (both, differing ``compare_cols``).  Unchanged rows
    are absent — at 100 TB the diff is the small output, the identical
    bulk never leaves the join.

    ``compare_cols`` defaults to every shared non-key column.
    """
    if not keys:
        raise ValueError("keys are required")
    if compare_cols is None:
        shared = [c for c in df_a.columns if c in set(df_b.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    a = df_a.select(*keys, row_hash(compare_cols).alias("__ha")).alias("__l")
    b = df_b.select(*keys, row_hash(compare_cols).alias("__hb")).alias("__r")
    # null-SAFE key equality: a row with a NULL business key present in
    # both snapshots must match itself, not surface as added+removed
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"__l.{k}").eqNullSafe(F.col(f"__r.{k}"))
    j = a.join(b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__l.{k}"), F.col(f"__r.{k}")).alias(k)
            for k in keys
        ],
        "__ha",
        "__hb",
    )
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("__ha").isNull(), F.lit("added"))
            .when(F.col("__hb").isNull(), F.lit("removed"))
            .when(F.col("__ha") != F.col("__hb"), F.lit("changed")),
        )
        .where(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )
