"""Upsert / merge family.

The reference orchestrates merges as SQL against remote engines:

- Redshift upsert: DELETE matching rows USING a staging table on the pks,
  then INSERT SELECT, with optional ``precombine_key`` dedup where the
  greatest version wins (awswrangler/redshift/_utils.py:173-211).
- Iceberg ``MERGE INTO`` with null-safe matching via
  ``IS NOT DISTINCT FROM`` (awswrangler/athena/_write_iceberg.py:366-385).
- MySQL/PG/Oracle/SQLServer upsert modes (mysql.py:516-560,
  postgresql.py:597, oracle.py:502, sqlserver.py:426).

Spark-first: for catalog tables that support row-level ops (Delta/Iceberg)
emit a native ``MERGE INTO`` (null-safe ``<=>``); for plain
parquet/path-based targets implement the same semantics as a
DataFrame-level merge (anti-join + union) — a full-shuffle-once plan that
scales linearly and lets AQE pick broadcast vs sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def _precombine_latest(df: DataFrame, keys: list[str], precombine_key: str) -> DataFrame:
    """Keep only the greatest-``precombine_key`` row per key
    (reference: redshift/_utils.py:186-199 precombine dedup)."""
    w = Window.partitionBy(*keys).orderBy(F.col(precombine_key).desc_nulls_last())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_snapshot(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """CDC log compaction: keep only the newest row per key.

    The batch form of "replication stream -> current table" (the
    reference's precombine semantics, redshift/_utils.py:186-199,
    generalized to a deterministic multi-column version order).  One
    shuffle on the keys; ``order_by`` must be deterministic — include a
    tiebreaker column.
    """
    if not keys or not order_by:
        raise InvalidArgument("keys and order_by are required")
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_dataframe(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    precombine_key: str | None = None,
    match_nulls: bool = True,
) -> DataFrame:
    """Pure-DataFrame upsert: rows of ``target`` whose key matches a
    ``source`` row are replaced; new source rows are inserted.

    Equivalent plan to the reference's DELETE USING + INSERT SELECT
    (redshift/_utils.py:173-211).  ``match_nulls`` uses null-safe equality
    (``<=>``), mirroring Iceberg's ``IS NOT DISTINCT FROM`` matching
    (athena/_write_iceberg.py:372-376).
    """
    if not keys:
        raise InvalidArgument("upsert requires at least one key column")
    if precombine_key is not None:
        source = _precombine_latest(source, keys, precombine_key)

    # NOTE: source is read TWICE by construction (anti-join build side +
    # the inserted rows).  A persist here was considered and rejected:
    # the streaming upsert sink calls this per micro-batch and the
    # returned plan is lazy, so the operator could never release the
    # cache (one leaked entry per batch).  A caller whose source is
    # expensive to derive should persist it (see the upsert_orders gate).
    cond = _key_cond(target, source, keys, match_nulls)
    surviving = target.join(source, cond, "left_anti")
    return surviving.unionByName(source.select(*target.columns))


def merge_upsert(
    spark: SparkSession,
    source: DataFrame | str,
    target_table: str,
    merge_cols: list[str],
    *,
    merge_condition: str = "update",
    merge_match_nulls: bool = False,
    precombine_key: str | None = None,
) -> None:
    """Native ``MERGE INTO`` against a Delta/Iceberg catalog table
    (reference: athena/_write_iceberg.py:297-420 ``to_iceberg`` merge path).

    ``merge_condition='update'`` -> WHEN MATCHED THEN UPDATE, 'ignore' ->
    matched rows left untouched; unmatched rows are always inserted.

    When the catalog table's format has no row-level-op support (plain
    parquet ``saveAsTable`` in OSS Spark without the Delta/Iceberg jars)
    the same semantics run as a DataFrame merge + full table rewrite:
    semantically identical, but a whole-table write instead of the
    native format's file-level commit — fine for dimension-sized
    tables, a reason to use Delta/Iceberg (or the lakelite path-based
    tables, which keep file-level CoW) for big facts.
    """
    if merge_condition not in ("update", "ignore"):
        raise InvalidArgument("merge_condition must be 'update' or 'ignore'")
    if isinstance(source, DataFrame):
        df = source
        if precombine_key is not None:
            df = _precombine_latest(df, merge_cols, precombine_key)
        view = f"__asps_merge_src_{abs(hash(target_table)) % 10**8}"
        df.createOrReplaceTempView(view)
        source_name = view
    else:
        source_name = source

    try:
        spark.sql(
            build_merge_sql(
                target_table,
                source_name,
                merge_cols,
                merge_condition=merge_condition,
                merge_match_nulls=merge_match_nulls,
                precombine_key=precombine_key,
            )
        )
        return
    except Exception as exc:
        # ONLY the precise does-not-support-row-level-ops error routes to
        # the fallback; any real MERGE failure on a capable table raises
        cond_name = getattr(exc, "getCondition", lambda: None)() or getattr(
            exc, "getErrorClass", lambda: None
        )()
        if not (
            cond_name == "UNSUPPORTED_FEATURE.TABLE_OPERATION"
            and "MERGE" in str(exc)
        ):
            raise

    _merge_fallback_rewrite(
        spark,
        target_table,
        source_name,
        merge_cols,
        merge_condition=merge_condition,
        merge_match_nulls=merge_match_nulls,
        precombine_key=precombine_key,
    )


def _key_cond(left: DataFrame, right: DataFrame, keys: list[str], match_nulls: bool):
    """AND-folded key equality, optionally null-safe — the one builder
    used by upsert_dataframe and the merge fallback."""
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k]) if match_nulls else (left[k] == right[k])
        cond = c if cond is None else (cond & c)
    return cond


def _table_layout(spark: SparkSession, table: str) -> dict:
    """Catalog layout of a table (provider, partition cols, bucket spec)
    so a rewrite can preserve it."""
    import re as _re

    part_cols = [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
    provider = None
    table_type = None
    n_buckets = 0
    bucket_cols: list[str] = []
    sort_cols: list[str] = []
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        key = (r.col_name or "").strip()
        val = (r.data_type or "").strip()
        if key == "Type":
            table_type = val
        elif key == "Provider":
            provider = val
        elif key == "Num Buckets":
            n_buckets = int(val or 0)
        elif key == "Bucket Columns":
            bucket_cols = _re.findall(r"`([^`]+)`", val)
        elif key == "Sort Columns":
            sort_cols = _re.findall(r"`([^`]+)`", val)
    return {
        "provider": provider or "parquet",
        "type": table_type or "MANAGED",
        "partition_cols": part_cols,
        "n_buckets": n_buckets,
        "bucket_cols": bucket_cols,
        "sort_cols": sort_cols,
    }


def _merge_fallback_rewrite(
    spark: SparkSession,
    target_table: str,
    source_name: str,
    merge_cols: list[str],
    *,
    merge_condition: str,
    merge_match_nulls: bool,
    precombine_key: str | None,
) -> None:
    """Semantics-preserving MERGE for formats without row-level ops:
    build the merged frame with EXACTLY the native matched/unmatched
    contract, write it to a staging table carrying the target's catalog
    layout (provider/partitioning/bucketing — a rewrite must not
    silently flatten a bucketed table), then swap via rename.

    Native-contract details deliberately preserved:
    - only MATCHED target rows change; unmatched target rows (including
      duplicate-key rows the source never references, and NULL-key rows
      under non-null-safe matching) pass through untouched;
    - duplicate-key matched target rows each update (cardinality kept);
    - the precombine guard is strictly ``s.pk > t.pk``: ties and NULL
      comparisons keep the TARGET row, exactly like the SQL guard;
    - the staging write completes BEFORE the target is dropped, so a
      crash never loses committed data — worst case the staging table
      survives for manual recovery (its name says what it is).
    """
    # cheap driver-side refusals FIRST (catalog metadata, no data pass)
    layout = _table_layout(spark, target_table)
    if layout["type"] != "MANAGED":
        # a drop+rename swap would re-home an EXTERNAL table into the
        # warehouse and leave the original path holding stale pre-merge
        # files forever — refuse rather than silently diverge
        raise InvalidArgument(
            f"merge fallback cannot rewrite {layout['type']} table "
            f"{target_table!r}: the swap would move it into the warehouse and "
            "orphan its external location. Use Delta/Iceberg for row-level "
            "ops on external tables, or lakelite path-based tables."
        )

    target = spark.table(target_table)
    src = spark.table(source_name).select(*target.columns)
    cols = target.columns

    if precombine_key is not None:
        # idempotent for DataFrame sources (already precombined by the
        # caller), REQUIRED for table-name sources
        src = _precombine_latest(src, merge_cols, precombine_key)
    else:
        # native MERGE raises only when multiple source rows match the
        # same TARGET row — insert-only duplicate keys (and NULL-key
        # duplicates under non-null-safe matching) are legal and must
        # stay legal here
        dup_keys = (
            src.groupBy(*merge_cols).count().where(F.col("count") > 1).drop("count")
        )
        dup_matching = (
            dup_keys.join(
                target, _key_cond(dup_keys, target, merge_cols, merge_match_nulls),
                "leftsemi",
            )
            .limit(1)
            .count()
        )
        if dup_matching:
            raise InvalidArgument(
                "multiple merge source rows match the same target row; native "
                "MERGE INTO rejects this — deduplicate the source or pass "
                "precombine_key"
            )

    t = target.alias("__t")
    s = src.alias("__s")
    on = _key_cond(t, s, merge_cols, merge_match_nulls)

    untouched = t.join(s, on, "left_anti").select(*cols)
    inserts = s.join(t, on, "left_anti").select(*cols)

    if merge_condition == "ignore":
        matched_keep = t.join(s, on, "left_semi").select(*cols)
        merged = untouched.unionByName(matched_keep).unionByName(inserts)
    else:
        joined = t.join(s, on, "inner")
        if precombine_key is not None:
            guard = F.col(f"__s.`{precombine_key}`") > F.col(f"__t.`{precombine_key}`")
        else:
            guard = F.lit(True)
        updated = joined.select(
            *[
                F.when(guard, F.col(f"__s.`{c}`"))
                .otherwise(F.col(f"__t.`{c}`"))
                .alias(c)
                for c in cols
            ]
        )
        merged = untouched.unionByName(updated).unionByName(inserts)

    staging = f"{target_table}__asps_merge_staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    writer = merged.write.format(layout["provider"]).mode("overwrite")
    if layout["partition_cols"]:
        writer = writer.partitionBy(*layout["partition_cols"])
    if layout["n_buckets"] and layout["bucket_cols"]:
        writer = writer.bucketBy(layout["n_buckets"], *layout["bucket_cols"]).sortBy(
            *(layout["sort_cols"] or layout["bucket_cols"])
        )
    writer.saveAsTable(staging)

    spark.sql(f"DROP TABLE {target_table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {target_table}")
    if layout["partition_cols"]:
        # table rename moves the directory but the catalog's per-partition
        # locations still point at the old path — re-discover them
        spark.sql(f"MSCK REPAIR TABLE {target_table}")


def build_merge_sql(
    target_table: str,
    source_name: str,
    merge_cols: list[str],
    *,
    merge_condition: str = "update",
    merge_match_nulls: bool = False,
    precombine_key: str | None = None,
) -> str:
    """The MERGE INTO template (exposed for tests/inspection): null-safe
    ``<=>`` matching mirrors the reference's ``IS NOT DISTINCT FROM``
    (athena/_write_iceberg.py:372-376); the precombine guard reproduces
    Redshift's greatest-version-wins upsert (redshift/_utils.py:186-199)."""
    op = "<=>" if merge_match_nulls else "="
    on = " AND ".join(f"t.`{c}` {op} s.`{c}`" for c in merge_cols)
    matched = (
        "WHEN MATCHED THEN UPDATE SET * " if merge_condition == "update" else ""
    )
    if precombine_key is not None and merge_condition == "update":
        matched = (
            f"WHEN MATCHED AND s.`{precombine_key}` > t.`{precombine_key}` "
            "THEN UPDATE SET * "
        )
    return (
        f"MERGE INTO {target_table} t USING {source_name} s ON {on} "
        f"{matched}WHEN NOT MATCHED THEN INSERT *"
    )


def delete_from_table(
    spark: SparkSession,
    source: DataFrame,
    target_table: str,
    merge_cols: list[str],
) -> None:
    """Delete target rows whose keys appear in ``source``
    (reference: athena/_write_iceberg.py:715 delete_from_iceberg_table —
    MERGE ... WHEN MATCHED THEN DELETE)."""
    view = f"__asps_delete_src_{abs(hash(target_table)) % 10**8}"
    source.select(*merge_cols).dropDuplicates().createOrReplaceTempView(view)
    on = " AND ".join(f"t.`{c}` <=> s.`{c}`" for c in merge_cols)
    spark.sql(
        f"MERGE INTO {target_table} t USING {view} s ON {on} WHEN MATCHED THEN DELETE"
    )
