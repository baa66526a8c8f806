"""Round-trip equality tests for the dataset readers/writers — the
reference's correctness oracle (SURVEY §5): write → read back → compare,
parametrized over formats × modes × partitioning × bucketing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark import sources
from aws_sdk_pandas_spark.exceptions import (
    InvalidArgument,
    InvalidArgumentCombination,
    NoFilesFound,
)



def _df1(spark, rows, schema):
    # ONE slice — a multi-slice local frame pays one Python-worker round
    # trip per slice per consuming action through coalesce(1) (measured
    # ~150 ms x defaultParallelism); same rows, same order, one file
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _rows(df, *cols):
    cols = cols or tuple(sorted(df.columns))
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_flat(spark, people_df, tmp_path, fmt):
    path = str(tmp_path / f"flat_{fmt}")
    reader = getattr(sources, f"read_{fmt}")
    writer = getattr(sources, f"to_{fmt}")
    if fmt == "csv":
        writer(people_df, path, header=True)
        got = reader(spark, path, header=True, schema=people_df.schema)
    else:
        writer(people_df, path)
        got = reader(spark, path) if fmt != "json" else reader(
            spark, path, schema=people_df.schema
        )
    assert _rows(got) == _rows(people_df)


def test_roundtrip_partitioned(spark, people_df, tmp_path):
    path = str(tmp_path / "ds")
    meta = sources.to_parquet(
        people_df, path, dataset=True, partition_cols=["country"], mode="overwrite"
    )
    assert meta["paths"], "written paths must be returned"
    assert set(tuple(v) for v in meta["partitions_values"].values()) == {
        ("us",),
        ("de",),
        ("fr",),
    }
    got = sources.read_parquet(spark, path, dataset=True)
    # partition col comes back as string-typed directory value; compare values
    assert sorted(r.country for r in got.collect()) == sorted(
        r.country for r in people_df.collect()
    )
    assert _rows(got, "id", "name", "score") == _rows(people_df, "id", "name", "score")


def test_partition_filter_prunes(spark, people_df, tmp_path):
    path = str(tmp_path / "ds")
    sources.to_parquet(people_df, path, dataset=True, partition_cols=["country"], mode="overwrite")
    got = sources.read_parquet(
        spark,
        path,
        dataset=True,
        partition_filter=lambda p: p["country"] in ("us", "fr"),
    )
    assert sorted(r.id for r in got.collect()) == [1, 2, 5]


def test_overwrite_partitions_mode(spark, people_df, tmp_path):
    path = str(tmp_path / "ds")
    sources.to_parquet(people_df, path, dataset=True, partition_cols=["country"], mode="overwrite")
    patch = people_df.where(F.col("country") == "us").withColumn("score", F.lit(99.0))
    sources.to_parquet(patch, path, dataset=True, partition_cols=["country"], mode="overwrite_partitions")
    got = sources.read_parquet(spark, path, dataset=True)
    us = {r.id: r.score for r in got.where("country = 'us'").collect()}
    assert us == {1: 99.0, 2: 99.0}
    # untouched partitions survive
    assert got.where("country = 'de'").count() == 2


def test_append_mode(spark, people_df, tmp_path):
    path = str(tmp_path / "ds")
    sources.to_parquet(people_df, path, dataset=True, mode="overwrite")
    sources.to_parquet(people_df, path, dataset=True, mode="append")
    assert sources.read_parquet(spark, path).count() == 10


def test_bucketing_layout(spark, people_df, tmp_path):
    """Hive-hash bucketing: bucket dirs exist, same key -> same bucket."""
    path = str(tmp_path / "ds")
    meta = sources.to_parquet(
        people_df, path, dataset=True, bucketing_info=(["id"], 2), mode="overwrite"
    )
    assert any("bucket=" in p for p in meta["paths"])
    got = sources.read_parquet(spark, path, dataset=True)
    assert got.select(F.countDistinct("bucket")).first()[0] <= 2
    assert _rows(got, "id", "name") == _rows(people_df, "id", "name")
    # deterministic: rewriting yields identical id->bucket assignment
    b1 = {r.id: r.bucket for r in got.collect()}
    sources.to_parquet(people_df, path, dataset=True, bucketing_info=(["id"], 2), mode="overwrite")
    b2 = {r.id: r.bucket for r in sources.read_parquet(spark, path, dataset=True).collect()}
    assert b1 == b2


def test_max_rows_by_file(spark, people_df, tmp_path):
    path = str(tmp_path / "ds")
    meta = sources.to_parquet(
        people_df.coalesce(1), path, dataset=True, mode="overwrite", max_rows_by_file=2
    )
    assert len(meta["paths"]) >= 3  # 5 rows / 2-per-file


def test_columns_and_dtype(spark, people_df, tmp_path):
    path = str(tmp_path / "flat")
    sources.to_parquet(people_df, path)
    got = sources.read_parquet(spark, path, columns=["id", "score"], dtype={"score": "string"})
    assert got.columns == ["id", "score"]
    assert dict(got.dtypes)["score"] == "string"


def test_invalid_args(spark, people_df, tmp_path):
    with pytest.raises(InvalidArgument):
        sources.to_parquet(people_df, str(tmp_path / "x"), dataset=True, mode="bogus")
    with pytest.raises(InvalidArgumentCombination):
        sources.to_parquet(people_df, str(tmp_path / "x"), dataset=False, partition_cols=["country"])
    with pytest.raises(NoFilesFound):
        sources.read_parquet(spark, str(tmp_path / "missing"))


def test_csv_dataset_roundtrip(spark, people_df, tmp_path):
    path = str(tmp_path / "csvds")
    sources.to_csv(
        people_df, path, dataset=True, partition_cols=["country"], mode="overwrite", header=True
    )
    got = sources.read_csv(spark, path, dataset=True, header=True)
    assert got.count() == 5
    assert set(got.columns) == set(people_df.columns)


def test_csv_pandas_fallback_converters(spark, tmp_path):
    """Untranslatable pandas kwargs (converters=, thousands=) must route
    through the per-file pandas fallback with identical pandas semantics."""
    import pandas as pd

    p1 = tmp_path / "a.csv"
    p2 = tmp_path / "b.csv"
    p1.write_text("id,amount,flag\n1,\"1,234\",y\n2,\"5,678\",n\n")
    p2.write_text("id,amount,flag\n3,\"9,000\",y\n")
    kwargs = dict(thousands=",", converters={"flag": lambda v: 1 if v == "y" else 0})
    got = sources.read_csv(spark, [str(p1), str(p2)], **kwargs)
    expect = pd.concat([pd.read_csv(p1, **kwargs), pd.read_csv(p2, **kwargs)])
    assert got.count() == 3
    rows = {r.id: (r.amount, r.flag) for r in got.collect()}
    for _, e in expect.iterrows():
        assert rows[e["id"]] == (e["amount"], e["flag"])


def test_csv_pandas_fallback_directory_and_nrows(spark, people_df, tmp_path):
    path = str(tmp_path / "csvdir")
    sources.to_csv(people_df, path, dataset=True, mode="overwrite", header=True)
    got = sources.read_csv(spark, path, skipfooter=0, engine="python", nrows=3)
    assert got.count() == 3


def test_json_lines_roundtrip(spark, people_df, tmp_path):
    path = str(tmp_path / "jsonds")
    sources.to_json(people_df, path, dataset=True, mode="overwrite")
    got = sources.read_json(spark, path, dataset=True)
    assert got.count() == 5


def test_fwf_read(spark, tmp_path):
    p = tmp_path / "fwf.txt"
    p.write_text("alice  10\nbob    20\ncarolx 30\n")
    got = sources.read_fwf(
        spark, str(p), widths=[7, 2], names=["name", "qty"]
    )
    rows = {r.name.strip(): r.qty.strip() for r in got.collect()}
    assert rows == {"alice": "10", "bob": "20", "carolx": "30"}


def test_list_objects_and_fs(spark, people_df, tmp_path):
    path = str(tmp_path / "fsds")
    sources.to_parquet(people_df, path, dataset=True, mode="overwrite")
    objs = sources.list_objects(spark, path)
    assert objs and all(o.endswith(".parquet") for o in objs if not o.endswith("_SUCCESS"))
    assert sources.does_object_exist(spark, objs[0])
    assert not sources.does_object_exist(spark, path + "/nope.parquet")
    data_files = [o for o in objs if o.endswith(".parquet")]
    sizes = sources.size_objects(spark, data_files[:1])
    assert all(v > 0 for v in sizes.values())


def test_partitioned_write_one_file_per_partition(spark, tmp_path):
    # 200 rows, 4 partition values, 32 input partitions: without the
    # pre-write repartition this writes up to 32*4 files
    df = spark.range(200).repartition(32).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS p"
    )
    path = str(tmp_path / "fpp1")
    res = sources.to_parquet(df, path, dataset=True, partition_cols=["p"], mode="overwrite")
    assert len(res["paths"]) == 4  # exactly one file per partition value


def test_partitioned_write_files_per_partition_salt(spark, tmp_path):
    df = spark.range(2000).repartition(32).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS p"
    )
    path = str(tmp_path / "fpp3")
    res = sources.to_parquet(
        df, path, dataset=True, partition_cols=["p"], mode="overwrite",
        files_per_partition=3,
    )
    per_part: dict[str, int] = {}
    for f in res["paths"]:
        key = f.split("/p=")[1].split("/")[0]
        per_part[key] = per_part.get(key, 0) + 1
    assert set(per_part) == {"0", "1"}
    assert all(1 <= n <= 3 for n in per_part.values())
    # all rows survive the salted layout
    assert sources.read_parquet(spark, path, dataset=True).count() == 2000


def test_all_null_column_roundtrip(spark, tmp_path):
    """SURVEY hard part 3: all-null columns must keep their declared type
    through write/read (the reference raises UndetectedType only when
    inferring from data; with an explicit schema nulls are fine)."""
    df = _df1(spark, [(1, None), (2, None)], "id bigint, maybe string"
    )
    path = str(tmp_path / "nulls")
    sources.to_parquet(df, path, dataset=True, mode="overwrite")
    back = sources.read_parquet(spark, path, dataset=True)
    assert dict(back.dtypes)["maybe"] == "string"
    assert back.where("maybe IS NULL").count() == 2


def test_empty_dataframe_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([], "id bigint, v double, s string")
    path = str(tmp_path / "empty")
    sources.to_parquet(df, path, dataset=True, mode="overwrite")
    back = sources.read_parquet(spark, path, dataset=True)
    assert back.count() == 0
    assert dict(back.dtypes) == {"id": "bigint", "v": "double", "s": "string"}


def test_nested_types_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1, 2], {"a": 1}, (1, "x")), (2, [], {}, (2, "y"))],
        "id bigint, arr array<int>, m map<string,int>, st struct<a:int,b:string>",
    )
    path = str(tmp_path / "nested")
    sources.to_parquet(df, path, dataset=True, mode="overwrite")
    back = sources.read_parquet(spark, path, dataset=True)
    assert dict(back.dtypes) == dict(df.dtypes)
    row = back.orderBy("id").first()
    assert row.arr == [1, 2] and row.m == {"a": 1} and row.st.b == "x"


def test_decimal_roundtrip(spark, tmp_path):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, Decimal("12345.6789")), (2, Decimal("-0.0001"))],
        "id bigint, d decimal(18,4)",
    )
    path = str(tmp_path / "dec")
    sources.to_parquet(df, path, dataset=True, mode="overwrite")
    back = sources.read_parquet(spark, path, dataset=True)
    assert dict(back.dtypes)["d"] == "decimal(18,4)"
    got = {r.id: r.d for r in back.collect()}
    assert got == {1: Decimal("12345.6789"), 2: Decimal("-0.0001")}


def test_chunked_exact_rows(spark, sf_dir):
    """chunked=int yields exact-row pandas chunks (reference carry-over
    slicing contract, s3/_read_parquet.py:259-282)."""
    it = sources.read_parquet(spark, f"{sf_dir}/nation.parquet", chunked=7)
    sizes = [len(c) for c in it]
    assert all(s == 7 for s in sizes[:-1])
    assert 0 < sizes[-1] <= 7
    assert sum(sizes) == 25


# ----------------------------------------------------------- data skipping
def test_file_stats_pruning_exact_and_effective(spark, tmp_path):
    from datetime import datetime

    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "li_sorted")
    # sort by shipdate so per-file min/max ranges are disjoint -> prunable
    (
        src.select("l_orderkey", "l_quantity", "l_shipdate")
        .orderBy("l_shipdate")
        .coalesce(1)
        .write.option("maxRecordsPerFile", 500)
        .parquet(out)
    )

    stats = sources.collect_file_stats(spark, out)
    total = stats.count()
    assert total >= 8
    assert {"l_shipdate__min", "l_shipdate__max", "num_rows"} <= set(stats.columns)

    lo, hi = datetime(1996, 1, 1), datetime(1996, 12, 31)
    kept = sources.prune_files(stats, {"l_shipdate": (lo, hi)})
    # a one-year slice of a seven-year sorted range must skip most files
    assert 0 < len(kept) < total

    pruned = sources.read_parquet_pruned(spark, out, {"l_shipdate": (lo, hi)})
    full = src.select("l_orderkey", "l_quantity", "l_shipdate").where(
        (F.col("l_shipdate") >= F.lit(lo)) & (F.col("l_shipdate") <= F.lit(hi))
    )
    assert pruned.count() == full.count()
    assert (
        pruned.agg(F.sum("l_quantity"), F.sum("l_orderkey")).collect()
        == full.agg(F.sum("l_quantity"), F.sum("l_orderkey")).collect()
    )


def test_prune_files_keeps_unknown_stats(spark, tmp_path):
    out = str(tmp_path / "strs")
    _df1(spark, [(1, "a"), (2, "b")], "k long, v string").write.parquet(out)
    stats = sources.collect_file_stats(spark, out)
    # nothing matches the range, but a file with NULL stats must survive
    import pandas as pd  # noqa: F401  (schema sanity only)
    null_stats = stats.withColumn("k__min", F.lit(None).cast("long")).withColumn(
        "k__max", F.lit(None).cast("long")
    )
    assert sources.prune_files(null_stats, {"k": (100, 200)}) != []


def test_avro_distributed_roundtrip(spark, tmp_path):
    """to_avro writes a real OCF (deflate) the JAVA Avro library can
    read; read_avro decodes a directory of containers DISTRIBUTED (one
    task per file) with the schema from the embedded writer schema."""
    import os

    from aws_sdk_pandas_spark import sources

    df = spark.createDataFrame(
        [
            (1, "héllo", 2.5, True, [1, 2], {"a": 10}),
            (2, None, None, False, [], {}),
        ],
        "k long, s string, x double, b boolean, arr array<long>, m map<string,long>",
    )
    d = str(tmp_path / "avdir")
    os.makedirs(d)
    sources.to_avro(df.where("k = 1"), f"{d}/a.avro")
    sources.to_avro(df.where("k = 2"), f"{d}/b.avro")

    back = sources.read_avro(spark, d)
    rows = {r.k: r for r in back.collect()}
    assert rows[1].s == "héllo" and rows[1].x == 2.5 and rows[1].b is True
    assert list(rows[1].arr) == [1, 2] and dict(rows[1].m) == {"a": 10}
    assert rows[2].s is None and list(rows[2].arr) == []
    # one input task per container file (distributed by construction)
    assert back.rdd.getNumPartitions() >= 1

    # cross-implementation: Java Avro reads the file we wrote
    jvm = spark._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(f"{d}/a.avro"),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    assert dfr.hasNext() and dfr.next().get("k") == 1
    dfr.close()
