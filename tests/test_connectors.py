"""Specialty connectors: S3-Select front door, Excel (injected engine),
copy/merge, DynamoDB expression compiler, Timestream long format,
OpenSearch DSL, Neptune graph frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark import sources
from aws_sdk_pandas_spark.connectors import dynamodb, neptune, opensearch, timestream
from aws_sdk_pandas_spark.exceptions import InvalidArgument


# --------------------------------------------------------------------- select
def test_select_query_parquet(spark, people_df, tmp_path):
    path = str(tmp_path / "sel")
    sources.to_parquet(people_df, path)
    got = sources.select_query(
        spark,
        'SELECT s.id, s.name FROM s3object s WHERE s.score > 5 ORDER BY s.id',
        path,
        "Parquet",
    )
    assert [r.id for r in got.collect()] == [1, 3]


def test_select_query_csv(spark, people_df, tmp_path):
    path = str(tmp_path / "selcsv")
    sources.to_csv(people_df, path, header=True)
    got = sources.select_query(
        spark,
        "SELECT COUNT(*) AS n FROM s3object",
        path,
        "CSV",
        {"FileHeaderInfo": "Use"},
    )
    assert got.first().n == 5


# ---------------------------------------------------------------------- excel
def test_excel_roundtrip_with_injected_engine(spark, people_df, tmp_path):
    import pandas as pd

    store: dict[str, pd.DataFrame] = {}

    def fake_writer(pdf, path, **kw):
        store[path] = pdf

    def fake_reader(path, **kw):
        return store[path]

    p = str(tmp_path / "x.xlsx")
    sources.to_excel(people_df, p, pandas_writer=fake_writer)
    got = sources.read_excel(spark, p, pandas_reader=fake_reader)
    assert got.count() == 5


def test_excel_real_roundtrip_stdlib_codec(spark, tmp_path):
    """No engine in this container: the stdlib SpreadsheetML codec must
    write and read a REAL .xlsx — types, unicode, XML specials, NULLs,
    and bools survive the round trip."""
    df = spark.createDataFrame(
        [
            (1, 2.5, "héllo <&> \"quoted\"", True),
            (2, None, None, False),
            (3, -0.125, "tab\tand\nnewline", None),
        ],
        "k int, x double, s string, b boolean",
    )
    p = str(tmp_path / "real.xlsx")
    sources.to_excel(df, p, index=False)
    import zipfile

    with zipfile.ZipFile(p) as z:  # a genuine zip package with the parts
        names = set(z.namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names
    got = sources.read_excel(spark, p)
    assert [f for f in got.columns] == ["k", "x", "s", "b"]
    rows = sorted(got.collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == [1, 2, 3]
    assert rows[0].x == 2.5 and rows[1].x is None
    assert rows[0].s == 'héllo <&> "quoted"'
    assert rows[2].s == "tab\tand\nnewline"
    assert (rows[0].b, rows[1].b, rows[2].b) == (True, False, None)
    # pandas' default index column appears when index=True
    sources.to_excel(df, p, index=True)
    got_ix = sources.read_excel(spark, p)
    assert got_ix.columns[0] == "col0"  # unnamed index header
    # engine-only kwargs refuse loudly instead of silently differing
    with pytest.raises(InvalidArgument, match="openpyxl"):
        sources.to_excel(df, p, float_format="%.2f")
    with pytest.raises(InvalidArgument, match="openpyxl"):
        sources.read_excel(spark, p, dtype={"k": str})


def test_excel_reader_parses_handwritten_spreadsheetml(spark, tmp_path):
    """Reader vs the ECMA-376 spec, not vs our writer: a hand-written
    package with a sharedStrings table, rich-text runs, shared/bool/
    inline/str/numeric cell types, a gap cell, and two sheets."""
    import zipfile

    p = str(tmp_path / "hand.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/></Types>')
        z.writestr("_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>')
        z.writestr("xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
            '<sheet name="alpha" sheetId="1" r:id="rId1"/>'
            '<sheet name="beta" sheetId="2" r:id="rId2"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/></Relationships>')
        z.writestr("xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst xmlns="{ns}" count="2" uniqueCount="2">'
            '<si><t>name</t></si>'
            '<si><r><t>rich</t></r><r><t xml:space="preserve"> text</t></r></si></sst>')
        z.writestr("xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>flag</t></is></c><c r="C1" t="str"><v>num</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="b"><v>1</v></c><c r="C2"><v>2.5</v></c></row>'
            '<row r="3"><c r="A3" t="inlineStr"><is><t>plain</t></is></c><c r="C3"><v>7</v></c></row>'
            "</sheetData></worksheet>")
        z.writestr("xl/worksheets/sheet2.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="inlineStr"><is><t>only</t></is></c></row>'
            '<row r="2"><c r="A2"><v>42</v></c></row>'
            "</sheetData></worksheet>")
    got = sources.read_excel(spark, p).collect()
    by_name = {r["name"]: r for r in got}
    assert by_name["rich text"].flag is True          # rich-text runs concat
    assert by_name["rich text"].num == 2.5            # numeric column typed
    assert by_name["plain"].flag is None              # B3 gap -> NULL
    assert by_name["plain"].num == 7.0
    # second sheet by name and by index agree
    s2a = sources.read_excel(spark, p, sheet_name="beta").collect()
    s2b = sources.read_excel(spark, p, sheet_name=1).collect()
    assert [r.only for r in s2a] == [r.only for r in s2b] == [42]
    with pytest.raises(InvalidArgument, match="not found"):
        sources.read_excel(spark, p, sheet_name="gamma")


# ----------------------------------------------------------------- copy/merge
def test_copy_and_merge_datasets(spark, people_df, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sources.to_parquet(people_df, src, dataset=True, partition_cols=["country"], mode="overwrite")

    copied = sources.merge_datasets(spark, src, dst, mode="append")
    assert copied and sources.read_parquet(spark, dst, dataset=True).count() == 5

    # overwrite_partitions: only the us partition is replaced
    us_only = people_df.where("country = 'us'").withColumn("score", F.lit(1.0))
    src2 = str(tmp_path / "src2")
    sources.to_parquet(us_only, src2, dataset=True, partition_cols=["country"], mode="overwrite")
    sources.merge_datasets(spark, src2, dst, mode="overwrite_partitions")
    got = sources.read_parquet(spark, dst, dataset=True)
    assert got.count() == 5
    assert got.where("country = 'us'").select(F.min("score")).first()[0] == 1.0


# ------------------------------------------------------------------- dynamodb
@pytest.fixture()
def ddb_items(spark):
    return spark.createDataFrame(
        [
            ("u1", "2024-01-01", "click", 5),
            ("u1", "2024-01-02", "view", 9),
            ("u2", "2024-01-01", "click", 3),
            ("u3", "2024-02-01", "purchase", 50),
        ],
        "pk string, sk string, kind string, amount bigint",
    )


def test_read_items_key_condition(spark, ddb_items):
    got = dynamodb.read_items(
        spark,
        ddb_items,
        key_condition_expression="pk = :p AND begins_with(sk, :prefix)",
        expression_attribute_values={":p": "u1", ":prefix": "2024-01"},
    )
    assert got.count() == 2


def test_read_items_filter_and_projection(spark, ddb_items):
    got = dynamodb.read_items(
        spark,
        ddb_items,
        partition_key="pk",
        partition_values=["u1", "u2"],
        filter_expression="#a > :lo AND attribute_exists(kind)",
        expression_attribute_values={":lo": 4},
        expression_attribute_names={"#a": "amount"},
        columns=["pk", "amount"],
        max_items_evaluated=10,
    )
    rows = got.collect()
    assert sorted((r.pk, r.amount) for r in rows) == [("u1", 5), ("u1", 9)]
    assert got.columns == ["pk", "amount"]


def test_read_items_requires_scan_optin(spark, ddb_items):
    with pytest.raises(InvalidArgument, match="allow_full_scan"):
        dynamodb.read_items(spark, ddb_items)
    assert dynamodb.read_items(spark, ddb_items, allow_full_scan=True).count() == 4


def test_ddb_put_delete(spark, ddb_items, tmp_path):
    path = str(tmp_path / "ddb")
    dynamodb.put_df(
        ddb_items.unionByName(ddb_items), path,
        overwrite_by_pkeys=["pk", "sk"], mode="overwrite",
    )
    assert spark.read.parquet(path).count() == 4
    dynamodb.delete_items(
        spark, path, ddb_items.where("pk = 'u1'"), ["pk", "sk"]
    )
    assert spark.read.parquet(path).count() == 2


# ------------------------------------------------------------------ timestream
def test_timestream_write_query_unload(spark, tmp_path):
    path = str(tmp_path / "ts")
    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", "host1", 0.5, 1),
            ("2024-01-01 10:00:00", "host1", 0.9, 2),  # newer version wins
            ("2024-01-02 10:00:00", "host2", 0.7, 1),
        ],
        "time string, host string, cpu double, ver bigint",
    ).withColumn("time", F.to_timestamp("time"))
    timestream.write(
        df, path, time_col="time", dimensions_cols=["host"],
        measure_cols=["cpu"], version_col="ver", mode="overwrite",
    )
    tbl = spark.read.parquet(path)
    assert tbl.count() == 2
    assert tbl.where("host = 'host1'").first().cpu == 0.9
    # date partitioning for time-range pruning
    assert any("__date=" in f for f in sources.list_objects(spark, path))

    tbl.createOrReplaceTempView("ts_metrics")
    got = timestream.query(spark, "SELECT host, MAX(cpu) AS mx FROM ts_metrics GROUP BY host")
    assert got.count() == 2

    out = str(tmp_path / "unload")
    landed = timestream.unload(spark, "SELECT * FROM ts_metrics", out)
    assert landed.count() == 2


def test_timestream_validates_columns(spark, tmp_path):
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(InvalidArgument):
        timestream.write(
            df, str(tmp_path / "bad"), time_col="time",
            dimensions_cols=["host"], measure_cols=["cpu"],
        )


# ------------------------------------------------------------------ opensearch
@pytest.fixture()
def os_docs(spark):
    return spark.createDataFrame(
        [
            (1, "quick brown fox", "animals", 10),
            (2, "lazy dog sleeps", "animals", 20),
            (3, "spark shuffles data", "tech", 30),
            (4, None, "tech", 40),
        ],
        "id bigint, body string, category string, score bigint",
    )


def test_opensearch_dsl(os_docs):
    got = opensearch.search(
        os_docs,
        search_body={
            "query": {
                "bool": {
                    "must": [{"range": {"score": {"gte": 10, "lt": 40}}}],
                    "should": [
                        {"match": {"body": "fox"}},
                        {"term": {"category": "tech"}},
                    ],
                    "must_not": [{"term": {"id": 2}}],
                }
            }
        },
        filter_path=["id", "category"],
    )
    assert sorted(r.id for r in got.collect()) == [1, 3]


def test_opensearch_wildcard_exists_prefix(os_docs):
    assert opensearch.search(os_docs, search_body={"query": {"exists": {"field": "body"}}}).count() == 3
    assert opensearch.search(os_docs, search_body={"query": {"wildcard": {"body": "*shuffle*"}}}).count() == 1
    assert opensearch.search(os_docs, search_body={"query": {"prefix": {"body": "lazy"}}}).count() == 1


def test_opensearch_index_df(os_docs, spark, tmp_path):
    path = str(tmp_path / "osidx")
    opensearch.index_df(os_docs.unionByName(os_docs), path, id_keys=["id"], mode="overwrite")
    assert spark.read.parquet(path).count() == 4


# --------------------------------------------------------------------- neptune
def test_neptune_graph(spark, tmp_path):
    v = spark.createDataFrame(
        [("v1", "person", "alice"), ("v2", "person", "bob"), ("v3", "city", "berlin")],
        ["~id", "~label", "name"],
    )
    e = spark.createDataFrame(
        [("e1", "knows", "v1", "v2"), ("e2", "lives_in", "v1", "v3"), ("e3", "lives_in", "v2", "v3")],
        ["~id", "~label", "~from", "~to"],
    )
    path = str(tmp_path / "graph")
    out = neptune.to_property_graph(v, e, path, mode="overwrite")
    assert set(out) == {"vertices", "edges"}
    v2, e2 = neptune.read_property_graph(spark, path)
    assert v2.count() == 3 and "~id" in v2.columns

    deg = {r["~id"]: (r.in_degree, r.out_degree) for r in neptune.degrees(e).collect()}
    assert deg["v3"] == (2, 0) and deg["v1"] == (0, 2)

    nb = neptune.neighbors(e, ["v1"], direction="out")
    assert sorted(r["~id"] for r in nb.collect()) == ["v2", "v3"]

    with pytest.raises(InvalidArgument):
        neptune.to_property_graph(spark.createDataFrame([("x",)], ["a"]), None, path)


def test_neptune_flatten(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": {"c": "x"}})],
        "id bigint, props struct<a: bigint, b: struct<c: string>>",
    )
    flat = neptune.flatten_nested_df(df)
    assert set(flat.columns) == {"id", "props_a", "props_b_c"}
    assert flat.first().props_b_c == "x"


def test_ddb_put_items_csv_json(spark, tmp_path):
    """put_items / put_csv / put_json land through the same writer as
    put_df (reference: dynamodb/_write.py:221,76,32)."""
    import pandas as pd

    from aws_sdk_pandas_spark.connectors import dynamodb as D

    tbl = f"file://{tmp_path}/items"
    D.put_items(
        spark,
        [{"pk": 1, "v": "a"}, {"pk": 2, "v": "b"}, {"pk": 2, "v": "c"}],
        tbl,
        overwrite_by_pkeys=["pk"],
    )
    assert spark.read.parquet(tbl).count() == 2  # pk=2 deduped, last wins

    csv_file = tmp_path / "in.csv"
    pd.DataFrame({"pk": [10, 11], "v": ["x", "y"]}).to_csv(csv_file, index=False)
    D.put_csv(spark, f"file://{csv_file}", tbl)
    assert spark.read.parquet(tbl).count() == 4

    json_file = tmp_path / "in.json"
    json_file.write_text('{"pk": 20, "v": "z"}\n')
    D.put_json(spark, f"file://{json_file}", tbl)
    assert spark.read.parquet(tbl).count() == 5


def test_opensearch_index_documents_csv_json(spark, tmp_path):
    import pandas as pd

    from aws_sdk_pandas_spark.connectors import opensearch as O

    idx = f"file://{tmp_path}/idx"
    O.index_documents(spark, [{"_id": 1, "t": "a"}, {"_id": 1, "t": "b"}], idx, id_keys=["_id"])
    assert spark.read.parquet(idx).count() == 1

    csv_file = tmp_path / "docs.csv"
    pd.DataFrame({"_id": [2, 3], "t": ["c", "d"]}).to_csv(csv_file, index=False)
    O.index_csv(spark, f"file://{csv_file}", idx)
    json_file = tmp_path / "docs.json"
    json_file.write_text('{"_id": 4, "t": "e"}\n')
    O.index_json(spark, f"file://{json_file}", idx)
    assert spark.read.parquet(idx).count() == 4


def test_fs_upload_download(spark, tmp_path):
    from aws_sdk_pandas_spark.sources import fs as FS

    local = tmp_path / "payload.bin"
    local.write_bytes(b"hello spark fs")
    remote = f"file://{tmp_path}/remote/payload.bin"
    FS.upload(spark, str(local), remote)
    assert FS.does_object_exist(spark, remote)

    back = tmp_path / "back.bin"
    FS.download(spark, remote, str(back))
    assert back.read_bytes() == b"hello spark fs"


def test_neptune_bulk_load_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.connectors import neptune as N

    verts = spark.createDataFrame(
        [("v1", "person"), ("v2", "person")], "`~id` string, `~label` string"
    )
    out = N.bulk_load(verts, None, f"file://{tmp_path}/graph")
    back = N.bulk_load_from_files(spark, out["vertices"], kind="vertices")
    assert sorted(r["~id"] for r in back.collect()) == ["v1", "v2"]


def test_timestream_unload_to_files(spark, tmp_path):
    from aws_sdk_pandas_spark.connectors import timestream as T

    spark.range(5).createOrReplaceTempView("tiny_ts")
    path = f"file://{tmp_path}/ts_unload"
    T.unload_to_files(spark, "SELECT id FROM tiny_ts", path)
    assert spark.read.parquet(path).count() == 5


def test_ddb_execute_statement_and_get_table(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.connectors import dynamodb as D
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    import pytest

    tbl = f"file://{tmp_path}/es_items"
    D.put_items(spark, [{"pk": 1, "v": "a"}, {"pk": 2, "v": "b"}], tbl)
    D.get_table(spark, tbl).createOrReplaceTempView("es_items")
    got = D.execute_statement(
        spark, "SELECT pk, v FROM es_items WHERE pk = ?", parameters=[2]
    ).collect()
    assert [(r.pk, r.v) for r in got] == [(2, "b")]
    with pytest.raises(InvalidArgument):
        D.execute_statement(spark, "DELETE FROM es_items WHERE pk = 1")


def test_timestream_mgmt_and_batch_load_from_files(spark, tmp_path):
    from aws_sdk_pandas_spark.connectors import timestream as T

    assert T.create_database(spark, "ts_mgmt_db") == "ts_mgmt_db"
    assert "ts_mgmt_db" in T.list_databases(spark)
    try:
        T.create_table(spark, "ts_mgmt_db", "metrics", path=f"{tmp_path}/metrics_tbl")
        assert "metrics" in T.list_tables(spark, "ts_mgmt_db")
        T.delete_table(spark, "ts_mgmt_db", "metrics")
        assert "metrics" not in T.list_tables(spark, "ts_mgmt_db")
    finally:
        T.delete_database(spark, "ts_mgmt_db")

    import pandas as pd

    staging = tmp_path / "stage.csv"
    pd.DataFrame({
        "ts": ["2026-01-01 00:00:00", "2026-01-01 00:01:00"],
        "host": ["a", "b"], "cpu": [0.5, 0.7],
    }).to_csv(staging, index=False)
    out_tbl = f"file://{tmp_path}/ts_loaded"
    T.batch_load_from_files(
        spark, f"file://{staging}", out_tbl,
        time_col="ts", dimensions_cols=["host"], measure_cols=["cpu"],
    )
    assert spark.read.parquet(out_tbl).count() == 2
    assert T.wait_batch_load_task(spark, "t1")["TaskStatus"] == "SUCCEEDED"


def test_opensearch_index_mgmt(spark, tmp_path):
    from aws_sdk_pandas_spark.connectors import opensearch as O

    client = O.connect(f"file://{tmp_path}/search")
    O.create_index(spark, client, "docs_idx")
    O.index_documents(spark, [{"_id": 1, "t": "x"}], client.index_path("docs_idx"))
    assert spark.read.parquet(client.index_path("docs_idx")).count() == 1
    O.delete_index(spark, client, "docs_idx")
    from aws_sdk_pandas_spark.sources import fs as FS
    assert not FS.does_object_exist(spark, client.index_path("docs_idx"))


def test_neptune_rdf_roundtrip(spark, tmp_path):
    import pytest

    from aws_sdk_pandas_spark.connectors import neptune as N

    triples = spark.createDataFrame(
        [("<a>", "<knows>", "<b>"), ("<b>", "<knows>", "<c>")], "s string, p string, o string"
    )
    path = f"file://{tmp_path}/rdf"
    N.to_rdf_graph(triples, path, mode="overwrite")
    back = N.read_rdf_graph(spark, path)
    assert back.count() == 2
    got = N.execute_sparql(
        {"root": path}, "SELECT * WHERE { ?s ?p ?o } ORDER BY ?s", spark=spark
    )
    assert [tuple(r) for r in got.collect()] == [
        ("<a>", "<knows>", "<b>"),
        ("<b>", "<knows>", "<c>"),
    ]


# ------------------------------------------------------------- parity fills
def test_opensearch_create_collection(spark, tmp_path):
    from aws_sdk_pandas_spark.connectors import opensearch as oss

    out = oss.create_collection(spark, "col1", root=str(tmp_path))
    assert out["status"] == "ACTIVE"
    import os
    assert os.path.isdir(tmp_path / "col1")


def test_redshift_connect_temp_descriptor():
    from aws_sdk_pandas_spark.databases import redshift

    con = redshift.connect_temp(
        "jdbc:redshift://h:5439/db", "analyst",
        duration_seconds=600, db_groups=["g1", "g2"],
    )
    assert con.user == "analyst"
    props = con.jdbc_properties()
    assert props["asps.temp_credentials"] == "true"
    assert props["asps.temp_db_groups"] == "g1,g2"
