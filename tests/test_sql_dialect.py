"""Trino/Athena -> Spark SQL translation (sql_dialect.py)."""

from __future__ import annotations

import pytest

from aws_sdk_pandas_spark.exceptions import InvalidArgument
from aws_sdk_pandas_spark.sql_dialect import trino_to_spark_sql as tx


def test_double_quoted_identifiers_and_string_shield():
    assert tx('SELECT "order" FROM t WHERE x = \'a "quoted" str\'') == (
        "SELECT `order` FROM t WHERE x = 'a \"quoted\" str'"
    )
    # doubled "" inside a Trino identifier is a literal quote char
    assert tx('SELECT "we""ird" FROM t') == 'SELECT `we"ird` FROM t'


def test_date_diff_and_date_add():
    assert tx("SELECT date_diff('day', a, b) FROM t") == (
        "SELECT timestampdiff(DAY, a, b) FROM t"
    )
    assert tx("SELECT DATE_ADD('hour', 3, ts) FROM t") == (
        "SELECT timestampadd(HOUR, 3, ts) FROM t"
    )
    # Spark's own 2-arg date_add(date, n) must NOT be rewritten
    assert tx("SELECT date_add(d, 7) FROM t") == "SELECT date_add(d, 7) FROM t"
    with pytest.raises(InvalidArgument, match="unit"):
        tx("SELECT date_diff('fortnight', a, b) FROM t")


def test_function_renames():
    assert tx("SELECT approx_distinct(x), approx_percentile(v, 0.5) FROM t") == (
        "SELECT approx_count_distinct(x), percentile_approx(v, 0.5) FROM t"
    )
    assert tx("SELECT arbitrary(x), strpos(s, 'q') FROM t") == (
        "SELECT any_value(x), instr(s, 'q') FROM t"
    )
    assert tx("SELECT json_extract_scalar(j, '$.k') FROM t") == (
        "SELECT get_json_object(j, '$.k') FROM t"
    )
    assert tx("SELECT to_unixtime(ts) + 1 FROM t") == (
        "SELECT CAST(ts AS DOUBLE) + 1 FROM t"
    )


def test_try_cast_and_bare_try():
    assert tx("SELECT TRY(CAST(x AS BIGINT)) FROM t") == (
        "SELECT TRY_CAST(x AS BIGINT) FROM t"
    )
    # tier 3: top-level arithmetic maps to the try_* family
    assert tx("SELECT TRY(1 / x) FROM t") == "SELECT try_divide(1, x) FROM t"
    assert tx("SELECT TRY(a + b * c) FROM t") == "SELECT try_add(a, b * c) FROM t"
    assert tx("SELECT TRY(a - b + c) FROM t") == "SELECT try_add(a - b, c) FROM t"
    assert tx("SELECT TRY(a * b) FROM t") == "SELECT try_multiply(a, b) FROM t"
    assert tx("SELECT TRY((a + b) / nullif(c, 0)) FROM t") == (
        "SELECT try_divide((a + b), nullif(c, 0)) FROM t"
    )
    # unary minus is not a binary root
    assert tx("SELECT TRY(-a / b) FROM t") == "SELECT try_divide(-a, b) FROM t"
    assert tx("SELECT TRY(element_at(m, k)) FROM t") == (
        "SELECT try_element_at(m, k) FROM t"
    )
    # still refused: no mechanical equivalent
    with pytest.raises(InvalidArgument, match="no generic Spark"):
        tx("SELECT TRY(json_parse(x)) FROM t")
    with pytest.raises(InvalidArgument, match="no generic Spark"):
        tx("SELECT TRY(a || b) FROM t")


def test_unnest_rewrites_and_refusals():
    got = tx("SELECT c FROM t CROSS JOIN UNNEST(arr) AS u (c)")
    assert got == "SELECT c FROM t LATERAL VIEW explode(arr) u AS c"
    # WITH ORDINALITY: trailing 1-based position via sequence zip
    got = tx("SELECT * FROM t CROSS JOIN UNNEST(a) WITH ORDINALITY AS u(x, i)")
    assert "arrays_zip(a, IF(size(a) > 0, sequence(1, size(a)), array()))" in got
    got = tx("SELECT * FROM t CROSS JOIN UNNEST(a, b) WITH ORDINALITY AS u(x, y, i)")
    assert "greatest(size(a), size(b))" in got and "inline(arrays_zip(a, b, " in got
    got = tx("SELECT * FROM t CROSS JOIN UNNEST(m) WITH ORDINALITY AS u(k, v, i)")
    assert "map_keys(m), map_values(m)" in got
    with pytest.raises(InvalidArgument, match="ORDINALITY"):
        tx("SELECT * FROM t CROSS JOIN UNNEST(a) WITH ORDINALITY AS u(x)")
    # tier 3: map unnest (1 expr -> 2 cols)
    assert tx("SELECT * FROM t CROSS JOIN UNNEST(m) AS u(k, v)") == (
        "SELECT * FROM t LATERAL VIEW explode(m) u AS k, v"
    )
    # tier 3: multi-array zip unnest (n exprs -> n cols)
    assert tx("SELECT * FROM t CROSS JOIN UNNEST(a, b) AS u(x, y)") == (
        "SELECT * FROM t LATERAL VIEW inline(arrays_zip(a, b)) u AS x, y"
    )
    with pytest.raises(InvalidArgument, match="no mechanical Spark rewrite"):
        tx("SELECT * FROM t CROSS JOIN UNNEST(a, b) AS u(x, y, z)")


def test_weighted_approx_percentile_refused():
    assert tx("SELECT approx_percentile(v, 0.5) FROM t") == (
        "SELECT percentile_approx(v, 0.5) FROM t"
    )
    with pytest.raises(InvalidArgument, match="weighted"):
        tx("SELECT approx_percentile(v, w, 0.5) FROM t")


def test_map_agg_and_zip():
    assert tx("SELECT map_agg(k, v + 1) FROM t GROUP BY g") == (
        "SELECT map_from_entries(collect_list(struct(k, v + 1))) FROM t GROUP BY g"
    )
    assert tx("SELECT zip(a, b) FROM t") == "SELECT arrays_zip(a, b) FROM t"


def test_lambda_predicates_and_scalar_renames():
    assert tx("SELECT any_match(a, x -> x > 1), all_match(a, x -> x > 1) FROM t") == (
        "SELECT exists(a, x -> x > 1), forall(a, x -> x > 1) FROM t"
    )
    assert tx("SELECT none_match(a, x -> x > 1) FROM t") == (
        "SELECT (NOT exists(a, x -> x > 1)) FROM t"
    )
    assert tx("SELECT format('%s-%d', s, i) FROM t") == (
        "SELECT format_string('%s-%d', s, i) FROM t"
    )
    assert tx("SELECT to_utf8(s), from_utf8(b) FROM t") == (
        "SELECT encode(s, 'UTF-8'), decode(b, 'UTF-8') FROM t"
    )
    assert tx("SELECT is_nan(nan()), infinity() FROM t") == (
        "SELECT isnan(CAST('NaN' AS DOUBLE)), CAST('Infinity' AS DOUBLE) FROM t"
    )


def test_spark_sql_is_untouched():
    q = ("SELECT transform(a, x -> x + 1), element_at(m, 'k'), split_part(s, ',', 2), "
         "cardinality(a), regexp_like(s, 'p'), date_diff(b, a) FROM t WHERE s = 'it''s'")
    assert tx(q) == q


def test_executes_on_spark(spark):
    from aws_sdk_pandas_spark.sql import read_sql_query

    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-03 12:00:00", 10.0),
         (2, "2024-01-01 00:00:00", "2024-01-08 00:00:00", 30.0)],
        "id int, t1 string, t2 string, v double",
    ).selectExpr("id", "cast(t1 as timestamp) t1", "cast(t2 as timestamp) t2", "v") \
     .createOrReplaceTempView("trino_tv")
    q = """
        SELECT "id",
               date_diff('day', t1, t2) AS days,
               TRY(CAST('x' AS BIGINT)) AS bad,
               approx_distinct(v) AS nv
        FROM trino_tv
        GROUP BY "id", t1, t2
        ORDER BY "id"
    """
    rows = read_sql_query(spark, q, dialect="trino").collect()
    assert [(r.id, r.days, r.bad) for r in rows] == [(1, 2, None), (2, 7, None)]
    with pytest.raises(InvalidArgument, match="dialect"):
        read_sql_query(spark, "SELECT 1", dialect="duckdb")


def test_split_literal_delimiter():
    # Trino delimiters are literal; Spark's are regex — '.' must not
    # explode per character
    assert tx("SELECT split(s, '.') FROM t") == (
        "SELECT split(s, concat('\\\\Q', '.', '\\\\E')) FROM t"
    )
    # dynamic delimiter and the 3-arg limit form keep literal semantics
    assert tx("SELECT split(s, d, 2) FROM t") == (
        "SELECT split(s, concat('\\\\Q', d, '\\\\E'), 2) FROM t"
    )
    with pytest.raises(InvalidArgument, match="delimiter"):
        tx("SELECT split(s) FROM t")


def test_split_executes_literal(spark):
    from aws_sdk_pandas_spark.sql import read_sql_query

    df = spark.createDataFrame([("a.b.c",)], "s string")
    df.createOrReplaceTempView("split_probe")
    out = read_sql_query(
        spark, "SELECT split(s, '.') AS parts FROM split_probe", dialect="trino"
    ).first()
    assert out.parts == ["a", "b", "c"]


def test_from_unixtime_and_date_parse(spark):
    from aws_sdk_pandas_spark.sql import read_sql_query

    row = read_sql_query(
        spark,
        "SELECT from_unixtime(86400) AS t, "
        "date_parse('2021-07-04 12:30:05', '%Y-%m-%d %H:%i:%s') AS p",
        dialect="trino",
    ).first()
    import datetime

    assert row.t == datetime.datetime(1970, 1, 2, 0, 0)  # a TIMESTAMP, not a string
    assert row.p == datetime.datetime(2021, 7, 4, 12, 30, 5)
    # 2-arg zone form: the instant rendered at that zone's wall clock
    zoned = read_sql_query(
        spark,
        "SELECT from_unixtime(86400, 'America/New_York') AS t,"
        "       from_unixtime(86400, 'Asia/Tokyo') AS t2",
        dialect="trino",
    ).first()
    assert zoned.t == datetime.datetime(1970, 1, 1, 19, 0)   # UTC-5
    assert zoned.t2 == datetime.datetime(1970, 1, 2, 9, 0)   # UTC+9
    with pytest.raises(InvalidArgument, match="offset"):
        tx("SELECT from_unixtime(0, 5, 30) FROM t")
    with pytest.raises(InvalidArgument, match="no Spark mapping"):
        tx("SELECT date_parse(s, '%Q') FROM t")
    with pytest.raises(InvalidArgument, match="string-literal format"):
        tx("SELECT date_parse(s, f) FROM t")


def test_array_row_cast_and_misc_renames(spark):
    from aws_sdk_pandas_spark.sql import read_sql_query

    assert tx("SELECT ARRAY[1, 2, 3] FROM t") == "SELECT array(1, 2, 3) FROM t"
    assert tx("SELECT ARRAY[ARRAY[1], ARRAY[2]] FROM t") == (
        "SELECT array(array(1), array(2)) FROM t"
    )
    assert tx("SELECT ROW(1, 'a') FROM t") == "SELECT struct(1, 'a') FROM t"
    assert tx("SELECT CAST(x AS VARCHAR) FROM t") == "SELECT CAST(x AS STRING) FROM t"
    assert tx("SELECT CAST(x AS REAL), CAST(y AS VARBINARY) FROM t") == (
        "SELECT CAST(x AS FLOAT), CAST(y AS BINARY) FROM t"
    )
    assert tx("SELECT starts_with(s, 'a'), to_hex(b), levenshtein_distance(x, y) FROM t") == (
        "SELECT startswith(s, 'a'), hex(b), levenshtein(x, y) FROM t"
    )
    assert tx("SELECT format_datetime(ts, 'yyyy-MM-dd') FROM t") == (
        "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    )
    row = read_sql_query(
        spark,
        "SELECT element_at(ARRAY['x', 'y'], 1) AS first, "
        "CAST(7 AS VARCHAR) AS s, ROW(1, 2) AS r",
        dialect="trino",
    ).first()
    assert (row.first, row.s, row.r[0]) == ("x", "7", 1)


def test_sampling_fetch_and_subscript_refusal():
    assert tx("SELECT * FROM t TABLESAMPLE BERNOULLI(10)") == (
        "SELECT * FROM t TABLESAMPLE (10 PERCENT)"
    )
    assert tx("SELECT * FROM t FETCH FIRST 5 ROWS ONLY") == "SELECT * FROM t LIMIT 5"
    # tier 3: 1-based Trino subscripts become element_at (1-based in both)
    assert tx("SELECT a[1] FROM t") == "SELECT element_at(a, 1) FROM t"
    assert tx("SELECT t.a[i + 1] FROM t") == "SELECT element_at(t.a, i + 1) FROM t"
    assert tx("SELECT split(x, ',')[2] FROM t") == (
        "SELECT element_at(split(x, concat('\\\\Q', ',', '\\\\E')), 2) FROM t"
    )
    assert tx("SELECT a[1][2] FROM t") == (
        "SELECT element_at(element_at(a, 1), 2) FROM t"
    )
    # ARRAY literal + subscript composes
    assert tx("SELECT ARRAY[10, 20][2]") == "SELECT element_at(array(10, 20), 2)"


def test_tier3_executes_on_spark(spark):
    from aws_sdk_pandas_spark.sql import read_sql_query

    row = read_sql_query(
        spark,
        "SELECT ARRAY[10, 20, 30][2] AS sub, TRY(1 / 0) AS div0, "
        "TRY(CAST('x' AS BIGINT)) AS badcast",
        dialect="trino",
    ).first()
    assert row.sub == 20 and row.div0 is None and row.badcast is None
    # multi-array UNNEST zips positionally, NULL-padding the shorter
    rows = read_sql_query(
        spark,
        "SELECT x, y FROM (SELECT ARRAY[1, 2, 3] AS a, ARRAY['p', 'q'] AS b) "
        "CROSS JOIN UNNEST(a, b) AS u(x, y)",
        dialect="trino",
    ).collect()
    assert [(r.x, r.y) for r in rows] == [(1, "p"), (2, "q"), (3, None)]
    # map unnest
    rows2 = read_sql_query(
        spark,
        "SELECT k, v FROM (SELECT map(1, 'a', 2, 'b') AS m) "
        "CROSS JOIN UNNEST(m) AS u(k, v) ORDER BY k",
        dialect="trino",
    ).collect()
    assert [(r.k, r.v) for r in rows2] == [(1, "a"), (2, "b")]


def test_unnest_with_ordinality_executes(spark):
    from aws_sdk_pandas_spark.sql import read_sql_query

    # single array: ordinality is the 1-based trailing column
    rows = read_sql_query(
        spark,
        "SELECT x, i FROM (SELECT ARRAY['p', 'q', 'r'] AS a) "
        "CROSS JOIN UNNEST(a) WITH ORDINALITY AS u(x, i)",
        dialect="trino",
    ).collect()
    assert [(r.x, r.i) for r in rows] == [("p", 1), ("q", 2), ("r", 3)]
    # multi-array: ordinality runs over the MAX length, short side NULL-pads
    rows = read_sql_query(
        spark,
        "SELECT x, y, i FROM (SELECT ARRAY[1, 2, 3] AS a, ARRAY['p'] AS b) "
        "CROSS JOIN UNNEST(a, b) WITH ORDINALITY AS u(x, y, i)",
        dialect="trino",
    ).collect()
    assert [(r.x, r.y, r.i) for r in rows] == [(1, "p", 1), (2, None, 2), (3, None, 3)]
    # map: (key, value, ordinality)
    rows = read_sql_query(
        spark,
        "SELECT k, v, i FROM (SELECT map(1, 'a', 2, 'b') AS m) "
        "CROSS JOIN UNNEST(m) WITH ORDINALITY AS u(k, v, i) ORDER BY k",
        dialect="trino",
    ).collect()
    assert [(r.k, r.v, r.i) for r in rows] == [(1, "a", 1), (2, "b", 2)]
    # empty and NULL arrays unnest to zero rows (no sequence(1, 0) surprise)
    rows = read_sql_query(
        spark,
        "SELECT x, i FROM (SELECT CAST(ARRAY() AS ARRAY<INT>) AS a "
        "UNION ALL SELECT CAST(NULL AS ARRAY<INT>)) "
        "CROSS JOIN UNNEST(a) WITH ORDINALITY AS u(x, i)",
        dialect="trino",
    ).collect()
    assert rows == []


def test_date_format_mysql_tokens_and_week(spark):
    from aws_sdk_pandas_spark.sql import read_sql_query

    # Trino's date_format takes MySQL tokens; Spark's takes Java patterns
    assert tx("SELECT date_format(ts, '%Y-%m') FROM t") == (
        "SELECT date_format(ts, 'yyyy-MM') FROM t"
    )
    # already-Java patterns (no %) pass through untouched
    assert tx("SELECT date_format(ts, 'yyyy-MM') FROM t") == (
        "SELECT date_format(ts, 'yyyy-MM') FROM t"
    )
    # mixed: a skipped non-% call must not stop mapping a later % call
    assert tx(
        "SELECT date_format(a, 'yyyy'), date_format(b, '%d/%m/%Y') FROM t"
    ) == "SELECT date_format(a, 'yyyy'), date_format(b, 'dd/MM/yyyy') FROM t"
    assert tx("SELECT week(ts), last_day_of_month(d) FROM t") == (
        "SELECT weekofyear(ts), last_day(d) FROM t"
    )
    row = read_sql_query(
        spark,
        "SELECT date_format(date_parse('2021-07-04', '%Y-%m-%d'), '%d/%m/%Y') AS s",
        dialect="trino",
    ).first()
    assert row.s == "04/07/2021"
