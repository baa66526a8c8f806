"""CloudWatch Logs Insights query translator (reference: awswrangler/
cloudwatch.py:202 ``read_logs`` / :150 ``run_query``).

The reference ships an Insights query string to the CloudWatch service and
polls for rows.  Here the "service" is Spark: the piped Insights language
is compiled onto DataFrame operators over any logs DataFrame —

    fields a, b      -> select
    filter <pred>    -> where        (Insights predicate -> SQL expr)
    stats f(x) by g  -> groupBy(g).agg(f(x))
    sort x desc      -> orderBy
    limit n          -> limit
    parse            -> regexp_extract (named groups)

Supported stats functions: count, count_distinct, sum, avg, min, max,
pct(x, p) -> percentile_approx.  This is the §2.1 CloudWatch row of the
operator inventory; at scale the whole thing stays one declarative plan
(no driver-side row handling, unlike the reference's paginated fetch).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_STATS_FN = re.compile(
    r"^\s*(count|count_distinct|sum|avg|min|max|pct)\s*\(\s*([^)]*?)\s*(?:,\s*([\d.]+)\s*)?\)"
    r"(?:\s+as\s+(\w+))?\s*$",
    re.IGNORECASE,
)


def _compile_stat(expr: str):
    m = _STATS_FN.match(expr)
    if not m:
        raise InvalidArgument(f"unsupported stats expression: {expr!r}")
    fn, arg, extra, alias = m.group(1).lower(), m.group(2), m.group(3), m.group(4)
    if fn == "count":
        col = F.count(F.lit(1)) if arg in ("", "*") else F.count(arg)
    elif fn == "count_distinct":
        col = F.countDistinct(arg)
    elif fn == "pct":
        if extra is None:
            raise InvalidArgument("pct() requires (field, percentile)")
        col = F.percentile_approx(arg, float(extra) / 100.0)
    else:
        col = getattr(F, fn)(arg)
    default = f"{fn}_{arg.replace('*', 'all') or 'all'}".rstrip("_")
    return col.alias(alias or default)


def _insights_predicate(pred: str) -> str:
    """Insights predicate -> Spark SQL expression: ``like/not like`` with
    regex literals ``/.../`` -> RLIKE, ``=~`` -> RLIKE, ``isempty(x)``/
    ``ispresent(x)`` -> null checks; and/or/not pass through."""
    def _rx(fmt):
        # Spark SQL string literals eat single backslashes — double them
        return lambda m: fmt.format(m.group(1), m.group(2).replace("\\", "\\\\"))

    s = pred
    s = re.sub(r"(\w+)\s+not\s+like\s+/(.*?)/", _rx("NOT {0} RLIKE '{1}'"), s)
    s = re.sub(r"(\w+)\s+like\s+/(.*?)/", _rx("{0} RLIKE '{1}'"), s)
    s = re.sub(r"(\w+)\s*=~\s*/(.*?)/", _rx("{0} RLIKE '{1}'"), s)
    s = re.sub(r"(\w+)\s+like\s+('(?:[^']*)')", r"\1 LIKE concat('%', \2, '%')", s)
    s = re.sub(r"isempty\s*\(\s*(\w+)\s*\)", r"(\1 IS NULL OR \1 = '')", s)
    s = re.sub(r"ispresent\s*\(\s*(\w+)\s*\)", r"\1 IS NOT NULL", s)
    return s


def _split_pipes(query: str) -> list[str]:
    """Split on the Insights pipe, respecting ``/regex/`` literals and
    ``'quoted'`` strings (a ``|`` inside either is not a separator)."""
    parts: list[str] = []
    buf: list[str] = []
    in_regex = in_quote = False
    for ch in query:
        if ch == "'" and not in_regex:
            in_quote = not in_quote
        elif ch == "/" and not in_quote:
            in_regex = not in_regex
        if ch == "|" and not in_regex and not in_quote:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def run_query(df: DataFrame, query: str) -> DataFrame:
    """Execute an Insights query against a logs DataFrame
    (reference: cloudwatch.py:150 run_query — minus the polling loop,
    because the engine is local to the plan)."""
    out = df
    for raw in _split_pipes(query):
        verb, _, rest = raw.partition(" ")
        verb = verb.lower()
        rest = rest.strip()
        if verb == "fields":
            out = out.select(*[c.strip() for c in rest.split(",")])
        elif verb == "filter":
            out = out.where(F.expr(_insights_predicate(rest)))
        elif verb == "stats":
            agg_part, _, by_part = rest.partition(" by ")
            aggs = [_compile_stat(a) for a in agg_part.split(",")]
            keys = [k.strip() for k in by_part.split(",") if k.strip()] if by_part else []
            out = out.groupBy(*keys).agg(*aggs) if keys else out.agg(*aggs)
        elif verb == "sort":
            cols = []
            for piece in rest.split(","):
                name, _, direction = piece.strip().partition(" ")
                cols.append(
                    F.col(name).desc() if direction.strip().lower() == "desc" else F.col(name).asc()
                )
            out = out.orderBy(*cols)
        elif verb == "limit":
            out = out.limit(int(rest))
        elif verb == "parse":
            m = re.match(r"^(\w+)\s+/(.*)/$", rest)
            if not m:
                raise InvalidArgument(f"unsupported parse clause: {rest!r}")
            src_col, pattern = m.group(1), m.group(2)
            # Spark's regexp_extract takes Java regex — (?<name>...) as-is
            for i, name in enumerate(re.findall(r"\(\?<(\w+)>", pattern), start=1):
                out = out.withColumn(name, F.regexp_extract(F.col(src_col), pattern, i))
        else:
            raise InvalidArgument(f"unsupported Insights verb: {verb!r}")
    return out


def read_logs(
    df: DataFrame,
    query: str,
    *,
    start_time=None,
    end_time=None,
    time_col: str = "ts",
    limit: int | None = None,
) -> DataFrame:
    """reference: cloudwatch.py:202 ``read_logs`` — time-window scoping +
    query + limit."""
    out = df
    if start_time is not None:
        out = out.where(F.col(time_col) >= F.lit(start_time))
    if end_time is not None:
        out = out.where(F.col(time_col) < F.lit(end_time))
    out = run_query(out, query)
    if limit is not None:
        out = out.limit(limit)
    return out


# ---------------------------------------------------------------------------
# Execution-id surface + raw event access
# (reference: cloudwatch.py:31 start_query, :102 wait_query,
#  :266 describe_log_streams, :373 filter_log_events)
# ---------------------------------------------------------------------------

_QUERIES: dict[str, DataFrame] = {}


def start_query(
    df: DataFrame,
    query: str,
    *,
    start_time=None,
    end_time=None,
    limit: int | None = None,
    time_col: str = "ts",
) -> str:
    """reference: cloudwatch.py:31 ``start_query`` — returns a query id.
    The plan is registered (lazily — nothing executes until fetched),
    standing in for the service-side asynchronous execution."""
    import uuid

    out = read_logs(
        df, query, start_time=start_time, end_time=end_time, time_col=time_col, limit=limit
    )
    query_id = str(uuid.uuid4())
    _QUERIES[query_id] = out
    return query_id


def wait_query(query_id: str) -> DataFrame:
    """reference: cloudwatch.py:102 ``wait_query`` — the local engine is
    synchronous, so the registered result is returned directly."""
    try:
        return _QUERIES[query_id]
    except KeyError:
        raise InvalidArgument(
            f"unknown query_id {query_id!r} (queries are registered by "
            "start_query in this session)"
        ) from None


def describe_log_streams(
    df: DataFrame,
    log_stream_name_prefix: str | None = None,
    order_by: str | None = "LogStreamName",
    descending: bool | None = False,
    limit: int | None = 50,
    *,
    stream_col: str = "log_stream",
    time_col: str = "ts",
    message_col: str = "message",
) -> DataFrame:
    """reference: cloudwatch.py:266 ``describe_log_streams`` — one
    aggregation over the events table, mirroring the API's response
    fields (name, first/last event time, stored bytes)."""
    out = df
    if log_stream_name_prefix is not None:
        out = out.where(F.col(stream_col).startswith(log_stream_name_prefix))
    agg = out.groupBy(F.col(stream_col).alias("logStreamName")).agg(
        F.min(time_col).alias("firstEventTimestamp"),
        F.max(time_col).alias("lastEventTimestamp"),
        F.sum(F.length(message_col)).alias("storedBytes"),
    )
    if order_by == "LastEventTime":
        key = F.col("lastEventTimestamp")
    elif order_by in (None, "LogStreamName"):
        key = F.col("logStreamName")
    else:
        raise InvalidArgument("order_by must be 'LogStreamName' or 'LastEventTime'")
    agg = agg.orderBy(key.desc() if descending else key.asc())
    return agg.limit(limit) if limit is not None else agg


def _filter_pattern_predicate(pattern: str, message_col: str):
    """CloudWatch filter-pattern subset -> Column predicate:
    unquoted terms all match (AND), ``"quoted phrase"`` matches exactly,
    ``-term`` excludes, ``?term`` means any-of (OR across ?-terms)."""
    terms = re.findall(r'"([^"]*)"|(\S+)', pattern)
    musts, nots, anys = [], [], []
    for quoted, bare in terms:
        if quoted:
            musts.append(quoted)
        elif bare.startswith("-"):
            nots.append(bare[1:])
        elif bare.startswith("?"):
            anys.append(bare[1:])
        else:
            musts.append(bare)
    pred = F.lit(True)
    for t in musts:
        pred = pred & F.col(message_col).contains(t)
    for t in nots:
        pred = pred & ~F.col(message_col).contains(t)
    if anys:
        any_pred = F.lit(False)
        for t in anys:
            any_pred = any_pred | F.col(message_col).contains(t)
        pred = pred & any_pred
    return pred


def filter_log_events(
    df: DataFrame,
    log_stream_name_prefix: str | None = None,
    log_stream_names: list[str] | None = None,
    filter_pattern: str | None = None,
    start_time=None,
    end_time=None,
    *,
    stream_col: str = "log_stream",
    time_col: str = "ts",
    message_col: str = "message",
) -> DataFrame:
    """reference: cloudwatch.py:373 ``filter_log_events`` — raw event scan
    with stream/pattern/time pruning, all as Column predicates (the time
    and stream filters prune partitions when the events table is laid out
    by date/stream)."""
    if log_stream_name_prefix is not None and log_stream_names is not None:
        raise InvalidArgument(
            "cannot pass both log_stream_names and log_stream_name_prefix"
        )
    out = df
    if log_stream_name_prefix is not None:
        out = out.where(F.col(stream_col).startswith(log_stream_name_prefix))
    if log_stream_names is not None:
        out = out.where(F.col(stream_col).isin(log_stream_names))
    if filter_pattern:
        out = out.where(_filter_pattern_predicate(filter_pattern, message_col))
    if start_time is not None:
        out = out.where(F.col(time_col) >= F.lit(start_time))
    if end_time is not None:
        out = out.where(F.col(time_col) <= F.lit(end_time))
    return out
