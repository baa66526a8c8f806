"""URL decomposition for crawl curation — pure JVM (``try_parse_url`` +
string expressions), no UDF.

The WARC/Common-Crawl pipeline keys on URL structure: per-domain caps
(``cap_per_group`` on the registrable domain), scheme/path filters,
boilerplate-path pruning.  The reference has no URL operators (it moves
bytes, not crawls); this family feeds the curation ops above it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-label public suffixes that the last-two-label heuristic would
# get wrong; the common crawl-scale offenders (a full public-suffix
# list can be broadcast-joined the same way if needed)
_TWO_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "co.za", "com.sg",
)


def url_components(
    df: DataFrame,
    url_col: str = "url",
    *,
    out_prefix: str = "url",
) -> DataFrame:
    """Adds ``<p>_scheme``, ``<p>_host``, ``<p>_domain`` (registrable
    domain: last two host labels, or three over a known two-label
    public suffix — co.uk and friends), ``<p>_path``, ``<p>_depth``
    (path segment count), ``<p>_query`` — every column a codegen
    expression over Spark's ``try_parse_url``."""
    u = F.col(url_col)
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.try_parse_url(u, F.lit("PATH"))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    domain = (
        F.when(host.isNull() | (n <= 2), host)
        .when(last2.isin(*_TWO_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )
    depth = F.when(
        path.isNull() | (path == "") | (path == "/"), F.lit(0)
    ).otherwise(F.size(F.filter(F.split(path, "/"), lambda s: s != "")))
    return (
        df.withColumn(f"{out_prefix}_scheme", scheme)
        .withColumn(f"{out_prefix}_host", host)
        .withColumn(f"{out_prefix}_domain", domain)
        .withColumn(f"{out_prefix}_path", path)
        .withColumn(f"{out_prefix}_depth", depth.cast("int"))
        .withColumn(f"{out_prefix}_query", F.try_parse_url(u, F.lit("QUERY")))
    )


def domain_of(url_col) -> Column:
    """Registrable-domain Column for direct use as a ``cap_per_group``
    / ``groupBy`` key without materializing all components."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    return (
        F.when(host.isNull() | (n <= 2), host)
        .when(last2.isin(*_TWO_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )
