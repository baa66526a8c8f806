"""URL / domain analytics for web-corpus curation — the provenance axis
of the C4/RefinedWeb/CCNet recipes (cap any one domain's share, drop
blocklisted hosts, report where the corpus actually comes from).

Everything here is pure JVM codegen (``parse_url`` + array/regexp
built-ins) — no UDF, scan-speed at any scale:

- :func:`url_features` — host, registered domain (PSL-lite: the common
  two-level public suffixes), subdomain depth, path depth, scheme, port,
  IP-literal hosts, tracking-parameter detection; NULL/unparseable URLs
  yield NULL features and the row passes through
- :func:`domain_stats` — per-registered-domain volume/share report
- :func:`filter_domains` — allow/block by registered domain INCLUDING
  subdomains (``ads.example.com`` matches a blocked ``example.com``)
- :func:`cap_domains` — at most ``max_per_domain`` docs per registered
  domain, md5-deterministic pick (the anti-monoculture cap: one keyed
  window, engine-rederivable, no global sort)

The registered-domain rule defaults to a SMALL builtin suffix table
(the frequent ccTLD second-level suffixes) so the operators are
zero-dependency; where a corpus needs the REAL rules — ``github.io``
subdomains are independent sites, ``*.ck`` wildcards, ``!www.ck``
exceptions — pass ``psl=`` (a rules file path, the rule lines, or a
pre-parsed :class:`PublicSuffixList`) and the full longest-match
algorithm runs instead, still as pure map-only codegen (the rule sets
compile to hash-set ``InSet`` lookups, one per label depth).
``extra_suffixes`` extends the builtin table for quick one-offs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _xml_unescape(col: Column) -> Column:
    """Decode the XML/HTML character entities that appear in attribute
    values and XML text nodes — ``&amp;`` is MANDATORY escaping for
    ``&`` in XML, so every sitemap ``<loc>`` and href with a multi-param
    query string carries it; leaving it raw produces wrong URLs that
    poison url_features/dedup_urls keys downstream.  Covers the five
    XML named entities, the common numeric apostrophe/quote/amp forms
    and ``&nbsp;``; exotic numeric character references pass through
    unchanged (documented boundary).  Pure codegen literal replaces.

    The ``&amp;`` family decodes LAST so double-escaped text stays
    literal: ``&amp;lt;`` means the four characters ``&lt;`` and must
    NOT cascade into ``<``."""
    for pat, rep in [
        ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#34;", '"'), ("&#x22;", '"'),
        ("&apos;", "'"), ("&#39;", "'"), ("&#x27;", "'"),
        ("&nbsp;", " "), ("&#160;", " "),
        ("&#38;", "&"), ("&#x26;", "&"), ("&amp;", "&"),
    ]:
        col = F.replace(col, F.lit(pat), F.lit(rep))
    return col


# frequent two-level public suffixes (under these, the REGISTERED domain
# is three labels: foo.co.uk) — extend per-call via extra_suffixes
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "gen.in",
    "co.kr", "ne.kr", "or.kr",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.za", "co.nz", "co.il", "co.id", "co.th",
]


@dataclass(frozen=True)
class PublicSuffixList:
    """Parsed Public Suffix List rules (publicsuffix.org/list format):
    ``exact`` plain rules, ``wildcards`` the parents of ``*.`` rules,
    ``exceptions`` the names of ``!`` rules, ``max_labels`` the longest
    rule's label count.  Build with :func:`load_psl`."""

    exact: frozenset
    wildcards: frozenset
    exceptions: frozenset
    max_labels: int


def load_psl(
    rules: "str | list[str]", *, include_private: bool = True
) -> PublicSuffixList:
    """Parse Public Suffix List rules into :class:`PublicSuffixList`.

    ``rules`` is either a path to a PSL-format text file (the one
    public file at publicsuffix.org/list/public_suffix_list.dat) or the
    rule lines themselves.  Follows the PSL wire format: ``//`` comment
    lines and blanks skipped, each rule is the first whitespace-
    delimited token, ``!`` marks an exception rule, ``*.`` a wildcard
    rule.  ``include_private=False`` stops at the
    ``===BEGIN PRIVATE DOMAINS===`` marker (ICANN section only — with
    private domains EXCLUDED, ``github.io`` is one registered domain;
    included, every ``user.github.io`` is its own)."""
    if isinstance(rules, str):
        # utf-8-sig: a BOM-prefixed file must not poison the first rule
        with open(rules, encoding="utf-8-sig") as fh:
            lines = fh.read().splitlines()
    else:
        lines = list(rules)
    exact, wildcards, exceptions = set(), set(), set()
    in_private = False
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "===BEGIN PRIVATE DOMAINS===" in line:
                in_private = True
            elif "===END PRIVATE DOMAINS===" in line:
                in_private = False
            continue
        if in_private and not include_private:
            continue
        rule = line.split()[0].lower().lstrip(".")
        if rule.startswith("!"):
            target, body = exceptions, rule[1:]
        elif rule.startswith("*."):
            target, body = wildcards, rule[2:]
        elif rule == "*":
            continue  # the implicit default rule — always in effect
        else:
            target, body = exact, rule
        target.add(body)
        # the official PSL lists internationalized rules in UNICODE
        # (e.g. 中国) while crawled hosts carry the punycode A-label
        # (xn--fiqs8s) — index the punycode form too so real-file PSLs
        # match real-web hosts
        if any(ord(c) > 127 for c in body):
            try:
                target.add(
                    ".".join(
                        lbl.encode("idna").decode("ascii")
                        if any(ord(c) > 127 for c in lbl)
                        else lbl
                        for lbl in body.split(".")
                    )
                )
            except UnicodeError:
                pass  # malformed IDN rule: keep the unicode form only
    max_labels = max(
        [r.count(".") + 1 for r in exact]
        + [r.count(".") + 2 for r in wildcards]
        + [r.count(".") + 1 for r in exceptions]
        + [1]
    )
    return PublicSuffixList(
        frozenset(exact), frozenset(wildcards), frozenset(exceptions), max_labels
    )


def _registered_domain_psl(host: Column, psl: PublicSuffixList) -> Column:
    """Registered domain under the FULL Public Suffix List algorithm
    (longest matching rule wins; an exception rule beats all and makes
    the matching name itself registrable; the implicit ``*`` rule makes
    the last label public when nothing matches).  Pure map-only
    codegen: one ``InSet`` membership probe per label depth, no join —
    the rule sets ride to executors inside the plan.  IP literals
    (v4 dotted / bracketed v6) and single-label hosts pass through; a
    host that IS a public suffix has no registrable name and passes
    through too."""
    host = F.lower(F.regexp_replace(host, r"\.+$", ""))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$") | host.startswith(
        "["
    )

    def sfx(k: int) -> Column:
        return F.array_join(F.slice(parts, -k, k), ".")

    def inset(col: Column, values: frozenset) -> Column:
        return col.isin(*values) if values else F.lit(False)

    # exception rules: the matching NAME is registrable -> public-suffix
    # length is rule length minus one (at most one exception applies)
    exc_len: Column = F.lit(None).cast("int")
    for k in sorted({r.count(".") + 1 for r in psl.exceptions}, reverse=True):
        rules_k = frozenset(r for r in psl.exceptions if r.count(".") + 1 == k)
        exc_len = F.when((n >= k) & inset(sfx(k), rules_k), F.lit(k - 1)).otherwise(
            exc_len
        )
    # longest normal/wildcard match: k labels are public when the last k
    # form an exact rule, or the last k-1 form a wildcard rule's parent
    norm_len: Column = F.lit(1)  # implicit '*' rule
    for k in range(2, psl.max_labels + 1):
        exact_k = frozenset(r for r in psl.exact if r.count(".") + 1 == k)
        wild_k = frozenset(r for r in psl.wildcards if r.count(".") + 2 == k)
        cond = (n >= k) & (
            inset(sfx(k), exact_k) | inset(sfx(k - 1), wild_k)
        )
        norm_len = F.when(cond, F.lit(k)).otherwise(norm_len)
    # 1-label exact rules only matter when they beat the implicit '*'
    # at n == 1 boundary handling below, so norm_len already covers them
    psl_len = F.coalesce(exc_len, norm_len)
    return (
        F.when(host.isNull() | is_ip | (n < 2), host)
        .when(n <= psl_len, host)  # host IS a public suffix
        .otherwise(
            F.array_join(
                F.slice(
                    parts, -(psl_len + 1).cast("int"), (psl_len + 1).cast("int")
                ),
                ".",
            )
        )
    )


def _registered_domain(host: Column, suffixes: list[str]) -> Column:
    """Registered domain from a host: last two labels, or last three when
    the last two form a known public suffix; IP literals and single-label
    hosts pass through unchanged.  RFC-legal absolute-FQDN trailing dots
    (``example.com.``) are stripped first so the dotted form groups with
    its dotless twin instead of collapsing every such host into a bogus
    ``com.`` domain."""
    host = F.regexp_replace(host, r"\.+$", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last1 = F.element_at(parts, -1)
    last2 = F.element_at(parts, -2)
    last3 = F.element_at(parts, -3)
    two = F.concat_ws(".", last2, last1)
    three = F.concat_ws(".", last3, two)
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    return (
        F.when(host.isNull() | is_ip | (n < 2), host)
        .when((n >= 3) & F.lower(two).isin(suffixes), three)
        .otherwise(two)
    )


def _resolve_psl(psl) -> "PublicSuffixList | None":
    if psl is None or isinstance(psl, PublicSuffixList):
        return psl
    return load_psl(psl)


def url_features(
    df: DataFrame,
    url_col: str = "url",
    *,
    out_prefix: str = "url",
    extra_suffixes: list[str] | None = None,
    psl: "PublicSuffixList | str | list[str] | None" = None,
) -> DataFrame:
    """Adds ``<prefix>_scheme``, ``<prefix>_host``, ``<prefix>_domain``
    (registered domain), ``<prefix>_subdomain_depth`` (labels left of the
    registered domain), ``<prefix>_path_depth``, ``<prefix>_is_ip``,
    ``<prefix>_has_tracking`` (utm_*/gclid/fbclid query params) — the
    per-document provenance columns every web-curation gate keys on.
    Pure codegen; NULL / unparseable URLs read NULL features.

    ``psl`` switches the registered-domain rule from the builtin
    PSL-lite table to the FULL Public Suffix List longest-match
    algorithm (see :func:`load_psl`); still map-only codegen."""
    suffixes = _TWO_LEVEL_SUFFIXES + [s.lower() for s in (extra_suffixes or [])]
    psl_obj = _resolve_psl(psl)
    u = F.col(url_col)
    # trailing-dot absolute FQDNs normalize to the dotless host so depth
    # arithmetic and domain grouping agree with _registered_domain
    host = F.regexp_replace(
        F.lower(F.try_parse_url(u, F.lit("HOST"))), r"\.+$", ""
    )
    path = F.try_parse_url(u, F.lit("PATH"))
    query = F.try_parse_url(u, F.lit("QUERY"))
    domain = (
        _registered_domain_psl(host, psl_obj)
        if psl_obj is not None
        else _registered_domain(host, suffixes)
    )
    sub_depth = F.when(
        host.isNull() | domain.isNull(), F.lit(None).cast("int")
    ).otherwise(
        F.greatest(
            F.size(F.split(host, r"\.")) - F.size(F.split(domain, r"\.")),
            F.lit(0),
        )
    )
    path_depth = F.when(path.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(F.filter(F.split(path, "/"), lambda p: p != ""))
    )
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    return (
        df.withColumn(f"{out_prefix}_scheme", F.when(scheme != "", scheme))
        .withColumn(f"{out_prefix}_host", host)
        .withColumn(f"{out_prefix}_domain", domain)
        .withColumn(f"{out_prefix}_subdomain_depth", sub_depth)
        .withColumn(f"{out_prefix}_path_depth", path_depth)
        .withColumn(
            f"{out_prefix}_is_ip",
            F.when(
                host.isNotNull(),
                host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"),
            ),
        )
        .withColumn(
            f"{out_prefix}_has_tracking",
            F.when(
                host.isNotNull(),
                F.coalesce(
                    query.rlike(r"(^|&)(utm_[a-z]+|gclid|fbclid|msclkid)="),
                    F.lit(False),
                ),
            ),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    *,
    extra_suffixes: list[str] | None = None,
    psl: "PublicSuffixList | str | list[str] | None" = None,
) -> DataFrame:
    """Per-registered-domain corpus report: ``domain, n_docs, n_hosts,
    share`` (share of non-NULL-url docs), descending volume — the "is 1%
    of domains 90% of the corpus" screen that motivates
    :func:`cap_domains`.  One aggregation; the share divisor is a
    broadcast one-row total."""
    feats = url_features(
        df, url_col, out_prefix="__u", extra_suffixes=extra_suffixes, psl=psl
    )
    per = (
        feats.where(F.col("__u_domain").isNotNull())
        .groupBy(F.col("__u_domain").alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("__u_host").alias("n_hosts"),
        )
    )
    total = per.agg(F.sum("n_docs").alias("__total"))
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_docs") / F.col("__total"), 6))
        .drop("__total")
        .orderBy(F.col("n_docs").desc(), F.col("domain").asc())
    )


def filter_domains(
    df: DataFrame,
    domains: list[str],
    *,
    url_col: str = "url",
    mode: str = "block",
    extra_suffixes: list[str] | None = None,
    psl: "PublicSuffixList | str | list[str] | None" = None,
) -> DataFrame:
    """Drop (``mode='block'``) or keep (``mode='allow'``) documents whose
    REGISTERED domain is in ``domains`` — subdomains follow their
    registered domain, so blocking ``example.com`` also drops
    ``ads.example.com``.  NULL/unparseable URLs are kept by ``block``
    (no evidence to drop) and dropped by ``allow`` (no evidence to
    keep).  Literal ``isin`` against the bounded list — pure codegen,
    pushdown-friendly; for multi-million-entry lists join against a
    broadcast frame instead."""
    if mode not in ("block", "allow"):
        raise ValueError("mode must be 'block' or 'allow'")
    wanted = [d.lower() for d in domains]
    feats = url_features(
        df, url_col, out_prefix="__u", extra_suffixes=extra_suffixes, psl=psl
    )
    hit = F.col("__u_domain").isin(wanted)
    cond = (
        (F.col("__u_domain").isNull() | ~hit)
        if mode == "block"
        else (F.col("__u_domain").isNotNull() & hit)
    )
    return feats.where(cond).drop(
        *[c for c in feats.columns if c.startswith("__u_")]
    )


def cap_domains(
    df: DataFrame,
    *,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: int = 42,
    extra_suffixes: list[str] | None = None,
    psl: "PublicSuffixList | str | list[str] | None" = None,
) -> DataFrame:
    """At most ``max_per_domain`` documents per registered domain — the
    anti-monoculture cap in the C4/RefinedWeb recipes (one domain's
    boilerplate otherwise dominates its language slice).  The kept subset
    is md5-deterministic (ordered by ``md5(seed|doc_id)``, doc_id
    tie-break), so any engine re-derives the same pick.  Documents with
    NULL/unparseable URLs have no domain to cap and all pass through.

    NULL ids get a per-row URL-based sentinel key: without one,
    ``concat_ws`` skips the NULL (every NULL-id row draws the SAME md5,
    a full tie — nondeterministic picks) and ``xxhash64(NULL)`` is a
    constant (every NULL-id row lands in ONE salt bucket — the exact
    skew funnel the salting exists to prevent).  With the sentinel the
    pick is deterministic and the salt spreads by URL.

    Skew shape: a TWO-PHASE salted window — phase 1 keeps the cap
    within each (domain, salt-of-id) bucket, phase 2 re-ranks the
    bounded survivors (≤ 64 × cap rows per domain) — so a mega-domain
    with a billion docs never funnels through one window task.  The
    result is exactly the single-window pick: each of a domain's true
    top-``max_per_domain`` rows is within its own bucket's top
    ``max_per_domain``, so phase 1 can never drop a winner."""
    from pyspark.sql.window import Window

    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    feats = url_features(
        df, url_col, out_prefix="__u", extra_suffixes=extra_suffixes, psl=psl
    )
    sid = F.coalesce(
        F.col(id_col).cast("string"),
        F.concat(F.lit("\x00nullid\x00"), F.col(url_col)),
    )
    order = F.md5(F.concat_ws("|", F.lit(str(seed)), sid))
    keyed = feats.where(F.col("__u_domain").isNotNull())
    passthrough = feats.where(F.col("__u_domain").isNull())
    # the salt only spreads WORK — any deterministic function of the id
    # works, correctness never depends on its distribution
    salt = F.pmod(F.xxhash64(sid), F.lit(64))
    w1 = Window.partitionBy(F.col("__u_domain"), salt).orderBy(
        order.asc(), sid.asc()
    )
    w2 = Window.partitionBy("__u_domain").orderBy(order.asc(), sid.asc())
    capped = (
        keyed.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= max_per_domain)
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= max_per_domain)
        .drop("__rn1")
    )
    out = capped.drop("__rn").unionByName(passthrough)
    return out.drop(*[c for c in out.columns if c.startswith("__u_")])


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    *,
    out_col: str = "url_norm",
) -> DataFrame:
    """Canonical URL form for URL-keyed dedup: lowercase scheme+host
    (userinfo is case-SENSITIVE per RFC 3986 and passes through
    unmodified), RFC absolute-FQDN trailing dots stripped from the host,
    default ports stripped (:80 for http, :443 for https), fragment
    dropped, tracking parameters (utm_*/gclid/fbclid/msclkid) removed
    with other query params preserved in order, empty path read as '/'.
    Pure codegen (try_parse_url + array built-ins); NULL/unparseable
    URLs normalize to NULL."""
    u = F.col(url_col)
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    userinfo = F.try_parse_url(u, F.lit("USERINFO"))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(u, F.lit("HOST"))), r"\.+$", ""
    )
    auth_raw = F.try_parse_url(u, F.lit("AUTHORITY"))
    path = F.try_parse_url(u, F.lit("PATH"))
    query = F.try_parse_url(u, F.lit("QUERY"))
    # port from the authority tail (IPv6 literals are bracketed, so the
    # first colon after ']' is the port separator and this regexp is safe)
    port = F.regexp_extract(auth_raw, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    auth = F.concat(
        F.when(
            userinfo.isNotNull() & (userinfo != ""),
            F.concat(userinfo, F.lit("@")),
        ).otherwise(F.lit("")),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
    )
    clean_q = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike(r"^(utm_[a-z]+|gclid|fbclid|msclkid)="),
        ),
        "&",
    )
    norm = F.concat(
        scheme,
        F.lit("://"),
        auth,
        F.when(F.coalesce(path, F.lit("")) == "", F.lit("/")).otherwise(path),
        F.when(
            query.isNotNull() & (clean_q != ""), F.concat(F.lit("?"), clean_q)
        ).otherwise(F.lit("")),
    )
    return df.withColumn(
        out_col, F.when(scheme.isNotNull() & host.isNotNull(), norm)
    )


def dedup_urls(
    df: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE document per canonical URL (the refetch/mirror/tracking-
    variant dedup that runs before any content hash): normalize, then
    the smallest ``id_col`` per normalized URL wins — deterministic and
    engine-rederivable.  Documents with NULL/unparseable URLs have no
    canonical key and all pass through.

    Skew shape: ONE hash aggregation with ``min_by`` — partial
    aggregates combine map-side, so a mirror-farm URL with a billion
    copies costs each task only its local min instead of funneling the
    whole key through one window task.

    The order key is NULL-safe: ``min_by(row, id)`` alone IGNORES
    NULL-id rows, so a canonical-URL group whose ids are all NULL would
    collapse to an all-NULL row.  ``struct(id IS NULL, id,
    xxhash64(url))`` keeps a real, deterministic representative
    (non-NULL ids still win; among NULL ids the smallest raw-URL hash
    does)."""
    feats = normalize_urls(df, url_col, out_col="__norm")
    cols = [c for c in feats.columns if c != "__norm"]
    order = F.struct(
        F.col(id_col).isNull().alias("n"),
        F.col(id_col).alias("i"),
        F.xxhash64(F.col(url_col)).alias("t"),
    )
    keyed = (
        feats.where(F.col("__norm").isNotNull())
        .groupBy("__norm")
        .agg(F.min_by(F.struct(*cols), order).alias("__row"))
        .select("__row.*")
    )
    passthrough = feats.where(F.col("__norm").isNull()).drop("__norm")
    return keyed.unionByName(passthrough)


def extract_sitemap_urls(
    df: DataFrame,
    *,
    xml_col: str = "xml",
    id_col: str = "doc_id",
) -> DataFrame:
    """URLs from sitemap XML (urlset and sitemap-index documents both
    use ``<loc>``): one row per location with its 1-based document
    order and the ``<lastmod>`` that immediately follows it inside the
    same ``<url>``/``<sitemap>`` block (NULL when absent) — the crawl
    frontier extraction that feeds :func:`url_features` /
    :func:`filter_domains`.  ``CDATA``-wrapped locations unwrap and XML
    character entities decode (``&amp;`` is mandatory XML escaping, so
    every multi-param query string in a sitemap carries it).  Pure JVM
    regexp + one posexplode; NULL / loc-less documents yield no rows."""
    block_re = r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(block_re), F.lit(1))
    ex = df.select(
        F.col(id_col), F.posexplode(blocks).alias("__i", "__blk")
    )

    def text_node(tag: str) -> Column:
        v = F.regexp_extract(
            F.col("__blk"), rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1
        )
        v = F.regexp_replace(v, r"(?s)^<!\[CDATA\[(.*)\]\]>$", "$1")
        return _xml_unescape(v)

    loc = text_node("loc")
    lastmod = text_node("lastmod")
    return (
        ex.where(loc != "")
        .select(
            F.col(id_col),
            (F.col("__i") + 1).cast("int").alias("loc_idx"),
            loc.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
    )


def extract_links(
    df: DataFrame,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hyperlinks from raw HTML: one row per ``<a href=...>`` with its
    1-based document order, the href and the anchor TEXT (inner tags
    stripped, whitespace collapsed; empty anchors read NULL) — the
    link-graph extraction that feeds ``connectors/neptune.pagerank`` /
    ``filter_domains`` over a web corpus.  Pure JVM: two group
    extractions zipped positionally + one posexplode; NULL / link-less
    documents yield no rows."""
    # the closing quote is backreference-matched to the opening one so an
    # apostrophe INSIDE a double-quoted href (ubiquitous on the real web)
    # does not truncate the URL; unquoted hrefs (href=https://…) are the
    # third alternation branch.  ONE pattern keeps the positional zip
    # valid: group 1 = quote, 2 = quoted href, 3 = unquoted href,
    # 4 = anchor
    a_re = (
        r"""(?is)<a\s[^>]*href\s*=\s*"""
        r"""(?:(["'])((?:(?!\1).)*)\1|([^\s"'>]+))[^>]*>(.*?)</a>"""
    )
    h = F.col(html_col)
    hrefs_q = F.regexp_extract_all(h, F.lit(a_re), F.lit(2))
    hrefs_u = F.regexp_extract_all(h, F.lit(a_re), F.lit(3))
    texts = F.regexp_extract_all(h, F.lit(a_re), F.lit(4))
    ex = df.select(
        F.col(id_col),
        F.posexplode(
            F.arrays_zip(
                hrefs_q.alias("hq"), hrefs_u.alias("hu"), texts.alias("t")
            )
        ).alias("__i", "__z"),
    )
    # per match exactly one href branch participated (the other reads '');
    # HTML entities decode (&amp; is ubiquitous in real hrefs)
    href = _xml_unescape(
        F.when(F.col("__z")["hq"] != "", F.col("__z")["hq"]).otherwise(
            F.col("__z")["hu"]
        )
    )
    anchor = F.regexp_replace(
        F.regexp_replace(F.col("__z")["t"], r"(?s)<[^>]*>", " "), r"\s+", " "
    )
    anchor = F.regexp_replace(_xml_unescape(anchor), r"^\s+|\s+$", "")
    return ex.select(
        F.col(id_col),
        (F.col("__i") + 1).cast("int").alias("link_idx"),
        href.alias("href"),
        F.when(anchor != "", anchor).alias("anchor_text"),
    ).where(F.col("href") != "")


def parse_robots(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """robots.txt rules as rows — the crawl-compliance table for a web
    corpus: one row per (user-agent, rule) with ``user_agent``,
    ``rule_type`` (``allow``/``disallow``), ``path`` and the rule's
    1-based document order.  Grouping follows RFC 9309: a run of
    ``User-agent`` lines forms one group even when blank lines,
    comments (``#``) or unknown directives sit between them (only a
    RULE line closes the startgroup run); the rules that follow apply
    to every agent of the group; comments and unknown directives are
    ignored; a rule before any ``User-agent`` line is dropped (it
    binds no agent).  Pure JVM: one posexplode + two windows per
    document + one in-document equi-join on the group id."""
    from pyspark.sql.window import Window

    # a UTF-8 BOM (ubiquitous on real robots.txt) must not make the
    # first User-agent line unparseable — Google's parser tolerates it
    body = F.regexp_replace(F.col(text_col), "^\\uFEFF", "")
    lines = F.split(F.regexp_replace(body, "\r\n?", "\n"), "\n")
    ex = df.select(
        F.col(id_col), F.posexplode(lines).alias("__pos", "__raw")
    ).select(
        id_col,
        "__pos",
        F.regexp_replace(F.col("__raw"), r"#.*$", "").alias("__line"),
    )
    ua = F.regexp_extract(F.col("__line"), r"(?i)^\s*user-agent\s*:\s*(\S+)\s*$", 1)
    rtype = F.lower(
        F.regexp_extract(F.col("__line"), r"(?i)^\s*(allow|disallow)\s*:", 1)
    )
    rpath = F.regexp_extract(
        F.col("__line"), r"(?i)^\s*(?:allow|disallow)\s*:\s*(\S*)\s*$", 1
    )
    ex = ex.select(
        id_col, "__pos",
        F.when(ua != "", ua).alias("__ua"),
        F.when(rtype != "", rtype).alias("__rtype"),
        F.when(rtype != "", rpath).alias("__rpath"),
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    # RFC 9309: blank/comment/unknown lines BETWEEN the User-agent lines
    # of one group do not split it — a group STARTS at a UA line whose
    # previous SIGNIFICANT line (UA or rule) is not a UA line
    kind = F.when(F.col("__ua").isNotNull(), F.lit("ua")).when(
        F.col("__rtype").isNotNull(), F.lit("rule")
    )
    ex = ex.withColumn("__kind", kind)
    prev_kind = F.last("__kind", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = F.when(
        (F.col("__kind") == "ua")
        & (prev_kind.isNull() | (prev_kind != "ua")),
        F.lit(1),
    ).otherwise(F.lit(0))
    ex = ex.withColumn("__grp", F.sum(starts).over(w))
    uas = ex.where(F.col("__ua").isNotNull()).select(
        F.col(id_col).alias("__id_u"),
        F.col("__grp").alias("__g"),
        F.col("__ua").alias("user_agent"),
    )
    rules = ex.where(
        F.col("__rtype").isNotNull() & (F.col("__grp") > 0)
    ).select(
        id_col, "__pos", F.col("__grp").alias("__g"),
        F.col("__rtype").alias("rule_type"), F.col("__rpath").alias("path"),
    )
    out = rules.join(
        uas,
        (rules[id_col] == uas["__id_u"]) & (rules["__g"] == uas["__g"]),
    )
    w2 = Window.partitionBy(id_col, "user_agent").orderBy("__pos")
    return out.select(
        rules[id_col].alias(id_col), "user_agent", "rule_type", "path", "__pos"
    ).withColumn("rule_idx", F.row_number().over(w2)).select(
        id_col, "user_agent", "rule_idx", "rule_type", "path"
    )


def extract_page_meta(
    df: DataFrame,
    *,
    html_col: str = "html",
    out_prefix: str = "page",
) -> DataFrame:
    """Page-level metadata from raw HTML: ``<prefix>_title``,
    ``<prefix>_description`` (meta name=description),
    ``<prefix>_canonical`` (rel=canonical href — feed it to
    :func:`dedup_urls` to collapse syndicated copies), ``<prefix>_og_title``
    / ``<prefix>_og_type`` (OpenGraph) and ``<prefix>_lang`` (html lang
    attribute).  First occurrence wins; attribute order inside the tags
    is tolerated both ways; missing fields read NULL; whitespace
    collapsed.  Pure codegen regexp — map-only."""
    h = F.col(html_col)

    def first(pattern: str, group: int = 1) -> Column:
        v = F.regexp_extract(h, pattern, group)
        v = _xml_unescape(v)  # &amp;/&quot;/&#39; etc. decode
        v = F.regexp_replace(v, r"\s+", " ")
        v = F.regexp_replace(v, r"^\s+|\s+$", "")
        return F.when(v != "", v)

    # attribute VALUES match their closing quote to the opening one via a
    # backreference — an apostrophe inside a double-quoted value (e.g.
    # content="the world's …", href=".../it's-here") must not truncate
    # the extraction: a cut canonical would poison dedup_urls keys.
    # Unquoted values (rel=canonical, lang=en) are accepted too — the
    # quoted form is tried first so a doc mixing both prefers the
    # quoted extraction.
    # the value may not contain its own opening quote char ((?!\1) guard)
    # — a lazy (.*?) would BACKTRACK across the tag's '>' under DOTALL
    # and splice text from the next tag when the trailing context fails
    _Q = r"""(["'])((?:(?!\1).)*)\1"""  # quoted value  -> relative group 2
    _U = r"""([^\s"'>]+)"""  # unquoted value -> relative group 1

    def attr_val(prefix: str, suffix: str = "") -> Column:
        return F.coalesce(
            first(rf"(?is){prefix}{_Q}{suffix}", 2),
            first(rf"(?is){prefix}{_U}{suffix}", 1),
        )

    def meta(attr: str, key: str) -> Column:
        # <meta name="description" content="..."> in either attr order;
        # the KEY side tolerates quoted or bare forms
        kf = rf"""{attr}\s*=\s*["']?{key}["']?(?=[\s"'>])"""
        return F.coalesce(
            attr_val(rf"""<meta\s[^>]*{kf}[^>]*content\s*=\s*"""),
            attr_val(rf"""<meta\s[^>]*content\s*=\s*""", rf"""[^>]*{kf}"""),
        )

    canon_kf = r"""rel\s*=\s*["']?canonical["']?(?=[\s"'>])"""
    return (
        df.withColumn(
            f"{out_prefix}_title", first(r"(?is)<title[^>]*>(.*?)</title>")
        )
        .withColumn(f"{out_prefix}_description", meta("name", "description"))
        .withColumn(
            f"{out_prefix}_canonical",
            F.coalesce(
                attr_val(rf"""<link\s[^>]*{canon_kf}[^>]*href\s*=\s*"""),
                attr_val(
                    r"""<link\s[^>]*href\s*=\s*""", rf"""[^>]*{canon_kf}"""
                ),
            ),
        )
        .withColumn(f"{out_prefix}_og_title", meta("property", "og:title"))
        .withColumn(f"{out_prefix}_og_type", meta("property", "og:type"))
        .withColumn(
            f"{out_prefix}_lang",
            attr_val(r"""<html\s[^>]*lang\s*=\s*"""),
        )
    )
