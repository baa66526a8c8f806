"""openCypher-subset compiler (reference: awswrangler/neptune/_neptune.py:225
``execute_opencypher`` — there, the query string is shipped to Neptune's
openCypher endpoint; here the supported subset is COMPILED to DataFrame
joins over the property-graph frames, completing the query-language
family next to ``connectors/gremlin.py``).

Supported grammar::

    MATCH (a:Label {prop: val})-[r:REL]->(b)-[:REL2]-(c), (a)-[...]-(d)
    [WHERE <boolean expr over var.prop, literals, AND/OR/NOT, comparisons>]
    [MATCH ... [WHERE ...]] ...
    [OPTIONAL MATCH ... [WHERE ...]] ...
    [WITH item [AS alias], ... [WHERE ...] [MATCH ...]] ...
    [UNWIND <list-expr> AS var] ...       (explode; list literals
                                          [a, b] and collected lists)
    RETURN [DISTINCT] item [AS alias], ...
    [ORDER BY item [DESC], ...] [SKIP n] [LIMIT n]

- multiple patterns (comma) and multiple MATCH clauses join on their
  SHARED node variables (natural equi-join on the shared columns);
  disconnected patterns produce Cypher's cartesian product; a node
  variable REPEATED within one chain closes a cycle —
  ``(a)-[:X]->(b)-[:Y]->(a)`` — compiled as a private alias plus an
  id-equality filter back to the first binding
- ``OPTIONAL MATCH`` compiles to a LEFT join on the shared variables;
  its WHERE participates in the matching (Cypher semantics), so it is
  applied before the left join and may only reference the optional
  pattern's own variables
- pattern predicates in a MATCH's WHERE — ``WHERE [NOT] (a)-[:T]->(x)``
  as a top-level conjunct — compile to a left-semi / left-anti join on
  the variables the predicate pattern shares with the bound rows (the
  Cypher idiom for EXISTS / NOT EXISTS subqueries); scalar conjuncts in
  the same AND chain keep working
- ``WITH`` is Cypher's pipeline checkpoint: project to the listed items
  (node/edge variables keep their full column set and stay joinable by
  later MATCH clauses, ``AS`` renames them; expressions need an alias
  and become plain value columns), aggregate when any item aggregates
  (grouping by the rest, as in RETURN), then apply its WHERE — the
  HAVING-over-aggregates shape

- edges: ``-[r:T]->`` (out), ``<-[r:T]-`` (in), ``-[r:T]-`` (undirected =
  union of both orientations); label and variable both optional
- RETURN items: ``v``, ``v.prop``, ``count(*)``, ``count(x)``,
  ``count(DISTINCT x)``, ``sum/avg/min/max(v.prop)`` — any aggregate in
  the RETURN list triggers Cypher's implicit grouping by the non-
  aggregated items, which is exactly Spark's groupBy/agg
- a bare node variable in RETURN projects its ``~id`` (the useful
  server-free projection of a vertex)

Pattern-match semantics are Cypher's: one result row per distinct
BINDING of the pattern (path), so multiplicities match what the
equivalent SQL joins produce — DuckDB-oracle-checkable.  Each hop is one
equi-join on the edge endpoint; filters compile to Column predicates
pushed into the scans; nothing runs driver-side.

Relationship uniqueness (Cypher trail semantics) IS enforced: within a
single MATCH pattern no relationship may be traversed twice — variable-
length segments carry the bounded (b <= 8) list of traversed ``~id``s
and refuse to re-use an edge at each extension step, fixed-length edges
get pairwise ``~id`` inequality filters, and segments are checked
disjoint against fixed edges and each other.  Without this, an
undirected ``*2..2`` from a leaf would return the leaf itself by
walking its one edge out and back — a walk, which Cypher excludes.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_NODE_RE = re.compile(r"\(\s*(\w+)?\s*(?::\s*(\w+))?\s*(\{[^}]*\})?\s*\)")
_EDGE_RE = re.compile(
    r"(<-|-)\s*(?:\[\s*(\w+)?\s*(?::\s*(\w+))?\s*"
    r"(?:\*\s*(\d+)\s*\.\.\s*(\d+))?\s*\])?\s*(->|-)"
)
_AGG_RE = re.compile(r"^(count|sum|avg|min|max|collect)\s*\(\s*(distinct\s+)?(.+?)\s*\)$", re.I)


def _prefix_frame(df: DataFrame, var: str) -> DataFrame:
    """Vertex/edge frame with every column renamed ``<var>_<name>``
    (``~id`` -> ``<var>_id``, ``~label`` -> ``<var>_label``, ...)."""
    cols = []
    for c in df.columns:
        clean = c.replace("~", "")
        cols.append(F.col(f"`{c}`").alias(f"{var}_{clean}"))
    return df.select(*cols)


def _apply_inline_props(df: DataFrame, var: str, props: str | None) -> DataFrame:
    if not props:
        return df
    body = props.strip()[1:-1].strip()
    if not body:
        return df
    for part in body.split(","):
        if ":" not in part:
            raise InvalidArgument(f"bad inline property map {props!r}")
        k, v = part.split(":", 1)
        df = df.where(F.col(f"{var}_{k.strip()}") == F.expr(v.strip()))
    return df


def _translate_expr(expr: str, known_vars: set[str]) -> str:
    """``var.prop`` -> ``var_prop``; bare node var -> its id column.
    String literals are shielded so a quoted value that happens to spell
    a variable name is never rewritten."""
    literals: list[str] = []

    def _shield(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    out = re.sub(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"", _shield, expr)

    # Cypher graph functions over bound variables (before the property
    # rewrite so exists() still sees the dot form):
    #   exists(n.prop) -> (n_prop IS NOT NULL)   id(n)   -> n_id
    #   type(r)        -> r_label                labels(n) -> array(n_label)
    out = re.sub(
        r"\bexists\s*\(\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*\)",
        r"(\1_\2 IS NOT NULL)",
        out,
        flags=re.I,
    )

    def _graph_fn(fn: str, template) -> None:
        nonlocal out
        out = re.sub(
            rf"\b{fn}\s*\(\s*([A-Za-z_]\w*)\s*\)",
            lambda m: template(m.group(1)) if m.group(1) in known_vars else m.group(0),
            out,
            flags=re.I,
        )

    _graph_fn("id", lambda v: f"{v}_id")
    _graph_fn("type", lambda v: f"{v}_label")
    _graph_fn("labels", lambda v: f"array({v}_label)")
    # length(p) on a bound path/relationship-list variable = hop count
    _graph_fn("length", lambda v: f"size({v}_id)")

    # Cypher scalar functions -> Spark SQL equivalents (names only —
    # arguments pass through; the list covers what openCypher users
    # actually ship, each with IDENTICAL semantics in Spark)
    for cy, sp in (
        ("toUpper", "upper"), ("toLower", "lower"),
        ("toString", "string"), ("toInteger", "bigint"),
        ("toFloat", "double"), ("toBoolean", "boolean"),
    ):
        if sp in ("string", "bigint", "double", "boolean"):
            out = re.sub(
                rf"\b{cy}\s*\(", f"CAST__{sp}(", out
            )
        else:
            out = re.sub(rf"\b{cy}\s*\(", f"{sp}(", out)
    # CAST__type(expr) -> cast(expr AS type): rewrite after arguments
    # are known to be balanced (regex can't nest, so do a simple scan)
    while "CAST__" in out:
        i = out.index("CAST__")
        j = out.index("(", i)
        ty = out[i + 6 : j]
        depth, k = 1, j + 1
        while k < len(out) and depth:
            depth += out[k] == "("
            depth -= out[k] == ")"
            k += 1
        inner = out[j + 1 : k - 1]
        out = out[:i] + f"cast({inner} as {ty})" + out[k:]
    # head/last on lists
    out = re.sub(r"\bhead\s*\(", "__cy_head(", out, flags=re.I)
    out = re.sub(r"\blast\s*\(", "__cy_last(", out, flags=re.I)
    for marker, idx in (("__cy_head", "1"), ("__cy_last", "-1")):
        while marker in out:
            i = out.index(marker)
            j = out.index("(", i)
            depth, k = 1, j + 1
            while k < len(out) and depth:
                depth += out[k] == "("
                depth -= out[k] == ")"
                k += 1
            inner = out[j + 1 : k - 1]
            out = out[:i] + f"element_at({inner}, {idx})" + out[k:]

    # identifier.identifier only — a decimal literal like 0.4 is NOT a
    # property access
    out = re.sub(
        r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b",
        lambda m: f"{m.group(1)}_{m.group(2)}",
        out,
    )

    def _bare(m: re.Match) -> str:
        w = m.group(1)
        return f"{w}_id" if w in known_vars else w

    out = re.sub(r"\b([A-Za-z_]\w*)\b(?!\s*\(|_)", _bare, out)
    for i, lit in enumerate(literals):
        out = out.replace(f"\x00{i}\x00", lit)
    return out


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on separators outside (), [], {} and quotes — a comma inside
    an inline property map is data, not a pattern boundary."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    in_q: str | None = None
    for c in s:
        if in_q:
            buf.append(c)
            if c == in_q:
                in_q = None
            continue
        if c in "'\"":
            in_q = c
            buf.append(c)
        elif c in "([{":
            depth += 1
            buf.append(c)
        elif c in ")]}":
            depth -= 1
            buf.append(c)
        elif c == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _shield_literals(s: str) -> str:
    """The string with quoted literals blanked (length-preserving) so a
    keyword regex never matches inside a quoted value like
    ``{name: 'no match here'}`` — match positions on the shielded string
    are valid slice positions on the original."""
    return re.sub(
        r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"",
        lambda m: " " * len(m.group(0)),
        s,
    )


def _split_on_keyword(s: str, kw: str) -> list[str]:
    """Split on a top-level keyword, with string literals shielded."""
    shield = _shield_literals(s)
    parts = []
    last = 0
    for m in re.finditer(rf"\b{kw}\b", shield, re.I):
        parts.append(s[last : m.start()])
        last = m.end()
    parts.append(s[last:])
    return parts


def _split_conjuncts(s: str) -> list[str]:
    """Split a boolean expression on top-level AND (outside parens,
    brackets, and quotes)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    in_q: str | None = None
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if in_q:
            buf.append(c)
            if c == in_q:
                in_q = None
            i += 1
            continue
        if c in "'\"":
            in_q = c
            buf.append(c)
            i += 1
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        if (
            depth == 0
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and re.match(r"AND\b", s[i:], re.I)
        ):
            parts.append("".join(buf))
            buf = []
            i += 3
            continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return [p for p in (x.strip() for x in parts) if p]


def _parse_clauses(body: str, q: str) -> list[tuple]:
    """Clause text -> a list of ``("match", optional, [chain, ...],
    where|None)`` and ``("unwind", expr, alias)`` items."""
    clauses: list[tuple] = []
    # match keywords on the literal-shielded text (a quoted ' MATCH '
    # must not split a clause) and slice the original by position
    shield = _shield_literals(body)
    kw_spans = list(re.finditer(r"\b(OPTIONAL\s+MATCH|MATCH|UNWIND)\b", shield, re.I))
    head = body[: kw_spans[0].start()] if kw_spans else body
    if head.strip():
        raise InvalidArgument(
            f"expected MATCH/UNWIND at {head.strip()[:40]!r} in {q!r}"
        )
    for idx, km in enumerate(kw_spans):
        kw = km.group(0)
        seg_end = kw_spans[idx + 1].start() if idx + 1 < len(kw_spans) else len(body)
        seg = body[km.end() : seg_end]
        if kw.upper() == "UNWIND":
            um = re.match(r"^\s*(?P<expr>.+?)\s+AS\s+(?P<alias>\w+)\s*$", seg, re.I | re.S)
            if not um:
                raise InvalidArgument(f"UNWIND needs the form UNWIND <expr> AS <var>: {seg!r}")
            clauses.append(("unwind", um.group("expr").strip(), um.group("alias")))
            continue
        optional = kw.upper().startswith("OPTIONAL")
        wm = re.search(r"\bWHERE\b", _shield_literals(seg), flags=re.I)
        where = seg[wm.end() :].strip() if wm else None
        pat = seg[: wm.start()] if wm else seg
        chains = _split_top_level(pat)
        if not chains:
            raise InvalidArgument(f"empty MATCH pattern in {q!r}")
        clauses.append(("match", optional, chains, where or None))
    return clauses


class _CypherQuery:
    def __init__(self, q: str):
        s = q.strip().rstrip(";")
        m = re.match(
            r"(?P<body>(?:(?:OPTIONAL\s+)?MATCH|UNWIND)\s+.+?)"
            r"\s+RETURN\s+(?P<distinct>DISTINCT\s+)?(?P<items>.+?)"
            r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
            r"(?:\s+SKIP\s+(?P<skip>\d+))?"
            r"(?:\s+LIMIT\s+(?P<limit>\d+))?$",
            s,
            re.I | re.S,
        )
        if not m:
            raise InvalidArgument(
                "unsupported openCypher query shape; expected "
                "MATCH ... [WHERE ...] [[OPTIONAL] MATCH ... [WHERE ...]]* "
                "[WITH items [WHERE ...] [MATCH ...]]* "
                "RETURN ... [ORDER BY ...] [SKIP n] [LIMIT n]"
            )
        # stages: [(clauses, with_items|None, with_where|None, mods), ...]
        # — each WITH ends a stage; the last stage is ended by RETURN.
        # mods carries the WITH-clause modifiers in Cypher's evaluation
        # order: DISTINCT -> ORDER BY -> SKIP -> LIMIT (WHERE runs last)
        self.stages: list[
            tuple[
                list[tuple[bool, list[str], str | None]],
                str | None,
                str | None,
                dict | None,
            ]
        ] = []
        segments = _split_on_keyword(m.group("body"), "WITH")
        self.stages.append((_parse_clauses(segments[0], q), None, None, None))
        for seg in segments[1:]:
            # "[DISTINCT] items [ORDER BY ...] [SKIP n] [LIMIT n]
            #  [WHERE cond] [MATCH-clauses...]"
            cm = re.search(
                r"\b(OPTIONAL\s+MATCH|MATCH|UNWIND)\b", _shield_literals(seg), flags=re.I
            )
            withspec = seg[: cm.start()] if cm else seg
            clause_text = seg[cm.start() :] if cm else ""
            wm = re.search(r"\bWHERE\b", _shield_literals(withspec), flags=re.I)
            items = withspec[: wm.start()] if wm else withspec
            where = withspec[wm.end() :].strip() if wm else None
            mods: dict = {"distinct": False, "order": None, "skip": None, "limit": None}
            lm = re.search(r"\bLIMIT\s+(\d+)\s*$", _shield_literals(items), re.I)
            if lm:
                mods["limit"] = int(lm.group(1))
                items = items[: lm.start()]
            sm = re.search(r"\bSKIP\s+(\d+)\s*$", _shield_literals(items), re.I)
            if sm:
                mods["skip"] = int(sm.group(1))
                items = items[: sm.start()]
            om = re.search(r"\bORDER\s+BY\b", _shield_literals(items), re.I)
            if om:
                mods["order"] = items[om.end() :].strip() or None
                items = items[: om.start()]
            dm = re.match(r"\s*DISTINCT\b", items, re.I)
            if dm:
                mods["distinct"] = True
                items = items[dm.end() :]
            prev_clauses, _pi, _pw, _pm = self.stages[-1]
            self.stages[-1] = (prev_clauses, items.strip(), where or None, mods)
            self.stages.append(
                (
                    _parse_clauses(clause_text, q) if clause_text.strip() else [],
                    None,
                    None,
                    None,
                )
            )
        self.distinct = bool(m.group("distinct"))
        self.items = [i.strip() for i in m.group("items").split(",")]
        self.order = (m.group("order") or "").strip() or None
        self.skip = int(m.group("skip")) if m.group("skip") else None
        self.limit = int(m.group("limit")) if m.group("limit") else None


def _parse_pattern(pattern: str, tag: str = ""):
    """One path chain -> [node, (edge, node), ...] descriptors.  ``tag``
    keeps anonymous variable names unique across chains/clauses so two
    chains' anonymous nodes are never mistaken for a shared variable."""
    pos = 0
    n0 = _NODE_RE.match(pattern, pos)
    if not n0:
        raise InvalidArgument(f"pattern must start with a node: {pattern!r}")
    nodes = [n0.groups()]
    edges = []
    pos = n0.end()
    anon = 0
    while pos < len(pattern):
        e = _EDGE_RE.match(pattern, pos)
        if not e:
            if pattern[pos:].strip():
                raise InvalidArgument(f"cannot parse pattern at {pattern[pos:]!r}")
            break
        head, evar, elabel, lo, hi, tail = e.groups()
        if head == "<-" and tail == "->":
            raise InvalidArgument("edge cannot be both <- and ->")
        direction = "in" if head == "<-" else ("out" if tail == "->" else "both")
        rng = None
        if lo is not None:
            # an edge variable on a var-length edge binds Cypher's LIST of
            # relationships; it compiles to the segment's edge-id array
            # (column ``<var>_id``), so size(r) / UNWIND r / RETURN r work
            # over the traversed ~ids in traversal order
            rng = (int(lo), int(hi))
            if not (1 <= rng[0] <= rng[1] <= 8):
                raise InvalidArgument("variable-length range must satisfy 1 <= a <= b <= 8")
        if evar is None:
            anon += 1
            evar = f"__e{tag}{anon}"
        pos = e.end()
        n = _NODE_RE.match(pattern, pos)
        if not n:
            raise InvalidArgument(f"expected node after edge at {pattern[pos:]!r}")
        nodes.append(n.groups())
        edges.append((evar, elabel, direction, rng))
        pos = n.end()
    named = []
    for i, (var, label, props) in enumerate(nodes):
        if var is None:
            anon += 1
            var = f"__n{tag}{anon}"
        named.append((var, label, props))
    return named, edges


def _compile_chain(
    chain: str,
    vertices: DataFrame,
    edges: DataFrame,
    seg_offset: int,
    tag: str = "",
) -> tuple[DataFrame, set[str], list[str], list[str]]:
    """One path chain -> (frame, bound vars, fixed-edge id cols,
    var-length segment id-array cols).  ``seg_offset`` keeps segment
    array column names unique across chains of one clause; ``tag`` does
    the same for anonymous variables."""
    nodes, hops = _parse_pattern(chain, tag)

    def node_frame(var: str, label: str | None, props: str | None) -> DataFrame:
        df = _prefix_frame(vertices, var)
        if label:
            df = df.where(F.col(f"{var}_label") == label)
        return _apply_inline_props(df, var, props)

    # a repeated node variable closes a CYCLE in the chain —
    # (a)-[:X]->(b)-[:Y]->(a) — Cypher's triangle/loop idiom.  Each
    # re-occurrence compiles under a private alias and an id-equality
    # filter back to the first binding; the alias columns are dropped.
    seen_vars: set[str] = set()
    dup_aliases: list[tuple[str, str]] = []  # (original, alias)
    renamed = []
    for var, label, props in nodes:
        if var in seen_vars:
            alias = f"__cyc{tag}{len(dup_aliases) + 1}"
            dup_aliases.append((var, alias))
            renamed.append((alias, label, props))
        else:
            seen_vars.add(var)
            renamed.append((var, label, props))
    nodes = renamed

    var0, label0, props0 = nodes[0]
    cur = node_frame(var0, label0, props0)
    known = {var0}
    prev = var0
    fixed_eids: list[str] = []  # <evar>_id columns of fixed-length edges
    seg_arrays: list[str] = []  # array<~id> columns of var-length segments
    for (evar, elabel, direction, rng), (nvar, nlabel, nprops) in zip(hops, nodes[1:]):
        nxt = node_frame(nvar, nlabel, nprops)
        if rng is not None:
            # -[:T*a..b]- : bag union over k in a..b of k chained hops.
            # Each hop carries the list of traversed edge ~ids so a step
            # never re-uses an edge (Cypher's relationship-uniqueness):
            # multiplicity = number of TRAILS, which is what openCypher/
            # Neptune return.  Plans stay k bounded equi-joins per branch
            # and the id list is bounded by b <= 8.
            # a user-bound edge variable keeps its id-array column
            # (named <var>_id) so RETURN/WHERE/UNWIND can use the list;
            # anonymous segments get a private name and are dropped
            user_named = not evar.startswith("__e")
            arr = (
                f"{evar}_id" if user_named
                else f"__eids{seg_offset + len(seg_arrays)}"
            )
            seg = edges.select(
                F.col("`~id`").alias("__eid"),
                F.col("`~from`").alias("__f"),
                F.col("`~to`").alias("__t"),
                F.col("`~label`").alias("__l"),
            )
            if elabel:
                seg = seg.where(F.col("__l") == elabel)
            if direction == "in":
                seg = seg.select(
                    "__eid", F.col("__t").alias("__f"), F.col("__f").alias("__t")
                )
            elif direction == "both":
                seg = seg.select("__eid", "__f", "__t").unionByName(
                    seg.select(
                        "__eid", F.col("__t").alias("__f"), F.col("__f").alias("__t")
                    )
                )
            else:
                seg = seg.select("__eid", "__f", "__t")
            lo_k, hi_k = rng
            paths = None
            walk = seg.select(
                F.col("__f").alias("__s"),
                F.col("__t").alias("__e"),
                F.array(F.col("__eid")).alias(arr),
            )
            k = 1
            while k <= hi_k:
                if k >= lo_k:
                    p_k = walk.select("__s", "__e", arr)
                    paths = p_k if paths is None else paths.unionByName(p_k)
                k += 1
                if k <= hi_k:
                    step = seg.select(
                        F.col("__eid").alias("__sid"),
                        F.col("__f").alias("__sf"),
                        F.col("__t").alias("__st"),
                    )
                    walk = walk.join(
                        step,
                        (F.col("__e") == F.col("__sf"))
                        & ~F.array_contains(F.col(arr), F.col("__sid")),
                    ).select(
                        "__s",
                        F.col("__st").alias("__e"),
                        F.concat(F.col(arr), F.array(F.col("__sid"))).alias(arr),
                    )
            cur = cur.join(paths, F.col(f"{prev}_id") == F.col("__s")).join(
                nxt, F.col("__e") == F.col(f"{nvar}_id")
            ).drop("__s", "__e")
            seg_arrays.append(arr)
            if user_named:
                known.add(evar)
            known.add(nvar)
            prev = nvar
            continue
        e = _prefix_frame(edges, evar)
        if elabel:
            e = e.where(F.col(f"{evar}_label") == elabel)
        if direction == "out":
            cur = cur.join(e, F.col(f"{prev}_id") == F.col(f"{evar}_from")).join(
                nxt, F.col(f"{evar}_to") == F.col(f"{nvar}_id")
            )
        elif direction == "in":
            cur = cur.join(e, F.col(f"{prev}_id") == F.col(f"{evar}_to")).join(
                nxt, F.col(f"{evar}_from") == F.col(f"{nvar}_id")
            )
        else:  # undirected: either orientation binds
            out_o = cur.join(e, F.col(f"{prev}_id") == F.col(f"{evar}_from")).join(
                nxt, F.col(f"{evar}_to") == F.col(f"{nvar}_id")
            )
            in_o = cur.join(e, F.col(f"{prev}_id") == F.col(f"{evar}_to")).join(
                nxt, F.col(f"{evar}_from") == F.col(f"{nvar}_id")
            )
            cur = out_o.unionByName(in_o)
        fixed_eids.append(f"{evar}_id")
        known.add(nvar)
        known.add(evar)
        prev = nvar
    for orig, alias in dup_aliases:
        cur = cur.where(F.col(f"{orig}_id") == F.col(f"{alias}_id"))
        cur = cur.drop(*[c for c in cur.columns if c.startswith(f"{alias}_")])
        known.discard(alias)
    return cur, known, fixed_eids, seg_arrays


def _compile_shortest_path(
    pvar: str | None,
    inner: str,
    vertices: DataFrame,
    edges: DataFrame,
    seg_offset: int,
    tag: str,
) -> tuple[DataFrame, set[str], list[str], list[str]]:
    """``[p =] shortestPath((a)-[:T*lo..hi]->(b))``: ONE minimal-length
    trail per endpoint pair (openCypher returns an arbitrary shortest;
    this picks the lexicographically-smallest edge-id list at the
    minimal length, so results are deterministic and oracle-checkable).
    Compiles the inner var-length pattern, then a single window keeps
    row_number 1 per (a_id, b_id) ordered by (path length, edge-id
    list).  ``p`` binds the edge-id LIST like a var-length edge
    variable — ``length(p)``/``size(p)`` give the hop count.  The hop
    bound comes from the pattern's ``*lo..hi`` (Cypher's unbounded ``*``
    is refused by the var-length range rule — state the bound)."""
    from pyspark.sql.window import Window as _W

    nodes, hops = _parse_pattern(inner, tag)
    if len(nodes) != 2 or len(hops) != 1 or hops[0][3] is None:
        raise InvalidArgument(
            "shortestPath supports a single var-length relationship "
            "pattern: shortestPath((a)-[:T*1..8]->(b))"
        )
    df, known, fixed, segs = _compile_chain(inner, vertices, edges, seg_offset, tag)
    [arr] = segs
    a_var, b_var = nodes[0][0], nodes[-1][0]
    w = _W.partitionBy(f"{a_var}_id", f"{b_var}_id").orderBy(
        F.size(arr).asc(), F.col(arr).asc()
    )
    df = (
        df.withColumn("__sp_rn", F.row_number().over(w))
        .where(F.col("__sp_rn") == 1)
        .drop("__sp_rn")
    )
    if pvar is not None:
        df = df.withColumnRenamed(arr, f"{pvar}_id")
        segs = [f"{pvar}_id"]
        known = set(known) | {pvar}
    return df, known, fixed, segs


def _col_owner(col: str, all_vars: set[str]) -> str | None:
    """Which variable owns a ``<var>_<prop>`` column, resolving prefix
    ambiguity by LONGEST variable-name match: with vars {a, a_b}, column
    ``a_b_name`` belongs to ``a_b``, not ``a`` (a bare startswith test
    would swallow every ``a_b_*`` column into ``a``)."""
    owners = [v for v in all_vars if col.startswith(f"{v}_")]
    return max(owners, key=len) if owners else None


def _join_shared(
    left: DataFrame,
    right: DataFrame,
    shared_vars: set[str],
    how: str = "inner",
    right_vars: set[str] | None = None,
) -> DataFrame:
    """Join two pattern frames on their shared variables' ``<var>_id``
    columns ONLY — joining on property columns would drop matches where a
    shared vertex has a NULL property (null never equals null in a join
    key).  The right frame's other columns for the shared vars are
    duplicates of the left's (same vertex/edge row) and are dropped.
    ``right_vars`` is the full variable set bound in ``right`` so column
    ownership resolves by longest var-name match (see :func:`_col_owner`);
    without it a variable named ``a_b`` would lose its columns to a
    shared variable ``a``."""
    keys = sorted(f"{v}_id" for v in shared_vars)
    all_vars = (right_vars or set()) | set(shared_vars)
    dup = [
        c
        for c in right.columns
        if c not in keys and _col_owner(c, all_vars) in shared_vars
    ]
    return left.join(right.drop(*dup), keys, how)


def _default_alias(expr: str) -> str:
    return re.sub(r"\W+", "_", expr).strip("_")


def _item_col(expr: str, alias: str | None, known: set[str]):
    """A RETURN/WITH item -> Column (aggregate-aware)."""
    agg = _AGG_RE.match(expr)
    name = alias or _default_alias(expr)
    if agg:
        fn, distinct, inner = agg.group(1).lower(), agg.group(2), agg.group(3).strip()
        if fn == "count" and inner == "*":
            return F.count(F.lit(1)).alias(name)
        col = F.expr(_translate_expr(inner, known))
        if fn == "count" and distinct:
            return F.count_distinct(col).alias(name)
        if fn == "collect":
            # Cypher's collect() order is unspecified — sorting makes the
            # result deterministic (and so oracle-checkable); DISTINCT
            # composes; nulls are skipped like Cypher skips them
            out = F.collect_list(col)
            if distinct:
                out = F.array_distinct(out)
            return F.array_sort(out).alias(name)
        return getattr(
            F, {"avg": "avg", "sum": "sum", "min": "min", "max": "max", "count": "count"}[fn]
        )(col).alias(name)
    return F.expr(_translate_expr(expr, known)).alias(name)


def _apply_with(
    cur: DataFrame,
    items_text: str,
    where_text: str | None,
    known: set[str],
    mods: dict | None = None,
) -> tuple[DataFrame, set[str]]:
    """WITH [DISTINCT] items [ORDER BY][SKIP][LIMIT] [WHERE ...]:
    Cypher's pipeline checkpoint — project to the listed items
    (node/edge variables keep their full column set so later clauses
    can join on them; expressions need an alias and become plain value
    columns), aggregate when any item is an aggregate (grouping by the
    non-aggregated items, as in RETURN), then apply the modifiers in
    Cypher's order (DISTINCT, ORDER BY, SKIP, LIMIT) and filter last.
    ORDER BY + LIMIT compiles to Spark's TakeOrderedAndProject — the
    top-k stays distributed."""
    items = _split_top_level(items_text)
    if not items:
        raise InvalidArgument("WITH needs at least one item")
    node_keeps: list[tuple[str, str]] = []  # (var, out_name)
    scalar_cols: list = []
    agg_cols: list = []
    scalar_names: list[str] = []
    for item in items:
        mm = re.match(r"^(?P<expr>.+?)(?:\s+AS\s+(?P<alias>\w+))?$", item, re.I)
        expr, alias = mm.group("expr").strip(), mm.group("alias")
        agg = _AGG_RE.match(expr)
        if agg:
            agg_cols.append(_item_col(expr, alias, known))
        elif re.fullmatch(r"[A-Za-z_]\w*", expr) and expr in known:
            node_keeps.append((expr, alias or expr))
        else:
            if not alias:
                raise InvalidArgument(
                    f"a WITH expression needs an alias: {item!r}"
                )
            scalar_cols.append(F.expr(_translate_expr(expr, known)).alias(alias))
            scalar_names.append(alias)

    def var_cols(var: str) -> list[str]:
        # ownership by longest var-name match so a kept variable `a` never
        # swallows the columns of a sibling variable `a_b`
        return [c for c in cur.columns if _col_owner(c, known) == var]

    key_cols = [F.col(f"`{c}`") for var, _o in node_keeps for c in var_cols(var)]
    if agg_cols:
        out = cur.groupBy(*key_cols, *scalar_cols).agg(*agg_cols)
    else:
        out = cur.select(*key_cols, *scalar_cols)
    # apply AS-renames of node/edge variables (rename every carried column)
    renames = {var: out_name for var, out_name in node_keeps if out_name != var}
    if renames:
        kept_vars = {var for var, _o in node_keeps}
        sel = []
        for c in out.columns:
            new = c
            if c not in scalar_names:
                owner = _col_owner(c, kept_vars)
                if owner in renames:
                    new = renames[owner] + c[len(owner) :]
            sel.append(F.col(f"`{c}`").alias(new))
        out = out.select(*sel)
    new_known = {out_name for _v, out_name in node_keeps}
    mods = mods or {}
    if mods.get("distinct"):
        out = out.distinct()
    if mods.get("order"):
        sorts = []
        for part in _split_top_level(mods["order"]):
            desc = bool(re.search(r"\s+DESC$", part, re.I))
            part = re.sub(r"\s+(DESC|ASC)$", "", part, flags=re.I).strip()
            name = part if part in out.columns else _translate_expr(part, new_known)
            col = F.col(f"`{name}`") if name in out.columns else F.expr(name)
            sorts.append(col.desc() if desc else col.asc())
        out = out.orderBy(*sorts)
    if mods.get("skip"):
        out = out.offset(int(mods["skip"]))
    if mods.get("limit") is not None:
        out = out.limit(int(mods["limit"]))
    if where_text:
        out = out.where(F.expr(_translate_expr(where_text, new_known)))
    return out, new_known


def compile_opencypher(query: str, vertices: DataFrame, edges: DataFrame) -> DataFrame:
    q = _CypherQuery(query)
    cur: DataFrame | None = None
    known: set[str] = set()
    seg_counter = 0
    chain_counter = 0
    list_vars: set[str] = set()  # var-length edge vars (bound as id LISTS)
    for stage_clauses, with_items, with_where, with_mods in q.stages:
        for clause in stage_clauses:
            if clause[0] == "unwind":
                _kind, u_expr, u_alias = clause
                if cur is None:
                    # UNWIND-first: a one-row seed so the literal expands
                    cur = vertices.sparkSession.range(1).select(
                        F.lit(1).alias("__seed")
                    )
                # Cypher list literals [a, b] -> Spark array(a, b)
                u_sql = _translate_expr(u_expr, known)
                um2 = re.fullmatch(r"\s*\[(.*)\]\s*", u_sql, re.S)
                if um2:
                    u_sql = f"array({um2.group(1)})"
                # explode drops null/empty lists — exactly UNWIND's rule
                cur = cur.withColumn(u_alias, F.explode(F.expr(u_sql)))
                if "__seed" in cur.columns:
                    cur = cur.drop("__seed")
                continue
            _kind, optional, chains, where = clause
            cdf: DataFrame | None = None
            cknown: set[str] = set()
            fixed_eids: list[str] = []
            seg_arrays: list[str] = []
            for chain in chains:
                chain_counter += 1
                spm = re.match(
                    r"^(?:(\w+)\s*=\s*)?shortestPath\s*\((.*)\)\s*$",
                    chain.strip(), re.I | re.S,
                )
                if spm:
                    df2, k2, e2, a2 = _compile_shortest_path(
                        spm.group(1), spm.group(2), vertices, edges,
                        seg_counter, tag=f"c{chain_counter}_",
                    )
                else:
                    df2, k2, e2, a2 = _compile_chain(
                        chain, vertices, edges, seg_counter, tag=f"c{chain_counter}_"
                    )
                seg_counter += len(a2)
                chain_lists = {a[:-3] for a in a2 if not a.startswith("__eids")}
                dup_vars = cknown & k2
                rebound = dup_vars & (list_vars | chain_lists)
                if rebound:
                    raise InvalidArgument(
                        f"relationship-list variable(s) {sorted(rebound)} "
                        "cannot be re-used in another pattern (a var-length "
                        "edge binds a LIST of relationships, not a "
                        "relationship)"
                    )
                list_vars |= chain_lists
                if cdf is None:
                    cdf = df2
                else:
                    # shared node variables: equi-join on their ids;
                    # disconnected patterns: Cypher's cartesian product (the
                    # user wrote one)
                    cdf = (
                        _join_shared(cdf, df2, dup_vars, right_vars=k2)
                        if dup_vars
                        else cdf.crossJoin(df2)
                    )
                cknown |= k2
                fixed_eids += e2
                seg_arrays += a2
            assert cdf is not None
            # Cypher relationship-uniqueness, scoped to this MATCH clause:
            # every pair of relationship bindings must differ (bounded:
            # patterns are short)
            for i in range(len(fixed_eids)):
                for j in range(i + 1, len(fixed_eids)):
                    cdf = cdf.where(F.col(fixed_eids[i]) != F.col(fixed_eids[j]))
            for arr in seg_arrays:
                for eid in fixed_eids:
                    cdf = cdf.where(~F.array_contains(F.col(arr), F.col(eid)))
            for i in range(len(seg_arrays)):
                for j in range(i + 1, len(seg_arrays)):
                    cdf = cdf.where(
                        ~F.arrays_overlap(F.col(seg_arrays[i]), F.col(seg_arrays[j]))
                    )
            # user-bound list variables (<var>_id arrays) stay queryable;
            # only the anonymous uniqueness-tracking arrays are dropped
            anon_arrays = [a for a in seg_arrays if a.startswith("__eids")]
            if anon_arrays:
                cdf = cdf.drop(*anon_arrays)
            if where is not None and optional:
                # an OPTIONAL MATCH's WHERE is part of the matching, so it
                # runs BEFORE the left join and sees only the clause's vars
                try:
                    cdf = cdf.where(F.expr(_translate_expr(where, cknown)))
                    cdf.schema  # force analysis so bad references fail here
                except Exception as exc:
                    raise InvalidArgument(
                        "OPTIONAL MATCH WHERE may only reference the optional "
                        f"pattern's own variables: {where!r}"
                    ) from exc
            if cur is None:
                if optional:
                    raise InvalidArgument("query cannot start with OPTIONAL MATCH")
                cur = cdf
            else:
                shared = known & cknown
                shared_lists = shared & list_vars
                if shared_lists:
                    raise InvalidArgument(
                        f"relationship-list variable(s) {sorted(shared_lists)} "
                        "cannot be re-used in another MATCH (a var-length "
                        "edge binds a LIST of relationships)"
                    )
                if optional:
                    if not shared:
                        raise InvalidArgument(
                            "OPTIONAL MATCH must share at least one variable "
                            "with the preceding pattern"
                        )
                    cur = _join_shared(cur, cdf, shared, "left", right_vars=cknown)
                else:
                    cur = (
                        _join_shared(cur, cdf, shared, right_vars=cknown)
                        if shared
                        else cur.crossJoin(cdf)
                    )
            known |= cknown
            if where is not None and not optional:
                # a plain MATCH's WHERE may reference any variable bound
                # so far; top-level [NOT] (..)-[..]-(..) conjuncts are
                # PATTERN PREDICATES (Cypher's EXISTS idiom) compiling to
                # semi/anti joins, everything else stays a Column predicate
                scalars: list[str] = []
                for part in _split_conjuncts(where):
                    part = part.strip()
                    nm = re.match(r"(?:(NOT)\s+)?(\(.*)$", part, re.I | re.S)
                    pred_df = None
                    if nm and re.search(r"\)\s*(<-|-)", nm.group(2)):
                        try:
                            chain_counter += 1
                            pred_df, pk, pe, pa = _compile_chain(
                                nm.group(2).strip(),
                                vertices,
                                edges,
                                seg_counter,
                                tag=f"c{chain_counter}_",
                            )
                            seg_counter += len(pa)
                        except InvalidArgument:
                            pred_df = None
                    if pred_df is not None:
                        # relationship uniqueness within the predicate
                        for i in range(len(pe)):
                            for j in range(i + 1, len(pe)):
                                pred_df = pred_df.where(
                                    F.col(pe[i]) != F.col(pe[j])
                                )
                        for arr in pa:
                            for eid in pe:
                                pred_df = pred_df.where(
                                    ~F.array_contains(F.col(arr), F.col(eid))
                                )
                        if pa:
                            pred_df = pred_df.drop(*pa)
                        shared = known & pk
                        if not shared:
                            raise InvalidArgument(
                                "a pattern predicate must share at least one "
                                f"variable with the bound pattern: {part!r}"
                            )
                        how = "left_anti" if nm.group(1) else "left_semi"
                        cur = _join_shared(cur, pred_df, shared, how, right_vars=pk)
                    else:
                        scalars.append(part)
                if scalars:
                    cur = cur.where(
                        F.expr(_translate_expr(" AND ".join(scalars), known))
                    )

        if with_items is not None:
            if cur is None:
                raise InvalidArgument("WITH before any MATCH is not supported")
            cur, known = _apply_with(cur, with_items, with_where, known, with_mods)

    assert cur is not None

    # RETURN: aggregates trigger Cypher's implicit grouping
    parsed = []
    has_agg = False
    for item in q.items:
        mm = re.match(r"^(?P<expr>.+?)(?:\s+AS\s+(?P<alias>\w+))?$", item, re.I)
        expr, alias = mm.group("expr").strip(), mm.group("alias")
        agg = _AGG_RE.match(expr)
        if agg:
            has_agg = True
        parsed.append((expr, alias, agg))

    def default_alias(expr: str) -> str:
        return _default_alias(expr)

    def to_col(expr: str, alias: str | None):
        return _item_col(expr, alias, known)

    if has_agg:
        keys = [to_col(e, a) for e, a, g in parsed if g is None]
        aggs = [to_col(e, a) for e, a, g in parsed if g is not None]
        cur = cur.groupBy(*keys).agg(*aggs) if keys else cur.agg(*aggs)
        # restore the RETURN item order
        order_names = [a or default_alias(e) for e, a, _ in parsed]
        cur = cur.select(*order_names)
    else:
        cur = cur.select(*[to_col(e, a) for e, a, _ in parsed])

    if q.distinct:
        cur = cur.distinct()
    if q.order:
        sorts = []
        for part in q.order.split(","):
            part = part.strip()
            desc = bool(re.search(r"\s+DESC$", part, re.I))
            part = re.sub(r"\s+(DESC|ASC)$", "", part, flags=re.I)
            name = part if part in cur.columns else _translate_expr(part, known)
            col = F.col(name) if name in cur.columns else F.expr(name)
            sorts.append(col.desc() if desc else col.asc())
        cur = cur.orderBy(*sorts)
    if q.skip:
        cur = cur.offset(q.skip)
    if q.limit is not None:
        cur = cur.limit(q.limit)
    return cur
