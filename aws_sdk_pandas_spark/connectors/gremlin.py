"""Gremlin-subset traversal compiler (reference: awswrangler/neptune/
_neptune.py:126 ``execute_gremlin`` — there, the traversal string is
shipped to a Neptune TinkerPop endpoint; here it is COMPILED to joins
over the vertex/edge DataFrames of the property-graph model in
``connectors/neptune.py``, so the reference's query-language surface is
executable without a graph server).

Supported grammar (the traversal shapes the reference's docs/tests
exercise):

    g.V(ids...) / g.E(ids...)
    .hasLabel('a', 'b', ...)
    .has('prop', value) / .has('prop', gt(v)|gte|lt|lte|eq|neq|within(...))
    .has('label', 'prop', value)   .hasNot('prop')
    .out('el', ...) / .in('el', ...) / .both('el', ...)      vertex -> vertex
    .outE('el', ...) / .inE('el', ...)                        vertex -> edge
    .inV() / .outV()                                          edge -> vertex
    .values('prop', ...)      .id()          .label()
    .valueMap()
    .dedup()   .limit(n)   .range(lo, hi)   .count()
    .sum() / .mean() / .min() / .max()        on a single-value stream
    .order().by('prop'[, 'desc'])  /  .order() on a value stream
    .groupCount().by('prop')
    .group().by('key')[.by('prop')]           -> (key, values array)
    .as('a') ... .select('a', 'b')[.by('p1').by('p2')]
    .where(<traversal>) / .not(<traversal>)   filter by sub-traversal
                                              existence (semi/anti join)
    .coalesce(t1, t2, ...)                    first branch with results,
    .optional(t)                              per source element
    .union(t1, t2, ...)                       all branches, bag semantics
    .repeat(t).times(n)                       bounded iteration (unrolled)
    .repeat(t).emit().times(n)                emit levels 1..n (union of powers)
    .emit().repeat(t).times(n)                emit levels 0..n
    .repeat(t).emit()                         transitive closure: emit EVERY
    .emit().repeat(t)                         level (0.. for emit-first) until
                                              the frontier dies out, iterated
                                              to fixpoint (max-depth-32 guard)
    .repeat(t).until(p)                       loop until p holds (checked AFTER
                                              each body run), iterated to
                                              fixpoint with a max-depth-32 guard
    .until(p).repeat(t)                       p checked BEFORE each body run
                                              (level 0 can exit)
    .repeat(t).until(p).times(n)              TinkerPop modulator rule: until()
    .repeat(t).times(n).until(p)              and times() each SET the loop
                                              predicate, LAST call wins — a
                                              trailing times(n) overrides p
                                              (pure n-times unroll) and a
                                              trailing until(p) overrides n
    .identity()                               the no-op step
    .path()                                   -> array of traversed ~ids
    .simplePath()                             drop traversers that revisit
                                              an element (cycle filter)

Path tracking is OPT-IN: the ~id history column is carried through hops
only when the traversal actually contains path()/simplePath(), so every
other traversal pays nothing for the feature.

Semantics are Gremlin's BAG semantics: a traverser per path, so
``.out('x').groupCount().by('~id')`` counts one per edge, duplicates
preserved until an explicit ``dedup()`` — exactly what the equivalent
SQL (joins preserve multiplicity, COUNT(*) counts rows) computes, which
is what makes these traversals DuckDB-oracle-checkable.

Scale shape: every hop is ONE equi-join keyed on the edge endpoint
(shuffle on ~from/~to, AQE broadcasts the small side); filters are plain
Column predicates pushed into the scans; no driver-side iteration, no
RDDs, no Python in the row path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument


# ---------------------------------------------------------------------------
# parser: traversal string -> [(step_name, [args]), ...]
# ---------------------------------------------------------------------------


class _Pred:
    """A Gremlin predicate like gt(5) / within('a','b')."""

    def __init__(self, op: str, operands: list[Any]):
        self.op = op
        self.operands = operands

    def to_column(self, col) -> Any:
        ops = self.operands
        if self.op == "eq":
            return col == ops[0]
        if self.op == "neq":
            return col != ops[0]
        if self.op == "gt":
            return col > ops[0]
        if self.op == "gte":
            return col >= ops[0]
        if self.op == "lt":
            return col < ops[0]
        if self.op == "lte":
            return col <= ops[0]
        if self.op == "within":
            return col.isin(ops)
        if self.op == "without":
            return ~col.isin(ops)
        raise InvalidArgument(f"unsupported gremlin predicate {self.op!r}")


_PREDICATES = {"eq", "neq", "gt", "gte", "lt", "lte", "within", "without"}


def _split_fragments(s: str) -> list[str]:
    """Split a captured multi-traversal argument on top-level commas
    (quote- and paren-aware) — coalesce(out('a'), out('b'))."""
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
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _parse(query: str) -> list[tuple[str, list[Any]]]:
    s = query.strip()
    if not s.startswith("g."):
        raise InvalidArgument("gremlin traversal must start with 'g.'")
    i = 2
    steps: list[tuple[str, list[Any]]] = []
    n = len(s)
    while i < n:
        j = i
        while j < n and (s[j].isalnum() or s[j] == "_"):
            j += 1
        name = s[i:j]
        if not name or j >= n or s[j] != "(":
            raise InvalidArgument(f"expected step call at position {i} in {query!r}")
        if name in ("repeat", "where", "not", "coalesce", "optional", "union", "until"):
            # capture the inner traversal fragment verbatim (it is a
            # step chain, not a value): balanced-paren scan, quote-aware
            depth = 0
            k = j
            in_q: str | None = None
            while k < n:
                c = s[k]
                if in_q:
                    if c == in_q:
                        in_q = None
                elif c in "'\"":
                    in_q = c
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            if depth != 0:
                raise InvalidArgument(f"unbalanced parens in {name}() in {query!r}")
            steps.append((name, [s[j + 1 : k]]))
            j = k + 1
        else:
            args, j = _parse_args(s, j + 1, query)
            steps.append((name, args))
        i = j
        if i < n:
            if s[i] != ".":
                raise InvalidArgument(f"expected '.' at position {i} in {query!r}")
            i += 1
    return steps


def _parse_args(s: str, i: int, query: str) -> tuple[list[Any], int]:
    """Parse a comma-separated arg list up to the matching ')'."""
    args: list[Any] = []
    n = len(s)
    while True:
        while i < n and s[i] in " \t\n":
            i += 1
        if i >= n:
            raise InvalidArgument(f"unterminated arg list in {query!r}")
        if s[i] == ")":
            return args, i + 1
        val, i = _parse_value(s, i, query)
        args.append(val)
        while i < n and s[i] in " \t\n":
            i += 1
        if i < n and s[i] == ",":
            i += 1
        elif i < n and s[i] == ")":
            return args, i + 1
        else:
            raise InvalidArgument(f"expected ',' or ')' at position {i} in {query!r}")


def _parse_value(s: str, i: int, query: str) -> tuple[Any, int]:
    n = len(s)
    c = s[i]
    if c in "'\"":
        j = i + 1
        out = []
        while j < n and s[j] != c:
            if s[j] == "\\" and j + 1 < n:
                j += 1
            out.append(s[j])
            j += 1
        if j >= n:
            raise InvalidArgument(f"unterminated string literal in {query!r}")
        return "".join(out), j + 1
    if c.isdigit() or c == "-" or c == "+":
        j = i + 1
        while j < n and (s[j].isdigit() or s[j] in ".eE+-"):
            # stop a trailing +/- that isn't an exponent sign
            if s[j] in "+-" and s[j - 1] not in "eE":
                break
            j += 1
        tok = s[i:j]
        return (float(tok) if any(ch in tok for ch in ".eE") else int(tok)), j
    if c.isalpha() or c == "_":
        j = i
        while j < n and (s[j].isalnum() or s[j] in "._"):
            j += 1
        word = s[i:j]
        if j < n and s[j] == "(":
            op = word.rsplit(".", 1)[-1]  # accept P.gt as well as gt
            if op not in _PREDICATES:
                raise InvalidArgument(f"unsupported gremlin predicate {word!r}")
            operands, j = _parse_args(s, j + 1, query)
            return _Pred(op, operands), j
        if word == "true":
            return True, j
        if word == "false":
            return False, j
        raise InvalidArgument(f"unsupported bare token {word!r} in {query!r}")
    raise InvalidArgument(f"cannot parse value at position {i} in {query!r}")


# ---------------------------------------------------------------------------
# compiler: steps -> DataFrame plan over (vertices, edges)
# ---------------------------------------------------------------------------


def _labels_filter(df: DataFrame, labels: list[Any]) -> DataFrame:
    if not labels:
        return df
    return df.where(F.col("~label").isin([str(x) for x in labels]))


def _has(df: DataFrame, args: list[Any]) -> DataFrame:
    if len(args) == 1:  # has('prop'): property exists
        return df.where(F.col(str(args[0])).isNotNull())
    if len(args) == 3:  # has('label','prop',value)
        df = df.where(F.col("~label") == str(args[0]))
        args = args[1:]
    prop, val = str(args[0]), args[1]
    col = F.col(prop)
    if isinstance(val, _Pred):
        return df.where(val.to_column(col))
    return df.where(col == val)


class _Traversal:
    def __init__(
        self,
        kind: str,
        df: DataFrame,
        vertices: DataFrame,
        edges: DataFrame,
        track_path: bool = False,
    ):
        self.kind = kind  # 'V' | 'E' | 'value'
        self.df = df
        self.vertices = vertices
        self.edges = edges
        self.tags: dict[str, str] = {}  # as('x') -> stream kind at snapshot
        # branch fragments (where/not/coalesce/optional/union) run once
        # over the WHOLE stream, so globally-scoped steps inside them
        # would cut/order corpus-wide instead of per source traverser
        self.in_branch = False
        if track_path and "__path" not in df.columns:
            # opt-in (only when the traversal contains path()/simplePath())
            # so traversals that never ask for history pay nothing
            self.df = df.withColumn("__path", F.array(F.col("`~id`")))

    def _tag_cols(self) -> list[str]:
        # carried across hops: step labels and (when tracked) the path
        return [c for c in self.df.columns if c.startswith("__tag_") or c == "__path"]

    def _append_path(self) -> None:
        if "__path" in self.df.columns:
            self.df = self.df.withColumn(
                "__path", F.concat(F.col("__path"), F.array(F.col("`~id`")))
            )

    # -- movement ----------------------------------------------------------
    def _hop(self, elabels: list[Any], direction: str) -> None:
        if self.kind != "V":
            raise InvalidArgument(f"{direction} step requires a vertex stream")
        tags = self._tag_cols()
        e = _labels_filter(self.edges, elabels).select(
            F.col("~from").alias("__src"), F.col("~to").alias("__dst")
        )
        cur = self.df.select(F.col("~id").alias("__cur"), *tags)
        if direction == "out":
            nxt = cur.join(e, cur["__cur"] == e["__src"]).select(
                F.col("__dst").alias("__nid"), *tags
            )
        elif direction == "in":
            nxt = cur.join(e, cur["__cur"] == e["__dst"]).select(
                F.col("__src").alias("__nid"), *tags
            )
        else:  # both
            o = cur.join(e, cur["__cur"] == e["__src"]).select(
                F.col("__dst").alias("__nid"), *tags
            )
            i = cur.join(e, cur["__cur"] == e["__dst"]).select(
                F.col("__src").alias("__nid"), *tags
            )
            nxt = o.unionAll(i)
        self.df = nxt.join(self.vertices, nxt["__nid"] == self.vertices["~id"]).drop("__nid")
        self._append_path()

    def _hop_e(self, elabels: list[Any], direction: str) -> None:
        if self.kind != "V":
            raise InvalidArgument(f"{direction}E step requires a vertex stream")
        tags = self._tag_cols()
        e = _labels_filter(self.edges, elabels)
        cur = self.df.select(F.col("~id").alias("__cur"), *tags)
        key = "~from" if direction == "out" else "~to"
        self.df = cur.join(e, cur["__cur"] == e[key]).drop("__cur")
        self.kind = "E"
        self._append_path()

    def _hop_both_e(self, elabels: list[Any]) -> None:
        """bothE(): edges incident in either orientation, remembering the
        traverser's ORIGIN vertex so otherV() can pick the far endpoint
        (a self-loop yields the edge twice, per TinkerPop)."""
        if self.kind != "V":
            raise InvalidArgument("bothE step requires a vertex stream")
        tags = self._tag_cols()
        e = _labels_filter(self.edges, elabels)
        cur = self.df.select(F.col("~id").alias("__cur"), *tags)
        out_o = cur.join(e, cur["__cur"] == e["~from"])
        in_o = cur.join(e, cur["__cur"] == e["~to"])
        self.df = out_o.unionByName(in_o).withColumnRenamed("__cur", "__came_from")
        self.kind = "E"
        self._append_path()

    def _edge_vertex(self, end: str) -> None:
        if self.kind != "E":
            raise InvalidArgument(f"{end}V step requires an edge stream")
        tags = self._tag_cols()
        key = "~to" if end == "in" else "~from"
        cur = self.df.select(F.col(key).alias("__nid"), *tags)
        self.df = cur.join(self.vertices, cur["__nid"] == self.vertices["~id"]).drop("__nid")
        self.kind = "V"
        self._append_path()

    # -- terminals / modulated steps ----------------------------------------
    def apply(self, name: str, args: list[Any], bys: list[list[Any]] | None) -> None:
        by = bys[0] if bys else None
        if name == "identity":
            return  # the no-op step (also the level-0 emit branch)
        if name == "repeat_until":
            self._repeat_until(str(args[0]), str(args[1]), bool(args[2]))
            return
        if name == "repeat_emit":
            self._repeat_emit(str(args[0]), bool(args[1]))
            return
        if self.in_branch and name in ("limit", "range"):
            # TinkerPop branch semantics are per SOURCE traverser: the
            # branch's traversal is seeded once per incoming element, so
            # limit/range bound each source's results, not the stream.
            # The source ~id rides the branch as __tag___wsrc — a window
            # partitioned by it gives per-source semantics without
            # per-element execution.  Two deliberate determinism choices
            # (documented, oracle-checkable): TinkerPop's arbitrary pick
            # becomes the ascending-~id one, and DUPLICATE traversers at
            # the same source element share one bound (the window keys on
            # the element id, so the bound is per DISTINCT source — strict
            # TinkerPop would give each duplicate its own limit).
            if "__tag___wsrc" not in self.df.columns:
                raise InvalidArgument(
                    f"{name}() inside this branch lost the source tag "
                    "(aggregates/select inside branches are not traversals)"
                )
            if name == "limit":
                lo, hi = 0, int(args[0])
            else:
                if len(args) != 2:
                    raise InvalidArgument("range(low, high) needs two integers")
                lo, hi = int(args[0]), int(args[1])
                if not (0 <= lo < hi):
                    raise InvalidArgument("range(low, high) needs 0 <= low < high")
            from pyspark.sql.window import Window as _W

            # total deterministic order: result ~id first, then every
            # remaining column (ties between duplicate rows that differ
            # only in carried tags must not flip across runs)
            first = ["~id"] if "~id" in self.df.columns else []
            order_cols = [
                F.col(f"`{c}`").asc_nulls_first()
                for c in first
                + [
                    c for c in self.df.columns
                    if c not in first and c != "__tag___wsrc"
                ]
            ]
            w = _W.partitionBy("__tag___wsrc").orderBy(*order_cols)
            self.df = (
                self.df.withColumn("__rn", F.row_number().over(w))
                .where((F.col("__rn") > lo) & (F.col("__rn") <= hi))
                .drop("__rn")
            )
            return
        if self.in_branch and name == "order":
            # order is meaningless per-branch here: the per-traverser
            # limit/range above already pick deterministically (by ~id),
            # and the branch's output order is re-merged anyway
            raise InvalidArgument(
                "order() inside where/not/coalesce/optional/union is not "
                "supported: branch results re-merge unordered; order the "
                "stream outside the branch (per-traverser limit/range "
                "inside branches pick by ascending ~id)"
            )
        if name == "hasLabel":
            self.df = _labels_filter(self.df, args)
        elif name == "has":
            self.df = _has(self.df, args)
        elif name == "hasNot":
            if len(args) != 1:
                raise InvalidArgument("hasNot() needs exactly one property name")
            prop = str(args[0])
            # a key absent from the frame's schema entirely: no element
            # has it, so TinkerPop keeps the whole stream
            if prop in self.df.columns:
                self.df = self.df.where(F.col(f"`{prop}`").isNull())
        elif name == "hasId":
            self.df = self.df.where(F.col("~id").isin([str(a) for a in args]))
        elif name == "out":
            self._hop(args, "out")
        elif name == "in":
            self._hop(args, "in")
        elif name == "both":
            self._hop(args, "both")
        elif name == "outE":
            self._hop_e(args, "out")
        elif name == "inE":
            self._hop_e(args, "in")
        elif name == "bothE":
            self._hop_both_e(args)
        elif name == "inV":
            self._edge_vertex("in")
        elif name == "outV":
            self._edge_vertex("out")
        elif name == "otherV":
            # the endpoint the traverser did NOT come from; only a
            # bothE() stream carries the origin
            if self.kind != "E" or "__came_from" not in self.df.columns:
                raise InvalidArgument(
                    "otherV() requires a bothE() edge stream (outE/inE "
                    "already fix the direction — use inV/outV there)"
                )
            tags = self._tag_cols()
            nid = F.when(
                F.col("`~from`") == F.col("__came_from"), F.col("`~to`")
            ).otherwise(F.col("`~from`"))
            cur = self.df.select(nid.alias("__nid"), *tags)
            self.df = cur.join(
                self.vertices, cur["__nid"] == self.vertices["~id"]
            ).drop("__nid")
            self.kind = "V"
            self._append_path()
        elif name == "values":
            if not args:
                raise InvalidArgument("values() needs at least one property; use valueMap()")
            if len(args) == 1:
                prop = str(args[0])
                self.df = self.df.where(F.col(prop).isNotNull()).select(prop)
            else:
                # TinkerPop emits one traverser per value: flatten the
                # properties into a single 'value' stream (types must be
                # array-compatible), nulls dropped like absent properties
                self.df = (
                    self.df.select(
                        F.explode(F.array(*[F.col(str(p)) for p in args])).alias("value")
                    ).where(F.col("value").isNotNull())
                )
            self.kind = "value"
        elif name == "id":
            self.df = self.df.select(F.col("~id").alias("id"))
            self.kind = "value"
        elif name == "label":
            self.df = self.df.select(F.col("~label").alias("label"))
            self.kind = "value"
        elif name == "valueMap":
            pass  # the frame already carries every property column
        elif name == "elementMap":
            # elementMap([p1, p2, ...]): id + label + the listed
            # properties (all properties when none listed), relational
            props = [str(a) for a in args] or [
                c for c in self.df.columns if not c.startswith("~")
            ]
            missing = [p for p in props if p not in self.df.columns]
            if missing:
                raise InvalidArgument(f"elementMap of unknown properties {missing}")
            self.df = self.df.select(
                F.col("`~id`").alias("id"),
                F.col("`~label`").alias("label"),
                *[F.col(f"`{p}`") for p in props],
            )
        elif name == "project":
            # project('k1','k2').by(p1).by(p2): one output column per
            # key, by modulators cycled round-robin (TinkerPop's rule);
            # a by() may name a property, 'id', or 'label'
            if not args:
                raise InvalidArgument("project() needs at least one key")
            if not bys:
                raise InvalidArgument(
                    "project() requires .by(property) modulators (bare "
                    "traversal by() forms are not supported)"
                )
            cols = []
            for i, k in enumerate(args):
                prop = str(bys[i % len(bys)][0])
                src = {"id": "~id", "label": "~label"}.get(prop, prop)
                if src not in self.df.columns:
                    raise InvalidArgument(f"project by unknown property {prop!r}")
                cols.append(F.col(f"`{src}`").alias(str(k)))
            self.df = self.df.select(*cols)
            self.kind = "value"
        elif name == "dedup":
            self.df = self.df.distinct()
        elif name == "limit":
            self.df = self.df.limit(int(args[0]))
        elif name == "range":
            if len(args) != 2:
                raise InvalidArgument("range(low, high) needs two integers")
            lo, hi = int(args[0]), int(args[1])
            if not (0 <= lo < hi):
                raise InvalidArgument("range(low, high) needs 0 <= low < high")
            self.df = self.df.offset(lo).limit(hi - lo)
        elif name == "count":
            self.df = self.df.agg(F.count(F.lit(1)).alias("count"))
            self.kind = "value"
        elif name == "fold":
            # the whole stream folded to ONE list row; TinkerPop keeps
            # arrival order, which a distributed stream doesn't have —
            # sorted for determinism (documented, oracle-checkable)
            col = (
                self.df.columns[0]
                if self.kind == "value" and len(self.df.columns) == 1
                else "~id"
            )
            if col not in self.df.columns:
                raise InvalidArgument("fold() requires a value or element stream")
            # remember what was folded so unfold() can restore an
            # ELEMENT stream (g.V().fold().unfold().out() is valid
            # TinkerPop) — ids rejoin their property rows on unfold
            self._folded_kind = self.kind if col == "~id" else "value"
            self.df = self.df.agg(
                F.array_sort(F.collect_list(F.col(f"`{col}`"))).alias("folded")
            )
            self.kind = "value"
        elif name == "unfold":
            if len(self.df.columns) != 1:
                raise InvalidArgument("unfold() requires a single-column stream")
            col = self.df.columns[0]
            self.df = self.df.select(F.explode(F.col(f"`{col}`")).alias("value"))
            folded = getattr(self, "_folded_kind", None)
            if folded in ("V", "E"):
                base = self.vertices if folded == "V" else self.edges
                self.df = self.df.join(
                    base, self.df["value"] == base["`~id`"], "inner"
                ).drop("value")
                self.kind = folded
            else:
                self.kind = "value"
            self._folded_kind = None
        elif name in ("sum", "mean", "min", "max"):
            if self.kind != "value" or len(self.df.columns) != 1:
                raise InvalidArgument(
                    f"{name}() requires a single-value stream (e.g. after values('p'))"
                )
            col = self.df.columns[0]
            fn = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max}[name]
            self.df = self.df.agg(fn(F.col(f"`{col}`")).alias(name))
        elif name == "path":
            if "__path" not in self.df.columns:
                raise InvalidArgument("internal: path() without tracking enabled")
            self.df = self.df.select(F.col("__path").alias("path"))
            self.kind = "value"
        elif name == "simplePath":
            if "__path" not in self.df.columns:
                raise InvalidArgument("internal: simplePath() without tracking enabled")
            self.df = self.df.where(
                F.size(F.array_distinct("__path")) == F.size("__path")
            )
        elif name == "union":
            # union(t1, t2, ...): every branch's results, bag semantics
            if self.kind == "value":
                raise InvalidArgument("union() requires a vertex or edge stream")
            frags = _split_fragments(args[0])
            if len(frags) < 2:
                raise InvalidArgument("union() needs at least two traversals")
            out = None
            kinds = set()
            try:
                for fr in frags:
                    # the source ~id rides each branch (like coalesce) so
                    # per-traverser limit/range work inside union too
                    t2 = _Traversal(
                        self.kind,
                        self.df.withColumn("__tag___wsrc", F.col("`~id`")),
                        self.vertices,
                        self.edges,
                    )
                    t2.tags = dict(self.tags)
                    t2.tags["__wsrc"] = self.kind
                    t2.in_branch = True
                    for n2, a2, b2 in _expand_and_fold(_parse("g." + fr)):
                        t2.apply(n2, a2, b2)
                    kinds.add(t2.kind)
                    df2 = t2.df.drop("__tag___wsrc")
                    out = df2 if out is None else out.unionByName(df2)
            except InvalidArgument:
                raise
            except Exception as exc:
                raise InvalidArgument(
                    f"union() branches produce incompatible columns: {exc}"
                ) from exc
            if len(kinds) != 1:
                raise InvalidArgument(
                    "union() branches must end with the same element kind"
                )
            self.df = out
            self.kind = kinds.pop()
        elif name in ("coalesce", "optional"):
            # coalesce(t1, t2, ...): per source element, the results of
            # the FIRST sub-traversal yielding anything; optional(t) ==
            # coalesce(t, identity).  Each branch runs once over the
            # whole stream with the source ~id carried as a tag; branch
            # k's rows survive only for sources unmatched by branches
            # < k (one anti-join per later branch) — per-element
            # semantics without per-element execution.
            if self.kind == "value":
                raise InvalidArgument(f"{name}() requires a vertex or edge stream")
            frags = _split_fragments(args[0])
            if name == "optional" and len(frags) != 1:
                raise InvalidArgument("optional() takes exactly one traversal")
            if name == "coalesce" and len(frags) < 2:
                raise InvalidArgument("coalesce() needs at least two traversals")
            branches = []
            for fr in frags:
                t2 = _Traversal(
                    self.kind,
                    self.df.withColumn("__tag___wsrc", F.col("`~id`")),
                    self.vertices,
                    self.edges,
                )
                t2.tags["__wsrc"] = self.kind
                t2.in_branch = True
                for n2, a2, b2 in _expand_and_fold(_parse("g." + fr)):
                    t2.apply(n2, a2, b2)
                if "__tag___wsrc" not in t2.df.columns:
                    raise InvalidArgument(
                        f"{name}() branches must stay traversals (no aggregates/select)"
                    )
                branches.append(t2)
            kinds = {t2.kind for t2 in branches}
            if len(kinds) != 1:
                raise InvalidArgument(
                    f"{name}() branches must end with the same element kind"
                )
            out = None
            matched = None
            try:
                for t2 in branches:
                    df2 = t2.df
                    if matched is not None:
                        df2 = df2.join(
                            matched, df2["__tag___wsrc"] == matched["__m"], "left_anti"
                        )
                    m_k = t2.df.select(F.col("__tag___wsrc").alias("__m")).distinct()
                    matched = (
                        m_k if matched is None
                        else matched.unionByName(m_k).distinct()
                    )
                    out = df2 if out is None else out.unionByName(df2)
                if name == "optional":
                    if kinds != {self.kind}:
                        raise InvalidArgument(
                            "optional()'s traversal must end with the same "
                            "element kind as its input"
                        )
                    leftover = self.df.withColumn(
                        "__tag___wsrc", F.col("`~id`")
                    ).join(matched, F.col("__tag___wsrc") == matched["__m"], "left_anti")
                    out = out.unionByName(leftover)
            except InvalidArgument:
                raise
            except Exception as exc:
                raise InvalidArgument(
                    f"{name}() branches produce incompatible columns: {exc}"
                ) from exc
            self.df = out.drop("__tag___wsrc")
            self.kind = kinds.pop()
        elif name in ("where", "not"):
            # where(<traversal>) keeps elements for which the fragment
            # yields at least one traverser; not(<traversal>) the
            # complement.  The source ~id rides the fragment as a step
            # label, so the test compiles to ONE left-semi / left-anti
            # join on the surviving source ids — no per-element
            # execution, no Python.
            if self.kind == "value":
                raise InvalidArgument(f"{name}() requires a vertex or edge stream")
            if len(args) != 1 or not isinstance(args[0], str):
                raise InvalidArgument(
                    f"{name}() supports a traversal fragment, e.g. {name}(out('knows'))"
                )
            inner = _expand_and_fold(_parse("g." + args[0]))
            t2 = _Traversal(
                self.kind,
                self.df.withColumn("__tag___wsrc", F.col("`~id`")),
                self.vertices,
                self.edges,
            )
            t2.tags["__wsrc"] = self.kind
            t2.in_branch = True
            for iname, iargs, ibys in inner:
                t2.apply(iname, iargs, ibys)
            if "__tag___wsrc" not in t2.df.columns:
                raise InvalidArgument(
                    f"{name}() fragment must stay a traversal (no aggregates/select)"
                )
            keep = t2.df.select(F.col("__tag___wsrc").alias("__keep_id")).distinct()
            how = "left_semi" if name == "where" else "left_anti"
            self.df = self.df.join(keep, self.df["~id"] == keep["__keep_id"], how)
        elif name == "as":
            if len(args) != 1:
                raise InvalidArgument("as() needs exactly one step label")
            tag = str(args[0])
            if self.kind == "value":
                raise InvalidArgument("as() requires a vertex or edge stream")
            self.df = self.df.withColumn(f"__tag_{tag}", F.col("`~id`"))
            self.tags[tag] = self.kind
        elif name == "select":
            self._select(args, bys)
        elif name == "order":
            if by:
                prop = str(by[0])
                desc = len(by) > 1 and str(by[1]).lower() in ("desc", "decr")
                col = F.col(prop).desc() if desc else F.col(prop).asc()
                # deterministic order: tiebreak on id when present
                tie = [F.col("~id").asc()] if "~id" in self.df.columns else []
                self.df = self.df.orderBy(col, *tie)
            else:
                self.df = self.df.orderBy(*[F.col(c).asc() for c in self.df.columns])
        elif name == "groupCount":
            key = str(by[0]) if by else "~label"
            self.df = (
                self.df.groupBy(F.col(f"`{key}`"))
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.col(f"`{key}`").asc())
            )
            self.kind = "value"
        elif name == "group":
            # group().by(key)[.by(valueProp)] -> one row per key with the
            # values as a sorted array (TinkerPop's map rendered relational;
            # sort makes the result deterministic and oracle-checkable)
            if not bys:
                raise InvalidArgument("group() requires .by(key)")
            key = str(bys[0][0])
            val = str(bys[1][0]) if len(bys) > 1 else "~id"
            self.df = (
                self.df.groupBy(F.col(f"`{key}`"))
                .agg(F.array_sort(F.collect_list(F.col(f"`{val}`"))).alias("values"))
                .orderBy(F.col(f"`{key}`").asc())
            )
            self.kind = "value"
        else:
            raise InvalidArgument(f"unsupported gremlin step {name!r}")

    def _run_fragment(self, kind: str, df: DataFrame, fragment: str) -> "_Traversal":
        """Apply one traversal fragment to a frame as a sub-traversal
        (the repeat-body/guard evaluator for the fixpoint loops)."""
        t2 = _Traversal(kind, df, self.vertices, self.edges)
        t2.tags = dict(self.tags)
        for n2, a2, b2 in _expand_and_fold(_parse("g." + fragment)):
            t2.apply(n2, a2, b2)
        return t2

    def _repeat_emit(self, frag: str, emit_first: bool, max_depth: int = 32) -> None:
        """repeat(frag).emit() with NO times() bound: transitive closure
        — every level's traversers are emitted AND keep looping until
        the frontier dies out (no out-edges), with the same driver-loop
        shape and max-depth guard as :meth:`_repeat_until`.
        ``emit_first`` = the emit()-before-repeat() form (level 0 is
        emitted too)."""
        kind = self.kind
        frontier = self.df.localCheckpoint()
        emitted: list[tuple[DataFrame, str]] = []
        if emit_first:
            emitted.append((frontier, kind))
        for depth in range(max_depth + 1):
            if frontier.isEmpty():
                break
            if depth == max_depth:
                raise InvalidArgument(
                    f"repeat().emit() did not exhaust within {max_depth} "
                    "levels: the frontier is still non-empty (likely a "
                    "cycle) — add a .times(n) bound"
                )
            stepped = self._run_fragment(kind, frontier, frag)
            kind = stepped.kind
            frontier = stepped.df.localCheckpoint()
            emitted.append((frontier, kind))
        if not emitted:
            # empty input with emit-last: type the result via one body run
            t0 = self._run_fragment(self.kind, self.df.limit(0), frag)
            emitted.append((t0.df, t0.kind))
        out = emitted[0][0]
        for d2, _k in emitted[1:]:
            out = out.unionByName(d2)
        self.df = out
        self.kind = emitted[-1][1]

    def _repeat_until(
        self, frag: str, pred: str, check_first: bool, max_depth: int = 32
    ) -> None:
        """repeat(frag).until(pred) with NO times() bound: iterate to
        fixpoint with a driver loop (the ``connected_components``
        pattern) — each level runs the body once over the whole
        frontier, splits exited (pred holds) from still-looping rows,
        and stops when the frontier empties; ``localCheckpoint``
        truncates lineage so level k does not replay levels 1..k-1.
        ``check_first`` = the until()-before-repeat() form (predicate
        checked before each body run, so level 0 can exit).  A frontier
        still alive after ``max_depth`` levels raises loudly — an
        emit-less cycle with an unsatisfiable predicate is genuinely
        unbounded and a static cap beats a hung job."""
        run = self._run_fragment
        kind = self.kind
        frontier = self.df
        exited: list[tuple[DataFrame, str]] = []
        if check_first:
            exited.append((run(kind, frontier, f"where({pred})").df, kind))
            frontier = run(kind, frontier, f"not({pred})").df
        for depth in range(max_depth + 1):
            frontier = frontier.localCheckpoint()
            if frontier.isEmpty():
                break
            if depth == max_depth:
                raise InvalidArgument(
                    f"repeat().until() did not converge within {max_depth} "
                    "iterations: the frontier is still non-empty (likely a "
                    "cycle the predicate never satisfies) — add a .times(n) "
                    "bound or a stronger until() predicate"
                )
            stepped = run(kind, frontier, frag)
            kind = stepped.kind
            # lazy checkpoint of the body output: BOTH the exited
            # (where(pred)) and looping (not(pred)) branches read it, and
            # unmaterialized each would re-run the body — 2 body
            # evaluations per level.  The next round's eager frontier
            # checkpoint materializes it as a side effect (the frontier
            # is a filter over it), so no extra job is spent.
            sdf = stepped.df.localCheckpoint(eager=False)
            exited.append((run(kind, sdf, f"where({pred})").df, kind))
            frontier = run(kind, sdf, f"not({pred})").df
        if not exited:
            # empty input with check-last: type the empty result through
            # one guarded body run so downstream steps see real columns
            t0 = run(self.kind, self.df.limit(0), frag)
            exited.append((run(t0.kind, t0.df, f"where({pred})").df, t0.kind))
        out = exited[0][0]
        for d2, _k in exited[1:]:
            out = out.unionByName(d2)
        self.df = out
        self.kind = exited[-1][1]

    def _select(self, args: list[Any], bys: list[list[Any]] | None) -> None:
        """select('a','b')[.by(p1).by(p2)] — project step labels; with by
        modulators applied round-robin (TinkerPop's rule), each selected
        element resolves its property via one equi-join back to its
        vertex/edge frame (broadcast by AQE — the frames are dims here)."""
        if not args:
            raise InvalidArgument("select() needs at least one step label")
        out_cols: list[Any] = []
        df = self.df
        for i, a in enumerate(args):
            tag = str(a)
            if tag not in self.tags:
                raise InvalidArgument(f"select of unknown step label {tag!r}")
            prop = str(bys[i % len(bys)][0]) if bys else None
            if prop is None:
                out_cols.append(F.col(f"__tag_{tag}").alias(tag))
                continue
            src = self.vertices if self.tags[tag] == "V" else self.edges
            side = src.select(
                F.col("`~id`").alias(f"__sid_{tag}"), F.col(f"`{prop}`").alias(tag)
            )
            df = df.join(side, F.col(f"__tag_{tag}") == F.col(f"__sid_{tag}")).drop(
                f"__sid_{tag}"
            )
            out_cols.append(F.col(f"`{tag}`"))
        self.df = df.select(*out_cols)
        self.kind = "value"


def _repeat_frag(
    steps: list[tuple[str, list[Any]]], rep_i: int
) -> tuple[str, list[tuple[str, list[Any]]]]:
    """Validate one repeat(frag) body -> (frag, parsed steps)."""
    frag = steps[rep_i][1][0]
    inner = _parse("g." + frag)
    if any(nm in ("repeat", "times", "emit") for nm, _a in inner):
        raise InvalidArgument("nested repeat()/emit() is not supported")
    return frag, inner


def _repeat_parts(
    steps: list[tuple[str, list[Any]]], rep_i: int, times_i: int
) -> tuple[str, list[tuple[str, list[Any]]], int]:
    """Validate one repeat(frag)...times(n) pair -> (frag, parsed, n)."""
    if times_i >= len(steps) or steps[times_i][0] != "times":
        raise InvalidArgument("repeat(...) must be followed by .times(n)")
    times_args = steps[times_i][1]
    if len(times_args) != 1 or not isinstance(times_args[0], int):
        raise InvalidArgument("times() needs one integer argument")
    n_times = times_args[0]
    if not (1 <= n_times <= 32):
        raise InvalidArgument("times(n) supports 1 <= n <= 32")
    frag, inner = _repeat_frag(steps, rep_i)
    return frag, inner, n_times


def _expand_and_fold(steps: list[tuple[str, list[Any]]]):
    """repeat(...).times(n) unrolling (+ emit() via the union-of-powers
    rewrite: repeat(X).emit().times(n) == union(X, X.X, ..., X^n), and
    emit().repeat(X).times(n) additionally emits level 0 through an
    identity() branch) + .by(...) modulator folding — shared by the
    top-level compiler and where()/not() sub-traversals.

    until()/times() follow TinkerPop's modulator rule: each SETS the
    single loop-break predicate and the LAST call wins — a trailing
    times(n) turns repeat(X).until(P).times(n) into a pure n-times
    unroll, and a trailing until(P) (or an unbounded until) compiles to
    the ``repeat_until`` fixpoint step (driver loop, max-depth 32)."""
    expanded: list[tuple[str, list[Any]]] = []
    i = 0
    while i < len(steps):
        name, args = steps[i]
        if name == "emit" and i + 1 < len(steps) and steps[i + 1][0] == "repeat":
            if i + 2 < len(steps) and steps[i + 2][0] == "times":
                # emit().repeat(X).times(n): levels 0..n per traverser
                frag, _inner, n_times = _repeat_parts(steps, i + 1, i + 2)
                branches = ["identity()"] + [
                    ".".join([frag] * k) for k in range(1, n_times + 1)
                ]
                expanded.append(("union", [", ".join(branches)]))
                i += 3
            else:
                # emit().repeat(X): transitive closure incl. level 0,
                # iterated to fixpoint (frontier dies out or max-depth)
                frag, _inner = _repeat_frag(steps, i + 1)
                expanded.append(("repeat_emit", [frag, True]))
                i += 2
        elif name == "until" and i + 1 < len(steps) and steps[i + 1][0] == "repeat":
            # until(P).repeat(X)[.times(n)]: TinkerPop's modulator rule —
            # until() and times() each SET the single loop-break
            # predicate, LAST call wins.  A trailing times(n) therefore
            # overrides P (pure n-times unroll, identical emit set to
            # until(loops().is(n))); without one, iterate to fixpoint
            # with the predicate checked BEFORE each body run.
            pred = args[0]
            if i + 2 < len(steps) and steps[i + 2][0] == "times":
                _frag, inner, n_times = _repeat_parts(steps, i + 1, i + 2)
                expanded.extend(inner * n_times)
                i += 3
            else:
                frag, _inner = _repeat_frag(steps, i + 1)
                expanded.append(("repeat_until", [frag, pred, True]))
                i += 2
        elif name == "repeat":
            nxt = steps[i + 1][0] if i + 1 < len(steps) else None
            if nxt == "emit":
                if i + 2 < len(steps) and steps[i + 2][0] == "times":
                    # repeat(X).emit().times(n): levels 1..n
                    frag, inner, n_times = _repeat_parts(steps, i, i + 2)
                    if n_times == 1:
                        expanded.extend(inner)
                    else:
                        expanded.append(
                            (
                                "union",
                                [", ".join(
                                    ".".join([frag] * k)
                                    for k in range(1, n_times + 1)
                                )],
                            )
                        )
                    i += 3
                else:
                    # repeat(X).emit(): transitive closure, levels 1..,
                    # iterated to fixpoint
                    frag, _inner = _repeat_frag(steps, i)
                    expanded.append(("repeat_emit", [frag, False]))
                    i += 2
            elif nxt == "until":
                # repeat(X).until(P)[.times(n)]: a trailing times(n)
                # OVERRIDES P (TinkerPop's last-modulator-wins rule);
                # until-only iterates to fixpoint, predicate checked
                # AFTER each body run
                pred = steps[i + 1][1][0]
                if i + 2 < len(steps) and steps[i + 2][0] == "times":
                    _frag, inner, n_times = _repeat_parts(steps, i, i + 2)
                    expanded.extend(inner * n_times)
                    i += 3
                else:
                    frag, _inner = _repeat_frag(steps, i)
                    expanded.append(("repeat_until", [frag, pred, False]))
                    i += 2
            else:
                frag, inner, n_times = _repeat_parts(steps, i, i + 1)
                if i + 2 < len(steps) and steps[i + 2][0] == "until":
                    # repeat(X).times(n).until(P): the trailing until(P)
                    # overrides the times bound (last modulator wins)
                    expanded.append(
                        ("repeat_until", [frag, steps[i + 2][1][0], False])
                    )
                    i += 3
                else:
                    expanded.extend(inner * n_times)
                    i += 2
        elif name == "emit":
            raise InvalidArgument(
                "emit() is only supported adjacent to repeat(...).times(n)"
            )
        elif name == "until":
            raise InvalidArgument(
                "until() is only supported adjacent to repeat(...)"
            )
        else:
            expanded.append((name, args))
            i += 1

    # fold .by(...) modulators onto their predecessor (a step may take
    # several — group().by(k).by(v), select('a','b').by(p1).by(p2))
    folded: list[tuple[str, list[Any], list[list[Any]] | None]] = []
    for name, args in expanded:
        if name == "by":
            if not folded:
                raise InvalidArgument("by() without a preceding step")
            pname, pargs, pbys = folded[-1]
            folded[-1] = (pname, pargs, (pbys or []) + [args])
        else:
            folded.append((name, args, None))
    return folded


def compile_gremlin(
    query: str, vertices: DataFrame, edges: DataFrame
) -> DataFrame:
    """Compile a traversal string to a DataFrame plan (see module doc for
    the supported grammar)."""
    steps = _parse(query)
    if not steps or steps[0][0] not in ("V", "E"):
        raise InvalidArgument("traversal must start with g.V(...) or g.E(...)")
    folded = _expand_and_fold(steps)

    track = any(nm in ("path", "simplePath") for nm, _a, _b in folded)

    start, sargs, _ = folded[0]
    if start == "V":
        df = vertices
        if sargs:
            df = df.where(F.col("~id").isin([str(a) for a in sargs]))
        t = _Traversal("V", df, vertices, edges, track_path=track)
    else:
        df = edges
        if sargs:
            df = df.where(F.col("~id").isin([str(a) for a in sargs]))
        t = _Traversal("E", df, vertices, edges, track_path=track)

    for name, args, bys in folded[1:]:
        t.apply(name, args, bys)
    return t.df
