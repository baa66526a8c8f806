"""Athena (Trino/Presto) SQL -> Spark SQL translation (reference:
awswrangler/athena/_read.py ``read_sql_query`` — the reference ships the
string to Athena, whose engine IS Trino; a reference user's query
library is therefore written in the Trino dialect, and several of its
everyday constructs do not parse or mean something else on Spark).

``trino_to_spark_sql`` rewrites exactly the constructs that differ,
leaving everything else byte-for-byte intact:

==========================================  ================================
Trino / Athena                              Spark SQL
==========================================  ================================
``"quoted"`` identifiers                    `` `quoted` `` (Trino double
                                            quotes are ALWAYS identifiers;
                                            Spark parses them as strings)
``date_diff('unit', t1, t2)``               ``timestampdiff(UNIT, t1, t2)``
``date_add('unit', n, t)``                  ``timestampadd(UNIT, n, t)``
``approx_distinct(x[, e])``                 ``approx_count_distinct(x[, e])``
``approx_percentile(x, p)``                 ``percentile_approx(x, p)``
``arbitrary(x)``                            ``any_value(x)``
``strpos(s, sub)``                          ``instr(s, sub)``
``json_extract_scalar(j, p)``               ``get_json_object(j, p)``
``json_extract(j, p)``                      ``get_json_object(j, p)``
``from_iso8601_timestamp(s)``               ``to_timestamp(s)``
``to_unixtime(t)``                          ``cast(t AS DOUBLE)``
``day_of_week/day_of_year/week_of_year``    ``dayofweek/dayofyear/weekofyear``
``TRY(CAST(x AS T))``                       ``TRY_CAST(x AS T)``
``TRY(a + b)`` / ``-`` / ``*`` / ``/``      ``try_add/try_subtract/
                                            try_multiply/try_divide(a, b)``
``TRY(element_at(a, i))``                   ``try_element_at(a, i)``
``a[i]`` (1-based subscript)                ``element_at(a, i)`` (1-based in
                                            both; Spark's ``[]`` is 0-based)
``CROSS JOIN UNNEST(e) AS t (c)``           ``LATERAL VIEW explode(e) t AS c``
``CROSS JOIN UNNEST(m) AS t (k, v)``        ``LATERAL VIEW explode(m) t AS
                                            k, v`` (map unnest)
``CROSS JOIN UNNEST(a, b) AS t (x, y)``     ``LATERAL VIEW inline(
                                            arrays_zip(a, b)) t AS x, y``
                                            (positional zip, NULL-padded —
                                            arrays_zip matches Trino's rule)
``map_agg(k, v)``                           ``map_from_entries(collect_list(
                                            struct(k, v)))``
``zip(a, b)``                               ``arrays_zip(a, b)``
``any_match/all_match/none_match(a, f)``    ``exists/forall/NOT exists``
``format('%s', x)``                         ``format_string('%s', x)``
``codepoint(c)`` / ``is_nan(x)``            ``ascii(c)`` / ``isnan(x)``
``to_utf8(s)`` / ``from_utf8(b)``           ``encode/decode(x, 'UTF-8')``
``nan()`` / ``infinity()``                  ``CAST('NaN'/'Infinity' AS DOUBLE)``
``split(s, d[, n])``                        ``split(s, '\\Q'||d||'\\E'[, n])``
                                            (Trino delimiters are LITERAL,
                                            Spark's are regex — \\Q quoting
                                            preserves literal semantics for
                                            constant AND dynamic delimiters)
``from_unixtime(x)``                        ``timestamp_seconds(x)`` (Spark's
                                            same-named fn returns a STRING)
``from_unixtime(x, zone)``                  ``from_utc_timestamp(
                                            timestamp_seconds(x), zone)`` —
                                            the instant at that zone's wall
                                            clock (Spark has no timestamptz)
``date_parse(s, '%Y-%m-%d')``               ``to_timestamp(s, 'yyyy-MM-dd')``
                                            (MySQL %-tokens mapped; unknown
                                            tokens raise)
``format_datetime`` / ``parse_datetime``    ``date_format`` / ``to_timestamp``
``ARRAY[1, 2]``                             ``array(1, 2)``
``ROW(a, b)``                               ``struct(a, b)``
``CAST(x AS VARCHAR/VARBINARY/REAL)``       ``AS STRING/BINARY/FLOAT`` (bare)
``TABLESAMPLE BERNOULLI(p)``                ``TABLESAMPLE (p PERCENT)``
``FETCH FIRST n ROWS ONLY``                 ``LIMIT n``
``date_format(ts, '%Y...')``                MySQL tokens mapped (Trino's
                                            date_format IS the MySQL one)
``week`` / ``last_day_of_month``            ``weekofyear`` / ``last_day``
``levenshtein_distance/starts_with``        ``levenshtein/startswith``
``to_hex/from_hex`` / ``random()``          ``hex/unhex`` / ``rand()``
==========================================  ================================

``UNNEST ... WITH ORDINALITY`` zips a trailing ``sequence(1, size)``
array so the last output column is Trino's 1-based position (arrays,
multi-arrays over the max length, and maps via map_keys/map_values).
Unsupported Trino constructs that have no mechanical Spark equivalent
(``TRY`` around anything beyond CAST/arithmetic/element_at,
``from_unixtime(x, hours, minutes)``, 3-arg weighted ``approx_percentile``) raise
``InvalidArgument`` with the manual rewrite to use — a loud error beats
a silently different answer.

Everything SHARED by the two dialects (lambdas ``x -> x + 1``,
``transform/filter/reduce`` HOFs, ``element_at``, ``cardinality``,
``split_part``, ``array_agg``, ``regexp_like``, ``||`` concat, interval
literals) passes through untouched — the translator only ever fires on
tokens that are not valid Spark to begin with, so applying it to a
query that is already Spark SQL is a no-op by construction, with the
single deliberate exception of double-quoted tokens (Trino: identifier,
Spark: string) — which is why the dialect is OPT-IN per call
(``read_sql_query(..., dialect="trino")``) rather than sniffed.
"""

from __future__ import annotations

import re

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_FN_RENAMES = {
    "approx_distinct": "approx_count_distinct",
    "approx_percentile": "percentile_approx",
    "arbitrary": "any_value",
    "strpos": "instr",
    "json_extract_scalar": "get_json_object",
    "json_extract": "get_json_object",
    "from_iso8601_timestamp": "to_timestamp",
    "day_of_week": "dayofweek",
    "day_of_year": "dayofyear",
    "week_of_year": "weekofyear",
    # lambda-predicate family (Spark names differ, arity identical)
    "any_match": "exists",
    "all_match": "forall",
    # misc scalar functions with no Spark name collision
    "format": "format_string",
    "codepoint": "ascii",
    "is_nan": "isnan",
    "levenshtein_distance": "levenshtein",
    "starts_with": "startswith",
    "to_hex": "hex",
    "from_hex": "unhex",
    "random": "rand",
    "week": "weekofyear",
    "last_day_of_month": "last_day",
    # Joda patterns and Spark's are compatible for the everyday
    # y/M/d/H/m/s/S/E tokens; exotic Joda tokens are the user's lookout
    "format_datetime": "date_format",
    "parse_datetime": "to_timestamp",
}

# MySQL date_parse tokens -> Spark (Java) datetime pattern letters
_MYSQL_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "i": "mm", "s": "ss",
    "S": "ss", "f": "SSSSSS", "p": "a", "W": "EEEE", "a": "EEE",
    "b": "MMM", "M": "MMMM", "j": "DDD", "T": "HH:mm:ss", "%": "%",
}


def _mysql_to_java_format(fmt: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            tok = fmt[i + 1] if i + 1 < len(fmt) else ""
            if tok not in _MYSQL_FMT:
                raise InvalidArgument(
                    f"date_parse format token %{tok!r} has no Spark mapping"
                )
            out.append(_MYSQL_FMT[tok])
            i += 2
        elif c.isalpha():
            out.append(f"'{c}'")  # literal letters must be quoted in Java patterns
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)

_UNITS = "millisecond|second|minute|hour|day|week|month|quarter|year"


def _shield_strings(sql: str) -> tuple[str, list[str]]:
    """Single-quoted literals -> placeholders ('' escape handled)."""
    out: list[str] = []
    lits: list[str] = []
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            if j >= n:
                raise InvalidArgument("unterminated string literal in SQL")
            lits.append(sql[i : j + 1])
            out.append(f"\x00{len(lits) - 1}\x00")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out), lits


def _unshield(sql: str, lits: list[str]) -> str:
    for i, lit in enumerate(lits):
        sql = sql.replace(f"\x00{i}\x00", lit)
    return sql


def _find_close(s: str, open_pos: int) -> int:
    """Position of the ')' matching the '(' at open_pos (strings already
    shielded, so parens inside literals cannot mislead the scan)."""
    depth = 0
    for i in range(open_pos, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise InvalidArgument("unbalanced parentheses in SQL")


def _top_level_op_split(inner: str, ops: str) -> tuple[str, str, str] | None:
    """Split ``inner`` at its RIGHTMOST top-level (depth-0) occurrence of
    one of the single-char operators in ``ops`` (left-associative SQL:
    the rightmost lowest-precedence operator is the expression root).
    Unary +/- (operator preceded by nothing, '(' or another operator)
    are skipped.  Returns (lhs, op, rhs) or None."""
    depth = 0
    best = -1
    for i, c in enumerate(inner):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0 and c in ops:
            prev = inner[:i].rstrip()
            if c in "+-" and (not prev or prev[-1] in "(,+-*/%<>=|"):
                continue  # unary sign, not a binary operator
            best = i
    if best < 0:
        return None
    return inner[:best].strip(), inner[best], inner[best + 1 :].strip()


def _rewrite_try_cast(s: str) -> str:
    """TRY(CAST(x AS T)) -> TRY_CAST(x AS T); TRY(a op b) for top-level
    + - * / -> try_add/try_subtract/try_multiply/try_divide;
    TRY(element_at(..)) -> try_element_at(..).  Anything else is refused
    (Spark has no generic TRY and a silent pass-through would change
    error semantics)."""
    _TRY_OPS = {"+": "try_add", "-": "try_subtract", "*": "try_multiply", "/": "try_divide"}
    while True:
        m = re.search(r"\bTRY\s*\(", s, re.I)
        if not m:
            return s
        open_pos = s.index("(", m.start())
        close_pos = _find_close(s, open_pos)
        inner = s[open_pos + 1 : close_pos].strip()
        im = re.match(r"^CAST\s*\(", inner, re.I)
        if im:
            cast_open = inner.index("(", im.start())
            cast_close = _find_close(inner, cast_open)
            if inner[cast_close + 1 :].strip():
                raise InvalidArgument(
                    "TRY(CAST(..) <more>) is not a plain TRY(CAST(..)); "
                    "rewrite manually"
                )
            s = s[: m.start()] + "TRY_CAST" + inner[cast_open:] + s[close_pos + 1 :]
            continue
        if "||" not in inner:
            # try the arithmetic root: +/- bind loosest, then * /
            split = _top_level_op_split(inner, "+-") or _top_level_op_split(inner, "*/")
            if split:
                lhs, op, rhs = split
                s = (
                    s[: m.start()]
                    + f"{_TRY_OPS[op]}({lhs}, {rhs})"
                    + s[close_pos + 1 :]
                )
                continue
        em = re.match(r"^element_at\s*\(", inner, re.I)
        if em:
            ea_open = inner.index("(", em.start())
            ea_close = _find_close(inner, ea_open)
            if not inner[ea_close + 1 :].strip():
                s = (
                    s[: m.start()]
                    + "try_element_at" + inner[ea_open:]
                    + s[close_pos + 1 :]
                )
                continue
        raise InvalidArgument(
            "TRY(expr) has no generic Spark equivalent beyond CAST, "
            "top-level + - * /, and element_at; rewrite with try_* "
            f"functions or a CASE guard (saw: TRY({inner[:60]}...))"
        )


def _split_top_commas(expr: str) -> list[str]:
    parts: list[str] = []
    depth = 0
    buf: list[str] = []
    for c in expr:
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _rewrite_unnest(s: str) -> str:
    """CROSS JOIN UNNEST -> LATERAL VIEW:

    - ``UNNEST(a) AS t (c)``            -> ``explode(a) t AS c``
    - ``UNNEST(m) AS t (k, v)``         -> ``explode(m) t AS k, v``
      (one MAP argument, two output columns — Trino's map unnest)
    - ``UNNEST(a, b, ...) AS t (x, y)`` -> ``inline(arrays_zip(a, b)) t
      AS x, y`` — Trino zips positionally padding the shorter arrays
      with NULL, which is exactly ``arrays_zip``'s rule, and ``inline``
      flattens the struct array to columns.
    - ``... WITH ORDINALITY AS t (.., ord)`` -> the same zips with a
      trailing ``sequence(1, size)`` array: Trino's ordinality is the
      1-based position over the zip length (max array size), which is
      exactly what zipping against ``sequence(1, greatest(size(..)))``
      yields; an empty-size guard avoids ``sequence(1, 0)``'s
      descending surprise, and a NULL input still unnests to 0 rows.
    """
    while True:
        m = re.search(r"\bCROSS\s+JOIN\s+UNNEST\s*\(", s, re.I)
        if not m:
            return s
        open_pos = s.index("(", m.end() - 1)
        close_pos = _find_close(s, open_pos)
        exprs = _split_top_commas(s[open_pos + 1 : close_pos])
        tail = s[close_pos + 1 :]
        om = re.match(r"\s*WITH\s+ORDINALITY\b", tail, re.I)
        if om:
            tail = tail[om.end() :]
        tm = re.match(r"\s*(?:AS\s+)?(\w+)\s*\(\s*([\w\s,]+?)\s*\)", tail, re.I)
        if not tm:
            raise InvalidArgument(
                "CROSS JOIN UNNEST requires an alias: ... AS t (col, ...)"
            )
        alias = tm.group(1)
        cols = [c.strip() for c in tm.group(2).split(",") if c.strip()]

        def _seq(size_expr: str) -> str:
            return f"IF({size_expr} > 0, sequence(1, {size_expr}), array())"

        if om:
            # the LAST output column is the 1-based ordinality
            if len(exprs) == 1 and len(cols) == 2:
                gen = (
                    f"inline(arrays_zip({exprs[0]}, "
                    f"{_seq(f'size({exprs[0]})')}))"
                )
            elif len(exprs) == 1 and len(cols) == 3:
                # single MAP argument: (key, value, ordinality)
                e = exprs[0]
                gen = (
                    f"inline(arrays_zip(map_keys({e}), map_values({e}), "
                    f"{_seq(f'size({e})')}))"
                )
            elif len(exprs) >= 2 and len(cols) == len(exprs) + 1:
                mx = "greatest(" + ", ".join(f"size({e})" for e in exprs) + ")"
                gen = (
                    f"inline(arrays_zip({', '.join(exprs)}, {_seq(mx)}))"
                )
            else:
                raise InvalidArgument(
                    f"UNNEST WITH ORDINALITY with {len(exprs)} argument(s) "
                    f"and {len(cols)} output column(s) has no mechanical "
                    "Spark rewrite (expected n arrays -> n+1 columns or "
                    "1 map -> 3 columns)"
                )
        elif len(exprs) == 1 and len(cols) == 1:
            gen = f"explode({exprs[0]})"
        elif len(exprs) == 1 and len(cols) == 2:
            # a single MAP argument unnests to (key, value) in Trino;
            # Spark's explode on a map yields the same two columns
            gen = f"explode({exprs[0]})"
        elif len(exprs) >= 2 and len(cols) == len(exprs):
            gen = f"inline(arrays_zip({', '.join(exprs)}))"
        else:
            raise InvalidArgument(
                f"UNNEST with {len(exprs)} argument(s) and {len(cols)} output "
                "column(s) has no mechanical Spark rewrite (expected 1->1 "
                "array, 1->2 map, or n->n arrays)"
            )
        s = (
            s[: m.start()]
            + f"LATERAL VIEW {gen} {alias} AS {', '.join(cols)}"
            + tail[tm.end() :]
        )


def trino_to_spark_sql(sql: str) -> str:
    """Translate the Trino-only constructs in ``sql`` to Spark SQL (see
    module docstring for the exact table)."""
    s, lits = _shield_strings(sql)

    # double-quoted tokens are identifiers in Trino, strings in Spark
    def _ident(m: re.Match) -> str:
        return "`" + m.group(1).replace('""', '"') + "`"

    s = re.sub(r'"((?:[^"]|"")*)"', _ident, s)

    # date_diff('unit', a, b) / date_add('unit', n, t): the unit string
    # is a shielded literal — resolve it back to decide the rewrite
    def _unit_call(fn_out: str):
        def _sub(m: re.Match) -> str:
            lit = lits[int(m.group(1))]
            unit = lit[1:-1].strip().lower()
            if not re.fullmatch(_UNITS, unit):
                raise InvalidArgument(f"unsupported {fn_out} unit {lit}")
            return f"{fn_out}({unit.upper()},"

        return _sub

    s = re.sub(r"\bdate_diff\s*\(\s*\x00(\d+)\x00\s*,", _unit_call("timestampdiff"), s, flags=re.I)
    s = re.sub(r"\bdate_add\s*\(\s*\x00(\d+)\x00\s*,", _unit_call("timestampadd"), s, flags=re.I)

    # Trino's 3-arg approx_percentile(x, WEIGHT, p) must not silently
    # become Spark's (col, percentage, ACCURACY) — different semantics
    for m in re.finditer(r"\bapprox_percentile\s*\(", s, flags=re.I):
        open_pos = s.index("(", m.start())
        inner = s[open_pos + 1 : _find_close(s, open_pos)]
        depth = 0
        commas = 0
        for c in inner:
            depth += c == "("
            depth -= c == ")"
            commas += c == "," and depth == 0
        if commas >= 2:
            raise InvalidArgument(
                "3-arg approx_percentile(x, weight, p) is weighted in Trino "
                "but (col, p, accuracy) in Spark; rewrite manually"
            )

    for old, new in _FN_RENAMES.items():
        s = re.sub(rf"\b{old}\s*\(", f"{new}(", s, flags=re.I)

    # map_agg(k, v) -> map_from_entries(collect_list(struct(k, v)));
    # the two arguments split at the top-level comma
    while True:
        m = re.search(r"\bmap_agg\s*\(", s, re.I)
        if not m:
            break
        open_pos = s.index("(", m.start())
        close_pos = _find_close(s, open_pos)
        inner = s[open_pos + 1 : close_pos]
        depth = 0
        split = -1
        for i, c in enumerate(inner):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                split = i
                break
        if split < 0:
            raise InvalidArgument("map_agg needs two arguments")
        k, v = inner[:split].strip(), inner[split + 1 :].strip()
        s = (
            s[: m.start()]
            + f"map_from_entries(collect_list(struct({k}, {v})))"
            + s[close_pos + 1 :]
        )

    # Trino zip(a, b, ...) -> arrays_zip (no Spark function named zip,
    # so the rewrite cannot collide)
    s = re.sub(r"\bzip\s*\(", "arrays_zip(", s, flags=re.I)

    # none_match(a, f) == NOT exists(a, f); balanced scan keeps the
    # whole argument list intact
    while True:
        m = re.search(r"\bnone_match\s*\(", s, re.I)
        if not m:
            break
        open_pos = s.index("(", m.start())
        close_pos = _find_close(s, open_pos)
        inner = s[open_pos + 1 : close_pos]
        s = s[: m.start()] + f"(NOT exists({inner}))" + s[close_pos + 1 :]

    # to_utf8/from_utf8 -> encode/decode WITH the charset argument
    for trino_fn, spark_fn in (("to_utf8", "encode"), ("from_utf8", "decode")):
        while True:
            m = re.search(rf"\b{trino_fn}\s*\(", s, re.I)
            if not m:
                break
            open_pos = s.index("(", m.start())
            close_pos = _find_close(s, open_pos)
            inner = s[open_pos + 1 : close_pos]
            lit = f"\x00{len(lits)}\x00"
            lits.append("'UTF-8'")
            s = s[: m.start()] + f"{spark_fn}({inner}, {lit})" + s[close_pos + 1 :]

    # IEEE literals Spark spells as casts
    nan_lit = f"\x00{len(lits)}\x00"
    lits.append("'NaN'")
    s = re.sub(r"\bnan\s*\(\s*\)", f"CAST({nan_lit} AS DOUBLE)", s, flags=re.I)
    inf_lit = f"\x00{len(lits)}\x00"
    lits.append("'Infinity'")
    s = re.sub(r"\binfinity\s*\(\s*\)", f"CAST({inf_lit} AS DOUBLE)", s, flags=re.I)

    # to_unixtime(t) -> cast(t AS DOUBLE) (Trino keeps sub-second
    # fraction; Spark's unix_timestamp() truncates, the cast does not)
    while True:
        m = re.search(r"\bto_unixtime\s*\(", s, re.I)
        if not m:
            break
        open_pos = s.index("(", m.start())
        close_pos = _find_close(s, open_pos)
        inner = s[open_pos + 1 : close_pos]
        s = s[: m.start()] + f"CAST({inner} AS DOUBLE)" + s[close_pos + 1 :]

    # ROW(a, b) constructor -> struct(a, b)  (\brow\( cannot collide with
    # ROWS BETWEEN — the paren is required)
    s = re.sub(r"\brow\s*\(", "struct(", s, flags=re.I)

    # ARRAY[...] literal -> array(...) — FIRST among the structural
    # rules, so later top-level-comma scans see only parentheses
    while True:
        m = re.search(r"\bARRAY\s*\[", s, re.I)
        if not m:
            break
        open_pos = s.index("[", m.start())
        depth = 0
        close_pos = -1
        for i in range(open_pos, len(s)):
            depth += s[i] == "["
            depth -= s[i] == "]"
            if depth == 0:
                close_pos = i
                break
        if close_pos < 0:
            raise InvalidArgument("unbalanced ARRAY[ literal")
        s = s[: m.start()] + "array(" + s[open_pos + 1 : close_pos] + ")" + s[close_pos + 1 :]

    # from_unixtime(x) -> timestamp_seconds(x): Spark's same-named
    # function returns a formatted STRING, Trino's a timestamp — a
    # silent type change downstream.  from_unixtime(x, zone) ->
    # from_utc_timestamp(timestamp_seconds(x), zone): the same instant
    # rendered at that zone's wall clock, which is what every field
    # extraction (hour/date/...) downstream observes in Trino; Spark
    # has no timestamptz, so the zone is baked into the naive value.
    # The 3-arg (unixtime, hours, minutes) offset variant stays refused.
    while True:
        m = re.search(r"\bfrom_unixtime\s*\(", s, re.I)
        if not m:
            break
        open_pos = s.index("(", m.start())
        close_pos = _find_close(s, open_pos)
        inner = s[open_pos + 1 : close_pos]
        depth = 0
        commas = []
        for i, c in enumerate(inner):
            depth += c == "("
            depth -= c == ")"
            if c == "," and depth == 0:
                commas.append(i)
        if len(commas) >= 2:
            raise InvalidArgument(
                "from_unixtime(unixtime, hours, minutes) has no mechanical "
                "Spark equivalent; rewrite the offset as a zone string and "
                "use from_unixtime(unixtime, zone)"
            )
        if commas:
            ts = inner[: commas[0]].strip()
            zone = inner[commas[0] + 1 :].strip()
            repl = f"from_utc_timestamp(timestamp_seconds({ts}), {zone})"
        else:
            repl = f"timestamp_seconds({inner})"
        s = s[: m.start()] + repl + s[close_pos + 1 :]

    # split(s, d[, n]): Trino delimiters are LITERAL, Spark's are Java
    # regex — split(s, '.') silently explodes per character.  \Q...\E
    # quoting preserves literal semantics for constant AND dynamic
    # delimiters.  (split_part already matches: literal in both.)
    while True:
        m = re.search(r"\bsplit\s*\(", s, re.I)
        if not m:
            break
        open_pos = s.index("(", m.start())
        close_pos = _find_close(s, open_pos)
        inner = s[open_pos + 1 : close_pos]
        depth = 0
        splits = []
        for i, c in enumerate(inner):
            depth += c == "("
            depth -= c == ")"
            if c == "," and depth == 0:
                splits.append(i)
        if not splits:
            raise InvalidArgument("split() needs (string, delimiter[, limit])")
        a = inner[: splits[0]].strip()
        if len(splits) > 1:
            d = inner[splits[0] + 1 : splits[1]].strip()
            tail = ", " + inner[splits[1] + 1 :].strip()
        else:
            d, tail = inner[splits[0] + 1 :].strip(), ""
        q_open = f"\x00{len(lits)}\x00"
        lits.append("'\\\\Q'")
        q_close = f"\x00{len(lits)}\x00"
        lits.append("'\\\\E'")
        s = (
            s[: m.start()]
            + f"__splitq__({a}, concat({q_open}, {d}, {q_close}){tail})"
            + s[close_pos + 1 :]
        )
    s = s.replace("__splitq__(", "split(")

    # date_parse(s, '%Y-%m-%d') -> to_timestamp(s, 'yyyy-MM-dd'), and
    # date_format(ts, '%Y...') -> date_format(ts, java pattern): Trino's
    # date_format is the MySQL-token one — passing the format through
    # unmapped would make Spark's date_format answer something different
    for fn_in, fn_out in (("date_parse", "to_timestamp"), ("date_format", "date_format")):
        pos = 0
        while True:
            m = re.compile(rf"\b{fn_in}\s*\(", re.I).search(s, pos)
            if not m:
                break
            open_pos = s.index("(", m.start())
            close_pos = _find_close(s, open_pos)
            inner = s[open_pos + 1 : close_pos]
            fm = re.search(r",\s*\x00(\d+)\x00\s*$", inner)
            if not fm:
                if fn_in == "date_format":
                    pos = open_pos + 1  # non-literal format: leave untouched
                    continue
                raise InvalidArgument(
                    "date_parse needs a string-literal format as its 2nd argument"
                )
            fmt = lits[int(fm.group(1))][1:-1]
            if fn_in == "date_format" and "%" not in fmt:
                pos = open_pos + 1  # already a Java/Spark pattern
                continue
            lit = f"\x00{len(lits)}\x00"
            lits.append("'" + _mysql_to_java_format(fmt) + "'")
            s = (
                s[: m.start()]
                + f"__fmtq_{fn_out}({inner[: fm.start()]}, {lit})"
                + s[close_pos + 1 :]
            )
            pos = m.start()
    s = s.replace("__fmtq_to_timestamp(", "to_timestamp(").replace(
        "__fmtq_date_format(", "date_format("
    )

    # ARRAY[...] literal -> array(...)
    while True:
        m = re.search(r"\bARRAY\s*\[", s, re.I)
        if not m:
            break
        open_pos = s.index("[", m.start())
        depth = 0
        close_pos = -1
        for i in range(open_pos, len(s)):
            depth += s[i] == "["
            depth -= s[i] == "]"
            if depth == 0:
                close_pos = i
                break
        if close_pos < 0:
            raise InvalidArgument("unbalanced ARRAY[ literal")
        s = s[: m.start()] + "array(" + s[open_pos + 1 : close_pos] + ")" + s[close_pos + 1 :]

    # bare cast types Spark spells differently
    s = re.sub(r"\bAS\s+VARCHAR\s*([,)])", r"AS STRING\1", s, flags=re.I)
    s = re.sub(r"\bAS\s+VARBINARY\s*([,)])", r"AS BINARY\1", s, flags=re.I)
    s = re.sub(r"\bAS\s+REAL\s*([,)])", r"AS FLOAT\1", s, flags=re.I)

    # sampling / fetch clauses
    s = re.sub(
        r"\bTABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(\s*([0-9.]+)\s*\)",
        r"TABLESAMPLE (\1 PERCENT)",
        s,
        flags=re.I,
    )
    s = re.sub(r"\bFETCH\s+FIRST\s+(\d+)\s+ROWS?\s+ONLY\b", r"LIMIT \1", s, flags=re.I)

    s = _rewrite_try_cast(s)
    s = _rewrite_unnest(s)
    s = _rewrite_subscripts(s)
    return _unshield(s, lits)


_BASE_CHARS = "_.$`\x00"


def _rewrite_subscripts(s: str) -> str:
    """Trino subscript ``a[i]`` is 1-BASED; Spark's ``[]`` is 0-based,
    so a pass-through answers off by one.  ``element_at(a, i)`` is
    1-based in BOTH dialects (and has matching map semantics), so every
    remaining subscript — ARRAY[...] literals were rewritten earlier —
    becomes ``element_at(base, idx)``.  Chained ``a[1][2]`` and
    call-result bases ``split(x, ',')[1]`` resolve by scanning back over
    the base expression."""
    while True:
        b = s.find("[")
        if b < 0:
            return s
        depth = 0
        close = -1
        for i in range(b, len(s)):
            if s[i] == "[":
                depth += 1
            elif s[i] == "]":
                depth -= 1
                if depth == 0:
                    close = i
                    break
        if close < 0:
            raise InvalidArgument("unbalanced subscript '[' in SQL")
        idx = s[b + 1 : close].strip()
        p = b - 1
        while p >= 0 and s[p].isspace():
            p -= 1
        if p >= 0 and s[p] == ")":
            depth2 = 0
            q = p
            while q >= 0:
                if s[q] == ")":
                    depth2 += 1
                elif s[q] == "(":
                    depth2 -= 1
                    if depth2 == 0:
                        break
                q -= 1
            if q < 0:
                raise InvalidArgument("unbalanced parentheses before subscript")
            r = q - 1
            while r >= 0 and (s[r].isalnum() or s[r] in _BASE_CHARS):
                r -= 1
            start = r + 1
        elif p >= 0 and (s[p].isalnum() or s[p] in _BASE_CHARS):
            r = p
            while r >= 0 and (s[r].isalnum() or s[r] in _BASE_CHARS):
                r -= 1
            start = r + 1
        else:
            raise InvalidArgument(
                "cannot determine the base expression of subscript "
                f"...{s[max(0, b - 20) : b + 1]!r}; use element_at(a, i)"
            )
        base = s[start:b].strip()
        s = s[:start] + f"element_at({base}, {idx})" + s[close + 1 :]
