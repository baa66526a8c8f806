"""connected_components / dedup_clusters semantics."""

from __future__ import annotations

import pytest

from aws_sdk_pandas_spark.operators.graph import connected_components, dedup_clusters



def _cdf(spark, data, schema=None):
    """createDataFrame over ONE slice: a tiny local frame otherwise spreads
    over defaultParallelism Python-RDD slices and every fixpoint action that
    references it pays a Python-worker round trip per slice (measured
    ~150 ms x 32 through single-task consumers).  Same rows, same order."""
    return spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)


def test_chain_and_separate_components(spark):
    # chain 1-2-3-4 (diameter 3, needs multi-round propagation) + pair 10-11
    pairs = _cdf(spark, 
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_representatives(spark):
    pairs = _cdf(spark, [(5, 7), (7, 6)], "id_a bigint, id_b bigint")
    rows = dedup_clusters(pairs).collect()
    reps = {r.id for r in rows if r.is_representative}
    assert reps == {5}
    assert {r.cluster_id for r in rows} == {5}


def test_dedup_keep_best(spark):
    """Clusters keep exactly the best-scoring member; unpaired rows
    survive untouched."""
    from aws_sdk_pandas_spark.operators.graph import dedup_keep_best
    from pyspark.sql import functions as F

    docs = _cdf(spark, 
        [(1, 10), (2, 30), (3, 20), (4, 99), (5, 7)], "doc_id bigint, score bigint"
    )
    # {1,2,3} one cluster (2 wins on score), {4} and {5} unpaired
    pairs = _cdf(spark, [(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    kept = sorted(r.doc_id for r in dedup_keep_best(docs, pairs, score_col="score").collect())
    assert kept == [2, 4, 5]
    # no score: minimum id wins
    kept_min = sorted(r.doc_id for r in dedup_keep_best(docs, pairs).collect())
    assert kept_min == [1, 4, 5]


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from aws_sdk_pandas_spark.connectors.neptune import pagerank

    # graph with a dangling node (d) and a hub (a)
    pairs = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "d"), ("e", "a")]
    edges = _cdf(spark, 
        [(f"e{i}", "link", s, t) for i, (s, t) in enumerate(pairs)],
        "`~id` string, `~label` string, `~from` string, `~to` string",
    )
    got = {r["~id"]: r["rank"] for r in pagerank(edges, max_iter=25, tol=1e-9).collect()}

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    outd = {}
    for s, t in pairs:
        outd[s] = outd.get(s, 0) + 1
    for s, t in pairs:
        M[idx[t], idx[s]] = 1.0 / outd[s]
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(25):
        dangling_mass = sum(r[idx[v]] for v in nodes if v not in outd)
        r = (1 - d) / n + d * (M @ r + dangling_mass / n)
    assert abs(sum(got.values()) - 1.0) < 1e-6  # ranks are a distribution
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-6, v  # same 25 rounds both sides
    # the hub receiving 3 in-links outranks everything
    assert got["a"] == max(got.values())


def _edge_frame(spark, pairs):
    from pyspark.sql import functions as F

    return (
        _cdf(spark, pairs, "f string, t string")
        .select(
            F.concat_ws("-", "f", "t").alias("~id"),
            F.lit("e").alias("~label"),
            F.col("f").alias("~from"),
            F.col("t").alias("~to"),
        )
    )


def test_triangle_count_known_graph(spark):
    """K4 (every vertex in C(3,2)=3 triangles) + a pendant vertex with 0;
    duplicate/reversed/self-loop edges collapse before counting."""
    from aws_sdk_pandas_spark.connectors.neptune import triangle_count

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    noise = [("b", "a"), ("a", "a"), ("a", "b"), ("d", "e")]  # dup, loop, reverse, pendant
    got = {r["~id"]: r.triangles for r in triangle_count(_edge_frame(spark, k4 + noise)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_count_matches_brute_force(spark):
    """Degree-oriented counting equals the itertools definition on a
    pseudo-random graph (deterministic seed)."""
    import itertools
    import random

    from aws_sdk_pandas_spark.connectors.neptune import triangle_count

    rng = random.Random(7)
    verts = [f"v{i}" for i in range(30)]
    edges = sorted(
        {tuple(sorted((rng.choice(verts), rng.choice(verts)))) for _ in range(120)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    eset = set(edges)
    expect = {v: 0 for v in {x for e in edges for x in e}}
    for x, y, z in itertools.combinations(sorted(expect), 3):
        if ((x, y) in eset) and ((y, z) in eset) and ((x, z) in eset):
            expect[x] += 1
            expect[y] += 1
            expect[z] += 1
    got = {r["~id"]: r.triangles for r in triangle_count(_edge_frame(spark, edges)).collect()}
    assert got == expect


def test_k_hop_neighbors_min_hop_and_direction(spark):
    from aws_sdk_pandas_spark.connectors.neptune import k_hop_neighbors

    # a -> b -> c -> d, plus shortcut a -> c: c is 1 hop via the shortcut
    edges = _edge_frame(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    got = {r["~id"]: r.hops for r in k_hop_neighbors(edges, ["a"], k=2, direction="out").collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # undirected from d reaches everything within 3
    both = {r["~id"]: r.hops for r in k_hop_neighbors(edges, ["d"], k=3, direction="both").collect()}
    assert both == {"d": 0, "c": 1, "a": 2, "b": 2}
    # in-direction from b: only a
    inc = {r["~id"]: r.hops for r in k_hop_neighbors(edges, ["b"], k=2, direction="in").collect()}
    assert inc == {"b": 0, "a": 1}


def test_label_propagation_splits_cliques(spark):
    """Two 5-cliques joined by one bridge edge: LPA finds two
    communities where connected_components finds one; deterministic
    across repartitionings."""
    import itertools

    from aws_sdk_pandas_spark.connectors.neptune import label_propagation

    a = [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)]
    edges = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [("a0", "b0")]
    )
    ef = _edge_frame(spark, edges)
    got = {r["~id"]: r.community for r in label_propagation(ef).collect()}
    comm_a = {got[v] for v in a}
    comm_b = {got[v] for v in b}
    assert len(comm_a) == 1 and len(comm_b) == 1
    assert comm_a != comm_b
    got2 = {
        r["~id"]: r.community
        for r in label_propagation(ef.repartition(7)).collect()
    }
    assert got2 == got


# ---------------------------------------------------------------------------
# Gremlin-subset compiler (connectors/gremlin.py + neptune.execute_gremlin)
# over the classic TinkerPop "modern" toy graph.
# ---------------------------------------------------------------------------


@pytest.fixture()
def modern(spark):
    vertices = _cdf(spark, 
        [
            ("marko", "person", "marko", 29, None),
            ("vadas", "person", "vadas", 27, None),
            ("josh", "person", "josh", 32, None),
            ("peter", "person", "peter", 35, None),
            ("lop", "software", "lop", None, "java"),
            ("ripple", "software", "ripple", None, "java"),
        ],
        "`~id` string, `~label` string, name string, age int, lang string",
    )
    edges = _cdf(spark, 
        [
            ("e1", "knows", "marko", "vadas", 0.5),
            ("e2", "knows", "marko", "josh", 1.0),
            ("e3", "created", "marko", "lop", 0.4),
            ("e4", "created", "josh", "ripple", 1.0),
            ("e5", "created", "josh", "lop", 0.4),
            ("e6", "created", "peter", "lop", 0.2),
        ],
        "`~id` string, `~label` string, `~from` string, `~to` string, weight double",
    )
    return vertices, edges


def _g(modern, q):
    from aws_sdk_pandas_spark.connectors.neptune import execute_gremlin

    v, e = modern
    return execute_gremlin({"root": ""}, q, vertices=v, edges=e)


def test_gremlin_counts_and_labels(modern):
    assert _g(modern, "g.V().count()").first()[0] == 6
    assert _g(modern, "g.E().count()").first()[0] == 6
    assert _g(modern, "g.V().hasLabel('person').count()").first()[0] == 4
    assert _g(modern, "g.V().hasLabel('person', 'software').count()").first()[0] == 6


def test_gremlin_has_predicates(modern):
    got = {r[0] for r in _g(modern, "g.V().has('person','age',gt(30)).values('name')").collect()}
    assert got == {"josh", "peter"}
    got = {r[0] for r in _g(modern, "g.V().has('age', within(27, 29)).values('name')").collect()}
    assert got == {"marko", "vadas"}
    assert _g(modern, "g.V().has('lang').count()").first()[0] == 2


def test_gremlin_out_in_both(modern):
    got = {r["name"] for r in _g(modern, "g.V('marko').out('knows')").collect()}
    assert got == {"vadas", "josh"}
    # bag semantics: marko reaches 3 vertices via any out edge
    assert _g(modern, "g.V('marko').out().count()").first()[0] == 3
    got = [r[0] for r in _g(modern, "g.V('lop').in('created').values('age').order()").collect()]
    assert got == [29, 32, 35]
    assert _g(modern, "g.V().hasLabel('person').both('knows').count()").first()[0] == 4


def test_gremlin_group_count(modern):
    rows = _g(
        modern, "g.V().hasLabel('person').out('created').groupCount().by('~id')"
    ).collect()
    assert {(r[0], r["count"]) for r in rows} == {("lop", 3), ("ripple", 1)}


def test_gremlin_edge_steps(modern):
    q = "g.V().hasLabel('person').outE('created').has('weight', gte(0.4)).inV().dedup().values('name').order()"
    assert [r[0] for r in _g(modern, q).collect()] == ["lop", "ripple"]
    got = [r[0] for r in _g(modern, "g.E().hasLabel('knows').values('weight').order()").collect()]
    assert got == [0.5, 1.0]
    # outV from filtered edges
    q2 = "g.V().hasLabel('software').inE('created').has('weight', lt(0.4)).outV().values('name')"
    assert [r[0] for r in _g(modern, q2).collect()] == ["peter"]


def test_gremlin_dedup_order_limit(modern):
    assert _g(modern, "g.V().in('created').dedup().count()").first()[0] == 3
    got = {r["name"] for r in _g(
        modern, "g.V().hasLabel('person').order().by('age','desc').limit(2)"
    ).collect()}
    assert got == {"peter", "josh"}
    assert _g(modern, "g.V().hasLabel('person').id().order().limit(1)").first()[0] == "josh"
    assert _g(modern, "g.V('lop').label()").first()[0] == "software"


def test_gremlin_start_from_ids_and_E(modern):
    assert _g(modern, "g.V('marko', 'vadas').count()").first()[0] == 2
    assert _g(modern, "g.E('e1').values('weight')").first()[0] == 0.5
    assert _g(modern, "g.V().hasId('lop').in('created').count()").first()[0] == 3


def test_gremlin_errors(modern):
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    with pytest.raises(InvalidArgument, match="unsupported gremlin step"):
        _g(modern, "g.V().shuffle()")
    with pytest.raises(InvalidArgument, match="must start with"):
        _g(modern, "V().count()")
    with pytest.raises(InvalidArgument, match="unterminated string"):
        _g(modern, "g.V().hasLabel('person")
    with pytest.raises(InvalidArgument, match="requires an edge stream"):
        _g(modern, "g.V().inV()")
    with pytest.raises(InvalidArgument, match="requires a vertex stream"):
        _g(modern, "g.E().out()")


def test_gremlin_roundtrip_through_graph_root(spark, modern, tmp_path):
    """execute_gremlin via the connect-handle path: persist with
    to_property_graph, read frames back implicitly."""
    from aws_sdk_pandas_spark.connectors.neptune import connect, execute_gremlin, to_property_graph

    v, e = modern
    to_property_graph(v, e, str(tmp_path / "g"))
    client = connect(str(tmp_path / "g"))
    got = execute_gremlin(
        client, "g.V().hasLabel('person').out('created').groupCount().by('~id')", spark=spark
    )
    assert {(r[0], r["count"]) for r in got.collect()} == {("lop", 3), ("ripple", 1)}


# ---------------------------------------------------------------------------
# openCypher-subset compiler (connectors/opencypher.py +
# neptune.execute_opencypher) over the same modern graph.
# ---------------------------------------------------------------------------


def _cy(modern, q):
    from aws_sdk_pandas_spark.connectors.neptune import execute_opencypher

    v, e = modern
    return execute_opencypher({"root": ""}, q, vertices=v, edges=e)


def test_cypher_single_node_match(modern):
    got = _cy(modern, "MATCH (p:person) WHERE p.age > 30 RETURN p.name AS name ORDER BY name")
    assert [r.name for r in got.collect()] == ["josh", "peter"]
    # bare variable projects the vertex id
    got2 = _cy(modern, "MATCH (s:software) RETURN s ORDER BY s")
    assert [r[0] for r in got2.collect()] == ["lop", "ripple"]


def test_cypher_directed_hop(modern):
    q = "MATCH (a:person)-[:knows]->(b) RETURN a.name AS src, b.name AS dst ORDER BY dst"
    assert [(r.src, r.dst) for r in _cy(modern, q).collect()] == [
        ("marko", "josh"), ("marko", "vadas"),
    ]
    # reversed arrow binds the other way
    q2 = "MATCH (a)<-[:created]-(b:person) WHERE a.name = 'ripple' RETURN b.name AS who"
    assert [r.who for r in _cy(modern, q2).collect()] == ["josh"]


def test_cypher_inline_props_and_multi_hop(modern):
    q = ("MATCH (a:person {name: 'marko'})-[:knows]->(b)-[:created]->(c) "
         "RETURN b.name AS who, c.name AS what ORDER BY what")
    assert [(r.who, r.what) for r in _cy(modern, q).collect()] == [
        ("josh", "lop"), ("josh", "ripple"),
    ]


def test_cypher_undirected(modern):
    q = "MATCH (a:person {name: 'marko'})-[:knows]-(b) RETURN b.name AS n ORDER BY n"
    assert [r.n for r in _cy(modern, q).collect()] == ["josh", "vadas"]
    # vadas only RECEIVES a knows edge; undirected still finds marko
    q2 = "MATCH (a:person {name: 'vadas'})-[:knows]-(b) RETURN b.name AS n"
    assert [r.n for r in _cy(modern, q2).collect()] == ["marko"]


def test_cypher_implicit_aggregation(modern):
    q = ("MATCH (p:person)-[:created]->(s) "
         "RETURN s.name AS software, count(*) AS n, min(p.age) AS youngest "
         "ORDER BY software")
    rows = [(r.software, r.n, r.youngest) for r in _cy(modern, q).collect()]
    assert rows == [("lop", 3, 29), ("ripple", 1, 32)]
    q2 = "MATCH (p:person) RETURN count(*) AS n, avg(p.age) AS mean_age"
    r = _cy(modern, q2).first()
    assert r.n == 4 and r.mean_age == pytest.approx((29 + 27 + 32 + 35) / 4)


def test_cypher_edge_property_and_distinct(modern):
    q = ("MATCH (a:person)-[r:created]->(s) WHERE r.weight >= 0.4 "
         "RETURN DISTINCT s.name AS n ORDER BY n")
    assert [r.n for r in _cy(modern, q).collect()] == ["lop", "ripple"]
    q2 = "MATCH (a:person)-[r:created]->(s) RETURN count(DISTINCT s) AS n"
    assert _cy(modern, q2).first().n == 2


def test_cypher_skip_limit_and_string_shield(modern):
    q = "MATCH (p:person) RETURN p.name AS name ORDER BY p.age DESC SKIP 1 LIMIT 2"
    assert [r.name for r in _cy(modern, q).collect()] == ["josh", "marko"]
    # quoted literal spelling a variable name must not be rewritten
    q2 = "MATCH (p:person)-[:knows]->(b) WHERE b.name = 'vadas' RETURN p.name AS n"
    assert [r.n for r in _cy(modern, q2).collect()] == ["marko"]


def test_cypher_errors(modern):
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    with pytest.raises(InvalidArgument, match="unsupported openCypher"):
        _cy(modern, "CREATE (n:thing) RETURN n")
    with pytest.raises(InvalidArgument, match="both <- and ->"):
        _cy(modern, "MATCH (a)<-[:x]->(b) RETURN a")


def test_cypher_cycle_patterns(modern):
    """A repeated node variable within one chain closes a cycle —
    compiled as a private alias + id-equality back to the first
    binding."""
    # triangle: a knows b, b created c, a created the same c
    rows = _cy(
        modern,
        "MATCH (a:person)-[:knows]->(b:person)-[:created]->(c)<-[:created]-(a) "
        "RETURN a.name AS a, b.name AS b, c.name AS c",
    ).collect()
    assert [(r.a, r.b, r.c) for r in rows] == [("marko", "josh", "lop")]
    # self-loop: no vertex knows itself in the modern graph
    assert _cy(modern, "MATCH (a)-[:knows]->(a) RETURN a").count() == 0
    # a label on the re-occurrence constrains the SAME binding: a person
    # cannot equal a software vertex, so the cycle is empty
    assert (
        _cy(
            modern,
            "MATCH (a:person)-[:knows]->(b)-[:created]->(a:software) RETURN a",
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# SPARQL-subset compiler (connectors/sparql.py + neptune.execute_sparql)
# over a FOAF-ish triple rendering of the "modern" graph.
# ---------------------------------------------------------------------------

_FOAF = "http://xmlns.com/foaf/0.1/"
_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture()
def foaf(spark):
    rows = []
    people = {"marko": 29, "vadas": 27, "josh": 32, "peter": 35}
    for name, age in people.items():
        rows += [
            (name, _TYPE, f"{_FOAF}Person"),
            (name, f"{_FOAF}name", name),
            (name, f"{_FOAF}age", str(age)),
        ]
    for sw in ("lop", "ripple"):
        rows += [(sw, _TYPE, f"{_FOAF}Software"), (sw, f"{_FOAF}lang", "java")]
    rows += [
        ("marko", f"{_FOAF}knows", "vadas"),
        ("marko", f"{_FOAF}knows", "josh"),
        ("marko", f"{_FOAF}created", "lop"),
        ("josh", f"{_FOAF}created", "ripple"),
        ("josh", f"{_FOAF}created", "lop"),
        ("peter", f"{_FOAF}created", "lop"),
    ]
    return _cdf(spark, rows, "s string, p string, o string")


def _sp(foaf, q):
    from aws_sdk_pandas_spark.connectors.neptune import execute_sparql

    return execute_sparql({"root": ""}, q, triples=foaf)


_P = f"PREFIX foaf: <{_FOAF}>\n"


def test_sparql_single_pattern_and_a_keyword(foaf):
    got = _sp(foaf, _P + "SELECT ?s WHERE { ?s a foaf:Person } ORDER BY ?s")
    assert [r.s for r in got.collect()] == ["josh", "marko", "peter", "vadas"]


def test_sparql_a_prefix_is_a_pname_not_the_type_keyword(foaf):
    # round-2 advice: with PREFIX a: declared, 'a:Person' must parse as ONE
    # prefixed name, not rdf:type + stray ':Person'
    q = (
        f"PREFIX a: <{_FOAF}>\n"
        "SELECT ?s WHERE { ?s a a:Person } ORDER BY ?s"
    )
    got = _sp(foaf, q)
    assert [r.s for r in got.collect()] == ["josh", "marko", "peter", "vadas"]


def test_sparql_bgp_join_and_po_list(foaf):
    q = _P + (
        "SELECT ?who ?friend_name WHERE { "
        '  ?m foaf:name "marko" ; foaf:knows ?f . '
        "  ?f foaf:name ?friend_name . ?m foaf:name ?who . "
        "} ORDER BY ?friend_name"
    )
    rows = [(r.who, r.friend_name) for r in _sp(foaf, q).collect()]
    assert rows == [("marko", "josh"), ("marko", "vadas")]


def test_sparql_filter_xsd_cast_and_regex(foaf):
    q = _P + (
        "SELECT ?n WHERE { ?p a foaf:Person . ?p foaf:age ?a . ?p foaf:name ?n . "
        "FILTER(xsd:integer(?a) > 28 && !(?n = 'peter')) } ORDER BY ?n"
    )
    assert [r.n for r in _sp(foaf, q).collect()] == ["josh", "marko"]
    q2 = _P + (
        "SELECT ?n WHERE { ?p foaf:name ?n . FILTER(REGEX(?n, '^m|^v')) } ORDER BY ?n"
    )
    assert [r.n for r in _sp(foaf, q2).collect()] == ["marko", "vadas"]


def test_sparql_optional_and_bound(foaf):
    q = _P + (
        "SELECT ?n ?sw WHERE { ?p a foaf:Person . ?p foaf:name ?n . "
        "OPTIONAL { ?p foaf:created ?sw } } ORDER BY ?n ?sw"
    )
    rows = [(r.n, r.sw) for r in _sp(foaf, q).collect()]
    assert ("vadas", None) in rows and ("josh", "lop") in rows and ("josh", "ripple") in rows
    q2 = q.replace("} ORDER", "FILTER(!BOUND(?sw)) } ORDER")
    assert [r.n for r in _sp(foaf, q2).collect()] == ["vadas"]


def test_sparql_aggregates_group_order(foaf):
    q = _P + (
        "SELECT ?sw (COUNT(?p) AS ?n_devs) (MIN(?a) AS ?youngest) WHERE { "
        "  ?p foaf:created ?sw . ?p foaf:age ?a . "
        "} GROUP BY ?sw ORDER BY DESC(?n_devs)"
    )
    rows = [(r.sw, r.n_devs, r.youngest) for r in _sp(foaf, q).collect()]
    assert rows == [("lop", 3, "29"), ("ripple", 1, "32")]
    q2 = _P + "SELECT (COUNT(DISTINCT ?sw) AS ?n) WHERE { ?p foaf:created ?sw }"
    assert _sp(foaf, q2).first().n == 2


def test_sparql_distinct_limit_offset(foaf):
    q = _P + (
        "SELECT DISTINCT ?sw WHERE { ?p foaf:created ?sw } ORDER BY ?sw LIMIT 1 OFFSET 1"
    )
    assert [r.sw for r in _sp(foaf, q).collect()] == ["ripple"]
    # SPARQL allows either modifier order
    q2 = _P + (
        "SELECT DISTINCT ?sw WHERE { ?p foaf:created ?sw } ORDER BY ?sw OFFSET 1 LIMIT 1"
    )
    assert [r.sw for r in _sp(foaf, q2).collect()] == ["ripple"]


def test_sparql_star_and_iri_terms(foaf):
    q = f'SELECT * WHERE {{ ?s <{_FOAF}knows> ?o }} ORDER BY ?o'
    rows = [(r.s, r.o) for r in _sp(foaf, q).collect()]
    assert rows == [("marko", "josh"), ("marko", "vadas")]


def test_sparql_union(foaf):
    q = _P + (
        "SELECT ?n WHERE { "
        '  { ?m foaf:name "marko" . ?m foaf:knows ?p . ?p foaf:name ?n } '
        "  UNION "
        '  { ?p foaf:created "lop" . ?p foaf:name ?n . FILTER(?n != \'marko\') } '
        "} ORDER BY ?n"
    )
    assert [r.n for r in _sp(foaf, q).collect()] == ["josh", "josh", "peter", "vadas"]
    # a union block joins back to outer patterns on shared vars
    q2 = _P + (
        "SELECT ?n ?a WHERE { "
        "  { ?p foaf:knows ?q } UNION { ?q foaf:knows ?p } "
        "  . ?p foaf:name ?n . ?p foaf:age ?a "
        "} ORDER BY ?n ?a"
    )
    rows = [(r.n, r.a) for r in _sp(foaf, q2).collect()]
    assert rows == [("josh", "32"), ("marko", "29"), ("marko", "29"), ("vadas", "27")]


def test_sparql_exists_minus(foaf):
    # people who created something
    q = _P + (
        "SELECT ?n WHERE { ?p a foaf:Person . ?p foaf:name ?n . "
        "FILTER EXISTS { ?p foaf:created ?s } } ORDER BY ?n"
    )
    assert [r.n for r in _sp(foaf, q).collect()] == ["josh", "marko", "peter"]
    # people who created nothing (NOT EXISTS == MINUS here)
    q2 = q.replace("FILTER EXISTS", "FILTER NOT EXISTS")
    assert [r.n for r in _sp(foaf, q2).collect()] == ["vadas"]
    q3 = _P + (
        "SELECT ?n WHERE { ?p a foaf:Person . ?p foaf:name ?n . "
        "MINUS { ?p foaf:created ?s } } ORDER BY ?n"
    )
    assert [r.n for r in _sp(foaf, q3).collect()] == ["vadas"]
    # semi-join keeps multiplicities of the OUTER side only
    q4 = _P + (
        "SELECT ?n WHERE { ?m foaf:knows ?p . ?p foaf:name ?n . "
        "FILTER EXISTS { ?p foaf:created ?s } } ORDER BY ?n"
    )
    # marko knows josh (2 creations, but ONE outer row survives)
    assert [r.n for r in _sp(foaf, q4).collect()] == ["josh"]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="shares no variable"):
        _sp(foaf, _P + "SELECT ?n WHERE { ?p foaf:name ?n . MINUS { ?x foaf:created ?s } }")


def test_sparql_bind_and_values(foaf):
    q = _P + (
        "SELECT ?n ?isold WHERE { ?p foaf:age ?a . ?p foaf:name ?n . "
        "BIND(xsd:integer(?a) >= 30 AS ?isold) "
        "VALUES ?n { \"marko\" \"josh\" \"nobody\" } } ORDER BY ?n"
    )
    rows = [(r.n, r.isold) for r in _sp(foaf, q).collect()]
    assert rows == [("josh", True), ("marko", False)]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="already bound"):
        _sp(foaf, _P + "SELECT ?n WHERE { ?p foaf:name ?n . BIND(1 AS ?n) }")
    with pytest.raises(InvalidArgument, match="BIND needs"):
        _sp(foaf, _P + "SELECT ?x WHERE { ?p foaf:name ?x . BIND(1 + 1) }")
    with pytest.raises(InvalidArgument, match="at least one value"):
        _sp(foaf, _P + "SELECT ?x WHERE { ?p foaf:name ?x . VALUES ?x { } }")
    # multi-variable VALUES is now a supported binding table (see
    # test_sparql_multi_var_values); a malformed tuple still raises
    with pytest.raises(InvalidArgument, match="parenthesized tuples"):
        _sp(foaf, _P + 'SELECT ?x WHERE { ?p foaf:name ?x . VALUES (?x ?y) { "a" "b" } }')


def test_sparql_union_errors(foaf):
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    # a var bound in only some branches is fine while unused (NULL rows)…
    got = _sp(foaf, _P + (
        "SELECT ?x ?z WHERE { { ?x foaf:knows ?y } UNION { ?x foaf:age ?z } "
        '  FILTER(?x = "marko") } ORDER BY ?z'
    )).collect()
    assert [(r.x, r.z) for r in got] == [("marko", None), ("marko", None), ("marko", "29")]
    # …and joining it elsewhere is SPARQL's unbound-compatible join,
    # compiled by branch distribution: the knows-branch equi-joins on ?y
    # (vadas + josh), the age-branch leaves ?y unbound so its 4 solutions
    # are compatible with ALL 4 name rows (spec: unbound matches anything)
    from collections import Counter

    got = _sp(foaf, _P + (
        "SELECT ?n WHERE { { ?x foaf:knows ?y } UNION { ?x foaf:age ?z } "
        ". ?y foaf:name ?n }"
    )).collect()
    assert Counter(r.n for r in got) == Counter(
        {"josh": 5, "vadas": 5, "marko": 4, "peter": 4}
    )
    # a partially-bound var reused in OPTIONAL: NULL-mask distribution.
    # Rows where ?y is bound equi-join; rows where ?y is unbound are
    # compatible with EVERY optional solution and take ITS ?y/?n values.
    got = _sp(foaf, _P + (
        "SELECT ?y ?n WHERE { { ?x foaf:knows ?y } UNION { ?x foaf:age ?z } "
        ". ?x foaf:name ?m OPTIONAL { ?y foaf:name ?n } }"
    )).collect()
    assert Counter(r.n for r in got) == Counter(
        {"josh": 5, "vadas": 5, "marko": 4, "peter": 4}
    )
    # the masked var fills from the optional side (name solutions bind
    # y == n), so no row may disagree
    assert all(r.y == r.n for r in got)
    # …but EXISTS/MINUS on a partially-bound var stays refused
    with pytest.raises(InvalidArgument, match="partially bound"):
        _sp(foaf, _P + (
            "SELECT ?m WHERE { { ?x foaf:knows ?y } UNION { ?x foaf:age ?z } "
            ". ?x foaf:name ?m FILTER EXISTS { ?y foaf:name ?n } }"
        ))
    with pytest.raises(InvalidArgument, match="UNION continuation"):
        _sp(foaf, _P + "SELECT ?x WHERE { { ?x foaf:knows ?y } }")


def test_sparql_string_builtins(foaf):
    """STRSTARTS/STRENDS/CONTAINS/STRLEN/UCASE/LCASE/SUBSTR map to the
    identical-semantics Spark functions (SUBSTR 1-based in both)."""
    q = _P + (
        "SELECT ?n WHERE { ?p foaf:name ?n "
        'FILTER(STRSTARTS(?n, "ma") || STRENDS(?n, "sh")) } ORDER BY ?n'
    )
    assert [r.n for r in _sp(foaf, q).collect()] == ["josh", "marko"]
    q2 = _P + (
        "SELECT ?n WHERE { ?p foaf:name ?n "
        'FILTER(CONTAINS(UCASE(?n), "AD") && STRLEN(?n) = 5) }'
    )
    assert [r.n for r in _sp(foaf, q2).collect()] == ["vadas"]
    q3 = _P + (
        "SELECT ?n WHERE { ?p foaf:name ?n "
        'FILTER(SUBSTR(?n, 1, 2) = LCASE("PE")) }'
    )
    assert [r.n for r in _sp(foaf, q3).collect()] == ["peter"]


def test_sparql_optional_on_union_only_base(foaf):
    """A union-only query (no plain BGP) whose partial var feeds an
    OPTIONAL: the seeded base's NULLs must be tracked as unbound, so
    unbound rows extend by EVERY optional solution instead of being
    kept alone by a NULL equi-join."""
    from collections import Counter

    got = _sp(foaf, _P + (
        "SELECT ?x ?y ?n WHERE { { ?x foaf:knows ?y } UNION "
        "{ ?x foaf:age ?z } OPTIONAL { ?y foaf:name ?n } }"
    )).collect()
    assert Counter(r.n for r in got) == Counter(
        {"vadas": 5, "josh": 5, "marko": 4, "peter": 4}
    )
    assert all(r.y == r.n for r in got)


def test_sparql_optional_on_optional_var(foaf):
    """A second OPTIONAL sharing a var the FIRST optional introduced
    (unbound on unmatched rows) also distributes: bound rows equi-join,
    unbound rows are compatible with every block solution."""
    from collections import Counter

    got = _sp(foaf, _P + (
        "SELECT ?x ?y ?a WHERE { ?x foaf:name ?m "
        "OPTIONAL { ?x foaf:knows ?y } OPTIONAL { ?y foaf:age ?a } }"
    )).collect()
    # marko's two knows-rows bind y -> exactly vadas(27)/josh(32);
    # the other three x's have y unbound -> all four age solutions each
    by_x = Counter(r.x for r in got)
    assert by_x == Counter({"marko": 2, "vadas": 4, "josh": 4, "peter": 4})
    marko = sorted((r.y, r.a) for r in got if r.x == "marko")
    assert marko == [("josh", "32"), ("vadas", "27")]
    vadas_ages = sorted(r.a for r in got if r.x == "vadas")
    assert vadas_ages == ["27", "29", "32", "35"]


def test_sparql_ask_and_construct(foaf):
    assert _sp(foaf, _P + 'ASK { ?p foaf:knows "vadas" }').first().ask is True
    assert _sp(foaf, _P + 'ASK WHERE { ?p foaf:knows "nobody" }').first().ask is False
    # all-constant pattern (the classic ASK shape)
    assert _sp(foaf, _P + 'ASK { "marko" foaf:knows "josh" }').first().ask is True
    got = _sp(foaf, _P + (
        'CONSTRUCT { ?p <collaborated> ?s . ?s a <Artifact> } '
        "WHERE { ?p foaf:created ?s }"
    ))
    rows = sorted(tuple(r) for r in got.collect())
    assert ("josh", "collaborated", "ripple") in rows
    assert ("lop", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "Artifact") in rows
    # SET semantics: lop created by 3 people -> ONE type triple for lop
    assert sum(1 for r in rows if r == ("lop", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "Artifact")) == 1
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="not bound"):
        _sp(foaf, "CONSTRUCT { ?q <x> ?s } WHERE { ?p <y> ?s }")


def test_sparql_errors(foaf):
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    with pytest.raises(InvalidArgument, match="undeclared PREFIX"):
        _sp(foaf, "SELECT ?s WHERE { ?s nope:thing ?o }")
    with pytest.raises(InvalidArgument, match="unsupported SPARQL shape"):
        _sp(foaf, "DESCRIBE <marko>")
    # aggregate without GROUP BY: plain vars become implicit group keys
    r = _sp(foaf, _P + "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s foaf:knows ?o }").first()
    assert (r.s, r.n) == ("marko", 2)
    with pytest.raises(InvalidArgument, match="GROUP BY"):
        _sp(
            foaf,
            _P + "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s foaf:knows ?o } GROUP BY ?o",
        )
    with pytest.raises(InvalidArgument, match="at least one triple"):
        _sp(foaf, "SELECT ?s WHERE { }")


def test_sparql_roundtrip_through_graph_root(spark, foaf, tmp_path):
    from aws_sdk_pandas_spark.connectors import neptune

    root = str(tmp_path / "rdf")
    neptune.to_rdf_graph(foaf, root)
    client = neptune.connect(root)
    q = _P + "SELECT (COUNT(*) AS ?n) WHERE { ?s foaf:created ?o }"
    assert neptune.execute_sparql(client, q, spark=spark).first().n == 4


# ---------------------------------------------------------------------------
# SPARQL property test: the compiler's BGP semantics equal a naive
# backtracking evaluator (bag semantics) on random triple sets.
# ---------------------------------------------------------------------------


def _naive_bgp(triples, patterns, var_order):
    sols = [dict()]
    for s, p, o in patterns:
        nxt = []
        for binding in sols:
            for ts, tp, to in triples:
                b2 = dict(binding)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in b2 and b2[v] != val:
                            ok = False
                            break
                        b2[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b2)
        sols = nxt
    return sorted(tuple(b[v] for v in var_order) for b in sols)


def test_sparql_bgp_matches_naive_evaluator(spark):
    """Randomized BGPs over randomized triple bags: the compiled joins
    must reproduce the naive evaluator's solution MULTISET exactly —
    multiplicities included (duplicate triples bind twice)."""
    import random

    from aws_sdk_pandas_spark.connectors.sparql import compile_sparql

    rng = random.Random(20260815)
    nodes = ["x", "y", "z", "w"]
    preds = ["p", "q"]
    for trial in range(12):
        triples = [
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(rng.randint(1, 14))
        ]
        tdf = _cdf(spark, triples, "s string, p string, o string")
        n_pat = rng.randint(1, 3)
        vars_pool = ["?a", "?b", "?c"]
        patterns = []
        for _ in range(n_pat):
            terms = []
            for pos in range(3):
                if rng.random() < 0.55:
                    terms.append(rng.choice(vars_pool))
                else:
                    terms.append(rng.choice(preds if pos == 1 else nodes))
            patterns.append(tuple(terms))
        var_order = sorted(
            {t[1:] for pat in patterns for t in pat if t.startswith("?")}
        )
        if not var_order:
            continue
        q = (
            "SELECT "
            + " ".join(f"?{v}" for v in var_order)
            + " WHERE { "
            + " . ".join(
                " ".join(t if t.startswith("?") else f"<{t}>" for t in pat)
                for pat in patterns
            )
            + " }"
        )
        got = sorted(tuple(r) for r in compile_sparql(q, tdf).collect())
        want = _naive_bgp(triples, patterns, var_order)
        assert got == want, f"trial {trial}: {q!r}\n triples={triples}"


def test_sparql_exists_matches_naive_evaluator(spark):
    """Randomized FILTER [NOT] EXISTS blocks: the left-semi/anti
    compilation equals the naive semantics (keep a binding iff some /
    no block solution agrees on every shared variable), multiplicities
    of the outer side preserved."""
    import random

    from aws_sdk_pandas_spark.connectors.sparql import compile_sparql

    rng = random.Random(99)
    nodes = ["x", "y", "z"]
    preds = ["p", "q"]
    for trial in range(8):
        triples = [
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(rng.randint(2, 12))
        ]
        tdf = _cdf(spark, triples, "s string, p string, o string")
        outer = [("?a", rng.choice(preds), "?b")]
        # block shares ?b; its second position varies, third is existential
        block = [("?b", rng.choice(preds), "?c")]
        negated = trial % 2 == 1
        kw = "FILTER NOT EXISTS" if negated else "FILTER EXISTS"
        q = (
            "SELECT ?a ?b WHERE { ?a <"
            + outer[0][1]
            + "> ?b . "
            + kw
            + " { ?b <"
            + block[0][1]
            + "> ?c } } "
        )
        got = sorted(tuple(r) for r in compile_sparql(q, tdf).collect())
        outer_sols = _naive_bgp(triples, outer, ["a", "b"])
        block_b = {b for (b, _c) in _naive_bgp(triples, block, ["b", "c"])}
        want = sorted(
            (a, b)
            for a, b in outer_sols
            if (b in block_b) != negated
        )
        assert got == want, f"trial {trial} {q!r} triples={triples}"


def _naive_sols(triples, patterns):
    """Naive backtracking BGP evaluation -> list of binding dicts (bag)."""
    sols = [dict()]
    for s, p, o in patterns:
        nxt = []
        for binding in sols:
            for ts, tp, to in triples:
                b2 = dict(binding)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in b2 and b2[v] != val:
                            ok = False
                            break
                        b2[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b2)
        sols = nxt
    return sols


def _compat_join(left_sols, right_sols):
    """SPARQL's unbound-compatible join: solutions merge iff every var
    bound on BOTH sides agrees; unbound (missing) is compatible."""
    out = []
    for a in left_sols:
        for b in right_sols:
            if all(a[k] == b[k] for k in a.keys() & b.keys()):
                out.append({**a, **b})
    return out


def _compat_leftjoin(left_sols, right_sols):
    """SPARQL LeftJoin: each left solution extends by every compatible
    right solution, or survives alone when none is compatible."""
    out = []
    for a in left_sols:
        ms = [
            {**a, **b}
            for b in right_sols
            if all(a[k] == b[k] for k in a.keys() & b.keys())
        ]
        out.extend(ms if ms else [a])
    return out


def test_sparql_unbound_compatible_join_matches_naive(spark):
    """Randomized partial UNIONs joined against a BGP pattern, and
    VALUES tables with random UNDEF holes: the branch/mask distribution
    must reproduce the naive compatibility-join MULTISET exactly."""
    import random

    from aws_sdk_pandas_spark.connectors.sparql import compile_sparql

    rng = random.Random(20260816)
    nodes = ["x", "y", "z"]
    preds = ["p", "q"]

    def run(q, tdf, var_order, want_sols):
        got = sorted(
            tuple("∅" if v is None else v for v in r)
            for r in compile_sparql(q, tdf).collect()
        )
        want = sorted(
            tuple(b.get(v, "∅") for v in var_order) for b in want_sols
        )
        assert got == want, f"{q!r}"

    for trial in range(8):
        triples = [
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(rng.randint(2, 12))
        ]
        tdf = _cdf(spark, triples, "s string, p string, o string")

        # partial union joined to a BGP: branches bind different vars
        b1 = [("?a", rng.choice(preds), "?b")]
        b2 = [("?a", rng.choice(preds), "?c")]
        base = [("?a", rng.choice(preds), "?d")]
        q = (
            "SELECT ?a ?b ?c ?d WHERE { "
            "{ " + " ".join(t if t.startswith("?") else f"<{t}>" for t in b1[0])
            + " } UNION { "
            + " ".join(t if t.startswith("?") else f"<{t}>" for t in b2[0])
            + " } . "
            + " ".join(t if t.startswith("?") else f"<{t}>" for t in base[0])
            + " }"
        )
        want = _compat_join(
            _naive_sols(triples, base),
            _naive_sols(triples, b1) + _naive_sols(triples, b2),
        )
        run(q, tdf, ["a", "b", "c", "d"], want)

        # VALUES with UNDEF holes joined to a BGP
        n_rows = rng.randint(1, 4)
        vrows = []
        for _ in range(n_rows):
            vrows.append(
                (
                    rng.choice(nodes) if rng.random() < 0.7 else None,
                    rng.choice(nodes) if rng.random() < 0.7 else None,
                )
            )
        q2 = (
            "SELECT ?a ?b WHERE { ?a <" + preds[0] + "> ?b . "
            "VALUES (?a ?b) { "
            + " ".join(
                "(" + " ".join("UNDEF" if x is None else f'"{x}"' for x in row) + ")"
                for row in vrows
            )
            + " } }"
        )
        val_sols = [
            {k: v for k, v in zip(("a", "b"), row) if v is not None}
            for row in vrows
        ]
        want2 = _compat_join(
            _naive_sols(triples, [("?a", preds[0], "?b")]), val_sols
        )
        run(q2, tdf, ["a", "b"], want2)

        # partial union base + OPTIONAL on the partial var: NULL-mask
        # distribution equals the naive LeftJoin over compatibility
        opt_pat = ("?b", rng.choice(preds), "?w")
        q3 = (
            "SELECT ?a ?b ?c ?w WHERE { "
            "{ " + " ".join(t if t.startswith("?") else f"<{t}>" for t in b1[0])
            + " } UNION { "
            + " ".join(t if t.startswith("?") else f"<{t}>" for t in b2[0])
            + " } OPTIONAL { "
            + " ".join(t if t.startswith("?") else f"<{t}>" for t in opt_pat)
            + " } }"
        )
        want3 = _compat_leftjoin(
            _naive_sols(triples, b1) + _naive_sols(triples, b2),
            _naive_sols(triples, [opt_pat]),
        )
        run(q3, tdf, ["a", "b", "c", "w"], want3)


def test_sparql_union_matches_naive_evaluator(spark):
    """Randomized two-branch UNIONs binding the same variables: the
    compiled unionByName equals bag concatenation of the branch
    solutions (SPARQL UNION never deduplicates)."""
    import random

    from aws_sdk_pandas_spark.connectors.sparql import compile_sparql

    rng = random.Random(4242)
    nodes = ["x", "y", "z"]
    preds = ["p", "q", "r"]
    for trial in range(8):
        triples = [
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(rng.randint(2, 12))
        ]
        tdf = _cdf(spark, triples, "s string, p string, o string")
        def rand_branch():
            # both branches bind exactly ?a and ?b
            mid = rng.choice(preds)
            third = rng.choice(["?b", rng.choice(nodes)])
            if third == "?b":
                return [("?a", mid, "?b")]
            return [("?a", mid, third), ("?a", rng.choice(preds), "?b")]
        b1, b2 = rand_branch(), rand_branch()
        def render(b):
            return " . ".join(
                " ".join(t if t.startswith("?") else f"<{t}>" for t in pat)
                for pat in b
            )
        q = (
            "SELECT ?a ?b WHERE { { " + render(b1) + " } UNION { "
            + render(b2) + " } }"
        )
        got = sorted(tuple(r) for r in compile_sparql(q, tdf).collect())
        want = sorted(
            _naive_bgp(triples, b1, ["a", "b"])
            + _naive_bgp(triples, b2, ["a", "b"])
        )
        assert got == want, f"trial {trial}: {q!r} triples={triples}"


def test_gremlin_repeat_times(modern):
    # 2 hops: marko -> (vadas|josh) -> josh's creations via knows/created
    q = "g.V('marko').repeat(out()).times(2).values('name')"
    got = sorted(r[0] for r in _g(modern, q).collect())
    # marko--knows-->vadas (no out), marko--knows-->josh --created--> lop, ripple
    # marko--created-->lop (no out)
    assert got == ["lop", "ripple"]
    # single-hop repeat equals plain out
    q1 = "g.V('marko').repeat(out('knows')).times(1).values('name')"
    assert sorted(r[0] for r in _g(modern, q1).collect()) == ["josh", "vadas"]
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="followed by .times"):
        _g(modern, "g.V().repeat(out()).count()")
    with _pytest.raises(InvalidArgument, match="nested repeat"):
        _g(modern, "g.V().repeat(repeat(out()).times(2)).times(2).count()")


def test_gremlin_fold_unfold(modern):
    q = "g.V().hasLabel('software').values('name').fold()"
    [r] = _g(modern, q).collect()
    assert list(r.folded) == ["lop", "ripple"]
    # element stream folds its ids
    q2 = "g.V().hasLabel('software').fold()"
    assert list(_g(modern, q2).first().folded) == ["lop", "ripple"]
    # the fold/unfold round trip
    q3 = "g.V().hasLabel('software').values('name').fold().unfold()"
    assert sorted(r.value for r in _g(modern, q3).collect()) == ["lop", "ripple"]


def test_gremlin_bothe_otherv(modern):
    """bothE()/otherV(): edges in either orientation, then the far
    endpoint — josh's neighborhood via any edge."""
    q = "g.V().has('name', 'josh').bothE().otherV().values('name')"
    got = sorted(r[0] for r in _g(modern, q).collect())
    assert got == ["lop", "marko", "ripple"]
    # label-filtered bothE and edge-property filter still compose
    q2 = "g.V().has('name', 'josh').bothE('created').has('weight', gt(0.5)).otherV().values('name')"
    assert sorted(r[0] for r in _g(modern, q2).collect()) == ["ripple"]
    # undirected degree via bothE count
    q3 = "g.V().has('name', 'marko').bothE().count()"
    assert _g(modern, q3).first()[0] == 3
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="bothE"):
        _g(modern, "g.V().outE().otherV()")


def test_gremlin_project_and_element_map(modern):
    # project with by-modulators cycled round-robin
    q = "g.V().hasLabel('person').project('n', 'a').by('name').by('age')"
    got = sorted((r.n, r.a) for r in _g(modern, q).collect())
    assert got == [("josh", 32), ("marko", 29), ("peter", 35), ("vadas", 27)]
    # by('id') / by('label') address the element itself
    q2 = "g.V().has('name', 'lop').project('i', 'l').by('id').by('label')"
    assert [(r.i, r.l) for r in _g(modern, q2).collect()] == [("lop", "software")]
    # elementMap: id + label + listed properties
    q3 = "g.V().hasLabel('software').elementMap('name', 'lang')"
    got3 = sorted((r.id, r.label, r.name, r.lang) for r in _g(modern, q3).collect())
    assert got3 == [
        ("lop", "software", "lop", "java"),
        ("ripple", "software", "ripple", "java"),
    ]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="requires .by"):
        _g(modern, "g.V().project('x')")
    with pytest.raises(InvalidArgument, match="unknown propert"):
        _g(modern, "g.V().project('x').by('nope')")
    with pytest.raises(InvalidArgument, match="unknown propert"):
        _g(modern, "g.V().elementMap('nope')")


def test_cypher_variable_length_paths(modern):
    # *1..2 with no label: bag of PATHS — lop reachable directly and via josh
    q = "MATCH (a:person {name: 'marko'})-[*1..2]->(b) RETURN b.name AS n ORDER BY n"
    got = [r.n for r in _cy(modern, q).collect()]
    assert got == ["josh", "lop", "lop", "ripple", "vadas"]
    # labeled var-length: knows-chains only
    q2 = "MATCH (a:person {name: 'marko'})-[:knows*1..2]->(b) RETURN b.name AS n ORDER BY n"
    assert [r.n for r in _cy(modern, q2).collect()] == ["josh", "vadas"]
    # exact length 2
    q3 = "MATCH (a:person {name: 'marko'})-[*2..2]->(b) RETURN b.name AS n ORDER BY n"
    assert [r.n for r in _cy(modern, q3).collect()] == ["lop", "ripple"]
    # undirected var-length from a leaf reaches its creator chain;
    # relationship-uniqueness (trail semantics) forbids walking ripple's
    # single edge out-and-back, so ripple itself must NOT appear
    q4 = "MATCH (s {name: 'ripple'})-[*1..2]-(b) RETURN b.name AS n ORDER BY n"
    got4 = [r.n for r in _cy(modern, q4).collect()]
    assert got4 == ["josh", "lop", "marko"]
    # the exact counterexample from the round-2 advice: *2..2 undirected
    # from ripple is lop+marko on Neptune/openCypher, never ripple
    q5 = "MATCH (s {name: 'ripple'})-[*2..2]-(b) RETURN b.name AS n ORDER BY n"
    assert [r.n for r in _cy(modern, q5).collect()] == ["lop", "marko"]
    # fixed-length edges are pairwise distinct too: vadas has ONE edge, so
    # a 2-hop undirected chain cannot bounce back through it
    q6 = "MATCH (a {name: 'vadas'})--(b)--(c) RETURN c.name AS n ORDER BY n"
    assert [r.n for r in _cy(modern, q6).collect()] == ["josh", "lop"]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="variable-length range"):
        _cy(modern, "MATCH (a)-[*0..2]->(b) RETURN b")


def test_cypher_var_length_edge_variable_binds_list(modern):
    """An edge variable on a var-length edge binds the LIST of traversed
    relationships: size(r) is the path length, RETURN r is the edge-id
    list in traversal order, UNWIND r explodes it — and re-using the
    list variable in another pattern is refused."""
    q = (
        "MATCH (a:person {name: 'marko'})-[r*1..2]->(b) "
        "RETURN b.name AS n, size(r) AS hops ORDER BY n, hops"
    )
    got = [(r.n, r.hops) for r in _cy(modern, q).collect()]
    assert got == [("josh", 1), ("lop", 1), ("lop", 2), ("ripple", 2), ("vadas", 1)]

    # RETURN r: the traversed ~ids, in order (marko-knows->josh-created->ripple)
    q2 = (
        "MATCH (a {name: 'marko'})-[r*2..2]->(b {name: 'ripple'}) "
        "RETURN r AS path_edges"
    )
    assert [list(r.path_edges) for r in _cy(modern, q2).collect()] == [["e2", "e4"]]

    # UNWIND the bound list
    q3 = (
        "MATCH (a {name: 'marko'})-[r*2..2]->(b {name: 'ripple'}) "
        "UNWIND r AS eid RETURN eid ORDER BY eid"
    )
    assert [r.eid for r in _cy(modern, q3).collect()] == ["e2", "e4"]

    # WHERE can filter on the list length
    q4 = (
        "MATCH (a:person {name: 'marko'})-[r*1..2]->(b) "
        "WHERE size(r) = 2 RETURN b.name AS n ORDER BY n"
    )
    assert [r.n for r in _cy(modern, q4).collect()] == ["lop", "ripple"]

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="LIST of relationships"):
        _cy(modern, "MATCH (a)-[r*1..2]->(b) MATCH (c)-[r]->(d) RETURN c")


def test_gremlin_as_select(modern):
    # the classic pattern projection: who created what, by name
    q = (
        "g.V().hasLabel('person').as('p')"
        ".out('created').as('s')"
        ".select('p', 's').by('name').by('name')"
    )
    got = sorted((r.p, r.s) for r in _g(modern, q).collect())
    assert got == [
        ("josh", "lop"), ("josh", "ripple"), ("marko", "lop"), ("peter", "lop"),
    ]
    # without by: step labels project the ~ids
    q2 = "g.V('marko').as('a').out('knows').as('b').select('a', 'b')"
    got2 = sorted((r.a, r.b) for r in _g(modern, q2).collect())
    assert got2 == [("marko", "josh"), ("marko", "vadas")]
    # a single by applies round-robin to every selected label
    q3 = "g.V('marko').as('a').out('knows').as('b').select('a', 'b').by('name')"
    got3 = sorted((r.a, r.b) for r in _g(modern, q3).collect())
    assert got3 == [("marko", "josh"), ("marko", "vadas")]
    # tags survive multi-hop movement and edge steps
    q4 = (
        "g.V().hasLabel('person').as('p').outE('created').as('e')"
        ".inV().has('name', 'lop').select('p', 'e').by('name').by('weight')"
    )
    got4 = sorted((r.p, r.e) for r in _g(modern, q4).collect())
    assert got4 == [("josh", 0.4), ("marko", 0.4), ("peter", 0.2)]
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="unknown step label"):
        _g(modern, "g.V().as('a').select('zzz')")


def test_gremlin_value_aggregates_and_range(modern):
    assert _g(modern, "g.V().hasLabel('person').values('age').sum()").first()[0] == 123
    assert _g(modern, "g.V().hasLabel('person').values('age').mean()").first()[0] == 123 / 4
    assert _g(modern, "g.V().values('age').min()").first()[0] == 27
    assert _g(modern, "g.V().values('age').max()").first()[0] == 35
    # range after order: deterministic slice
    q = "g.V().hasLabel('person').order().by('age').values('name').range(1, 3)"
    assert [r[0] for r in _g(modern, q).collect()] == ["marko", "josh"]
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="single-value stream"):
        _g(modern, "g.V().sum()")


def test_gremlin_values_multi_and_group(modern):
    # multi-prop values(): one traverser per value, nulls dropped
    got = sorted(r[0] for r in _g(modern, "g.V().values('name', 'lang')").collect())
    assert got == sorted(
        ["marko", "vadas", "josh", "peter", "lop", "ripple", "java", "java"]
    )
    # group().by(key).by(valueProp) -> (key, sorted values array)
    q = "g.V().hasLabel('person').group().by('~label').by('name')"
    rows = _g(modern, q).collect()
    assert len(rows) == 1 and rows[0][1] == ["josh", "marko", "peter", "vadas"]
    q2 = "g.V().out('created').group().by('name')"
    rows2 = {r[0]: r[1] for r in _g(modern, q2).collect()}
    assert rows2 == {"lop": ["lop", "lop", "lop"], "ripple": ["ripple"]}


def test_cypher_comma_patterns_and_multi_match(modern):
    # comma patterns join on the shared variable b
    q = (
        "MATCH (a:person {name: 'marko'})-[:knows]->(b), (b)-[:created]->(c) "
        "RETURN b.name AS b, c.name AS c ORDER BY b, c"
    )
    got = [(r.b, r.c) for r in _cy(modern, q).collect()]
    assert got == [("josh", "lop"), ("josh", "ripple")]
    # a second MATCH clause joins on a; its WHERE sees earlier variables
    q2 = (
        "MATCH (a:person)-[:created]->(s) WHERE s.name = 'lop' "
        "MATCH (a)-[:knows]->(b) "
        "RETURN a.name AS a, b.name AS b ORDER BY a, b"
    )
    got2 = [(r.a, r.b) for r in _cy(modern, q2).collect()]
    assert got2 == [("marko", "josh"), ("marko", "vadas")]
    # disconnected patterns: Cypher's cartesian product
    q3 = "MATCH (a:software), (b:software) RETURN count(*) AS n"
    assert _cy(modern, q3).first().n == 4
    # relationship uniqueness is scoped per MATCH clause: re-traversing
    # vadas's single edge in a SEPARATE clause is legal Cypher
    q4 = (
        "MATCH (a {name: 'vadas'})--(b) MATCH (b)--(c) "
        "RETURN c.name AS n ORDER BY n"
    )
    assert [r.n for r in _cy(modern, q4).collect()] == ["josh", "lop", "vadas"]


def test_cypher_optional_match(modern):
    # vadas created nothing -> null row survives the left join
    q = (
        "MATCH (p:person) OPTIONAL MATCH (p)-[:created]->(s) "
        "RETURN p.name AS p, s.name AS s ORDER BY p, s"
    )
    got = [(r.p, r.s) for r in _cy(modern, q).collect()]
    assert got == [
        ("josh", "lop"), ("josh", "ripple"), ("marko", "lop"),
        ("peter", "lop"), ("vadas", None),
    ]
    # WHERE inside OPTIONAL MATCH is part of the MATCHING (not a
    # post-filter): non-matching people keep their null row
    q2 = (
        "MATCH (p:person) OPTIONAL MATCH (p)-[:created]->(s) "
        "WHERE s.name = 'ripple' "
        "RETURN p.name AS p, s.name AS s ORDER BY p"
    )
    got2 = [(r.p, r.s) for r in _cy(modern, q2).collect()]
    assert got2 == [
        ("josh", "ripple"), ("marko", None), ("peter", None), ("vadas", None),
    ]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="own variables"):
        _cy(
            modern,
            "MATCH (p:person) OPTIONAL MATCH (s:software) WHERE s.name = p.name "
            "RETURN p.name AS p",
        )
    with pytest.raises(InvalidArgument, match="share at least one variable"):
        _cy(
            modern,
            "MATCH (p:person) OPTIONAL MATCH (s:software) RETURN p.name AS p",
        )
    with pytest.raises(InvalidArgument, match="cannot start with OPTIONAL"):
        _cy(modern, "OPTIONAL MATCH (p:person) RETURN p.name AS p")


def test_sparql_property_paths_seq_alt_inv(foaf):
    # sequence: who knows someone who created something
    q = _P + (
        "SELECT ?who ?sw WHERE { ?who foaf:knows/foaf:created ?sw } "
        "ORDER BY ?who ?sw"
    )
    got = [(r.who, r.sw) for r in _sp(foaf, q).collect()]
    assert got == [("marko", "lop"), ("marko", "ripple")]
    # alternative: knows or created, bag semantics
    q2 = _P + "SELECT ?s ?o WHERE { ?s foaf:knows|foaf:created ?o } ORDER BY ?s ?o"
    assert len(_sp(foaf, q2).collect()) == 6
    # inverse: ^created flips the direction
    q3 = _P + "SELECT ?sw ?who WHERE { ?sw ^foaf:created ?who } ORDER BY ?sw ?who"
    got3 = [(r.sw, r.who) for r in _sp(foaf, q3).collect()]
    assert got3 == [
        ("lop", "josh"), ("lop", "marko"), ("lop", "peter"), ("ripple", "josh"),
    ]
    # grouped sequence with an alternative inside
    q4 = _P + (
        "SELECT ?x WHERE { \"marko\" (foaf:knows|foaf:created)/foaf:created ?x } "
        "ORDER BY ?x"
    )
    assert [r.x for r in _sp(foaf, q4).collect()] == ["lop", "ripple"]


def test_sparql_property_path_closures(spark):
    from aws_sdk_pandas_spark.connectors.neptune import execute_sparql

    chain = _cdf(spark, 
        [("a", "n", "b"), ("b", "n", "c"), ("c", "n", "d"), ("x", "m", "y")],
        "s string, p string, o string",
    )

    def sp(q):
        return execute_sparql({"root": ""}, "PREFIX : <>\n" + q, triples=chain)

    # + from a constant subject: seeded BFS
    got = [r.x for r in sp("SELECT ?x WHERE { \"a\" :n+ ?x } ORDER BY ?x").collect()]
    assert got == ["b", "c", "d"]
    # * includes the zero-length self pair
    got2 = [r.x for r in sp("SELECT ?x WHERE { \"a\" :n* ?x } ORDER BY ?x").collect()]
    assert got2 == ["a", "b", "c", "d"]
    # constant OBJECT: the path is inverted and seeded from the object
    got3 = [r.x for r in sp("SELECT ?x WHERE { ?x :n+ \"d\" } ORDER BY ?x").collect()]
    assert got3 == ["a", "b", "c"]
    # var-to-var closure: iterative doubling, distinct pairs
    got4 = sp("SELECT ?s ?o WHERE { ?s :n+ ?o } ORDER BY ?s ?o").collect()
    assert [(r.s, r.o) for r in got4] == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]
    # p? : zero-or-one
    got5 = [r.x for r in sp("SELECT ?x WHERE { \"a\" :n? ?x } ORDER BY ?x").collect()]
    assert got5 == ["a", "b"]
    # a closure joined with a plain pattern
    got6 = sp(
        "SELECT ?x ?y WHERE { \"a\" :n+ ?x . ?x :n ?y } ORDER BY ?x ?y"
    ).collect()
    assert [(r.x, r.y) for r in got6] == [("b", "c"), ("c", "d")]


def test_sparql_property_path_errors(foaf):
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="variable cannot appear"):
        _sp(foaf, _P + "SELECT ?x WHERE { ?x ?p/foaf:created ?y }")
    with _pytest.raises(InvalidArgument, match="not allowed in CONSTRUCT"):
        _sp(
            foaf,
            _P + "CONSTRUCT { ?a foaf:knows/foaf:created ?b } "
            "WHERE { ?a foaf:knows ?b }",
        )


def test_cypher_with_clause(modern):
    # WITH aggregation + WHERE on the aggregate (the HAVING shape)
    q = (
        "MATCH (a:person)-[:created]->(s) "
        "WITH a, count(s) AS n WHERE n >= 2 "
        "RETURN a.name AS name, n"
    )
    assert [(r.name, r.n) for r in _cy(modern, q).collect()] == [("josh", 2)]
    # WITH followed by another MATCH joining on the carried variable
    q2 = (
        "MATCH (a:person)-[:created]->(s) "
        "WITH a, count(s) AS n "
        "MATCH (a)-[:knows]->(b) "
        "RETURN a.name AS a, b.name AS b, n ORDER BY b"
    )
    assert [(r.a, r.b, r.n) for r in _cy(modern, q2).collect()] == [
        ("marko", "josh", 1), ("marko", "vadas", 1),
    ]
    # pure projection narrows the variable set
    q3 = "MATCH (a:person)-[:knows]->(b) WITH b RETURN b.name AS n ORDER BY n"
    assert [r.n for r in _cy(modern, q3).collect()] == ["josh", "vadas"]
    # AS-rename of a node variable
    q4 = "MATCH (a:person) WITH a AS p RETURN p.name AS n ORDER BY n"
    assert [r.n for r in _cy(modern, q4).collect()] == ["josh", "marko", "peter", "vadas"]
    # scalar expression item + WHERE over it
    q5 = "MATCH (a:person) WITH a.age AS age WHERE age > 30 RETURN age ORDER BY age"
    assert [r.age for r in _cy(modern, q5).collect()] == [32, 35]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="needs an alias"):
        _cy(modern, "MATCH (a:person) WITH a.age RETURN a")
    # WITH DISTINCT is supported since round 4 (see test_cypher_with_modifiers)
    q6 = "MATCH (a:person)-[:knows]->(b) WITH DISTINCT a RETURN count(*) AS n"
    assert _cy(modern, q6).first().n == 1  # only marko knows anyone


def test_gremlin_where_not_subtraversals(modern):
    # where: keep elements whose fragment yields >= 1 traverser
    q = "g.V().hasLabel('person').where(out('created')).values('name')"
    assert sorted(r[0] for r in _g(modern, q).collect()) == ["josh", "marko", "peter"]
    q2 = "g.V().hasLabel('person').not(out('created')).values('name')"
    assert [r[0] for r in _g(modern, q2).collect()] == ["vadas"]
    q3 = "g.V().where(out('knows')).values('name')"
    assert [r[0] for r in _g(modern, q3).collect()] == ["marko"]
    # the fragment is a full chain (hop + filter)
    q4 = "g.V().where(out('created').has('name', 'ripple')).values('name')"
    assert [r[0] for r in _g(modern, q4).collect()] == ["josh"]
    # not(out()) == sinks; software vertices have no out-edges
    q5 = "g.V().not(out()).hasLabel('software').values('name')"
    assert sorted(r[0] for r in _g(modern, q5).collect()) == ["lop", "ripple"]
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="stay a traversal"):
        _g(modern, "g.V().where(out().count()).values('name')")


def test_sparql_optional_with_filter(foaf):
    # FILTER inside OPTIONAL is part of the MATCHING: people whose age
    # fails the filter keep a NULL row, not get dropped
    q = _P + (
        "SELECT ?p ?age WHERE { "
        "?p a foaf:Person . "
        "OPTIONAL { ?p foaf:age ?age FILTER(xsd:integer(?age) > 30) } "
        "} ORDER BY ?p"
    )
    q = q.replace("PREFIX foaf:", "PREFIX xsd: <x>\nPREFIX foaf:")
    got = [(r.p, r.age) for r in _sp(foaf, q).collect()]
    assert got == [
        ("josh", "32"), ("marko", None), ("peter", "35"), ("vadas", None),
    ]


def test_cross_language_agreement(modern):
    """The same logical question — software-creation counts per person —
    answered by all three query-language compilers AND raw DataFrame ops
    must coincide; any multiplicity/join bug in one compiler shows up as
    a cross-language disagreement."""
    from pyspark.sql import functions as F

    v, e = modern
    # ground truth: plain DataFrame join
    truth = {
        (r.p, r.n)
        for r in e.where(F.col("`~label`") == "created")
        .groupBy(F.col("`~from`").alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert truth == {("marko", 1), ("josh", 2), ("peter", 1)}
    # Gremlin: groupCount over out('created') traversers keyed by source
    g = _g(
        modern,
        "g.V().hasLabel('person').as('p').out('created')"
        ".select('p').by('name').groupCount().by('p')",
    )
    # groupCount after select: key column is 'p'
    got_g = {(r[0], r[1]) for r in g.collect()}
    # Cypher implicit aggregation
    got_c = {
        (r.p, r.n)
        for r in _cy(
            modern,
            "MATCH (p:person)-[:created]->(s) RETURN p.name AS p, count(s) AS n",
        ).collect()
    }
    # SPARQL over the triple rendering of the same edges
    triples = e.where(F.col("`~label`") == "created").select(
        F.col("`~from`").alias("s"), F.lit("created").alias("p"), F.col("`~to`").alias("o")
    )
    from aws_sdk_pandas_spark.connectors.neptune import execute_sparql

    got_s = {
        (r.who, r.n)
        for r in execute_sparql(
            {"root": ""},
            "SELECT ?who (COUNT(?sw) AS ?n) WHERE { ?who <created> ?sw } GROUP BY ?who",
            triples=triples,
        ).collect()
    }
    assert got_g == truth
    assert got_c == truth
    assert got_s == truth


def test_gremlin_path_and_simple_path(modern):
    q = "g.V('marko').out('knows').out('created').path()"
    got = sorted(tuple(r.path) for r in _g(modern, q).collect())
    assert got == [("marko", "josh", "lop"), ("marko", "josh", "ripple")]
    # edge steps appear in the path between their vertices
    q2 = "g.V('marko').outE('created').inV().path()"
    assert [tuple(r.path) for r in _g(modern, q2).collect()] == [("marko", "e3", "lop")]
    # simplePath drops back-tracking traversers
    q3 = "g.V('marko').both().both().simplePath().values('name')"
    assert sorted(r[0] for r in _g(modern, q3).collect()) == [
        "josh", "lop", "peter", "ripple",
    ]
    # without simplePath the bounce-backs are present (bag semantics)
    q4 = "g.V('marko').both().both().values('name')"
    assert len(_g(modern, q4).collect()) == 7  # 4 simple + 3 bounce-backs to marko


def test_compilers_agree_on_random_graphs(spark):
    """Pseudo-random multigraphs (self-loops + parallel edges included):
    2-hop counts from Gremlin and SPARQL must equal the plain DataFrame
    double-join (bag-of-walks semantics), while openCypher must equal
    the join MINUS same-edge reuse (trail semantics) — the exact
    semantic split between the three languages, fuzzed."""
    import random

    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.connectors.neptune import (
        execute_gremlin,
        execute_opencypher,
        execute_sparql,
    )

    for seed in (3, 11, 42):
        rng = random.Random(seed)
        verts = [f"v{i}" for i in range(12)]
        edge_rows = [
            (f"e{k}", "t", rng.choice(verts), rng.choice(verts))
            for k in range(40)
        ]
        # ensure at least one reusable edge exists (only a self-loop can
        # be reused within a 2-walk), so the trail/walk split is exercised
        loop_v = rng.choice(verts)
        edge_rows.append(("e_loop", "t", loop_v, loop_v))
        v = _cdf(spark, 
            [(x, "node") for x in verts], "`~id` string, `~label` string"
        )
        e = _cdf(spark, 
            edge_rows, "`~id` string, `~label` string, `~from` string, `~to` string"
        )
        a = e.select(
            F.col("`~id`").alias("id1"), F.col("`~from`").alias("s"), F.col("`~to`").alias("m")
        )
        b = e.select(
            F.col("`~id`").alias("id2"), F.col("`~from`").alias("m"), F.col("`~to`").alias("o")
        )
        walks = a.join(b, "m")
        n_walks = walks.count()
        n_trails = walks.where(F.col("id1") != F.col("id2")).count()

        got_g = execute_gremlin(
            {"root": ""}, "g.V().out('t').out('t').count()", vertices=v, edges=e
        ).first()[0]
        got_c = execute_opencypher(
            {"root": ""},
            "MATCH (a)-[:t]->(b)-[:t]->(c) RETURN count(*) AS n",
            vertices=v,
            edges=e,
        ).first().n
        triples = e.select(
            F.col("`~from`").alias("s"), F.lit("t").alias("p"), F.col("`~to`").alias("o")
        )
        got_s = execute_sparql(
            {"root": ""},
            "SELECT (COUNT(*) AS ?n) WHERE { ?a <t> ?b . ?b <t> ?c }",
            triples=triples,
        ).first().n
        assert got_g == n_walks, f"seed {seed}: gremlin {got_g} != walks {n_walks}"
        assert got_s == n_walks, f"seed {seed}: sparql {got_s} != walks {n_walks}"
        assert got_c == n_trails, f"seed {seed}: cypher {got_c} != trails {n_trails}"
        assert n_walks != n_trails, f"seed {seed}: fuzz produced no edge-reuse walks"


def test_cypher_pattern_predicates(modern):
    # NOT (p)-[:created]->() : people who created nothing
    q = (
        "MATCH (p:person) WHERE NOT (p)-[:created]->(s) "
        "RETURN p.name AS n ORDER BY n"
    )
    assert [r.n for r in _cy(modern, q).collect()] == ["vadas"]
    # positive pattern predicate: people who know someone
    q2 = (
        "MATCH (p:person) WHERE (p)-[:knows]->(q) "
        "RETURN p.name AS n ORDER BY n"
    )
    assert [r.n for r in _cy(modern, q2).collect()] == ["marko"]
    # semi-join semantics: NO row multiplication even with 2 matches
    q3 = (
        "MATCH (p:person) WHERE (p)-[:created]->(s) "
        "RETURN count(*) AS n"
    )
    assert _cy(modern, q3).first().n == 3  # marko, josh, peter — josh once
    # mixed with scalar conjuncts (parenthesized AND stays one predicate)
    q4 = (
        "MATCH (p:person) "
        "WHERE (p.age > 28 AND p.age < 36) AND NOT (p)-[:knows]->(x) "
        "RETURN p.name AS n ORDER BY n"
    )
    assert [r.n for r in _cy(modern, q4).collect()] == ["josh", "peter"]
    # labeled anonymous endpoint
    q5 = (
        "MATCH (p:person) WHERE (p)-[:created]->(:software {name: 'ripple'}) "
        "RETURN p.name AS n"
    )
    assert [r.n for r in _cy(modern, q5).collect()] == ["josh"]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="share at least one"):
        _cy(modern, "MATCH (p:person) WHERE (a)-[:knows]->(b) RETURN p")


def test_gremlin_has_not(modern):
    # software has no age; people have no lang
    got = sorted(r[0] for r in _g(modern, "g.V().hasNot('age').values('name')").collect())
    assert got == ["lop", "ripple"]
    got2 = sorted(r[0] for r in _g(modern, "g.V().hasNot('lang').values('name')").collect())
    assert got2 == ["josh", "marko", "peter", "vadas"]


def test_cypher_collect(modern):
    q = (
        "MATCH (p:person)-[:created]->(s) "
        "RETURN p.name AS p, collect(s.name) AS sw ORDER BY p"
    )
    got = [(r.p, r.sw) for r in _cy(modern, q).collect()]
    assert got == [("josh", ["lop", "ripple"]), ("marko", ["lop"]), ("peter", ["lop"])]
    # DISTINCT composes; collect works in WITH too
    q2 = (
        "MATCH (p:person)-[:created]->(s) "
        "WITH s, collect(DISTINCT p.name) AS creators "
        "RETURN s.name AS sw, creators ORDER BY sw"
    )
    got2 = [(r.sw, r.creators) for r in _cy(modern, q2).collect()]
    assert got2 == [("lop", ["josh", "marko", "peter"]), ("ripple", ["josh"])]


def test_sparql_group_concat_and_sample(foaf):
    q = _P + (
        "SELECT ?who (GROUP_CONCAT(?sw; SEPARATOR=', ') AS ?made) "
        "WHERE { ?who foaf:created ?sw } GROUP BY ?who ORDER BY ?who"
    )
    got = [(r.who, r.made) for r in _sp(foaf, q).collect()]
    assert got == [("josh", "lop, ripple"), ("marko", "lop"), ("peter", "lop")]
    # default separator is a single space; DISTINCT composes
    q2 = _P + (
        "SELECT ?sw (GROUP_CONCAT(DISTINCT ?who) AS ?by) "
        "WHERE { ?who foaf:created ?sw } GROUP BY ?sw ORDER BY ?sw"
    )
    got2 = [(r.sw, r.by) for r in _sp(foaf, q2).collect()]
    assert got2 == [("lop", "josh marko peter"), ("ripple", "josh")]
    # SAMPLE returns a deterministic member of the group
    q3 = _P + (
        "SELECT ?sw (SAMPLE(?who) AS ?one) "
        "WHERE { ?who foaf:created ?sw } GROUP BY ?sw ORDER BY ?sw"
    )
    got3 = [(r.sw, r.one) for r in _sp(foaf, q3).collect()]
    assert got3 == [("lop", "josh"), ("ripple", "josh")]


def test_sparql_multi_var_values(foaf):
    # (person, software) binding table joined against the created BGP:
    # only listed pairs that actually exist survive
    q = _P + (
        "SELECT ?who ?sw WHERE { "
        "?who foaf:created ?sw . "
        "VALUES (?who ?sw) { (\"marko\" \"lop\") (\"josh\" \"ripple\") "
        "(\"peter\" \"ripple\") } "
        "} ORDER BY ?who"
    )
    got = [(r.who, r.sw) for r in _sp(foaf, q).collect()]
    assert got == [("josh", "ripple"), ("marko", "lop")]
    # UNDEF = unbound-compatible: rows group by their defined mask and
    # each group equi-joins on only its OWN defined vars
    q_undef = _P + (
        "SELECT ?a ?b WHERE { ?a foaf:created ?b . "
        "VALUES (?a ?b) { (\"marko\" UNDEF) (\"josh\" \"ripple\") "
        "(UNDEF \"lop\") } } ORDER BY ?a ?b"
    )
    got_u = [(r.a, r.b) for r in _sp(foaf, q_undef).collect()]
    assert got_u == [
        ("josh", "lop"), ("josh", "ripple"), ("marko", "lop"),
        ("marko", "lop"), ("peter", "lop"),
    ]
    # an all-UNDEF row constrains nothing: every solution passes once more
    q_all = _P + (
        "SELECT ?a WHERE { ?a foaf:created ?b . "
        "VALUES (?a ?b) { (\"josh\" \"ripple\") (UNDEF UNDEF) } } ORDER BY ?a"
    )
    from collections import Counter

    assert Counter(r.a for r in _sp(foaf, q_all).collect()) == Counter(
        {"josh": 3, "marko": 1, "peter": 1}
    )
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="VALUES row has"):
        _sp(foaf, _P + (
            "SELECT ?a WHERE { ?a foaf:created ?b . "
            "VALUES (?a ?b) { (\"marko\") } }"
        ))


def test_cypher_shortest_path(modern):
    """[p =] shortestPath((a)-[*lo..hi]->(b)): one minimal-length trail
    per endpoint pair, deterministic tiebreak, p binds the edge-id list
    and length(p) gives the hop count."""
    q = (
        "MATCH p = shortestPath((a:person {name: 'marko'})-[*1..3]->(b:software)) "
        "RETURN b.name AS s, length(p) AS hops ORDER BY s"
    )
    got = [(r.s, r.hops) for r in _cy(modern, q).collect()]
    assert got == [("lop", 1), ("ripple", 2)]
    # the chosen path's edges: direct created for lop, via josh for ripple
    q2 = (
        "MATCH p = shortestPath((a {name: 'marko'})-[*1..3]->(b {name: 'ripple'})) "
        "RETURN p"
    )
    assert [list(r.p) for r in _cy(modern, q2).collect()] == [["e2", "e4"]]
    # without a path variable the pruning still applies (one row per pair)
    q3 = (
        "MATCH shortestPath((a:person)-[:created*1..2]->(b {name: 'lop'})) "
        "RETURN a.name AS n ORDER BY n"
    )
    assert [r.n for r in _cy(modern, q3).collect()] == ["josh", "marko", "peter"]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="single var-length"):
        _cy(modern, "MATCH p = shortestPath((a)-[:knows]->(b)) RETURN p")


def test_cypher_scalar_functions(modern):
    """toUpper/toLower/toString/toInteger/toFloat (Spark-cast
    semantics), head/last on collected lists."""
    q = (
        "MATCH (p:person) RETURN toUpper(p.name) AS un, "
        "toInteger(p.age) AS ia, toString(p.age) AS sa ORDER BY un"
    )
    got = [(r.un, r.ia, r.sa) for r in _cy(modern, q).collect()]
    assert got == [
        ("JOSH", 32, "32"), ("MARKO", 29, "29"),
        ("PETER", 35, "35"), ("VADAS", 27, "27"),
    ]
    q2 = (
        "MATCH (p:person) WITH collect(p.name) AS names "
        "RETURN head(names) AS h, last(names) AS l, size(names) AS n"
    )
    [r] = _cy(modern, q2).collect()
    # collect() is array_sort'ed for determinism
    assert (r.h, r.l, r.n) == ("josh", "vadas", 4)
    q3 = "MATCH (p:person) WHERE toLower(p.name) = 'marko' RETURN toFloat(p.age) AS f"
    assert [r.f for r in _cy(modern, q3).collect()] == [29.0]


def test_cypher_unwind(modern):
    # UNWIND-first over a list literal
    q = "UNWIND [3, 1, 2] AS x RETURN x ORDER BY x"
    assert [r.x for r in _cy(modern, q).collect()] == [1, 2, 3]
    # the collect -> UNWIND round trip (Cypher's list idiom)
    q2 = (
        "MATCH (p:person)-[:created]->(s) "
        "WITH p, collect(s.name) AS sw "
        "UNWIND sw AS one "
        "RETURN p.name AS p, one ORDER BY p, one"
    )
    got = [(r.p, r.one) for r in _cy(modern, q2).collect()]
    assert got == [("josh", "lop"), ("josh", "ripple"), ("marko", "lop"), ("peter", "lop")]
    # UNWIND after MATCH multiplies rows per element
    q3 = (
        "MATCH (p:person {name: 'marko'}) "
        "UNWIND ['a', 'b'] AS tag RETURN p.name AS p, tag ORDER BY tag"
    )
    assert [(r.p, r.tag) for r in _cy(modern, q3).collect()] == [
        ("marko", "a"), ("marko", "b"),
    ]
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with pytest.raises(InvalidArgument, match="UNWIND needs"):
        _cy(modern, "UNWIND [1, 2] RETURN x")


def test_gremlin_coalesce_and_optional(modern):
    # per person: created software if any, else known people
    q = (
        "g.V().hasLabel('person')"
        ".coalesce(out('created'), out('knows')).values('name')"
    )
    got = sorted(r[0] for r in _g(modern, q).collect())
    # marko created lop (created wins over knows); josh created lop+ripple;
    # peter created lop; vadas created nothing and knows nothing -> dropped
    assert got == ["lop", "lop", "lop", "ripple"]
    # optional(): unmatched elements pass through unchanged
    q2 = "g.V().hasLabel('person').optional(out('knows')).values('name')"
    got2 = sorted(r[0] for r in _g(modern, q2).collect())
    # marko -> vadas+josh (matched); josh/peter/vadas pass through
    assert got2 == ["josh", "josh", "peter", "vadas", "vadas"]
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="at least two"):
        _g(modern, "g.V().coalesce(out()).count()")
    with _pytest.raises(InvalidArgument, match="same element kind"):
        _g(modern, "g.V().coalesce(outE('knows'), out('created')).count()")


def test_gremlin_union_step(modern):
    q = "g.V('marko').union(out('knows'), out('created')).values('name')"
    assert sorted(r[0] for r in _g(modern, q).collect()) == ["josh", "lop", "vadas"]
    # bag semantics: overlapping branches keep duplicates
    q2 = "g.V('marko').union(out('created'), out('created')).values('name')"
    assert sorted(r[0] for r in _g(modern, q2).collect()) == ["lop", "lop"]
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="at least two"):
        _g(modern, "g.V().union(out()).count()")


def test_cypher_prefix_ambiguous_variables(modern):
    """round-3 advice (medium): a variable whose name extends another
    variable's name (a vs a_b) must keep its own columns through shared-
    variable joins, WITH projections, and WITH renames."""
    q = (
        "MATCH (a:person)-[:created]->(s) "
        "MATCH (a)-[:knows]->(a_b:person) "
        "RETURN a.name AS an, a_b.name AS bn ORDER BY an, bn"
    )
    got = [(r.an, r.bn) for r in _cy(modern, q).collect()]
    assert got == [("marko", "josh"), ("marko", "vadas")]
    # through a WITH projection keeping both variables
    q2 = (
        "MATCH (a:person)-[:knows]->(a_b:person) "
        "WITH a, a_b "
        "RETURN a.name AS an, a_b.name AS bn ORDER BY bn"
    )
    got2 = [(r.an, r.bn) for r in _cy(modern, q2).collect()]
    assert got2 == [("marko", "josh"), ("marko", "vadas")]
    # a WITH rename of the short variable must not rewrite the long one's
    # columns
    q3 = (
        "MATCH (a:person)-[:knows]->(a_b:person) "
        "WITH a AS x, a_b "
        "RETURN x.name AS xn, a_b.name AS bn ORDER BY bn"
    )
    got3 = [(r.xn, r.bn) for r in _cy(modern, q3).collect()]
    assert got3 == [("marko", "josh"), ("marko", "vadas")]


def test_cypher_keywords_inside_string_literals(modern):
    """round-3 advice: quoted values containing MATCH/WHERE/UNWIND must
    not split clauses."""
    q = "MATCH (p:person {name: 'no MATCH here'}) RETURN p.name AS n"
    assert _cy(modern, q).count() == 0
    q2 = "MATCH (p:person) WHERE p.name = ' MATCH ' RETURN p.name AS n"
    assert _cy(modern, q2).count() == 0
    q3 = "MATCH (p:person) WHERE p.name = 'a WHERE b' RETURN p.name AS n"
    assert _cy(modern, q3).count() == 0
    # and one that DOES match, with a keyword-bearing filter value present
    q4 = (
        "MATCH (p:person) WHERE p.name = 'marko' OR p.name = 'x UNWIND y' "
        "RETURN p.name AS n"
    )
    assert [r.n for r in _cy(modern, q4).collect()] == ["marko"]


def test_gremlin_has_not_missing_property(modern):
    """round-3 advice: hasNot on a key absent from the schema keeps every
    element (TinkerPop semantics) instead of raising."""
    assert _g(modern, "g.V().hasNot('no_such_prop').count()").first()[0] == 6
    assert _g(modern, "g.E().hasNot('no_such_prop').count()").first()[0] == 6


def test_gremlin_limit_range_inside_branches_are_per_traverser(modern):
    """round-3 advice follow-through: limit/range inside a branch follow
    TinkerPop's per-SOURCE-traverser scope (a window over the carried
    source id), never cutting the whole stream; the pick among a
    source's results is deterministic (ascending ~id)."""
    # josh created {lop, ripple}: limit(1) keeps ONE per person, not one
    # globally — marko/josh/peter each still produce a row
    q = (
        "g.V().hasLabel('person')"
        ".coalesce(out('created').limit(1), out('knows')).values('name')"
    )
    assert sorted(r[0] for r in _g(modern, q).collect()) == ["lop", "lop", "lop"]
    # union: knows-branch limited per source, created-branch unlimited
    q2 = "g.V('marko').union(out('knows').limit(1), out('created')).values('name')"
    assert sorted(r[0] for r in _g(modern, q2).collect()) == ["josh", "lop"]
    # range(1, 2): the SECOND result per source (by ~id); sources whose
    # branch yields fewer rows pass through optional() unchanged
    q3 = (
        "g.V().hasLabel('person')"
        ".optional(out('knows').range(1, 2)).values('name')"
    )
    assert sorted(r[0] for r in _g(modern, q3).collect()) == [
        "josh", "peter", "vadas", "vadas",
    ]
    # where(...limit(1)) == where(...): existence is per source anyway
    q4 = "g.V().where(out('created').limit(1)).values('name')"
    assert sorted(r[0] for r in _g(modern, q4).collect()) == [
        "josh", "marko", "peter",
    ]


def test_gremlin_order_still_rejected_inside_branches(modern):
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    with _pytest.raises(InvalidArgument, match="outside the branch"):
        _g(modern, "g.V().union(out('created'), out('knows').order().by('name')).count()")


# ---------------------------------------------------------------------------
# Differential fuzzing: random small graphs x random programs, compiled
# plans vs a naive pure-Python traversal evaluator (bag semantics for
# Gremlin, per-clause trail uniqueness for Cypher).  round-3 verdict #4.
# ---------------------------------------------------------------------------


def _rand_graph(rng, nv=10, ne=26):
    vlabels = ["person", "robot"]
    elabels = ["t1", "t2"]
    verts = [
        (
            f"v{i}",
            rng.choice(vlabels),
            f"n{i:02d}",
            rng.choice([None, rng.randint(18, 60)]),
        )
        for i in range(nv)
    ]
    edges = [
        (f"e{k}", rng.choice(elabels), f"v{rng.randrange(nv)}", f"v{rng.randrange(nv)}")
        for k in range(ne)
    ]
    return verts, edges


def _frames(spark, verts, edges):
    v = _cdf(spark, 
        verts, "`~id` string, `~label` string, name string, age int"
    )
    e = _cdf(spark, 
        edges, "`~id` string, `~label` string, `~from` string, `~to` string"
    )
    return v, e


def test_gremlin_random_programs_match_naive_evaluator(spark):
    """8+ random (graph, program) trials: the compiled plan's traverser
    bag must equal a step-by-step naive Python evaluation."""
    import random

    from aws_sdk_pandas_spark.connectors.neptune import execute_gremlin

    for seed in range(8):
        rng = random.Random(1000 + seed)
        verts, edges = _rand_graph(rng)
        v, e = _frames(spark, verts, edges)
        vmap = {x[0]: x for x in verts}
        out_adj: dict[str, list[tuple[str, str]]] = {}
        in_adj: dict[str, list[tuple[str, str]]] = {}
        for _eid, el, f, t in edges:
            out_adj.setdefault(f, []).append((el, t))
            in_adj.setdefault(t, []).append((el, f))

        def hop(cur, kind, lbl):
            nxt = []
            for x in cur:
                if kind in ("out", "both"):
                    nxt += [t for el, t in out_adj.get(x, []) if el == lbl]
                if kind in ("in", "both"):
                    nxt += [s for el, s in in_adj.get(x, []) if el == lbl]
            return nxt

        # random program: start filter + 2-3 steps + terminal
        steps = []
        cur = [x[0] for x in verts]
        q = "g.V()"
        if rng.random() < 0.5:
            lab = rng.choice(["person", "robot"])
            q += f".hasLabel('{lab}')"
            cur = [x for x in cur if vmap[x][1] == lab]
        for _ in range(rng.randint(2, 3)):
            step = rng.choice(
                [
                    "out", "in", "both", "has_gt", "has_not", "where_out",
                    "not_out", "dedup", "coalesce_limit", "union_limit",
                    "optional_range",
                ]
            )
            if step in ("out", "in", "both"):
                lbl = rng.choice(["t1", "t2"])
                q += f".{step}('{lbl}')"
                cur = hop(cur, step, lbl)
            elif step in ("coalesce_limit", "union_limit", "optional_range"):
                # branch-scope limit/range semantics are per DISTINCT
                # source — dedup first so the naive model is exact
                q += ".dedup()"
                cur = sorted(set(cur))
                l1, l2 = rng.choice(["t1", "t2"]), rng.choice(["t1", "t2"])

                def outs(x, lbl):
                    return sorted(t for el, t in out_adj.get(x, []) if el == lbl)

                nxt = []
                if step == "coalesce_limit":
                    q += f".coalesce(out('{l1}').limit(1), out('{l2}'))"
                    for x in cur:
                        b1 = outs(x, l1)[:1]
                        nxt += b1 if b1 else outs(x, l2)
                elif step == "union_limit":
                    q += f".union(out('{l1}').limit(1), out('{l2}'))"
                    for x in cur:
                        nxt += outs(x, l1)[:1] + outs(x, l2)
                else:
                    q += f".optional(out('{l1}').range(1, 2))"
                    for x in cur:
                        ts = outs(x, l1)
                        nxt += ts[1:2] if len(ts) >= 2 else [x]
                cur = nxt
            elif step == "has_gt":
                n = rng.randint(20, 55)
                q += f".has('age', gt({n}))"
                cur = [x for x in cur if vmap[x][3] is not None and vmap[x][3] > n]
            elif step == "has_not":
                q += ".hasNot('age')"
                cur = [x for x in cur if vmap[x][3] is None]
            elif step in ("where_out", "not_out"):
                lbl = rng.choice(["t1", "t2"])
                name = "where" if step == "where_out" else "not"
                q += f".{name}(out('{lbl}'))"
                keep = {
                    x
                    for x in set(cur)
                    if any(el == lbl for el, _t in out_adj.get(x, []))
                }
                cur = [x for x in cur if (x in keep) == (name == "where")]
            else:
                q += ".dedup()"
                cur = sorted(set(cur))
        if rng.random() < 0.5:
            got = execute_gremlin({"root": ""}, q + ".count()", vertices=v, edges=e)
            assert got.first()[0] == len(cur), f"seed {seed}: {q}.count()"
        else:
            rows = execute_gremlin(
                {"root": ""}, q + ".values('name')", vertices=v, edges=e
            ).collect()
            want = sorted(vmap[x][2] for x in cur)
            assert sorted(r[0] for r in rows) == want, f"seed {seed}: {q}.values"


def test_cypher_random_patterns_match_naive_evaluator(spark):
    """8+ random trials: MATCH chain bindings (per-clause relationship
    uniqueness = trail semantics) vs naive enumeration."""
    import itertools
    import random

    from aws_sdk_pandas_spark.connectors.neptune import execute_opencypher

    for seed in range(8):
        rng = random.Random(2000 + seed)
        verts, edges = _rand_graph(rng)
        v, e = _frames(spark, verts, edges)
        vmap = {x[0]: x for x in verts}

        nhops = rng.randint(1, 2)
        # sometimes close the chain back on a0 — the cycle idiom
        cycle = nhops >= 2 and rng.random() < 0.4
        hops = []
        pat = "(a0"
        vlab0 = rng.choice([None, "person", "robot"])
        if vlab0:
            pat += f":{vlab0}"
        pat += ")"
        for h in range(nhops):
            elab = rng.choice([None, "t1", "t2"])
            direction = rng.choice(["out", "in", "any"])
            etxt = f"[:{elab}]" if elab else "[]"
            arrow = {"out": f"-{etxt}->", "in": f"<-{etxt}-", "any": f"-{etxt}-"}[direction]
            last = h == nhops - 1
            if cycle and last:
                pat += f"{arrow}(a0)"
                hops.append((elab, direction, None, True))
            else:
                vlab = rng.choice([None, "person", "robot"])
                pat += f"{arrow}(a{h + 1}" + (f":{vlab}" if vlab else "") + ")"
                hops.append((elab, direction, vlab, False))
        age_min = rng.randint(20, 55) if rng.random() < 0.5 else None
        where = f" WHERE a0.age > {age_min}" if age_min is not None else ""
        q = f"MATCH {pat}{where} RETURN count(*) AS n"

        # naive enumeration with pairwise-distinct edges (trail rule)
        def node_ok(vid, lab):
            return lab is None or vmap[vid][1] == lab

        def orientations(eid, el, f, t, elab, direction):
            if elab is not None and el != elab:
                return []
            outs = []
            if direction in ("out", "any"):
                outs.append((eid, f, t))
            if direction in ("in", "any"):
                outs.append((eid, t, f))
            return outs

        count = 0
        starts = [
            x[0]
            for x in verts
            if node_ok(x[0], vlab0)
            and (age_min is None or (x[3] is not None and x[3] > age_min))
        ]
        for s in starts:
            frontier = [(s, [])]
            for elab, direction, vlab, closes in hops:
                nxt = []
                for cur, used in frontier:
                    for eid, el, f, t in edges:
                        if eid in used:
                            continue
                        for _eid, src, dst in orientations(eid, el, f, t, elab, direction):
                            if src != cur or not node_ok(dst, vlab):
                                continue
                            if closes and dst != s:  # cycle must return to a0
                                continue
                            nxt.append((dst, used + [eid]))
                frontier = nxt
            count += len(frontier)

        got = execute_opencypher({"root": ""}, q, vertices=v, edges=e).first().n
        assert got == count, f"seed {seed}: {q} -> {got} != naive {count}"


def test_cypher_with_modifiers(modern):
    """WITH [DISTINCT] items [ORDER BY] [SKIP] [LIMIT] [WHERE] — the
    pipeline modifiers in Cypher's evaluation order."""
    # top-2 creators by software count, then expand back to their works
    q = (
        "MATCH (p:person)-[:created]->(s) "
        "WITH p, count(s) AS n ORDER BY n DESC, p.name ASC LIMIT 1 "
        "MATCH (p)-[:created]->(s2) "
        "RETURN p.name AS who, s2.name AS sw ORDER BY sw"
    )
    got = [(r.who, r.sw) for r in _cy(modern, q).collect()]
    assert got == [("josh", "lop"), ("josh", "ripple")]
    # SKIP past the top row
    q2 = (
        "MATCH (p:person)-[:created]->(s) "
        "WITH p, count(s) AS n ORDER BY n DESC, p.name ASC SKIP 1 LIMIT 2 "
        "RETURN p.name AS who ORDER BY who"
    )
    assert [r.who for r in _cy(modern, q2).collect()] == ["marko", "peter"]
    # DISTINCT collapses the duplicated software rows
    q3 = (
        "MATCH (p:person)-[:created]->(s) "
        "WITH DISTINCT s "
        "RETURN count(*) AS n"
    )
    assert _cy(modern, q3).first().n == 2  # lop, ripple
    # ORDER BY on a property of a carried variable + WHERE after LIMIT
    q4 = (
        "MATCH (p:person) "
        "WITH p ORDER BY p.age DESC LIMIT 3 WHERE p.age < 35 "
        "RETURN p.name AS who ORDER BY who"
    )
    # top-3 by age = peter(35), josh(32), marko(29); WHERE drops peter
    assert [r.who for r in _cy(modern, q4).collect()] == ["josh", "marko"]
    # a literal containing ' LIMIT ' must not trip the modifier parser
    q5 = (
        "MATCH (p:person) WITH p WHERE p.name = ' LIMIT 5' "
        "RETURN count(*) AS n"
    )
    assert _cy(modern, q5).first().n == 0


def test_cypher_graph_functions(modern):
    """id()/type()/labels()/exists() over bound variables."""
    q = "MATCH (p:person) WHERE exists(p.age) RETURN count(*) AS n"
    assert _cy(modern, q).first().n == 4
    q2 = "MATCH (s:software) WHERE NOT exists(s.age) RETURN count(*) AS n"
    assert _cy(modern, q2).first().n == 2
    q3 = "MATCH (p:person) RETURN id(p) AS i ORDER BY i LIMIT 2"
    assert [r.i for r in _cy(modern, q3).collect()] == ["josh", "marko"]
    q4 = (
        "MATCH (a)-[r]->(b:software) "
        "RETURN DISTINCT type(r) AS t, labels(b) AS lb ORDER BY t"
    )
    got = [(r.t, list(r.lb)) for r in _cy(modern, q4).collect()]
    assert got == [("created", ["software"])]
    # a property named like a function is untouched (id_x etc. unaffected)
    q5 = "MATCH (p:person) RETURN p.name AS id ORDER BY id LIMIT 1"
    assert _cy(modern, q5).first().id == "josh"


def test_gremlin_branch_limit_duplicate_traversers_share_bound(modern):
    """Documented determinism choice: the per-source window keys on the
    element ~id, so duplicate traversers at the same element share ONE
    bound (strict TinkerPop would give each its own limit).  both('knows')
    puts two traversers on marko (via vadas and josh edges reversed? no —
    marko knows vadas and josh, so vadas and josh each get one traverser,
    and marko gets two from the reverse orientation)."""
    # marko appears twice after both('knows') from vadas+josh; limit(1)
    # inside the branch keeps one created-target PER DISTINCT source
    q = (
        "g.V().hasLabel('person').both('knows')"
        ".coalesce(out('created').limit(1), out('knows')).values('name')"
    )
    got = sorted(r[0] for r in _g(modern, q).collect())
    # stream after both('knows'): vadas, josh (from marko), marko, marko.
    # josh -> created {lop,ripple} -> limit per distinct source -> lop;
    # marko (x2 traversers, ONE distinct source) -> created {lop} -> one
    # lop total (the documented collapse); vadas -> no created ->
    # knows-branch: vadas knows nobody -> dropped
    assert got == ["lop", "lop"]


def test_gremlin_random_programs_round4_steps(spark):
    """Fuzzer extension to the round-4 step surface (round-4 verdict
    #8): random programs now draw fold().unfold() round-trips and
    per-traverser branch limits, and finish through project() /
    elementMap() terminals — the compiled traverser bag must still
    equal the naive step-by-step evaluation."""
    import random

    from aws_sdk_pandas_spark.connectors.neptune import execute_gremlin

    for seed in range(10):
        rng = random.Random(3000 + seed)
        verts, edges = _rand_graph(rng)
        v, e = _frames(spark, verts, edges)
        vmap = {x[0]: x for x in verts}
        out_adj: dict[str, list[tuple[str, str]]] = {}
        in_adj: dict[str, list[tuple[str, str]]] = {}
        for _eid, el, f, t in edges:
            out_adj.setdefault(f, []).append((el, t))
            in_adj.setdefault(t, []).append((el, f))

        def hop(cur, kind, lbl):
            nxt = []
            for x in cur:
                if kind in ("out", "both"):
                    nxt += [t for el, t in out_adj.get(x, []) if el == lbl]
                if kind in ("in", "both"):
                    nxt += [s for el, s in in_adj.get(x, []) if el == lbl]
            return nxt

        cur = [x[0] for x in verts]
        q = "g.V()"
        if rng.random() < 0.5:
            lab = rng.choice(["person", "robot"])
            q += f".hasLabel('{lab}')"
            cur = [x for x in cur if vmap[x][1] == lab]
        for _ in range(rng.randint(2, 3)):
            step = rng.choice(
                ["out", "in", "both", "fold_unfold", "dedup", "union_limit",
                 "repeat_emit"]
            )
            if step in ("out", "in", "both"):
                lbl = rng.choice(["t1", "t2"])
                q += f".{step}('{lbl}')"
                cur = hop(cur, step, lbl)
            elif step == "repeat_emit":
                lbl = rng.choice(["t1", "t2"])
                q += f".repeat(out('{lbl}')).emit().times(2)"
                lvl1 = hop(cur, "out", lbl)
                cur = lvl1 + hop(lvl1, "out", lbl)
            elif step == "fold_unfold":
                q += ".fold().unfold()"  # bag-preserving round trip
            elif step == "union_limit":
                # branch-scope limit is per DISTINCT source: dedup first
                q += ".dedup()"
                cur = sorted(set(cur))
                l1, l2 = rng.choice(["t1", "t2"]), rng.choice(["t1", "t2"])
                q += f".union(out('{l1}').limit(1), out('{l2}'))"
                nxt = []
                for x in cur:
                    o1 = sorted(t for el, t in out_adj.get(x, []) if el == l1)
                    o2 = sorted(t for el, t in out_adj.get(x, []) if el == l2)
                    nxt += o1[:1] + o2
                cur = nxt
            else:
                q += ".dedup()"
                cur = sorted(set(cur))
        term = rng.choice(["count", "project", "elementMap"])
        if term == "count":
            got = execute_gremlin(
                {"root": ""}, q + ".count()", vertices=v, edges=e
            )
            assert got.first()[0] == len(cur), f"seed {seed}: {q}.count()"
        elif term == "project":
            rows = execute_gremlin(
                {"root": ""},
                q + ".project('nm', 'lb').by('name').by('label')",
                vertices=v, edges=e,
            ).collect()
            want = sorted((vmap[x][2], vmap[x][1]) for x in cur)
            assert sorted((r.nm, r.lb) for r in rows) == want, (
                f"seed {seed}: {q}.project"
            )
        else:
            rows = execute_gremlin(
                {"root": ""}, q + ".elementMap('name')", vertices=v, edges=e
            ).collect()
            want = sorted((x, vmap[x][1], vmap[x][2]) for x in cur)
            assert sorted((r.id, r.label, r.name) for r in rows) == want, (
                f"seed {seed}: {q}.elementMap"
            )


def test_gremlin_until_fixpoint_matches_naive(spark):
    """Differential fuzz for the round-6 until-only fixpoint loop:
    random DAGs (edges only from lower to higher vertex index, so every
    loop converges and the naive bag evaluation terminates) x random
    until()-before/after-repeat() programs — the compiled traverser bag
    must equal the naive level-by-level evaluation."""
    import random

    from aws_sdk_pandas_spark.connectors.neptune import execute_gremlin

    for seed in range(8):
        rng = random.Random(5000 + seed)
        nv = 10
        verts = [
            (f"v{i}", rng.choice(["person", "robot"]), f"n{i:02d}", None)
            for i in range(nv)
        ]
        edges = []
        for k in range(22):
            a, b = sorted(rng.sample(range(nv), 2))
            edges.append((f"e{k}", rng.choice(["t1", "t2"]), f"v{a}", f"v{b}"))
        v, e = _frames(spark, verts, edges)
        vmap = {x[0]: x for x in verts}
        out_adj: dict[str, list[tuple[str, str]]] = {}
        for _eid, el, f, t in edges:
            out_adj.setdefault(f, []).append((el, t))

        lbl = rng.choice(["t1", "t2"])
        stop = rng.choice(["person", "robot"])
        check_first = rng.random() < 0.5
        if check_first:
            q = f"g.V().until(hasLabel('{stop}')).repeat(out('{lbl}')).id()"
        else:
            q = f"g.V().repeat(out('{lbl}')).until(hasLabel('{stop}')).id()"

        exited: list[str] = []
        frontier = [x[0] for x in verts]
        if check_first:
            exited += [x for x in frontier if vmap[x][1] == stop]
            frontier = [x for x in frontier if vmap[x][1] != stop]
        while frontier:
            frontier = [
                t for x in frontier for el, t in out_adj.get(x, []) if el == lbl
            ]
            exited += [x for x in frontier if vmap[x][1] == stop]
            frontier = [x for x in frontier if vmap[x][1] != stop]

        rows = execute_gremlin({"root": ""}, q, vertices=v, edges=e).collect()
        assert sorted(r[0] for r in rows) == sorted(exited), f"seed {seed}: {q}"

        # TinkerPop last-modulator-wins: appending .times(2) overrides p
        # (pure 2-level unroll), whatever the until position was
        q_t = q.replace(".id()", ".times(2).id()")
        lvl1 = [
            t
            for x in (y[0] for y in verts)
            for el, t in out_adj.get(x, [])
            if el == lbl
        ]
        lvl2 = [
            t for x in lvl1 for el, t in out_adj.get(x, []) if el == lbl
        ]
        rows_t = execute_gremlin({"root": ""}, q_t, vertices=v, edges=e).collect()
        assert sorted(r[0] for r in rows_t) == sorted(lvl2), f"seed {seed}: {q_t}"

        # repeat(X).emit() transitive closure vs naive all-levels walk
        q_e = f"g.V().repeat(out('{lbl}')).emit().id()"
        all_levels: list[str] = []
        cur = [x[0] for x in verts]
        while cur:
            cur = [t for x in cur for el, t in out_adj.get(x, []) if el == lbl]
            all_levels += cur
        rows_e = execute_gremlin({"root": ""}, q_e, vertices=v, edges=e).collect()
        assert sorted(r[0] for r in rows_e) == sorted(all_levels), (
            f"seed {seed}: {q_e}"
        )


def test_cypher_random_with_and_shortestpath_match_naive(spark):
    """Fuzzer extension to the round-4 Cypher surface: WITH pipeline
    modifiers (DISTINCT projection, aggregate + WHERE) and shortestPath
    over random graphs vs naive enumeration / BFS."""
    import random

    from aws_sdk_pandas_spark.connectors.neptune import execute_opencypher

    for seed in range(8):
        rng = random.Random(4000 + seed)
        verts, edges = _rand_graph(rng)
        v, e = _frames(spark, verts, edges)
        elab = rng.choice(["t1", "t2"])

        # WITH DISTINCT: distinct sources owning a 2-hop trail
        q1 = (
            f"MATCH (a)-[:{elab}]->(b)-[:{elab}]->(c) "
            "WITH DISTINCT a RETURN count(*) AS n"
        )
        srcs = set()
        for e1, l1, f1, t1 in edges:
            if l1 != elab:
                continue
            for e2, l2, f2, t2 in edges:
                if l2 != elab or e2 == e1:  # trail rule: edges distinct
                    continue
                if f2 == t1:
                    srcs.add(f1)
        got1 = execute_opencypher(
            {"root": ""}, q1, vertices=v, edges=e
        ).first().n
        assert got1 == len(srcs), f"seed {seed}: {q1}"

        # WITH aggregate + WHERE (the HAVING shape): out-degree >= k
        k = rng.randint(1, 3)
        q2 = (
            f"MATCH (a)-[:{elab}]->(b) WITH a, count(b) AS n "
            f"WHERE n >= {k} RETURN count(*) AS m"
        )
        deg: dict[str, int] = {}
        for _eid, l, f, t in edges:
            if l == elab:
                deg[f] = deg.get(f, 0) + 1
        want2 = sum(1 for x in deg.values() if x >= k)
        got2 = execute_opencypher(
            {"root": ""}, q2, vertices=v, edges=e
        ).first().m
        assert got2 == want2, f"seed {seed}: {q2}"

        # shortestPath: one row per endpoint pair at BFS distance in
        # [1..3] (a shortest walk repeats no edge, so BFS == trail)
        q3 = (
            f"MATCH p = shortestPath((a:person)-[:{elab}*1..3]->(b:robot)) "
            "RETURN count(*) AS n"
        )
        adj: dict[str, set[str]] = {}
        for _eid, l, f, t in edges:
            if l == elab:
                adj.setdefault(f, set()).add(t)
        persons = [x[0] for x in verts if x[1] == "person"]
        robots = {x[0] for x in verts if x[1] == "robot"}
        pairs = 0
        for s in persons:
            dist = {s: 0}
            frontier, d = [s], 0
            while frontier and d < 3:
                d += 1
                nxt = []
                for x in frontier:
                    for y in adj.get(x, ()):
                        if y not in dist:
                            dist[y] = d
                            nxt.append(y)
                frontier = nxt
            pairs += sum(
                1 for b in robots if 1 <= dist.get(b, 10 ** 9) <= 3
            )
        got3 = execute_opencypher(
            {"root": ""}, q3, vertices=v, edges=e
        ).first().n
        assert got3 == pairs, f"seed {seed}: {q3}"


def test_gremlin_repeat_emit(modern):
    """repeat(t).emit().times(n) = levels 1..n; emit().repeat(t).times(n)
    additionally emits level 0 — the union-of-powers rewrite (round 5)."""
    # levels 1 and 2 from marko: {vadas, josh, lop} + {lop, ripple}
    q = "g.V('marko').repeat(out()).emit().times(2).id()"
    assert sorted(r[0] for r in _g(modern, q).collect()) == [
        "josh", "lop", "lop", "ripple", "vadas",
    ]
    # emit-before includes the start traverser (level 0)
    q2 = "g.V('marko').emit().repeat(out()).times(2).id()"
    assert sorted(r[0] for r in _g(modern, q2).collect()) == [
        "josh", "lop", "lop", "marko", "ripple", "vadas",
    ]
    # plain repeat unchanged: final level only
    q3 = "g.V('marko').repeat(out()).times(2).id()"
    assert sorted(r[0] for r in _g(modern, q3).collect()) == ["lop", "ripple"]
    # identity is a usable step on its own
    assert [r[0] for r in _g(modern, "g.V('lop').identity().id()").collect()] == ["lop"]
    # composes with terminals and further steps
    q4 = "g.V().emit().repeat(out('created')).times(1).count()"
    assert _g(modern, q4).first()[0] == 6 + 4  # level 0 (all) + level 1 (edges)
    q5 = "g.V('marko').repeat(out()).emit().times(2).dedup().id()"
    assert sorted(r[0] for r in _g(modern, q5).collect()) == [
        "josh", "lop", "ripple", "vadas",
    ]
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="adjacent to repeat"):
        _g(modern, "g.V().emit().out().count()")


def test_gremlin_repeat_until(modern):
    """repeat(t).until(p) iterates to fixpoint (driver loop, round 6):
    a traverser exits at the FIRST level where p holds; no times()
    bound needed.  With BOTH modulators, TinkerPop's rule applies —
    until() and times() each SET the loop predicate, LAST call wins."""
    # walk out until software: lop exits at level 1; josh's lop/ripple
    # at level 2; vadas dead-ends and disappears
    q = "g.V('marko').repeat(out()).until(hasLabel('software')).id()"
    assert sorted(r[0] for r in _g(modern, q).collect()) == [
        "lop", "lop", "ripple",
    ]
    # until-first: an already-satisfying start exits at level 0
    q2 = "g.V('lop').until(hasLabel('software')).repeat(out()).id()"
    assert [r[0] for r in _g(modern, q2).collect()] == ["lop"]
    # every-vertex fixpoint: marko 3 exits, josh 2, peter 1, rest 0
    q3 = "g.V().repeat(out()).until(hasLabel('software')).count()"
    assert _g(modern, q3).first()[0] == 6
    # trailing times(n) OVERRIDES the until predicate (last call wins):
    # pure out.out.out from marko reaches nothing at level 3
    q4 = "g.V('marko').repeat(out()).until(hasLabel('software')).times(3).id()"
    assert _g(modern, q4).count() == 0
    # ... and out.out emits level-2 survivors regardless of p
    q5 = "g.V('marko').repeat(out()).until(hasLabel('person')).times(2).id()"
    assert sorted(r[0] for r in _g(modern, q5).collect()) == ["lop", "ripple"]
    # trailing until(p) OVERRIDES a times(n) bound: fixpoint again
    q6 = "g.V('marko').repeat(out()).times(1).until(hasLabel('software')).id()"
    assert sorted(r[0] for r in _g(modern, q6).collect()) == [
        "lop", "lop", "ripple",
    ]
    # until-first with times override == pure unroll
    q7 = "g.V('lop').until(hasLabel('software')).repeat(out()).times(1).id()"
    assert _g(modern, q7).count() == 0  # lop has no out edges
    import pytest as _pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    with _pytest.raises(InvalidArgument, match="adjacent to repeat"):
        _g(modern, "g.V().until(out()).out().count()")


def test_gremlin_repeat_emit_fixpoint(modern):
    """repeat(t).emit() with NO times(): transitive closure — every
    level's traversers are emitted and keep walking until the frontier
    dies out (round 6)."""
    q = "g.V('marko').repeat(out()).emit().id()"
    assert sorted(r[0] for r in _g(modern, q).collect()) == [
        "josh", "lop", "lop", "ripple", "vadas",
    ]
    # emit-first includes level 0
    q2 = "g.V('lop').emit().repeat(out()).id()"
    assert [r[0] for r in _g(modern, q2).collect()] == ["lop"]
    q3 = "g.V('marko').emit().repeat(out('created')).id()"
    assert sorted(r[0] for r in _g(modern, q3).collect()) == ["lop", "marko"]
    # agrees with the bounded union-of-powers form at a saturating depth
    q4 = "g.V('marko').repeat(out()).emit().times(3).id()"
    assert sorted(r[0] for r in _g(modern, q4).collect()) == sorted(
        r[0] for r in _g(modern, q).collect()
    )


def test_gremlin_repeat_emit_cycle_raises(spark):
    import pytest as _pytest

    from aws_sdk_pandas_spark.connectors.neptune import execute_gremlin
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    v = _cdf(spark, 
        [("a", "person", "a"), ("b", "person", "b")],
        "`~id` string, `~label` string, name string",
    )
    e = _cdf(spark, 
        [("e1", "knows", "a", "b"), ("e2", "knows", "b", "a")],
        "`~id` string, `~label` string, `~from` string, `~to` string",
    )
    with _pytest.raises(InvalidArgument, match="did not exhaust"):
        execute_gremlin(
            {"root": ""}, "g.V('a').repeat(out()).emit().count()",
            vertices=v, edges=e,
        )


def test_gremlin_repeat_until_nonconvergent_raises(spark):
    """An emit-less cycle whose until-predicate never holds must raise
    the max-depth guard, not hang."""
    import pytest as _pytest

    from aws_sdk_pandas_spark.connectors.neptune import execute_gremlin
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    v = _cdf(spark, 
        [("a", "person", "a"), ("b", "person", "b")],
        "`~id` string, `~label` string, name string",
    )
    e = _cdf(spark, 
        [("e1", "knows", "a", "b"), ("e2", "knows", "b", "a")],
        "`~id` string, `~label` string, `~from` string, `~to` string",
    )
    with _pytest.raises(InvalidArgument, match="did not converge"):
        execute_gremlin(
            {"root": ""},
            "g.V('a').repeat(out()).until(hasLabel('software')).count()",
            vertices=v, edges=e,
        )
