"""Frequent itemsets: exact counts vs a brute-force python recompute,
support filtering, and rule confidence/lift arithmetic."""

from __future__ import annotations

from itertools import combinations

from aws_sdk_pandas_spark.operators.itemsets import association_rules, frequent_itemsets

BASKETS = {
    1: {"bread", "milk"},
    2: {"bread", "butter", "milk"},
    3: {"bread", "butter"},
    4: {"milk", "eggs"},
    5: {"bread", "milk", "eggs"},
    6: {"butter"},
}


def _rows(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    return spark.createDataFrame(rows, "order_id int, item string")


def test_itemsets_match_brute_force(spark):
    out = frequent_itemsets(
        _rows(spark), basket_col="order_id", item_col="item", min_support=0.3
    ).collect()
    got = {tuple(r.items): r.freq for r in out}

    # brute force over all subsets of size 1..3
    universe = sorted({i for s in BASKETS.values() for i in s})
    want = {}
    for k in (1, 2, 3):
        for combo in combinations(universe, k):
            freq = sum(1 for s in BASKETS.values() if set(combo) <= s)
            if freq / len(BASKETS) >= 0.3:
                want[combo] = freq
    assert got == want
    assert got[("bread",)] == 4 and got[("bread", "milk")] == 3

    # support column arithmetic
    for r in out:
        assert abs(r.support - round(r.freq / len(BASKETS), 6)) < 1e-9


def test_association_rules_confidence_lift(spark):
    rules = association_rules(
        _rows(spark), basket_col="order_id", item_col="item",
        min_support=0.3, min_confidence=0.6,
    ).collect()
    by_rule = {(tuple(r.antecedent), tuple(r.consequent)): r for r in rules}
    r = by_rule[(("milk",), ("bread",))]
    # P(bread|milk) = 3/4; lift = conf / P(bread) = 0.75 / (4/6)
    assert abs(r.confidence - 0.75) < 1e-6
    assert abs(r.lift - 0.75 / (4 / 6)) < 1e-5


def test_sequential_patterns_match_brute_force(spark):
    from itertools import product

    from aws_sdk_pandas_spark.operators.itemsets import sequential_patterns

    SEQS = {
        1: ["view", "click", "purchase"],
        2: ["view", "view", "click"],
        3: ["click", "view", "purchase"],
        4: ["view", "purchase"],
        5: ["click", "click"],
    }
    rows = [(u, i, t) for u, seq in SEQS.items() for i, t in enumerate(seq)]
    df = spark.createDataFrame(rows, "user_id int, step int, event_type string")
    out = sequential_patterns(
        df, sequence_col="user_id", item_col="event_type", order_col="step",
        min_support=0.4, max_pattern_length=2,
    ).collect()
    got = {tuple(r.pattern): r.freq for r in out}

    def contains_sub(seq, pat):
        i = 0
        for x in seq:
            if i < len(pat) and x == pat[i]:
                i += 1
        return i == len(pat)

    universe = ["view", "click", "purchase"]
    want = {}
    import math

    min_count = math.ceil(0.4 * len(SEQS))
    for length in (1, 2):
        for pat in product(universe, repeat=length):
            freq = sum(1 for s in SEQS.values() if contains_sub(s, list(pat)))
            if freq >= min_count:
                want[pat] = freq
    assert got == want
    assert got[("view", "purchase")] == 3  # ordered: view BEFORE purchase
    assert ("purchase", "view") not in got  # reverse order infrequent


def test_item_similarity_matches_brute_force(spark):
    from collections import Counter
    from itertools import combinations
    import math

    from aws_sdk_pandas_spark.operators.itemsets import item_similarity

    baskets = {
        1: ["milk", "bread", "eggs"],
        2: ["milk", "bread"],
        3: ["milk", "eggs", "beer"],
        4: ["bread", "eggs"],
        5: ["beer", "chips"],
        6: ["milk", "bread", "chips", "milk"],   # duplicate row dedups
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    rows.append((None, "milk"))
    rows.append((7, None))
    df = spark.createDataFrame(rows, "basket int, item string")

    got = {
        (r.item_a, r.item_b): r
        for r in item_similarity(
            df, basket_col="basket", item_col="item", min_pairs=2
        ).collect()
    }

    uniq = {b: sorted(set(i)) for b, i in baskets.items()}
    c = Counter(i for items in uniq.values() for i in items)
    pc = Counter()
    for items in uniq.values():
        pc.update(combinations(items, 2))
    nb = len(uniq)
    want = {p: n for p, n in pc.items() if n >= 2}
    assert set(got) == set(want)
    for (a, bb), n in want.items():
        r = got[(a, bb)]
        assert r.n_pair == n
        assert abs(r.cosine - round(n / math.sqrt(c[a] * c[bb]), 6)) < 1e-9
        assert abs(r.lift - round(n * nb / (c[a] * c[bb]), 6)) < 1e-9
        assert abs(r.jaccard - round(n / (c[a] + c[bb] - n), 6)) < 1e-9

    # top_k mode: both directions, ranked by cosine, capped per item
    top = item_similarity(
        df, basket_col="basket", item_col="item", min_pairs=1, top_k=2
    ).collect()
    per = {}
    for r in top:
        per.setdefault(r.item_a, []).append(r)
    for a, rs in per.items():
        assert len(rs) <= 2
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    # symmetric pair appears in both items' neighbor lists at k big enough
    allpairs = item_similarity(
        df, basket_col="basket", item_col="item", min_pairs=1, top_k=100
    ).collect()
    keys = {(r.item_a, r.item_b) for r in allpairs}
    assert all((b2, a2) in keys for a2, b2 in keys)

    # cap_per_basket bounds the hub quadratic: with cap=2 only the
    # lexicographically first two items of each basket pair up
    capped = item_similarity(
        df, basket_col="basket", item_col="item", min_pairs=1, cap_per_basket=2
    ).collect()
    capped_uniq = {b: sorted(set(i))[:2] for b, i in baskets.items()}
    pc2 = Counter()
    for items in capped_uniq.values():
        pc2.update(combinations(items, 2))
    assert {(r.item_a, r.item_b) for r in capped} == set(pc2)
