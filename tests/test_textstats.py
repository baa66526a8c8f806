"""benchmark_contamination / tfidf_top_terms semantics."""

from __future__ import annotations

from aws_sdk_pandas_spark.operators.textstats import (
    benchmark_contamination,
    tfidf_top_terms,
)


def test_contamination_flags_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),        # grams: abc bcd cde -> all in eval
            (2, "x y z w v"),        # no overlap
            (3, "a b c q r s"),      # 1 of 4 grams hits -> 0.25 < 0.5
        ],
        "doc_id int, text string",
    )
    eval_df = spark.createDataFrame([(9, "a b c d e f")], "doc_id int, text string")
    out = benchmark_contamination(corpus, eval_df, threshold=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1].n_grams == 3 and rows[1].n_hit == 3 and rows[1].overlap == 1.0


def test_contamination_short_docs_excluded(spark):
    corpus = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    eval_df = spark.createDataFrame([(9, "a b c")], "doc_id int, text string")
    assert benchmark_contamination(corpus, eval_df).count() == 0


def test_tfidf_ranking_and_scores(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana common common"),
            (2, "banana banana common"),
            (3, "cherry common common common"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # doc 1: apple tf=3 wins; common/banana tie on tf -> lower df (banana=2 < common=3)
    assert rows[(1, 1)].term == "apple" and rows[(1, 1)].tf == 3
    assert rows[(1, 2)].term == "common"  # tf=2 beats banana tf=1
    # doc 3: common tf=3 but cherry is rarer; ranking is tf-first
    assert rows[(3, 1)].term == "common"
    assert rows[(3, 2)].term == "cherry"
    # idf of a term present in all docs is ln(1)=0 -> tfidf 0
    assert rows[(3, 1)].tfidf == 0.0
    assert rows[(3, 2)].tfidf > 0


def test_repetition_signals(spark):
    from aws_sdk_pandas_spark.operators.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, 1 distinct, top = a
            (2, "w x y z"),          # all distinct
            (3, "Spam spam ham"),    # case-folded: spam x2, ham x1
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 1
    assert abs(out[1]["dup_token_frac"] - 0.75) < 1e-9
    assert abs(out[1]["top_token_frac"] - 1.0) < 1e-9
    assert out[2]["dup_token_frac"] == 0.0
    assert abs(out[2]["top_token_frac"] - 0.25) < 1e-9
    assert out[3]["n_tokens"] == 3 and out[3]["n_distinct"] == 2
    assert abs(out[3]["top_token_frac"] - round(2 / 3, 6)) < 1e-9


def test_unigram_logprob_ranks_natural_text_higher(spark):
    """A doc of corpus-common tokens scores higher than a doc of hapax
    gibberish; counts are exact."""
    from aws_sdk_pandas_spark.operators.textstats import unigram_logprob_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "zxqv wploc jfkdl mnbpq"),   # all hapax
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.n_tokens, r.logprob) for r in unigram_logprob_score(df).collect()}
    assert got[1][0] == 6 and got[3][0] == 4
    assert got[1][1] > got[3][1]         # common tokens -> higher logprob
    assert got[2][1] > got[3][1]


# --------------------------------------------------------------- chunking
def test_chunk_documents_overlap_and_tail(spark):
    from aws_sdk_pandas_spark.operators.textstats import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # w0..w9
    df = spark.createDataFrame([(1, text), (2, "a b")], "doc_id long, text string")
    out = chunk_documents(df, chunk_words=4, overlap_words=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_words))
    got = [t for _, t, _ in sorted(by_doc[1])]
    # stride 2: starts 0,2,4,6 — the window starting at 6 reaches the end,
    # so no redundant suffix-only chunk follows it
    assert got == ["w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9"]
    # consecutive chunks share exactly the 2-word overlap
    assert got[0].split()[-2:] == got[1].split()[:2]
    # short doc -> one chunk, unpadded
    assert by_doc[2] == [(0, "a b", 2)]


def test_chunk_documents_reconstructs_corpus(spark):
    """Concatenating stride-length prefixes of all chunks (plus the last
    chunk's tail) must reproduce the original text: no word lost at any
    chunk boundary, for any length mod stride."""
    from aws_sdk_pandas_spark.operators.textstats import chunk_documents

    docs = [(i, " ".join(f"t{j}" for j in range(i))) for i in range(1, 40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = chunk_documents(df, chunk_words=7, overlap_words=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text.split()))
    for doc_id, text in docs:
        chunks = [w for _, w in sorted(by_doc[doc_id])]
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c[:4])  # stride = 7-3 = 4
        rebuilt.extend(chunks[-1])
        assert rebuilt == text.split(), doc_id


def test_hashed_ngram_classifier_train_and_score(spark):
    pos_texts = [f"excellent prose with varied vocabulary number {i}" for i in range(30)]
    neg_texts = [f"buy now click here spam spam offer {i}" for i in range(30)]
    pos = spark.createDataFrame([(t,) for t in pos_texts], "text string")
    neg = spark.createDataFrame([(t,) for t in neg_texts], "text string")
    from aws_sdk_pandas_spark.operators.textstats import (
        fit_hashed_ngram_classifier,
        hashed_ngram_score,
    )

    weights, bias = fit_hashed_ngram_classifier(pos, neg, buckets=4096, ngrams=(1, 2))
    docs = spark.createDataFrame(
        [
            (1, "truly excellent prose with varied vocabulary throughout"),
            (2, "click here buy now spam offer"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.score
        for r in hashed_ngram_score(
            docs, weights, bias=bias, buckets=4096, ngrams=(1, 2)
        ).collect()
    }
    assert got[1] > 0.5 > got[2]
    assert 0.0 <= got[3] <= 1.0  # empty doc gets sigmoid(bias)
    assert len(got) == 3


def test_hashed_ngram_score_matches_numpy(spark):
    import hashlib
    import math
    import re as _re

    B = 512
    texts = [(1, "alpha beta gamma"), (2, "beta beta delta"), (3, "")]
    wmap = {i: (0.1 * (i % 7) - 0.3) for i in range(B)}

    def grams(t):
        ws = [w for w in _re.split(r"\s+", t.strip().lower()) if w]
        return ws + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    expected = {}
    for i, t in texts:
        gs = grams(t)
        if not gs:
            expected[i] = 1.0 / (1.0 + math.exp(-0.2))
        else:
            s = sum(wmap[bucket(g)] for g in gs) / len(gs)
            expected[i] = 1.0 / (1.0 + math.exp(-(0.2 + s)))

    from aws_sdk_pandas_spark.operators.textstats import hashed_ngram_score

    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: r.score
        for r in hashed_ngram_score(df, wmap, bias=0.2, buckets=B).collect()
    }
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-12, k


def test_novelty_score_matches_brute_force(spark):
    from aws_sdk_pandas_spark.operators.textstats import novelty_score

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox sat very still today friend"),
        ("c", "completely different words appear in this one here"),
        ("d", "too short"),  # < 3 tokens -> no grams -> zero-count row
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: (r.n_grams, r.n_novel) for r in novelty_score(df, n=3).collect()}

    # brute force in python
    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    gsets = {d: grams(t) for d, t in rows}
    from collections import Counter

    freq = Counter(g for s in gsets.values() for g in s)
    want = {
        d: (len(s), sum(1 for g in s if freq[g] == 1)) for d, s in gsets.items()
    }
    assert got == want
    # the short doc keeps its row (zero grams, NULL novelty) — a missing
    # doc_id would silently drop the doc from an inner-joined pipeline
    assert got["d"] == (0, 0)


def test_summarize_corpus(spark):
    from aws_sdk_pandas_spark.operators.textstats import summarize_corpus

    rows = [
        ("a", "en", "one two three"),
        ("b", "en", "one two three"),      # exact dup of a
        ("c", "en", "ONE  two   three"),   # fingerprint dup (case/ws)
        ("d", "fr", "quatre cinq"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    got = {r.lang: r for r in summarize_corpus(df, lang_col="lang").collect()}
    assert set(got) == {"en", "fr", "__all__"}
    assert got["en"].n_docs == 3 and got["en"].n_dup_docs == 2
    assert got["fr"].n_docs == 1 and got["fr"].n_dup_docs == 0
    assert got["__all__"].n_docs == 4 and got["__all__"].n_tokens == 3 * 3 + 2
    assert got["fr"].p50_chars == len("quatre cinq")

    total_only = summarize_corpus(df).collect()
    assert len(total_only) == 1 and total_only[0].lang == "__all__"
    assert total_only[0].n_docs == 4


def test_summarize_corpus_null_lang_group(spark):
    from aws_sdk_pandas_spark.operators.textstats import summarize_corpus

    rows = [("a", "en", "one two"), ("b", None, "three four"), ("c", None, "five six")]
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    got = {r.lang: r.n_docs for r in summarize_corpus(df, lang_col="lang").collect()}
    # NULL-language subtotal must NOT collide with the grand total
    assert got == {"en": 1, "__unknown__": 2, "__all__": 3}


def test_compression_ratio_separates_boilerplate_from_prose(spark):
    import zlib

    from aws_sdk_pandas_spark.operators.textstats import compression_ratio

    import random
    rng = random.Random(3)
    noise = "".join(chr(rng.randint(33, 126)) for _ in range(2000))
    rows = [
        (1, "menu home about contact " * 200),            # boilerplate
        (2, "The quick brown fox jumps over the lazy dog. "
            "A different sentence follows with new words entirely." * 10),
        (3, noise),                                        # incompressible
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.zlib_ratio for r in compression_ratio(df).collect()}
    assert got[1] < 0.05                 # highly repetitive
    assert 0.1 < got[2] < 0.6            # prose
    assert got[3] > 0.8                  # noise
    assert got[4] is None and got[5] is None
    # exact value matches a direct zlib call
    raw = rows[0][1].encode()
    assert got[1] == round(len(zlib.compress(raw, 6)) / len(raw), 6)


def test_collocations_pmi(spark):
    from aws_sdk_pandas_spark.operators.textstats import collocations

    # "data lake" always together (strong collocation); "the" everywhere
    docs = [
        "the data lake stores the files",
        "query the data lake with the engine",
        "the data lake holds the data lake rows",
        "files and rows and the engine",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    rows = collocations(df, text_col="text", min_count=2, top_k=50).collect()
    got = {(r.w1, r.w2): r for r in rows}

    # serial recompute
    from collections import Counter

    uni, pair = Counter(), Counter()
    nb = 0
    for d in docs:
        ws = d.lower().split()
        uni.update(ws)
        pair.update(zip(ws, ws[1:]))
        nb += len(ws) - 1
    nw = sum(uni.values())
    import math

    want = {
        p: math.log((c / nb) / ((uni[p[0]] / nw) * (uni[p[1]] / nw)))
        for p, c in pair.items()
        if c >= 2
    }
    assert set(got) == set(want)
    for p, v in want.items():
        assert got[p].n_pair == pair[p]
        assert abs(got[p].pmi - round(v, 6)) < 1e-9
    # the dedicated pair outranks the function-word pair
    assert got[("data", "lake")].pmi > got[("the", "data")].pmi
    # ranked descending
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_readability_formulas(spark):
    from aws_sdk_pandas_spark.operators.textstats import readability

    rows = [
        (1, "The cat sat. The dog ran!"),
        (2, "Extraordinarily complicated considerations necessitate comprehensive analysis."),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: r for r in readability(df, id_col="id", text_col="text").collect()}

    import re

    for i, text in rows:
        r = got[i]
        words = len(text.split())
        sents = max(len(re.findall(r"[.!?]+", text)), 1)
        syls = len(re.findall(r"[aeiouy]+", text.lower()))
        assert (r.n_words, r.n_sentences, r.n_syllables) == (words, sents, syls)
        if words:
            fl = 206.835 - 1.015 * words / sents - 84.6 * syls / words
            fk = 0.39 * words / sents + 11.8 * syls / words - 15.59
            assert abs(r.flesch - round(fl, 4)) < 1e-9
            assert abs(r.fk_grade - round(fk, 4)) < 1e-9
        else:
            assert r.flesch is None and r.fk_grade is None
    # simple prose reads easier than the polysyllabic wall
    assert got[1].flesch > got[2].flesch
