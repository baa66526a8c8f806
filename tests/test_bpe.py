"""BPE: merge learning matches an independent in-test reference on the
same word counts, tokenize->decode is the identity, merges actually
compress, and the whole path is deterministic."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    decode_bpe,
    train_bpe,
    word_frequencies,
)

CORPUS = [
    ("a", "the lowest lowland lowers slowly below the glowing low sun"),
    ("b", "low lower lowest newest newer new news knows lows below"),
    ("c", "the newest news flows slowly over the lowest lowland"),
    ("d", "glowing flowing slowing knowing lowing snowing rowing"),
]


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent re-derivation of Sennrich's algorithm for the test."""
    vocab = {tuple(w) + (END_OF_WORD,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        nv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def test_train_matches_reference_implementation(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    got = train_bpe(df, n_merges=30, min_freq=1)

    wf = Counter()
    for _, t in CORPUS:
        wf.update(t.lower().split())
    want = _reference_bpe(dict(wf), 30)
    assert got == want
    assert len(got) > 5  # the corpus supports real merges


def test_word_frequencies_top_k_and_min_freq(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    rows = {r["word"]: r["freq"] for r in word_frequencies(df, min_freq=2, max_words=5).collect()}
    wf = Counter()
    for _, t in CORPUS:
        wf.update(t.lower().split())
    want = dict(sorted(((w, f) for w, f in wf.items() if f >= 2),
                       key=lambda kv: (-kv[1], kv[0]))[:5])
    assert rows == want


def test_apply_roundtrip_and_compression(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    merges = train_bpe(df, n_merges=40, min_freq=1)
    out = apply_bpe(df, merges).collect()
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in out}
    for doc_id, text in CORPUS:
        toks = by_id[doc_id]
        assert decode_bpe(toks) == " ".join(text.lower().split())
        n_words = len(text.split())
        n_chars_with_markers = len(text.replace(" ", "")) + n_words
        # merges learned -> strictly fewer symbols than characters,
        # never fewer than one token per word
        assert n_words <= len(toks) < n_chars_with_markers

    # zero merges degenerates to char+marker segmentation
    raw = apply_bpe(df, []).collect()
    for r in raw:
        text = dict(CORPUS)[r["doc_id"]]
        assert len(r["bpe_tokens"]) == len(text.replace(" ", "")) + len(text.split())


def test_deterministic_across_runs(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    m1 = train_bpe(df, n_merges=25, min_freq=1)
    m2 = train_bpe(df, n_merges=25, min_freq=1)
    assert m1 == m2


def test_sf_corpus_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=60)
    assert len(merges) == 60
    out = apply_bpe(docs, merges).select(
        "doc_id", F.size("bpe_tokens").alias("n_bpe")
    )
    assert out.where(F.col("n_bpe") <= 0).count() == 0
    assert out.count() == docs.count()


def test_unicode_whitespace_consistent_with_jvm_split(spark):
    """U+00A0 is NOT a word boundary on the JVM side (Java \\s is
    ASCII); apply_bpe must agree, or the tokenizer trains and applies on
    different words."""
    df = spark.createDataFrame(
        [("a", "foo bar baz"), ("b", "foo bar qux")],
        "doc_id string, text string",
    )
    wf = {r["word"]: r["freq"] for r in word_frequencies(df, min_freq=1).collect()}
    assert wf.get("foo bar") == 2  # one word, not two

    toks = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(df, []).collect()}
    # zero merges -> chars + one end-of-word marker PER WORD: 2 words each
    assert toks["a"].count(END_OF_WORD) == 2
    assert decode_bpe(toks["a"]) == "foo bar baz"


def test_save_load_bpe_roundtrip(spark, tmp_path):
    from aws_sdk_pandas_spark.operators.bpe import load_bpe, save_bpe

    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    merges = train_bpe(df, n_merges=20, min_freq=1)
    p = str(tmp_path / "bpe")
    save_bpe(merges, p)
    loaded = load_bpe(spark, p)
    assert loaded == merges
    a = apply_bpe(df, merges).collect()
    b = apply_bpe(df, loaded).collect()
    assert sorted((r.doc_id, tuple(r.bpe_tokens)) for r in a) == sorted(
        (r.doc_id, tuple(r.bpe_tokens)) for r in b
    )


def test_vocab_stats_and_fragmented_words(spark):
    from aws_sdk_pandas_spark.operators.bpe import (
        _encode_word,
        fragmented_words,
        train_bpe,
        vocab_stats,
    )

    # train on a repetitive corpus so common words fuse into few tokens
    train = spark.createDataFrame(
        [("the cat sat on the mat the cat sat again",)] * 30, "text string"
    )
    merges = train_bpe(train, n_merges=60, min_freq=2)

    got = vocab_stats(train, merges).collect()[0]
    # serial recompute over the known word multiset
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    words = ("the cat sat on the mat the cat sat again".split()) * 30
    toks = [_encode_word(w, ranks) for w in words]
    n_tokens = sum(len(t) for t in toks)
    from aws_sdk_pandas_spark.operators.bpe import END_OF_WORD
    n_char = sum(
        1 for t in toks for x in t if len(x.replace(END_OF_WORD, "")) <= 1
    )
    assert got.n_words == len(words)
    assert got.n_tokens == n_tokens
    assert abs(got.fertility - round(n_tokens / len(words), 6)) < 1e-9
    assert abs(got.char_token_rate - round(n_char / n_tokens, 6)) < 1e-9
    # in-domain text tokenizes compactly
    assert got.fertility < 2.0

    # a shifted corpus (unseen vocabulary) fragments: fertility rises
    shifted = spark.createDataFrame(
        [("zyxwvut qponmlk jihgfed zyxwvut qponmlk",)] * 10, "text string"
    )
    far = vocab_stats(shifted, merges).collect()[0]
    assert far.fertility > got.fertility + 1.0
    assert far.char_token_rate > got.char_token_rate

    frag = fragmented_words(shifted, merges, top_k=3).collect()
    # tie on (n_tokens, freq) breaks lexicographically
    assert {r.word for r in frag[:2]} == {"zyxwvut", "qponmlk"}
    assert all(r.n_tokens >= 7 for r in frag[:2])   # shattered to chars
    assert frag[0].tokens == _encode_word(frag[0].word, ranks)
