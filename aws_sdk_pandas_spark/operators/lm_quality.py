"""N-gram language-model perplexity scoring — the CCNet-style corpus
quality signal (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data": documents are ranked by the
perplexity of a reference-domain LM; boilerplate, gibberish and
wrong-language text score high).  CCNet uses a KenLM 5-gram; this is
the same signal from a smoothed BIGRAM model with unigram context —
deliberately simple enough that every step (training counts, top-k
vocabulary cap, add-alpha scoring) is exact relational algebra, so the
whole train->score pipeline is engine-rederivable (DuckDB hash gate
``docs_lm_perplexity``) and every stage is a plain shuffle:

- **train** = two hash aggregations over the reference slice (unigram
  and bigram counts) + a top-k cap (count-desc, token-asc ties — a
  bounded global sort over at most the distinct-gram count, collected
  nowhere);
- **score** = explode adjacent-token pairs, ONE broadcast left join per
  model table (the capped model is small by construction), and one
  per-document aggregation.  No Python in the hot path, no window over
  an unbounded partition, no driver materialization of anything but
  the model-size knobs.

At 100 TB: training reads only the reference slice; scoring is
embarrassingly parallel (pairs explode locally, model joins broadcast,
the per-doc agg combines map-side).  The top-k cap bounds the
broadcast; raise it and the joins flip to shuffle joins automatically
past the broadcast threshold.

Tokenization is the corpus convention used across this repo's text
operators: lowercase whitespace tokens (``split(trim(text), '\\s+')``),
empty tokens dropped — deliberately reproducible in ANSI SQL.

Reference parity anchor: the reference exposes no LM scorer (its
quality filters are s3.select_query / Athena UDF territory); this is a
beyond-reference training-pipeline operator in the same family as
``textstats.gopher_quality``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: Column) -> Column:
    """Lowercase whitespace tokens, empties dropped (NULL text -> NULL).
    Whole-codegen formulation: lowercasing the STRING before the split
    equals lowercasing per token (case mapping never creates
    whitespace), and a ``\\s``-trimmed non-blank string split on
    ``\\s+`` has no empty tokens — so the per-token transform/filter
    lambdas (which run interpreted) are unnecessary; blank text gets
    the empty array via one guard.  The trim is regexp-based: ``trim``
    strips SPACES only, and a tab-padded document would otherwise leak
    empty tokens."""
    t = F.regexp_replace(text_col, r"^\s+|\s+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(t), r"\s+")
    )


def _pairs(toks: Column) -> Column:
    """Adjacent-token pair structs (fields ``0``/``1``); fewer than 2
    tokens -> empty.  ``arrays_zip`` over two slices stays inside
    whole-stage codegen — the earlier transform/element_at lambda ran
    interpreted and re-evaluated its captured tokenization per element
    (O(tokens^2) per document, measured 7-20x slower end to end).

    Pass a MATERIALIZED column reference (see :func:`_pair_rows`), not
    the raw tokenization expression."""
    return F.when(
        F.size(toks) >= 2,
        F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
        ),
    ).otherwise(F.array().cast("array<struct<`0`:string,`1`:string>>"))


def _pair_rows(df: DataFrame, text_col: str, extra: list[str]) -> DataFrame:
    """(extra..., w1, w2) rows of adjacent token pairs, with the token
    array staged through a real column so the pair expression reads a
    row field instead of re-tokenizing."""
    toked = df.select(*extra, _tokens(F.col(text_col)).alias("__toks"))
    return toked.select(
        *extra, F.explode(_pairs(F.col("__toks"))).alias("__p")
    ).select(
        *extra,
        F.col("__p.0").alias("w1"),
        F.col("__p.1").alias("w2"),
    )


@dataclass(frozen=True)
class NgramLM:
    """A trained bigram model: capped count tables + smoothing constants.

    ``unigrams``: (w1, c1); ``bigrams``: (w1, w2, c2); ``vocab_size`` =
    rows kept in ``unigrams`` (the add-alpha denominator); ``alpha`` =
    the smoothing mass.  Both frames are deterministic (top-k by
    count desc, token asc) so a re-train reproduces the same model.
    The frames come back PERSISTED from :func:`train_bigram_lm` (the
    model is the one artifact every scoring action reuses — without
    caching, each join would replay the train aggregation + global
    top-k sort); call :meth:`unpersist` when done."""

    unigrams: DataFrame
    bigrams: DataFrame
    vocab_size: int
    alpha: float

    def unpersist(self) -> None:
        self.unigrams.unpersist()
        self.bigrams.unpersist()


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_k_unigrams: int = 100_000,
    top_k_bigrams: int = 500_000,
    alpha: float = 0.1,
) -> NgramLM:
    """Train the reference-domain bigram LM: unigram counts over ALL
    tokens of the reference slice, bigram counts over adjacent pairs,
    each capped to its top-k by (count desc, token asc) — the cap
    bounds model (and broadcast) size; everything below the cap falls
    into the add-``alpha`` smoothing mass, which is exactly where rare
    tail grams belong in a quality scorer."""
    if top_k_unigrams < 1 or top_k_bigrams < 1:
        raise ValueError("top_k caps must be >= 1")
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("w1"))
    unigrams = (
        toks.groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .orderBy(F.col("c1").desc(), F.col("w1").asc())
        .limit(top_k_unigrams)
    )
    pair_rows = _pair_rows(df, text_col, [])
    bigrams = (
        pair_rows.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .orderBy(F.col("c2").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_k_bigrams)
    )
    # persist the model: every scoring action joins it, and without the
    # cache each join replays the train aggregation + top-k global sort
    unigrams = unigrams.persist()
    bigrams = bigrams.persist()
    # the vocab size is a model CONSTANT (the smoothing denominator);
    # counting the capped unigram table is O(top_k) and materializes
    # the persisted unigrams as a side effect
    vocab_size = unigrams.count()
    return NgramLM(
        unigrams=unigrams, bigrams=bigrams, vocab_size=vocab_size, alpha=alpha
    )


def perplexity(
    df: DataFrame,
    lm: NgramLM,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "ppl",
) -> DataFrame:
    """Score every document's bigram perplexity under ``lm``:
    ``exp(-avg(ln P(w2|w1)))`` with add-alpha smoothing
    ``P = (c(w1 w2) + a) / (c(w1) + a * V)``.  Also emits
    ``<out_col>_xent`` (the cross-entropy, numerically tamer for
    aggregation) and ``<out_col>_n_bigrams``.  Documents with fewer
    than 2 tokens (or NULL text) keep their row with NULL scores —
    silent row loss on dirty input is the bug class this repo's
    dirty-corpus net exists to catch."""
    if lm.vocab_size < 1:
        raise ValueError("model has an empty vocabulary")
    pairs = _pair_rows(
        df.select(F.col(id_col).alias("__id"), text_col), text_col, ["__id"]
    )
    joined = pairs.join(F.broadcast(lm.bigrams), ["w1", "w2"], "left").join(
        F.broadcast(lm.unigrams), ["w1"], "left"
    )
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(lm.alpha))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(lm.alpha * lm.vocab_size))
    )
    per_doc = joined.groupBy("__id").agg(
        (-F.avg(logp)).alias("__xent"),
        F.count(F.lit(1)).alias("__n"),
    )
    out = df.join(per_doc, F.col(id_col) == F.col("__id"), "left").drop("__id")
    return (
        out.withColumn(out_col, F.exp(F.col("__xent")))
        .withColumnRenamed("__xent", f"{out_col}_xent")
        .withColumnRenamed("__n", f"{out_col}_n_bigrams")
    )


def filter_by_perplexity(
    df: DataFrame,
    lm: NgramLM,
    *,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_unscored: bool = False,
) -> DataFrame:
    """The CCNet-style quality gate: keep documents whose perplexity
    under the reference LM is at most ``max_ppl``.  Documents too short
    to score (under 2 tokens / NULL text) are dropped by default —
    pass ``keep_unscored=True`` to let them through (the caller's
    length filters usually own that decision)."""
    scored = perplexity(df, lm, text_col=text_col, id_col=id_col, out_col="__ppl")
    cond = F.col("__ppl") <= F.lit(float(max_ppl))
    if keep_unscored:
        cond = cond | F.col("__ppl").isNull()
    return scored.where(cond).drop("__ppl", "__ppl_xent", "__ppl_n_bigrams")
