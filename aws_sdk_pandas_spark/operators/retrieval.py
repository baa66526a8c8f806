"""Ranked text retrieval: BM25 scoring and reciprocal-rank fusion.

The RAG retrieval pair the reference delegates to OpenSearch
(awswrangler/opensearch/_read.py:156 ``search`` ships the query DSL to
the service, whose default relevance IS BM25; :221 ``search_by_sql``).
Spark-first, BM25 is three joins over one exploded-token pass, and
hybrid (keyword + vector) retrieval is a rank-level merge of this and
``operators/similarity.knn_brute_force`` — no service, no UDF.

Scale shape (Robertson-Sparck Jones BM25, k1/b defaults per the
Okapi/Lucene convention):
- ONE pass explodes tokens and filters to the query terms MAP-SIDE —
  the shuffle carries only (doc, query-term) hits, never the corpus
  vocabulary.
- doc-frequency per term is a <=|Q|-row aggregate, corpus size and
  average doc length a 1-row aggregate; both broadcast back (AQE
  picks BroadcastHashJoin), so nothing driver-side and the plan stays
  lazy end-to-end.
- top-k compiles to TakeOrderedAndProject (per-partition heaps merged
  on the driver), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms:
    ``id_col, score`` (rounded to 6), descending; only documents
    containing at least one query term appear.  Terms are matched on
    lower-cased whitespace tokens (``functions/text.tokens``).

    ``score(D,Q) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*|D|/avgdl))``
    with the Lucene idf ``ln(1 + (N-n_t+.5)/(n_t+.5))``.
    """
    from aws_sdk_pandas_spark.functions.text import tokens

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t.lower() for t in query_terms]

    # persist the query-filtered posting rows (bounded by docs x |Q|):
    # the tf and document-frequency aggregations both consume them, and
    # unpersisted each re-tokenized the whole corpus (3 full text scans
    # in one executed plan, tools/scan_count_audit.py).  The corpus-stats
    # pass keeps its own lineage untouched (float avgdl must aggregate
    # the same way as before).  2 text passes = the floor without caching
    # the corpus itself.  Lifetime is caller-owned.
    toks = (
        docs.select(
            F.col(id_col),
            F.size(tokens(text_col)).alias("__dl"),
            F.explode(F.transform(tokens(text_col), lambda t: F.lower(t))).alias("__term"),
        )
        .where(F.col("__term").isin(q))
        .persist()
    )

    # per-(doc, term) frequency; dl rides along (constant within a doc)
    tf = toks.groupBy(id_col, "__term").agg(
        F.count("*").alias("__tf"), F.first("__dl").alias("__dl")
    )
    # <= |Q| rows; broadcast back
    dfreq = toks.groupBy("__term").agg(
        F.countDistinct(id_col).alias("__nt")
    )
    # 1-row corpus stats; cross-join broadcast keeps the plan lazy
    stats = docs.select(
        F.count("*").alias("__n"), F.avg(F.size(tokens(text_col))).alias("__avgdl")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__nt") + F.lit(0.5)) / (F.col("__nt") + F.lit(0.5))
    )
    tf_part = (
        F.col("__tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("__tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
    )
    out = (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    return out.limit(top_k) if top_k is not None else out


def rrf_fuse(
    frames: list[DataFrame],
    *,
    id_col: str = "doc_id",
    k: int = 60,
    ascending: list[bool] | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of ranked
    result lists: each input frame carries either an explicit 1-based
    ``rank`` column, or a score in its SECOND column from which the
    rank is derived (descending by default; set ``ascending[i]`` True
    for distance-like scores where smaller is better — ties broken by
    id, so ranks are engine-reproducible).  Fused
    ``score = sum_i 1/(k + rank_i)`` over the lists containing the id;
    returns ``id_col, rrf_score, n_lists`` descending.

    Rank-level fusion needs no score calibration between modalities —
    exactly why it's the standard keyword+vector hybrid.  Each list is
    typically already top-k (kilobytes), so the rank windows and the
    outer join run on broadcast-sized inputs.
    """
    from pyspark.sql.window import Window

    if not frames:
        raise ValueError("frames must be non-empty")
    asc = ascending or [False] * len(frames)
    scored = []
    for i, f in enumerate(frames):
        if "rank" not in f.columns:
            score_col = [c for c in f.columns if c != id_col][0]
            order = F.col(score_col).asc() if asc[i] else F.col(score_col).desc()
            f = f.withColumn(
                "rank",
                F.row_number().over(Window.orderBy(order, F.col(id_col).asc())),
            )
        scored.append(
            f.select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias(f"__s{i}"),
            )
        )
    out = scored[0]
    for nxt in scored[1:]:
        out = out.join(nxt, id_col, "full_outer")
    score_cols = [F.coalesce(F.col(f"__s{i}"), F.lit(0.0)) for i in range(len(scored))]
    present = [
        F.when(F.col(f"__s{i}").isNotNull(), 1).otherwise(0) for i in range(len(scored))
    ]
    fused = (
        out.withColumn("rrf_score", F.round(sum(score_cols[1:], score_cols[0]), 6))
        .withColumn("n_lists", sum(present[1:], present[0]))
        .select(id_col, "rrf_score", "n_lists")
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    )
    return fused.limit(top_k) if top_k is not None else fused


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    *,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Ranked-retrieval evaluation per query — the IR scorecard a RAG
    index needs before it ships: ``precision_at_k``, ``recall_at_k``
    (denominator = ALL judged-relevant docs for the query, retrieved or
    not), ``mrr_at_k`` (reciprocal of the first relevant rank within
    k), and graded ``ndcg_at_k`` (DCG with (2^rel - 1)/log2(rank+1)
    gains against the ideal ordering of the query's judgments).

    ``results`` is the ranked list (query, doc, rank — 1-based);
    ``qrels`` the judgments (query, doc, graded rel >= 0; unjudged
    retrieved docs count rel 0).  Queries with NO relevant judgments
    get NULL recall/ndcg (0/0 is undefined, not zero — dropping or
    zeroing them silently is how leaderboards lie).  Both inputs are
    expected unique per (query, doc) — duplicate judgment rows would
    fan out the join and duplicate result rows double-count, the same
    contract trec_eval enforces; dedupe upstream if your lists can
    repeat.

    Scale shape: one left join of the (already top-k-bounded) results
    against the judgments, windows partitioned per query over at most
    k rows, one aggregation per side — never a cross join; macro
    averages are one more tiny aggregation away.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    res = results.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).cast("long").alias("__rank"),
    ).where(F.col("__rank") <= k)
    judg = qrels.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rel_col).cast("double").alias("__rel"),
    )
    joined = res.join(judg, ["__q", "__d"], "left").withColumn(
        "__rel", F.coalesce(F.col("__rel"), F.lit(0.0))
    )
    per_q = joined.groupBy("__q").agg(
        F.sum((F.col("__rel") > 0).cast("int")).alias("__hits"),
        F.min(F.when(F.col("__rel") > 0, F.col("__rank"))).alias("__first"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("__rel")) - 1)
            / F.log2(F.col("__rank") + 1)
        ).alias("__dcg"),
    )
    ideal_w = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__d").asc()
    )
    ideal = (
        judg.withColumn("__irank", F.row_number().over(ideal_w))
        .groupBy("__q")
        .agg(
            F.sum((F.col("__rel") > 0).cast("long")).alias("__n_rel"),
            F.sum(
                F.when(
                    (F.col("__irank") <= k) & (F.col("__rel") > 0),
                    (F.pow(F.lit(2.0), F.col("__rel")) - 1)
                    / F.log2(F.col("__irank") + 1),
                ).otherwise(0.0)
            ).alias("__idcg"),
        )
    )
    out = per_q.join(ideal, "__q", "full_outer").select(
        F.col("__q").alias(query_col),
        F.round(
            F.coalesce(F.col("__hits"), F.lit(0)) / F.lit(float(k)), 6
        ).alias("precision_at_k"),
        F.round(
            F.when(
                F.col("__n_rel") > 0,
                F.coalesce(F.col("__hits"), F.lit(0)) / F.col("__n_rel"),
            ),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(
                F.when(F.col("__first").isNotNull(), 1.0 / F.col("__first")),
                F.lit(0.0),
            ),
            6,
        ).alias("mrr_at_k"),
        F.round(
            F.when(
                F.col("__idcg") > 0,
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"),
            ),
            6,
        ).alias("ndcg_at_k"),
    )
    return out
