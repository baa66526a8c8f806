"""Sequence packing for training-data pipelines.

Pre-training data loaders consume fixed-token-budget sequences, so the
curation layer must assign documents to sequences deterministically —
the same corpus must pack identically on every rerun and engine.

Semantics here are *chunk packing*: documents are laid out in a
deterministic order and a sequence boundary falls every ``budget``
tokens of the running total; a document belongs to the sequence in
which it STARTS (downstream loaders truncate/pad the straddle).  This
is a pure prefix-sum, so it distributes as one window aggregation —
unlike first-fit bin packing, which is inherently sequential per bin
and would serialize the corpus through one node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    *,
    by: list[str] | None = None,
    order_cols: list[str] | None = None,
    out_col: str = "seq_id",
) -> DataFrame:
    """Assign each row a sequence id so consecutive rows (in
    ``order_cols`` order, within each ``by`` group) fill ``budget``
    tokens per sequence.

    ``by`` is the shard key (e.g. language, domain, or a hash shard) —
    packing is independent per group, which is what makes it
    distributed: one shuffle on the group key, a running sum within
    each group, no global order.  With ``by=None`` the whole input is
    one group — correct, but single-partition; shard first at scale.

    Returns the input plus ``out_col`` (0-based within each group).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    by = list(by or [])
    order = [F.col(c) for c in (order_cols or [token_col])]
    w = Window.partitionBy(*by).orderBy(*order) if by else Window.orderBy(*order)
    running = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        out_col,
        F.floor((running - F.col(token_col)) / F.lit(budget)).cast("bigint"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_tokens: int = 256,
    overlap_tokens: int = 0,
) -> DataFrame:
    """Sliding token-window chunking — the RAG/embedding-prep primitive:
    each document becomes overlapping windows of ``chunk_tokens``
    whitespace tokens advancing by ``chunk_tokens - overlap_tokens``.

    A trailing window that would contain NO new tokens (its span is
    fully covered by the previous window) is not emitted, so chunk
    count is ``1 + max(0, ceil((n - chunk) / stride))`` — every token
    appears in at least one chunk and the final chunk always ends at
    the document end (LangChain-style semantics, deterministic).

    Returns one row per chunk: ``id_col, chunk_id (0-based),
    start_token, n_tokens, text`` where ``text`` is the space-joined
    window.  Empty documents yield a single empty chunk.

    Scale shape: pure codegen HOFs (split -> sequence -> posexplode ->
    slice/array_join) — a map-only operator, no shuffle, no Python; the
    fan-out is bounded by ~n/stride rows per document, which is exactly
    the output size any chunker must materialize.

    Reference parity: nothing in awswrangler — training-pipeline
    extension family (SURVEY.md §2.10).
    """
    c = int(chunk_tokens)
    ov = int(overlap_tokens)
    if c < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not (0 <= ov < c):
        raise ValueError("overlap_tokens must satisfy 0 <= overlap < chunk_tokens")
    stride = c - ov

    norm = F.trim(F.regexp_replace(F.col(text_col), "[ \\t\\n\\r]+", " "))
    toks = F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
        F.array().cast("array<string>")
    )
    n = F.size(toks)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n - F.lit(c)) / F.lit(float(stride))).cast("int")
    )
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.posexplode(
            F.sequence(F.lit(0), n_chunks - 1)
        ).alias("chunk_id", "__i")
    )
    start = F.col("__i") * stride
    return base.select(
        id_col,
        "chunk_id",
        start.alias("start_token"),
        F.least(F.lit(c), F.size("__toks") - start).alias("n_tokens"),
        F.array_join(F.slice("__toks", start + 1, c), " ").alias(text_col),
    )
