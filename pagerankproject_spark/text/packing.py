"""Sequence packing — assign every document a deterministic global
token offset and the context-window chunk range it lands in when the
corpus is concatenated in a fixed order and cut into fixed-length
training sequences (the standard concatenate-then-chunk LM data prep).

Output per doc: (doc_id, n_tokens, token_offset, first_chunk,
last_chunk) where token_offset is the exclusive prefix sum of n_tokens
in `order_col` order, first_chunk = floor(token_offset / context_len)
and last_chunk = floor((token_offset + max(n_tokens,1) - 1) /
context_len) — an empty doc occupies no tokens and gets first ==
last. The chunk ids tell a writer exactly which training sequences a
document contributes to (and which chunk boundaries split it).

Scale shape: a global prefix sum is the textbook single-partition
window trap (ORDER BY over the whole corpus = one task). This runs it
as a DISTRIBUTED two-phase scan instead:

  1. repartitionByRange(order_col) — Spark range-partitions the corpus
     so partition i holds a contiguous, sorted-by-boundary slice,
  2. per-partition token sums (P rows) are collected and turned into
     per-partition BASE offsets on the driver (P ~ thousands, trivial),
  3. a window partitioned BY PARTITION runs the local cumsum, and
     base + local - n_tokens is the exact global offset.

Every stage is parallel over P; driver traffic is P rows. The
partition id is pinned by materializing it (localCheckpoint) before
it is consumed twice — re-deriving spark_partition_id() in two plans
is not guaranteed consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..text.analysis import token_count_expr

DEFAULT_CONTEXT_LEN = 2048


def pack_offsets(
    docs: DataFrame,
    context_len: int = DEFAULT_CONTEXT_LEN,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """`docs`: (doc_id, text, ...). Exact, order-deterministic; result
    is independent of `num_partitions` (partition-invariance tested)."""
    P = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    d = (
        docs.select(
            F.col(order_col), token_count_expr(F.col("text")).alias("n_tokens")
        )
        .repartitionByRange(P, order_col)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # P-row driver hop: partition sums -> exclusive base offsets.
    # repartitionByRange assigns ranges in ascending pid order, so the
    # bases accumulate in pid order.
    psums = {r["pid"]: r["s"] for r in d.groupBy("pid").agg(F.sum("n_tokens").alias("s")).collect()}
    bases, acc = {}, 0
    for pid in sorted(psums):
        bases[pid] = acc
        acc += psums[pid]
    base_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(bases) for x in (pid, bases[pid])]
        ),
        F.col("pid"),
    ) if bases else F.lit(0)

    w = Window.partitionBy("pid").orderBy(order_col)
    local_end = F.sum("n_tokens").over(w)
    off = (base_expr + local_end - F.col("n_tokens")).alias("token_offset")
    out = d.select(order_col, "n_tokens", off)
    return out.select(
        order_col,
        "n_tokens",
        "token_offset",
        F.floor(F.col("token_offset") / context_len).alias("first_chunk"),
        F.floor(
            (F.col("token_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
            / context_len
        ).alias("last_chunk"),
    )


def doc_chunks(
    docs: DataFrame,
    chunk_len: int = 256,
    stride: int = 192,
    order_col: str = "doc_id",
) -> DataFrame:
    """Per-document sliding-window chunking (the RAG / long-doc
    pretraining splitter): chunk i of a doc covers tokens
    [i*stride, i*stride + chunk_len), emitted while i*stride < n_tokens
    (the final chunks are shorter; overlap = chunk_len - stride).
    Output (doc_id, chunk_id, start_token, chunk_tokens).

    Pure projection + sequence explode — embarrassingly parallel, no
    shuffle at all (the 100 TB shape: chunking rides the corpus scan)."""
    n = token_count_expr(F.col("text"))
    d = docs.select(F.col(order_col), n.alias("n_tokens"))
    idx = F.explode(
        F.when(
            F.col("n_tokens") > 0,
            F.sequence(
                F.lit(0),
                F.floor((F.col("n_tokens") - 1) / stride).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>"))
    )
    out = d.select(order_col, "n_tokens", idx.alias("chunk_id"))
    start = F.col("chunk_id").cast("long") * stride
    return out.select(
        order_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("start_token"),
        F.least(F.lit(chunk_len), F.col("n_tokens") - start).alias(
            "chunk_tokens"
        ),
    )


def sql_doc_chunks(
    token_count_sql: str,
    chunk_len: int = 256,
    stride: int = 192,
    order_col: str = "doc_id",
) -> str:
    return f"""
    with t as (
        select {order_col}, {token_count_sql}::bigint as n_tokens
        from documents
    )
    select {order_col}, i::bigint as chunk_id,
           (i * {stride})::bigint as start_token,
           least({chunk_len}, n_tokens - i * {stride})::bigint
               as chunk_tokens
    from t, unnest(range(0, (n_tokens - 1) // {stride} + 1)) as u(i)
    where n_tokens > 0
    """


def sql_pack_offsets(
    token_count_sql: str,
    context_len: int = DEFAULT_CONTEXT_LEN,
    order_col: str = "doc_id",
) -> str:
    """DuckDB twin: the plain single-window formulation (the oracle can
    afford the one-partition sort that the engine avoids)."""
    return f"""
    with t as (
        select {order_col}, {token_count_sql}::bigint as n_tokens
        from documents
    )
    select {order_col}, n_tokens,
           (sum(n_tokens) over (order by {order_col}
                rows between unbounded preceding and current row)
            - n_tokens)::bigint as token_offset
    from t
    """


def sql_pack_chunks(
    token_count_sql: str,
    context_len: int = DEFAULT_CONTEXT_LEN,
    order_col: str = "doc_id",
) -> str:
    return f"""
    with o as ({sql_pack_offsets(token_count_sql, context_len, order_col)})
    select {order_col}, n_tokens, token_offset,
           (token_offset // {context_len})::bigint as first_chunk,
           ((token_offset + greatest(n_tokens, 1) - 1) // {context_len})::bigint
               as last_chunk
    from o
    """
