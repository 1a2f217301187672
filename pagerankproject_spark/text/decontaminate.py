"""Eval-set decontamination — flag training documents that share word
n-grams with a held-out benchmark set (the GPT-3 appendix-C / Gopher
"test-set overlap" recipe, done set-wise in Spark).

Semantics (mirrored exactly by the DuckDB builder below):

  shingle both sides with word n-grams (dedup/shingles.py definition,
  deduplicated per document), equi-join train shingles against eval
  shingles, and report per training doc the number of DISTINCT shared
  n-grams and the number of DISTINCT eval documents hit. Downstream
  policy (drop the doc, drop the spans, weight it down) composes on
  top; this operator computes the overlap evidence.

Scale shape (100 TB corpus): the benchmark side is tiny (eval suites
are MBs against a corpus of TBs), so its exploded shingle table is
BROADCAST — the scan of the training corpus never shuffles; each task
probes a hash map of eval shingles and only matching (doc_id, shingle,
eval_id) rows reach the final doc_id aggregation. count(distinct) over
those survivors is a standard partial-aggregatable shuffle on doc_id.
With `broadcast_eval=False` (an eval side too big for one executor)
the same plan runs as a shuffle equi-join on the shingle key — hot
boilerplate shingles then behave like the Jaccard inverted index and
can be df-capped upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.shingles import shingles_expr, sql_shingles

DEFAULT_DECONTAM_N = 5


def decontaminate_overlap(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_DECONTAM_N,
    broadcast_eval: bool = True,
) -> DataFrame:
    """`train_docs`: (doc_id, text); `eval_docs`: (doc_id, text).
    Returns (doc_id, overlap_ngrams, eval_docs_hit) — one row per
    CONTAMINATED training doc (zero-overlap docs are absent)."""
    tr = train_docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_expr(F.col("text"), n))
        ).alias("shingle"),
    )
    ev = eval_docs.select(
        F.col("doc_id").alias("eval_id"),
        F.explode(
            F.array_distinct(shingles_expr(F.col("text"), n))
        ).alias("shingle"),
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("overlap_ngrams"),
            F.countDistinct("eval_id").alias("eval_docs_hit"),
        )
    )


def sql_decontaminate_overlap(
    train_where: str, eval_where: str, n: int = DEFAULT_DECONTAM_N
) -> str:
    """DuckDB twin over the `documents` view, same column names."""
    sh = sql_shingles("text", n)
    return f"""
    with tr as (
        select doc_id, unnest(list_distinct({sh})) as shingle
        from documents where {train_where}
    ),
    ev as (
        select doc_id as eval_id, unnest(list_distinct({sh})) as shingle
        from documents where {eval_where}
    )
    select tr.doc_id,
           count(distinct tr.shingle)::bigint as overlap_ngrams,
           count(distinct ev.eval_id)::bigint as eval_docs_hit
    from tr join ev using (shingle)
    group by tr.doc_id
    """
