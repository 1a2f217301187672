"""TF-IDF top terms per document — classic corpus feature extraction
(keyword signatures for search indexing, near-dup triage, topic
bucketing of training data).

Definitions (mirrored exactly in the DuckDB builder):

  tf(d, t)  = occurrences of token t in doc d (whitespace tokens of
              lower(text), the engine-wide tokenizer)
  df(t)     = number of docs containing t
  idf(t)    = ln((N + 1) / (df + 1)) + 1      (smoothed, always > 0)
  score     = tf * idf, ROUNDED to 6dp before ranking — raw float
              ordering is last-ulp noise between ln implementations;
              ties break on the term string (the search_top10 lesson)

Output: top-k terms per doc, (doc_id, term, tf, score, pos).

Scale shape: explode -> (doc, term) count is one partial-aggregatable
shuffle; df is a second count over the same rows keyed by term (hot
stopword terms partial-aggregate away); N is a scalar; the tf-df join
keys on term (vocabulary-sized right side — broadcastable when the
vocab fits, hinted automatically by AQE otherwise); per-doc top-k is a
row_number window partitioned by doc — no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import sql_tokens, tokens_expr


def tfidf_topterms(docs: DataFrame, k: int = 3) -> DataFrame:
    toks = docs.select(
        "doc_id",
        F.explode(tokens_expr(F.lower(F.col("text")))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("doc_id", "term", "tf", "score", "pos")
    )


def sql_tfidf_topterms(k: int = 3) -> str:
    toks = sql_tokens("lower(text)")
    return f"""
    with toks as (
        select doc_id, unnest({toks}) as term from documents
    ),
    tf as (
        select doc_id, term, count(*)::bigint as tf
        from toks group by 1, 2
    ),
    df as (select term, count(*) as df from tf group by 1),
    n as (select count(*)::double as n_docs from documents),
    scored as (
        select tf.doc_id, tf.term, tf.tf,
               round(tf.tf * (ln((n.n_docs + 1) / (df.df + 1)) + 1), 6)
                   as score
        from tf join df using (term) cross join n
    )
    select doc_id, term, tf, score, pos from (
        select *, row_number() over (
            partition by doc_id order by score desc, term asc
        )::int as pos
        from scored
    ) where pos <= {k}
    """
