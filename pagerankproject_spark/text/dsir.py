"""DSIR data selection: hashed n-gram importance weights (Xie, Santurkar,
Ma & Liang, "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public).

The modern corpus-curation step after cleaning and dedup: score every
RAW document by how much it looks like a small TARGET corpus (the
distribution you want more of), under bag-of-hashed-n-gram unigram
models:

    features(doc) = unigrams + bigrams of whitespace tokens,
                    hashed into B buckets (portable 60-bit md5 hash)
    p_hat[b]      = (count_target[b] + 1) / (total_target + B)   (Laplace)
    q_hat[b]      = (count_raw[b]    + 1) / (total_raw    + B)
    log_w(doc)    = sum over doc features of  ln p_hat[b] - ln q_hat[b]

Selection is then top-k by weight (`dsir_select`) — the deterministic
argmax form of the paper's Gumbel resampling (ties broken by doc id,
so both engines rank identically).

Scale shape: the bucket tables are B rows (thousands) regardless of
corpus size — both model fits are map-side-combinable integer counts,
and scoring is one explode + one BROADCAST join of the B-row
log-ratio table + one combinable per-doc sum. No shuffle carries more
than B rows except the per-doc aggregation itself. The target corpus
is small by construction (that is the method's premise), so its count
pass is trivial.

Determinism: all counts are exact integers; ln() is evaluated on
identical integer-derived doubles in both engines and the per-doc sum
is rounded to 6dp — the same noise-floor argument as
text/pipeline.py::bigram_logloss (cross-engine libm differences are
last-ulp, orders of magnitude under the rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import hash60_expr, sql_hash60, sql_tokens, tokens_expr


def _features_expr(text: Column, lowercase: bool = True) -> Column:
    """Unigrams + bigrams ('a b') of whitespace tokens, one array."""
    toks = tokens_expr(F.lower(text) if lowercase else text)
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigrams = F.filter(
        F.zip_with(
            toks, shifted, lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b))
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(toks, bigrams)


def _bucket_counts(
    docs: DataFrame, n_buckets: int, text_col: str, lowercase: bool
) -> DataFrame:
    return (
        docs.select(
            F.explode(_features_expr(F.col(text_col), lowercase)).alias("f")
        )
        .select(F.pmod(hash60_expr(F.col("f")), F.lit(n_buckets)).alias("b"))
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-raw-doc importance weight under hashed-n-gram models.

    Output: (doc_id, n_features long, log_w double 6dp). Documents
    with no tokens have zero features and log_w = 0.
    """
    if n_buckets < 2:
        raise ValueError("dsir_weights: n_buckets must be >= 2")
    tgt = _bucket_counts(target_docs, n_buckets, text_col, lowercase)
    raw = _bucket_counts(raw_docs, n_buckets, text_col, lowercase)
    t_total = tgt.agg(F.sum("cnt")).collect()[0][0] or 0
    r_total = raw.agg(F.sum("cnt")).collect()[0][0] or 0

    ratio = (
        tgt.select(F.col("b"), F.col("cnt").alias("tc"))
        .join(raw.select(F.col("b"), F.col("cnt").alias("rc")), "b", "full")
        .select(
            "b",
            (
                F.log(F.coalesce("tc", F.lit(0)) + 1)
                - F.log(F.lit(float(t_total + n_buckets)))
                - F.log(F.coalesce("rc", F.lit(0)) + 1)
                + F.log(F.lit(float(r_total + n_buckets)))
            ).alias("lr"),
        )
    )
    # buckets unseen in BOTH corpora never occur in any doc, so the
    # full-outer join's support is exactly the union of seen buckets
    scored = (
        raw_docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(
                _features_expr(F.col(text_col), lowercase)
            ).alias("f"),
        )
        .select(
            "doc_id",
            F.when(
                F.col("f").isNotNull(),
                F.pmod(hash60_expr(F.col("f")), F.lit(n_buckets)),
            ).alias("b"),
        )
        .join(F.broadcast(ratio), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("b")).cast("long").alias("n_features"),
            F.round(
                F.coalesce(F.sum("lr"), F.lit(0.0)), 6
            ).alias("log_w"),
        )
    )
    return scored


def dsir_select(weights: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k selection by (log_w desc, doc_id asc)."""
    return weights.orderBy(F.desc("log_w"), F.asc("doc_id")).limit(k)


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------

def _sql_features(rel: str, id_col: str, text_col: str, lowercase: bool) -> str:
    """(doc_id, f) rows: unigrams + bigrams via pos self-join."""
    text = f"lower({text_col})" if lowercase else text_col
    toks = sql_tokens(text)
    return f"""
    select {id_col} as doc_id, unnest({toks}) as f from {rel}
    union all
    select a.doc_id, a.f || ' ' || c.f
    from (
      select {id_col} as doc_id,
             unnest(range(1, len({toks}) + 1)) as pos,
             unnest({toks}) as f
      from {rel}
    ) a
    join (
      select {id_col} as doc_id,
             unnest(range(1, len({toks}) + 1)) as pos,
             unnest({toks}) as f
      from {rel}
    ) c on c.doc_id = a.doc_id and c.pos = a.pos + 1
    """


def sql_dsir_weights(
    raw_rel: str,
    target_rel: str,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> str:
    """Chained-CTE twin; identical integer counts, hashing, smoothing
    and 6dp rounding. `raw_rel` / `target_rel` are relation names (or
    CTE names the caller prefixed)."""
    B = n_buckets
    bkt = f"({sql_hash60('f')} % {B})"
    return f"""
dsir_tf as materialized (
  select {bkt} as b, count(*)::bigint as cnt
  from ({_sql_features(target_rel, id_col, text_col, lowercase)})
  group by 1
),
dsir_rf as materialized (
  select {bkt} as b, count(*)::bigint as cnt
  from ({_sql_features(raw_rel, id_col, text_col, lowercase)})
  group by 1
),
dsir_tot as (
  select (select coalesce(sum(cnt), 0) from dsir_tf) as tt,
         (select coalesce(sum(cnt), 0) from dsir_rf) as rt
),
dsir_lr as materialized (
  select coalesce(t.b, r.b) as b,
         ln(coalesce(t.cnt, 0) + 1) - ln((select tt from dsir_tot) + {B})
         - ln(coalesce(r.cnt, 0) + 1) + ln((select rt from dsir_tot) + {B})
             as lr
  from dsir_tf t full outer join dsir_rf r on t.b = r.b
),
dsir_doc as (
  select d.doc_id, {bkt} as b
  from ({_sql_features(raw_rel, id_col, text_col, lowercase)}) d(doc_id, f)
)
select r.{id_col} as doc_id,
       count(d.b)::bigint as n_features,
       round(coalesce(sum(l.lr), 0.0), 6) as log_w
from {raw_rel} r
left join dsir_doc d on d.doc_id = r.{id_col}
left join dsir_lr l on l.b = d.b
group by 1"""
