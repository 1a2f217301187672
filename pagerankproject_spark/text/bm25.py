"""BM25 ranked retrieval over the documents table.

The classic probabilistic ranking function (Robertson & Walker SIGIR
1994; the Okapi BM25 formulation surveyed in Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009 —
public):

    score(q, d) = sum over t in q of
        idf(t) * tf(t,d) * (k1 + 1)
        / (tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl))
    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

This is the search-scoring op the reference's neighbors-only s^p
scorer (reference pagerank.py:329-345, our search/query.py) does NOT
provide: corpus-statistics-weighted relevance over document BODIES
rather than link-structure scores over URL strings.

Scale shape (the inverted index, expressed relationally):
  - one explode + an `isin` literal-set filter keeps only query-term
    postings — the filter runs map-side on the exploded stream, so the
    shuffle carries |postings(q)| rows, not the corpus;
  - tf is a map-side-combinable count on (doc_id, term); df is the
    same table re-aggregated (k rows, broadcast back onto postings);
  - per-doc length dl is one combinable count; N and sum(dl) are one
    scalar aggregate (driver holds two numbers, never rows);
  - per-term scores pivot into FIXED columns via conditional max and
    combine as one fixed-order sum — no window, no sort; the optional
    top-k is a TakeOrderedAndProject.

Cross-engine float determinism (see oracle twin sql_bm25): every input
moment (tf, df, dl, N, sum dl) is an exact integer; k1/b/constants are
literals both engines parse to identical doubles; the score is ONE
fixed-order expression string shared by both engines, rounded once at
the end (round-once convention; ln differs by <= 1 ulp cross-engine,
absorbed by the 6dp round except at non-systematic boundaries — the
unigram_logloss precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import sql_tokens, tokens_expr

ROUND_DP = 6


def _validate(query_terms: list[str], k1: float, b: float) -> None:
    if not query_terms:
        raise ValueError("bm25: query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("bm25: query_terms must be distinct")
    for t in query_terms:
        if not t or t != t.lower() or any(c.isspace() for c in t):
            raise ValueError(
                f"bm25: query term {t!r} must be non-empty, lowercase, "
                "and whitespace-free (tokens are lowercased words)"
            )
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError("bm25: require k1 >= 0 and 0 <= b <= 1")


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Score every document matching >= 1 query term.

    Output: doc_id, matched (long, distinct query terms present),
    score (double, 6dp, descending = more relevant). With top_k, the
    k best rows by (score desc, doc_id asc) — a total order.
    """
    _validate(query_terms, k1, b)

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token"),
    )
    # per-doc length over ALL tokens (not just query terms)
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    totals = dl.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sumdl"),
    ).first()
    n_docs, sumdl = int(totals["n"] or 0), int(totals["sumdl"] or 0)
    if sumdl == 0:
        raise ValueError("bm25: corpus has no tokens")

    postings = toks.filter(F.col("token").isin(query_terms))
    tf = postings.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(
        F.count("*").cast("long").alias("df")
    )

    # ONE fixed-order score expression, mirrored verbatim in sql_bm25
    nd, sd = float(n_docs), float(sumdl)
    idf = F.log(
        (F.lit(nd) - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.col("tf").cast("double") + F.lit(float(k1)) * (
        F.lit(1.0 - b)
        + F.lit(float(b)) * (F.col("dl").cast("double") * F.lit(nd) / F.lit(sd))
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "token",
            (idf * (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / norm).alias(
                "s"
            ),
        )
    )
    # pivot each term's contribution into its own column so the final
    # sum has a FIXED operand order (unordered float sums are
    # addition-order-dependent; this one is not)
    aggs = [
        F.max(F.when(F.col("token") == t, F.col("s"))).alias(f"s_{i}")
        for i, t in enumerate(query_terms)
    ]
    combined = per_term.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("matched"), *aggs
    )
    total = F.coalesce(F.col("s_0"), F.lit(0.0))
    for i in range(1, len(query_terms)):
        total = total + F.coalesce(F.col(f"s_{i}"), F.lit(0.0))
    out = combined.select(
        "doc_id", "matched", F.round(total, ROUND_DP).alias("score")
    )
    if top_k is not None:
        out = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)
    return out


def sql_bm25(
    rel: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> str:
    """DuckDB twin: same moments, same fixed-order expression string."""
    _validate(query_terms, k1, b)
    toks = sql_tokens(f"lower({text_col})")
    terms = ", ".join(f"'{t}'" for t in query_terms)
    s_cols = ",\n           ".join(
        f"max(case when token = '{t}' then s end) as s_{i}"
        for i, t in enumerate(query_terms)
    )
    total = " + ".join(
        f"coalesce(s_{i}, 0.0)" for i in range(len(query_terms))
    )
    limit = (
        f"order by score desc, doc_id asc limit {top_k}" if top_k else ""
    )
    return f"""
    with bm_tok as (select {id_col} as doc_id, unnest({toks}) as token
                    from {rel}),
    bm_dl as (select doc_id, count(*)::bigint as dl from bm_tok group by 1),
    bm_tot as (select count(*)::double as n, sum(dl)::double as sumdl
               from bm_dl),
    bm_tf as (select doc_id, token, count(*)::bigint as tf from bm_tok
              where token in ({terms}) group by 1, 2),
    bm_df as (select token, count(*)::bigint as df from bm_tf group by 1),
    bm_s as (
      select f.doc_id, f.token,
             ln((t.n - d.df::double + 0.5) / (d.df::double + 0.5) + 1.0)
             * (f.tf::double * {k1 + 1.0!r})
             / (f.tf::double + {float(k1)!r} * ({1.0 - b!r}
                + {float(b)!r} * (l.dl::double * t.n / t.sumdl))) as s
      from bm_tf f
      join bm_df d using (token)
      join bm_dl l using (doc_id)
      cross join bm_tot t
    )
    , bm_p as (
      select doc_id, count(*)::bigint as matched,
           {s_cols}
      from bm_s group by doc_id
    )
    select doc_id, matched, round({total}, {ROUND_DP}) as score
    from bm_p
    {limit}
    """


def ql_dirichlet_scores(
    df: DataFrame,
    query_terms: list[str],
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
    "A Study of Smoothing Methods for Language Models Applied to Ad Hoc
    Information Retrieval", SIGIR 2001 — public): the language-model
    counterpart to BM25:

        score(q, d) = sum over t in q of
            ln( (tf(t,d) + mu * cf(t)/|C|) / (dl(d) + mu) )

    with cf(t) the collection frequency and |C| total tokens. Unlike
    BM25, UNMATCHED query terms still contribute smoothing mass
    (tf = 0), so the per-term pivot falls back to the dl-only term —
    every moment (tf, cf, dl, |C|) stays an exact integer and each
    term's contribution is one fixed expression, so the fixed-order
    pivot sum replays bit-exactly in the oracle (sql_ql_dirichlet).

    Output: docs matching >= 1 query term (same support as bm25_scores;
    scores are comparable within the result set because the
    smoothing-only mass depends only on dl): doc_id, matched (long),
    score (double 6dp, higher = more relevant; scores are negative log
    likelihoods summed — closer to 0 is better).

    Scale shape: identical to bm25_scores (map-side postings filter,
    combinable tf/dl/cf, scalar |C|, broadcast per-term stats, no
    window); cf adds one k-row aggregate over the postings.
    """
    _validate(query_terms, 1.0, 0.5)
    if mu <= 0:
        raise ValueError("ql_dirichlet: mu must be > 0")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    c_total = int(
        toks.agg(F.count("*").cast("long").alias("n")).first()["n"] or 0
    )
    if c_total == 0:
        raise ValueError("ql_dirichlet: corpus has no tokens")

    postings = toks.filter(F.col("token").isin(query_terms))
    tf = postings.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    cf = postings.groupBy("token").agg(
        F.count("*").cast("long").alias("cf")
    )
    cf_map = {r["token"]: int(r["cf"]) for r in cf.collect()}

    matched = (
        tf.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("matched"),
            *[
                F.max(F.when(F.col("token") == t, F.col("tf"))).alias(
                    f"tf_{i}"
                )
                for i, t in enumerate(query_terms)
            ],
        )
    )
    scored = matched.join(dl, "doc_id")
    ct = float(c_total)
    total = None
    for i, t in enumerate(query_terms):
        cf_t = float(cf_map.get(t, 0))
        # ln((tf + mu * cf/|C|) / (dl + mu)); tf -> 0 when unmatched.
        # cf(t)=0 (term absent from corpus) contributes ln(0) = -inf;
        # fail fast instead of emitting non-finite scores.
        if cf_t == 0.0:
            raise ValueError(
                f"ql_dirichlet: query term {t!r} absent from the corpus "
                "(zero-probability under the collection model)"
            )
        term = F.log(
            (
                F.coalesce(F.col(f"tf_{i}"), F.lit(0)).cast("double")
                + F.lit(float(mu)) * (F.lit(cf_t) / F.lit(ct))
            )
            / (F.col("dl").cast("double") + F.lit(float(mu)))
        )
        total = term if total is None else total + term
    out = scored.select(
        "doc_id", "matched", F.round(total, ROUND_DP).alias("score")
    )
    if top_k is not None:
        out = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)
    return out


def sql_ql_dirichlet(
    rel: str,
    query_terms: list[str],
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> str:
    """DuckDB twin of ql_dirichlet_scores: the same fixed-order
    expression over the same exact-integer moments (cf/|C| computed by
    subquery instead of literal inlining — identical integer inputs
    give identical doubles)."""
    _validate(query_terms, 1.0, 0.5)
    if mu <= 0:
        raise ValueError("ql_dirichlet: mu must be > 0")
    toks = sql_tokens(f"lower({text_col})")
    terms = ", ".join(f"'{t}'" for t in query_terms)
    tf_cols = ",\n           ".join(
        f"max(case when token = '{t}' then tf end) as tf_{i}"
        for i, t in enumerate(query_terms)
    )
    total = " + ".join(
        f"ln((coalesce(tf_{i}, 0)::double + {float(mu)!r} * "
        f"((select cf from ql_cf where token = '{t}')::double / "
        f"(select n from ql_tot))) / (l.dl::double + {float(mu)!r}))"
        for i, t in enumerate(query_terms)
    )
    limit = (
        f"order by score desc, doc_id asc limit {top_k}" if top_k else ""
    )
    return f"""
    with ql_tok as (select {id_col} as doc_id, unnest({toks}) as token
                    from {rel}),
    ql_dl as (select doc_id, count(*)::bigint as dl from ql_tok group by 1),
    ql_tot as (select count(*)::double as n from ql_tok),
    ql_tf as (select doc_id, token, count(*)::bigint as tf from ql_tok
              where token in ({terms}) group by 1, 2),
    ql_cf as (select token, sum(tf)::bigint as cf from ql_tf group by 1),
    ql_p as (
      select doc_id, count(*)::bigint as matched,
           {tf_cols}
      from ql_tf group by doc_id
    )
    select p.doc_id, p.matched, round({total}, {ROUND_DP}) as score
    from ql_p p join ql_dl l on l.doc_id = p.doc_id
    {limit}
    """
