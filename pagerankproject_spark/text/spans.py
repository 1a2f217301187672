"""Exact-substring duplication signal (Lee, Ippolito et al. 2021,
"Deduplicating Training Data Makes Language Models Better" — public).

The paper's ExactSubstr dedup finds token spans that occur more than
once ANYWHERE in the corpus (its suffix-array implementation is a
single-machine program). The Spark-first re-expression is the rolling
k-token window: a document occurrence is *duplicated* iff its k-token
span (joined on single spaces) appears at least twice in the whole
corpus — in another document or at another position of the same one.
Per document the operator reports window totals, duplicated-window
counts, and the duplicated fraction: the signal a training-data
pipeline thresholds on (or feeds into span-stripping).

Scale shape (the reason this form is the 100-TB path where a suffix
array is not):

* Window generation is a zero-shuffle explode — `transform` over a
  `sequence` with `slice`, all JVM whole-stage codegen; output rows ==
  corpus token count, linear.
* The only shuffle keys are md5 fingerprints — uniformly distributed
  by construction, so no skew salting is ever needed, and both
  aggregations (per-document multiplicity, corpus total) are map-side
  combinable. A natural-language corpus's top span frequency is
  bounded by document count, not token count.
* md5 is used (not xxhash64) because DuckDB computes the identical
  digest, making the contract comparison exact; a production deploy
  would switch to `F.xxhash64` for 8-byte shuffle keys — the plan
  shape is unchanged.

Cross-engine float note: dup_fraction is one integer/integer double
division rounded once (round-6), per the repo's round-once convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import sql_tokens, tokens_expr

ROUND = 6


def duplicate_span_stats(docs: DataFrame, k: int = 8) -> DataFrame:
    """Per-document exact-substring duplication stats.

    Returns (doc_id, n_windows, n_dup_windows, dup_fraction): rolling
    k-token windows, windows whose span text occurs >= 2 times in the
    corpus, and their ratio (0.0 for documents shorter than k tokens).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = docs.select("doc_id", tokens_expr(F.col("text")).alias("toks"))
    wins = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - k + 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("win"),
    ).select("doc_id", F.md5("win").alias("h"))
    per = wins.groupBy("doc_id", "h").agg(F.count("*").alias("m"))
    tot = per.groupBy("h").agg(F.sum("m").alias("tot"))
    stats = (
        per.join(tot, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_windows"),
            F.sum(F.when(F.col("tot") > 1, F.col("m")).otherwise(F.lit(0))).alias(
                "n_dup"
            ),
        )
    )
    return (
        docs.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("n_dup").cast("double") / F.col("n_windows"), ROUND)
            )
            .alias("dup_fraction"),
        )
    )


def sql_duplicate_span_stats(k: int = 8, docs_rel: str = "documents") -> str:
    """DuckDB twin: same tokens (sql_tokens parity), same md5 window
    fingerprints, same >=2-total rule, same round-once division."""
    return f"""
sp_toks as (
  select doc_id, {sql_tokens("text")} as t from {docs_rel}
),
sp_wins as (
  select doc_id, md5(array_to_string(t[i.i : i.i + {k - 1}], ' ')) as h
  from sp_toks, unnest(range(1, len(t) - {k} + 2)) as i(i)
  where len(t) >= {k}
),
sp_per as (select doc_id, h, count(*)::bigint as m from sp_wins group by 1, 2),
sp_tot as (select h, sum(m)::bigint as tot from sp_per group by 1),
sp_stats as (
  select p.doc_id,
         sum(m)::bigint as n_windows,
         sum(case when tot > 1 then m else 0 end)::bigint as n_dup
  from sp_per p join sp_tot t using (h)
  group by 1
)
select d.doc_id,
       coalesce(s.n_windows, 0)::bigint as n_windows,
       coalesce(s.n_dup, 0)::bigint as n_dup_windows,
       case when coalesce(s.n_windows, 0) = 0 then 0.0
            else round(s.n_dup::double / s.n_windows, {ROUND}) end as dup_fraction
from {docs_rel} d left join sp_stats s using (doc_id)"""


# ---------------------------------------------------------------------------
# Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
# "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
# algorithm, public). Guarantee: every w consecutive k-gram hashes
# contribute at least one selected fingerprint, and any shared span of
# length >= k + w - 1 tokens is caught by a shared fingerprint — at
# ~1/w the fingerprint density of keeping every window.
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 4
) -> DataFrame:
    """Winnowed fingerprint set per document: from every window of `w`
    consecutive k-token-gram hashes select the MINIMUM hash, breaking
    ties by RIGHTMOST position (the paper's robust-winnowing tie rule,
    via one min(struct(hash, -pos)) — combinable, no window function);
    the union of selections, deduplicated, is the document's sketch.

    Output: doc_id, pos (0-based k-gram position), fp (60-bit portable
    hash, long). Documents shorter than k tokens emit nothing; a
    document with fewer than w k-grams emits the minimum of one
    all-gram window (so every fingerprintable doc has >= 1 row).

    Scale shape: gram generation is the zero-shuffle explode of
    duplicate_span_stats; window membership is a bounded x w explode
    (w is a small constant); selection is ONE map-side-combinable
    min(struct) keyed by (doc_id, window) — uniform keys; the final
    distinct is keyed by (doc_id, pos). Downstream, matching sketches
    join on fp exactly like the shingle inverted index.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    base = docs.select("doc_id", tokens_expr(F.col("text")).alias("toks"))
    grams = base.select(
        "doc_id",
        (F.size("toks") - F.lit(k) + 1).alias("m"),
        F.posexplode(
            F.when(
                F.size("toks") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - k + 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gpos", "gram"),
    ).select(
        "doc_id",
        "m",
        "gpos",
        F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10)
        .cast("long")
        .alias("fp"),
    )
    wins = grams.select(
        "doc_id",
        "gpos",
        "fp",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.col("gpos") - F.lit(w) + 1),
                F.least(F.col("gpos"), F.greatest(F.lit(0), F.col("m") - F.lit(w))),
            )
        ).alias("wid"),
    )
    sel = wins.groupBy("doc_id", "wid").agg(
        F.min(F.struct("fp", (-F.col("gpos")).alias("npos"))).alias("s")
    )
    return (
        sel.select("doc_id", (-F.col("s.npos")).alias("pos"), F.col("s.fp").alias("fp"))
        .distinct()
    )


def sql_winnow_fingerprints(
    docs_rel: str = "documents", k: int = 4, w: int = 4
) -> str:
    """DuckDB twin: same grams, same window membership (range lateral),
    rightmost-min selection via row_number."""
    toks = sql_tokens("text")
    return f"""
    with wf_base as (
        select doc_id, {toks} as l from {docs_rel}
    ),
    wf_grams as (
        select doc_id, len(l) - {k} + 1 as m, i - 1 as gpos,
               ('0x' || substr(md5(array_to_string(l[i : i + {k} - 1], ' ')), 1, 15))::bigint as fp
        from wf_base, unnest(range(1, greatest(len(l) - {k} + 1, 0) + 1)) u(i)
    ),
    wf_wins as (
        select doc_id, gpos, fp, wid
        from wf_grams,
             unnest(range(greatest(0, gpos - {w} + 1),
                          least(gpos, greatest(0, m - {w})) + 1)) v(wid)
    ),
    wf_sel as (
        select doc_id, gpos, fp,
               row_number() over (partition by doc_id, wid
                                  order by fp asc, gpos desc) as rn
        from wf_wins
    )
    select distinct doc_id, gpos as pos, fp
    from wf_sel where rn = 1
    """


def winnow_match_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 3,
    df_cap: int = 50,
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints — MOSS's actual
    match-detection step (Schleimer, Wilkerson & Aiken 2003 §4: two
    documents sharing a run of text longer than the guarantee
    threshold MUST share a selected fingerprint, so the sketch join
    finds every sufficiently long overlap).

    Pipeline: winnow_fingerprints -> distinct (doc_id, fp) sketch ->
    DF-CAP (fingerprints present in more than `df_cap` documents are
    dropped before the join — boilerplate/common phrases are exactly
    the hot keys that would square the candidate set; the same
    hot-shingle skew bound as dedup/jaccard.py) -> fp-keyed self-join
    (a < b, never all-pairs) -> pairs with >= `min_shared` shared
    fingerprints.

    Output: a, b (doc ids, a < b), shared (long), score (double 6dp =
    shared / min(|sketch_a|, |sketch_b|) — a containment-style
    normalization so a small doc fully inside a big one scores ~1).
    """
    if min_shared < 1:
        raise ValueError("winnow_match_pairs: min_shared must be >= 1")
    fps = (
        winnow_fingerprints(docs, k=k, w=w)
        .select("doc_id", "fp")
        .distinct()
    )
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("fp")
    )
    fps = fps.join(rare, "fp", "left_semi").persist()
    sizes = fps.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    pairs = (
        fps.alias("x")
        .join(fps.alias("y"), "fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    out = (
        pairs.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a", "b", "shared",
            F.round(
                F.col("shared") / F.least("na", "nb"), 6
            ).alias("score"),
        )
    )
    return out


def sql_winnow_match_pairs(
    docs_rel: str = "documents",
    k: int = 4,
    w: int = 4,
    min_shared: int = 3,
    df_cap: int = 50,
) -> str:
    """DuckDB twin of winnow_match_pairs over the same sketch CTE."""
    inner = sql_winnow_fingerprints(docs_rel, k=k, w=w)
    return f"""
    with wmp_sketch as (
        select distinct doc_id, fp from ({inner})
    ),
    wmp_rare as (
        select fp from wmp_sketch group by fp having count(*) <= {df_cap}
    ),
    wmp_fps as (
        select s.doc_id, s.fp from wmp_sketch s
        join wmp_rare r on r.fp = s.fp
    ),
    wmp_sizes as (
        select doc_id, count(*)::bigint as n from wmp_fps group by doc_id
    ),
    wmp_pairs as (
        select x.doc_id as a, y.doc_id as b, count(*)::bigint as shared
        from wmp_fps x join wmp_fps y on x.fp = y.fp and x.doc_id < y.doc_id
        group by 1, 2
        having count(*) >= {min_shared}
    )
    select p.a, p.b, p.shared,
           round(p.shared / least(sa.n, sb.n)::double, 6) as score
    from wmp_pairs p
    join wmp_sizes sa on sa.doc_id = p.a
    join wmp_sizes sb on sb.doc_id = p.b
    """
