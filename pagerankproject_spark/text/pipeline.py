"""Web-corpus pipeline operators beyond per-document stats: URL
normalization / domain rollups, repetition-based quality signals, PII
pattern counts, corpus-level n-gram top-k, and deterministic stratified
sampling.

All JVM-side column expressions (whole-stage codegen, no UDF) with
DuckDB SQL twins built from the SAME constants, following
``text/analysis.py``. No reference anchor — /root/reference/pagerank.py
has no text layer; these are north-star training-data operators.

Scale notes:
  * URL normalization / domain extraction are pure projections — they
    ride the scan, no shuffle.
  * domain rollup is a hash aggregate (partial+final); domains are a
    low-cardinality key at web scale, so the map-side partial absorbs
    almost everything before the exchange.
  * stratified sampling is a deterministic hash predicate — pushdown-
    friendly, no sampling state, reproducible across reruns/resumes
    (unlike df.sample, whose output depends on partitioning).
  * n-gram top-k = explode -> count -> TakeOrderedAndProject; the
    explode fan-out is bounded by tokens-per-doc, and the count
    partial-aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.shingles import shingles_expr, sql_shingles
from .analysis import tokens_expr, sql_tokens

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

SCHEME_REGEX = r"^[a-z][a-z0-9+.-]*://"
WWW_REGEX = r"^www\."
FRAGMENT_REGEX = r"#.*$"
QUERY_REGEX = r"\?.*$"
TRAILING_SLASH_REGEX = r"/+$"
DOMAIN_REGEX = r"^([^/]+)"

# ASCII patterns that parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4s": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phones": r"\+[0-9][0-9 -]{7,}[0-9]",
}

ROUND_DP = 6

# deterministic stratified sampling: per-stratum keep-rate in permille,
# applied to a content-independent 60-bit hash of the row key.
SAMPLE_RATES_PERMILLE: dict[str, int] = {"en": 500, "de": 250, "es": 250}
SAMPLE_DEFAULT_PERMILLE = 100
SAMPLE_SALT = "stratified-v1:"


# ---------------------------------------------------------------------------
# Spark column builders
# ---------------------------------------------------------------------------

def normalize_url_expr(url: Column) -> Column:
    """Canonical URL: lowercase, strip scheme / leading www. / fragment /
    query string / trailing slashes. Pure projection."""
    u = F.lower(url)
    u = F.regexp_replace(u, SCHEME_REGEX, "")
    u = F.regexp_replace(u, WWW_REGEX, "")
    u = F.regexp_replace(u, FRAGMENT_REGEX, "")
    u = F.regexp_replace(u, QUERY_REGEX, "")
    return F.regexp_replace(u, TRAILING_SLASH_REGEX, "")


def domain_expr(url: Column) -> Column:
    """Registrable host part of a (normalized) URL."""
    return F.regexp_extract(normalize_url_expr(url), DOMAIN_REGEX, 1)


def host_graph(edges: DataFrame) -> DataFrame:
    """Contract the page-level link graph to the HOST level — the
    Common-Crawl host-graph construction: extract the registrable host
    from both endpoints, drop intra-host links, and aggregate parallel
    links into a weighted host edge (src_host, dst_host, n_links).

    At 100 TB this is the standard first reduction (host graphs are
    3-4 orders of magnitude smaller than page graphs and most ranking/
    spam analyses run there): one projection riding the edge scan plus
    one partial-aggregatable count shuffle keyed by the host pair. The
    output feeds build_graph_tables/pagerank unchanged — host-level
    PageRank is `pagerank(build_graph_tables(host_graph(e)))`."""
    return (
        edges.select(
            domain_expr(F.col("src")).alias("src_host"),
            domain_expr(F.col("dst")).alias("dst_host"),
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("n_links"))
    )


def sql_host_graph(edges_rel: str = "edges") -> str:
    src_h, dst_h = sql_domain("src"), sql_domain("dst")
    return f"""
    select {src_h} as src_host, {dst_h} as dst_host,
           count(*)::bigint as n_links
    from {edges_rel}
    where {src_h} <> {dst_h}
    group by 1, 2
    """


def repetition_ratio_expr(text: Column) -> Column:
    """Token-level repetition: 1 - distinct/total whitespace tokens
    (0 for empty text). Gopher-style repetition quality signal."""
    toks = tokens_expr(F.lower(text))
    return F.round(
        F.when(
            F.size(toks) > 0,
            1.0
            - F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
        ).otherwise(F.lit(0.0)),
        ROUND_DP,
    )


def bigram_repetition_expr(text: Column) -> Column:
    """Same signal over word bigrams — catches phrase-level boilerplate
    that unigram repetition misses."""
    grams = shingles_expr(text, n=2)
    return F.round(
        F.when(
            F.size(grams) > 0,
            1.0
            - F.size(F.array_distinct(grams)).cast("double")
            / F.size(grams).cast("double"),
        ).otherwise(F.lit(0.0)),
        ROUND_DP,
    )


def pii_count_exprs(text: Column) -> dict[str, Column]:
    return {
        f"n_{name}": F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def sample_hash_expr(key: Column) -> Column:
    """Content-independent permille bucket in [0,1000) from the portable
    md5-derived 60-bit hash (same value in DuckDB)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(SAMPLE_SALT), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(1000))


def stratified_keep_expr(key: Column, stratum: Column) -> Column:
    rate = F.lit(SAMPLE_DEFAULT_PERMILLE)
    for s, r in sorted(SAMPLE_RATES_PERMILLE.items()):
        rate = F.when(stratum == s, F.lit(r)).otherwise(rate)
    return sample_hash_expr(key) < rate


def domain_cap_sample(
    df: DataFrame, url: Column, key: Column, k: int
) -> DataFrame:
    """Per-domain document cap — the CCNet/C4-style domain-balancing
    sampler: keep at most `k` documents per registrable domain, chosen
    in a content-independent deterministic order (the portable 60-bit
    md5 permille hash of the row key, then the key itself) so reruns,
    resumes, and the DuckDB twin pick the SAME survivors.

    Output: all input columns + `domain` + `domain_rank` (1-based rank
    of the row within its domain under the deterministic order).

    Scale notes: one hash-partitioned window keyed by domain — and
    Catalyst plants a PARTIAL `WindowGroupLimit` before the exchange
    (plan-asserted in PLANS.md), so at most k rows per domain per input
    partition ever shuffle: the mega-domain skew case is bounded to
    k x input-partitions rows at the exchange, not the domain's corpus
    share. The content-independent hash order additionally allows the
    classic permille pre-prune (keep `h < p`) when k << domain size,
    left to callers because it trades exactness on small domains.
    """
    from pyspark.sql import Window

    d = df.withColumn("domain", domain_expr(url)).withColumn(
        "_h", sample_hash_expr(key)
    )
    w = Window.partitionBy("domain").orderBy(F.asc("_h"), key.asc())
    return (
        d.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= k)
        .drop("_h")
    )


def sql_domain_cap_sample(
    rel: str, url: str, key: str, k: int, cols: list[str]
) -> str:
    projected = ", ".join(cols)
    return f"""
    select {projected}, domain, domain_rank from (
        select {projected}, {sql_domain(url)} as domain,
               row_number() over (
                   partition by {sql_domain(url)}
                   order by {sql_sample_hash(key)}, {key}
               )::bigint as domain_rank
        from {rel}
    ) where domain_rank <= {k}
    """


def ngram_topk(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-level top-k n-grams, deterministic ties (count desc, gram
    asc). explode -> partial/final count -> TakeOrderedAndProject."""
    grams = F.explode(shingles_expr(F.col(text_col), n=n)).alias("ngram")
    return (
        df.select(grams)
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def unigram_logloss(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram cross-entropy under the corpus's own
    unigram distribution — the sandbox-honest stand-in for CCNet's
    KenLM perplexity filter (Wenzek et al. 2020 rank documents by LM
    score; a unigram LM needs no external model and already separates
    word-salad from typical text):

        logloss(d) = round( (1/|d|) * sum over tokens t of
                            -ln( cnt(t) / total ), 6 )

    Output: doc_id, n_tokens (long), logloss (double 6dp; zero-token
    documents are omitted — no tokens, no distribution). Lower is more
    typical; corpus-level thresholding mirrors the quality_score gate.

    Scale: one corpus unigram count (combinable), one scalar total, one
    token-keyed equi-join of the exploded corpus against its own vocab,
    one per-doc combinable sum. Float note: ln differs by <= 1 ulp
    across engines and the per-doc sum is an unordered float reduction
    — the 6dp round absorbs it everywhere except exact boundary
    values, which are non-systematic here (the adamic_adar precedent;
    the repo's round-once convention applies: ONE round at the end).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt")).first()[0] or 0
    if total == 0:
        raise ValueError("corpus has no tokens; unigram_logloss undefined")
    weighted = toks.join(counts, "token").select(
        "doc_id",
        (-F.log(F.col("cnt").cast("double") / F.lit(float(total)))).alias("nll"),
    )
    return weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.sum("nll") / F.count(F.lit(1)), ROUND_DP).alias("logloss"),
    )


def sql_unigram_logloss(
    rel: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = sql_tokens(text_col)
    return f"""
    with ul_tok as (select {id_col} as doc_id, unnest({toks}) as token from {rel}),
    ul_cnt as (select token, count(*)::bigint as cnt from ul_tok group by 1),
    ul_tot as (select sum(cnt)::double as total from ul_cnt)
    select t.doc_id,
           count(*)::bigint as n_tokens,
           round(sum(-ln(c.cnt::double / (select total from ul_tot)))
                 / count(*), {ROUND_DP}) as logloss
    from ul_tok t join ul_cnt c using (token)
    group by t.doc_id
    """


def vocab_coverage(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design statistic: the
    top-k corpus tokens with each prefix's cumulative share of ALL
    token occurrences (how much of the corpus a k-entry vocabulary
    covers; the elbow picks the vocab size / UNK budget).

    Output: rank (1-based long, by count desc / token asc — total
    order, fully deterministic), token, cnt (long), cum_cnt (long),
    coverage (double = cum_cnt / corpus_total — two exact integers,
    one division, bit-identical cross-engine).

    Scale: token counting is explode + map-side-combinable count; the
    top-k is a TakeOrderedAndProject (never a full sort); only the k
    SURVIVORS enter the single-partition running-sum window, so the
    unpartitioned window is k rows by construction, not corpus-sized.
    The corpus total rides the same counts table as one scalar agg.
    """
    from pyspark.sql import Window

    toks = df.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt")).first()[0] or 0
    if total == 0:
        raise ValueError("corpus has no tokens; vocab_coverage undefined")
    topk = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum_cnt"),
        (F.sum("cnt").over(w).cast("double") / F.lit(float(total))).alias(
            "coverage"
        ),
    )


def sql_vocab_coverage(rel: str, text_col: str = "text", k: int = 100) -> str:
    toks = sql_tokens(text_col)
    return f"""
    with vc_tok as (select unnest({toks}) as token from {rel}),
    vc_cnt as (select token, count(*)::bigint as cnt from vc_tok group by 1),
    vc_top as (select token, cnt from vc_cnt order by cnt desc, token asc limit {k})
    select row_number() over (order by cnt desc, token asc)::bigint as rank,
           token, cnt,
           sum(cnt) over (order by cnt desc, token asc
                          rows between unbounded preceding and current row
           )::bigint as cum_cnt,
           sum(cnt) over (order by cnt desc, token asc
                          rows between unbounded preceding and current row
           )::double / (select sum(cnt) from vc_cnt)::double as coverage
    from vc_top
    """


# ---------------------------------------------------------------------------
# DuckDB SQL twins
# ---------------------------------------------------------------------------

def sql_normalize_url(url: str) -> str:
    u = f"lower({url})"
    for pat in (SCHEME_REGEX, WWW_REGEX, FRAGMENT_REGEX, QUERY_REGEX, TRAILING_SLASH_REGEX):
        u = f"regexp_replace({u}, '{pat}', '')"
    return u


def sql_domain(url: str) -> str:
    return f"regexp_extract({sql_normalize_url(url)}, '{DOMAIN_REGEX}', 1)"


def sql_repetition_ratio(text: str) -> str:
    toks = sql_tokens(f"lower({text})")
    return (
        f"round(case when len({toks}) > 0 then "
        f"1.0 - len(list_distinct({toks}))::double / len({toks})::double "
        f"else 0.0 end, {ROUND_DP})"
    )


def sql_bigram_repetition(text: str) -> str:
    grams = sql_shingles(text, n=2)
    return (
        f"round(case when len({grams}) > 0 then "
        f"1.0 - len(list_distinct({grams}))::double / len({grams})::double "
        f"else 0.0 end, {ROUND_DP})"
    )


def sql_pii_counts(text: str) -> dict[str, str]:
    return {
        f"n_{name}": f"len(regexp_extract_all({text}, '{pat}'))::bigint"
        for name, pat in PII_PATTERNS.items()
    }


def sql_sample_hash(key: str) -> str:
    h = f"('0x' || substr(md5('{SAMPLE_SALT}' || ({key})::varchar), 1, 15))::bigint"
    return f"(({h}) % 1000 + 1000) % 1000"


def sql_stratified_keep(key: str, stratum: str) -> str:
    rate = f"{SAMPLE_DEFAULT_PERMILLE}"
    for s, r in sorted(SAMPLE_RATES_PERMILLE.items()):
        rate = f"case when {stratum} = '{s}' then {r} else {rate} end"
    return f"{sql_sample_hash(key)} < ({rate})"


def bigram_logloss(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document BIGRAM cross-entropy under the corpus's own bigram
    MLE — the order-sensitive step past unigram_logloss toward CCNet's
    KenLM filter (Wenzek et al. 2020): a shuffled-word document keeps
    its unigram score but its bigrams turn rare, so bigram log-loss
    separates word-salad from fluent text (pytest-pinned).

        P(w2 | w1) = cnt(w1 w2) / ctx(w1),  ctx(w1) = bigrams from w1
        logloss(d) = round(mean over d's bigrams of -ln P, 6)

    MLE needs no smoothing here because the corpus scores itself:
    every scored bigram was counted (cnt >= 1). Output: doc_id,
    n_bigrams (long), logloss (double 6dp); documents with fewer than
    two tokens are omitted (no bigrams, no distribution).

    Scale: bigram formation is a zero-shuffle zip_with over each
    document's own token array (no window, no self-join); then one
    combinable bigram count, one combinable context count, one
    bigram-keyed equi-join of the exploded corpus against its own
    table, one per-doc combinable mean. Float note: same round-once
    discipline as unigram_logloss (ONE 6dp round at the end; ln <= 1
    ulp, unordered per-doc float sum absorbed by the round)."""
    arr = tokens_expr(F.col(text_col))
    n = F.size(arr)
    # negative slice lengths error, so gate the <2-token documents
    bigram_arr = F.when(
        n >= 2,
        F.zip_with(
            F.slice(arr, 1, n - 1),
            F.slice(arr, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = df.select(
        F.col(id_col).alias("doc_id"), F.explode(bigram_arr).alias("bigram")
    )
    cnt = bg.groupBy("bigram").agg(F.count("*").cast("long").alias("cnt"))
    ctx = (
        bg.select(F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("ctx"))
    )
    if bg.isEmpty():
        raise ValueError("corpus has no bigrams; bigram_logloss undefined")
    weighted = (
        bg.join(cnt, "bigram")
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(ctx, "w1")
        .select(
            "doc_id",
            (-F.log(F.col("cnt").cast("double") / F.col("ctx").cast("double"))).alias(
                "nll"
            ),
        )
    )
    return weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.sum("nll") / F.count(F.lit(1)), ROUND_DP).alias("logloss"),
    )


def sql_bigram_logloss(
    rel: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = sql_tokens(text_col)
    return f"""
    with bl_arr as (
        select {id_col} as doc_id, {toks} as t from {rel}),
    bl_bg as (
        select doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) as bigram
        from bl_arr where len(t) >= 2),
    bl_cnt as (select bigram, count(*)::bigint as cnt from bl_bg group by 1),
    bl_ctx as (
        select split_part(bigram, ' ', 1) as w1, count(*)::bigint as ctx
        from bl_bg group by 1)
    select b.doc_id,
           count(*)::bigint as n_bigrams,
           round(sum(-ln(c.cnt::double / x.ctx::double)) / count(*),
                 {ROUND_DP}) as logloss
    from bl_bg b
    join bl_cnt c using (bigram)
    join bl_ctx x on x.w1 = split_part(b.bigram, ' ', 1)
    group by b.doc_id
    """
