"""Sketch-path corpus statistics — the operators you actually run at
100 TB, where the exact twins stop being affordable:

  * approx_count_distinct  — HyperLogLog++ (Heule et al. 2013): fixed
    few-KB state per group, mergeable across partitions, relative
    standard deviation `rsd` configurable. The exact COUNT(DISTINCT)
    twin shuffles every distinct value.
  * percentile_approx      — Greenwald-Khanna/KLL-style quantile
    sketch: bounded state, one pass, `accuracy` trades memory for
    rank error. The exact percentile() twin (doc_length_quantiles)
    sorts each group.

Both are Spark-native aggregate sketches (JVM-side, partial+final
merge — no shuffle of raw values beyond the group key). No DuckDB
contract key: sketch outputs are estimator-specific by design, so the
correctness pin is a TOLERANCE test against the exact twins
(tests/test_pipeline_ops.py), exactly how a production pipeline
validates its sketch path before switching it on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_corpus_stats(
    docs: DataFrame,
    group_col: str = "lang",
    rsd: float = 0.05,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group: estimated distinct document count (by content
    fingerprint — so exact duplicates collapse) and approximate
    n_chars quartiles. Output (group, n_docs, approx_distinct_docs,
    p25, p50, p75)."""
    return docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.approx_count_distinct(
            F.md5(F.lower(F.trim(F.col("text")))), rsd
        ).alias("approx_distinct_docs"),
        F.percentile_approx(
            "n_chars", [0.25, 0.5, 0.75], accuracy
        ).alias("pq"),
    ).select(
        group_col,
        "n_docs",
        "approx_distinct_docs",
        F.col("pq")[0].alias("p25"),
        F.col("pq")[1].alias("p50"),
        F.col("pq")[2].alias("p75"),
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (cross-engine deterministic registers)
# ---------------------------------------------------------------------------

HLL_SALT = "hll-v1:"
HLL_M = 16          # registers; rsd ~ 1.04/sqrt(m) ~ 26%
HLL_ALPHA_16 = 0.673  # Flajolet et al. 2007 bias constant for m=16


def _hll_hash_exprs(key):
    """(bucket, rho) from the portable salted 60-bit md5 hash: bucket =
    low 4 bits, rho = leading-zero count + 1 of the remaining 56 bits
    (Flajolet et al. 2007). rho is EXACT integer arithmetic in both
    engines: length(bin(x)) is the bit length, so rho = 57 - bitlen,
    and the all-zero word is pinned to 57."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(HLL_SALT), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    bucket = h.bitwiseAND(F.lit(HLL_M - 1))
    rem = F.shiftright(h, 4)
    rho = F.when(rem == 0, F.lit(57)).otherwise(
        F.lit(57) - F.length(F.bin(rem))
    )
    return bucket, rho.cast("long")


def hll_distinct_tokens(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group APPROXIMATE distinct-token count via a PORTABLE
    HyperLogLog (Flajolet-Fuchs-Gandouet-Meunier 2007, with the
    small-range linear-counting correction): unlike the native
    `approx_count_distinct` (estimator-internal, engine-specific),
    every register here is a deterministic exact integer derived from
    the salted 60-bit md5 hash, so the sketch — registers AND estimate
    — is bit-identical across engines and replayable by the DuckDB
    oracle. This is the contract-keyed face of the sketch path.

    Scale shape: tokens never shuffle — the (group, bucket) -> max(rho)
    aggregation is map-side combinable (16 registers per group is the
    whole reduced state; merging sketches IS this max, the mergeable-
    summaries property), then one 16-column pivot per group. Estimator:
    the FIXED-ORDER 16-term sum pow(2,-r0)+...+pow(2,-r15) (the
    HyperBall pattern), alpha_16*m^2/S, with E<=2.5m and V>0 switching
    to linear counting m*ln(m/V). Output: group, v_zero (long),
    est_distinct (double 6dp).

    Expected relative error ~1.04/sqrt(16) ~ 26% — the m=16 register
    file keeps the contract output small; production callers raise m
    (the construction is m-generic) or use approx_corpus_stats.
    """
    from .analysis import tokens_expr

    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token"),
    )
    bucket, rho = _hll_hash_exprs(F.col("token"))
    regs = (
        toks.select("grp", bucket.alias("j"), rho.alias("rho"))
        .groupBy("grp", "j")
        .agg(F.max("rho").alias("r"))
    )
    pivoted = regs.groupBy("grp").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("j") == i, F.col("r"))), F.lit(0)
            )
            .cast("long")
            .alias(f"r{i}")
            for i in range(HLL_M)
        ]
    )
    s = None
    for i in range(HLL_M):
        term = F.pow(F.lit(2.0), -F.col(f"r{i}").cast("double"))
        s = term if s is None else s + term
    v = None
    for i in range(HLL_M):
        z = F.when(F.col(f"r{i}") == 0, F.lit(1)).otherwise(F.lit(0))
        v = z if v is None else v + z
    e0 = F.lit(HLL_ALPHA_16 * HLL_M * HLL_M) / s
    est = F.when(
        (e0 <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e0)
    return pivoted.select(
        F.col("grp").alias(group_col),
        v.cast("long").alias("v_zero"),
        F.round(est, 6).alias("est_distinct"),
    )


def sql_hll_distinct_tokens(
    rel: str, group_col: str = "lang", text_col: str = "text"
) -> str:
    """DuckDB twin: identical hash/bucket/rho arithmetic (exact
    integers), identical fixed-order estimator expression."""
    from .analysis import sql_tokens

    toks = sql_tokens(f"lower({text_col})")
    h = f"('0x' || substr(md5('{HLL_SALT}' || (token)::varchar), 1, 15))::bigint"
    reg_cols = ",\n           ".join(
        f"coalesce(max(case when j = {i} then r end), 0)::bigint as r{i}"
        for i in range(HLL_M)
    )
    s = " + ".join(f"pow(2.0, -r{i}::double)" for i in range(HLL_M))
    v = " + ".join(
        f"(case when r{i} = 0 then 1 else 0 end)" for i in range(HLL_M)
    )
    e0 = f"{HLL_ALPHA_16 * HLL_M * HLL_M!r} / ({s})"
    return f"""
    with hll_tok as (
        select {group_col} as grp, unnest({toks}) as token from {rel}
    ),
    hll_h as (
        select grp, ({h}) & {HLL_M - 1} as j,
               case when ({h}) >> 4 = 0 then 57
                    else 57 - length(bin(({h}) >> 4)) end::bigint as rho
        from hll_tok
    ),
    hll_reg as (select grp, j, max(rho) as r from hll_h group by 1, 2),
    hll_piv as (
        select grp,
           {reg_cols}
        from hll_reg group by grp
    ),
    hll_est as (
        select grp, ({v})::bigint as v_zero,
               case when ({e0}) <= {2.5 * HLL_M!r} and ({v}) > 0
                    then {float(HLL_M)!r}
                         * ln({float(HLL_M)!r} / ({v})::double)
                    else {e0} end as est
        from hll_piv
    )
    select grp as {group_col}, v_zero, round(est, 6) as est_distinct
    from hll_est
    """


# ---------------------------------------------------------------------------
# Portable Count-Min sketch (cross-engine deterministic counters)
# ---------------------------------------------------------------------------

CM_SALT = "cm-v1:"
CM_D = 4    # hash rows; P(overestimate > e*N/w) < exp(-d)
CM_W = 64   # counters per row


def _cm_bucket_py(token: str, i: int) -> int:
    """Python replay of the row-i bucket — used to build the literal
    query cells, so the probe side never hashes in-engine."""
    import hashlib

    h = int(
        hashlib.md5(f"{CM_SALT}{i}:{token}".encode()).hexdigest()[:15], 16
    )
    return h % CM_W


def cm_token_counts(
    docs: DataFrame,
    query_tokens: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Point-frequency estimates for `query_tokens` from a PORTABLE
    Count-Min sketch (Cormode & Muthukrishnan, "An improved data
    stream summary: the count-min sketch and its applications",
    J. Algorithms 2005): d=4 salted md5 row hashes into w=64 counters,
    estimate = min over rows of the hit counter. Never undercounts;
    overcounts by <= e*N/w with probability >= 1-e^-d per query.

    Every counter is an EXACT integer (count of tokens hashing into
    the cell), the probe cells are python-computed literals, and min
    over 4 integers is exact — so the whole key is integer arithmetic,
    bit-identical across engines (the repo's strongest determinism
    class, no floats at all).

    Scale shape: tokens fan out x4 map-side into (row, bucket) pairs
    and collapse by a combinable count to the 256-cell sketch — the
    shuffle carries at most d*w*P partial rows regardless of corpus
    size; the probe is a broadcast join against a 4*k literal table.
    Output: token, est_cnt (long), n_total (long).
    """
    from .analysis import tokens_expr

    if not query_tokens:
        raise ValueError("cm_token_counts: query_tokens must be non-empty")
    if len(set(query_tokens)) != len(query_tokens):
        raise ValueError("cm_token_counts: duplicate query tokens")
    toks = docs.select(
        F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token")
    )
    cells = []
    for i in range(CM_D):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{CM_SALT}{i}:"), F.col("token"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        cells.append(F.struct(F.lit(i).alias("i"), F.pmod(h, F.lit(CM_W)).alias("b")))
    sketch = (
        toks.select(F.explode(F.array(*cells)).alias("c"))
        .select(F.col("c.i").alias("i"), F.col("c.b").alias("b"))
        .groupBy("i", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n_total = toks.count()
    probe = docs.sparkSession.createDataFrame(
        [
            (t, i, _cm_bucket_py(t, i))
            for t in query_tokens
            for i in range(CM_D)
        ],
        "token string, i int, b long",
    )
    return (
        probe.join(sketch, ["i", "b"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_cnt"))
        .select("token", "est_cnt", F.lit(n_total).cast("long").alias("n_total"))
    )


def sql_cm_token_counts(
    rel: str, query_tokens: list[str], text_col: str = "text"
) -> str:
    """DuckDB twin: identical salted row hashes, identical literal
    probe cells, identical min-over-rows — pure integers."""
    from .analysis import sql_tokens

    if not query_tokens:
        raise ValueError("cm_token_counts: query_tokens must be non-empty")
    if len(set(query_tokens)) != len(query_tokens):
        raise ValueError("cm_token_counts: duplicate query tokens")
    toks = sql_tokens(f"lower({text_col})")
    rows = " union all ".join(
        f"select token, {i} as i, "
        f"((('0x' || substr(md5('{CM_SALT}{i}:' || token), 1, 15))::bigint"
        f" % {CM_W}) + {CM_W}) % {CM_W} as b from cm_tok"
        for i in range(CM_D)
    )
    probe = " union all ".join(
        f"select '{t}' as token, {i} as i, {_cm_bucket_py(t, i)} as b"
        for t in query_tokens
        for i in range(CM_D)
    )
    return f"""
    with cm_tok as (select unnest({toks}) as token from {rel}),
    cm_cells as ({rows}),
    cm_sketch as (select i, b, count(*)::bigint as cnt
                  from cm_cells group by 1, 2),
    cm_probe as ({probe})
    select p.token, min(coalesce(s.cnt, 0))::bigint as est_cnt,
           (select count(*)::bigint from cm_tok) as n_total
    from cm_probe p
    left join cm_sketch s on s.i = p.i and s.b = p.b
    group by p.token
    """
