"""Deterministic corpus samplers for training-data mixing.

Two samplers the LLM-data pipeline needs beyond the uniform
stratified/capped ones in text/pipeline.py:

* `weighted_sample` — weighted sampling WITHOUT replacement via the
  Efraimidis-Spirakis A-ES key (Efraimidis & Spirakis, "Weighted random
  sampling with a reservoir", IPL 2006 — public): each row draws
  u ~ U(0,1] and the k rows with the largest u^(1/w) win. Inclusion
  probability is proportional to weight in the sequential-sampling
  sense, and the top-k-by-key formulation is embarrassingly parallel
  (a per-group TakeOrdered, no reservoir state).

* `temperature_sample` — temperature-flattened mixture sampling across
  groups (the multilingual/domain mixing rule popularized by the
  mBERT/XLM-R exponential-smoothing recipe, p_g proportional to
  n_g^tau, tau in (0,1]): exact integer per-group quotas by
  largest-remainder apportionment, then a deterministic
  content-independent pick inside each group.

Determinism contract (same rules as text/pipeline.py's samplers): all
randomness derives from the portable salted 60-bit md5 hash of the row
key, so reruns, resumes, and the DuckDB oracle twins select the SAME
rows. u = (h+1)/2^60 is the same double in both engines (bigint->double
is IEEE round-to-nearest in both; division by a power of two is exact);
ln/pow differ by <= 1 ulp across engines, which can only flip an
ORDERING on keys closer than 1 ulp — with 60-bit hash-derived u values
that is a measure-zero coincidence, not a systematic boundary (see the
repo's float-determinism conventions). No raw float ever reaches the
output schema.

Scale shape: both samplers are one hash-partitioned window keyed by the
group (the domain_cap_sample shape). weighted_sample's fixed k gets the
partial WindowGroupLimit bound (at most k rows per group per input
partition shuffle); temperature_sample's per-group quota is variable so
the full group shuffles — at 100 TB pre-prune with
`stratified_keep_expr` or a permille hash cut when quotas are tiny
relative to group sizes (callers' trade: exactness on small groups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEIGHTED_SALT = "weighted-v1:"
TWO_60 = 1 << 60


def _hash60_expr(key: Column, salt: str) -> Column:
    """Portable 60-bit hash (same value in DuckDB — see
    pipeline.sample_hash_expr, which takes this mod 1000)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def _sql_hash60(key: str, salt: str) -> str:
    return f"('0x' || substr(md5('{salt}' || ({key})::varchar), 1, 15))::bigint"


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Top-k Efraimidis-Spirakis weighted sample (per group when
    `group_col` is given, else global). Rows with NULL or non-positive
    weight are excluded (zero weight = never sampled, the A-ES
    convention). Selection key: r = ln(u)/w, largest first (identical
    ordering to u^(1/w) for w > 0, numerically tamer); deterministic
    ties by `key_col` ascending.

    Output: the input columns + `sample_rank` (1-based long within the
    group under the A-ES order)."""
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    for c in [weight_col, key_col] + ([group_col] if group_col else []):
        if c not in df.columns:
            raise ValueError(f"weighted_sample: missing column {c!r}")
    from pyspark.sql import Window

    u = (
        (_hash60_expr(F.col(key_col), WEIGHTED_SALT) + F.lit(1)).cast("double")
        / F.lit(float(TWO_60))
    )
    r = F.log(u) / F.col(weight_col).cast("double")
    d = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_r", r)
    w = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy(F.desc("_r"), F.asc(key_col))
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .drop("_r")
    )


def sql_weighted_sample(
    rel: str,
    k: int,
    weight_col: str,
    key_col: str,
    cols: list[str],
    group_col: str | None = None,
) -> str:
    """DuckDB twin: identical hash, identical u and ln(u)/w expression,
    identical window order."""
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    projected = ", ".join(cols)
    part = f"partition by {group_col} " if group_col else ""
    u = f"(({_sql_hash60(key_col, WEIGHTED_SALT)}) + 1)::double / {float(TWO_60)!r}"
    return f"""
    select {projected}, sample_rank from (
        select {projected},
               row_number() over (
                   {part}order by ln({u}) / ({weight_col})::double desc,
                   {key_col} asc
               )::bigint as sample_rank
        from {rel}
        where {weight_col} is not null and {weight_col} > 0
    ) where sample_rank <= {k}
    """


def temperature_sample(
    df: DataFrame,
    total: int,
    tau: float,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """Temperature-flattened mixture sample: per-group quotas
    proportional to n_g^tau (tau=1 -> natural proportions, tau->0 ->
    uniform across groups), apportioned to EXACT integers by the
    largest-remainder method (floor every raw quota, hand the leftover
    +1s to the largest fractional remainders, ties by group name
    ascending), each quota capped at the group's size, then the quota
    rows picked per group in the content-independent salted-hash order
    (so the pick is stable under reruns/resumes/engines).

    When a cap binds (a group smaller than its raw quota), the output
    undershoots `total` rather than respilling — the apportionment
    stays a one-pass integer rule, and at mixing scale quotas are far
    below group sizes. Output: the input columns + `pick_rank`
    (1-based long within the group under the hash order)."""
    if total < 1:
        raise ValueError("temperature_sample: total must be >= 1")
    if not (0.0 < tau <= 1.0):
        raise ValueError("temperature_sample: tau must be in (0, 1]")
    for c in (group_col, key_col):
        if c not in df.columns:
            raise ValueError(f"temperature_sample: missing column {c!r}")
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").cast("long").alias("n_g"))
    wgt = counts.withColumn(
        "w_g", F.pow(F.col("n_g").cast("double"), F.lit(float(tau)))
    )
    tot = wgt.agg(F.sum("w_g").alias("w_tot"))
    raw = wgt.crossJoin(F.broadcast(tot)).withColumn(
        "raw", F.lit(float(total)) * F.col("w_g") / F.col("w_tot")
    )
    based = raw.withColumn("base", F.floor("raw").cast("long")).withColumn(
        "rem", F.col("raw") - F.col("base").cast("double")
    )
    leftover = based.agg(
        (F.lit(total) - F.sum("base")).cast("long").alias("r")
    )
    wr = Window.orderBy(F.desc("rem"), F.asc(group_col))
    quotas = (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(wr).cast("long"))
        .select(
            group_col,
            "n_g",
            F.least(
                F.col("base")
                + F.when(F.col("rk") <= F.col("r"), F.lit(1)).otherwise(
                    F.lit(0)
                ),
                F.col("n_g"),
            )
            .cast("long")
            .alias("quota"),
        )
    )
    h = _hash60_expr(F.col(key_col), WEIGHTED_SALT)
    wp = Window.partitionBy(group_col).orderBy(F.asc("_h"), F.asc(key_col))
    return (
        df.withColumn("_h", h)
        .join(F.broadcast(quotas.select(group_col, "quota")), group_col)
        .withColumn("pick_rank", F.row_number().over(wp).cast("long"))
        .filter(F.col("pick_rank") <= F.col("quota"))
        .drop("_h", "quota")
    )


def sql_temperature_sample(
    rel: str,
    total: int,
    tau: float,
    group_col: str,
    key_col: str,
    cols: list[str],
) -> str:
    """DuckDB twin: identical pow/floor/largest-remainder quota
    arithmetic and identical hash pick order (column ORDER differs from
    the Spark twin — the contract compare is name-keyed)."""
    if total < 1:
        raise ValueError("temperature_sample: total must be >= 1")
    if not (0.0 < tau <= 1.0):
        raise ValueError("temperature_sample: tau must be in (0, 1]")
    others = [c for c in cols if c != group_col]
    projected = ", ".join(others + [group_col])
    return f"""
    with ts_counts as (
        select {group_col}, count(*)::bigint as n_g from {rel} group by 1
    ),
    ts_wgt as (
        select *, pow(n_g::double, {float(tau)!r}) as w_g from ts_counts
    ),
    ts_raw as (
        select *, {float(total)!r} * w_g / (select sum(w_g) from ts_wgt) as raw
        from ts_wgt
    ),
    ts_based as (
        select *, floor(raw)::bigint as base, raw - floor(raw) as rem
        from ts_raw
    ),
    ts_quota as (
        select {group_col}, n_g,
               least(base + case when row_number() over (
                       order by rem desc, {group_col} asc)
                   <= ({total} - (select sum(base) from ts_based))
                   then 1 else 0 end, n_g)::bigint as quota
        from ts_based
    ),
    ts_ranked as (
        select {projected},
               row_number() over (
                   partition by {group_col}
                   order by {_sql_hash60(key_col, WEIGHTED_SALT)} asc,
                   {key_col} asc
               )::bigint as pick_rank
        from {rel}
    )
    select r.*
    from ts_ranked r
    join ts_quota q on q.{group_col} = r.{group_col}
    where r.pick_rank <= q.quota
    """
