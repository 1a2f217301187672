"""Distributed heavy hitters: Misra-Gries candidates + exact rescore.

The two-pass frequent-items pattern (Misra & Gries 1982 "Finding
repeated elements"; mergeability/distribution per Agarwal et al.,
"Mergeable Summaries", PODS 2012 — both public): each partition
streams its tokens through a k-counter Misra-Gries summary and emits
at most k candidate tokens; the union of candidates provably contains
EVERY token with global frequency > phi*N when k >= 1/phi (pigeonhole:
a token above phi*N globally is above phi*N_p in at least one
partition p, and a k-counter MG summary keeps every item with local
count > N_p/(k+1) <= phi*N_p). A second exact pass counts only the
candidates and filters by the threshold, so the OUTPUT is exact — the
sketch only bounds what must be re-counted.

Scale shape vs the exact groupBy (text/pipeline.py::ngram_topk): the
shuffle carries at most P*k candidate tokens instead of every distinct
token in the corpus (at web scale the distinct-token universe is
billions of rows; P*k is thousands), and the exact pass streams tokens
through a BROADCAST semi-join before its combinable count. The MG pass
is an Arrow mapInPandas with one dict of k counters per partition —
no per-row Python, state O(k).

Determinism: the MG summary's content depends on partition/batch
order, but the FINAL output does not — candidates are a superset of
the true heavy hitters by the guarantee above, and the rescore is
exact integer counting with an integer threshold comparison
(cnt * denom > N, phi = 1/denom), so the result is bit-identical to
the plain SQL oracle regardless of how rows were scanned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import sql_tokens, tokens_expr


def heavy_hitters(
    docs: DataFrame,
    denom: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Tokens with global count * denom > total token count N
    (i.e. frequency > 1/denom), EXACTLY.

    Output: token, cnt (long), n_total (long) — all integers.
    """
    if denom < 2:
        raise ValueError("heavy_hitters: denom must be >= 2")
    k = denom  # k >= 1/phi makes the candidate union complete

    toks = docs.select(
        F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token")
    )

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batched Misra-Gries via the mergeable-summaries reduction
        # (Agarwal et al. PODS 2012): each batch's exact value_counts
        # is a zero-error summary; merge = add counters, then if more
        # than k remain subtract the (k+1)-th largest count from all
        # and drop the non-positive. Total undercount stays
        # <= N_p/(k+1), so every token with local count > N_p/(k+1)
        # keeps a positive counter. Vectorized per batch — no per-row
        # Python.
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            acc = acc.add(pdf["token"].value_counts(), fill_value=0)
            if len(acc) > k:
                kth = acc.nlargest(k + 1).iloc[-1]
                acc = (acc - kth)[lambda s: s > 0]
        yield pd.DataFrame({"token": acc.index.astype(str)})

    candidates = (
        toks.mapInPandas(mg, "token string").distinct()
    )
    # exact pass: count ONLY the candidates (broadcast semi-join),
    # threshold in pure integers
    counted = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n_total = toks.count()
    return (
        counted.filter(F.col("cnt") * F.lit(denom) > F.lit(n_total))
        .select(
            "token", "cnt", F.lit(n_total).cast("long").alias("n_total")
        )
    )


def sql_heavy_hitters(
    rel: str, denom: int = 200, text_col: str = "text"
) -> str:
    """DuckDB twin: the exact definition the two-pass engine equals."""
    toks = sql_tokens(f"lower({text_col})")
    return f"""
    with hh_tok as (select unnest({toks}) as token from {rel}),
    hh_tot as (select count(*)::bigint as n from hh_tok)
    select token, count(*)::bigint as cnt,
           (select n from hh_tot) as n_total
    from hh_tok
    group by token
    having count(*) * {denom} > (select n from hh_tot)
    """
