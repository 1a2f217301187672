"""MinHash + LSH near-duplicate detection.

Pipeline (all JVM-side expressions; one explode + one groupBy):

  shingle -> portable 60-bit hash x (md5-derived, identical in DuckDB)
  K universal hashes  h_k(x) = (a_k * (x mod p) + b_k) mod p,  p = 2^31-1
  signature_k(doc)    = min over shingles of h_k(x)       (K min-aggs,
                        fully map-side combinable -> skew-immune)
  LSH: split the K-row signature into `bands` bands of `rows` rows; docs
  sharing any band hash are candidate pairs (self-join on the band key).

The (a_k, b_k) constants are fixed at import from a seeded RNG so runs,
tests, and the DuckDB oracle all see the same family. Candidate pairs
are intentionally returned WITHOUT verification — composing with
`jaccard_pairs` on the candidates is the exact-verify pass; at 100 TB
that composition is the standard dedup recipe (LSH prunes |docs|^2 to
near-linear, exact Jaccard confirms).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import HASH_PRIME, hash60_expr, sql_hash60
from .shingles import DEFAULT_SHINGLE_N, shingles_expr, sql_shingles

NUM_HASHES = 32
LSH_BANDS = 8
LSH_ROWS = NUM_HASHES // LSH_BANDS

_rng = random.Random(20240816)
HASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, HASH_PRIME), _rng.randrange(0, HASH_PRIME))
    for _ in range(NUM_HASHES)
]


def _doc_shingle_hashes(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles_expr(F.col(text_col), n))).alias("s"),
    ).select("doc", F.pmod(hash60_expr(F.col("s")), F.lit(HASH_PRIME)).alias("x"))


def minhash_signatures(
    docs: DataFrame,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, h0..h{K-1}) — docs with no shingles produce no row."""
    sh = _doc_shingle_hashes(docs, n, id_col, text_col)
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(HASH_PRIME)).alias(f"h{k}")
        for k, (a, b) in enumerate(HASH_COEFFS)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing >= 1 LSH band."""
    sig = minhash_signatures(docs, n, id_col, text_col)
    band_cols = []
    for j in range(LSH_BANDS):
        cols = [F.col(f"h{j * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        band_cols.append(
            F.struct(F.lit(j).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("key"))
        )
    bands = sig.select(
        "doc", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = bands.select(F.col("doc").alias("a"), "band", "key")
    right = bands.select(F.col("doc").alias("b"), "band", "key")
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders (same constants, same semantics)
# ---------------------------------------------------------------------------

def _sql_signature_cte(table: str, n: int, id_col: str, text_col: str) -> str:
    mins = ", ".join(
        f"min(({a} * x + {b}) % {HASH_PRIME}) as h{k}"
        for k, (a, b) in enumerate(HASH_COEFFS)
    )
    return f"""
        sh as (
            select {id_col} as doc,
                   {sql_hash60('s')} % {HASH_PRIME} as x
            from (select {id_col}, unnest(list_distinct({sql_shingles(text_col, n)})) as s
                  from {table})
        ),
        sig as (select doc, {mins} from sh group by doc)
    """


def sql_minhash_lsh_pairs(
    table: str,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    band_rows = []
    for j in range(LSH_BANDS):
        cols = ", ".join(f"h{j * LSH_ROWS + r}" for r in range(LSH_ROWS))
        band_rows.append(
            f"select doc, {j} as band, md5(concat_ws(',', {cols})) as key from sig"
        )
    bands = " union all ".join(band_rows)
    return f"""
        with {_sql_signature_cte(table, n, id_col, text_col)},
        bands as ({bands})
        select distinct l.doc as a, r.doc as b
        from bands l join bands r on l.band = r.band and l.key = r.key and l.doc < r.doc
    """


def minhash_verified_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The production dedup recipe: LSH candidates -> EXACT Jaccard
    verification on candidates only.

    At 100 TB the |docs|^2 exact pass is impossible; LSH cuts the pair
    space to near-linear and this verify step restores exactness (no
    false positives; false negatives only where LSH missed, which
    tests quantify). Output: (a, b, jaccard) with jaccard >= threshold.
    """
    cand = minhash_lsh_pairs(docs, n, id_col, text_col)
    sets = docs.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingles_expr(F.col(text_col), n)).alias("sh"),
    )
    jac = (
        F.size(F.array_intersect(F.col("sa"), F.col("sb")))
        / F.size(F.array_union(F.col("sa"), F.col("sb"))).cast("double")
    )
    return (
        cand.join(sets.select(F.col("doc").alias("a"), F.col("sh").alias("sa")), "a")
        .join(sets.select(F.col("doc").alias("b"), F.col("sh").alias("sb")), "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def sql_minhash_verified_pairs(
    table: str,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    band_rows = []
    for j in range(LSH_BANDS):
        cols = ", ".join(f"h{j * LSH_ROWS + r}" for r in range(LSH_ROWS))
        band_rows.append(
            f"select doc, {j} as band, md5(concat_ws(',', {cols})) as key from sig"
        )
    bands = " union all ".join(band_rows)
    jac = (
        "round(len(list_intersect(sa.sh, sb.sh))::double"
        " / len(list_distinct(list_concat(sa.sh, sb.sh)))::double, 6)"
    )
    return f"""
        with {_sql_signature_cte(table, n, id_col, text_col)},
        bands as ({bands}),
        cand as (
            select distinct l.doc as a, r.doc as b
            from bands l join bands r
              on l.band = r.band and l.key = r.key and l.doc < r.doc
        ),
        sets as (
            select {id_col} as doc, list_distinct({sql_shingles(text_col, n)}) as sh
            from {table}
        )
        select a, b, {jac} as jaccard
        from cand
        join sets sa on sa.doc = a
        join sets sb on sb.doc = b
        where {jac} >= {threshold}
    """
