"""SimHash near-duplicate fingerprints (Charikar) — 60-bit variant.

fingerprint(doc): for each bit i of the portable 60-bit token hash,
sum +1/-1 over all token OCCURRENCES (tf-weighted, the classic form);
bit i of the fingerprint is 1 iff the sum is positive. Docs whose
fingerprints differ in <= `max_hamming` bits are near-duplicates.

Execution shape: one explode (doc, token) -> ONE groupBy(doc) with 60
conditional-sum aggregates (map-side combinable; a hub token never
concentrates work) -> fingerprint assembled with shifts. Candidate
pairs use the standard band trick: 4 x 15-bit chunks, docs sharing any
chunk are candidates (catches every pair with hamming <= 3 exactly, by
pigeonhole), then the exact bit_count(xor) test filters.

Fully portable to the DuckDB oracle — same md5-derived hash, same
shift/mask arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import hash60_expr, sql_hash60, sql_tokens, tokens_expr

SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4
CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS  # 15
DEFAULT_MAX_HAMMING = 3


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, simhash: long). Docs with no tokens produce no row."""
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("t"),
    ).select("doc", hash60_expr(F.col("t")).alias("x"))
    sums = [
        F.sum(
            F.when(F.shiftright("x", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc").agg(*sums)
    fp = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp + bit
    return agg.select("doc", fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs (a < b, hamming <= max_hamming) via chunk-LSH.

    Exact for max_hamming <= SIMHASH_CHUNKS - 1 (pigeonhole: <= 3
    differing bits cannot touch all 4 chunks).
    """
    fp = simhash_fingerprints(docs, id_col, text_col)
    chunk_cols = [
        F.struct(
            F.lit(j).alias("cid"),
            F.shiftright("simhash", j * CHUNK_BITS)
            .bitwiseAND(F.lit((1 << CHUNK_BITS) - 1))
            .alias("chunk"),
        )
        for j in range(SIMHASH_CHUNKS)
    ]
    chunks = fp.select(
        "doc", "simhash", F.explode(F.array(*chunk_cols)).alias("c")
    ).select("doc", "simhash", F.col("c.cid").alias("cid"), F.col("c.chunk").alias("chunk"))
    left = chunks.select(
        F.col("doc").alias("a"), F.col("simhash").alias("fa"), "cid", "chunk"
    )
    right = chunks.select(
        F.col("doc").alias("b"), F.col("simhash").alias("fb"), "cid", "chunk"
    )
    return (
        left.join(right, ["cid", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "fa", "fb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def sql_simhash_fingerprints(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    sums = ", ".join(
        f"sum(case when (x >> {i}) & 1 = 1 then 1 else -1 end) as s{i}"
        for i in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"case when s{i} > 0 then {1 << i}::bigint else 0::bigint end"
        for i in range(SIMHASH_BITS)
    )
    return f"""
        with tok as (
            select {id_col} as doc, {sql_hash60('t')} as x
            from (select {id_col}, unnest({sql_tokens(f'lower({text_col})')}) as t
                  from {table})
        ),
        agg as (select doc, {sums} from tok group by doc)
        select doc, ({fp}) as simhash from agg
    """
