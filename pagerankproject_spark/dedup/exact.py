"""Exact deduplication — hash-groupBy on a content fingerprint.

At 100 TB this is the cheapest dedup pass and always runs first: one
shuffle on a 16-byte key (md5 of normalized text), map-side partial
aggregation, survivor = minimum doc_id per group (deterministic).
The fingerprint (not the full text) is the shuffle key, so shuffled
bytes are O(docs * 16B) regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import fingerprint_expr, sql_fingerprint


def dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Survivors of exact dedup: (fingerprint, survivor_id, n_dupes).

    min(id) is the keep-rule (deterministic, order-independent);
    n_dupes counts group size so the caller can quantify dedup yield.
    """
    return (
        docs.select(
            F.col(id_col), fingerprint_expr(F.col(text_col)).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count("*").cast("long").alias("n_dupes"),
        )
    )


def sql_dedup_exact(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
        select {sql_fingerprint(text_col)} as fingerprint,
               min({id_col}) as survivor_id,
               count(*)::bigint as n_dupes
        from {table}
        group by 1
    """
