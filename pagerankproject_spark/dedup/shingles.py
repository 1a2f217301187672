"""Word n-gram shingling — the shared front end of Jaccard / MinHash
near-dup detection.

Pure array expressions (transform/sequence/slice) — JVM-side, no UDF.
Definition (identical in the DuckDB SQL builder):

  tokens   = whitespace split of lower(trim(text)); blank -> []
  shingles = all consecutive n-grams joined by ' ' if len(tokens) >= n,
             else the single shingle of all tokens (len > 0), else [].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..text.analysis import tokens_expr, sql_tokens

DEFAULT_SHINGLE_N = 3


def shingles_expr(text: Column, n: int = DEFAULT_SHINGLE_N) -> Column:
    toks = tokens_expr(F.lower(text))
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n) + F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return (
        F.when(F.size(toks) >= n, ngrams)
        .when(F.size(toks) > 0, F.array(F.concat_ws(" ", toks)))
        .otherwise(F.array().cast("array<string>"))
    )


def sql_shingles(text: str, n: int = DEFAULT_SHINGLE_N) -> str:
    toks = sql_tokens(f"lower({text})")
    # DuckDB list slicing is 1-based inclusive: toks[i:i+n-1] is n items.
    ngrams = (
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' '))"
    )
    return (
        f"case when len({toks}) >= {n} then {ngrams} "
        f"when len({toks}) > 0 then [array_to_string({toks}, ' ')] "
        f"else []::varchar[] end"
    )
