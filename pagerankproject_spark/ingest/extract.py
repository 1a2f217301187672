"""Outlink extraction: pages -> edges — SURVEY.md §2b operator #22.

Input is the Common-Crawl-style `pages` table fixed by BASELINE.json
input_hint: (url string, warc_ts timestamp, html binary, text string,
lang string). The reference never parses HTML (it consumes a
pre-extracted CSV; edge semantics /root/reference/README.md:58-59), so
extraction is defined as a pure deterministic function: every
`<a href="...">` target in the html bytes, in document order.

Two implementations, asserted identical in tests:

  * impl="sql"   (default) — JVM-side `regexp_extract_all` + explode.
    Zero Python in the hot path, whole-stage codegen, the fastest path
    at 100 TB. Column pruning means only (url, html) is read.
  * impl="arrow" — vectorized pandas UDF over Arrow batches
    (`pandas .str.extractall`, no per-row Python), the pattern mandated
    by input_hint for row-level compute Spark can't express natively;
    kept as the template for heavier parsers (real HTML tokenizers,
    multimodal decoders).

Per-row invariant vs the reference: extracted `text` is byte-identical
per url — the text column passes through UNCHANGED (identity), asserted
in tests (SURVEY §2b #22).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

HREF_REGEX = r'<a\s[^>]*href="([^"]*)"'


@F.pandas_udf(ArrayType(StringType()))
def _extract_hrefs_arrow(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction: bytes -> list of href targets.
    re.ASCII pins \\s to the ASCII class — Java regex (sql twin) and
    RE2 (DuckDB oracle) never match U+00A0-style Unicode whitespace,
    and the twins must agree byte-for-byte."""
    import re

    text = html.apply(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    hits = text.str.extractall(HREF_REGEX, flags=re.ASCII)
    if hits.empty:
        return pd.Series([[] for _ in range(len(html))], index=html.index)
    grouped = hits[0].groupby(level=0).agg(list)
    return grouped.reindex(text.index).apply(
        lambda v: v if isinstance(v, list) else []
    )


def extract_outlinks(pages: DataFrame, impl: str = "sql") -> DataFrame:
    """pages -> (src: string, dst: string), one row per href occurrence
    (duplicates preserved — each corresponds to one <a> tag / one edge)."""
    if impl == "sql":
        targets = F.regexp_extract_all(
            F.decode(F.col("html"), "UTF-8"), F.lit(HREF_REGEX), F.lit(1)
        )
    elif impl == "arrow":
        targets = _extract_hrefs_arrow(F.col("html"))
    else:
        raise ValueError(f"unknown impl: {impl}")
    return pages.select(
        F.col("url").alias("src"), F.explode(targets).alias("dst")
    )


ANCHOR_REGEX = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


@F.pandas_udf(ArrayType(ArrayType(StringType())))
def _extract_anchors_arrow(html: pd.Series) -> pd.Series:
    """Arrow-batched: bytes -> list of [href, anchor_text] pairs
    (re.ASCII: see _extract_hrefs_arrow)."""
    import re

    text = html.apply(
        lambda b: b.decode("utf-8", errors="replace") if b is not None else ""
    )
    hits = text.str.extractall(ANCHOR_REGEX, flags=re.ASCII)
    if hits.empty:
        return pd.Series([[] for _ in range(len(html))], index=html.index)
    pairs = hits.apply(lambda r: [r[0], r[1]], axis=1)
    grouped = pairs.groupby(level=0).agg(list)
    return grouped.reindex(text.index).apply(
        lambda v: v if isinstance(v, list) else []
    )


def extract_anchors(pages: DataFrame, impl: str = "sql") -> DataFrame:
    """pages -> (src, dst, anchor): one row per closed anchor tag, in
    document order — the anchor-text table that web search relevance and
    link-spam analysis aggregate at scale (anchor text is the classic
    off-page description of the TARGET page). Only tags with a closing
    </a> and no nested markup inside the text qualify (the regex's
    [^<]* body), matching what a streaming byte-regex pass can promise.

    impl="sql" zips the two capture groups JVM-side (two
    regexp_extract_all passes over the same pattern yield equal-length
    arrays by construction, arrays_zip + explode keeps it
    whole-stage-codegen); impl="arrow" is the vectorized-pandas twin."""
    if impl == "sql":
        html_str = F.decode(F.col("html"), "UTF-8")
        dsts = F.regexp_extract_all(html_str, F.lit(ANCHOR_REGEX), F.lit(1))
        texts = F.regexp_extract_all(html_str, F.lit(ANCHOR_REGEX), F.lit(2))
        pair = F.explode(F.arrays_zip(dsts.alias("d"), texts.alias("t")))
        return pages.select(F.col("url").alias("src"), pair.alias("p")).select(
            "src", F.col("p.d").alias("dst"), F.col("p.t").alias("anchor")
        )
    if impl == "arrow":
        pair = F.explode(_extract_anchors_arrow(F.col("html")))
        return pages.select(F.col("url").alias("src"), pair.alias("p")).select(
            "src",
            F.col("p").getItem(0).alias("dst"),
            F.col("p").getItem(1).alias("anchor"),
        )
    raise ValueError(f"unknown impl: {impl}")


def sql_extract_anchors(pages_rel: str, html_expr: str = "html_str") -> str:
    """DuckDB twin of extract_anchors(impl='sql'): same two-group
    pattern, 1-based list indexing over the zipped lengths."""
    pat = ANCHOR_REGEX.replace("'", "''")
    return f"""
    select url as src,
           ds[i] as dst,
           ts[i] as anchor
    from (
        select url,
               regexp_extract_all({html_expr}, '{pat}', 1) as ds,
               regexp_extract_all({html_expr}, '{pat}', 2) as ts
        from {pages_rel}
    ), unnest(range(1, len(ds) + 1)) as u(i)
    """


def extracted_text(pages: DataFrame) -> DataFrame:
    """The text side of extraction: identity pass-through of the `text`
    column (byte-identical per url — the binding per-row invariant)."""
    return pages.select("url", "text")


def anchor_term_index(anchors: DataFrame) -> DataFrame:
    """Per-target anchor-term index: the classic off-page relevance
    signal (Brin & Page 1998 §2.2 anchor propagation; Craswell,
    Hawking & Robertson SIGIR 2001 showed anchor text beats content
    for site finding — both public). For every (target, term) over the
    INCOMING anchors:

        n_src  — distinct linking pages using the term (the diversity
                 signal link-spam analysis thresholds on: one page
                 repeating a term is cheap, many independent pages
                 agreeing is not)
        n_occ  — total occurrences

    Input: the (src, dst, anchor) table from extract_anchors. Output:
    dst, term, n_src (long), n_occ (long) — exact integers end-to-end,
    bit-identical cross-engine by construction.

    Scale: explode is map-side; the single shuffle groups on
    (dst, term) with a partial count for n_occ; n_src is the one
    count-distinct (Spark expands it to a two-level agg over the same
    key space — no second shuffle wave over a wider key). Self-anchors
    (src == dst) are excluded: a page's own text is not an off-page
    signal.
    """
    from ..text.analysis import tokens_expr

    toks = (
        anchors.filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.explode(tokens_expr(F.lower(F.col("anchor")))).alias("term"),
        )
    )
    return toks.groupBy("dst", "term").agg(
        F.countDistinct("src").cast("long").alias("n_src"),
        F.count("*").cast("long").alias("n_occ"),
    )


def sql_anchor_term_index(anchors_rel: str) -> str:
    """DuckDB twin of anchor_term_index over a (src, dst, anchor)
    relation."""
    from ..text.analysis import sql_tokens

    toks = sql_tokens("lower(anchor)")
    return f"""
    select dst, term,
           count(distinct src)::bigint as n_src,
           count(*)::bigint as n_occ
    from (select src, dst, unnest({toks}) as term
          from {anchors_rel} where src <> dst)
    group by dst, term
    """
