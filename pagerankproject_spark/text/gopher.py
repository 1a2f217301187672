"""Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Appendix A —
public): the document-level heuristic gate most large web-corpus
pipelines (MassiveWeb, RefinedWeb, FineWeb lineage) apply before any
model-based filtering. Deterministic, integer/rational everywhere a
threshold is compared, so Spark and DuckDB agree bit-for-bit.

Implemented rules (each emitted as its own boolean flag so downstream
consumers can re-weight rather than hard-drop; `pass_gopher` is their
conjunction):

    r_word_count       50 <= words <= 100,000
    r_mean_word_len    3 <= mean word length <= 10   (integer cross-
                       multiplied: 3*W <= total_chars <= 10*W)
    r_symbol_ratio     (# '#' + '...' occurrences) * 10 < words
    r_bullet_lines     lines starting with a bullet < 90% of lines
    r_ellipsis_lines   lines ending with '...' < 30% of lines
    r_alpha_words      words containing an alphabetic char > 80%
    r_stopwords        >= 2 distinct stopwords from the repo list

Scale shape: one scan, every rule a projection riding it (the same
zero-shuffle shape as corpus_filter); no UDFs, all whole-stage
codegen. Reference anchor: none (the reference has no corpus
filtering); SURVEY §2c quality-scoring family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import STOPWORDS, sql_tokens, tokens_expr

BULLETS = ("-", "*", "•")  # -, *, •


def _counts(text: Column) -> dict[str, Column]:
    toks = tokens_expr(text)
    lines = F.split(text, "\n")
    trimmed = F.transform(lines, F.trim)
    return {
        "words": F.size(toks).cast("long"),
        "word_chars": F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ),
        "symbols": (
            F.length(text)
            - F.length(F.regexp_replace(text, "#", ""))
            + F.size(F.regexp_extract_all(text, F.lit("\\.\\.\\."), 0))
        ).cast("long"),
        "n_lines": F.size(lines).cast("long"),
        "bullet_lines": F.size(
            F.filter(
                trimmed,
                lambda l: F.substring(l, 1, 1).isin(*BULLETS),
            )
        ).cast("long"),
        "ellipsis_lines": F.size(
            F.filter(trimmed, lambda l: l.endswith("..."))
        ).cast("long"),
        "alpha_words": F.size(
            F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
        ).cast("long"),
        "stopword_kinds": F.size(
            F.array_distinct(
                F.filter(
                    tokens_expr(F.lower(text)),
                    lambda t: t.isin(*STOPWORDS),
                )
            )
        ).cast("long"),
    }


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc rule flags + the conjunction. All comparisons integer
    cross-multiplied — no float thresholds anywhere."""
    c = _counts(F.col(text_col))
    flags = {
        "r_word_count": (c["words"] >= 50) & (c["words"] <= 100_000),
        "r_mean_word_len": (c["word_chars"] >= 3 * c["words"])
        & (c["word_chars"] <= 10 * c["words"])
        & (c["words"] > 0),
        "r_symbol_ratio": c["symbols"] * 10 < c["words"],
        "r_bullet_lines": c["bullet_lines"] * 10 < c["n_lines"] * 9,
        "r_ellipsis_lines": c["ellipsis_lines"] * 10 < c["n_lines"] * 3,
        "r_alpha_words": c["alpha_words"] * 10 > c["words"] * 8,
        "r_stopwords": c["stopword_kinds"] >= 2,
    }
    out_cols = [F.col(id_col).alias("doc_id")]
    out_cols += [v.alias(k) for k, v in flags.items()]
    conj = None
    for v in flags.values():
        conj = v if conj is None else (conj & v)
    out_cols.append(conj.alias("pass_gopher"))
    return docs.select(*out_cols)


def sql_gopher_rules(
    rel: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin — identical integer cross-multiplied comparisons."""
    toks = sql_tokens(text_col)
    ltoks = sql_tokens(f"lower({text_col})")
    stop = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    bullets = "['-', '*', '•']"
    return f"""
gq as (
  select {id_col} as doc_id,
         len({toks})::bigint as words,
         coalesce(list_sum(list_transform({toks}, t -> length(t))), 0)::bigint
             as word_chars,
         (length({text_col}) - length(replace({text_col}, '#', ''))
           + len(regexp_extract_all({text_col}, '\\.\\.\\.')))::bigint as symbols,
         len(string_split({text_col}, chr(10)))::bigint as n_lines,
         len(list_filter(list_transform(string_split({text_col}, chr(10)),
                                        l -> trim(l)),
             l -> list_contains({bullets}, substr(l, 1, 1))))::bigint
             as bullet_lines,
         len(list_filter(list_transform(string_split({text_col}, chr(10)),
                                        l -> trim(l)),
             l -> l like '%...'))::bigint as ellipsis_lines,
         len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))::bigint
             as alpha_words,
         len(list_distinct(list_filter({ltoks},
             t -> list_contains({stop}, t))))::bigint as stopword_kinds
  from {rel}
)
select doc_id,
       (words >= 50 and words <= 100000) as r_word_count,
       (word_chars >= 3 * words and word_chars <= 10 * words
        and words > 0) as r_mean_word_len,
       (symbols * 10 < words) as r_symbol_ratio,
       (bullet_lines * 10 < n_lines * 9) as r_bullet_lines,
       (ellipsis_lines * 10 < n_lines * 3) as r_ellipsis_lines,
       (alpha_words * 10 > words * 8) as r_alpha_words,
       (stopword_kinds >= 2) as r_stopwords,
       ((words >= 50 and words <= 100000)
        and (word_chars >= 3 * words and word_chars <= 10 * words
             and words > 0)
        and (symbols * 10 < words)
        and (bullet_lines * 10 < n_lines * 9)
        and (ellipsis_lines * 10 < n_lines * 3)
        and (alpha_words * 10 > words * 8)
        and (stopword_kinds >= 2)) as pass_gopher
from gq"""
