"""Paragraph-level dedup and boilerplate detection — the CCNet / C4
line-level operators (Wenzek et al. 2020 CCNet dedups paragraph hashes
across the corpus; Raffel et al. 2020 C4 drops repeated lines; Penedo
et al. 2023 RefinedWeb removes high-document-frequency lines as
boilerplate). No reference anchor — /root/reference/pagerank.py has no
text layer; engine-added training-data operators (SURVEY §2c family).

All JVM-side column expressions: posexplode over split(text), md5
fingerprints of normalized paragraphs (the module-shared
`fingerprint_expr`), combinable min/count aggregates. The only shuffle
keys are 32-hex fingerprints — never paragraph text — so the shuffle
payload at 100 TB is bounded by paragraph COUNT, not corpus bytes.

Determinism: the survivor of a duplicated paragraph is the globally
minimal (doc_id, pos) occurrence — one `min(struct(...))` combinable
aggregate, no window sort (the latest_snapshots discipline); stats are
exact integers plus one final division (bit-identical cross-engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import fingerprint_expr, sql_fingerprint


def _paragraphs(
    docs: DataFrame, id_col: str, text: Column, sep: str
) -> DataFrame:
    """(doc_id, pos, fp) for every non-empty trimmed paragraph. pos is
    the 0-based index of the paragraph within its document BEFORE
    empty-paragraph filtering (so positions are stable under edits to
    sibling paragraphs' emptiness — and match the SQL twin's
    generate_subscripts - 1)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(text, sep)).alias("pos", "para"),
        )
        .filter(F.length(F.trim(F.col("para"))) > 0)
        .select("doc_id", "pos", fingerprint_expr(F.col("para")).alias("fp"))
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: Column | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level exact paragraph dedup: one row per non-empty
    paragraph occurrence, flagged keep = this occurrence is the global
    minimum (doc_id, pos) for its fingerprint.

    Output: doc_id, pos (0-based within doc), fp (md5 hex of the
    lowercased trimmed paragraph), n_occurrences (long, corpus-wide
    count for this fingerprint), keep (boolean).

    A filtered corpus rewrite is `filter(keep)` + re-assembly; the
    per-doc damage report is `paragraph_dedup_stats`. Scale: explode
    rides the scan; ONE fingerprint-keyed combinable aggregate
    (min(struct(doc_id,pos)) + count) then an equi-join back — no
    window, no sort, no text on the wire after the fingerprint
    projection."""
    paras = _paragraphs(docs, id_col, text if text is not None else F.col("text"), sep)
    first = paras.groupBy("fp").agg(
        F.min(F.struct("doc_id", "pos")).alias("first"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    return paras.join(first, "fp").select(
        "doc_id",
        "pos",
        "fp",
        "n_occurrences",
        (
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        ).alias("keep"),
    )


def paragraph_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: Column | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Per-document paragraph-dedup damage report: n_paragraphs,
    n_kept (both long), kept_ratio (double — exact integers, one final
    division; NULL for documents with zero non-empty paragraphs is
    impossible here because such documents emit no row at all)."""
    d = paragraph_dedup(docs, id_col=id_col, text=text, sep=sep)
    return d.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        (
            F.sum(F.col("keep").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("kept_ratio"),
    )


def boilerplate_lines(
    docs: DataFrame,
    group_col: str,
    min_doc_freq: int,
    id_col: str = "doc_id",
    text: Column | None = None,
    sep: str = "\n",
) -> DataFrame:
    """High-document-frequency paragraph detection within a group
    (RefinedWeb-style boilerplate: a line appearing in >= min_doc_freq
    DISTINCT documents of the same site/source is navigation/footer
    noise, not content).

    Output: group, fp, doc_freq (distinct docs in the group containing
    the paragraph, long). Scale: the distinct is (group, fp, doc_id)
    pre-aggregation — combinable — followed by one count."""
    paras = _paragraphs(docs, id_col, text if text is not None else F.col("text"), sep)
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("group"))
        .join(paras, "doc_id")
        .select("group", "fp", "doc_id")
        .distinct()
    )
    return (
        per_doc.groupBy("group", "fp")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins
# ---------------------------------------------------------------------------

def _sql_paragraphs(rel: str, id_col: str, text_sql: str, sep_sql: str) -> str:
    """CTE body producing (doc_id, pos, fp) — generate_subscripts is
    1-based, Spark posexplode 0-based, hence the -1."""
    return f"""
    select doc_id, pos, {sql_fingerprint('para')} as fp from (
        select {id_col} as doc_id,
               unnest(string_split({text_sql}, {sep_sql})) as para,
               generate_subscripts(string_split({text_sql}, {sep_sql}), 1) - 1 as pos
        from {rel}
    ) where length(trim(para)) > 0
    """


def sql_paragraph_dedup(
    rel: str, id_col: str, text_sql: str, sep_sql: str = "chr(10)"
) -> str:
    return f"""
    with paras as ({_sql_paragraphs(rel, id_col, text_sql, sep_sql)}),
    first as (
        select fp,
               min(doc_id * 1000000 + pos) as first_key,
               count(*)::bigint as n_occurrences
        from paras group by fp
    )
    select p.doc_id, p.pos, p.fp, f.n_occurrences,
           (p.doc_id * 1000000 + p.pos) = f.first_key as keep
    from paras p join first f using (fp)
    """


def sql_paragraph_dedup_stats(
    rel: str, id_col: str, text_sql: str, sep_sql: str = "chr(10)"
) -> str:
    return f"""
    with dd as ({sql_paragraph_dedup(rel, id_col, text_sql, sep_sql)})
    select doc_id,
           count(*)::bigint as n_paragraphs,
           sum(keep::bigint)::bigint as n_kept,
           sum(keep::bigint)::double / count(*)::double as kept_ratio
    from dd group by doc_id
    """


def sql_boilerplate_lines(
    rel: str,
    group_col: str,
    min_doc_freq: int,
    id_col: str,
    text_sql: str,
    sep_sql: str = "chr(10)",
) -> str:
    return f"""
    with paras as ({_sql_paragraphs(rel, id_col, text_sql, sep_sql)}),
    per_doc as (
        select distinct d.{group_col} as "group", p.fp, p.doc_id
        from {rel} d join paras p on p.doc_id = d.{id_col}
    )
    select "group", fp, count(*)::bigint as doc_freq
    from per_doc group by 1, 2
    having count(*) >= {min_doc_freq}
    """
