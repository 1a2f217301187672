"""n-gram Jaccard near-duplicate pairs via a shingle inverted index.

Scale shape: explode distinct shingles -> self-join on the shingle
string -> count common shingles per (a, b) pair -> Jaccard. The join
key is the shingle, so pair generation is proportional to the number
of co-occurring shingles, not |docs|^2. At 100 TB this exact variant
runs AFTER MinHash/LSH has cut candidates; on its own it is the
ground-truth oracle the approximate passes are tested against.

Hub shingles (boilerplate present in thousands of docs) are the skew
hazard: `max_shingle_freq` drops shingles whose document frequency
exceeds the cap before the self-join (standard df-cap; also what a
production pipeline does to boilerplate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shingles import DEFAULT_SHINGLE_N, shingles_expr, sql_shingles

JACCARD_ROUND = 6


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Pairs (a < b) with shingle-set Jaccard >= threshold.

    Output: (a: long, b: long, jaccard: double rounded to 6dp).
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles_expr(F.col(text_col), n))).alias("s"),
    )
    sh = sh.persist()
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    left = sh.select(F.col("doc").alias("a"), "s")
    right = sh.select(F.col("doc").alias("b"), "s")
    common = (
        left.join(right, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sb")), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sa") + F.col("sb") - F.col("common")).cast("double"),
                JACCARD_ROUND,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def sql_jaccard_pairs(
    table: str,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_freq: int | None = None,
) -> str:
    """DuckDB twin of `jaccard_pairs`, including the df-cap semantics
    when `max_shingle_freq` is given (shingle universe = shingles with
    document frequency <= cap, on both sides — in lockstep with the
    Spark path)."""
    cap = ""
    if max_shingle_freq is not None:
        cap = f"""
            sh_all as (
                select {id_col} as doc,
                       unnest(list_distinct({sql_shingles(text_col, n)})) as s
                from {table}
            ),
            hot as (select s from sh_all group by s
                    having count(*) > {max_shingle_freq}),
            sh as (select doc, s from sh_all
                   where s not in (select s from hot)),"""
    else:
        cap = f"""
            sh as (
                select {id_col} as doc,
                       unnest(list_distinct({sql_shingles(text_col, n)})) as s
                from {table}
            ),"""
    return f"""
        with {cap}
        sizes as (select doc, count(*) as sz from sh group by doc),
        common as (
            select l.doc as a, r.doc as b, count(*) as common
            from sh l join sh r on l.s = r.s and l.doc < r.doc
            group by 1, 2
        )
        select a, b,
               round(common / (sa.sz + sb.sz - common)::double, {JACCARD_ROUND}) as jaccard
        from common
        join sizes sa on sa.doc = a
        join sizes sb on sb.doc = b
        where round(common / (sa.sz + sb.sz - common)::double, {JACCARD_ROUND}) >= {threshold}
    """


def containment_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Directed near-dup pairs by shingle CONTAINMENT (Broder 1997's
    asymmetric companion of resemblance): containment(a in b) =
    |S(a) ∩ S(b)| / |S(a)|. Catches subset duplication — a short doc
    embedded verbatim in a long one scores ~1.0 here while its Jaccard
    stays low — the quote/boilerplate/expansion case symmetric near-dup
    misses in an LLM training corpus.

    Output: (a: long, b: long, containment: double 6dp) for BOTH
    directions of every co-shingled pair that clears `threshold`;
    (a, b) reads "a is contained in b".

    Scale shape: identical to `jaccard_pairs` — one shingle inverted
    index, pair work proportional to co-occurring shingles, the same
    `max_shingle_freq` df-cap for boilerplate skew; the second
    direction is a projection of the same common-counts table, not a
    second join.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles_expr(F.col(text_col), n))).alias("s"),
    )
    sh = sh.persist()
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    left = sh.select(F.col("doc").alias("a"), "s")
    right = sh.select(F.col("doc").alias("b"), "s")
    common = (
        left.join(right, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .join(sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sb")), "b")
    )
    fwd = common.select(
        "a", "b", F.round(F.col("common") / F.col("sa").cast("double"), JACCARD_ROUND).alias("containment")
    )
    rev = common.select(
        F.col("b").alias("a"),
        F.col("a").alias("b"),
        F.round(F.col("common") / F.col("sb").cast("double"), JACCARD_ROUND).alias("containment"),
    )
    return fwd.union(rev).filter(F.col("containment") >= threshold)


def sql_containment_pairs(
    table: str,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_freq: int | None = None,
) -> str:
    """DuckDB twin of `containment_pairs` (both directions from one
    common-counts table, 6dp round before the threshold filter)."""
    if max_shingle_freq is not None:
        cap = f"""
            sh_all as (
                select {id_col} as doc,
                       unnest(list_distinct({sql_shingles(text_col, n)})) as s
                from {table}
            ),
            hot as (select s from sh_all group by s
                    having count(*) > {max_shingle_freq}),
            sh as (select doc, s from sh_all
                   where s not in (select s from hot)),"""
    else:
        cap = f"""
            sh as (
                select {id_col} as doc,
                       unnest(list_distinct({sql_shingles(text_col, n)})) as s
                from {table}
            ),"""
    return f"""
        with {cap}
        sizes as (select doc, count(*) as sz from sh group by doc),
        common as (
            select l.doc as a, r.doc as b, count(*) as common
            from sh l join sh r on l.s = r.s and l.doc < r.doc
            group by 1, 2
        ),
        sized as (
            select a, b, common, sa.sz as sa, sb.sz as sb
            from common
            join sizes sa on sa.doc = a
            join sizes sb on sb.doc = b
        ),
        directed as (
            select a, b, round(common / sa::double, {JACCARD_ROUND}) as containment
            from sized
            union all
            select b as a, a as b, round(common / sb::double, {JACCARD_ROUND}) as containment
            from sized
        )
        select a, b, containment from directed where containment >= {threshold}
    """
