"""Corpus-trained distributional synonyms — the gensim-free completion
of operator #17 (reference /root/reference/pagerank.py:17, :259-269:
`glove-twitter-50.most_similar(term)[:5]`).

The reference expands query terms with the 5 nearest neighbors of a
downloaded GloVe model. No embedding model or network exists in this
sandbox, so the engine trains its own distributional term vectors from
the corpus it already has — entirely public methods:

  * windowed co-occurrence counts -> PPMI matrix (Turney & Pantel 2010,
    "From Frequency to Meaning"; Church & Hanks 1990 PMI). Levy &
    Goldberg (NeurIPS 2014) showed word2vec SGNS implicitly factorizes
    exactly this matrix, so PPMI rows ARE the un-factorized embedding.
  * synonym top-k = cosine similarity between PPMI rows — the classic
    distributional-similarity neighbor retrieval the GloVe call stands
    in for.

Everything is DataFrame joins/aggregations; no UDF, no collect beyond
the final top-k table. Cross-engine determinism (the repo's strictest
convention, as in simhash/bigram_logloss): every aggregation runs on
exact integers — co-occurrence counts, marginals, and the PPMI values
scaled to integer e-4 units (one round of the single ln, no unordered
float sums anywhere) — so dot products and norms are exact longs, and
the only floats are final per-row scalar expressions (one ln, one
sqrt-divide), each rounded once to 6 dp.

Scale shape (100-TB corpus): pair generation is a per-document array
transform (slice-zip per offset, fan-out <= 2*window per token — no
self-join, so a long document never produces doc_len^2 intermediates);
counts are map-side combinable; the cosine join is an inverted-index
self-join on the context term, restricted to the probe terms' rows on
the left (the CLI only ever needs the query's own terms). Integer
bounds: scaled PPMI <= 40e4 (ln of any conceivable corpus), so a dot
term is <= 1.6e11 and a long sum holds > 5e7 context terms per probe —
beyond any vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..text.analysis import sql_tokens, tokens_expr

PPMI_SCALE = 10_000  # integer e-4 units; one round of the single ln


def _offset_pairs(toks: Column, k: int) -> Column:
    """Array of (x, y) structs pairing each token with the token k
    positions to its right, via slice + arrays_zip — O(len) per row.
    (NOT element_at over a sequence of indices: the token array is an
    unmaterialized split() expression, and Catalyst re-evaluates it for
    every element_at, turning pair generation O(len * pairs) per row —
    measured 10x the whole pipeline's cost at sf0.1. Slicing evaluates
    the split a constant number of times per offset.) Guarded for
    documents shorter than k+1 tokens."""
    m = F.size(toks) - F.lit(k)
    zipped = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, F.lit(k + 1), m))
    return F.when(
        m > 0,
        F.transform(
            zipped,
            lambda s: F.struct(s["0"].alias("x"), s["1"].alias("y")),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))


def _sym_pairs(documents: DataFrame, window: int) -> DataFrame:
    """Symmetric windowed co-occurrence pairs (x, y), both directions,
    0 < |i - j| <= window, generated per document by slice-zip — linear
    in corpus size, never a positional self-join."""
    toks = tokens_expr(F.lower(F.col("text")))
    allp = F.concat(*[_offset_pairs(toks, k) for k in range(1, window + 1)])
    directed = documents.select(F.explode(allp).alias("p")).select(
        "p.x", "p.y"
    )
    return directed.unionByName(
        directed.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )


def pair_counts(documents: DataFrame, window: int = 2) -> DataFrame:
    """Exact co-occurrence count table (x, y, n_pairs) — the sufficient
    statistic for PPMI. Pair generation is per-document, so the table
    over a corpus equals the count-merge of the tables over any
    partition of it — which is what the streaming twin
    (streaming/events.py::stream_incremental_ppmi) maintains
    delta-by-delta."""
    return (
        _sym_pairs(documents, window)
        .groupBy("x", "y")
        .agg(F.count("*").alias("n_pairs"))
        .localCheckpoint(eager=True)
    )


def _stats_from_counts(nxy: DataFrame, min_count: int) -> DataFrame:
    """Attach marginals to a pair-count table: (x, y, n_pairs, n_x,
    n_y, n_tot), all exact longs. Marginals and the total run over the
    UNFILTERED pair table (min_count trims only the output rows,
    mirroring graph/walks.py::walk_ppmi)."""
    nx = nxy.groupBy("x").agg(F.sum("n_pairs").alias("n_x"))
    ny = nxy.groupBy("y").agg(F.sum("n_pairs").alias("n_y"))
    ntot = nxy.agg(F.sum("n_pairs").alias("n_tot"))
    return (
        nxy.filter(F.col("n_pairs") >= min_count)
        .join(nx, "x")
        .join(ny, "y")
        .crossJoin(ntot)
    )


def _pair_stats(
    documents: DataFrame, window: int, min_count: int
) -> DataFrame:
    return _stats_from_counts(pair_counts(documents, window), min_count)


def _pmi_ln() -> Column:
    """max(0, ln(n_xy * N / (n_x * n_y))) over _pair_stats columns —
    built lazily (Column construction needs an active SparkContext)."""
    return F.greatest(
        F.lit(0.0),
        F.log(
            F.col("n_pairs").cast("double")
            * F.col("n_tot").cast("double")
            / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
        ),
    )


def term_ppmi(
    documents: DataFrame, window: int = 2, min_count: int = 2
) -> DataFrame:
    """PPMI(x, y) over windowed term co-occurrence in `documents(text)`:

        ppmi(x, y) = max(0, ln(n_xy * N / (n_x * n_y)))

    Counts and marginals are exact integers (_pair_stats); the single
    ln is rounded once to 6 dp. Output: x, y, n_pairs (long), ppmi
    (double) — symmetric (both directions present).
    """
    return ppmi_from_counts(pair_counts(documents, window), min_count)


def ppmi_from_counts(nxy: DataFrame, min_count: int = 2) -> DataFrame:
    """Finish PPMI from a maintained (x, y, n_pairs) count table —
    term_ppmi == ppmi_from_counts(pair_counts(docs)), and the streaming
    twin calls this on its delta-merged table so the stream result is
    the batch result on the prefix by construction."""
    return _stats_from_counts(nxy, min_count).select(
        "x", "y", "n_pairs", F.round(_pmi_ln(), 6).alias("ppmi")
    )


def _scaled_vectors(
    documents: DataFrame, window: int, min_count: int
) -> DataFrame:
    """PPMI rows as exact-integer vectors: (x, y, s) with
    s = round(ln-expression * PPMI_SCALE) as long, s > 0. ONE rounding
    of the single float op — never round-6dp-then-rescale, which would
    manufacture .5-boundary halves at the 4th decimal."""
    s = F.round(_pmi_ln() * F.lit(float(PPMI_SCALE)), 0).cast("long")
    return (
        _pair_stats(documents, window, min_count)
        .select("x", "y", s.alias("s"))
        .filter(F.col("s") > 0)
    )


def term_synonyms(
    documents: DataFrame,
    probes: DataFrame | list[str] | int = 10,
    k: int = 5,
    window: int = 2,
    min_count: int = 2,
    max_context_df: int | None = None,
) -> DataFrame:
    """Top-k distributional synonyms per probe term: cosine similarity
    between integer-scaled PPMI rows.

    `probes`: a list of terms, a 1-column DataFrame (term), or an int P
    = the P globally most frequent tokens (count desc, term asc — the
    deterministic default the contract key uses). cosine =
    dot / (sqrt(n_a) * sqrt(n_b)) with dot and both norms exact longs;
    the one float expression is rounded to 6 dp. Ties (and the rank
    cut) break by neighbor asc — same ordering contract as
    file_synonyms. Output: term, neighbor, cosine, rank (1-based).

    `max_context_df`: drop context terms shared by more than this many
    distinct terms BEFORE norms and dots (so the cosine stays a true
    cosine over the capped vectors) — the repo's hub df-cap
    (cocitation/adamic_adar) at the context-join level. PPMI already
    zeroes most stopword contexts (pmi <= 0 for independent-rate
    co-occurrence, and s > 0 entries are pruned), so the cap is a
    web-scale belt-and-braces bound on the inverted-index fan-out, not
    a quality knob; None (the contract key's setting) disables it.
    Deterministic: the cap is an exact integer count.
    """
    spark = documents.sparkSession
    vec = _scaled_vectors(documents, window, min_count).localCheckpoint(
        eager=True
    )
    if max_context_df is not None:
        keep = (
            vec.groupBy("y")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_context_df)
            .select("y")
        )
        vec = vec.join(keep, "y")
    norms = vec.groupBy("x").agg(F.sum(F.col("s") * F.col("s")).alias("nrm"))

    if isinstance(probes, int):
        toks = tokens_expr(F.lower(F.col("text")))
        probe_df = (
            documents.select(F.explode(toks).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("term"))
            .limit(probes)
            .select("term")
        )
    elif isinstance(probes, DataFrame):
        probe_df = probes.select(F.col(probes.columns[0]).alias("term"))
    else:
        probe_df = spark.createDataFrame(
            [(t,) for t in probes], "term string"
        )

    a = (
        vec.join(
            F.broadcast(probe_df.select(F.col("term").alias("x"))), "x"
        )
        .select(F.col("x").alias("term"), "y", F.col("s").alias("sa"))
    )
    b = vec.select(
        F.col("x").alias("neighbor"), "y", F.col("s").alias("sb")
    )
    dots = (
        a.join(b, "y")
        .filter(F.col("term") != F.col("neighbor"))
        .groupBy("term", "neighbor")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot"))
    )
    cos = (
        dots.join(norms.select(F.col("x").alias("term"), F.col("nrm").alias("na")), "term")
        .join(norms.select(F.col("x").alias("neighbor"), F.col("nrm").alias("nb")), "neighbor")
        .select(
            "term",
            "neighbor",
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        cos.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("term", "neighbor", "cosine", "rank")
    )


def corpus_synonyms(
    spark,
    documents: DataFrame | str,
    terms: list[str],
    top_k: int = 5,
    window: int = 2,
    min_count: int = 2,
):
    """SynonymProvider trained on a corpus for a known term set — the
    CLI seam (`--synonyms_corpus`): the query's positive terms are known
    up front, so ONE Spark job computes their top-k neighbors and the
    provider is a driver-side dict lookup, exactly the shape
    file_synonyms returns (score desc, neighbor asc, truncated)."""
    if isinstance(documents, str):
        documents = spark.read.parquet(documents)
    table: dict[str, list[tuple[str, float]]] = {}
    if terms:
        rows = term_synonyms(
            documents,
            probes=[t.lower() for t in dict.fromkeys(terms)],
            k=top_k,
            window=window,
            min_count=min_count,
        ).collect()
        for r in rows:
            table.setdefault(r["term"], []).append(
                (r["neighbor"], float(r["cosine"]))
            )

    def provider(term: str) -> list[tuple[str, float]]:
        return table.get(term.lower(), [])

    return provider


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def _sql_pair_ctes(window: int, min_count: int) -> str:
    """Shared CTE chain `syn_vec` ending in the integer-scaled PPMI
    vectors — same slice-zip pair generation, same unfiltered marginals,
    same single-ln scaling as the Spark side."""
    tk = sql_tokens("lower(text)")
    offs = " || ".join(
        f"list_transform(range(1, greatest(len(tk) - {k}, 0) + 1), "
        f"i -> [tk[i], tk[i + {k}]])"
        for k in range(1, window + 1)
    )
    return f"""
    syn_toks as (select {tk} as tk from documents),
    syn_prs as (select unnest({offs}) as p from syn_toks),
    syn_dir as (select p[1] as x, p[2] as y from syn_prs
                union all
                select p[2] as x, p[1] as y from syn_prs),
    syn_nxy as materialized (
        select x, y, count(*)::bigint as n_pairs from syn_dir group by 1, 2),
    syn_nx as (select x, sum(n_pairs)::bigint as n_x from syn_nxy group by 1),
    syn_ny as (select y, sum(n_pairs)::bigint as n_y from syn_nxy group by 1),
    syn_nt as (select sum(n_pairs)::bigint as n_tot from syn_nxy),
    syn_vec as (
        select x, y,
               round(greatest(0.0,
                   ln(n_pairs::double * n_tot::double
                      / (n_x::double * n_y::double))) * {PPMI_SCALE})::bigint
                   as s
        from syn_nxy join syn_nx using (x) join syn_ny using (y)
             cross join syn_nt
        where n_pairs >= {int(min_count)}
          and round(greatest(0.0,
                  ln(n_pairs::double * n_tot::double
                     / (n_x::double * n_y::double))) * {PPMI_SCALE})::bigint > 0
    )"""


def sql_term_ppmi(window: int = 2, min_count: int = 2) -> str:
    """DuckDB twin of term_ppmi (full statement)."""
    tk = sql_tokens("lower(text)")
    offs = " || ".join(
        f"list_transform(range(1, greatest(len(tk) - {k}, 0) + 1), "
        f"i -> [tk[i], tk[i + {k}]])"
        for k in range(1, window + 1)
    )
    return f"""
    with
    syn_toks as (select {tk} as tk from documents),
    syn_prs as (select unnest({offs}) as p from syn_toks),
    syn_dir as (select p[1] as x, p[2] as y from syn_prs
                union all
                select p[2] as x, p[1] as y from syn_prs),
    syn_nxy as materialized (
        select x, y, count(*)::bigint as n_pairs from syn_dir group by 1, 2),
    syn_nx as (select x, sum(n_pairs)::bigint as n_x from syn_nxy group by 1),
    syn_ny as (select y, sum(n_pairs)::bigint as n_y from syn_nxy group by 1),
    syn_nt as (select sum(n_pairs)::bigint as n_tot from syn_nxy)
    select x, y, n_pairs,
           round(greatest(0.0,
               ln(n_pairs::double * n_tot::double
                  / (n_x::double * n_y::double))), 6) as ppmi
    from syn_nxy join syn_nx using (x) join syn_ny using (y)
         cross join syn_nt
    where n_pairs >= {int(min_count)}"""


def sql_term_synonyms(
    probes: int = 10,
    k: int = 5,
    window: int = 2,
    min_count: int = 2,
    max_context_df: int | None = None,
) -> str:
    """DuckDB twin of term_synonyms with the int-probes default (the P
    most frequent tokens, count desc / term asc); `max_context_df`
    mirrors the engine's context df-cap (applied before norms/dots)."""
    tk = sql_tokens("lower(text)")
    cap_cte = (
        f"""syn_capped as (
        select v.* from syn_vec v
        join (select y from syn_vec group by y
              having count(*) <= {int(max_context_df)}) c using (y)),"""
        if max_context_df is not None
        else "syn_capped as (select * from syn_vec),"
    )
    return f"""
    with
    {_sql_pair_ctes(window, min_count).strip().lstrip()},
    {cap_cte}
    syn_norm as (select x, sum(s * s)::bigint as nrm from syn_capped group by 1),
    syn_probe as (
        select term from (
            select unnest({tk}) as term from documents
        ) group by term
        order by count(*) desc, term asc limit {int(probes)}),
    syn_dot as (
        select a.x as term, b.x as neighbor, sum(a.s * b.s)::bigint as dot
        from syn_capped a
        join syn_probe p on p.term = a.x
        join syn_capped b using (y)
        where a.x <> b.x
        group by 1, 2),
    syn_cos as (
        select term, neighbor,
               round(dot::double / (sqrt(na.nrm::double) * sqrt(nb.nrm::double)), 6)
                   as cosine
        from syn_dot
        join syn_norm na on na.x = term
        join syn_norm nb on nb.x = neighbor)
    select term, neighbor, cosine, rank from (
        select term, neighbor, cosine,
               row_number() over (partition by term
                                  order by cosine desc, neighbor asc)::bigint
                   as rank
        from syn_cos)
    where rank <= {int(k)}"""
