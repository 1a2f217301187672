"""Product quantization (PQ) — Jégou, Douze & Schmid 2011 ("Product
quantization for nearest neighbor search"), public literature; no
reference implementation (/root/reference/pagerank.py has no vector
search). PQ is the 100-TB half of the ANN story next to IVF
(`ivf.py`): IVF prunes WHICH vectors to score, PQ compresses WHAT is
scored — a 64-dim float vector becomes m_sub codebook ids (bytes), and
distances are evaluated against codebook reconstructions (asymmetric
distance computation, ADC) without ever touching the original vectors.
At corpus scale the index is codes + a tiny codebook: 8 bytes/vector
instead of 256, so a 10^12-vector index fits where raw vectors cannot.

Exactness discipline (the repo's integer-moments convention): vectors
are quantized ONCE to integer micro-units (round(x * 1e6) — far below
any codebook cell size, PQ is lossy by design; both engines promote
the float32 element to double BEFORE the multiply — in float32 the
product can land exactly on a .5 tie and round away) so that every
squared-L2
term is an exact int64-in-double: |x| <= ~2e6 per element means
per-term squares <= ~4e12 and 64-dim sums <= ~3e14, all below 2^53 —
addition is associative and bit-identical in any order and any engine.
With data-derived RULE codebooks (the subvectors of the ksub smallest
ids — SQL-expressible) the whole encode + ADC pipeline is therefore
DuckDB-oracle-able end to end; k-means-TRAINED codebooks (pyspark.ml,
not SQL-expressible) are pinned by pytest recall instead.

Everything is JVM-side: codebooks are literal arrays in min-of-structs
argmin expressions (same pattern as ivf.assign_cells), and scoring is
the paper's ADC lookup-table form — each query computes its
m_sub x ksub table of subvector-to-centroid squared distances ONCE
(_lut_expr), and every candidate pair is then m_sub element_at
lookups summed (_adc_lut_dist), not a full-dim fold. No UDF, no
Python in the hot path, no shuffle for encode (a pure projection);
the broadcast/join payload for candidates is ids + codes (the 8-byte
compressed index), never raw or reconstructed vectors. The
exact-integer grid makes the LUT sum bit-identical to
reconstruct-then-fold in any addition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000  # micro-unit grid: round(x * QUANT) per element

DEFAULT_M_SUB = 8
DEFAULT_KSUB = 16


def quantize_expr(vec: Column) -> Column:
    """array<float> -> array<double> of exact integer micro-units."""
    return F.transform(
        vec.cast("array<double>"), lambda x: F.round(x * F.lit(float(QUANT)), 0)
    )


def _sqdist_sql(vec_sql: str, centroid: list[float]) -> str:
    """Squared L2 between a vector SQL expression and a literal
    centroid, as Spark-SQL text. The codebook expressions are built as
    SQL STRINGS and parsed JVM-side in one F.expr call: the Column-API
    form cost thousands of py4j round-trips to assemble (measured 4.5s
    to BUILD the encode DataFrame and 7s the ADC one at m_sub=8,
    ksub=16 — pure driver-side constant, before any action)."""
    lit = "array(" + ",".join(f"{float(x)}D" for x in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {lit}, (a, b) -> (a - b) * (a - b)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def rule_codebooks(
    emb: DataFrame,
    m_sub: int = DEFAULT_M_SUB,
    ksub: int = DEFAULT_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic data-derived codebooks: subspace sp's codebook is
    the sp-th subvector of the ksub smallest-id quantized vectors.
    SQL-expressible (the oracle recomputes it), so contract keys can
    drive the full encode + ADC plumbing. A real index would train
    per-subspace k-means instead (train_codebooks); the rule variant
    is a worse quantizer but an exact, replayable one."""
    anchors = (
        emb.select(F.col(id_col).alias("id"), quantize_expr(F.col(vec_col)).alias("qv"))
        .orderBy("id")
        .limit(ksub)
        .collect()
    )
    if len(anchors) < ksub:
        raise ValueError(f"need >= {ksub} vectors to build rule codebooks")
    dim = len(anchors[0]["qv"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    return [
        [list(r["qv"][sp * dsub:(sp + 1) * dsub]) for r in anchors]
        for sp in range(m_sub)
    ]


def train_codebooks(
    emb: DataFrame,
    m_sub: int = DEFAULT_M_SUB,
    ksub: int = DEFAULT_KSUB,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Per-subspace seeded k-means codebooks over the quantized
    vectors (pyspark.ml; m_sub tiny driver-side models). At corpus
    scale pass sample_fraction — the quantizer needs a sketch of the
    distribution, not every vector. Not SQL-expressible; the trained
    path is pinned by pytest recall (see tests)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = emb if sample_fraction is None else emb.sample(
        fraction=sample_fraction, seed=seed
    )
    qv = src.select(quantize_expr(F.col(vec_col)).alias("qv"))
    qv = qv.persist()
    try:
        dim = len(qv.first()["qv"])
        if dim % m_sub:
            raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
        dsub = dim // m_sub
        books = []
        for sp in range(m_sub):
            feats = qv.select(
                array_to_vector(
                    F.slice(F.col("qv"), sp * dsub + 1, dsub)
                ).alias("features")
            )
            model = KMeans(k=ksub, seed=seed + sp, maxIter=20).fit(feats)
            books.append([list(map(float, c)) for c in model.clusterCenters()])
        return books
    finally:
        qv.unpersist()


def _picked_sql(qv_sql: str, codebooks: list[list[list[float]]]) -> str:
    """array<struct<d, cid>> of per-subspace argmin picks (ties ->
    lower cid via struct ordering): literal min-of-structs per
    subspace, pure JVM projection — one SQL string (see _sqdist_sql
    on why strings, not Column calls)."""
    m_sub = len(codebooks)
    dsub = len(codebooks[0][0])
    per_sp = []
    for sp in range(m_sub):
        sub = f"slice({qv_sql}, {sp * dsub + 1}, {dsub})"
        scored = ",".join(
            f"struct({_sqdist_sql(sub, c)} as d, {cid} as cid)"
            for cid, c in enumerate(codebooks[sp])
        )
        per_sp.append(f"array_sort(array({scored}))[0]")
    return "array(" + ",".join(per_sp) + ")"


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode every vector. Output: id, code (array<int>, one
    codebook id per subspace), qerr (summed squared quantization error,
    exact long when the codebooks are integer-valued — always true for
    rule_codebooks)."""
    picked = _picked_sql("qv", codebooks)
    return (
        emb.select(
            F.col(id_col).alias("id"), quantize_expr(F.col(vec_col)).alias("qv")
        )
        .withColumn("picked", F.expr(picked))
        .select(
            "id",
            "qv",
            F.expr("transform(picked, s -> s.cid)").alias("code"),
            F.expr(
                "cast(aggregate(transform(picked, s -> s.d), 0.0D,"
                " (acc, v) -> acc + v) as long)"
            ).alias("qerr"),
        )
    )


def _lut_expr(qa_sql: str, codebooks: list[list[list[float]]]) -> Column:
    """Per-query ADC lookup table (Jégou et al. 2011 §4.1): lut[sp][cid]
    = squared L2 between the query's sp-th subvector and centroid cid.
    array<array<double>> of exact int64-in-double terms — computed once
    per QUERY row, so per-candidate scoring is m_sub lookups instead of
    a full-dim zip_with fold. Takes the quantized-vector column as SQL
    text (see _sqdist_sql on why strings)."""
    m_sub = len(codebooks)
    dsub = len(codebooks[0][0])
    rows = []
    for sp in range(m_sub):
        sub = f"slice({qa_sql}, {sp * dsub + 1}, {dsub})"
        rows.append(
            "array(" + ",".join(_sqdist_sql(sub, c) for c in codebooks[sp]) + ")"
        )
    return F.expr("array(" + ",".join(rows) + ")")


def _adc_lut_dist() -> Column:
    """ADC distance from the candidate's `code` column and the query's
    `lut` column: sum over subspaces of lut[sp][code[sp]] (0-based SQL
    subscripts). Exact-integer terms, so the sum is bit-identical to
    the reconstruct-then-fold form in any addition order (module
    docstring)."""
    return F.expr(
        "cast(aggregate(transform(code, (c, i) -> lut[i][c]), 0.0D,"
        " (acc, v) -> acc + v) as long)"
    )


def adc_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: queries keep their exact quantized
    vector, database vectors are represented ONLY by their PQ code
    (scored via the per-query lookup table against centroid
    reconstructions — the paper's ADC). Output: (a, b, adc_dist,
    rank), rank 1..k by (adc_dist asc, b asc), a == b excluded.

    At fixture scale the candidate set is the full table; at corpus
    scale compose with IVF pruning (ivfpq_topk) — the scoring side is
    identical. adc_dist is an exact integer (micro-unit^2) for
    integer-valued codebooks. The broadcast side is ids + m_sub-int
    codes (the compressed index itself — 8 bytes/vector, never the
    raw vectors), and per-pair work is m_sub table lookups."""
    enc = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)
    cand = enc.select(F.col("id").alias("b"), "code")
    queries = enc.select(F.col("id").alias("a"), F.col("qv").alias("qa"))
    if query_pred is not None:
        queries = queries.filter(query_pred)
    queries = queries.select("a", _lut_expr("qa", codebooks).alias("lut"))
    scored = (
        queries.crossJoin(F.broadcast(cand))
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", _adc_lut_dist().alias("adc_dist"))
    )
    w = Window.partitionBy("a").orderBy(F.asc("adc_dist"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("a", "b", "adc_dist", F.col("rank").cast("long").alias("rank"))
    )


def ivfpq_topk(
    emb: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    m_sub: int = DEFAULT_M_SUB,
    ksub: int = DEFAULT_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ: coarse cells prune the candidate set (cell-keyed
    equi-join, never all-pairs), PQ codes compress what is scored
    (ADC against reconstructions). This is the standard billion-scale
    layout (Jégou et al. 2011; IVFADC). With nprobe == nlist and
    codebooks covering every distinct subvector, the result is exactly
    the brute-force quantized-L2 top-k (tested). Output as adc_topk.
    """
    from .ivf import assign_cells, train_centroids

    if codebooks is None:
        codebooks = train_codebooks(
            emb, m_sub=m_sub, ksub=ksub, vec_col=vec_col, seed=seed
        )
    # pq_encode quantizes internally; `qv` below is the quantized vector
    enc = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)
    base = enc.select("id", "qv")
    centroids = train_centroids(base, nlist=nlist, vec_col="qv", seed=seed)
    indexed = (
        assign_cells(base, centroids, vec_col="qv", n_cells=1)
        .select("id", F.explode("cells").alias("cell"))
        .join(enc.select("id", "code"), "id")
        .select(F.col("id").alias("b"), "cell", "code")
    )
    queries = (
        assign_cells(base, centroids, vec_col="qv", n_cells=nprobe)
        .select(F.col("id").alias("a"),
                _lut_expr("qv", codebooks).alias("lut"),
                F.explode("cells").alias("cell"))
    )
    scored = (
        queries.join(indexed, "cell")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", _adc_lut_dist().alias("adc_dist"))
        .dropDuplicates(["a", "b"])
    )
    w = Window.partitionBy("a").orderBy(F.asc("adc_dist"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("a", "b", "adc_dist", F.col("rank").cast("long").alias("rank"))
    )


def _sql_rule_setup(m_sub: int, ksub: int, dsub: int) -> str:
    """Shared oracle CTEs: quantized vectors, rule codebooks, and the
    per-(vector, subspace) argmin code. All arithmetic is exact
    int64-in-double (see module docstring)."""
    return f"""
    pq_qv as materialized (
        select vec_id as id,
               list_transform(embedding,
                   x -> round(x::double * {QUANT}.0)) as qv
        from embeddings),
    pq_anchor as materialized (
        select row_number() over (order by id) - 1 as cid, qv
        from (select id, qv from pq_qv order by id limit {ksub})),
    pq_book as materialized (
        select sp, cid, qv[sp * {dsub} + 1 : (sp + 1) * {dsub}] as cvec
        from pq_anchor, (select unnest(range({m_sub})) as sp)),
    pq_dist as materialized (
        select v.id, b.sp, b.cid,
               list_sum(list_transform(range(1, {dsub} + 1),
                   i -> (v.qv[b.sp * {dsub} + i] - b.cvec[i])
                      * (v.qv[b.sp * {dsub} + i] - b.cvec[i]))) as d
        from pq_qv v, pq_book b),
    pq_code as materialized (
        select id, sp, min((d, cid))[2]::int as cid, min((d, cid))[1] as d
        from pq_dist group by id, sp)"""


def sql_pq_codes(m_sub: int = DEFAULT_M_SUB, ksub: int = DEFAULT_KSUB,
                 dim: int = 64) -> str:
    """DuckDB twin of pq_encode over the `embeddings` view: same rule
    codebooks, same argmin (ties -> lower cid via tuple min), code
    emitted as a '-'-joined string, qerr as exact long."""
    dsub = dim // m_sub
    return f"""{_sql_rule_setup(m_sub, ksub, dsub)}
    select id as vec_id,
           string_agg(cid::varchar, '-' order by sp) as code,
           sum(d)::bigint as qerr
    from pq_code group by id"""


def sql_adc_topk(k: int = 5, query_mod: int = 25,
                 m_sub: int = DEFAULT_M_SUB, ksub: int = DEFAULT_KSUB,
                 dim: int = 64) -> str:
    """DuckDB twin of adc_topk (rule codebooks, queries = ids with
    id % query_mod == 0): per-(query, candidate, subspace) distance to
    the candidate's CHOSEN centroid, summed — identical to scoring the
    concatenated reconstruction."""
    dsub = dim // m_sub
    return f"""{_sql_rule_setup(m_sub, ksub, dsub)},
    adc_sp as (
        select q.id as a, c.id as b,
               list_sum(list_transform(range(1, {dsub} + 1),
                   i -> (q.qv[c.sp * {dsub} + i] - b2.cvec[i])
                      * (q.qv[c.sp * {dsub} + i] - b2.cvec[i]))) as d
        from pq_qv q
        join pq_code c on q.id <> c.id
        join pq_book b2 on b2.sp = c.sp and b2.cid = c.cid
        where q.id % {query_mod} = 0),
    adc_pair as (
        select a, b, sum(d)::bigint as adc_dist
        from adc_sp group by a, b),
    adc_ranked as (
        select a, b, adc_dist,
               row_number() over (partition by a
                                  order by adc_dist asc, b asc) as rank
        from adc_pair)
    select a, b, adc_dist, rank::bigint as rank
    from adc_ranked where rank <= {k}"""
