"""IVF (inverted-file) approximate nearest neighbors — the coarse-
quantizer scale path next to the random-hyperplane LSH in `lsh.py`.

Recipe (classic IVF-Flat, public):
  1. train `nlist` centroids with seeded k-means (pyspark.ml, one pass
     over a sample/full table — a tiny model that lives on the driver);
  2. index: assign every vector to its nearest centroid (cell). The
     assignment is a pure JVM projection — centroids are literals in a
     min-of-structs expression, so no UDF, no shuffle;
  3. search: each query probes its `nprobe` nearest cells and scores
     ONLY vectors in those cells (a cell-keyed equi-join replaces the
     quadratic cross join), exact cosine within candidates, top-k with
     deterministic ties.

Scale: the join is keyed on cell id (nlist keys, tune nlist ~ sqrt(N)
per IVF practice); per-cell candidate lists bound the work per task,
and cells are independent — skew handled by raising nlist. With
nprobe == nlist the result is EXACTLY the brute-force top-k (tested);
recall degrades gracefully as nprobe shrinks.

Not SQL-oracle-able (k-means training); pytest pins nprobe==nlist
equality with brute force plus recall/determinism on clustered data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .cosine import SIM_ROUND, cosine_expr

DEFAULT_NLIST = 16
DEFAULT_NPROBE = 4


def train_centroids(
    emb: DataFrame,
    nlist: int = DEFAULT_NLIST,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Seeded k-means centroids as plain Python lists (driver-side
    model; nlist x dim floats). At corpus scale pass `sample_fraction`
    (seeded, deterministic) — the quantizer needs only a sketch of the
    distribution, not every vector."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = emb if sample_fraction is None else emb.sample(
        fraction=sample_fraction, seed=seed
    )
    feats = src.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=nlist, seed=seed, maxIter=20).fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    n_cells: int = 1,
) -> DataFrame:
    """Adds `cells`: array of the `n_cells` nearest centroid ids, by
    ascending distance (ties -> lower id). Pure JVM expression — the
    centroid table is literal, no UDF, no shuffle."""
    vec = F.col(vec_col).cast("array<double>")
    scored = F.array(
        *[
            F.struct(_sqdist(vec, c).alias("d"), F.lit(i).alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    ordered = F.array_sort(scored)  # struct order: d asc, cid asc
    cells = F.transform(F.slice(ordered, 1, n_cells), lambda s: s["cid"])
    return emb.withColumn("cells", cells)


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    nlist: int = DEFAULT_NLIST,
    nprobe: int = DEFAULT_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors for every vector.

    Output: (a, b, sim, rank) — for query a, its rank-th neighbor b
    (rank 1..k, ties by sim desc then b asc; a == b excluded).
    """
    if centroids is None:
        centroids = train_centroids(emb, nlist=nlist, vec_col=vec_col, seed=seed)

    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    indexed = (
        assign_cells(base, centroids, vec_col="v", n_cells=1)
        .select("id", "v", F.explode("cells").alias("cell"))
    )
    queries = (
        assign_cells(base, centroids, vec_col="v", n_cells=nprobe)
        .select(
            F.col("id").alias("a"),
            F.col("v").alias("va"),
            F.explode("cells").alias("cell"),
        )
    )
    cand = queries.join(
        indexed.select(F.col("id").alias("b"), F.col("v").alias("vb"), "cell"),
        "cell",
    ).filter(F.col("a") != F.col("b"))
    scored = cand.select(
        "a",
        "b",
        cosine_expr(
            F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
        ).alias("sim"),
    ).dropDuplicates(["a", "b"])
    w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("a", "b", F.round("sim", SIM_ROUND).alias("sim"), "rank")
    )
