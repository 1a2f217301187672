"""Personalized PageRank by forward push (Andersen, Chung & Lang,
"Local Graph Partitioning using PageRank Vectors", FOCS 2006; directed
forward-push as used by FORA, Wang et al. SIGMOD 2017 — both public).

The deterministic LOCAL counterpart of the engine's Monte-Carlo PPR
(graph/walks.py::ppr_from_walks): instead of ranking the whole graph
(graph/pagerank.py) or sampling walks, maintain per-vertex
(estimate p, residual r) with r(seed)=1, and repeatedly PUSH every
vertex whose residual is large relative to its out-degree:

    active(u):  r(u) > eps * outdeg'(u)
    push:       p(u) += (1-d) * r(u)
                r(t) += d * r(u) * w(u,t)   for each out-edge (u,t)
                r(u)  = 0
    (dangling u routes d*r(u) back to the seed — the same
    teleport-to-seed convention as personalized PageRank with an
    indicator vector; realised as a synthetic (u -> seed, w=1) edge,
    so outdeg'(dangling) = 1 and ONE join rule covers every vertex.)

This engine runs the BATCH-SYNCHRONOUS variant: each round pushes ALL
currently-active vertices in one DataFrame job. At termination
p approximates the damped personalized PageRank with per-vertex
residual error below eps * outdeg' (the ACL invariant
ppr = p + sum_v r(v) * ppr_v is preserved by every push).

Scale shape — this is the operator's point at 10^12 documents: the
iteration STATE holds only TOUCHED vertices (it starts as the single
seed row and grows with the push frontier), and each round joins only
the ACTIVE rows against the pre-partitioned augmented edge table — a
worklist algorithm end-to-end, cost O(edges incident to pushed
vertices), independent of graph size. Per round exactly ONE Spark job:
the next-round active count rides the localCheckpoint as an
Observation. Messages carry the destination's out-degree (min-merged),
so new frontier vertices join nothing.

`ppr_push_incremental` extends the same machinery to EVOLVING graphs
(the engine's incremental family: CC, SCC, rank, triangles, MSF —
now PPR): the push invariant pins the residual that reconciles an old
estimate with the new topology, and pushing those signed residuals
costs work proportional to the delta's influence, not the graph.

Determinism / oracle: same story as the PageRank contract key — both
engines run the identical equations and active rule; unordered float
summation differs only in the last ulps (~1e-16) while the active
threshold (eps = 1e-4 scale) and the 6dp output rounding are decisively
above that noise floor. The DuckDB twin replays the same synchronous
rounds as a recursive CTE (self-row trick, change flag windowed over
the new state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from dataclasses import dataclass

from ..ingest.edges import GraphTables
from ..session import no_aqe

DANGLING_SENTINEL = -1  # aug rows routing dangling mass; re-aimed at the
                        # query's seed at message time, so ONE index
                        # serves every seed


@dataclass
class PushIndex:
    """Seed-independent push index: the augmented edge table (dangling
    rows target DANGLING_SENTINEL) and outdeg' per vertex. Build ONCE
    per graph snapshot (O(edges) prep), run ANY number of local pushes
    against it — at corpus scale the prep is amortized across seeds
    exactly like pagerank_topics amortizes its edge scan across
    personalization vectors.

    Two physical forms:

    * in-memory (``path=None``): the aug DataFrame persisted and
      hash-partitioned — but every push round's join is a broadcast of
      the tiny state against a FULL scan of the cached table, so each
      round costs O(edges/cores) regardless of how local the push is
      (jobs/bench_pushppr.py measured exactly this: 16x edges -> 4.4x
      query wall). Right only when the same session also runs global
      operators that want the cache.
    * bucket-partitioned parquet (``path=...``): aug written once as
      ``bkt=src_id % buckets`` hive partitions. Each round collects the
      active ids (a worklist-sized driver list, house collect policy),
      and reads ONLY the touched buckets via literal partition filters
      — Spark's partition pruning turns the file layout into the
      adjacency index, making query I/O O(edges incident to pushed
      vertices), independent of graph size. This is the 10^12-document
      form."""

    aug: DataFrame
    od_aug: DataFrame
    path: str | None = None
    buckets: int = 0

    def unpersist(self) -> None:
        for df in (self.aug, self.od_aug):
            try:
                df.unpersist()
            except Exception:
                pass


def build_push_index(
    spark: SparkSession,
    g: GraphTables,
    path: str | None = None,
    buckets: int = 256,
) -> PushIndex:
    od = g.weighted_edges.groupBy("src_id").agg(
        F.count("*").cast("long").alias("od")
    )
    dangling = g.vertices.select(F.col("id").alias("src_id")).join(
        od, "src_id", "left_anti"
    )
    aug = g.weighted_edges.select("src_id", "dst_id", "weight").unionByName(
        dangling.select(
            "src_id",
            F.lit(DANGLING_SENTINEL).cast("long").alias("dst_id"),
            F.lit(1.0).alias("weight"),
        )
    )
    # outdeg' (dangling -> 1) of the DESTINATION rides each edge so new
    # frontier vertices learn their threshold from the message itself;
    # sentinel rows keep a null od_dst (their mass lands on the seed,
    # which is in the state from round 0 and knows its own threshold)
    od_aug = aug.groupBy("src_id").agg(F.count("*").cast("long").alias("od"))
    aug = aug.join(
        od_aug.select(
            F.col("src_id").alias("dst_id"), F.col("od").alias("od_dst")
        ),
        "dst_id",
        "left",
    )
    if path is not None:
        (
            aug.withColumn(
                "bkt", F.pmod(F.col("src_id"), F.lit(buckets)).cast("int")
            )
            .repartition("bkt")
            .write.mode("overwrite")
            .partitionBy("bkt")
            .parquet(path)
        )
        od_cached = od_aug.persist()
        od_cached.count()
        return PushIndex(
            aug=spark.read.parquet(path),
            od_aug=od_cached,
            path=path,
            buckets=buckets,
        )
    aug = aug.repartition(g.num_partitions, "src_id").persist()
    aug.count()
    return PushIndex(aug=aug, od_aug=od_aug)


def ppr_push(
    spark: SparkSession,
    g: GraphTables,
    seed_url: str,
    damping: float = 0.85,
    eps: float = 1e-4,
    max_rounds: int = 60,
    index: PushIndex | None = None,
) -> DataFrame:
    """Forward-push PPR from `seed_url`; returns (url, p) for every
    vertex with positive estimate, p rounded to 6dp. Pass a prebuilt
    `index` to amortize the O(edges) prep across seeds (caller keeps
    ownership and unpersists it)."""
    if not 0 < damping < 1:
        raise ValueError("ppr_push: damping must be in (0,1)")
    if eps <= 0:
        raise ValueError("ppr_push: eps must be positive")
    seed_id = _resolve_seed(g, seed_url)
    owned = index is None
    idx = index or build_push_index(spark, g)
    seed_od = idx.od_aug.filter(F.col("src_id") == seed_id).collect()[0]["od"]

    state = spark.createDataFrame(
        [(seed_id, 0.0, 1.0, seed_od)], "id long, p double, r double, od long"
    ).localCheckpoint(eager=True)
    state = _run_loop(
        spark, idx, state, float(damping), eps, max_rounds, seed_id
    )
    return _emit(g, idx, state, owned)


def ppr_push_incremental(
    spark: SparkSession,
    g: GraphTables,
    prev: DataFrame,
    seed_url: str,
    damping: float = 0.85,
    eps: float = 1e-4,
    max_rounds: int = 60,
    index: PushIndex | None = None,
) -> DataFrame:
    """Maintain a forward-push PPR estimate across a graph change
    (Gauss-Southwell dynamic update — Ohsaka, Maehara & Kawarabayashi,
    "Efficient PageRank Tracking in Evolving Networks", KDD 2015;
    Zhang, Lofgren & Goel, KDD 2016 — both public).

    `prev` is a previous `ppr_push` output (url, p) from an EARLIER
    snapshot; `g` is the NEW graph (e.g. after `append_edges`). The
    push invariant  exact = p + F(r),  F(r) = (1-d) r + d P^T F(r),
    pins the residual that makes ANY estimate p consistent on the new
    graph:

        r  =  e_seed  +  (d * P_aug^T p  -  p) / (1 - d)

    (one join+agg to compute; identically zero when p is already the
    new graph's exact answer). Pushing these SIGNED residuals with the
    same loop (threshold on |r|) converges to the same eps-guarantee
    as a cold run while doing work proportional to the CHANGE, not the
    graph: the residual is supported only where the delta's influence
    reaches. Intended for edge additions (reachability never shrinks,
    so stale positive mass only gets corrected, not stranded).
    """
    if not 0 < damping < 1:
        raise ValueError("ppr_push_incremental: damping must be in (0,1)")
    if eps <= 0:
        raise ValueError("ppr_push_incremental: eps must be positive")
    d = float(damping)
    seed_id = _resolve_seed(g, seed_url)
    owned = index is None
    idx = index or build_push_index(spark, g)
    aug = idx.aug

    p0 = prev.join(g.vertices, "url").select("id", F.col("p").alias("p"))
    incoming = (
        p0.join(aug, p0.id == aug.src_id)
        .groupBy(
            F.when(F.col("dst_id") == DANGLING_SENTINEL, F.lit(seed_id))
            .otherwise(F.col("dst_id"))
            .alias("id")
        )
        .agg(F.sum(F.lit(d) * F.col("p") * F.col("weight")).alias("m"))
    )
    state = (
        p0.join(incoming, "id", "full")
        .select(
            "id",
            F.coalesce("p", F.lit(0.0)).alias("p"),
            (
                (F.coalesce("m", F.lit(0.0)) - F.coalesce("p", F.lit(0.0)))
                / F.lit(1.0 - d)
                + F.when(F.col("id") == seed_id, 1.0).otherwise(0.0)
            ).alias("r"),
        )
        .join(idx.od_aug.select(F.col("src_id").alias("id"), "od"), "id")
        .localCheckpoint(eager=True)
    )
    state = _run_loop(spark, idx, state, d, eps, max_rounds, seed_id)
    return _emit(g, idx, state, owned)


def _resolve_seed(g: GraphTables, seed_url: str) -> int:
    seed_rows = g.vertices.filter(F.col("url") == seed_url).collect()
    if not seed_rows:
        raise ValueError(f"ppr_push: seed url not in graph: {seed_url!r}")
    return int(seed_rows[0]["id"])


def _run_loop(
    spark: SparkSession,
    idx: PushIndex,
    state: DataFrame,
    d: float,
    eps: float,
    max_rounds: int,
    seed_id: int,
) -> DataFrame:
    if idx.path is not None:
        return _push_loop_pruned(
            spark, idx, state, d, eps, max_rounds, seed_id
        )
    return _push_loop(spark, idx.aug, state, d, eps, max_rounds, seed_id)


def _push_loop_pruned(
    spark: SparkSession,
    idx: PushIndex,
    state: DataFrame,
    d: float,
    eps: float,
    max_rounds: int,
    seed_id: int,
) -> DataFrame:
    """Worklist rounds against the bucket-partitioned parquet index:
    collect the active ids (worklist-sized), read ONLY their buckets
    (literal partition filters -> partition pruning), broadcast the
    residuals into the pruned scan. Two actions per round (worklist
    collect + checkpoint) buys query I/O independent of graph size —
    the tradeoff jobs/bench_pushppr.py quantifies."""
    with no_aqe(spark):
        for _ in range(max_rounds):
            active = (
                state.filter(F.abs(F.col("r")) > F.lit(eps) * F.col("od"))
                .select("id", "r")
                .collect()
            )
            if not active:
                break
            ids = [int(row["id"]) for row in active]
            bkts = sorted({i % idx.buckets for i in ids})
            rmap = spark.createDataFrame(
                [(int(row["id"]), float(row["r"])) for row in active],
                "id long, r double",
            )
            adj = idx.aug.filter(F.col("bkt").isin(bkts)).filter(
                F.col("src_id").isin(ids)
            )
            msgs = (
                adj.join(F.broadcast(rmap), adj.src_id == rmap.id)
                .groupBy(
                    F.when(
                        F.col("dst_id") == DANGLING_SENTINEL, F.lit(seed_id)
                    )
                    .otherwise(F.col("dst_id"))
                    .alias("id")
                )
                .agg(
                    F.sum(F.lit(d) * F.col("r") * F.col("weight")).alias("m"),
                    F.min("od_dst").alias("m_od"),
                )
            )
            staged = state.withColumn(
                "act", F.abs(F.col("r")) > F.lit(eps) * F.col("od")
            )
            merged = staged.join(msgs, "id", "full").select(
                "id",
                (
                    F.coalesce("p", F.lit(0.0))
                    + F.when(
                        F.coalesce("act", F.lit(False)),
                        F.lit(1.0 - d) * F.col("r"),
                    ).otherwise(0.0)
                ).alias("p"),
                (
                    F.when(
                        F.coalesce("act", F.lit(False)), F.lit(0.0)
                    ).otherwise(F.coalesce("r", F.lit(0.0)))
                    + F.coalesce("m", F.lit(0.0))
                ).alias("r"),
                F.coalesce("od", "m_od").alias("od"),
            )
            state = merged.localCheckpoint(eager=True)
    return state


def _push_loop(
    spark: SparkSession,
    aug: DataFrame,
    state: DataFrame,
    d: float,
    eps: float,
    max_rounds: int,
    seed_id: int,
) -> DataFrame:
    """The batch-synchronous push rounds; |r| threshold handles both
    the cold non-negative case (where abs is the identity, so the cold
    path's oracle parity is untouched) and the signed incremental one.
    """
    with no_aqe(spark):
        for _ in range(max_rounds):
            staged = state.withColumn(
                "act", F.abs(F.col("r")) > F.lit(eps) * F.col("od")
            )
            msgs = (
                staged.filter("act")
                .join(aug, staged.id == aug.src_id)
                .groupBy(
                    F.when(
                        F.col("dst_id") == DANGLING_SENTINEL, F.lit(seed_id)
                    )
                    .otherwise(F.col("dst_id"))
                    .alias("id")
                )
                .agg(
                    F.sum(F.lit(d) * F.col("r") * F.col("weight")).alias("m"),
                    F.min("od_dst").alias("m_od"),
                )
            )
            obs = Observation()
            merged = (
                staged.join(msgs, "id", "full")
                .select(
                    "id",
                    (
                        F.coalesce("p", F.lit(0.0))
                        + F.when(
                            F.coalesce("act", F.lit(False)),
                            F.lit(1.0 - d) * F.col("r"),
                        ).otherwise(0.0)
                    ).alias("p"),
                    (
                        F.when(
                            F.coalesce("act", F.lit(False)), F.lit(0.0)
                        ).otherwise(F.coalesce("r", F.lit(0.0)))
                        + F.coalesce("m", F.lit(0.0))
                    ).alias("r"),
                    F.coalesce("od", "m_od").alias("od"),
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(
                            F.abs(F.col("r")) > F.lit(eps) * F.col("od"), 1
                        ).otherwise(0)
                    ).alias("active"),
                )
            )
            state = merged.localCheckpoint(eager=True)
            if int(obs.get["active"] or 0) == 0:
                break
    return state


def _emit(
    g: GraphTables, idx: PushIndex, state: DataFrame, owned: bool
) -> DataFrame:
    out = (
        state.filter(F.col("p") > 0)
        .join(g.vertices, state.id == g.vertices.id)
        .select("url", F.round("p", 6).alias("p"))
        .localCheckpoint(eager=True)
    )
    if owned:
        idx.unpersist()
    return out


def sql_ppr_push(
    seed_url: str,
    damping: float = 0.85,
    eps: float = 1e-4,
    max_rounds: int = 60,
) -> str:
    """DuckDB twin over the shared graph CTEs (edges/vertices):
    identical synchronous push rounds as a recursive CTE. State rows
    carry (i, v, p, r); the previous state reaches the step through
    the self-row trick; the recursion gates on the windowed
    next-active flag and the round counter."""
    d = float(damping)
    return f"""
odt as (select src, count(*)::bigint as od from edges group by src),
dang as (
  select url from vertices where url not in (select src from edges)
),
aug as materialized (
  select e.src, e.dst, 1.0 / o.od as w
  from edges e join odt o on o.src = e.src
  union all
  select url, '{seed_url}', 1.0 from dang
),
oda as materialized (
  select src, count(*)::bigint as od from aug group by src
),
augw as materialized (
  select src, dst, w, 0 as own from aug
  union all
  select url, url, 0.0, 1 from vertices
),
push as (
  with recursive st(i, v, p, r, chg) as (
    select 0, '{seed_url}', 0.0::double, 1.0::double, 1
    union all
    select i + 1, v, p2, r2,
           max(case when r2 > {eps} * od.od then 1 else 0 end) over () as chg
    from (
      select s.i as i, e.dst as v,
             coalesce(min(s.p) filter (where e.own = 1), 0.0)
               + case when coalesce(
                          min(case when s.act then 1 else 0 end)
                              filter (where e.own = 1), 0) = 1
                      then {1.0 - d} * min(s.r) filter (where e.own = 1)
                      else 0.0 end as p2,
             case when coalesce(
                      min(case when s.act then 1 else 0 end)
                          filter (where e.own = 1), 0) = 1
                  then 0.0
                  else coalesce(min(s.r) filter (where e.own = 1), 0.0) end
               + coalesce(
                   sum({d} * s.r * e.w)
                       filter (where e.own = 0 and s.act), 0.0) as r2
      from (
        select st.*, st.r > {eps} * o.od as act
        from st join oda o on o.src = st.v
      ) s
      join augw e on e.src = s.v
      where s.chg = 1 and s.i < {max_rounds}
      group by s.i, e.dst
    )
    join oda od on od.src = v
  )
  select v, p from st where i = (select max(i) from st)
)
select v as url, round(p, 6) as p from push where p > 0"""
