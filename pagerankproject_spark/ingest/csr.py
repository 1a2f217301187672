"""Per-partition CSR adjacency blocks — north_rule physical layout
("...a salted, hash-partitioned (src,dst) edge table plus per-partition
CSR adjacency blocks").

Reference anchor: the COO -> torch.sparse build step
(/root/reference/pagerank.py:72-76); the reference's single matrix
becomes one CSR block per hash partition of the src_id space.

Block schema (one row per partition):

  part_id  int      pmod(murmur3(src_id), P) — IDENTICAL to the hash
                    placement of `repartition(P, 'src_id')`, so a block
                    is exactly co-located with the rank rows whose ids
                    hash to the same partition.
  src_ids  array<long>    sorted distinct sources in the block
  indptr   array<int>     CSR row pointers, len(src_ids)+1
  dst_ids  array<long>    destinations, grouped by source
  weights  array<double>  1/outdeg weights, parallel to dst_ids

Built with ONE `mapInArrow` pass over the sorted edge partitions (numpy
inside Arrow batches — no per-row Python). The block table is tiny
relative to the edge table (3 arrays per partition) and is the layout a
100-TB deployment would persist: scanning a block streams edges in
src-sorted order with 16 bytes/edge and zero join machinery.

`spmv_csr` is the consumer: y[dst] = sum over edges w * x[src],
computed per block with numpy (np.repeat + bincount-style grouping)
after a single co-partitioned join of ranks onto blocks, then one
aggregation shuffle of the partial sums — the same two-exchange
structure as the DataFrame SpMV, with the per-edge arithmetic moved
from codegen'd JVM rows to vectorized numpy. Tests assert exact
agreement with the DataFrame path.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import GraphTables

CSR_SCHEMA = (
    "part_id int, src_ids array<long>, indptr array<int>, "
    "dst_ids array<long>, weights array<double>"
)


def build_csr_blocks(g: GraphTables) -> DataFrame:
    """weighted_edges -> one CSR block row per src_id hash partition."""
    P = g.num_partitions
    edges = (
        g.weighted_edges.select(
            F.pmod(F.hash("src_id"), F.lit(P)).alias("part_id"),
            "src_id",
            "dst_id",
            "weight",
        )
        .repartition(P, "part_id")
        .sortWithinPartitions("part_id", "src_id", "dst_id")
    )

    def to_blocks(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tables = [pa.Table.from_batches([b]) for b in batches]
        if not tables:
            return
        t = pa.concat_tables(tables)
        if t.num_rows == 0:
            return
        pid = t["part_id"].to_numpy()
        src = t["src_id"].to_numpy()
        dst = t["dst_id"].to_numpy()
        w = t["weight"].to_numpy()
        # a physical partition can hold several part_id values (value-hash
        # placement): rows are sorted by (part_id, src_id, dst_id), so each
        # part_id is one contiguous run -> one CSR block per run
        for part_id in np.unique(pid):
            sel = pid == part_id
            s, d, wt = src[sel], dst[sel], w[sel]
            uniq, counts = np.unique(s, return_counts=True)
            indptr = np.zeros(len(uniq) + 1, dtype=np.int32)
            np.cumsum(counts, out=indptr[1:])
            yield pa.RecordBatch.from_pydict(
                {
                    "part_id": pa.array([int(part_id)], pa.int32()),
                    "src_ids": pa.array([uniq.tolist()], pa.list_(pa.int64())),
                    "indptr": pa.array([indptr.tolist()], pa.list_(pa.int32())),
                    "dst_ids": pa.array([d.tolist()], pa.list_(pa.int64())),
                    "weights": pa.array([wt.tolist()], pa.list_(pa.float64())),
                }
            )

    return edges.mapInArrow(to_blocks, CSR_SCHEMA)


def spmv_csr(
    spark, csr_blocks: DataFrame, ranks: DataFrame, num_partitions: int
) -> DataFrame:
    """y = P^T x over CSR blocks: returns (dst_id, msg).

    ranks: (id, x). The rank rows are routed to their src-hash partition
    (same murmur3 placement as the blocks) and cogrouped with the one
    block of that partition; numpy does the per-edge multiply + partial
    dst aggregation; a final groupBy sums partials across blocks.
    """
    routed = ranks.select(
        F.pmod(F.hash("id"), F.lit(num_partitions)).alias("part_id"), "id", "x"
    )

    def mul(key, block_pdf, ranks_pdf):
        import pandas as pd

        if block_pdf.empty or ranks_pdf.empty:
            return pd.DataFrame({"dst_id": [], "partial": []})
        row = block_pdf.iloc[0]
        src_ids = np.asarray(row["src_ids"], dtype=np.int64)
        indptr = np.asarray(row["indptr"], dtype=np.int64)
        dst = np.asarray(row["dst_ids"], dtype=np.int64)
        w = np.asarray(row["weights"], dtype=np.float64)
        # x lookup for this block's sources (sources are a subset of the
        # ids routed to this partition)
        rid = ranks_pdf["id"].to_numpy()
        rx = ranks_pdf["x"].to_numpy()
        order = np.argsort(rid, kind="stable")
        pos = np.searchsorted(rid[order], src_ids)
        x_src = rx[order][pos]
        # expand x to edge granularity and multiply
        counts = np.diff(indptr)
        contrib = w * np.repeat(x_src, counts)
        # partial aggregation by dst within the block
        uniq_dst, inv = np.unique(dst, return_inverse=True)
        partial = np.bincount(inv, weights=contrib, minlength=len(uniq_dst))
        return pd.DataFrame({"dst_id": uniq_dst, "partial": partial})

    partials = (
        csr_blocks.groupBy("part_id")
        .cogroup(routed.groupBy("part_id"))
        .applyInPandas(mul, "dst_id long, partial double")
    )
    return partials.groupBy("dst_id").agg(F.sum("partial").alias("msg"))


# ---------------------------------------------------------------------------
# dst-partitioned on-disk blocks — the broadcast-vertex SpMV layout
# ---------------------------------------------------------------------------

@dataclass
class NpyBlockSet:
    """Handle to a materialized set of dst-partitioned CSR^T blocks.

    Physical layout: for each part p (= pmod(murmur3(dst_id), P)) four
    .npy arrays under `block_dir`: p{p}.dst (sorted unique dst ids in
    the part), p{p}.indptr (segment pointers), p{p}.src, p{p}.w (edges
    grouped by dst). Each dst id lives in EXACTLY ONE block, so the
    per-iteration partial results concatenate instead of needing a
    cross-block reduction.

    This is the single-box realization of a bucketed on-disk adjacency
    layout: iteration tasks read their block from the OS page cache
    (zero JVM->Python pipe traffic for the edge data). On a real
    cluster the same blocks live on executor-local storage (or an
    HDFS/object-store cache) bucketed by part_id, and block tasks
    schedule against their bucket — the standard persisted-bucketed-
    table story, with numpy replacing codegen for the per-edge math.
    """

    block_dir: str
    part_ids: list[int]
    num_edges: int
    parts_df: DataFrame  # one row per part, hash-placed by part_id

    def cleanup(self) -> None:
        import shutil

        self.parts_df.unpersist()
        shutil.rmtree(self.block_dir, ignore_errors=True)


def write_npy_blocks(
    spark: SparkSession, g: GraphTables, block_dir: str,
    num_blocks: int | None = None,
) -> NpyBlockSet:
    """One pass over the edge table: repartition by pmod(hash(dst_id), P),
    sort each partition by dst, write the CSR^T arrays as .npy files.
    numpy's np.save writes the raw little-endian buffer — loading is an
    mmap, so iteration reads are page-cache hits after the first touch.

    Block count is deliberately DECOUPLED from the edge table's shuffle
    partitioning: each iteration launches one task per block, and a
    measured ~20 ms serial dispatch rides every Python task (BENCH.md
    round-3 blocks section), so iterating over ~2M-edge shuffle-sized
    blocks pays 10-30x more dispatch than compute. The default sizes
    blocks at one per core wave, capped so a block's src+w arrays stay
    under ~512 MB (16 bytes/edge) of task working set — the same rule a
    real cluster would use (blocks ~ total cores, bounded by
    executor-local memory)."""
    os.makedirs(block_dir, exist_ok=True)
    P = num_blocks
    if P is None:
        cores = spark.sparkContext.defaultParallelism
        P = max(cores, -(-g.num_edges // 32_000_000), 1)
    edges = (
        g.weighted_edges.select(
            F.pmod(F.hash("dst_id"), F.lit(P)).alias("part_id"),
            "src_id",
            "dst_id",
            "weight",
        )
        .repartition(P, "part_id")
        .sortWithinPartitions("part_id", "dst_id")
    )

    def write_blocks(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tabs = [pa.Table.from_batches([b]) for b in batches]
        if not tabs:
            return
        t = pa.concat_tables(tabs)
        if t.num_rows == 0:
            return
        pid = t["part_id"].to_numpy()
        src = t["src_id"].to_numpy()
        dst = t["dst_id"].to_numpy()
        w = t["weight"].to_numpy()
        # rows are sorted by (part_id, dst_id): each part_id is one
        # contiguous run, each dst one contiguous segment within it
        for part in np.unique(pid):
            sel = pid == part
            s, d, wt = src[sel], dst[sel], w[sel]
            uniq, counts = np.unique(d, return_counts=True)
            indptr = np.zeros(len(uniq) + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            np.save(f"{block_dir}/p{part}.dst.npy", uniq)
            np.save(f"{block_dir}/p{part}.indptr.npy", indptr)
            np.save(f"{block_dir}/p{part}.src.npy", s)
            np.save(f"{block_dir}/p{part}.w.npy", wt)
            yield pa.RecordBatch.from_arrays(
                [pa.array([int(part)], pa.int32()), pa.array([len(s)], pa.int64())],
                ["part_id", "nnz"],
            )

    manifest = edges.mapInArrow(write_blocks, "part_id int, nnz long").collect()
    part_ids = sorted(r["part_id"] for r in manifest)
    parts_df = (
        spark.createDataFrame([(p,) for p in part_ids], "part_id int")
        .repartition(max(len(part_ids), 1), "part_id")
        .persist()
    )
    parts_df.count()
    return NpyBlockSet(
        block_dir=block_dir,
        part_ids=part_ids,
        num_edges=int(sum(r["nnz"] for r in manifest)),
        parts_df=parts_df,
    )


_BLOCKS_OUT_SCHEMA = "dst long, partial double"


def blocks_spmv(blocks: NpyBlockSet, x: np.ndarray) -> np.ndarray:
    """One SpMV over the block set: returns the dense vector
    y[d] = sum over in-edges w * x[src] (len(x) entries; dsts with no
    in-edges stay 0.0). Blocks own disjoint dst sets, so assembly is a
    single vectorized scatter with no summation.

    ONE Spark job, no shuffle, Arrow at both boundaries:

    * in  — P part ids; x travels as a REAL sc.broadcast (torrent
      distribution: the closure carries only the handle). Closure
      capture instead would py4j-serialize the n x 8 byte vector into
      the job command every iteration — driver-serial, and at 1000
      executors P x 8n bytes fanned out from one driver instead of a
      log-tree.
    * out — `toArrow()` fetches the (dst, partial) rows as contiguous
      Arrow buffers -> zero-copy numpy. The previous `.collect()`
      pickled ~n array elements into Python objects per iteration, a
      driver-serial cost that was the dominant share of the measured
      per-iteration floor at 120M edges (BENCH.md round-3 blocks
      section)."""
    bdir = blocks.block_dir
    sc = blocks.parts_df.sparkSession.sparkContext
    bx = sc.broadcast(x)

    def f(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        xvec = bx.value
        for b in batches:
            for part in b.column("part_id").to_pylist():
                dst = np.load(f"{bdir}/p{part}.dst.npy")
                indptr = np.load(f"{bdir}/p{part}.indptr.npy")
                src = np.load(f"{bdir}/p{part}.src.npy", mmap_mode="r")
                w = np.load(f"{bdir}/p{part}.w.npy", mmap_mode="r")
                contrib = np.asarray(w) * xvec[np.asarray(src)]
                vals = (
                    np.add.reduceat(contrib, indptr[:-1])
                    if len(dst)
                    else np.zeros(0)
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(dst, pa.int64()),
                        pa.array(vals, pa.float64()),
                    ],
                    ["dst", "partial"],
                )

    try:
        t = blocks.parts_df.mapInArrow(f, _BLOCKS_OUT_SCHEMA).toArrow()
    finally:
        bx.unpersist()
    y = np.zeros(len(x), dtype=np.float64)
    y[t["dst"].to_numpy()] = t["partial"].to_numpy()
    return y
