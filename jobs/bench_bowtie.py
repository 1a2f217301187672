#!/usr/bin/env python3
"""Bow-tie decomposition at bench scale (graph/bowtie.py).

Builds a deterministic synthetic graph whose bow-tie region counts are
known BY CONSTRUCTION, so the run both times the operator and verifies
it end-to-end at millions of edges:

  CORE         a C-cycle with chords (one SCC, diameter ~log via chords)
  IN           chains of length L, each tail feeding one core vertex
  OUT          chains of length L, each head fed by one core vertex
  TENDRIL_IN   leaves hanging off IN vertices (no out-edges)
  TUBE         IN -> u -> OUT single-hop bridges avoiding CORE
  TENDRIL_OUT  sources feeding OUT vertices (no in-edges)
  DISC         disconnected vertex pairs

All ids are arithmetic off spark.range — no RNG, no driver data.

Usage: python jobs/bench_bowtie.py [--core 1000000] [--chains 400000]
       [--chain_len 5] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build(spark, C: int, chains: int, L: int, extras: int):
    """Edge DataFrame (src, dst as url strings v<id>) with known
    region counts. `chains` chains of length L for each of IN and OUT;
    `extras` vertices for each of TENDRIL_IN / TUBE / TENDRIL_OUT and
    `extras` DISC pairs."""
    from pyspark.sql import functions as F

    I = chains * L  # noqa: E741
    O = chains * L  # noqa: E741
    in0, out0 = C, C + I
    t0, u0, t20, d0 = C + I + O, C + I + O + extras, C + I + O + 2 * extras, C + I + O + 3 * extras

    core = spark.range(C).select(
        F.col("id").alias("s"), ((F.col("id") + 1) % C).alias("d")
    ).union(
        spark.range(C).select(
            F.col("id").alias("s"), ((F.col("id") * 7 + 3) % C).alias("d")
        )
    )
    j = F.col("id")
    # IN chain step: j -> j+1 inside a chain; chain tail -> core
    in_e = spark.range(I).select(
        (in0 + j).alias("s"),
        F.when((j + 1) % L != 0, in0 + j + 1).otherwise((j * 17) % C).alias("d"),
    )
    # OUT chain: core -> chain head; j -> j+1 inside a chain
    out_heads = spark.range(chains).select(
        ((j * 19) % C).alias("s"), (out0 + j * L).alias("d")
    )
    out_e = spark.range(O).filter((j + 1) % L != 0).select(
        (out0 + j).alias("s"), (out0 + j + 1).alias("d")
    )
    tendril_in = spark.range(extras).select(
        (in0 + (j % I)).alias("s"), (t0 + j).alias("d")
    )
    tube = spark.range(extras).select(
        (in0 + (j % I)).alias("s"), (u0 + j).alias("d")
    ).union(
        spark.range(extras).select(
            (u0 + j).alias("s"), (out0 + (j % O)).alias("d")
        )
    )
    tendril_out = spark.range(extras).select(
        (t20 + j).alias("s"), (out0 + (j % O)).alias("d")
    )
    disc = spark.range(extras).select(
        (d0 + 2 * j).alias("s"), (d0 + 2 * j + 1).alias("d")
    )
    edges = core.union(in_e).union(out_heads).union(out_e).union(
        tendril_in
    ).union(tube).union(tendril_out).union(disc)
    expected = {
        "CORE": C,
        "IN": I,
        "OUT": O,
        "TENDRIL_IN": extras,
        "TUBE": extras,
        "TENDRIL_OUT": extras,
        "DISC": 2 * extras,
    }
    return (
        edges.select(
            F.concat(F.lit("v"), F.col("s")).alias("src"),
            F.concat(F.lit("v"), F.col("d")).alias("dst"),
        ),
        expected,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", type=int, default=1_000_000)
    ap.add_argument("--chains", type=int, default=400_000)
    ap.add_argument("--chain_len", type=int, default=5)
    ap.add_argument("--extras", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pagerankproject_spark.graph.bowtie import bowtie
    from pagerankproject_spark.ingest.edges import build_graph_tables
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench-bowtie",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges, expected = build(spark, args.core, args.chains, args.chain_len, args.extras)
    g = build_graph_tables(spark, edges)
    print(f"n= {g.n} edges= {g.num_edges}")

    t0 = time.time()
    res = bowtie(spark, g)
    counts = {
        r["region"]: r["cnt"]
        for r in res.regions.groupBy("region")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    wall = time.time() - t0
    print(json.dumps({"wall_sec": round(wall, 1), "sweeps": res.sweeps, "counts": counts}))
    for region, want in expected.items():
        got = counts.get(region, 0)
        assert got == want, f"{region}: expected {want}, got {got}"
    print("region counts EXACT vs construction")
    spark.stop()


if __name__ == "__main__":
    main()
