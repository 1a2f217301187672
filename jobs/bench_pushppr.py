"""Locality evidence for forward-push PPR: query cost must NOT grow
with graph size (that is the operator's whole point at 10^12 docs).

Protocol: three graph sizes at CONSTANT mean degree (vertex space
scales with the edge multiplier, so the seed's neighborhood statistics
stay comparable while the graph grows 16x). Per size, in a fresh JVM
(one subprocess per size, like jobs/bench_scaling.py's levels):

  * build the graph (bench_scaling.build_graph, deterministic),
  * build the seed-independent PushIndex ONCE — this is the O(edges)
    prep a production deployment amortizes across every seed,
  * run ppr_push for three seeds against the shared index, reporting
    the median query wall and the touched-vertex count.

Expected shape (and the claim BENCH.md records): prep wall grows with
edges; QUERY wall stays roughly flat because the push loop only joins
ACTIVE state rows against the index — work is O(edges incident to
pushed vertices), bounded by eps and the degree profile, independent
of total graph size.

Usage: python jobs/bench_pushppr.py [--multipliers 50,200,800]
       (appends/updates its marker section in BENCH.md)
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SEEDS = ["site.com/p1", "site.com/p7", "site.com/p42"]
VERTS_PER_MULT = 2500  # constant mean degree: edges/verts = orders_rows/2500


def run_worker(multiplier: int) -> None:
    from jobs.bench_scaling import build_graph
    from pagerankproject_spark.graph.pushppr import build_push_index, ppr_push
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name=f"pushppr-{multiplier}",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "20g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    g = build_graph(spark, multiplier, vertices=multiplier * VERTS_PER_MULT)
    build_sec = time.time() - t0

    t0 = time.time()
    idx = build_push_index(spark, g)
    prep_sec = time.time() - t0

    walls, touched = [], []
    for seed in SEEDS:
        t1 = time.time()
        out = ppr_push(spark, g, seed, eps=1e-6, max_rounds=200, index=idx)
        touched.append(out.count())
        walls.append(time.time() - t1)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "multiplier": multiplier,
                "edges": g.num_edges,
                "vertices": g.n,
                "graph_build_sec": round(build_sec, 2),
                "index_prep_sec": round(prep_sec, 2),
                "query_walls": [round(w, 2) for w in walls],
                "query_median_sec": round(statistics.median(walls), 2),
                "touched": touched,
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multipliers", default="50,200,800")
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        run_worker(args.worker)
        return

    results = {}
    for m in (int(x) for x in args.multipliers.split(",")):
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", str(m)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = next(
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("WORKER_RESULT ")
        )
        results[m] = json.loads(line[len("WORKER_RESULT "):])
        print(line)

    ms = sorted(results)
    lo, hi = results[ms[0]], results[ms[-1]]
    growth = hi["query_median_sec"] / lo["query_median_sec"]
    size_ratio = hi["edges"] / lo["edges"]
    report = {
        "job": "ppr_push locality sweep (constant mean degree)",
        "edge_growth": f"{size_ratio:.0f}x",
        "query_wall_growth": f"{growth:.2f}x",
        "prep_growth": f"{hi['index_prep_sec'] / lo['index_prep_sec']:.1f}x",
    }
    print(json.dumps(report))

    md = [
        "### ppr_push locality: query cost vs graph size "
        "(constant mean degree)",
        "",
        "Forward push is a LOCAL operator: the index prep is O(edges) and",
        "amortized across seeds; each query joins only the active state",
        "rows against the index, so its wall must stay ~flat while the",
        "graph grows. Three sizes, fresh JVM each, eps=1e-6, median of 3",
        "seeds against one shared PushIndex:",
        "",
        "| edges | vertices | graph build s | index prep s (O(m), amortized)"
        " | query median s | touched vertices |",
        "|---|---|---|---|---|---|",
    ]
    for m in ms:
        r = results[m]
        md.append(
            f"| {r['edges']:,} | {r['vertices']:,} | "
            f"{r['graph_build_sec']} | {r['index_prep_sec']} | "
            f"{r['query_median_sec']} | {r['touched']} |"
        )
    md += [
        "",
        f"**Edges grew {report['edge_growth']}; the query wall grew "
        f"{report['query_wall_growth']} (prep {report['prep_growth']}, "
        "as expected for the O(m) amortized step).**",
        "",
        f"Reproduce: `python jobs/bench_pushppr.py --multipliers "
        f"{args.multipliers}`",
        "",
    ]
    begin = "<!-- BEGIN pushppr-locality -->"
    end = "<!-- END pushppr-locality -->"
    section = begin + "\n" + "\n".join(md) + end
    bench_path = REPO / "BENCH.md"
    text = bench_path.read_text()
    if begin in text and end in text:
        head, rest = text.split(begin, 1)
        _, tail = rest.split(end, 1)
        text = head + section + tail
    else:
        text = text.rstrip("\n") + "\n\n" + section + "\n"
    bench_path.write_text(text)
    print(f"wrote {bench_path} (pushppr locality section)")


if __name__ == "__main__":
    main()
