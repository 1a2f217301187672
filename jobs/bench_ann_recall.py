"""ANN recall/latency operating curve at sf0.1 (VERDICT r3 item 7).

The engine's 100-TB similarity story is IVF / PQ / IVFADC
(similarity/ivf.py, similarity/pq.py); their correctness was
pytest-gated at small n but no measured recall-vs-wall curve existed.
This job sweeps nlist/nprobe (IVF) and m_sub/ksub (PQ ADC) on the
sf0.1 embeddings table (2000 x 64-dim unit vectors, so cosine and L2
rankings coincide) against the exact brute-force top-k and reports
recall@10 + wall per operating point.

Usage: python jobs/bench_ann_recall.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _topk_sets(rows, a_col, b_col):
    out = {}
    for r in rows:
        out.setdefault(r[a_col], set()).add(r[b_col])
    return out


def _recall(approx: dict, exact: dict) -> float:
    num = den = 0
    for a, want in exact.items():
        got = approx.get(a, set())
        num += len(got & want)
        den += len(want)
    return num / max(den, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pagerankproject_spark.session import get_spark
    from pagerankproject_spark.similarity.cosine import cosine_topk
    from pagerankproject_spark.similarity.ivf import ivf_topk
    from pagerankproject_spark.similarity.pq import (
        adc_topk,
        ivfpq_topk,
        train_codebooks,
    )

    spark = get_spark(
        app_name="bench-ann-recall",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    emb = spark.read.parquet(str(Path(args.sf_dir) / "embeddings.parquet"))
    emb = emb.persist()
    n = emb.count()

    t0 = time.time()
    exact = _topk_sets(
        cosine_topk(emb, k=args.k).collect(), "query_id", "neighbor_id"
    )
    brute_wall = time.time() - t0

    results = {"n": n, "k": args.k,
               "brute_wall_sec": round(brute_wall, 2),
               "ivf": [], "pq_adc": [], "ivfpq": []}

    for nlist in (16, 64):
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            approx = _topk_sets(
                ivf_topk(emb, k=args.k, nlist=nlist, nprobe=nprobe).collect(),
                "a", "b",
            )
            results["ivf"].append(
                {"nlist": nlist, "nprobe": nprobe,
                 "recall": round(_recall(approx, exact), 4),
                 "wall_sec": round(time.time() - t0, 2)}
            )

    for m_sub, ksub in ((4, 16), (8, 16), (8, 64), (16, 64)):
        t0 = time.time()
        cb = train_codebooks(emb, m_sub=m_sub, ksub=ksub)
        approx = _topk_sets(
            adc_topk(emb, cb, k=args.k).collect(), "a", "b"
        )
        results["pq_adc"].append(
            {"m_sub": m_sub, "ksub": ksub,
             "recall": round(_recall(approx, exact), 4),
             "wall_sec": round(time.time() - t0, 2)}
        )

    for nlist, nprobe, m_sub, ksub in ((16, 4, 8, 64),):
        t0 = time.time()
        approx = _topk_sets(
            ivfpq_topk(
                emb, k=args.k, nlist=nlist, nprobe=nprobe,
                m_sub=m_sub, ksub=ksub,
            ).collect(),
            "a", "b",
        )
        results["ivfpq"].append(
            {"nlist": nlist, "nprobe": nprobe, "m_sub": m_sub, "ksub": ksub,
             "recall": round(_recall(approx, exact), 4),
             "wall_sec": round(time.time() - t0, 2)}
        )

    print("RESULT " + json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
