"""Per-round BPE cost trajectory under auto recount/delta pair counts.

Evidence for the VERDICT r3 item-2 "Done" criterion: once the
changed-word worklist falls under the auto threshold, bpe_merges
switches from the full data-bound recount to DELTA-maintained pair
counts (text/bpe.py), and per-merge-round wall should DECAY with the
worklist instead of staying O(vocabulary) — the regime a 32k-round
production vocabulary training run lives in.

Default corpus is the zipf letter-word one (_build_zipf_docs): its
heavy head gives real BPE dynamics — early merges touch most words,
later merges ever fewer — so the mode switch and the decay are both
visible. --corpus uniform reproduces the bench_scaling 12M-token /
2M-word table instead (its uniform digit-words keep the worklist at
~17% of the vocabulary forever, pinning the auto policy to recount
mode — the N->4N-sweep regime).

Usage: python jobs/bench_bpe_delta.py [--multiplier 20] [--merges 48]
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
sys.path.insert(0, str(REPO / "jobs"))


def _build_zipf_docs(spark, multiplier: int, partitions: int):
    """Zipf-weighted letter-word corpus — the regime real BPE training
    lives in: token ids drawn with a heavy head (inverse-CDF on a pure
    integer hash, tail index ~1/3), rendered as base-26 letter words.
    Early merges consume the frequent letter pairs of the head; later
    merges match ever-rarer pairs, so the changed-word worklist decays
    — which is exactly what the delta-maintained pair counts convert
    into decaying round cost."""
    from pyspark.sql import functions as F

    n_docs = multiplier * 10_000
    u = (
        F.pmod(
            F.xxhash64(F.col("doc_id") * 60 + F.col("j")),
            F.lit(1_000_000_000),
        )
        + F.lit(1)
    ) / F.lit(1_000_000_000.0)
    tok_id = F.least(
        F.floor(F.pow(u, F.lit(-3.0))).cast("long"), F.lit(200_000)
    )
    # base-26 letter rendering of the id (1-4+ letters, head ids short)
    word = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda k: F.when(
            tok_id >= F.pow(F.lit(26.0), k).cast("long"),
            F.char(
                F.pmod(
                    (tok_id / F.pow(F.lit(26.0), k)).cast("long"), F.lit(26)
                )
                + F.lit(97)
            ),
        ),
    )
    docs = (
        spark.range(0, n_docs, 1, partitions)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("j"),
        )
        .select(
            "doc_id",
            F.concat_ws("", F.filter(word, lambda c: c.isNotNull())).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )
    docs = docs.persist()
    docs.count()
    return docs, n_docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=20)
    ap.add_argument("--merges", type=int, default=32)
    ap.add_argument("--corpus", choices=["zipf", "uniform"], default="zipf")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from bench_scaling import _build_docs

    from pagerankproject_spark.session import get_spark
    from pagerankproject_spark.text.bpe import bpe_merges

    spark = get_spark(
        app_name="bench-bpe-delta",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    t0 = time.time()
    if args.corpus == "zipf":
        docs, n_docs = _build_zipf_docs(spark, args.multiplier, args.cpus * 2)
    else:
        docs, n_docs = _build_docs(
            spark, args.multiplier, args.cpus * 2, vocab=2_000_000
        )
    build_sec = time.time() - t0

    metrics: list[dict] = []
    t0 = time.time()
    rules = bpe_merges(
        docs, num_merges=args.merges, min_count=1, metrics_out=metrics
    ).collect()
    total = time.time() - t0

    walls = [round(m["wall_sec"], 3) for m in metrics]
    changed = [m["changed_words"] for m in metrics]
    head = sum(walls[1:6]) / 5 if len(walls) > 6 else float("nan")
    tail = sum(walls[-5:]) / 5 if len(walls) > 10 else float("nan")
    print(
        "RESULT "
        + json.dumps(
            {
                "job": "bpe delta-maintained per-round trajectory",
                "docs": n_docs,
                "tokens": n_docs * 60,
                "merges": len(rules),
                "build_sec": round(build_sec, 2),
                "total_sec": round(total, 2),
                "round_walls": walls,
                "changed_words": changed,
                "modes": [m.get("mode") for m in metrics],
                "mean_wall_rounds_1_5": round(head, 3),
                "mean_wall_last_5": round(tail, 3),
                "decay_ratio_tail_over_head": round(tail / head, 3)
                if head == head and tail == tail
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
