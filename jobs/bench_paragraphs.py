#!/usr/bin/env python3
"""Paragraph-dedup at bench scale (text/paragraphs.py).

Builds a deterministic synthetic corpus whose dedup outcome is known BY
CONSTRUCTION, so the run both times the operator and verifies it
end-to-end at tens of millions of paragraph occurrences:

  * N docs x P paragraphs each.
  * The first S paragraph slots of every doc hold SHARED text keyed by
    (slot, doc_id % R) — each shared value recurs N/R times corpus-wide,
    and its global min (doc_id, pos) owner is doc_id = (doc_id % R)
    itself, so docs 0..R-1 keep everything and every other doc keeps
    exactly P - S paragraphs.
  * The remaining P - S slots are unique per (doc, slot).

Expected kept rows = R*S + N*(P-S), total rows = N*P — asserted EXACT.
All content is arithmetic off spark.range — no RNG, no driver data.

Usage: python jobs/bench_paragraphs.py [--docs 2000000] [--paras 20]
       [--shared 8] [--reuse 1000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--paras", type=int, default=20)
    ap.add_argument("--shared", type=int, default=8)
    ap.add_argument("--reuse", type=int, default=1000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    N, P, S, R = args.docs, args.paras, args.shared, args.reuse
    assert 0 < S < P and 0 < R <= N

    from pyspark.sql import functions as F

    from pagerankproject_spark.session import get_spark
    from pagerankproject_spark.text.paragraphs import paragraph_dedup

    spark = get_spark(
        app_name="bench-paragraphs",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        # at this scale BOTH join sides are tens of millions of rows;
        # AQE's size estimate of the fingerprint side can still pick a
        # driver-collected broadcast that trips maxResultSize in local
        # mode — force the shuffle join the 100-TB plan would use anyway
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    i = F.col("id")
    parts = []
    for j in range(P):
        if j < S:
            parts.append(
                F.concat(
                    F.lit(f"shared slot {j} group "),
                    (i % R).cast("string"),
                    F.lit(" lorem ipsum dolor sit amet the quick brown fox"),
                )
            )
        else:
            parts.append(
                F.concat(
                    F.lit(f"unique slot {j} doc "),
                    i.cast("string"),
                    F.lit(" pack my box with five dozen liquor jugs"),
                )
            )
    docs = spark.range(N).select(
        i.alias("doc_id"), F.concat_ws("\n", *parts).alias("text")
    )

    t0 = time.time()
    dd = paragraph_dedup(docs)
    agg = dd.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    ).first()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "docs": N,
                "paragraph_occurrences": int(agg["rows"]),
                "kept": int(agg["kept"]),
                "wall_sec": round(wall, 1),
                "occurrences_per_sec": round(agg["rows"] / wall),
            }
        )
    )
    assert agg["rows"] == N * P, (agg["rows"], N * P)
    assert agg["kept"] == R * S + N * (P - S), (agg["kept"], R * S + N * (P - S))
    print("kept counts EXACT vs construction")
    spark.stop()


if __name__ == "__main__":
    main()
