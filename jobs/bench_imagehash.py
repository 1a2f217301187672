"""N->4N sweep for the image-hash dedup family (the north-rule scaling
protocol extended to the multimodal layer): synthesize real 16x16 PNGs
with planted perturbed twins, then time image_ahash (native decode +
exact-rational hashing inside Arrow batches) and the pigeonhole
near-dup join at two parallelism levels.

Usage: python jobs/bench_imagehash.py [--images 20000] [--levels 2,8]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_worker(cpus: int, n_images: int) -> None:
    from pagerankproject_spark.multimodal.media import (
        image_ahash,
        image_near_dup_ahash,
        image_phash,
        synthesize_png_table,
    )
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-imagehash-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(cpus, 1)}"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(0, n_images, 1, cpus * 2).withColumnRenamed(
        "id", "doc_id"
    )
    imgs = synthesize_png_table(docs).persist()
    imgs.count()

    t0 = time.time()
    hashes = image_ahash(imgs).persist()
    n = hashes.count()
    hash_wall = time.time() - t0
    t0 = time.time()
    pairs = image_near_dup_ahash(hashes, max_hamming=3).count()
    pair_wall = time.time() - t0
    # round-5: the DCT member — heavier per image (two 8x32 integer
    # matrix products vs one cell-mean pass), same Arrow decode path
    t0 = time.time()
    n_ph = image_phash(imgs).count()
    phash_wall = time.time() - t0
    planted = sum(1 for i in range(n_images) if i % 10 == 1)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "images": n,
                "hash_wall_sec": round(hash_wall, 2),
                "images_per_sec": round(n / hash_wall, 1),
                "phash_wall_sec": round(phash_wall, 2),
                "phash_images_per_sec": round(n_ph / phash_wall, 1),
                "pair_wall_sec": round(pair_wall, 2),
                "near_dup_pairs": pairs,
                "planted_twins": planted,
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=20_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        run_worker(args.worker, args.images)
        return

    results = {}
    for c in (int(x) for x in args.levels.split(",")):
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", str(c),
             "--images", str(args.images)],
            capture_output=True, text=True, timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("WORKER_RESULT ")),
            None,
        )
        if line is None:
            print(proc.stderr, file=sys.stderr)
            raise RuntimeError(f"worker local[{c}] produced no result")
        results[c] = json.loads(line[len("WORKER_RESULT "):])
        print(line)

    cs = sorted(results)
    lo, hi = results[cs[0]], results[cs[-1]]
    eff = (hi["images_per_sec"] / lo["images_per_sec"]) / (cs[-1] / cs[0])
    eff_ph = (
        hi["phash_images_per_sec"] / lo["phash_images_per_sec"]
    ) / (cs[-1] / cs[0])
    print(json.dumps({
        "job": "image-hash dedup N->4N",
        "levels": results,
        "scaling_efficiency": round(eff, 3),
        "phash_scaling_efficiency": round(eff_ph, 3),
        "meets_north_rule_0.8": eff >= 0.8 and eff_ph >= 0.8,
    }))


if __name__ == "__main__":
    main()
