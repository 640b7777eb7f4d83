"""Sub-quadratic evidence for the dedup scale paths.

Runs ``minhash_lsh_dedup`` and ``simhash_near_pairs`` on the sf0.1
documents table at 1× and 4× corpus size, holding NEAR-DUP DENSITY
constant (each replica's text is vowel-rotated per copy, so replicas
are NOT near-dups of each other or of the originals — only the
original corpus's true pairs exist at both sizes). A bucketed
(sub-quadratic) plan should scale close to the 4× data growth; an
all-pairs plan would scale ~16×.

Usage: python scripts/bench_dedup_scaling.py  [sf_dir]
Prints one JSON line; run on an otherwise idle machine.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from ecov003_l2t_stars_spark.operators.dedup import (
        minhash_lsh_dedup,
        simhash_near_pairs,
    )
    from ecov003_l2t_stars_spark.session import get_spark

    spark = get_spark(
        app_name="dedup-scaling",
        master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()

    # per-copy vowel rotations: deterministic text mutations that destroy
    # shingle overlap with every other copy (keeps dup density constant)
    rotations = ["aeiou", "eioua", "iouae", "ouaei"]

    def variant(i: int):
        return base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.translate("text", "aeiou", rotations[i]).alias("text"),
        )

    big = variant(0)
    for i in range(1, 4):
        big = big.unionByName(variant(i))
    big = big.repartition(32).persist()
    n_big = big.count()

    def timed(fn, df):
        # warm-up + 2 timed runs, report the median-free min (noise only
        # ever adds time)
        fn(df).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(df).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 2)

    result = {"n_1x": n_base, "n_4x": n_big}
    for name, fn in (
        ("minhash_lsh", minhash_lsh_dedup),
        ("simhash", simhash_near_pairs),
    ):
        t1 = timed(fn, base)
        t4 = timed(fn, big)
        result[name] = {
            "t_1x_s": t1,
            "t_4x_s": t4,
            "ratio": round(t4 / t1, 2),
            "quadratic_would_be": 16.0,
        }
    big.unpersist()
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
