"""Sub-quadratic evidence for the dedup scale paths.

Runs ``minhash_lsh_dedup`` and ``simhash_near_pairs`` on the sf0.1
documents table at 1×, 4×, and 24× corpus size (5k → 120k docs),
holding NEAR-DUP DENSITY constant (each replica's text is
vowel-permuted per copy, so replicas are NOT near-dups of each other
or of the originals — only the original corpus's true pairs exist at
every size). A bucketed (sub-quadratic) plan should scale close to the
data growth; an all-pairs plan scales with its square. The 24× point
exists because at 20k docs fixed costs still dominate the rework'd
pipeline — the slope claim needs a ≥100k-doc leg (VERDICT r3 #7).

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

    import random

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()

    # per-copy letter permutations over a 9-char alphabet: deterministic
    # text mutations that destroy shingle overlap with every other copy
    # (keeps dup density constant across sizes). Lexicographic vowel
    # permutations were NOT far enough apart — adjacent ones differed in
    # 2 positions, making replicas near-dups of each other and inflating
    # the mid-size leg — so each mapping must differ from every other in
    # >= 6 of 9 positions.
    alpha = "aeiounrst"
    perms: list[str] = [alpha]
    seed = 0
    while len(perms) < 24:
        seed += 1
        cand = list(alpha)
        random.Random(seed).shuffle(cand)
        cand = "".join(cand)
        if all(
            sum(a != b for a, b in zip(cand, p)) >= 6 for p in perms
        ):
            perms.append(cand)

    def variant(i: int):
        return base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.translate("text", alpha, perms[i]).alias("text"),
        )

    def corpus(mult: int):
        big = variant(0)
        for i in range(1, mult):
            big = big.unionByName(variant(i))
        return big.repartition(32).persist()

    def timed(fn, df):
        # warm-up + 2 timed runs, report the min (noise only ever adds
        # time)
        fn(df).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(df).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 2)

    mults = [1, 4, 24]
    result = {"n_docs": {m: n_base * m for m in mults}}
    ops = (
        ("minhash_lsh", minhash_lsh_dedup),
        ("simhash", simhash_near_pairs),
    )
    times: dict[str, dict[int, float]] = {name: {} for name, _ in ops}
    for m in mults:
        df = corpus(m)
        df.count()
        for name, fn in ops:
            times[name][m] = timed(fn, df)
        df.unpersist()
    for name, _ in ops:
        t = times[name]
        result[name] = {
            **{f"t_{m}x_s": t[m] for m in mults},
            # marginal slope over the data-proportional leg: fixed
            # costs cancel between the two largest sizes
            "ratio_4x_over_1x": round(t[4] / t[1], 2),
            "ratio_24x_over_4x": round(t[24] / t[4], 2),
            "data_growth_24_over_4": 6.0,
            "quadratic_would_be_24_over_4": 36.0,
        }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
