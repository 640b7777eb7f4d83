"""spark-submit entrypoint for the checkpointed rollup job.

On a real cluster (BASELINE.json north_rule):

    spark-submit --py-files engine.zip jobs/rollup.py \
        --input s3://bucket/transcripts --output s3://bucket/tiers \
        --tiers 1m,1h,1d,30d --n-buckets 1024 --fill locf --job-id daily

Locally:

    python jobs/rollup.py --input .bench_cache/transcripts_40000.parquet \
        --output /tmp/tiers --n-buckets 32

Build engine.zip with:  cd <repo> && zip -r engine.zip ecov003_l2t_stars_spark
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tiers", default="1m,1h,1d,30d")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--fill", choices=["locf", "linear"], default="locf")
    p.add_argument("--smooth-tiers", default="1h,1d")
    p.add_argument("--job-id", default="rollup")
    p.add_argument("--no-salt", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from ecov003_l2t_stars_spark.plans.pipeline import RollupConfig, RollupJob
    from ecov003_l2t_stars_spark.session import get_spark

    spark = get_spark(app_name=f"rollup-{args.job_id}", master=args.master)
    cfg = RollupConfig(
        input_path=args.input,
        output_dir=args.output,
        tiers=tuple(args.tiers.split(",")),
        n_buckets=args.n_buckets,
        fill_method=args.fill,
        smooth_tiers=tuple(
            t for t in args.smooth_tiers.split(",") if t
        ),
        salted=not args.no_salt,
        job_id=args.job_id,
    )
    metrics = RollupJob(spark, cfg).run()
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
