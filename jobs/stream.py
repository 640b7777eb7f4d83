"""spark-submit entrypoint for the streaming rollup (chained queries).

Two chained Structured Streaming queries (chained through a file sink
because ``applyInPandasWithState`` must be the LAST stateful operator
in its query — Spark's multi-stateful-operator rule):

    A. turn stream → stateful per-conv latency annotation
       (``streaming_with_latency``) → ``<out>/latency``
    B. annotated stream → finalized 1m digest tier
       (``streaming_rollup_1m_digest``, watermark lateness)
       → ``<out>/rollup_1m_stream``

Finalized buckets carry the sorted latency digest, so the batch
compactor (``operators.rollup.cascade_with_digest``) derives exact
coarse-tier percentiles from the stream output with no raw rescan —
bit-equal to the batch tier (tests/test_streaming.py).

On a real cluster (BASELINE.json north_rule):

    spark-submit --py-files engine.zip jobs/stream.py \
        --source s3://bucket/turns --out s3://bucket/stream_tiers \
        --watermark "4 days"

Locally (drain-what-is-there mode):

    python jobs/stream.py --source /tmp/turns --out /tmp/stream --once
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
LATENCY_SCHEMA = (
    "conv_id string, turn_idx long, role string, "
    "ts timestamp, latency_s double"
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True,
                   help="directory where turn parquet files arrive")
    p.add_argument("--out", required=True)
    p.add_argument("--watermark", default="4 days",
                   help="allowed lateness (VIIRS_GIVEUP_DAYS analog)")
    p.add_argument("--once", action="store_true",
                   help="availableNow trigger: drain pending files, exit")
    p.add_argument("--interval", default="30 seconds",
                   help="micro-batch trigger interval (continuous mode)")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from ecov003_l2t_stars_spark.session import get_spark
    from ecov003_l2t_stars_spark.streaming.rollup_stream import (
        streaming_rollup_1m_digest,
        streaming_with_latency,
    )

    spark = get_spark(app_name="stream-rollup", master=args.master)
    out = Path(args.out)

    def start(df, sink: str, ckpt: str):
        w = (
            df.writeStream.format("parquet")
            .option("path", str(out / sink))
            .option("checkpointLocation", str(out / ckpt))
            .outputMode("append")
        )
        if args.once:
            w = w.trigger(availableNow=True)
        else:
            w = w.trigger(processingTime=args.interval)
        return w.start()

    qa = start(
        streaming_with_latency(
            spark.readStream.schema(TURN_SCHEMA).parquet(args.source)
        ),
        "latency",
        "ck_latency",
    )
    if args.once:
        # chained: B consumes what A finished writing this drain
        qa.awaitTermination()
        # first drain: A's sink may not exist yet for B's schema probe
        (out / "latency").mkdir(parents=True, exist_ok=True)
        qb = start(
            streaming_rollup_1m_digest(
                spark.readStream.schema(LATENCY_SCHEMA).parquet(
                    str(out / "latency")
                ),
                watermark=args.watermark,
            ),
            "rollup_1m_stream",
            "ck_rollup",
        )
        qb.awaitTermination()
        stats = {"mode": "once"}
        try:
            stats["finalized_buckets"] = (
                spark.read.parquet(str(out / "rollup_1m_stream")).count()
            )
        except Exception:
            stats["finalized_buckets"] = 0
        print(json.dumps(stats))
        spark.stop()
    else:
        (out / "latency").mkdir(parents=True, exist_ok=True)
        start(
            streaming_rollup_1m_digest(
                spark.readStream.schema(LATENCY_SCHEMA).parquet(
                    str(out / "latency")
                ),
                watermark=args.watermark,
            ),
            "rollup_1m_stream",
            "ck_rollup",
        )
        spark.streams.awaitAnyTermination()


if __name__ == "__main__":
    main()
