"""End-to-end rollup job: scan → normalize → tiers → gap-fill → smooth →
payload → idempotent partitioned write + per-partition checkpoints.

The engine's equivalent of the reference's PGE main flow
(``L2T_STARS.py:113-503`` — parse config, plan date ranges, load prior,
stage, fuse, write product, record completion) with the reference's
filesystem-keyed resumability (``VNP43NRT/VNP43NRT.py:390-397``,
``L2T_STARS.py:134-143``: every artifact keyed and skipped if present)
re-expressed as a checkpoints table over conv-hash partitions:

- work unit = ``conv_bucket = pmod(xxhash64(conv_id), n_buckets)`` — the
  analog of the reference's per-tile unit. All turns of a conversation
  live in exactly one bucket, so every per-conv computation (latency lag,
  series smoothing) is partition-local after one repartition.
- a completed bucket writes its tier partitions (dynamic partition
  overwrite → idempotent re-runs) and then appends a checkpoint row
  (job_id, partition, bucket range, rows_processed, lineage). Restart
  skips checkpointed buckets (FIXTURES.md §4).
- outputs are parquet directories partitioned by ``conv_bucket`` — the
  layout an Iceberg ``bucket(N, conv_id)`` partition spec produces. All
  table writes go through the :mod:`plans.table_format` contract
  (``overwrite_partitions`` / ``delete_where`` / ``merge_replace_keys``
  — Iceberg's ``overwritePartitions()``, metadata ``DELETE WHERE``, and
  snapshot-isolated ``MERGE``). The default implementation is the
  parquet twin; the contract is EXERCISED against a snapshot-isolated
  in-memory format in tests/test_table_format.py (pipeline, retention,
  and late-data repair produce identical tables under both). An actual
  Iceberg runtime still cannot run here (no iceberg-spark-runtime jar,
  no network); wiring one in means implementing TableFormat with
  ``writeTo`` calls.

Scale: the job never collects data rows; the only driver-side state is
the checkpoint bookkeeping (n_buckets rows).
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecov003_l2t_stars_spark import TIERS
from ecov003_l2t_stars_spark.functions.kalman import KalmanParams
from ecov003_l2t_stars_spark.operators.gapfill import gap_fill
from ecov003_l2t_stars_spark.operators.payload import encode_payloads
from ecov003_l2t_stars_spark.operators.rollup import (
    normalize,
    rollup_tier,
    rollup_tier_salted,
    with_latency,
)
from ecov003_l2t_stars_spark.operators.smooth import posterior_state, smooth_tier

CODE_VERSION = "0.1.0"

CHECKPOINT_SCHEMA = (
    "job_id string, partition_id int, conv_bucket int, "
    "bucket_range_start timestamp, bucket_range_end timestamp, "
    "rows_processed long, input_snapshot string, code_version string, "
    "completed_at timestamp"
)


@dataclass
class RollupConfig:
    input_path: str
    output_dir: str
    tiers: tuple[str, ...] = TIERS
    n_buckets: int = 32
    fill_method: str = "locf"
    fill_cols: tuple[str, ...] = ("latency_p50", "latency_p90", "latency_p99")
    salted: bool = True
    # Salting pays only where a (conv, bucket) group can get large — hot
    # conversations concentrate in COARSE buckets (a 30d bucket of a
    # 1000x conv holds its whole month). Fine tiers have inherently
    # bounded groups; the two-stage agg there is pure overhead (measured
    # 2.4x slower at 1m). Bit-exact equivalence of the two paths is
    # property-tested, so this is purely a physical choice.
    salt_tiers: tuple[str, ...] = ("1h", "1d", "30d")
    n_salts: int = 8
    kalman: KalmanParams = field(default_factory=KalmanParams)
    # Densify + smooth only these tiers. The finest tier stays SPARSE on
    # purpose: a dense per-minute grid over each conv's span is a row
    # explosion at 10^12-turn scale (43200 rows/conv/month of zeros); the
    # reference likewise densifies only the axis its smoothing pass
    # consumes (fusion jl:146-153).
    smooth_tiers: tuple[str, ...] = ("1h", "1d")
    payload_col: str = "latency_sum"
    job_id: str = "rollup"
    as_of: dt.datetime | None = None
    # run tier branches as concurrent driver threads. Useful on a real
    # cluster with the FAIR scheduler (overlaps commit barriers across
    # branches); measured 3x SLOWER on a single local JVM (threads thrash
    # one block manager / shuffle disk), so off by default here.
    parallel_tiers: bool = False
    # overlap the per-tier WRITE actions (rollup/payload/state sinks) on
    # a small driver thread pool while the main thread plans the next
    # tier (guide §2.6: submit independent jobs so the next job's tasks
    # back-fill executors freed by the current job's tail). Unlike
    # parallel_tiers this never runs two tier BUILDS concurrently — the
    # shared lineage is persisted, and concurrent first-consumers dedup
    # block computation via BlockManager locking. 0/1 = sequential.
    # Measured at sf1.0 (10.7M turns, local[32], interleaved reps):
    # sequential ~39-44 s, 2 workers ~27-30, 4 ~24-26, 6 ~23-26 —
    # 4 keeps the guide's "2-3 jobs in flight" posture with the win.
    overlap_writes: int = 4
    # digest cascade: aggregate raw turns ONCE (finest tier, with sorted
    # latency digests) and derive every coarser tier by merging digests —
    # exact for ALL statistics incl. percentiles (property-tested), and
    # at 10^12-turn scale the 30d tier reads the 1d tier instead of raw.
    # Mutually exclusive with salting (digest merges are their own
    # two-stage combine; AQE covers residual skew).
    cascade_coarse: bool = True


class RollupJob:
    def __init__(
        self, spark: SparkSession, cfg: RollupConfig, fmt=None
    ) -> None:
        import threading

        from ecov003_l2t_stars_spark.plans.table_format import ParquetFormat

        self.spark = spark
        self.cfg = cfg
        self.out = Path(cfg.output_dir)
        self.fmt = fmt or ParquetFormat()
        self._state_lock = threading.Lock()
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- checkpoint bookkeeping -------------------------------------------
    @property
    def _ckpt_path(self) -> str:
        return str(self.out / "checkpoints")

    def completed_buckets(self) -> set[int]:
        if not self.fmt.exists(self.spark, self._ckpt_path):
            return set()
        df = self.fmt.read(self.spark, self._ckpt_path)
        rows = (
            df.where(
                (F.col("job_id") == self.cfg.job_id)
                & (F.col("code_version") == CODE_VERSION)
            )
            .select("conv_bucket")
            .distinct()
            .collect()
        )
        return {r.conv_bucket for r in rows}

    # -- main --------------------------------------------------------------
    def run(
        self,
        max_buckets: int | None = None,
        buckets: list[int] | None = None,
    ) -> dict:
        """Process all not-yet-checkpointed conv buckets; returns metrics.

        ``max_buckets`` processes only the first K remaining buckets —
        used by resume tests to simulate a mid-job crash.

        ``buckets`` restricts the run to an explicit set — the
        availability gate: pass the ``processable`` conv_buckets from
        ``plans.ingest.backlog`` so the job only touches buckets whose
        required sources have all arrived (the reference's
        availability-gated tile loop, ``L2T_STARS.py:343-388``). Buckets
        that become processable later are picked up by the next run via
        the same checkpoint-skip.
        """
        cfg = self.cfg
        done = self.completed_buckets()
        universe = range(cfg.n_buckets) if buckets is None else buckets
        remaining = [b for b in universe if b not in done]
        if max_buckets is not None:
            remaining = remaining[:max_buckets]
        if not remaining:
            return {"buckets_processed": 0, "rows_processed": 0}

        raw = self.spark.read.parquet(cfg.input_path)
        # prune to the columns the rollup branches consume BEFORE the
        # repartition exchange and the persist (rule 23: caching defeats
        # Catalyst column pruning, so an unpruned persist would carry —
        # and the exchange would shuffle — the ~300 B/row text payload
        # that no tier statistic reads: ~3.2 GB of dead shuffle+cache
        # bytes at sf1.0). normalize()'s dropDuplicates key survives the
        # prune (duplicates are exact row copies, FIXTURES.md), and
        # turn_idx stays for the latency ordering + the salted path's
        # salt hash.
        pruned_cols = ["conv_id", "turn_idx", "role", "ts"]
        bucketed = raw.select(*pruned_cols).withColumn(
            "conv_bucket",
            F.pmod(F.xxhash64("conv_id"), F.lit(cfg.n_buckets)).cast("int"),
        ).where(F.col("conv_bucket").isin(remaining))

        # ONE upfront hash repartition by conv_id serves every downstream
        # stage shuffle-free: HashPartitioning(conv_id) satisfies the
        # dedup's ClusteredDistribution(conv_id, turn_idx), the latency
        # window's (conv_id), and each tier's groupBy(conv_id, bucket) —
        # the grouping keys are supersets of the partitioning key. The
        # whole 4-tier rollup then runs on the cached lineage with no
        # further exchanges (verified via .explain in tests).
        n_part = max(
            cfg.n_buckets,
            int(self.spark.conf.get("spark.sql.shuffle.partitions")),
        )
        bucketed = bucketed.repartition(n_part, "conv_id")
        lat = with_latency(normalize(bucketed)).persist()

        # one pass serves both the row count and the per-bucket
        # checkpoint stats (no separate count() job). Lazy thunk: the
        # overlapped-writes path submits it to the pool so the ~seconds
        # of lat materialization + stats aggregation run concurrently
        # with the first tier's build/sinks (the first consumer to reach
        # a lat partition computes it, the rest read the cached block);
        # the result is only joined right before the checkpoint rows are
        # built, which is the first point that needs it.
        def _collect_stats():
            return (
                lat.groupBy("conv_bucket")
                .agg(
                    F.count(F.lit(1)).alias("rows_processed"),
                    F.min("ts").alias("bucket_range_start"),
                    F.max("ts").alias("bucket_range_end"),
                )
                .collect()
            )

        as_of = cfg.as_of or dt.datetime(2100, 1, 1)

        def _bucket_col():
            # conv_bucket is a pure function of conv_id — derived, never
            # joined (the Iceberg bucket(N, conv_id) transform analog)
            return F.pmod(F.xxhash64("conv_id"), F.lit(cfg.n_buckets)).cast(
                "int"
            )

        digests: dict[str, object] = {}
        _persisted: list = []
        tier_order = list(cfg.tiers)

        def _build_tier(tier: str):
            if cfg.cascade_coarse:
                from ecov003_l2t_stars_spark.operators.rollup import (
                    cascade_with_digest,
                    rollup_tier_with_digest,
                )

                idx = tier_order.index(tier)
                if idx > 0 and tier_order[idx - 1] in digests:
                    full = cascade_with_digest(digests[tier_order[idx - 1]], tier)
                else:
                    full = rollup_tier_with_digest(lat.drop("conv_bucket"), tier)
                full = full.persist()
                digests[tier] = full
                _persisted.append(full)
                return full.drop("lat_digest")
            if cfg.salted and tier in cfg.salt_tiers:
                out = rollup_tier_salted(
                    lat.drop("conv_bucket"), tier, n_salts=cfg.n_salts
                ).persist()
            else:
                out = rollup_tier(lat.drop("conv_bucket"), tier).persist()
            _persisted.append(out)
            return out

        def process_tier(tier: str, submit) -> None:
            # persisted either way: gap_fill consumes the tier twice
            # (grid spans + observations), the payload encoder a third
            # time, and the digest chain a fourth
            tier_df = _build_tier(tier)

            if tier in cfg.smooth_tiers:
                filled = gap_fill(
                    tier_df,
                    tier,
                    value_cols=cfg.fill_cols,
                    method=cfg.fill_method,
                )
                # persisted: the gapfill+smooth chain has two consumers
                # (posterior-state append, tier partition write) and is
                # the most expensive per-tier compute — without the
                # barrier it runs twice (measured ~5s/run at sf0.1)
                out_df = smooth_tier(filled, tier, params=cfg.kalman).persist()
                _persisted.append(out_df)
                state = posterior_state(out_df, tier, as_of)

                def _append_state(state=state):
                    with self._state_lock:
                        # appends share one output dir; concurrent jobs
                        # would race on the committer's _temporary dir
                        self.fmt.append(state, str(self.out / "rollup_state"))

                submit(_append_state)
            else:
                out_df = tier_df

            def _write_rollup(out_df=out_df, tier=tier):
                self.fmt.overwrite_partitions(
                    out_df.withColumn("conv_bucket", _bucket_col()),
                    str(self.out / f"rollup_{tier}"),
                    partition_col="conv_bucket",
                    sort_cols=("conv_id", "bucket_start"),
                )

            def _write_payload(tier_df=tier_df, tier=tier):
                segs = encode_payloads(tier_df, tier, cfg.payload_col)
                self.fmt.overwrite_partitions(
                    segs.withColumn("conv_bucket", _bucket_col()),
                    str(self.out / f"payload_{tier}"),
                    partition_col="conv_bucket",
                )

            submit(_write_rollup)
            submit(_write_payload)

        if cfg.parallel_tiers and not cfg.cascade_coarse and len(cfg.tiers) > 1:
            from concurrent.futures import ThreadPoolExecutor

            stats = _collect_stats()
            with ThreadPoolExecutor(max_workers=len(cfg.tiers)) as pool:
                # surface the first failure (list() re-raises)
                list(
                    pool.map(
                        lambda t: process_tier(t, lambda fn: fn()), cfg.tiers
                    )
                )
        elif cfg.overlap_writes and cfg.overlap_writes > 1:
            # sink jobs run on a small pool so the next tier's build
            # back-fills the tail of the previous tier's writes; builds
            # stay sequential and every write lands before the
            # checkpoint below (futures joined here, first error
            # re-raised). FIFO scheduling keeps the earlier write ahead.
            # The stats pass goes on the pool FIRST: it was ~8 s of
            # serialized lat materialization before any tier work.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=cfg.overlap_writes) as pool:
                stats_f = pool.submit(_collect_stats)
                futures = []
                for tier in cfg.tiers:
                    process_tier(tier, lambda fn: futures.append(
                        pool.submit(fn)
                    ))
                for f in futures:
                    f.result()
                stats = stats_f.result()
        else:
            stats = _collect_stats()
            for tier in cfg.tiers:
                process_tier(tier, lambda fn: fn())

        total_rows = sum(r.rows_processed for r in stats)
        # checkpoint rows: one per processed bucket, written AFTER the tier
        # partitions land (write-then-checkpoint = at-least-once, idempotent
        # because partition overwrite is deterministic). Reuses the stats
        # pass collected before the tier builds — no second scan of lat.
        by_bucket = {r.conv_bucket: r for r in stats}
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        ckpt_rows = [
            (
                self.cfg.job_id,
                b,
                b,
                by_bucket[b].bucket_range_start if b in by_bucket else None,
                by_bucket[b].bucket_range_end if b in by_bucket else None,
                by_bucket[b].rows_processed if b in by_bucket else 0,
                cfg.input_path,
                CODE_VERSION,
                now,
            )
            for b in remaining
        ]
        self.fmt.append(
            self.spark.createDataFrame(ckpt_rows, CHECKPOINT_SCHEMA),
            self._ckpt_path,
        )
        for df_ in _persisted:
            df_.unpersist()
        lat.unpersist()

        metrics = {
            "buckets_processed": len(remaining),
            "rows_processed": total_rows,
        }
        (self.out / "metrics").mkdir(parents=True, exist_ok=True)
        with open(self.out / "metrics" / f"{cfg.job_id}.json", "w") as f:
            json.dump(metrics, f)
        return metrics


def read_tier(spark: SparkSession, output_dir: str, tier: str) -> DataFrame:
    return spark.read.parquet(str(Path(output_dir) / f"rollup_{tier}"))
