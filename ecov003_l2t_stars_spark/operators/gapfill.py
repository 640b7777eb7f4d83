"""Gap-fill: dense bucket grid + locf / linear interpolation.

Spark re-expression of the reference's dense-calendar alignment
(``/root/reference/ECOv003_L2T_STARS/process_ECOSTRESS_data_fusion_distributed_bias.jl:146-179``):
the daily axis ``dates = [start + Day(d-1) ...]`` with missing dates
becoming all-NaN slices (jl:163-171) becomes gap rows exploded from each
consecutive-observation pair (lead + ``sequence``) unioned under the
observations — no dense-grid join on the default per-conv-span path; a
fixed ``grid_start``/``grid_end`` job window (which introduces
leading/trailing gaps) still uses the grid ⟕ obs form. The
observation-path "skip + observed index" variant (jl:185-219) is the
``fill_method`` flag.

Fill semantics (frozen, mirrored by the test oracle — SURVEY §7.2):

- count columns (``n_turns``, per-role counts): 0 on gap rows — a bucket
  with no observations truly has zero turns.
- value columns (percentiles, smoothing inputs):
  - ``locf``: last observation carried forward; NULL before the first
    observation (leading gap → NULL + flag, the analog of the reference's
    prior-flag for pixels with no observations, fusion jl:288-312).
  - ``linear``: interpolate between bracketing observations; trailing
    gaps fall back to locf; leading gaps NULL.
- ``gap_filled`` boolean and ``fill_method`` ∈ {obs, locf, linear, NULL}.

Scale notes: the grid is generated per conversation bounded by that
conversation's observed span at the tier's granularity (never a global
cross-join); a conversation's 1m grid over its own activity window is
bounded by retention policy. ``sequence``/``explode`` runs inside the same
partition as the subsequent windows (one shuffle on conv_id for the whole
stage). ``max_buckets_per_conv`` guards runaway spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecov003_l2t_stars_spark import TIER_SECONDS

COUNT_COLS = ("n_turns", "n_user", "n_assistant", "n_system", "n_tool", "n_latency")


def dense_grid(
    tier_df: DataFrame,
    tier: str,
    max_buckets_per_conv: int | None = 2_000_000,
    grid_start=None,
    grid_end=None,
) -> DataFrame:
    """Per-conv dense (conv_id, bucket_start) grid spanning min..max bucket.

    ``grid_start``/``grid_end`` (python datetimes or timestamp strings)
    override the per-conv span with a fixed job window, the way the
    reference densifies over the full [start_date, end_date] regardless of
    per-pixel observations (fusion jl:146-153) — this is what produces
    leading gaps (NULL + flag).
    """
    n = TIER_SECONDS[tier]
    spans = tier_df.groupBy("conv_id").agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    if grid_start is not None:
        spans = spans.withColumn("_lo", F.lit(grid_start).cast("timestamp"))
    if grid_end is not None:
        spans = spans.withColumn("_hi", F.lit(grid_end).cast("timestamp"))
    if max_buckets_per_conv is not None:
        spans = spans.where(
            (F.unix_seconds("_hi") - F.unix_seconds("_lo")) / n
            < F.lit(max_buckets_per_conv)
        )
    return spans.select(
        "conv_id",
        F.explode(
            F.sequence(
                F.unix_seconds("_lo"),
                F.unix_seconds("_hi"),
                F.lit(n),
            )
        ).alias("_bs"),
    ).select("conv_id", F.timestamp_seconds("_bs").alias("bucket_start"))


def gap_fill(
    tier_df: DataFrame,
    tier: str,
    value_cols: tuple[str, ...] = ("latency_p50", "latency_p90", "latency_p99"),
    method: str = "locf",
    max_buckets_per_conv: int | None = 2_000_000,
    grid_start=None,
    grid_end=None,
) -> DataFrame:
    """Densify one tier table and fill ``value_cols`` by ``method``.

    Returns the tier schema + ``gap_filled`` + ``fill_method``.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown fill method: {method}")
    n = TIER_SECONDS[tier]
    idx = (F.unix_seconds("bucket_start") / n).cast("long")

    if grid_start is None and grid_end is None:
        # Default (per-conv span) path with NO dense-grid join and NO
        # windows over the densified table: gap rows are generated from
        # each consecutive-observation pair (lead + sequence-explode),
        # and because the generating pair already brackets every gap
        # bucket, the fill values attach AT EXPLODE TIME — the
        # carried-value windows run over the OBSERVATION table only
        # (~10× fewer rows than the densified output, which is merely
        # unioned together at the end). Same row set and identical
        # fill arithmetic as the grid ⟕ obs + windows formulation
        # (equivalence pinned in tests/test_gapfill.py). The span guard
        # rides the same conv_id partitioning (whole-partition min/max
        # frame — not the banned ordered unbounded-following class).
        obs = tier_df.withColumn("_idx", idx)
        if max_buckets_per_conv is not None:
            w_all = Window.partitionBy("conv_id")
            obs = (
                obs.withColumn(
                    "_span",
                    F.max("_idx").over(w_all) - F.min("_idx").over(w_all),
                )
                .where(F.col("_span") < max_buckets_per_conv)
                .drop("_span")
            )
        w_lead = Window.partitionBy("conv_id").orderBy("_idx")
        w_fwd = (
            Window.partitionBy("conv_id")
            .orderBy("_idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_bwd = (
            Window.partitionBy("conv_id")
            .orderBy(F.col("_idx").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # carried values as of each OBSERVATION: last non-null looking
        # back (for prev_v) and forward (for next_v) — running frames
        # both ways, per the O(n²)-frame ban
        carried = obs
        for c in value_cols:
            carried = carried.withColumn(
                f"_cf_{c}", F.last(c, ignorenulls=True).over(w_fwd)
            ).withColumn(
                f"_cb_{c}", F.last(c, ignorenulls=True).over(w_bwd)
            )
        pairs = carried.select(
            "conv_id",
            F.col("_idx").alias("_prev"),
            F.lead("_idx").over(w_lead).alias("_nxt"),
            *[F.col(f"_cf_{c}").alias(f"_pv_{c}") for c in value_cols],
            *[
                F.lead(f"_cb_{c}").over(w_lead).alias(f"_nv_{c}")
                for c in value_cols
            ],
        ).where(F.col("_nxt") > F.col("_prev") + 1)
        gaps = pairs.select(
            "conv_id",
            "_prev",
            "_nxt",
            *[f"_pv_{c}" for c in value_cols],
            *[f"_nv_{c}" for c in value_cols],
            F.explode(
                F.sequence(F.col("_prev") + 1, F.col("_nxt") - 1)
            ).alias("_idx"),
        )

        def _filled(c: str):
            prev_v = F.col(f"_pv_{c}")
            if method == "locf":
                return prev_v
            # identical expression tree to the window formulation:
            # int subtraction → cast double → divide; generated gaps
            # always have both bracketing obs, so the index-based
            # leading/trailing conditions are vacuously true
            frac = (
                (F.col("_idx") - F.col("_prev")).cast("double")
                / (F.col("_nxt") - F.col("_prev")).cast("double")
            )
            return prev_v + (F.col(f"_nv_{c}") - prev_v) * frac

        def _out_col(c: str, gap: bool):
            dt_ = tier_df.schema[c].dataType
            if c in ("conv_id",):
                return F.col("conv_id")
            if c == "bucket_start":
                return (
                    F.timestamp_seconds(F.col("_idx") * n).alias(c)
                    if gap
                    else F.col(c)
                )
            if c in COUNT_COLS:
                return (
                    F.lit(0).cast(dt_).alias(c)
                    if gap
                    else F.coalesce(F.col(c), F.lit(0)).alias(c)
                )
            if c in value_cols:
                # common-type widening matches the when/otherwise form
                # of the window path (numeric value col → double)
                return (
                    _filled(c).cast("double").alias(c)
                    if gap
                    else F.col(c).cast("double").alias(c)
                )
            return (
                F.lit(None).cast(dt_).alias(c) if gap else F.col(c)
            )

        obs_rows = obs.select(
            *[_out_col(c, gap=False) for c in tier_df.columns],
            F.lit(False).alias("gap_filled"),
            F.lit("obs").alias("fill_method"),
        )
        gap_rows = gaps.select(
            *[_out_col(c, gap=True) for c in tier_df.columns],
            F.lit(True).alias("gap_filled"),
            F.lit(method).alias("fill_method"),
        )
        return (
            obs_rows.unionByName(gap_rows)
            .withColumn(
                "bucket_end",
                F.timestamp_seconds(
                    F.unix_seconds("bucket_start") + F.lit(n)
                ),
            )
            .withColumn("tier", F.lit(tier))
        )

    grid = dense_grid(
        tier_df, tier, max_buckets_per_conv, grid_start, grid_end
    )
    obs = tier_df.withColumn("_obs", F.lit(True))
    joined = grid.join(obs, ["conv_id", "bucket_start"], "left")
    joined = joined.withColumn("_idx", idx)

    # Both directions use RUNNING frames (unboundedPreceding..current):
    # Spark evaluates these in O(n) per partition, whereas a
    # [current..unboundedFollowing] frame re-buffers per row (O(n^2) —
    # measured 13x slower at sf0.1). "Next observation" is a running
    # last() over DESCENDING bucket order.
    w_prev = (
        Window.partitionBy("conv_id")
        .orderBy("_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("_idx").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    is_obs = F.col("_obs").isNotNull()
    prev_obs_idx = F.last(F.when(is_obs, F.col("_idx")), ignorenulls=True).over(w_prev)
    next_obs_idx = F.last(F.when(is_obs, F.col("_idx")), ignorenulls=True).over(w_next)

    out = joined
    for c in COUNT_COLS:
        if c in tier_df.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))

    for c in value_cols:
        prev_v = F.last(F.when(is_obs, F.col(c)), ignorenulls=True).over(w_prev)
        if method == "locf":
            filled = prev_v
        else:
            next_v = F.last(F.when(is_obs, F.col(c)), ignorenulls=True).over(w_next)
            frac = (
                (F.col("_idx") - prev_obs_idx).cast("double")
                / (next_obs_idx - prev_obs_idx).cast("double")
            )
            filled = F.when(
                next_obs_idx.isNotNull() & prev_obs_idx.isNotNull(),
                prev_v + (next_v - prev_v) * frac,
            ).otherwise(prev_v)  # trailing gap → locf; leading → NULL
        out = out.withColumn(c, F.when(is_obs, F.col(c)).otherwise(filled))

    out = (
        out.withColumn("gap_filled", ~is_obs)
        .withColumn(
            "fill_method",
            F.when(is_obs, F.lit("obs"))
            .when(prev_obs_idx.isNotNull(), F.lit(method))
            .otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "bucket_end",
            F.timestamp_seconds(F.unix_seconds("bucket_start") + F.lit(n)),
        )
        .withColumn("tier", F.lit(tier))
        .drop("_obs", "_idx")
    )
    return out


def missing_buckets(
    tier_df: DataFrame,
    tier: str,
    max_buckets_per_conv: int | None = 2_000_000,
) -> DataFrame:
    """Expected-vs-observed anti-join: buckets in the dense grid with no
    observed row — the watermark-violation check, mirroring the
    reference's missing-date accumulation + ``AuxiliaryLatency`` raise
    (``generate_STARS_inputs.py:220-231``, ``L2T_STARS.py:357-379``).

    ``max_buckets_per_conv`` mirrors the dense-grid guard the join-free
    rewrite replaced: one pathological timestamp (a huge span) would
    otherwise make ``F.sequence`` generate the whole gap — past Spark's
    max array length it errors the job, below it it blows task memory.
    Guarded gaps are silently skipped, matching the old behavior of
    excluding runaway convs from the grid.
    """
    # the missing set is exactly the interior of each
    # consecutive-observation pair — generated by lead + explode with no
    # dense grid and no anti-join (per-conv spans make endpoints
    # observed, so grid ∖ obs ≡ these interiors)
    n = TIER_SECONDS[tier]
    idx = (F.unix_seconds("bucket_start") / n).cast("long")
    w_lead = Window.partitionBy("conv_id").orderBy("_idx")
    gap_ok = F.col("_nxt") > F.col("_idx") + 1
    if max_buckets_per_conv is not None:
        gap_ok = gap_ok & (
            F.col("_nxt") - F.col("_idx") < F.lit(max_buckets_per_conv)
        )
    return (
        tier_df.select("conv_id", idx.alias("_idx"))
        .select(
            "conv_id", "_idx", F.lead("_idx").over(w_lead).alias("_nxt")
        )
        .where(gap_ok)
        .select(
            "conv_id",
            F.explode(
                F.sequence(F.col("_idx") + 1, F.col("_nxt") - 1)
            ).alias("_m"),
        )
        .select(
            "conv_id",
            F.timestamp_seconds(F.col("_m") * n).alias("bucket_start"),
        )
    )
