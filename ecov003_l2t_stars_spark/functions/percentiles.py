"""Exact percentile with a frozen, cross-engine-reproducible formula.

SURVEY §7.2: "avoid approx_percentile … compute order-sensitive stats
where order is explicit". Spark's built-in exact ``percentile`` and
DuckDB's ``quantile_cont`` use algebraically equal but floating-point
different interpolation formulas, which flips the last bit on ~0.05% of
values. Since the north rule demands exact point-match of every rolled-up
point, the engine freezes ONE formula and evaluates it identically in
Spark column expressions, DuckDB oracle SQL, and the NumPy test oracle:

    idx  = (n - 1) * p
    lo   = floor(idx); hi = ceil(idx); frac = idx - lo
    pct  = v[lo] + (v[hi] - v[lo]) * frac      # 0-based sorted values

This matches ``numpy.percentile(method="linear")`` evaluated with the
same operation order.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_vals(col: Column) -> Column:
    """Aggregate expression: ascending sorted array of non-NULL values."""
    return F.array_sort(F.collect_list(col))


def pct_from_sorted(arr: Column, p: float) -> Column:
    """Linear-interpolated percentile from a sorted array column."""
    n = F.size(arr)
    idx = (n - F.lit(1)).cast("double") * F.lit(p)
    lo = F.floor(idx)
    frac = idx - lo
    vlo = F.element_at(arr, lo.cast("int") + F.lit(1))
    vhi = F.element_at(arr, F.ceil(idx).cast("int") + F.lit(1))
    return F.when(n > 0, vlo + (vhi - vlo) * frac)


def duckdb_pct_expr(arr_sql: str, p: float) -> str:
    """The same formula as DuckDB SQL over a list expression.

    ``arr_sql`` must evaluate to an ascending sorted list of non-NULL
    doubles (e.g. ``list_sort(list(x) FILTER (x IS NOT NULL))``).
    """
    idx = f"(CAST(len({arr_sql}) - 1 AS DOUBLE) * {p!r})"
    lo = f"CAST(FLOOR({idx}) AS INT)"
    hi = f"CAST(CEIL({idx}) AS INT)"
    frac = f"({idx} - FLOOR({idx}))"
    vlo = f"{arr_sql}[{lo} + 1]"
    vhi = f"{arr_sql}[{hi} + 1]"
    return (
        f"CASE WHEN len({arr_sql}) > 0 "
        f"THEN {vlo} + ({vhi} - {vlo}) * {frac} END"
    )


def fold_sum(arr: Column) -> Column:
    """Left fold over an (ascending-sorted) array — frozen sum order."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def var_from_sorted(arr: Column, mean: Column) -> Column:
    """Bessel-corrected sample variance with a frozen reduction order
    (SURVEY §2.4 A3/A4: ``var(y; corrected=true)``, VNP43NRT.jl:386).

    mean = foldsum(v)/n; var = foldsum((v - mean)^2) / (n - 1), both
    folds ascending — reproducible in DuckDB/NumPy verbatim.

    ``mean`` MUST be a materialized column (``withColumn`` it from
    ``fold_sum(arr) / size(arr)`` first): Catalyst inlines outer computed
    expressions into the lambda with no CSE, so passing the fold
    expression directly would re-sum the array once PER ELEMENT —
    O(n^2) per bucket (4e8 ops for a hot conversation's 30d bucket).
    """
    n = F.size(arr)
    ss = F.aggregate(
        F.transform(arr, lambda x: (x - mean) * (x - mean)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(n > 1, ss / (n - F.lit(1)).cast("double"))


def duckdb_fold_expr(inner_sql: str) -> str:
    """DuckDB left fold (frozen reduction order) over a list expression."""
    return (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"{inner_sql}), (a, b) -> a + b)"
    )


def duckdb_mean_expr(arr_sql: str) -> str:
    """foldsum(arr)/len(arr) — hoist this into its OWN CTE column before
    passing it to :func:`duckdb_var_expr`."""
    return (
        f"({duckdb_fold_expr(arr_sql)} / CAST(len({arr_sql}) AS DOUBLE))"
    )


def duckdb_var_expr(arr_sql: str, mean_sql: str) -> str:
    """DuckDB twin of :func:`var_from_sorted` over a sorted list expr.

    ``mean_sql`` MUST name a materialized column (a prior CTE column
    built from :func:`duckdb_mean_expr`), mirroring the Spark-side rule:
    interpolating the mean fold here would inline a full ``list_reduce``
    inside ``list_transform`` and re-sum the array once PER ELEMENT —
    the same O(n^2) lambda-inlining trap CLAUDE.md rule 2 bans.
    """
    n = f"len({arr_sql})"
    ss = duckdb_fold_expr(
        f"list_transform({arr_sql}, x -> (x - {mean_sql}) * (x - {mean_sql}))"
    )
    return (
        f"CASE WHEN {n} > 1 THEN {ss} / CAST({n} - 1 AS DOUBLE) END"
    )


def np_var_sorted(values: np.ndarray) -> float:
    """NumPy twin (left folds over sorted values)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = v.size
    if n <= 1:
        return float("nan")
    acc = np.float64(0.0)
    for x in v:
        acc = acc + x
    mean = acc / np.float64(n)
    ss = np.float64(0.0)
    for x in v:
        ss = ss + (x - mean) * (x - mean)
    return float(ss / np.float64(n - 1))


def np_pct(values: np.ndarray, p: float) -> float:
    """NumPy twin of the frozen formula (test oracle)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = v.size
    if n == 0:
        return float("nan")
    idx = (n - 1) * p
    lo = int(np.floor(idx))
    hi = int(np.ceil(idx))
    frac = idx - np.floor(idx)
    return float(v[lo] + (v[hi] - v[lo]) * frac)
