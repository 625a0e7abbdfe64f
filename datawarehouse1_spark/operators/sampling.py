"""Deterministic sampling operators.

Reproducibility discipline (SCALE.md #10): never `rand()` — ranks come
from md5 over a stable key, so reruns, retried tasks, and different
engines draw the SAME sample. Complements the hash-threshold mixture
filter (dedup_ext.py::q_sample_hash_mixture), which draws a FRACTION
per stratum; this draws an exact per-stratum COUNT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_col(key: str):
    return F.md5(F.col(key).cast("string"))


def _join_null_safe(left: DataFrame, right: DataFrame, strata: Sequence[str]):
    """Inner-join on the strata columns with NULL-safe equality (<=>).

    A plain `.join(..., on=strata)` silently drops rows whose stratum
    value is NULL (NULL = NULL is NULL in SQL), which would make the
    oversample prefilter starve NULL strata while the naive window path
    samples them — breaking path equivalence AND the exact-or-loud
    guarantee (the shortfall check joined the same way, so the loss was
    invisible). Right-side strata are renamed to avoid ambiguity and
    dropped after the join; left column order is preserved."""
    aliases = [f"_strat_{i}" for i in range(len(strata))]
    r = right
    for s, a in zip(strata, aliases):
        r = r.withColumnRenamed(s, a)
    cond = None
    for s, a in zip(strata, aliases):
        c = left[s].eqNullSafe(r[a])
        cond = c if cond is None else cond & c
    return left.join(F.broadcast(r), cond).drop(*aliases)


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    key: str,
    k: int,
    oversample: int = 0,
) -> DataFrame:
    """Exactly k rows per stratum (all rows where the stratum is
    smaller), chosen as the k smallest md5(key) — deterministic across
    runs, partitionings, and engines. Adds `sample_rank` (1..k).

    Naive shape: one window per stratum = the whole stratum sorts in
    one task — fine for dimension-sized strata, a straggler at 100 TB.
    `oversample > 0` enables the scale path: a narrow PRE-FILTER keeps
    only rows whose md5 falls in the smallest `oversample * k / |s|`
    fraction of the hash space (per-stratum counts from one cheap
    aggregate, broadcast back), so the window sorts ~oversample*k
    candidate rows per stratum instead of the full stratum. The
    k-smallest survive any prefilter that keeps >= k rows; the operator
    VERIFIES that per stratum and raises on shortfall (a stratum
    smaller than k passes whole, un-filtered), so the scale path is
    exact-or-loud, never silently approximate. Equivalence of the two
    paths is pytest-pinned."""
    strata = list(strata)
    rank = _rank_col(key)
    cand = df
    if oversample > 0:
        counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_n"))
        # md5 is uniform in [0, 16^8) on the first 8 hex digits; keep
        # frac = min(1, oversample*k/n) of the hash space
        frac = F.least(
            F.lit(1.0), F.lit(float(oversample * k)) / F.col("_n")
        )
        cut = (frac * F.lit(float(16**8))).cast("long")
        cand = _join_null_safe(df, counts.withColumn("_cut", cut), strata)
        passes = F.conv(F.substring(rank, 1, 8), 16, 10).cast("long") < F.col(
            "_cut"
        )
        cand = cand.filter(passes | (F.col("_n") <= F.lit(k))).drop("_n", "_cut")
    w = Window.partitionBy(*strata).orderBy(rank, F.col(key))
    out = (
        cand.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        # the prefilter join moves the strata columns first; restore the
        # caller's column order so both paths return identical schemas
        .select(*df.columns, "sample_rank")
    )
    if oversample > 0:
        # exact-or-loud: if the prefilter starved a stratum that had
        # >= k rows, the sample would silently shrink — forbid it
        got = out.groupBy(*strata).agg(F.count(F.lit(1)).alias("_got"))
        short = (
            _join_null_safe(
                got, df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_n")), strata
            )
            .filter((F.col("_got") < F.lit(k)) & (F.col("_n") >= F.lit(k)))
            .limit(1)
            .collect()
        )
        if short:
            raise RuntimeError(
                f"stratified_sample prefilter shortfall at {short[0]}; "
                f"raise `oversample` (was {oversample})"
            )
    return out
