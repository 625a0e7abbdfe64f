"""t-digest mergeable percentile sketch (Dunning & Ertl) — STAGED for
the r16 rows-only declaration (q_sketch_tdigest_percentiles candidate).

The log2-histogram (operators/sketches.py) bounds quantile error by an
OCTAVE — fine for money columns, coarse for arbitrary distributions.
The t-digest bounds RANK error instead: centroids carry more resolution
near the tails (the k-scale bound w <= 4·W·q(1-q)/δ), so p99/p999 stay
tight where the octave sketch smears.  Like the histogram it is
bounded-size and mergeable, which is the whole 100 TB argument:

  * level 1 (mapInPandas): each Arrow batch reduces to <= ~δ centroids
    — the ONLY pass that sees data rows, fully map-side;
  * level 2 (groupBy.applyInPandas): per group, the partial digests
    merge into one — the only exchange carries (group, means[],
    weights[]) arrays, one row per batch, never values.

Determinism: merging is order-sensitive in general; here level 1 sorts
each batch's values and level 2 sorts partial centroids by (mean,
weight) before the single greedy merge pass, so a fixed input layout
reproduces the digest bit-for-bit (the train_ivf_centroids staging
discipline).  Accuracy is a measured property, not a hash-matched one —
the declaration will be rows-only with a bench accuracy metric, like
HLL/IVF/LSH (tests pin rank error <= 1% at δ=100 on the testdata).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)


def _k(q: float, delta: int) -> float:
    """Dunning's k1 scale function: k(q) = (δ/2π)·asin(2q−1).  Total
    k-range is δ/2, and a centroid may span at most one k-unit, so the
    digest size is bounded by ~δ/2+2 INDEPENDENT of input size (the
    q(1−q) weight-bound variant grows O(log n) from tail singletons —
    measured 413→609 centroids from 20k→1M inputs before the switch)."""
    import math

    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def _compress(
    means: np.ndarray, weights: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """One greedy left-to-right merge pass over mean-sorted centroids:
    the open centroid absorbs its neighbor while its k-span
    k(right edge) − k(left edge) stays <= 1."""
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cum = 0.0  # weight fully to the left of the open centroid
    k_left = _k(0.0, delta)
    cur_m, cur_w = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q_right = (cum + cur_w + float(w)) / total
        if _k(q_right, delta) - k_left <= 1.0:
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + w)
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            k_left = _k(cum / total, delta)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def digest_quantile(
    means: Sequence[float], weights: Sequence[float], q: float
) -> float:
    """Estimate the q-quantile from a digest: centroids are treated as
    located at their mean with half their weight on each side; linear
    interpolation between adjacent centroid positions."""
    m = np.asarray(means, dtype=float)
    w = np.asarray(weights, dtype=float)
    total = w.sum()
    if total <= 0:
        raise ValueError("empty digest")
    target = q * total
    # cumulative weight AT each centroid's mean (half-in convention)
    cum = np.cumsum(w) - w / 2.0
    if target <= cum[0]:
        return float(m[0])
    if target >= cum[-1]:
        return float(m[-1])
    i = int(np.searchsorted(cum, target) - 1)
    span = cum[i + 1] - cum[i]
    frac = (target - cum[i]) / span if span > 0 else 0.0
    return float(m[i] + frac * (m[i + 1] - m[i]))


def tdigest_percentiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    group_cols: Sequence[str] = (),
    delta: int = 100,
) -> DataFrame:
    """Two-level distributed t-digest percentile estimates.

    Returns one row per group with `prob` / `est` pairs exploded —
    columns: *group_cols, prob double, est double.  `delta` bounds the
    digest size (and the rank error ~ O(1/δ) at the median, tighter at
    the tails).
    """
    gcols = list(group_cols)
    part_schema = StructType(
        [df.schema[c] for c in gcols]
        + [
            StructField("means", ArrayType(DoubleType()), False),
            StructField("weights", ArrayType(DoubleType()), False),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {c: [] for c in gcols}
            rows["means"] = []
            rows["weights"] = []
            # dropna=False: Spark groupBy treats NULL as a group, so the
            # pandas level-1 grouping must too — the default dropna=True
            # silently discarded every row with a NULL group key (ADVICE
            # r15). NaN/NaT keys surface as None so Arrow maps them back
            # to SQL NULL whatever the column type.
            # KNOWN conflation (ADVICE r16, documented by design): for a
            # DOUBLE-typed group column, Arrow nulls and float NaN both
            # arrive in pandas as NaN (float64 has no null sentinel), so
            # a NaN group key merges into the NULL group — Spark groupBy
            # would keep them distinct. Distinguishing requires the
            # mapInArrow null mask; every current caller groups by
            # string/int columns, where the mapping is exact. Re-grouping
            # by a double column: pre-wrap the key in a struct or cast.
            groups = (
                pdf.groupby(gcols, sort=True, dropna=False)
                if gcols
                else [((), pdf)]
            )
            for key, g in groups:
                vals = np.sort(g[value_col].to_numpy(dtype=float))
                vals = vals[~np.isnan(vals)]
                if vals.size == 0:
                    continue
                m, w = _compress(vals, np.ones_like(vals), delta)
                if gcols:
                    key = key if isinstance(key, tuple) else (key,)
                    for c, k in zip(gcols, key):
                        rows[c].append(None if pd.isna(k) else k)
                rows["means"].append([float(x) for x in m])
                rows["weights"].append([float(x) for x in w])
            yield pd.DataFrame(rows)

    part = df.select(*gcols, value_col).mapInPandas(partials, part_schema)

    out_schema = StructType(
        [df.schema[c] for c in gcols]
        + [
            StructField("prob", DoubleType(), False),
            StructField("est", DoubleType(), False),
        ]
    )
    probs_l = [float(p) for p in probs]

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            # zero partial digests (empty input): no estimates, not a
            # pd.concat/IndexError crash (ADVICE r15)
            return pd.DataFrame(
                {**{c: [] for c in gcols}, "prob": [], "est": []}
            )
        means = np.concatenate([np.asarray(x, dtype=float) for x in pdf["means"]])
        weights = np.concatenate(
            [np.asarray(x, dtype=float) for x in pdf["weights"]]
        )
        m, w = _compress(means, weights, 0 + int(delta))
        rows = {c: [] for c in gcols}
        rows["prob"] = []
        rows["est"] = []
        for p in probs_l:
            for c in gcols:
                rows[c].append(pdf[c].iloc[0])
            rows["prob"].append(p)
            rows["est"].append(digest_quantile(m, w, p))
        return pd.DataFrame(rows)

    if gcols:
        return part.groupBy(*gcols).applyInPandas(merge_group, out_schema)
    # ungrouped: a single merge task (the bounded partial-digest rows
    # coalesce to one partition — arrays, never values). An empty input
    # yields zero batches: merge an empty frame (→ zero output rows)
    # instead of crashing in pd.concat([]) (ADVICE r15).
    def merge_all(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(it)
        merged = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"means": [], "weights": []})
        )
        yield merge_group(merged)

    return part.coalesce(1).mapInPandas(merge_all, out_schema)
