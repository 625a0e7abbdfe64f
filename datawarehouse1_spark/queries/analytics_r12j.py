"""Round-12 analytics, batch 10: interval concurrency and graph link
prediction.

Two operators:

* **Peak concurrency per day** — sweep-line over event intervals
  (each event holds a resource for 5 minutes): the classic
  capacity-planning read (max simultaneous sessions/connections), an
  INTERVAL aggregate none of the tumbling/hopping window operators
  express.  The sweep is made engine-portable by (a) encoding
  (time, end-before-start) into ONE sortable integer key so a RANGE
  frame can order on it — a running sum over a RANGE frame includes
  ALL peers, so tie order inside an instant can never skew the count
  (a ROWS frame would be nondeterministic across engines) — and
  (b) rule-22 two-level cumulation: the running sum partitions by
  day, and only the bounded per-day delta totals cross the global
  carry-over window.

* **Link prediction by common-neighbor Jaccard** — the top-20
  NON-edges of the co-purchase graph ranked by neighborhood overlap
  (|N(a)∩N(c)| / |N(a)∪N(c)|): the "customers who bought these also
  bought" candidate generator, and the predictive companion to the
  descriptive triangle/component operators.  Candidates come from
  WEDGES (two-hop paths), never all-pairs; scores are exact floored
  e6 rationals; the top-20 cut breaks ties on (score DESC, a, c) — a
  total order, so both engines cut identically.

Exactness discipline as batches 1-9.  Reference parity: the reference
ETL (etl/app.py) has no analytics surface; SURVEY.md §2C/§2D
extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.queries.copurchase import (
    copurchase_edges,
    copurchase_edges_sql,
)
from datawarehouse1_spark.registry import declared

# ---------------------------------------------------------------------------
# 1. Peak concurrency per day (sweep line over 5-minute holds)
# ---------------------------------------------------------------------------

_HOLD_SECONDS = 300

# Sortable sweep key: microseconds-since-epoch doubled, +1 for starts —
# ends sort BEFORE starts at the same instant (half-open intervals), and
# a single integer key lets the running sum use a RANGE frame (peer-
# inclusive => tie-order-proof) in both engines.


@declared(
    "q_events_peak_concurrency",
    oracle=f"""
    WITH deltas AS (
      SELECT CAST(ts AS DATE) AS day,
             2 * date_diff('microsecond', TIMESTAMP '1970-01-01', ts) + 1
               AS k,
             1 AS delta
      FROM events
      UNION ALL
      SELECT CAST(ts + INTERVAL {_HOLD_SECONDS} SECOND AS DATE) AS day,
             2 * date_diff('microsecond', TIMESTAMP '1970-01-01',
                           ts + INTERVAL {_HOLD_SECONDS} SECOND) AS k,
             -1 AS delta
      FROM events
    ),
    in_day AS (
      SELECT day, delta,
             SUM(delta) OVER (PARTITION BY day ORDER BY k
                              RANGE BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS run
      FROM deltas
    ),
    day_tot AS (
      SELECT day, SUM(delta) AS tot,
             CAST(COUNT(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_starts
      FROM deltas GROUP BY day
    ),
    carry AS (
      SELECT day, n_starts,
             SUM(tot) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS carry_in
      FROM day_tot
    )
    SELECT c.day, c.n_starts,
           CAST(coalesce(c.carry_in, 0) AS BIGINT) AS carry_in,
           CAST(GREATEST(coalesce(c.carry_in, 0),
                         MAX(coalesce(c.carry_in, 0) + i.run)) AS BIGINT)
             AS peak_concurrency
    FROM carry c JOIN in_day i ON i.day = c.day
    GROUP BY c.day, c.n_starts, c.carry_in
    """,
)
def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous 5-minute event holds per day — the sweep-line
    capacity metric (max concurrent sessions) that tumbling/hopping
    windows cannot express.  Portability: the (instant, end-first)
    order is ONE integer key (2·μs + is_start) so the running sum uses
    a peer-inclusive RANGE frame — tie order inside an instant cannot
    change any observed prefix, making the max engine-identical;
    intervals are half-open (an end and a start at the same μs never
    overlap).  Rule 22: the running sum partitions BY DAY; cross-day
    carry-over cumulates on the bounded per-day totals table only and
    broadcasts back.  The peak is GREATEST(carry_in, carry_in +
    max(run)): the carried midnight plateau is itself an attained
    level (held until the day's first delta), so a day whose first
    deltas are ends must not under-report it (r12 review catch — the
    oracle encoded the same formula, so only a semantic reading found
    it).  Scale: 2 rows per event, one day-keyed exchange, no global
    sort."""
    ev = table(spark, sf_dir, "events").select("ts")
    # ts is TIMESTAMP_NTZ (rule 25): zone-free diff against the NTZ
    # epoch, never unix_* (which coerces through the session zone)
    us = (
        "timestampdiff(MICROSECOND,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00', {0})"
    )
    end = f"ts + INTERVAL {_HOLD_SECONDS} SECOND"
    starts = ev.select(
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.expr("2 * " + us.format("ts") + " + 1").alias("k"),
        F.lit(1).alias("delta"),
    )
    ends = ev.select(
        F.expr(f"CAST({end} AS DATE)").alias("day"),
        F.expr("2 * " + us.format(end)).alias("k"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends)
    w_run = (
        Window.partitionBy("day")
        .orderBy("k")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_day = deltas.select(
        "day", "delta", F.sum("delta").over(w_run).alias("run")
    )
    day_tot = deltas.groupBy("day").agg(
        F.sum("delta").alias("tot"),
        F.count(F.when(F.col("delta") == 1, 1)).alias("n_starts"),
    )
    w_carry = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = day_tot.select(
        "day",
        "n_starts",
        F.coalesce(F.sum("tot").over(w_carry), F.lit(0))
        .cast("long")
        .alias("carry_in"),
    )
    return (
        in_day.join(F.broadcast(carry), "day")
        .groupBy("day", "n_starts", "carry_in")
        .agg(
            F.greatest(
                F.col("carry_in"),
                F.max(F.col("carry_in") + F.col("run")),
            )
            .cast("long")
            .alias("peak_concurrency")
        )
    )


# ---------------------------------------------------------------------------
# 2. Link prediction: top-20 non-edges by common-neighbor Jaccard
# ---------------------------------------------------------------------------

_LP_TOPK = 20


@declared(
    "q_graph_link_prediction",
    oracle=f"""
    WITH {copurchase_edges_sql()},
    sym AS (
      SELECT pa AS u, pb AS v FROM e
      UNION ALL SELECT pb AS u, pa AS v FROM e
    ),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM sym GROUP BY u),
    wedge AS (
      SELECT s1.v AS a, s2.v AS c, COUNT(*) AS cn
      FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
      GROUP BY s1.v, s2.v
    ),
    cand AS (
      SELECT w.a, w.c, w.cn
      FROM wedge w ANTI JOIN e ON e.pa = w.a AND e.pb = w.c
    )
    SELECT cand.a AS part_a, cand.c AS part_b,
           CAST(cn AS BIGINT) AS common_neighbors,
           CAST(cn * 1000000 // (da.d + dc.d - cn) AS BIGINT)
             AS jaccard_e6
    FROM cand
    JOIN deg da ON da.node = cand.a
    JOIN deg dc ON dc.node = cand.c
    ORDER BY jaccard_e6 DESC, part_a, part_b
    LIMIT {_LP_TOPK}
    """,
)
def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted co-purchase links: non-adjacent part
    pairs ranked by common-neighbor Jaccard — the "bought together
    candidates you haven't bundled yet" generator, turning the graph
    operators predictive.  Candidates come from WEDGES (a—b—c paths:
    one self-join of the symmetric edge list on the middle node),
    never all-pairs; existing edges drop via anti-join; Jaccard =
    cn·1e6 // (deg(a)+deg(c)−cn) is an exact non-negative floor
    (denominator ≥ cn ≥ 1).  The top-k cut orders by (score DESC, a,
    c) — a TOTAL order, so both engines keep the same 20 — and Spark
    plans it as TakeOrdered (no global sort materializes).  Scale:
    wedge counts bound by Σ_b deg(b)², the skew knob being the
    support threshold upstream."""
    # shared support>=2 edge list, checkpointed: reused for sym,
    # wedges, and the anti-join
    e = copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    s1 = sym.select(F.col("u").alias("m"), F.col("v").alias("a2"))
    s2 = sym.select(F.col("u").alias("m"), F.col("v").alias("c2"))
    wedge = (
        s1.join(s2, (s1.m == s2.m) & (F.col("a2") < F.col("c2")))
        .groupBy(F.col("a2").alias("a"), F.col("c2").alias("c"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = wedge.join(
        e,
        (wedge.a == e.pa) & (wedge.c == e.pb),
        "left_anti",
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("v").alias("c"), F.col("d").alias("dc"))
    scored = (
        cand.join(da, "a")
        .join(dc, "c")
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.expr("CAST(cn * 1000000 div (da + dc - cn) AS BIGINT)").alias(
                "jaccard_e6"
            ),
        )
    )
    return scored.orderBy(
        F.desc("jaccard_e6"), F.asc("part_a"), F.asc("part_b")
    ).limit(_LP_TOPK)
