"""Round-10 events, batch 3: per-user behavioral diversity (Gini).

* **User type Gini** — the Gini impurity of each user's event-type
  distribution: 0 for a user who only ever does one thing (the bot
  signature), approaching 1 - 1/k for a user spread evenly over k
  types.  This is the rational diversity statistic (rule 20: Gini, not
  Shannon entropy — no transcendental touches a hashed output; the
  q_text_char_gini discipline applied to behavior), exact in floored
  micro-units: gini_e6 = (n² - Σ c_t²)·1e6 div n².

Reference parity: the reference ETL (etl/app.py) has no events
surface; SURVEY.md §2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared


@declared(
    "q_events_user_type_gini",
    oracle="""
    WITH ut AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST((SUM(c) * SUM(c) - SUM(CAST(c AS HUGEINT) * c)) * 1000000
                // (SUM(c) * SUM(c)) AS BIGINT) AS gini_e6
    FROM ut
    GROUP BY user_id
    """,
)
def q_events_user_type_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type Gini impurity in exact floored micro-units —
    the single-mindedness / bot-behavior screen (gini 0 = one type
    only; uniform over k types = floor((1-1/k)·1e6)).  Two-level
    aggregate (user+type, then user — rule 4: no Expand on the fact
    table); the squared sums ride DECIMAL(38,0) in Spark and native
    HUGEINT in the oracle, so n_events is safe to ~1e18 per user."""
    e = table(spark, sf_dir, "events")
    ut = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    d = "CAST(SUM(c) AS DECIMAL(38,0))"
    return ut.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.expr(
            f"({d} * {d} - SUM(CAST(c AS DECIMAL(19,0)) * c)) * 1000000"
            f" div ({d} * {d})"
        )
        .cast("long")
        .alias("gini_e6"),
    )
