"""Table catalog over the driver's parquet testdata (TESTDATA.md).

The reference bootstraps its catalog with one-shot DDL
(init-db/init.sql:1-67 -> Postgres system catalog); here the catalog is
`spark.read.parquet` over immutable parquet dirs plus temp views, which
gives Catalyst per-table statistics, column pruning, and filter pushdown
for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to always broadcast in a star join at any SF the
# reference's schema implies (region/nation are fixed-cardinality).
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Parquet scan => vectorized reader, pushdown."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader
        # rejects; read nanos as long (runtime-settable conf, so it works
        # under any caller's session) and floor to microseconds — the same
        # truncation DuckDB applies when materializing ns timestamps.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # integer div, not double div: ns values (~1.7e18) lose ulp
        # precision through a double and floor off-by-one. NTZ via
        # ntz_utc: timestamp_micros yields an LTZ instant, which would
        # drag the session time zone into window/date_trunc results —
        # the naive source means UTC wall clock (as DuckDB reads it).
        from datawarehouse1_spark.functions import ntz_utc

        return df.withColumn(
            "ts", ntz_utc(F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so spark.sql() queries work too."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
