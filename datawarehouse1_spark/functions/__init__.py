"""Scalar/vector helper expressions shared by queries and operators."""


def ntz_utc(col):
    """TIMESTAMP_LTZ instant -> TIMESTAMP_NTZ carrying the UTC wall time.

    The testdata's naive parquet timestamps mean 'UTC wall clock' (that is
    how DuckDB reads them); any engine path that manufactures an LTZ value
    (timestamp_micros, timestamp_seconds) must pass through here so query
    results are independent of the OS/session time zone."""
    from pyspark.sql import functions as F

    return F.convert_timezone(None, F.lit("UTC"), col)
