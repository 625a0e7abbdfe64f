"""Excel serial-date conversion (SURVEY.md C18).

The reference's ventes.xlsx delivers `date_vente` as an Excel serial
float (45787.604166666664 == 2025-04-10 14:30:00; epoch 1899-12-30 —
SURVEY.md §5.2). Conversion: serial days since 1899-12-30 minus the
25569-day offset to the Unix epoch, times 86400 s. Computed in integral
seconds so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EXCEL_EPOCH_OFFSET_DAYS = 25569  # 1899-12-30 .. 1970-01-01


def excel_serial_to_timestamp(serial: str | Column) -> Column:
    c = F.col(serial) if isinstance(serial, str) else serial
    secs = F.round((c - F.lit(EXCEL_EPOCH_OFFSET_DAYS)) * F.lit(86400.0)).cast("long")
    # NTZ: Excel serials are wall-clock times; timestamp_seconds alone
    # would produce an LTZ instant that shifts with the session time zone
    from datawarehouse1_spark.functions import ntz_utc

    return ntz_utc(F.timestamp_seconds(secs))


def sql_excel_serial_to_timestamp(col: str) -> str:
    """DuckDB twin. epoch_ms returns a naive TIMESTAMP (matches Spark@UTC)."""
    return f"epoch_ms(CAST(round(({col} - 25569) * 86400.0) AS BIGINT) * 1000)"
