"""UDF surface (SURVEY.md C23): the reference has zero UDFs; this provides
the extension surface — a vectorized (Arrow) pandas_udf in a declared
query with a plain-SQL oracle, proving the Python path is hash-faithful.

Row-at-a-time Python UDFs are deliberately absent from every hot path:
pandas_udf (Arrow batches) is the only sanctioned Python escape hatch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared


@F.pandas_udf(DoubleType())
def _charge(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    # Per-row IEEE-754 double arithmetic: bit-identical to the SQL twin.
    return extended * (1.0 - discount) * (1.0 + tax)


@declared(
    "q_pandas_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H 'charge' expression computed in a vectorized pandas_udf.
    (In production this exact expression would be a built-in column op —
    the query exists to pin the Arrow round-trip's determinism.)"""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@declared(
    "q_builtin_charge",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_builtin_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same expression JVM-side — the fast path the engine actually
    uses; benched against q_pandas_udf_scalar to quantify the UDF tax."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("charge"),
    )


# --- C23: Python UDTF (table function) — one input row => many output rows ---
@declared(
    "q_udtf_bigrams",
    oracle=r"""
    WITH words AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
    FROM words
    """,
)
def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram exploder as a Python UDTF invoked via LATERAL — the
    UDTF leg of the C23 surface (scalar pandas_udf above, grouped
    applyInPandas in multimodal/, stateful applyInPandasWithState in
    streaming/). Arrow-backed (useArrow); for a pure-built-in equivalent
    the same bigrams come from transform(slice(...)) array ops."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string", useArrow=True)
    class BigramUDTF:
        def eval(self, text: str):
            words = [w for w in re.split(r"\s+", (text or "").lower()) if w]
            for a, b in zip(words, words[1:]):
                yield (a + " " + b,)

    spark.udtf.register("bigrams_udtf", BigramUDTF)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    ).createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, b.bigram
        FROM __docs_for_udtf d, LATERAL bigrams_udtf(d.text) b
        """
    )
