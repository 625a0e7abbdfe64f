"""Order-independent table checksums for cross-system reconciliation.

This is the project's own use-case turned into an operator: when a
warehouse migrates engines (the reference's pandas+Postgres → this
repo's Spark), the receiving side needs a cheap proof that every row
arrived intact WITHOUT sorting or shuffling whole tables. The standard
construction: canonicalize each row to a string, hash it, and SUM the
hashes modulo a prime — addition commutes, so the checksum is
independent of row order and partitioning, and any single-row change
moves it with overwhelming probability.

Cross-engine determinism: the row hash is md5 (identical hex in Spark
and DuckDB); its first 15 hex digits parse to an int64 via an UNROLLED
positional sum (both engines lack a shared hex→int builtin; 15 digits
keep 16¹⁵ = 2⁶⁰ inside int64, and the fixed 15-term expression stays
in whole-stage codegen — no higher-order per-char folds on the hot
path). Only string/integer columns should feed the canonical form:
float/timestamp rendering differs between engines (callers cast
explicitly if they need those covered).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD_P = (1 << 61) - 1
_HEX = "0123456789abcdef"


def hex15_to_long(col: Column) -> Column:
    """First 15 hex chars of a hex string -> int64 (positional sum)."""
    # the digit must be LONG before the scale multiply: instr returns
    # int32, and digit * 16^7 already overflows int32 for digits >= 8 —
    # a data-dependent ANSI overflow that only fires on rows whose md5
    # has a high digit in the middle positions
    terms = [
        (F.instr(F.lit(_HEX), F.substring(col, i + 1, 1)) - 1).cast("long")
        * F.lit(16 ** (15 - 1 - i))
        for i in range(15)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def row_hash(cols: list[str]) -> Column:
    """Canonical per-row hash: netstring-framed fields, md5'd. Each
    value is encoded as 'S<length>:<value>' and NULL as 'N', so the
    concatenation parses unambiguously — no separator can collide with
    value content (('a|b','c') vs ('a','b|c') hash differently, unlike
    naive pipe-joining) and NULL collides with nothing.

    Emitted as ONE F.expr SQL string: the per-Column construction built
    ~15 instr/substring terms × per-field netstring branches through
    individual py4j calls (~400 ms of driver time per build, measured
    r16); a single parsed SQL string is one call for the identical
    expression tree."""
    parts = []
    for c in cols:
        s = f"CAST(`{c}` AS STRING)"
        parts.append(
            f"CASE WHEN {s} IS NULL THEN 'N' ELSE concat('S', "
            f"CAST(length({s}) AS STRING), ':', {s}) END"
        )
    md5 = f"md5(concat({', '.join(parts)}))"
    terms = " + ".join(
        f"CAST(instr('{_HEX}', substr({md5}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (15 - 1 - i)}"
        for i in range(15)
    )
    return F.expr(f"({terms})")


def table_checksum(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """One reconciliation row: (table_name, n_rows, checksum). The sum
    runs in DECIMAL(38,0) (exact; DuckDB's twin uses HUGEINT) and
    reduces mod 2⁶¹−1 back to int64. Map-side partial aggregation does
    the heavy lifting — one scan, one 1-row exchange, no sort.

    r16: the md5-per-row canonicalization is the CPU-heavy narrow stage
    of this operator, and a small input (single-row-group file, bounded
    sample) inherits the scan's 1-2 partitions and serializes it on 2
    of N cores — widen_if_narrow lifts it to full parallelism exactly
    then, and is a NO-OP at production split counts (guide §4.5
    analog; same pattern as build_minhash_index). Projected to `cols`
    FIRST so the widen exchange, when taken, carries only the
    checksummed columns (guide §2.3). Measured: q_reconcile_checksums
    2.64 → 2.08 s at sf0.1."""
    from datawarehouse1_spark.operators.scale import widen_if_narrow

    df = widen_if_narrow(df.select(*cols))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(row_hash(cols).cast("decimal(38,0)")) % MOD_P)
        .cast("long")
        .alias("checksum"),
    ).select(F.lit(name).alias("table_name"), "n_rows", "checksum")


def hex15_to_long_sql(expr: str) -> str:
    """The DuckDB twin of hex15_to_long, as SQL text over `expr`."""
    terms = [
        f"(strpos('{_HEX}', substr({expr}, {i + 1}, 1)) - 1) "
        f"* {16 ** (15 - 1 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def hexn_to_int_sql(expr: str, n: int) -> str:
    """First n hex nibbles of `expr` (a hex-string SQL expression,
    typically md5(...)) as an integer, written as SQL text that parses
    IDENTICALLY in Spark SQL and DuckDB: instr over the hex alphabet
    (DuckDB has no conv()). Safe in int64 for n <= 15; the callers'
    overflow reasoning lives here once instead of per copy."""
    assert 1 <= n <= 15
    terms = [
        f"(instr('0123456789abcdef', substr({expr}, {i}, 1)) - 1)"
        f" * {16 ** (n - i)}"
        for i in range(1, n + 1)
    ]
    return "(" + " + ".join(terms) + ")"
