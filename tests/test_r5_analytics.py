"""Semantic invariants for the round-5 battery — properties the oracle
hash can't see (interval algebra, monotonicity, error bounds) plus the
schema-drift guard's own behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_scd2_intervals_chain(spark):
    """Per user: intervals are ordered, non-overlapping, and chained —
    each valid_to equals the next valid_from; exactly one open interval
    (valid_to IS NULL) per user."""
    df = registry.QUERIES["q_scd2_user_state"](spark, SF_DIR)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    chained = df.withColumn("next_from", F.lead("valid_from").over(w))
    bad_chain = chained.filter(
        F.col("valid_to").isNotNull()
        & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert bad_chain == 0
    open_per_user = (
        df.groupBy("user_id")
        .agg(F.sum(F.col("valid_to").isNull().cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert open_per_user == 0


def test_dau_wau_bounds(spark):
    """WAU dominates DAU on every day and never exceeds the trailing
    7-day DAU sum (distinct-union upper bound)."""
    df = registry.QUERIES["q_events_dau_wau"](spark, SF_DIR).collect()
    by_day = {r.day: r for r in df}
    days = sorted(by_day)
    for d in days:
        r = by_day[d]
        assert r.wau >= r.dau, f"{d}: wau {r.wau} < dau {r.dau}"
    # trailing-sum upper bound
    for i, d in enumerate(days):
        window = [by_day[x].dau for x in days[max(0, i - 6): i + 1]]
        assert by_day[d].wau <= sum(window)


def test_pareto_cumulative_share(spark):
    """cum_share is nondecreasing along the spend ranking and ends at
    exactly 1.0 (exact-decimal totals make the last division exact-ish)."""
    rows = (
        registry.QUERIES["q_orders_pareto"](spark, SF_DIR)
        .orderBy(F.desc("revenue"), F.asc("o_custkey"))
        .collect()
    )
    shares = [r.cum_share for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(shares, shares[1:]))
    assert shares[-1] == pytest.approx(1.0, abs=1e-9)


def test_moving_avg_first_row_is_identity(spark):
    """A 7-row trailing mean over the first row is the row itself."""
    first = (
        registry.QUERIES["q_window_moving_avg"](spark, SF_DIR)
        .orderBy("day")
        .first()
    )
    assert first.ma7 == pytest.approx(first.revenue, abs=1e-9)


def test_quantize_error_within_half_step(spark):
    """Symmetric int8 quantization error is bounded by half a step:
    err <= amax/254 (plus 1 micro-unit of floor slack)."""
    bad = (
        registry.QUERIES["q_embedding_quantize_error"](spark, SF_DIR)
        .filter(
            F.col("max_abs_err_e6")
            > F.col("amax_e6") / F.lit(254.0) + F.lit(1.0)
        )
        .count()
    )
    assert bad == 0


def test_contamination_nonvacuous(spark):
    """The staged benchmark split must actually overlap the corpus —
    a zero-row result would make the check vacuously green."""
    df = registry.QUERIES["q_text_contamination_overlap"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r.n_contaminated_docs >= 1 for r in rows)


def test_ntile_quartiles_balanced(spark):
    """ntile(4) bucket sizes differ by at most 1 (the defining property)."""
    sizes = [
        r.n
        for r in registry.QUERIES["q_window_ntile_quartile"](spark, SF_DIR)
        .groupBy("quartile")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 4 and max(sizes) - min(sizes) <= 1


# --- schema guard ---


def test_schema_guard_clean_on_real_testdata():
    from datawarehouse1_spark.schema_guard import check_testdata_schema

    assert check_testdata_schema(SF_DIR) == []


def test_schema_guard_names_the_drift(tmp_path):
    """A drifted column type must be reported as a single named finding,
    not an opaque failure."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouse1_spark.schema_guard import (
        TestdataSchemaDrift,
        assert_testdata_schema,
        check_testdata_schema,
    )

    # region with r_regionkey drifted int32 -> string
    tbl = pa.table(
        {"r_regionkey": pa.array(["0"]), "r_name": pa.array(["AFRICA"])}
    )
    pq.write_table(tbl, tmp_path / "region.parquet")
    findings = check_testdata_schema(str(tmp_path))
    drift = [f for f in findings if f.startswith("region.r_regionkey")]
    assert drift and "drifted to 'string'" in drift[0]
    # everything else reported missing, and the assert raises with the diff
    with pytest.raises(TestdataSchemaDrift, match="r_regionkey"):
        assert_testdata_schema(str(tmp_path))


def test_pack_chunks_contiguous(spark):
    """Chunk ids per language start at 0 and are nondecreasing in doc_id
    order; a document never starts in a chunk earlier than its
    predecessor (concat-and-chunk invariant)."""
    from pyspark.sql import Window

    df = registry.QUERIES["q_curation_pack_chunks"](spark, SF_DIR)
    w = Window.partitionBy("lang").orderBy("doc_id")
    bad = (
        df.withColumn("prev_chunk", F.lag("chunk_id").over(w))
        .filter(
            (F.col("prev_chunk").isNotNull())
            & (F.col("chunk_id") < F.col("prev_chunk"))
        )
        .count()
    )
    assert bad == 0
    first = (
        df.groupBy("lang").agg(F.min("chunk_id").alias("m")).filter(F.col("m") != 0)
    )
    assert first.count() == 0


# --- adaptive events reader: all three known encodings ---


def test_events_reader_handles_all_encodings(spark, tmp_path):
    """catalog._read_events must normalize `ts` to TIMESTAMP_NTZ with
    identical wall-clock values for every encoding the testdata has ever
    shipped: TIMESTAMP(NANOS) (r1-r3), naive timestamp[us] (r4+), and a
    hypothetical UTC-adjusted timestamp[us]. This is the regression
    test for the r4 drift — each variant is written to a temp dir and
    read through the same code path the catalog uses."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouse1_spark.catalog import table as cat_table

    base = [
        datetime(2024, 1, 1, 0, 9, 58, 778549),
        datetime(2024, 3, 15, 12, 0, 0, 1),
        datetime(2025, 12, 31, 23, 59, 59, 999999),
    ]

    def write_events(dirname, ts_type):
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2, 3], pa.int64()),
                    "ts": pa.array(base, ts_type),
                    "user_id": pa.array([1, 2, 3], pa.int64()),
                    "event_type": pa.array(["view"] * 3),
                    "value": pa.array([1.0] * 3),
                    "props": pa.array(["{}"] * 3),
                }
            ),
            d / "events.parquet",
        )
        return str(d)

    results = {}
    for name, t in [
        ("ns", pa.timestamp("ns")),
        ("us", pa.timestamp("us")),
        ("us_utc", pa.timestamp("us", tz="UTC")),
    ]:
        df = cat_table(spark, write_events(name, t), "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz", name
        results[name] = [r.ts for r in df.orderBy("event_id").collect()]

    assert results["ns"] == results["us"] == results["us_utc"] == base


def test_orders_reader_normalizes_ns_dates(spark, tmp_path):
    """The generalized normalization covers non-events tables too: an
    orders file re-encoded to TIMESTAMP(NANOS) must load with
    o_orderdate as TIMESTAMP_NTZ, not leak through as raw BIGINT (the
    silent variant of the r4 drift — the session-wide nanosAsLong conf
    set for events would otherwise expose ns dates as longs)."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouse1_spark.catalog import table as cat_table

    d = tmp_path / "sf"
    d.mkdir()
    dates = [datetime(2024, 5, 1, 10, 30), datetime(2025, 1, 2, 0, 0)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_orderstatus": pa.array(["O", "F"]),
                "o_totalprice": pa.array([10.0, 20.0]),
                "o_orderdate": pa.array(dates, pa.timestamp("ns")),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"]),
            }
        ),
        d / "orders.parquet",
    )
    df = cat_table(spark, str(d), "orders")
    assert df.schema["o_orderdate"].dataType.simpleString() == "timestamp_ntz"
    got = [r.o_orderdate for r in df.orderBy("o_orderkey").collect()]
    assert got == dates


# --- conservation invariants (r4 pattern: totals must reconcile) ---


def test_gap_histogram_conserves_events(spark):
    """Every event except each user's first produces exactly one gap:
    sum(n_gaps) == n_events - n_distinct_users."""
    from datawarehouse1_spark.catalog import table as cat_table

    hist = registry.QUERIES["q_events_gap_histogram"](spark, SF_DIR)
    total_gaps = hist.agg(F.sum("n_gaps").alias("s")).first().s
    ev = cat_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_gaps == n_events - n_users


def test_token_histogram_conserves_docs(spark):
    """Histogram buckets partition the corpus: doc counts sum to the
    table size."""
    from datawarehouse1_spark.catalog import table as cat_table

    hist = registry.QUERIES["q_text_token_histogram"](spark, SF_DIR)
    assert (
        hist.agg(F.sum("n_docs").alias("s")).first().s
        == cat_table(spark, SF_DIR, "documents").count()
    )


def test_dup_rate_conserves_docs(spark):
    """Per-source doc counts sum to the table size, and dupes never
    exceed docs."""
    from datawarehouse1_spark.catalog import table as cat_table

    rates = registry.QUERIES["q_docs_dup_rate_by_source"](spark, SF_DIR)
    rows = rates.collect()
    assert sum(r.n_docs for r in rows) == cat_table(
        spark, SF_DIR, "documents"
    ).count()
    assert all(0 <= r.n_dupes < r.n_docs or r.n_docs == r.n_dupes == 0 for r in rows)
    assert all(r.n_unique + r.n_dupes == r.n_docs for r in rows)


def test_packed_pipeline_chunks_dense_and_nonempty(spark):
    """Chunk ids in the packed manifest are dense per language
    (0..max with no holes — concat-and-chunk can't skip a chunk) and
    every chunk holds at least one document start."""
    manifest = registry.QUERIES["q_llm_pipeline_packed"](spark, SF_DIR)
    rows = manifest.collect()
    assert rows and all(r.n_docs >= 1 and r.total_tokens > 0 for r in rows)
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.chunk_id)
    for lang, chunks in by_lang.items():
        assert sorted(chunks) == list(range(max(chunks) + 1)), lang


def test_ts_normalization_property_random_datetimes(spark, tmp_path):
    """Property: for ANY microsecond-precision datetime, the ns and us
    encodings of the same events file load identical NTZ values through
    the catalog (hypothesis-driven edge cases: epoch boundary, leap
    days, DST transition instants, year-9999-adjacent)."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from datawarehouse1_spark.catalog import table as cat_table

    # microsecond-precision datetimes inside the ns-representable range
    dts = st.datetimes(
        min_value=datetime(1700, 1, 1), max_value=datetime(2200, 1, 1)
    ).map(lambda d: d.replace(microsecond=(d.microsecond // 1) % 1000000))

    counter = [0]

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(dts, min_size=1, max_size=4, unique=True))
    def check(values):
        counter[0] += 1
        got = {}
        for enc, t in (("ns", pa.timestamp("ns")), ("us", pa.timestamp("us"))):
            d = tmp_path / f"case{counter[0]}_{enc}"
            d.mkdir()
            pq.write_table(
                pa.table(
                    {
                        "event_id": pa.array(range(len(values)), pa.int64()),
                        "ts": pa.array(values, t),
                        "user_id": pa.array([0] * len(values), pa.int64()),
                        "event_type": pa.array(["x"] * len(values)),
                        "value": pa.array([0.0] * len(values)),
                        "props": pa.array(["{}"] * len(values)),
                    }
                ),
                d / "events.parquet",
            )
            df = cat_table(spark, str(d), "events")
            got[enc] = [r.ts for r in df.orderBy("event_id").collect()]
        assert got["ns"] == got["us"] == values

    check()
