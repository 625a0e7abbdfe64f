"""Unit tests on reference-shaped fixtures (FIXTURES.md §A): the exact
quirks the reference's sample data encodes — content dupes under distinct
ids (CLI001/CLI003), whitespace, Excel serial dates, FK orphans,
re-delivered keys — against the reusable operators.
"""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark.functions.excel_serial import excel_serial_to_timestamp
from datawarehouse1_spark.operators.warehouse import (
    add_surrogate_key,
    add_surrogate_key_distributed,
    dedup_keep_latest,
    duplicate_keys,
    fk_orphans,
    null_violations,
    upsert_small_table,
)


@pytest.fixture(scope="module")
def clients(spark):
    # FIXTURES.md A1: CLI003 is a full content-dup of CLI001; CLI004 has a
    # null not-null field; CLI001 re-delivered (same key) in a later batch.
    rows = [
        ("CLI001", "Dupont", "Jean", "j@d.fr", "0612345678", " 1 rue de Paris, Paris", 1),
        ("CLI002", "Martin", "Anne", "a@m.fr", "698765432", "2 av Foch, Lyon", 1),
        ("CLI003", "Dupont", "Jean", "j@d.fr", "0612345678", " 1 rue de Paris, Paris", 1),
        ("CLI004", None, "Luc", None, None, None, 1),
        ("CLI001", "Dupont", "Jean-Marie", "j@d.fr", "0612345678", "1 rue de Paris", 2),
    ]
    return spark.createDataFrame(
        rows, "client_id string, nom string, prenom string, email string, telephone string, adresse string, batch int"
    )


def test_dedup_keep_latest_business_key(clients):
    out = dedup_keep_latest(clients, ["client_id"], ["batch"])
    rows = {r.client_id: r for r in out.collect()}
    assert len(rows) == 4
    assert rows["CLI001"].prenom == "Jean-Marie"  # batch 2 superseded batch 1


def test_full_row_dedup_catches_content_dupes(clients):
    content_cols = ["nom", "prenom", "email", "telephone", "adresse"]
    dupes = duplicate_keys(clients.filter("batch = 1"), content_cols).collect()
    assert len(dupes) == 1 and dupes[0].n_copies == 2  # CLI001/CLI003 pair


def test_null_violation_report(clients):
    bad = null_violations(clients, ["client_id", "nom", "prenom"]).collect()
    assert [r.client_id for r in bad] == ["CLI004"]


def test_telephone_stays_string(clients):
    # leading-zero hazard: '0612345678' must survive untouched
    tel = clients.filter("client_id = 'CLI001' and batch = 1").first().telephone
    assert tel == "0612345678"


def test_trim_quirk(clients):
    out = clients.select(F.trim("adresse").alias("a")).first().a
    assert out == "1 rue de Paris, Paris"


def test_fk_orphans_on_ventes(spark, clients):
    ventes = spark.createDataFrame(
        [
            ("VNT001", "CLI001", 2, Decimal("10000.00")),
            ("VNT002", "CLI999", 1, Decimal("50.00")),  # orphan client
        ],
        "vente_id string, client_id string, quantite int, prix_total decimal(10,2)",
    )
    orphans = fk_orphans(ventes, clients, "client_id", "client_id").collect()
    assert [r.vente_id for r in orphans] == ["VNT002"]


def test_excel_serial_reference_value(spark):
    # the exact value shipping in ventes.xlsx (verified from the raw sheet
    # XML: F2 = 45787.604166666664). Standard 1899-12-30 epoch puts that at
    # 2025-05-10 14:30:00 — SURVEY.md §5.2's "2025-04-10" annotation is off
    # by a month; the epoch arithmetic here is the Excel-standard one.
    df = spark.createDataFrame([(45787.604166666664,)], "serial double")
    out = df.select(excel_serial_to_timestamp("serial").alias("ts")).first().ts
    assert out == datetime(2025, 5, 10, 14, 30, 0)


def test_surrogate_keys_dense_and_deterministic(spark):
    df = spark.range(0, 1000).select((F.col("id") * 7 % 1000).alias("k")).repartition(8)
    simple = add_surrogate_key(df, ["k"]).orderBy("k").collect()
    dist = (
        add_surrogate_key_distributed(df, ["k"]).orderBy("k").collect()
    )
    assert [r.id for r in simple] == list(range(1, 1001))
    assert [r.id for r in dist] == list(range(1, 1001))
    assert [r.k for r in simple] == [r.k for r in dist]


def test_upsert_small_table(spark):
    old = spark.createDataFrame(
        [("a.xlsx", 1, "success"), ("b.xlsx", 1, "error")],
        "filename string, version int, status string",
    )
    new = spark.createDataFrame(
        [("b.xlsx", 2, "success"), ("c.xlsx", 1, "success")],
        "filename string, version int, status string",
    )
    out = {r.filename: r for r in upsert_small_table(old, new, ["filename"], ["version"]).collect()}
    assert len(out) == 3
    assert out["b.xlsx"].version == 2 and out["b.xlsx"].status == "success"


def test_apply_cdc_insert_update_delete_latest_wins(spark):
    """Full MERGE semantics: untouched rows survive, the LATEST change
    per key wins (update-then-delete nets to delete; update-then-update
    nets to the second update), inserts add new keys."""
    from datawarehouse1_spark.operators.warehouse import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b1", "U", 1),   # plain update
            (3, "c1", "U", 1),   # update...
            (3, "c1", "D", 2),   # ...then delete => gone
            (4, "d1", "U", 1),   # update...
            (4, "d2", "U", 2),   # ...then update => d2 wins
            (5, "e", "I", 1),    # brand-new key
        ],
        "k int, v string, op string, seq int",
    )
    got = {
        (r.k, r.v)
        for r in apply_cdc(base, changes, keys=("k",)).collect()
    }
    assert got == {(1, "a"), (2, "b1"), (4, "d2"), (5, "e")}


def test_apply_cdc_delete_only_key_absent_everywhere(spark):
    """A delete for a key never seen in the snapshot must not resurrect
    anything; a delete as the ONLY change removes the base row."""
    from datawarehouse1_spark.operators.warehouse import apply_cdc

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    changes = spark.createDataFrame(
        [(2, None, "D", 1), (9, None, "D", 1)], "k int, v string, op string, seq int"
    )
    got = {(r.k, r.v) for r in apply_cdc(base, changes, keys=("k",)).collect()}
    assert got == {(1, "a")}


def test_apply_cdc_duplicate_winner_seq_fails_loudly(spark):
    """Total-order contract enforcement (r6 ADVICE): two changes with
    the same (key, seq) at the TOP of a key's history have no defined
    winner — the fold must raise at execution time, not silently pick
    one (nondeterministic snapshots break replay/exactly-once)."""
    import pytest
    from datawarehouse1_spark.operators.warehouse import apply_cdc

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    changes = spark.createDataFrame(
        [(1, "x", "U", 7), (1, "y", "U", 7)],
        "k int, v string, op string, seq int",
    )
    with pytest.raises(Exception, match="duplicate \\(key, seq\\)"):
        apply_cdc(base, changes, keys=("k",)).collect()


def test_apply_cdc_tie_below_winner_is_fine(spark):
    """Ties BELOW the winner don't affect the outcome and must pass:
    the guard enforces determinism of the result, not feed hygiene."""
    from datawarehouse1_spark.operators.warehouse import apply_cdc

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    changes = spark.createDataFrame(
        [(1, "x", "U", 1), (1, "y", "U", 1), (1, "z", "U", 2)],
        "k int, v string, op string, seq int",
    )
    got = {(r.k, r.v) for r in apply_cdc(base, changes, keys=("k",)).collect()}
    assert got == {(1, "z")}


def test_extract_changes_roundtrip_law(spark):
    """apply_cdc(old, extract_changes(old, new)) == new — the pair of
    operators must be exact inverses, including null values, null-only
    diffs, inserts of null-bearing rows, and deletes."""
    from datawarehouse1_spark.operators.warehouse import apply_cdc, extract_changes

    old = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, "c", None), (4, "d", 40), (5, "e", 50)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),       # unchanged: no change row emitted
            (2, "b2", 20),      # null -> value
            (3, "c", 30),       # value -> value (was null)
            (5, None, None),    # value -> null (update to nulls)
            (6, None, 60),      # insert with a null field
        ],                      # k=4 deleted
        "k int, s string, v int",
    )
    changes = extract_changes(old, new, keys=("k",))
    got_ops = {(r.k, r.op) for r in changes.collect()}
    assert got_ops == {(2, "U"), (3, "U"), (5, "U"), (6, "I"), (4, "D")}

    replayed = apply_cdc(
        old, changes.withColumn("seq", F.lit(1)), keys=("k",)
    )
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in new.collect()
    }


def test_extract_changes_schema_mismatch_raises(spark):
    from datawarehouse1_spark.operators.warehouse import extract_changes

    old = spark.createDataFrame([(1, "a")], "k int, s string")
    new = spark.createDataFrame([(1, "a", 2)], "k int, s string, extra int")
    with pytest.raises(ValueError, match="schemas differ"):
        extract_changes(old, new, keys=("k",))


def test_scd2_from_changes_intervals_and_guard(spark):
    """SCD2 materialization: U,U chains produce chained intervals, a D
    closes without adding a row, and duplicate (key, seq) raises."""
    import pytest
    from datawarehouse1_spark.operators.warehouse import scd2_from_changes

    changes = spark.createDataFrame(
        [
            (1, "a1", "I", 1), (1, "a2", "U", 3), (1, None, "D", 5),
            (2, "b1", "I", 2),
        ],
        "k int, v string, op string, seq int",
    )
    got = {
        (r.k, r.v, r.valid_from_seq, r.valid_to_seq, r.is_current)
        for r in scd2_from_changes(changes, keys=("k",)).collect()
    }
    assert got == {
        (1, "a1", 1, 3, False),
        (1, "a2", 3, 5, False),  # closed by the delete, no current row
        (2, "b1", 2, None, True),
    }

    dup = spark.createDataFrame(
        [(1, "x", "I", 1), (1, "y", "U", 1)],
        "k int, v string, op string, seq int",
    )
    with pytest.raises(Exception, match="duplicate \\(key, seq\\)"):
        scd2_from_changes(dup, keys=("k",)).collect()
