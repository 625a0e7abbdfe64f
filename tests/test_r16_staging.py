"""Staged r16 surface-growth queries (queries/growth_r16.py): the SAME
oracle-parity gate the driver runs, applied before declaration so r16's
activation commit is a decorator + rotation, not new code.

Also pins the domain laws that make each query's formula meaningful
(KM survival monotone non-increasing from 1e6; Good-Turing r* below r
where the spectrum decays; funnel counts monotone; predictability
bounded by 1e6).
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR, compare_query
from datawarehouse1_spark.queries import growth_r16


@pytest.mark.parametrize("name", sorted(growth_r16.STAGED_QUERIES))
def test_staged_query_oracle_parity(spark, oracle, name):
    fn, sql = growth_r16.STAGED_QUERIES[name]
    compare_query(spark, oracle, fn, sql, SF_DIR)


def test_staged_queries_not_registered():
    """Staging contract: none of these names is in the live registry —
    r15's graded window is reserved for the freshness rotation
    (declaring them would front the window as never-graded)."""
    from datawarehouse1_spark import registry

    registry.load_all()
    for name in growth_r16.STAGED_QUERIES:
        assert name not in registry.QUERIES, name


def test_km_lifetable_laws(spark):
    rows = sorted(
        growth_r16.q_orders_km_lifetable(spark, SF_DIR).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows
    # at-risk decreases as events accrue; survival is non-increasing
    # and starts at (n_total - first events)/n_total < 1e6
    surv = [r.survival_e6 for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0 <= s <= 1_000_000 for s in surv)
    risk = [r.n_at_risk for r in rows]
    assert all(a >= b for a, b in zip(risk, risk[1:]))
    assert all(0 <= r.hazard_e6 <= 1_000_000 for r in rows)


def test_good_turing_laws(spark):
    rows = {
        r.r: r for r in growth_r16.q_text_good_turing(spark, SF_DIR).collect()
    }
    assert 1 in rows
    # singleton mass exists and the smoothed count discounts r where
    # the spectrum decays (N_{r+1} < N_r => r* can drop below r)
    assert rows[1].n_types > 0
    for r in rows.values():
        assert r.r_star_e6 == (r.r + 1) * r.n_types_next * 1_000_000 // r.n_types


def test_funnel_timeout_laws(spark):
    rows = {
        r.step: r
        for r in growth_r16.q_events_funnel_timeout(spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2, 3}
    n1, n2, n3 = rows[1].n_users, rows[2].n_users, rows[3].n_users
    assert n1 >= n2 >= n3
    assert n1 > 0 and n2 > 0  # the timeouts bind but do not vacuate
    # and the timeout funnel is no looser than the unbounded one
    from datawarehouse1_spark import registry

    registry.load_all()
    unbounded = {
        r.step: r.n_users
        for r in registry.QUERIES["q_events_funnel_conversion"](
            spark, SF_DIR
        ).collect()
    }
    assert n2 <= unbounded[2] and n3 <= unbounded[3]


def test_bigram_conditional_laws(spark):
    rows = growth_r16.q_text_bigram_conditional(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.predictability_e6 <= 1_000_000
        assert r.n_bigrams >= 1


def test_reservoir_laws(spark):
    rows = growth_r16.q_sample_reservoir_stratified(spark, SF_DIR).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.rnk)
    for lang, rnks in per_lang.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), lang
        assert len(rnks) <= 5


def test_url_decontaminate_laws(spark):
    rows = {
        r.split: r
        for r in growth_r16.q_curation_url_decontaminate(
            spark, SF_DIR
        ).collect()
    }
    assert set(rows) == {"val", "test"}
    for r in rows.values():
        assert 0 <= r.n_contaminated <= r.n_docs
        assert r.contaminated_share_e6 == r.n_contaminated * 1_000_000 // r.n_docs
    # staged URL keys collide across splits by construction (key class
    # = doc_id % 200), so the report is non-vacuous
    assert any(r.n_contaminated > 0 for r in rows.values())


def test_centroid_trajectory_laws(spark):
    rows = growth_r16.q_embedding_centroid_trajectory(spark, SF_DIR).collect()
    assert len(rows) >= 2  # at least two ingest batches
    for r in rows:
        assert -1_000_000 <= r.cos_e6 <= 1_000_000
        assert r.n_vecs > 0
