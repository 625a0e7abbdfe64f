"""Round-9 hardening: documentation-drift gates (VERDICT r8 #8) and
regression pins for this round's fixes."""

from __future__ import annotations

import re
from pathlib import Path

from datawarehouse1_spark import registry

REPO = Path(__file__).resolve().parent.parent


def test_coverage_md_lists_every_declared_query():
    """VERDICT r8 #8: COVERAGE.md drifted twice (190 vs 191, two
    missing rows) because doc updates trail late-round commits. Gate:
    every registry name must appear in COVERAGE.md as a whole token
    (regex-extracted, so q_dedup_simhash can't hide inside
    q_dedup_simhash_neardup), and the declared-count headline must
    match the registry size."""
    text = (REPO / "COVERAGE.md").read_text()
    documented = set(re.findall(r"q_[a-z0-9_]+", text))
    declared = set(registry.DRIVER_CHECK_ORDER)
    missing = sorted(declared - documented)
    assert not missing, f"COVERAGE.md missing rows for: {missing}"

    m = re.search(r"(\d+) declared queries \((\d+) with DuckDB-oracle", text)
    assert m, "COVERAGE.md headline count line not found"
    registry.load_all()
    n_oracle = len(registry.ORACLES)
    assert int(m.group(1)) == len(declared), (
        f"COVERAGE.md says {m.group(1)} declared, registry has {len(declared)}"
    )
    assert int(m.group(2)) == n_oracle, (
        f"COVERAGE.md says {m.group(2)} oracle-checked, registry has {n_oracle}"
    )


def test_bench_final_line_is_compact_and_parseable():
    """VERDICT r8 #2/#3: the driver captures only a ~2 KB stdout tail,
    so bench.py must end with a COMPACT totals-only JSON line. Pin the
    contract statically: the last print in bench.py emits the compact
    summary (value/tpch_total/llm_total/sf), and the line stays well
    under the tail window even with generous float reprs."""
    src = (REPO / "bench.py").read_text()
    assert "compact" in src and '"tpch_total"' in src
    # the compact record must be the FINAL stdout write
    last_print = src.rstrip().rsplit("print(", 1)[1]
    assert "compact" in last_print, (
        "bench.py's final print must be the compact summary line"
    )
