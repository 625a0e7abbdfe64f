#!/usr/bin/env python
"""Driver-contract sweep: run the first N declared queries under a
PLAIN default SparkSession and hash-compare each oracle-bearing one
against DuckDB over the same parquet — the exact comparison the
driver's correctness gate performs (see .claude/skills/verify).

Usage:
    python tools/sweep.py [N] [SF_DIR]      # defaults: 50 /root/testdata/sf0.01
    TZ=America/New_York python tools/sweep.py 304   # the dual-TZ pass
    python tools/sweep.py q_stats_spearman_rho [q_...] [SF_DIR]
        # r17: explicit names instead of a count — the per-change
        # oracle spot-check (full sweeps stay the batch-end gate)

Run it (both TZ modes) after every change batch; ROUND_NOTES records
the discipline. N=50 covers the driver's graded window; N=304 sweeps
the whole registry.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = sys.argv[1:]
    wanted_names = [a for a in args if a.startswith("q_")]
    rest = [a for a in args if not a.startswith("q_")]
    n = int(rest[0]) if rest and rest[0].isdigit() else 50
    sf_args = [a for a in rest if not a.isdigit()]
    sf = sf_args[0] if sf_args else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    import conftest
    from datawarehouse1_spark import registry

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    registry.load_all()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    names = wanted_names or list(registry.QUERIES)[:n]
    fails = []
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            if name in registry.ORACLES:
                conftest.compare_query(
                    spark,
                    con,
                    registry.QUERIES[name],
                    registry.ORACLES[name],
                    sf_dir=sf,
                )
                tag = "ok"
            else:
                tag = f"rows_only({registry.QUERIES[name](spark, sf).count()})"
        except Exception as ex:  # noqa: BLE001 - report and continue
            tag = f"FAIL: {str(ex)[:200]}"
            fails.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {tag}", flush=True)
    print(
        f"DONE {len(names) - len(fails)}/{len(names)} green "
        f"in {time.time() - t0:.0f}s; fails={fails}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
