#!/usr/bin/env python
"""Dump .explain('formatted') for the bench-section queries to
plans/r16/<query>_<tag>.txt (guide §1: capture plan shape before/after).

Usage:
    python tools/explain_dump.py before [query ...]   # default: all bench queries
    python tools/explain_dump.py after q_tpch_q21_waiting_supplier ...

Pure driver-side work (analysis + physical planning, no job execution
except construction-time eager checkpoints, which are part of the
query's real construct cost anyway).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r16")


def bench_query_names() -> list[str]:
    """Every query the bench times: HEADLINE + the LLM/ANALYTICS tuples
    (scraped from bench.py source — they are main()-local) + all TPC-H."""
    import re

    from datawarehouse1_spark import registry

    registry.load_all()
    src = open(os.path.join(REPO, "bench.py")).read()
    names = [
        n for n in re.findall(r'"(q_[a-z0-9_]+)"', src) if n in registry.QUERIES
    ]
    names += sorted(n for n in registry.QUERIES if n.startswith("q_tpch_"))
    # de-dup, keep order
    seen: set[str] = set()
    return [n for n in names if not (n in seen or seen.add(n))]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from datawarehouse1_spark import get_spark, registry

    registry.load_all()
    wanted = sys.argv[2:] or bench_query_names()
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("explain-dump")
    for name in wanted:
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001 - record and continue
            plan = f"ERROR: {type(ex).__name__}: {ex}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
