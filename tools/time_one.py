#!/usr/bin/env python
"""Time individual queries with a construct/execute split (guide §1).

Usage:
    python tools/time_one.py q_tpch_q21_waiting_supplier [q_... ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/time_one.py ...

Methodology matches bench.py run_one: untimed warmup, then N timed
end-to-end runs (construct + noop write); additionally splits the best
run into construct (fn call, incl. any eager checkpoints) and execute
(noop write) so optimization work can target the right side.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("TIME_ONE_RUNS", "3"))


def main() -> None:
    from datawarehouse1_spark import get_spark, registry

    registry.load_all()
    spark = get_spark("time-one")
    for name in sys.argv[1:]:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if best is None or t2 - t0 < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
        print(
            f"{name}: total {best[0]:.3f}s construct {best[1]:.3f}s "
            f"execute {best[2]:.3f}s",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
