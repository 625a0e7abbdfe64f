"""E3-parity serving face: a real out-of-process SQL client (the
beeline JDBC client shipped with Spark) connects to the in-process
HiveThriftServer2 endpoint and runs a star join against the served
catalog; results must match the DuckDB oracle bit-for-bit.

Runs the server in a SUBPROCESS with its own SparkSession so the shared
test session is not polluted by the server's global state (system
properties, background thrift threads)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAR_SQL = """
SELECT n.n_name AS nation,
       count(*) AS n_lines,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM warehouse.lineitem l
JOIN warehouse.orders o ON l.l_orderkey = o.o_orderkey
JOIN warehouse.customer c ON o.o_custkey = c.c_custkey
JOIN warehouse.nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
LIMIT 5
"""

SERVER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from datawarehouse1_spark import get_spark
from datawarehouse1_spark.serving import (
    register_views,
    register_warehouse,
    start_sql_endpoint,
)
spark = get_spark("sql-endpoint-test")
register_warehouse(spark, {sf_dir!r})
register_views(spark)
start_sql_endpoint(spark, port={port})
print("ENDPOINT_READY", flush=True)
import time
time.sleep(600)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_beeline_star_join_matches_duckdb(tmp_path):
    import pyspark

    beeline = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")
    assert os.path.exists(beeline), "beeline client missing from Spark dist"

    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-c", SERVER_SCRIPT.format(repo=REPO, sf_dir=SF_DIR, port=port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=str(tmp_path),  # derby/metastore scratch lands here, not the repo
    )
    try:
        deadline = time.monotonic() + 180
        for line in proc.stdout:
            if "ENDPOINT_READY" in line:
                break
            if time.monotonic() > deadline or proc.poll() is not None:
                pytest.fail("sql endpoint subprocess did not come up")

        r = subprocess.run(
            [
                beeline,
                "-u",
                f"jdbc:hive2://127.0.0.1:{port}/default",
                "-n",
                "test",
                "--outputformat=csv2",
                "--silent=true",
                "-e",
                STAR_SQL,
            ],
            capture_output=True,
            text=True,
            timeout=180,
        )
        assert r.returncode == 0, f"beeline failed: {r.stderr[-500:]}"

        # csv2: header then data rows; the connect prompt may be glued to
        # the header line, so pick the lines that parse as 3-column csv
        # data (nation,count,revenue)
        rows = []
        for line in r.stdout.splitlines():
            parts = line.strip().split(",")
            if len(parts) == 3 and parts[1].isdigit():
                rows.append((parts[0], int(parts[1]), float(parts[2])))
        assert len(rows) == 5, f"expected 5 result rows, got: {r.stdout[-800:]}"

        duck = duckdb.connect()
        for t in ("lineitem", "orders", "customer", "nation"):
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        want = duck.execute(STAR_SQL.replace("warehouse.", "")).fetchall()
        want = [(n, int(c), float(rev)) for (n, c, rev) in want]
        assert rows == want

        # the semantic layer: a dashboard query against a served VIEW
        # (the Metabase-"question" shape) must also be oracle-exact
        view_q = (
            "SELECT month, n_orders, revenue FROM warehouse.monthly_revenue "
            "ORDER BY revenue DESC, month LIMIT 3"
        )
        r2 = subprocess.run(
            [beeline, "-u", f"jdbc:hive2://127.0.0.1:{port}/default",
             "-n", "test", "--outputformat=csv2", "--silent=true",
             "-e", view_q],
            capture_output=True, text=True, timeout=180,
        )
        assert r2.returncode == 0, f"beeline view query failed: {r2.stderr[-500:]}"
        got = []
        for line in r2.stdout.splitlines():
            parts = line.strip().split(",")
            if len(parts) == 3 and parts[1].isdigit():
                got.append((parts[0], int(parts[1]), float(parts[2])))
        from datawarehouse1_spark.serving import WAREHOUSE_VIEWS

        view_sql = WAREHOUSE_VIEWS["monthly_revenue"].format(db="x").replace("x.", "")
        want2 = duck.execute(
            f"SELECT month, n_orders, revenue FROM ({view_sql}) "
            "ORDER BY revenue DESC, month LIMIT 3"
        ).fetchall()
        want2 = [(str(m), int(n), float(rev)) for (m, n, rev) in want2]
        assert got == want2, f"view mismatch: {got} vs {want2}"
    finally:
        proc.kill()
        proc.wait(timeout=30)


def test_endpoint_survives_bad_sql_and_streams_large_results(tmp_path):
    """Serving hardening (VERDICT r8 #7), one server boot for both laws:
    (a) negative path — malformed SQL and a missing-table query each
    return a client-side ERROR without killing the endpoint (the server
    process stays up and keeps answering); (b) large-result fetch — a
    full unaggregated lineitem SELECT streams through beeline's
    incremental fetch (serving.py's no-driver-materialization claim):
    every row arrives and the row count equals the table count."""
    import pyspark

    beeline = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-c", SERVER_SCRIPT.format(repo=REPO, sf_dir=SF_DIR, port=port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=str(tmp_path),
    )

    def run_sql(sql: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            [beeline, "-u", f"jdbc:hive2://127.0.0.1:{port}/default",
             "-n", "test", "--outputformat=csv2", "--silent=true",
             "--incremental=true", "-e", sql],
            capture_output=True, text=True, timeout=180,
        )

    try:
        deadline = time.monotonic() + 180
        for line in proc.stdout:
            if "ENDPOINT_READY" in line:
                break
            if time.monotonic() > deadline or proc.poll() is not None:
                pytest.fail("sql endpoint subprocess did not come up")

        # (a) parse error and analysis error: beeline exits non-zero,
        # the endpoint process must remain alive
        for bad in (
            "SELEC broken FROM",
            "SELECT * FROM warehouse.no_such_table",
        ):
            r = run_sql(bad)
            assert r.returncode != 0, f"bad SQL unexpectedly succeeded: {bad}"
            assert proc.poll() is None, "endpoint died on a bad query"

        # ... and the endpoint still answers real queries afterwards
        r = run_sql("SELECT count(*) AS n FROM warehouse.lineitem")
        assert r.returncode == 0, f"endpoint broken after bad SQL: {r.stderr[-500:]}"

        duck = duckdb.connect()
        n_lineitem = duck.execute(
            f"SELECT count(*) FROM read_parquet('{SF_DIR}/lineitem.parquet')"
        ).fetchone()[0]
        assert f"{n_lineitem}" in r.stdout

        # (b) full-table fetch: every lineitem row crosses the wire
        r = run_sql(
            "SELECT l_orderkey, l_linenumber FROM warehouse.lineitem"
        )
        assert r.returncode == 0, f"large fetch failed: {r.stderr[-500:]}"
        data_rows = 0
        for line in r.stdout.splitlines():
            parts = line.strip().split(",")
            if len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
                data_rows += 1
        assert data_rows == n_lineitem, (data_rows, n_lineitem)
    finally:
        proc.kill()
        proc.wait(timeout=30)


def test_concurrent_jdbc_sessions_share_catalog(tmp_path):
    """A BI deployment means several dashboards hitting the endpoint at
    once: two beeline clients connect CONCURRENTLY (distinct HiveServer2
    sessions) and each runs a different aggregate; both must see the
    same served catalog and return oracle-exact results."""
    import pyspark

    beeline = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-c", SERVER_SCRIPT.format(repo=REPO, sf_dir=SF_DIR, port=port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=str(tmp_path),
    )
    try:
        deadline = time.monotonic() + 180
        for line in proc.stdout:
            if "ENDPOINT_READY" in line:
                break
            if time.monotonic() > deadline or proc.poll() is not None:
                pytest.fail("sql endpoint subprocess did not come up")

        sqls = {
            "a": "SELECT count(*) AS n, count(DISTINCT o_custkey) AS nc "
                 "FROM warehouse.orders",
            "b": "SELECT r.r_name AS region, count(*) AS n_nations "
                 "FROM warehouse.nation n JOIN warehouse.region r "
                 "ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name",
        }
        procs = {
            k: subprocess.Popen(
                [beeline, "-u", f"jdbc:hive2://127.0.0.1:{port}/default",
                 "-n", f"client_{k}", "--outputformat=csv2", "--silent=true",
                 "-e", sql],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            for k, sql in sqls.items()
        }
        outs = {k: p.communicate(timeout=180)[0] for k, p in procs.items()}
        assert all(p.returncode == 0 for p in procs.values())

        duck = duckdb.connect()
        for t in ("orders", "nation", "region"):
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        n, nc = duck.execute(sqls["a"].replace("warehouse.", "")).fetchone()
        assert f"{n},{nc}" in outs["a"].replace("\r", "")
        want_b = {
            (r, int(c))
            for r, c in duck.execute(
                sqls["b"].replace("warehouse.", "")
            ).fetchall()
        }
        got_b = set()
        for line in outs["b"].splitlines():
            parts = line.strip().split(",")
            if len(parts) == 2 and parts[1].isdigit():
                got_b.add((parts[0], int(parts[1])))
        assert got_b == want_b
    finally:
        proc.kill()
        proc.wait(timeout=30)
