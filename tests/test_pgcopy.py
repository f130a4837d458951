"""Live PostgreSQL round-trip over the COPY channel (sources/pgcopy.py).

Round 12 left "live Postgres" as an environmental SKIP because the
Spark classpath has no postgresql JDBC jar. The server binaries ARE
present (initdb/pg_ctl/psql), so round 13 closes the live-server half
of the gate through the jar-free COPY sink/source: this module boots a
scratch single-user Postgres on a private unix socket, loads Spark
partitions through parallel ``\\copy FROM STDIN`` pipes, and reads the
table back through ``COPY TO`` staging. Everything skips (never fails)
when the binaries are absent or the server cannot run in this
environment — the same visible-SKIP policy as the JDBC-jar gates in
test_jdbc.py. The MySQL half of the gate stays environmental (no
mysqld in the container).
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
import tempfile
import time

import pytest

from sales_etl_pipeline_spark.sources import pgcopy

pytestmark = pytest.mark.skipif(
    not all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql")),
    reason="PostgreSQL server binaries not on PATH",
)


def _run_as() -> list[str] | None:
    """Postgres refuses to run as root; when the test runs as root, wrap
    server commands in ``su <unprivileged>``. Returns the argv prefix
    (empty when already unprivileged), or None if no usable account."""
    if os.geteuid() != 0:
        return []
    for name in ("pguser", "nobody", "daemon"):
        try:
            pwd.getpwnam(name)
            return ["su", name, "-s", "/bin/sh", "-c"]
        except KeyError:
            continue
    return None


def _sh(prefix: list[str], cmd: str) -> subprocess.CompletedProcess:
    argv = prefix + [cmd] if prefix else ["/bin/sh", "-c", cmd]
    return subprocess.run(argv, capture_output=True, text=True)


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    prefix = _run_as()
    if prefix is None:
        pytest.skip("running as root and no unprivileged account for postgres")
    # unix sockets cap paths at ~107 chars — stage under /tmp directly
    root = tempfile.mkdtemp(prefix="pgc_")
    data = os.path.join(root, "data")
    os.chmod(root, 0o777)
    init = _sh(prefix, f"initdb -D {data} -U sparkpg -A trust --no-sync")
    if init.returncode != 0:
        shutil.rmtree(root, ignore_errors=True)
        pytest.skip(f"initdb unavailable here: {init.stderr.strip()[:200]}")
    start = _sh(
        prefix,
        f"pg_ctl -D {data} -o \"-p 54329 -k {root} -h ''\" "
        f"-l {root}/log -w start",
    )
    if start.returncode != 0:
        shutil.rmtree(root, ignore_errors=True)
        pytest.skip(f"postgres would not start: {start.stderr.strip()[:200]}")
    conninfo = {"host": root, "port": 54329, "user": "sparkpg",
                "dbname": "postgres"}
    for _ in range(20):  # readiness: -w start usually suffices
        ok = subprocess.run(
            pgcopy._psql_argv(conninfo) + ["-c", "SELECT 1"],
            capture_output=True,
        )
        if ok.returncode == 0:
            break
        time.sleep(0.25)
    else:
        _sh(prefix, f"pg_ctl -D {data} stop")
        shutil.rmtree(root, ignore_errors=True)
        pytest.skip("postgres started but never became ready")
    yield conninfo
    _sh(prefix, f"pg_ctl -D {data} -m fast stop")
    shutil.rmtree(root, ignore_errors=True)


def _summary_df(spark):
    # K4 shape: the country summary the reference loads to Postgres
    # (etl.py:305-332), plus COPY-hostile values: NULLs in both a text
    # and a double column, and a text cell with comma, quote, newline.
    rows = [
        (1, "US", 10, 1234.5, "plain"),
        (2, "DE", 7, None, 'comma, "quote"\nnewline'),
        (3, None, 0, 0.125, None),
    ]
    return spark.createDataFrame(
        rows,
        "ID long, Country string, n_orders int, Revenue double, note string",
    )


def test_copy_roundtrip_exact(spark, pg):
    df = _summary_df(spark).repartition(3)  # one COPY pipe per partition
    n = pgcopy.write_postgres_copy(df, pg, "country_summary")
    assert n == 3
    got = pgcopy.read_postgres_copy(
        spark, pg, "country_summary",
        schema="id long, country string, n_orders int, revenue double, "
               "note string",
    )
    # reference transform P13: SQL sinks lowercase the column names
    assert got.columns == ["id", "country", "n_orders", "revenue", "note"]
    want = {
        (1, "US", 10, 1234.5, "plain"),
        (2, "DE", 7, None, 'comma, "quote"\nnewline'),
        (3, None, 0, 0.125, None),
    }
    assert {tuple(r) for r in got.collect()} == want


def test_copy_round_scale_applies(spark, pg):
    df = _summary_df(spark)
    pgcopy.write_postgres_copy(df, pg, "rounded_summary", round_scale=2)
    out = pgcopy._run_sql(
        pg, "SELECT revenue FROM rounded_summary WHERE id = 3"
    )
    # Spark round() is HALF_UP: 0.125 → 0.13 (same as the JDBC sink)
    assert "0.13" in out and "0.125" not in out


def test_copy_split_predicates_parallel_read(spark, pg):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    pgcopy.write_postgres_copy(df, pg, "split_read")
    got = pgcopy.read_postgres_copy(
        spark, pg, "split_read", schema="id long, v long",
        split_predicates=["id % 2 = 0", "id % 2 = 1"],
    )
    assert got.count() == 100
    assert got.agg({"v": "sum"}).first()[0] == sum(2 * i for i in range(100))


def test_copy_rejects_complex_types(spark, pg):
    df = spark.range(2).selectExpr("id", "array(id) AS a")
    with pytest.raises(ValueError, match="COPY-channel mapping"):
        pgcopy.write_postgres_copy(df, pg, "nope")
