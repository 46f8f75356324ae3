import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# full-suite sharding (VERDICT r13 #2: the driver's single-process
# `pytest tests/ -x -q` run takes ~65 min — past its verify window —
# and pytest-xdist is not installable in this offline sandbox).  When
# the invocation targets the WHOLE tests directory, this hook fans the
# test files out over N subprocess shards (each a plain pytest run over
# a file subset on local[cpus/N]) and aggregates their exit codes —
# every test still runs, nothing is deselected.  Measured: 65 min →
# ~10 min wall on 32 cores.  Opt out with SPARK_GRAFT_TEST_NO_SHARD=1
# (or by naming specific files/tests, which bypasses it naturally).
# Any error in the wrapper falls back to the normal in-process run.
# ---------------------------------------------------------------------------


def _shard_files(tests_dir: str, n: int) -> list[list[str]]:
    import glob

    files = sorted(glob.glob(os.path.join(tests_dir, "test_*.py")))
    shards: list[list[str]] = [[] for _ in range(n)]
    # round-robin over the sorted list spreads the heavy families
    # (versioned_*, curation*) across shards
    for i, f in enumerate(files):
        shards[i % n].append(f)
    return [s for s in shards if s]


_WATCHDOG_LAUNCHER = """
import os, sys, threading, time
import pytest

def _watch(parent):
    while True:
        time.sleep(5)
        if os.getppid() != parent:
            os._exit(124)  # parent died (driver timeout): don't leak

threading.Thread(target=_watch, args=(os.getppid(),), daemon=True).start()
sys.exit(pytest.main(sys.argv[1:]))
"""


def pytest_cmdline_main(config):
    try:
        if os.environ.get("SPARK_GRAFT_TEST_SHARD") is not None:
            return None  # already inside a shard
        if os.environ.get("SPARK_GRAFT_TEST_NO_SHARD"):
            return None
        tests_dir = os.path.dirname(os.path.abspath(__file__))
        raw_args = [a for a in config.args if not a.startswith("-")]
        paths = [os.path.normpath(os.path.abspath(a)) for a in raw_args]
        # shard ONLY a full-suite run (the bare tests/ directory);
        # file- or test-scoped invocations run normally
        if not paths or any(p != tests_dir for p in paths):
            return None
        import re
        import subprocess
        import tempfile
        import time

        cpus = os.cpu_count() or 8
        n = max(2, min(4, cpus // 8)) if cpus >= 16 else 2
        shards = _shard_files(tests_dir, n)
        per_shard_cpus = str(max(2, cpus // len(shards)))
        procs = []
        t0 = time.time()
        for i, files in enumerate(shards):
            env = dict(os.environ)
            env["SPARK_GRAFT_TEST_SHARD"] = str(i)
            env["SPARK_GRAFT_CPUS"] = per_shard_cpus
            out = tempfile.NamedTemporaryFile(
                mode="w+", prefix=f"pytest_shard{i}_", suffix=".log",
                delete=False,
            )
            cmd = [sys.executable, "-c", _WATCHDOG_LAUNCHER] + files + [
                "-q", "-p", "no:cacheprovider",
            ]
            if getattr(config.option, "exitfirst", False) or getattr(
                config.option, "maxfail", 0
            ) == 1:
                cmd.append("-x")
            procs.append(
                (i, subprocess.Popen(cmd, stdout=out, stderr=subprocess.STDOUT, env=env), out)
            )
        print(
            f"[shard-runner] {len(shards)} shards x local[{per_shard_cpus}] "
            f"over {sum(len(s) for s in shards)} test files",
            flush=True,
        )
        rcs = {}
        pending = dict((i, p) for i, p, _ in procs)
        while pending:
            time.sleep(10)
            for i in list(pending):
                rc = pending[i].poll()
                if rc is not None:
                    rcs[i] = rc
                    del pending[i]
                    print(
                        f"[shard-runner] shard {i} finished rc={rc} "
                        f"({time.time() - t0:.0f}s elapsed)",
                        flush=True,
                    )
        passed = failed = skipped = errors = 0
        for i, _, out in procs:
            out.seek(0)
            text = out.read()
            out.close()
            tail = text[-2000:]
            print(f"----- shard {i} tail -----\n{tail}", flush=True)
            for pat, bump in (
                (r"(\d+) passed", "passed"),
                (r"(\d+) failed", "failed"),
                (r"(\d+) skipped", "skipped"),
                (r"(\d+) error", "errors"),
            ):
                m = re.search(pat, text)
                if m:
                    if bump == "passed":
                        passed += int(m.group(1))
                    elif bump == "failed":
                        failed += int(m.group(1))
                    elif bump == "skipped":
                        skipped += int(m.group(1))
                    else:
                        errors += int(m.group(1))
        dt = time.time() - t0
        bits = [f"{passed} passed"]
        if failed:
            bits.append(f"{failed} failed")
        if errors:
            bits.append(f"{errors} errors")
        if skipped:
            bits.append(f"{skipped} skipped")
        print(f"{', '.join(bits)} in {dt:.2f}s", flush=True)
        return 0 if all(rc == 0 for rc in rcs.values()) else 1
    except Exception as e:  # any wrapper problem: run normally
        print(f"[shard-runner] disabled ({e}); running in-process", flush=True)
        return None

from integritychecksforvldbs_spark.session import get_spark  # noqa: E402
from integritychecksforvldbs_spark.sources.loader import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TESTDATA_ROOT = "/root/testdata"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    return {t: load_table(spark, f"{SF_DIR}/{t}.parquet") for t in TABLES}


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
