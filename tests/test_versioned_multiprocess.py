"""Cross-PROCESS commit races on the versioned log (r9).

All prior concurrency evidence (tests/test_versioned_concurrency.py)
runs racing writers as in-process THREADS; the reference's queue
serves genuinely separate sessions (DatabaseIntegrityCheck.sql's
multi-server claim loop, DIC:1095-1228), and the ``os.link`` CAS is
cross-process-correct BY DESIGN — these tests promote that claim to
evidence: N real OS processes race appends (and rollbacks) through
the DirCas filesystem path via :func:`versioned._commit_prepared`,
the exact protocol loop ``commit()`` runs after writing data files
(factored spark-free precisely so a subprocess doesn't need a JVM).

The invariant, same as the r7 lost-update fix: EVERY acknowledged
commit's own manifest fold contains the files it appended — a racer
can delay you, never silently drop you.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys

import pytest

from integritychecksforvldbs_spark.sources import versioned

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DDL = "struct<k:bigint>"


def _seed(path: str) -> None:
    v = versioned._commit_prepared(
        path, ["file:/fake/base.parquet"],
        {"file:/fake/base.parquet": {"n_rows": 1, "cols": {}}},
        "append", _DDL, None,
    )
    assert v == 1


def _appender(path: str, worker: int, n: int, q) -> None:
    sys.path.insert(0, _REPO)
    from integritychecksforvldbs_spark.sources import versioned as V

    acks = []
    for i in range(n):
        fname = f"file:/fake/w{worker}/{i}.parquet"
        for _ in range(10):  # a real client retries a saturated log
            try:
                v = V._commit_prepared(
                    path, [fname], {fname: {"n_rows": 1, "cols": {}}},
                    "append", _DDL, None,
                )
                acks.append((v, fname))
                break
            except V.ConflictError:
                continue
        else:
            q.put(("error", worker, f"commit {i} never landed"))
            return
    q.put(("ok", worker, acks))


def _rollbacker(path: str, n: int, q) -> None:
    sys.path.insert(0, _REPO)
    from integritychecksforvldbs_spark.sources import versioned as V

    done = []
    for _ in range(n):
        try:
            done.append(V.rollback(None, path, version=1))
        except V.ConflictError:
            pass
    q.put(("ok", "rollbacker", done))


def _run_procs(targets: list[tuple]) -> list:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=t[0], args=t[1] + (q,)) for t in targets]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    return results


def _assert_no_lost_updates(path: str, results: list) -> None:
    acked: list[tuple[int, str]] = []
    for status, who, payload in results:
        assert status == "ok", (who, payload)
        if who != "rollbacker":
            acked.extend(payload)
    versions = [v for v, _ in acked]
    assert len(versions) == len(set(versions)), "two acks shared a slot"
    # THE invariant: each acknowledged commit's own fold holds its file
    for v, fname in acked:
        snap = versioned._snapshot(path, v)
        assert snap is not None, f"acked v{v} has no manifest"
        assert fname in snap["files"], f"acked v{v} lost {fname}"
    # and the log is a contiguous parent chain (no silent skips)
    hist = versioned.history(path)
    nums = [vi.version for vi in hist]
    assert nums == list(range(1, len(nums) + 1))
    for vi in hist[1:]:
        assert vi.parent == vi.version - 1


@pytest.mark.parametrize("round_no", range(20))
def test_four_processes_racing_appends_lose_nothing(tmp_path, round_no):
    """20 independent rounds (the r8 verdict's done-bar), 4 real
    processes x 5 appends each — every acknowledged commit's files
    are in its own snapshot, the log is gap-free."""
    path = str(tmp_path / f"tbl{round_no}")
    _seed(path)
    results = _run_procs(
        [(_appender, (path, w, 5)) for w in range(4)]
    )
    _assert_no_lost_updates(path, results)
    # the final snapshot holds ALL 20 appended files + the seed
    tip = versioned._latest_committed(path)[1]
    assert len(tip["files"]) == 21


def test_appends_racing_rollbacks_across_processes(tmp_path):
    """3 appender processes race a process issuing rollback(v1).
    Last-write-wins semantics: an append acked BEFORE a later rollback
    is legitimately absent from the tip, but its own manifest still
    holds its file, and the chain stays contiguous — nothing is ever
    silently dropped from history."""
    path = str(tmp_path / "tbl")
    _seed(path)
    results = _run_procs(
        [(_appender, (path, w, 6)) for w in range(3)]
        + [(_rollbacker, (path, 4))]
    )
    _assert_no_lost_updates(path, results)
    # every version in the chain (appends and rollbacks alike) reads
    for vi in versioned.history(path):
        snap = versioned._snapshot(path, vi.version)
        assert snap is not None and "files" in snap


def test_cli_processes_racing_appends_full_stack(spark, tmp_path):
    """The CLI-level variant: four REAL `table_cli versioned-commit`
    invocations — separate Python processes, separate JVMs, real data
    writes — race appends into one table.  Full-stack promotion of the
    protocol stress above: every acknowledged commit's rows are in the
    final snapshot and the chain is gap-free."""
    import json
    import subprocess

    srcs = []
    for w in range(4):
        src = str(tmp_path / f"src{w}")
        spark.range(w * 100, w * 100 + 10).selectExpr(
            "id as k"
        ).coalesce(1).write.parquet(src)
        srcs.append(src)
    tbl = str(tmp_path / "tbl")
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="4",  # 4 concurrent JVMs share the box
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "integritychecksforvldbs_spark.table_cli",
                "versioned-commit", "--src", src, "--table", tbl,
            ],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=_REPO, env=env, text=True,
        )
        for src in srcs
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["version"] >= 1
    hist = versioned.history(tbl)
    assert [vi.version for vi in hist] == [1, 2, 3, 4]
    got = sorted(r["k"] for r in versioned.read(spark, tbl).collect())
    assert got == sorted(
        k for w in range(4) for k in range(w * 100, w * 100 + 10)
    )
