"""Cross-PROCESS ALTER-vs-append races (round-10 wave 8's conflict
rule promoted to real-OS-process evidence, the r9 pattern).

The hazard the rule closes: an append prepares its schema/mapping
decisions against a base view, and an ALTER landing before its CAS
would be silently ERASED by the loser's re-based retry installing the
stale view in the new top body.  Here N real processes race
spark-free appends (``_commit_prepared`` with ``prepared_against``,
exactly what ``commit()`` runs after writing data) against a real
process flipping a column's name back and forth through
``rename_column``'s own CAS loop.

Invariants: every acknowledged append's fold holds its file; the
mapping NEVER changes across an append-mode body (renames move it,
appends may not — the no-erasure rule); the final mapping equals the
alterer's last acknowledged state; the log is a gap-free chain.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys

import pytest

from integritychecksforvldbs_spark.sources import versioned

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DDL = "struct<k:bigint,c:bigint>"
_DDL_JSON = {
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "c", "type": "long", "nullable": True, "metadata": {}},
    ],
}


def _seed(path: str) -> None:
    v = versioned._commit_prepared(
        path, ["file:/fake/base.parquet"],
        {"file:/fake/base.parquet": {"n_rows": 1, "cols": {}}},
        "append", _DDL, _DDL_JSON,
    )
    assert v == 1


def _appender(path: str, worker: int, n: int, q) -> None:
    sys.path.insert(0, _REPO)
    from integritychecksforvldbs_spark.sources import versioned as V

    acks = []
    for i in range(n):
        fname = f"file:/fake/w{worker}/{i}.parquet"
        for _ in range(60):  # reload-and-retry on every conflict kind
            cur = V._latest_committed(path)
            view = {
                "schema": cur[1].get("schema"),
                "column_mapping": V._mapping(cur[1]),
                "retired_cols": V._retired(cur[1]),
            }
            try:
                v = V._commit_prepared(
                    path, [fname], {fname: {"n_rows": 1, "cols": {}}},
                    "append", view["schema"],
                    cur[1].get("schema_json"),
                    extra={
                        "column_mapping": view["column_mapping"],
                        "retired_cols": view["retired_cols"],
                    },
                    prepared_against=view,
                )
                acks.append((v, fname))
                break
            except V.ConflictError:
                continue  # an ALTER (or a saturated log) — reload
        else:
            q.put(("error", worker, f"commit {i} never landed"))
            return
    q.put(("ok", worker, acks))


def _alterer(path: str, flips: int, q) -> None:
    sys.path.insert(0, _REPO)
    from integritychecksforvldbs_spark.sources import versioned as V

    name = "c"
    done = []
    for i in range(flips):
        new = "c_alt" if name == "c" else "c"
        done.append(V.rename_column(path, name, new))
        name = new
    q.put(("ok", "alterer", (done, name)))


def _run(path: str, n_appenders: int, per: int, flips: int):
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_appender, args=(path, w, per, q))
        for w in range(n_appenders)
    ] + [ctx.Process(target=_alterer, args=(path, flips, q))]
    for p in procs:
        p.start()
    results = [q.get(timeout=180) for _ in procs]
    for p in procs:
        p.join(timeout=180)
        assert p.exitcode == 0
    return results


@pytest.mark.parametrize("round_no", range(5))
def test_alters_racing_appends_never_erased(tmp_path, round_no):
    path = str(tmp_path / "tbl")
    _seed(path)
    results = _run(path, n_appenders=2, per=6, flips=6)
    final_name = None
    acked = []
    for status, who, payload in results:
        assert status == "ok", (who, payload)
        if who == "alterer":
            done, final_name = payload
            assert len(done) == 6
        else:
            acked.extend(payload)
    # every acknowledged append's own fold holds its file
    for v, fname in acked:
        snap = versioned._snapshot(path, v)
        assert fname in snap["files"], f"acked v{v} lost {fname}"
    # the mapping NEVER moves across an append body — only alters
    hist = versioned.history(path)
    nums = [vi.version for vi in hist]
    assert nums == list(range(1, len(nums) + 1))
    prev_map: dict = {}
    n_alters = 0
    for vi in hist:
        man = versioned._read_manifest(path, vi.version)
        cur_map = versioned._mapping(versioned._fold(path, man))
        if vi.mode.startswith("alter("):
            n_alters += 1
        else:
            assert cur_map == prev_map, (
                f"append v{vi.version} moved the mapping "
                f"{prev_map} -> {cur_map}"
            )
        prev_map = cur_map
    assert n_alters == 6
    # the final mapping is exactly the alterer's last state
    tip = versioned._latest_committed(path)[1]
    expect = {} if final_name == "c" else {"c_alt": "c"}
    assert versioned._mapping(tip) == expect
    sch = tip.get("schema")
    assert (final_name in sch) and (
        final_name != "c" or "c_alt" not in sch
    )
