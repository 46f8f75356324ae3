"""Multi-worker coordination queue — ``dbo.Queue``/``dbo.QueueDatabase``
analogue (SURVEY §2.12 #68; Queue.sql:7-16, QueueDatabase.sql:7-28,
claim protocol DatabaseIntegrityCheck.sql:1095-1228).

The reference coordinates N sessions running the same proc purely
through two tables with optimistic claims: one ``Queue`` row per
(proc, parameters), ``QueueDatabase`` rows for membership/order, and a
claim = stamping (SessionID, RequestID, RequestStartTime) on the TOP-1
unstarted row; stale claims (holder no longer running) are reset
before each pick (DIC:1198-1207).

Plain parquet cannot express an atomic compare-and-swap, so this
implementation uses the filesystem's native CAS — ``os.mkdir`` (atomic
on POSIX and on object stores with directory semantics) — one lock
directory per claim, with the claim metadata inside.  That gives
correct multi-process claims on a single node or a shared POSIX
filesystem (the local[N]/NFS deployment).  For a multi-node cluster
the same class swaps its backend for a Delta table ``MERGE`` with a
conditional update — the protocol (claim → heartbeat → complete,
stale recovery by heartbeat age) is identical.

Semantics preserved:

- queue identity = hash of the parameter string, as the reference
  keys on @Parameters (DIC:215-233, 1108-1125)
- claim order follows DatabaseOrder (DIC:1216-1227)
- a database is claimable once per round; re-queued only when the
  round restarts (QueueStartTime, DIC:1127-1152)
- stale-claim recovery: claims whose heartbeat is older than
  ``stale_after_s`` are released (DIC:1198-1207 — "session/request no
  longer running" becomes "heartbeat stopped")
- completion stamps DatabaseEndTime (DIC:1710-1714)
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass


@dataclass
class QueueItem:
    database_name: str
    database_order: int
    claimed_by: str | None = None
    claim_time: float | None = None
    end_time: float | None = None


class WorkQueue:
    def __init__(
        self,
        root: str,
        parameters: str,
        databases: list[str],
        session_id: str | None = None,
        stale_after_s: float = 300.0,
    ):
        """``root``: shared directory; ``parameters``: the run's
        parameter string (queue identity); ``databases``: ordered
        membership for this round."""
        self.session_id = session_id or f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self.stale_after_s = stale_after_s
        qid = hashlib.sha256(parameters.encode()).hexdigest()[:16]
        self.base = os.path.join(root, f"queue_{qid}")
        os.makedirs(self.base, exist_ok=True)
        # Round restart (DIC:1127-1152): a run that finds the latest
        # round fully completed stamps a new QueueStartTime and
        # re-queues every member — day 2 of a daily cron re-checks the
        # fleet instead of finding every done.json present and idling.
        # Concurrent workers arriving mid-round still join that round.
        cur = self._latest_round()
        if cur == 0 or self._round_complete(cur):
            try:
                os.mkdir(os.path.join(self.base, f"r{cur + 1}"))
            except FileExistsError:
                pass  # a racing worker opened the round — adopt it
            cur = self._latest_round()
        self.round = cur
        self.dir = os.path.join(self.base, f"r{cur}")
        # QueueStartTime stamp (informational; membership mkdir below
        # is the actual arbiter)
        start_marker = os.path.join(self.dir, "round.json")
        if not os.path.exists(start_marker):
            tmp = os.path.join(self.dir, f".round.{uuid.uuid4().hex[:8]}.tmp")
            with open(tmp, "w") as f:
                json.dump(
                    {"round": cur, "queue_start_time": time.time(),
                     "started_by": self.session_id}, f,
                )
            os.replace(tmp, start_marker)
        # first worker materializes membership/order (DIC:1127-1167);
        # mkdir is the arbiter — losers adopt the winner's round
        for order, db in enumerate(databases, start=1):
            item_dir = os.path.join(self.dir, f"db_{db}")
            try:
                os.mkdir(item_dir)
                tmp = os.path.join(item_dir, ".meta.tmp")
                with open(tmp, "w") as f:
                    json.dump({"database_name": db, "database_order": order}, f)
                os.replace(tmp, os.path.join(item_dir, "meta.json"))
            except FileExistsError:
                pass

    # -- rounds ----------------------------------------------------------
    def _latest_round(self) -> int:
        rounds = [
            int(n[1:])
            for n in os.listdir(self.base)
            if n.startswith("r") and n[1:].isdigit()
        ]
        return max(rounds, default=0)

    def _round_complete(self, rnum: int) -> bool:
        """A round with materialized membership where every member has
        a completion stamp.  An empty round dir (racing worker created
        it but hasn't populated members yet) is NOT complete — joiners
        adopt it and materialize membership themselves."""
        rdir = os.path.join(self.base, f"r{rnum}")
        try:
            members = [n for n in os.listdir(rdir) if n.startswith("db_")]
        except FileNotFoundError:
            return False
        if not members:
            return False
        return all(
            os.path.exists(os.path.join(rdir, m, "done.json")) for m in members
        )

    # -- introspection ---------------------------------------------------
    def items(self) -> list[QueueItem]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if not name.startswith("db_"):
                continue
            item_dir = os.path.join(self.dir, name)
            try:
                with open(os.path.join(item_dir, "meta.json")) as f:
                    meta = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue  # membership row mid-write — next pass sees it
            item = QueueItem(meta["database_name"], meta["database_order"])
            claim = self._read_claim(item_dir)
            if claim:
                item.claimed_by = claim.get("session_id")
                item.claim_time = claim.get("heartbeat")
            elif os.path.isdir(os.path.join(item_dir, "claim")):
                item.claimed_by = "?"  # claim dir exists, json in flight
            done = os.path.join(item_dir, "done.json")
            if os.path.exists(done):
                try:
                    with open(done) as f:
                        item.end_time = json.load(f).get("end_time")
                except json.JSONDecodeError:
                    item.end_time = time.time()  # completion mid-write
            out.append(item)
        out.sort(key=lambda i: i.database_order)
        return out

    def _read_claim(self, item_dir: str) -> dict | None:
        p = os.path.join(item_dir, "claim", "claim.json")
        try:
            with open(p) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    # -- the claim protocol ---------------------------------------------
    def _claim_heartbeat(self, item_dir: str) -> float:
        """Freshest evidence of a live claim.  The claim dir's mtime
        covers the instant between the mkdir CAS and the first
        claim.json write — without it, a concurrent stale-sweep reads
        'no json → heartbeat 0 → stale' and releases an in-flight
        claim (double-claim race, caught by the two-worker test)."""
        claim = self._read_claim(item_dir)
        hb = (claim or {}).get("heartbeat", 0.0)
        try:
            hb = max(hb, os.path.getmtime(os.path.join(item_dir, "claim")))
        except OSError:
            pass
        return hb

    def _release_stale(self) -> int:
        """DIC:1198-1207 — reset claims whose holder stopped
        heartbeating and that never completed."""
        released = 0
        now = time.time()
        for name in os.listdir(self.dir):
            item_dir = os.path.join(self.dir, name)
            claim_dir = os.path.join(item_dir, "claim")
            if not os.path.isdir(claim_dir):
                continue
            if os.path.exists(os.path.join(item_dir, "done.json")):
                continue
            hb = self._claim_heartbeat(item_dir)
            if now - hb > self.stale_after_s:
                try:
                    os.remove(os.path.join(claim_dir, "claim.json"))
                except FileNotFoundError:
                    pass
                try:
                    os.rmdir(claim_dir)
                    released += 1
                except OSError:
                    pass
        return released

    def claim_next(self) -> str | None:
        """Atomically claim the first unclaimed, uncompleted database
        in order (DIC:1209-1227).  Returns its name, or None when the
        round is drained."""
        self._release_stale()
        for item in self.items():
            if item.end_time is not None or item.claimed_by is not None:
                continue
            item_dir = os.path.join(self.dir, f"db_{item.database_name}")
            claim_dir = os.path.join(item_dir, "claim")
            try:
                os.mkdir(claim_dir)  # the CAS: exactly one winner
            except FileExistsError:
                continue  # lost the race — try the next row
            self._write_claim(claim_dir)
            return item.database_name
        return None

    def _write_claim(self, claim_dir: str) -> None:
        """Atomic replace — a plain truncating write lets a concurrent
        reader observe an empty file and mistake the claim for stale."""
        tmp = os.path.join(claim_dir, f".claim.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump({"session_id": self.session_id, "heartbeat": time.time()}, f)
        os.replace(tmp, os.path.join(claim_dir, "claim.json"))

    def heartbeat(self, database_name: str) -> None:
        self._write_claim(os.path.join(self.dir, f"db_{database_name}", "claim"))

    def complete(self, database_name: str) -> None:
        """DatabaseEndTime stamp (DIC:1710-1714) — atomic replace so a
        concurrent reader never sees a torn file."""
        item_dir = os.path.join(self.dir, f"db_{database_name}")
        tmp = os.path.join(item_dir, f".done.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump({"session_id": self.session_id, "end_time": time.time()}, f)
        os.replace(tmp, os.path.join(item_dir, "done.json"))

    def all_done(self) -> bool:
        return all(i.end_time is not None for i in self.items())
