"""Multi-worker coordination queue — ``dbo.Queue``/``dbo.QueueDatabase``
analogue (SURVEY §2.12 #68; Queue.sql:7-16, QueueDatabase.sql:7-28,
claim protocol DatabaseIntegrityCheck.sql:1095-1228).

The reference coordinates N sessions running the same proc purely
through two tables with optimistic claims: one ``Queue`` row per
(proc, parameters), ``QueueDatabase`` rows for membership/order, and a
claim = stamping (SessionID, RequestID, RequestStartTime) on the TOP-1
unstarted row; stale claims (holder no longer running) are reset
before each pick (DIC:1198-1207).

The reference gets its atomicity from the database (the UPDATE with
``@@ROWCOUNT`` is its compare-and-swap, DIC:1209-1227).  This
implementation separates the PROTOCOL (claim → heartbeat → complete,
stale recovery by heartbeat age, round restart) from the STORAGE
PRIMITIVE behind a :class:`ClaimBackend` seam, because no single
primitive exists on every storage system:

- :class:`DirCasBackend` — ``os.mkdir`` as the create-if-absent CAS
  (atomic on POSIX and NFS).  The local / shared-POSIX-filesystem
  deployment; the default when ``WorkQueue`` is given a root path.
- :class:`ConditionalStoreBackend` — the conditional-write protocol
  object stores expose (S3 ``If-None-Match``/``If-Match``, GCS
  generation preconditions, an ACID table's ``MERGE``): put-if-absent,
  versioned get, delete-if-version-matches.  Shipped as an in-process
  reference implementation whose five methods are exactly the calls a
  real store binding must make conditional; wiring it to S3/GCS/Delta
  replaces the dict operations with the store's conditional requests
  and changes NOTHING in the protocol above the seam.

Semantics preserved:

- queue identity = hash of the parameter string, as the reference
  keys on @Parameters (DIC:215-233, 1108-1125)
- claim order follows DatabaseOrder (DIC:1216-1227)
- a database is claimable once per round; re-queued only when the
  round restarts (QueueStartTime, DIC:1127-1152)
- stale-claim recovery: claims whose heartbeat is older than
  ``stale_after_s`` are released (DIC:1198-1207 — "session/request no
  longer running" becomes "heartbeat stopped").  Release is a
  CONDITIONAL delete keyed on the claim's version token — a holder
  heartbeating between the sweep's read and its delete keeps the
  claim (stronger than the reference's session-id check).
- completion stamps DatabaseEndTime (DIC:1710-1714)
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import threading
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


@dataclass
class Record:
    """One stored claim-queue record.

    ``payload`` is None when the record exists but its body is not yet
    readable (the mkdir-CAS backend has an instant between the mkdir
    and the body write; conditional stores never do).  ``modified`` is
    freshness evidence covering that window; ``version`` is the opaque
    token :meth:`ClaimBackend.delete_if` compares against.
    """

    payload: dict | None
    modified: float
    version: object


class ClaimBackend:
    """Storage seam for :class:`WorkQueue` — five primitives.

    Implementations must make :meth:`put_if_absent` atomic (exactly
    one concurrent caller wins) and :meth:`delete_if` conditional on
    the version token from :meth:`get`.  Everything else about the
    claim protocol lives above this seam.
    """

    def put_if_absent(self, key: str, payload: dict) -> bool:
        """Atomically create ``key`` with ``payload``; False if it
        already exists (the CAS — claims, round opens, membership)."""
        raise NotImplementedError

    def get(self, key: str) -> Record | None:
        raise NotImplementedError

    def put(self, key: str, payload: dict) -> None:
        """Unconditional atomic replace (heartbeats, completion)."""
        raise NotImplementedError

    def delete_if(self, key: str, version: object) -> bool:
        """Delete ``key`` only if its version still matches (stale
        release; a concurrent heartbeat must win)."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """All keys starting with ``prefix``, sorted."""
        raise NotImplementedError


class DirCasBackend(ClaimBackend):
    """mkdir-CAS record store for POSIX/NFS shared filesystems.

    A key ``a/b/c`` is the directory ``{root}/a/b/c`` (the terminal
    ``os.mkdir`` is the atomic create-if-absent) holding the payload
    in ``record.json`` (written via ``os.replace`` so readers never
    see a torn body).  The instant between the mkdir and the body
    write is covered by the directory's mtime (surfaced through
    :class:`Record.modified`) — without it a concurrent stale-sweep
    would read "no body → heartbeat 0 → stale" and release an
    in-flight claim (double-claim race, caught by the two-worker
    test).  ``delete_if`` compares the body file's (inode, mtime_ns)
    token; a heartbeat's ``os.replace`` changes the inode, so a claim
    refreshed between read and delete survives the sweep (narrow
    residual TOCTOU window documented at :meth:`delete_if`).
    """

    BODY = "record.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/"))

    def _version(self, body: str) -> object:
        try:
            st = os.stat(body)
            return (st.st_ino, st.st_mtime_ns)
        except OSError:
            return None

    def put_if_absent(self, key: str, payload: dict) -> bool:
        d = self._dir(key)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        try:
            os.mkdir(d)  # the CAS: exactly one winner
        except FileExistsError:
            return False
        self._write_body(d, payload)
        return True

    def _write_body(self, d: str, payload: dict) -> None:
        tmp = os.path.join(d, f".body.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, os.path.join(d, self.BODY))

    def get(self, key: str) -> Record | None:
        d = self._dir(key)
        body = os.path.join(d, self.BODY)
        try:
            dir_mtime = os.path.getmtime(d)
        except OSError:
            return None
        try:
            with open(body) as f:
                payload = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            # record exists, body in flight (or torn mid-replace on a
            # non-atomic FS) — freshness falls back to the dir mtime
            return Record(None, dir_mtime, self._version(body))
        try:
            m = max(dir_mtime, os.path.getmtime(body))
        except OSError:
            m = dir_mtime
        return Record(payload, m, self._version(body))

    def put(self, key: str, payload: dict) -> None:
        d = self._dir(key)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        try:
            os.mkdir(d)
        except FileExistsError:
            pass
        self._write_body(d, payload)

    def delete_if(self, key: str, version: object) -> bool:
        # POSIX offers no compare-and-delete; re-checking the token
        # immediately before the unlink narrows (not closes) the
        # window — matching the reference's own sweep, which re-reads
        # sys.dm_exec_requests just before its UPDATE (DIC:1198-1207)
        d = self._dir(key)
        body = os.path.join(d, self.BODY)
        if self._version(body) != version:
            return False
        try:
            os.remove(body)
        except FileNotFoundError:
            pass
        # a writer that died between open(tmp) and os.replace leaves
        # .body.*.tmp litter; without sweeping it the rmdir below
        # fails forever and the record can never be released
        try:
            for name in os.listdir(d):
                if name.startswith(".body.") and name.endswith(".tmp"):
                    try:
                        os.remove(os.path.join(d, name))
                    except FileNotFoundError:
                        pass
        except FileNotFoundError:
            return True  # a racing sweeper finished the delete
        try:
            os.rmdir(d)
            return True
        except OSError:
            return False  # a racing writer re-populated the dir

    def list(self, prefix: str) -> list[str]:
        # walk only the prefix's parent directory (the last prefix
        # segment may be a partial name like "db_"), not the whole
        # root — a daily round-restart cron accumulates rounds, and a
        # root-wide walk makes every claim O(all rounds × members)
        parts = [p for p in prefix.split("/") if p]
        if prefix.endswith("/"):
            start = os.path.join(self.root, *parts)
        else:
            start = os.path.join(self.root, *parts[:-1])
        if not os.path.isdir(start):
            return []
        out = []
        for dirpath, _dirnames, filenames in os.walk(start, onerror=None):
            try:
                empty = self.BODY not in filenames and not os.listdir(dirpath)
            except FileNotFoundError:
                continue  # a concurrent stale-release removed the dir
            if self.BODY in filenames or empty:
                key = os.path.relpath(dirpath, self.root).replace(os.sep, "/")
                if key != "." and key.startswith(prefix):
                    out.append(key)
        return sorted(out)


class ConditionalStoreBackend(ClaimBackend):
    """Reference implementation of the conditional-write claim store.

    Models exactly the primitive set an object store or ACID table
    exposes — atomic put-if-absent, versioned read, conditional
    delete — with a monotonically increasing integer standing in for
    the ETag/generation.  A production binding keeps this class's
    method contracts and replaces the guarded dict ops with:

    - S3: ``PutObject`` + ``If-None-Match: *`` / ``If-Match: <etag>``
    - GCS: ``ifGenerationMatch=0`` / ``ifGenerationMatch=<gen>``
    - Delta/Iceberg: ``MERGE WHEN NOT MATCHED INSERT`` / a versioned
      ``DELETE WHERE version = <token>`` (SURVEY §7.4)

    The in-process lock plays the store's internal serialization; the
    protocol above the seam is identical either way, which is what the
    backend-parametrized queue tests pin.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._data: dict[str, tuple[dict, int, float]] = {}
        self._gen = 0

    def put_if_absent(self, key: str, payload: dict) -> bool:
        with self._lock:
            if key in self._data:
                return False
            self._gen += 1
            self._data[key] = (dict(payload), self._gen, time.time())
            return True

    def get(self, key: str) -> Record | None:
        with self._lock:
            hit = self._data.get(key)
        if hit is None:
            return None
        payload, gen, modified = hit
        return Record(dict(payload), modified, gen)

    def put(self, key: str, payload: dict) -> None:
        with self._lock:
            self._gen += 1
            self._data[key] = (dict(payload), self._gen, time.time())

    def delete_if(self, key: str, version: object) -> bool:
        with self._lock:
            hit = self._data.get(key)
            if hit is None or hit[1] != version:
                return False
            del self._data[key]
            return True

    def list(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._data if k.startswith(prefix))


_ROUND_KEY = re.compile(r"r(\d+)/round$")


class WorkQueue:
    def __init__(
        self,
        root: str,
        parameters: str,
        databases: list[str],
        session_id: str | None = None,
        stale_after_s: float = 300.0,
        backend: ClaimBackend | None = None,
    ):
        """``root``: shared directory (ignored when an explicit
        ``backend`` is supplied); ``parameters``: the run's parameter
        string (queue identity); ``databases``: ordered membership for
        this round."""
        self.session_id = session_id or f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self.stale_after_s = stale_after_s
        self.backend = backend if backend is not None else DirCasBackend(root)
        qid = hashlib.sha256(parameters.encode()).hexdigest()[:16]
        self.base = f"queue_{qid}"
        # Round restart (DIC:1127-1152): a run that finds the latest
        # round fully completed opens round N+1 and re-queues every
        # member — day 2 of a daily cron re-checks the fleet instead
        # of finding every completion stamp present and idling.  The
        # round record's put_if_absent is the arbiter; concurrent
        # workers (and workers acting on a stale latest-round read —
        # the slow-shared-FS race pinned by the injected-latency test)
        # lose the CAS and adopt whatever round the re-read shows.
        cur = self._latest_round()
        if cur == 0 or self._round_complete(cur):
            self.backend.put_if_absent(
                f"{self.base}/r{cur + 1}/round",
                {"round": cur + 1, "queue_start_time": time.time(),
                 "started_by": self.session_id},
            )
            cur = self._latest_round()
        self.round = cur
        self.dir = f"{self.base}/r{cur}"
        # first worker materializes membership/order (DIC:1127-1167);
        # put_if_absent is the arbiter — losers adopt the winner's rows
        for order, db in enumerate(databases, start=1):
            self.backend.put_if_absent(
                f"{self.dir}/db_{db}/meta",
                {"database_name": db, "database_order": order},
            )

    # -- rounds ----------------------------------------------------------
    def _latest_round(self) -> int:
        rounds = [
            int(m.group(1))
            for k in self.backend.list(f"{self.base}/")
            if (m := _ROUND_KEY.search(k))
        ]
        return max(rounds, default=0)

    def _member_names(self, rdir: str) -> list[str]:
        return sorted(
            {
                part[3:]
                for k in self.backend.list(f"{rdir}/db_")
                for part in [k[len(rdir) + 1:].split("/")[0]]
                if part.startswith("db_")
            }
        )

    def _round_complete(self, rnum: int) -> bool:
        """A round with materialized membership where every member has
        a completion stamp.  A round record without members yet (a
        racing worker opened it but hasn't populated membership) is
        NOT complete — joiners adopt it and materialize membership
        themselves."""
        rdir = f"{self.base}/r{rnum}"
        members = self._member_names(rdir)
        if not members:
            return False
        return all(
            self.backend.get(f"{rdir}/db_{m}/done") is not None
            for m in members
        )

    # -- introspection ---------------------------------------------------
    def items(self) -> list[QueueItem]:
        out = []
        for name in self._member_names(self.dir):
            meta = self.backend.get(f"{self.dir}/db_{name}/meta")
            if meta is None or meta.payload is None:
                continue  # membership row mid-write — next pass sees it
            item = QueueItem(
                meta.payload["database_name"], meta.payload["database_order"]
            )
            claim = self.backend.get(f"{self.dir}/db_{name}/claim")
            if claim is not None:
                if claim.payload:
                    item.claimed_by = claim.payload.get("session_id")
                    item.claim_time = claim.payload.get("heartbeat")
                else:
                    item.claimed_by = "?"  # claim record, body in flight
            done = self.backend.get(f"{self.dir}/db_{name}/done")
            if done is not None:
                item.end_time = (
                    (done.payload or {}).get("end_time") or done.modified
                )
            out.append(item)
        out.sort(key=lambda i: i.database_order)
        return out

    # -- the claim protocol ---------------------------------------------
    def _release_stale(self) -> int:
        """DIC:1198-1207 — reset claims whose holder stopped
        heartbeating and that never completed.  The delete is
        conditional on the claim's version token, so a holder
        heartbeating mid-sweep keeps its claim."""
        released = 0
        now = time.time()
        for name in self._member_names(self.dir):
            ckey = f"{self.dir}/db_{name}/claim"
            claim = self.backend.get(ckey)
            if claim is None:
                continue
            if self.backend.get(f"{self.dir}/db_{name}/done") is not None:
                continue
            hb = max((claim.payload or {}).get("heartbeat", 0.0), claim.modified)
            if now - hb > self.stale_after_s:
                if self.backend.delete_if(ckey, claim.version):
                    released += 1
        return released

    def claim_next(self) -> str | None:
        """Atomically claim the first unclaimed, uncompleted database
        in order (DIC:1209-1227).  Returns its name, or None when the
        round is drained."""
        self._release_stale()
        for item in self.items():
            if item.end_time is not None or item.claimed_by is not None:
                continue
            won = self.backend.put_if_absent(
                f"{self.dir}/db_{item.database_name}/claim",
                {"session_id": self.session_id, "heartbeat": time.time()},
            )
            if not won:
                continue  # lost the race — try the next row
            return item.database_name
        return None

    def heartbeat(self, database_name: str) -> None:
        self.backend.put(
            f"{self.dir}/db_{database_name}/claim",
            {"session_id": self.session_id, "heartbeat": time.time()},
        )

    def complete(self, database_name: str) -> None:
        """DatabaseEndTime stamp (DIC:1710-1714) — atomic replace so a
        concurrent reader never sees a torn record."""
        self.backend.put(
            f"{self.dir}/db_{database_name}/done",
            {"session_id": self.session_id, "end_time": time.time()},
        )

    def all_done(self) -> bool:
        items = self.items()
        return bool(items) and all(i.end_time is not None for i in items)
