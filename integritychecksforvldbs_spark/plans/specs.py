"""Check specifications — generated commands as first-class data.

In the reference every integrity check is a generated T-SQL string
(built by concatenation, IntegrityChecks_VLDB.sql:684-687 /
DatabaseIntegrityCheck.sql:1352-1365), stored in the state table and
the command log, and used as the testing oracle ("CommandsRun",
IC:486-494).  We keep that design: a :class:`CheckSpec` serializes to
the same DBCC-style command text for golden tests and logging, while
``kind``/options drive the Spark kernel that actually executes it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# command families, mirroring @CheckCommands (DIC:698-714)
CHECKDB = "CHECKDB"
CHECKALLOC = "CHECKALLOC"
CHECKCATALOG = "CHECKCATALOG"
CHECKTABLE = "CHECKTABLE"
CHECKFILEGROUP = "CHECKFILEGROUP"
ALL_KINDS = [CHECKDB, CHECKALLOC, CHECKCATALOG, CHECKTABLE, CHECKFILEGROUP]

COMMAND_TYPES = {
    CHECKDB: "DBCC_CHECKDB",
    CHECKALLOC: "DBCC_CHECKALLOC",
    CHECKCATALOG: "DBCC_CHECKCATALOG",
    CHECKTABLE: "DBCC_CHECKTABLE",
    CHECKFILEGROUP: "DBCC_CHECKFILEGROUP",
}


def validate_check_commands(kinds: list[str]) -> None:
    """Mutual-exclusion rules of @CheckCommands (DIC:717-724):

    CHECKDB may not combine with any granular command; CHECKFILEGROUP
    may not combine with CHECKALLOC or CHECKTABLE; duplicates rejected.
    """
    for k in kinds:
        if k not in ALL_KINDS:
            raise ValueError("The value for the parameter @CheckCommands is not supported.")
    if len(set(kinds)) != len(kinds):
        raise ValueError("The value for the parameter @CheckCommands is not supported.")
    if CHECKDB in kinds and len(kinds) > 1:
        raise ValueError("The value for the parameter @CheckCommands is not supported.")
    if CHECKFILEGROUP in kinds and (CHECKALLOC in kinds or CHECKTABLE in kinds):
        raise ValueError("The value for the parameter @CheckCommands is not supported.")


# CommandType strings used by the VLDB script (IC:548,555,694)
IC_COMMAND_TYPES = {
    CHECKALLOC: "Marks Custom CheckAlloc",
    CHECKCATALOG: "Marks Custom CheckCatalog",
    CHECKTABLE: "Marks Custom CheckTable",
}


@dataclass
class CheckSpec:
    """One executable integrity check (the unit CommandExecute runs)."""

    kind: str
    database: str
    schema: str | None = None
    object: str | None = None  # table name (CHECKTABLE) or filegroup
    filegroup: str | None = None
    check_db_name: str | None = None  # snapshot alias when one is pinned
    # option flags (IC:684-687, DIC:1352-1365)
    no_index: bool = False
    physical_only: bool = False
    data_purity: bool = True  # default when not physical_only (IC:685)
    extended_logical_checks: bool = False
    tablock: bool = False
    maxdop: int | None = None
    lock_timeout: int | None = None  # seconds
    # the pinned file listing = our snapshot (SURVEY §2.9 #60)
    snapshot_files: list[str] = field(default_factory=list)

    @property
    def command_type(self) -> str:
        """≤60 chars (CommandExecute.sql:120); IC's custom labels for
        the three kernels it issues itself, DBCC_* for the rest."""
        return IC_COMMAND_TYPES.get(self.kind, COMMAND_TYPES[self.kind])

    def command_text(self) -> str:
        """Command string byte-compatible with the shapes the reference
        builds — the golden-test oracle (CommandsRun, IC:486-494).

        CHECKALLOC/CHECKCATALOG/CHECKTABLE follow the VLDB script
        (IC:547,554,684-687); CHECKDB/CHECKFILEGROUP follow the vendored
        proc (DIC:1352-1365,1476-1487).
        """
        db = self.check_db_name or self.database
        if self.kind == CHECKALLOC:
            cmd = f"DBCC CHECKALLOC([{db}]) WITH NO_INFOMSGS, ALL_ERRORMSGS"
            if self.tablock:
                cmd += ", TABLOCK"  # DIC:1522
            return cmd
        if self.kind == CHECKCATALOG:
            return f"DBCC CHECKCATALOG([{db}]) WITH NO_INFOMSGS"
        if self.kind == CHECKTABLE:
            cmd = (
                f"USE [{db}]; DBCC CHECKTABLE ('[{self.schema}].[{self.object}]') "
                "WITH NO_INFOMSGS, ALL_ERRORMSGS"
            )
            if self.no_index:
                cmd += ", NOINDEX"  # DIC:1644
            if self.physical_only:
                cmd += ", PHYSICAL_ONLY"
            else:
                if self.data_purity:
                    cmd += ", DATA_PURITY"
                if self.extended_logical_checks:
                    cmd += ", EXTENDED_LOGICAL_CHECKS"  # DIC:1648
            if self.tablock:
                cmd += ", TABLOCK"
            if self.maxdop is not None:
                cmd += f", MAXDOP = {self.maxdop}"
            if self.lock_timeout is not None:
                cmd = f"SET LOCK_TIMEOUT {self.lock_timeout * 1000}; " + cmd
            return cmd
        if self.kind == CHECKDB:
            cmd = f"DBCC CHECKDB ([{db}]) WITH NO_INFOMSGS, ALL_ERRORMSGS"
            if self.no_index:
                cmd += ", NOINDEX"
            if self.physical_only:
                cmd += ", PHYSICAL_ONLY"
            else:
                if self.data_purity:
                    cmd += ", DATA_PURITY"
                if self.extended_logical_checks:
                    cmd += ", EXTENDED_LOGICAL_CHECKS"
            if self.tablock:
                cmd += ", TABLOCK"
            if self.maxdop is not None:
                cmd += f", MAXDOP = {self.maxdop}"
            if self.lock_timeout is not None:
                cmd = f"SET LOCK_TIMEOUT {self.lock_timeout * 1000}; " + cmd
            return cmd
        # CHECKFILEGROUP (DIC:1476-1487)
        cmd = (
            f"USE [{db}]; DBCC CHECKFILEGROUP ('{self.filegroup}') "
            "WITH NO_INFOMSGS, ALL_ERRORMSGS"
        )
        if self.no_index:
            cmd += ", NOINDEX"
        if self.physical_only:
            cmd += ", PHYSICAL_ONLY"
        if self.tablock:
            cmd += ", TABLOCK"
        if self.maxdop is not None:
            cmd += f", MAXDOP = {self.maxdop}"
        if self.lock_timeout is not None:
            cmd = f"SET LOCK_TIMEOUT {self.lock_timeout * 1000}; " + cmd
        return cmd


def tsql_ts_121(ts) -> str:
    """CONVERT(nvarchar, dt, 121) → 'yyyy-mm-dd hh:mi:ss.mmm' (IC:679)."""
    return ts.strftime("%Y-%m-%d %H:%M:%S.") + f"{ts.microsecond // 1000:03d}"


def tsql_ts_112(ts) -> str:
    """CONVERT(nvarchar, dt, 112) → 'yyyymmdd' (snapshot names, IC:522)."""
    return ts.strftime("%Y%m%d")
