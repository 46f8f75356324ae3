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


@dataclass
class CheckSpec:
    """One executable integrity check (the unit CommandExecute runs)."""

    kind: str
    database: str
    schema: str | None = None
    object: str | None = None  # table name (CHECKTABLE) or filegroup
    filegroup: str | None = None
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
        return COMMAND_TYPES[self.kind]

    def command_text(self) -> str:
        """DBCC-style command string, byte-compatible with the shapes
        the reference builds — this is the golden-test oracle."""
        if self.kind == CHECKTABLE:
            target = f"(N'[{self.schema}].[{self.object}]')"
        elif self.kind == CHECKFILEGROUP:
            target = f"(N'{self.filegroup}')"
        else:
            target = f"(N'{self.database}')"
        parts = [f"DBCC {self.kind} {target}"]
        opts = ["NO_INFOMSGS", "ALL_ERRORMSGS"]
        if self.kind in (CHECKDB, CHECKTABLE, CHECKFILEGROUP) and self.no_index:
            opts.append("NOINDEX")
        if self.kind in (CHECKDB, CHECKTABLE):
            if self.physical_only:
                opts.append("PHYSICAL_ONLY")
            else:
                if self.data_purity:
                    opts.append("DATA_PURITY")
                if self.extended_logical_checks:
                    opts.append("EXTENDED_LOGICAL_CHECKS")
        if self.tablock:
            opts.append("TABLOCK")
        if self.maxdop is not None:
            opts.append(f"MAXDOP = {self.maxdop}")
        cmd = parts[0] + " WITH " + ", ".join(opts)
        if self.lock_timeout is not None:
            # SET LOCK_TIMEOUT prefix, milliseconds (DIC:1355)
            cmd = f"SET LOCK_TIMEOUT {self.lock_timeout * 1000}; " + cmd
        return cmd
