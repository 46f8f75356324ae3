"""Command-text golden tests (the reference's own oracle, IC:486-494)."""

from datetime import datetime

import pytest

from integritychecksforvldbs_spark.plans.specs import (
    CHECKALLOC,
    CHECKCATALOG,
    CHECKDB,
    CHECKFILEGROUP,
    CHECKTABLE,
    CheckSpec,
    tsql_ts_112,
    tsql_ts_121,
    validate_check_commands,
)


def test_checktable_command_text():
    # IC:684-687 shape
    spec = CheckSpec(CHECKTABLE, "Db1", schema="dbo", object="tbl")
    assert spec.command_text() == (
        "USE [Db1]; DBCC CHECKTABLE ('[dbo].[tbl]') "
        "WITH NO_INFOMSGS, ALL_ERRORMSGS, DATA_PURITY"
    )


def test_checktable_physical_only_and_maxdop():
    spec = CheckSpec(CHECKTABLE, "Db1", schema="dbo", object="tbl", physical_only=True, maxdop=8)
    assert spec.command_text() == (
        "USE [Db1]; DBCC CHECKTABLE ('[dbo].[tbl]') "
        "WITH NO_INFOMSGS, ALL_ERRORMSGS, PHYSICAL_ONLY, MAXDOP = 8"
    )


def test_checktable_snapshot_alias():
    spec = CheckSpec(
        CHECKTABLE, "Db1", schema="dbo", object="tbl",
        check_db_name="Db1_CHKTABLE_snapshot_20260813",
    )
    assert spec.command_text().startswith("USE [Db1_CHKTABLE_snapshot_20260813]; ")


def test_checkalloc_checkcatalog_command_text():
    # IC:547,554 shapes
    assert CheckSpec(CHECKALLOC, "Db1").command_text() == (
        "DBCC CHECKALLOC([Db1]) WITH NO_INFOMSGS, ALL_ERRORMSGS"
    )
    assert CheckSpec(CHECKCATALOG, "Db1").command_text() == (
        "DBCC CHECKCATALOG([Db1]) WITH NO_INFOMSGS"
    )


def test_checkdb_option_order():
    spec = CheckSpec(
        CHECKDB, "Db1", no_index=True, extended_logical_checks=True, tablock=True, maxdop=4
    )
    assert spec.command_text() == (
        "DBCC CHECKDB ([Db1]) WITH NO_INFOMSGS, ALL_ERRORMSGS, NOINDEX, "
        "DATA_PURITY, EXTENDED_LOGICAL_CHECKS, TABLOCK, MAXDOP = 4"
    )


def test_lock_timeout_prefix():
    # DIC:1355 — SET LOCK_TIMEOUT in milliseconds
    spec = CheckSpec(CHECKTABLE, "Db1", schema="s", object="t", lock_timeout=5)
    assert spec.command_text().startswith("SET LOCK_TIMEOUT 5000; USE [Db1]; ")


def test_command_types():
    assert CheckSpec(CHECKTABLE, "d", schema="s", object="t").command_type == "Marks Custom CheckTable"
    assert CheckSpec(CHECKALLOC, "d").command_type == "Marks Custom CheckAlloc"
    assert CheckSpec(CHECKCATALOG, "d").command_type == "Marks Custom CheckCatalog"
    assert CheckSpec(CHECKDB, "d").command_type == "DBCC_CHECKDB"
    assert len(CheckSpec(CHECKTABLE, "d").command_type) <= 60  # CE:120


def test_mutual_exclusion_rules():
    # DIC:717-724
    validate_check_commands([CHECKDB])
    validate_check_commands([CHECKALLOC, CHECKTABLE, CHECKCATALOG])
    validate_check_commands([CHECKFILEGROUP, CHECKCATALOG])
    for bad in (
        [CHECKDB, CHECKTABLE],
        [CHECKDB, CHECKALLOC],
        [CHECKFILEGROUP, CHECKALLOC],
        [CHECKFILEGROUP, CHECKTABLE],
        [CHECKTABLE, CHECKTABLE],
        ["NOPE"],
    ):
        with pytest.raises(ValueError, match="@CheckCommands is not supported"):
            validate_check_commands(bad)


def test_tsql_timestamp_styles():
    ts = datetime(2026, 8, 13, 4, 5, 6, 789000)
    assert tsql_ts_121(ts) == "2026-08-13 04:05:06.789"  # style 121 (IC:679)
    assert tsql_ts_112(ts) == "20260813"  # style 112 (IC:522)
