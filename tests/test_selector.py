"""Selection-DSL golden tests — every README example (RM:10-22)."""

import pytest

from integritychecksforvldbs_spark.operators.selector import (
    DatabaseCandidate,
    parse_dsl,
    match_objects,
    select_databases,
)


def fleet():
    return [
        DatabaseCandidate("master", "S"),
        DatabaseCandidate("msdb", "S"),
        DatabaseCandidate("model", "S"),
        DatabaseCandidate("tempdb", "S"),
        DatabaseCandidate("Db1", "U"),
        DatabaseCandidate("Db2", "U"),
        DatabaseCandidate("MyDbX", "U"),
        DatabaseCandidate("Other", "U"),
        DatabaseCandidate("AgDb", "U", availability_group="ag1"),
        DatabaseCandidate("SnapDb", "U", is_snapshot=True),
    ]


def names(dsl):
    return [c.name for c in select_databases(dsl, fleet())]


def test_system_databases():
    assert names("SYSTEM_DATABASES") == ["master", "model", "msdb"]  # no tempdb


def test_user_databases():
    assert names("USER_DATABASES") == ["AgDb", "Db1", "Db2", "MyDbX", "Other"]


def test_all_databases():
    # tempdb and snapshots excluded unless named exactly (IC:307)
    assert names("ALL_DATABASES") == [
        "AgDb", "Db1", "Db2", "MyDbX", "Other", "master", "model", "msdb",
    ]


def test_availability_group_databases():
    assert names("AVAILABILITY_GROUP_DATABASES") == ["AgDb"]


def test_user_minus_ag():
    assert names("USER_DATABASES, -AVAILABILITY_GROUP_DATABASES") == [
        "Db1", "Db2", "MyDbX", "Other",
    ]


def test_single_and_list():
    assert names("Db1") == ["Db1"]
    assert names("Db1, Db2") == ["Db1", "Db2"]


def test_user_minus_one():
    assert names("USER_DATABASES, -Db1") == ["AgDb", "Db2", "MyDbX", "Other"]


def test_wildcard():
    assert names("%Db%") == ["AgDb", "Db1", "Db2", "MyDbX"]
    assert names("%Db%, -Db1") == ["AgDb", "Db2", "MyDbX"]


def test_all_minus_wildcard():
    assert names("ALL_DATABASES, -%Db%") == ["Other", "master", "model", "msdb"]


def test_tempdb_and_snapshot_exact_name_only():
    assert names("tempdb") == ["tempdb"]
    assert names("SnapDb") == ["SnapDb"]
    assert "tempdb" not in names("ALL_DATABASES")
    assert "SnapDb" not in names("%Db%")


def test_start_position_ordering():
    # first-matching token position wins, then name (IC:343-349)
    assert names("Db2, Db1") == ["Db2", "Db1"]
    assert names("Other, %Db%") == ["Other", "AgDb", "Db1", "Db2", "MyDbX"]


def test_underscore_literal_in_patterns():
    cands = [DatabaseCandidate("my_db", "U"), DatabaseCandidate("myxdb", "U")]
    assert [c.name for c in select_databases("my_db", cands)] == ["my_db"]


def test_brackets_unquoted():
    assert names("[Db1]") == ["Db1"]


def test_whitespace_and_newlines():
    assert names("Db1 ,\n  Db2") == ["Db1", "Db2"]


def test_object_scope_three_part():
    items = parse_dsl("Db1.schema1.tbl%, -Db1.schema1.tblX", scope="object")
    triples = [
        ("Db1", "schema1", "tblA"),
        ("Db1", "schema1", "tblX"),
        ("Db1", "schema2", "tblA"),
        ("Db2", "schema1", "tblA"),
    ]
    assert match_objects(items, triples) == [("Db1", "schema1", "tblA")]


def test_all_objects_keyword():
    items = parse_dsl("ALL_OBJECTS", scope="object")
    triples = [("a", "b", "c"), ("d", "e", "f")]
    assert match_objects(items, triples) == triples


def test_filegroup_scope():
    items = parse_dsl("Db1.PRIMARY", scope="filegroup")
    assert items[0].database_pattern == "Db1"
    assert items[0].schema_pattern == "PRIMARY"
    with pytest.raises(ValueError):
        parse_dsl("justonepart", scope="filegroup")


# ---------------------------------------------------------------------------
# @AvailabilityGroups scope (DIC:480-587)
# ---------------------------------------------------------------------------

from integritychecksforvldbs_spark.operators.selector import (  # noqa: E402
    select_availability_groups,
    select_databases_by_availability_groups,
)


def ag_fleet():
    return [
        DatabaseCandidate("Db1", "U", availability_group="AG1"),
        DatabaseCandidate("Db2", "U", availability_group="AG1"),
        DatabaseCandidate("Db3", "U", availability_group="AG2"),
        DatabaseCandidate("Db4", "U", availability_group="AG_X"),
        DatabaseCandidate("Solo", "U"),  # not in any AG
    ]


def ag_names(dsl):
    return [c.name for c in select_databases_by_availability_groups(dsl, ag_fleet())]


def test_ag_all_keyword():
    # ALL_AVAILABILITY_GROUPS → '%' (DIC:514); non-AG DBs never selected
    assert ag_names("ALL_AVAILABILITY_GROUPS") == ["Db1", "Db2", "Db3", "Db4"]


def test_ag_named_group():
    assert ag_names("AG1") == ["Db1", "Db2"]


def test_ag_exclusion_overrides():
    # '-' prefix excludes (DIC:507-509); exclusions win
    assert ag_names("ALL_AVAILABILITY_GROUPS, -AG1") == ["Db3", "Db4"]


def test_ag_wildcard_and_underscore_escape():
    # literal underscore is escaped before LIKE (DIC:534): AG_X matches
    # the literal 'AG_X' item, and 'AG%' matches all three
    assert ag_names("AG_X") == ["Db4"]
    assert ag_names("AG%") == ["Db1", "Db2", "Db3", "Db4"]


def test_ag_bracket_unquoting():
    assert ag_names("[AG1]") == ["Db1", "Db2"]


def test_ag_start_position_ordering():
    # StartPosition = MIN matching include position (DIC:545-556):
    # AG2 listed first → its members order before AG1's
    out = select_databases_by_availability_groups("AG2, AG1", ag_fleet())
    assert [c.name for c in out] == ["Db3", "Db1", "Db2"]
    assert [c.start_position for c in out] == [1, 2, 2]
    assert [c.order for c in out] == [1, 2, 3]


def test_ag_empty_item_unsupported():
    with pytest.raises(ValueError, match="@AvailabilityGroups"):
        select_availability_groups("", ["AG1"])
    with pytest.raises(ValueError, match="@AvailabilityGroups"):
        select_availability_groups("AG1, -", ["AG1"])


def test_ag_mutual_exclusion_with_databases():
    from integritychecksforvldbs_spark.plans.scheduler import CheckParams

    with pytest.raises(ValueError, match="only specify one"):
        CheckParams(databases="Db1", availability_groups="AG1").validate()
