"""T-SQL LIKE → regex translation (SURVEY §2.2 #16)."""

from integritychecksforvldbs_spark.functions.like import tsql_like_match, tsql_like_to_regex


def test_percent_wildcard():
    assert tsql_like_match("mydb", "%db%")
    assert tsql_like_match("db", "%db%")
    assert not tsql_like_match("xyz", "%db%")


def test_underscore_single_char():
    assert tsql_like_match("db1", "db_")
    assert not tsql_like_match("db12", "db_")


def test_underscore_escaped_is_literal():
    # REPLACE(name,'_','[_]') semantics (IC:304)
    assert tsql_like_match("my_db", "my_db", escape_underscore=True)
    assert not tsql_like_match("myxdb", "my_db", escape_underscore=True)
    assert tsql_like_match("myxdb", "my_db", escape_underscore=False)


def test_character_class():
    assert tsql_like_match("db1", "db[0-9]")
    assert not tsql_like_match("dbx", "db[0-9]")
    assert tsql_like_match("dbx", "db[^0-9]")
    assert tsql_like_match("a_b", "a[_]b")
    assert not tsql_like_match("axb", "a[_]b")


def test_regex_metachars_literal():
    assert tsql_like_match("a.b", "a.b")
    assert not tsql_like_match("axb", "a.b")
    assert tsql_like_match("a+b(c)", "a+b(c)")


def test_anchoring():
    assert not tsql_like_match("xdb", "db")
    assert not tsql_like_match("dbx", "db")
    assert tsql_like_match("db", "db")


def test_regex_output_shape():
    assert tsql_like_to_regex("%Db%") == "^.*Db.*$"
    assert tsql_like_to_regex("my_db", escape_underscore=True) == "^my_db$"
