import pytest

from locopy_spark.database import Database
from locopy_spark.errors import CredentialsError, DBError


def test_execute_and_fetch(spark, sf_dir):
    with Database(spark=spark) as db:
        db.register_parquet_dir(sf_dir, ["nation", "region"])
        db.execute(
            "SELECT r_name, count(*) AS n FROM nation "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"
        )
        assert db.column_names() == ["r_name", "n"]
        pdf = db.to_dataframe()
        assert len(pdf) == 5 and set(pdf.columns) == {"r_name", "n"}
        rows = list(db.to_dict())
        assert len(rows) == 5 and set(rows[0]) == {"r_name", "n"}


def test_multi_statement(spark):
    db = Database(spark=spark)
    db.connect()
    out = db.execute("SELECT 1 AS a; SELECT 2 AS b")
    assert out.collect()[0].b == 2


def test_params(spark):
    db = Database(spark=spark)
    db.connect()
    out = db.execute("SELECT :x AS v", params={"x": 42})
    assert out.collect()[0].v == 42


def test_size_limit(spark, sf_dir):
    db = Database(spark=spark)
    db.connect()
    db.register_parquet_dir(sf_dir, ["nation"])
    db.execute("SELECT * FROM nation")
    assert len(db.to_dataframe(size=3)) == 3


def test_empty_result_returns_none(spark):
    db = Database(spark=spark)
    db.connect()
    db.execute("SELECT 1 AS x WHERE 1 = 0")
    assert db.to_dataframe() is None


def test_errors(spark):
    with pytest.raises(DBError):
        Database().execute("SELECT 1")
    with pytest.raises(CredentialsError):
        Database(config_yaml="c.yml", app_name="x")
    db = Database(spark=spark)
    db.connect()
    with pytest.raises(DBError):
        db.execute("SELEC nonsense")


def test_semicolon_inside_literal(spark):
    db = Database(spark=spark)
    db.connect()
    out = db.execute("SELECT ';' AS c, '--not a comment; really' AS d")
    row = out.collect()[0]
    assert row.c == ";" and row.d == "--not a comment; really"


def test_split_sql_statements_edges():
    from locopy_spark.database import _split_sql_statements

    assert _split_sql_statements("SELECT 1; SELECT 2") == ["SELECT 1", "SELECT 2"]
    assert _split_sql_statements("SELECT ';' AS c") == ["SELECT ';' AS c"]
    assert _split_sql_statements("SELECT 'it''s; fine'") == ["SELECT 'it''s; fine'"]
    assert _split_sql_statements("SELECT 1 -- trailing; comment\n; SELECT 2") == [
        "SELECT 1 -- trailing; comment",
        "SELECT 2",
    ]
    assert _split_sql_statements("SELECT /* a;b */ 1; SELECT 2") == [
        "SELECT /* a;b */ 1",
        "SELECT 2",
    ]
    assert _split_sql_statements('SELECT ";" AS q') == ['SELECT ";" AS q']


def test_execute_many(spark):
    db = Database(spark=spark)
    db.connect()
    out = db.execute(
        "SELECT :x AS v", params=[{"x": 1}, {"x": 2}, {"x": 3}], many=True
    )
    # reference executemany retains the last statement's result
    assert out.collect()[0].v == 3
    with pytest.raises(DBError):
        db.execute("SELECT :x AS v", many=True)


def test_split_sql_backslash_escapes():
    from locopy_spark.database import _split_sql_statements as sp

    assert sp(r"SELECT 'a\';' AS x") == [r"SELECT 'a\';' AS x"]
    assert sp(r"SELECT 'a\\'; SELECT 2") == [r"SELECT 'a\\'", "SELECT 2"]


def test_split_sql_overlapping_comment_open_close():
    # regression: '/*/' is an UNTERMINATED comment opener — the
    # opener's own '*' must not close it
    from locopy_spark.database import _split_sql_statements as sp

    assert sp("SELECT 1 /*/ ; */ 2") == ["SELECT 1 /*/ ; */ 2"]
    assert sp("SELECT /**/ 1; SELECT 2") == ["SELECT /**/ 1", "SELECT 2"]
    assert sp("SELECT /* * / ; */ 1") == ["SELECT /* * / ; */ 1"]


def test_execute_many_generator_and_empty(spark):
    db = Database(spark=spark)
    db.connect()
    # generator params must survive multi-statement re-iteration
    out = db.execute(
        "SELECT :x AS v; SELECT :x + 10 AS v",
        params=({"x": i} for i in (1, 2)),
        many=True,
    )
    assert out.collect()[0].v == 12
    # an exhausted/empty iterator must raise, not silently no-op
    with pytest.raises(DBError):
        db.execute("SELECT :x AS v", params=iter([]), many=True)
