import pytest
import pandas as pd

from locopy_spark.functions.schema_inference import (
    ddl_from_types,
    find_column_type,
    to_spark_schema,
)


def test_pandas_dtypes():
    pdf = pd.DataFrame(
        {
            "b": [True],
            "i": [1],
            "f": [1.5],
            "s": ["x"],
            "ts": pd.to_datetime(["2024-01-01 10:00:00"]),
            "numstr": ["1.25"],
            "datestr": ["2024-01-02"],
            "timestr": ["2024-01-02 10:11:12"],
        }
    )
    t = find_column_type(pdf)
    assert t["b"] == "boolean"
    assert t["i"] == "int"
    assert t["f"] == "float"
    assert t["s"] == "varchar"
    assert t["ts"] == "timestamp"
    assert t["numstr"] == "float"
    assert t["datestr"] == "date"
    assert t["timestr"] == "timestamp"


def test_empty_column_is_varchar():
    pdf = pd.DataFrame({"e": [None, None]})
    assert find_column_type(pdf)["e"] == "varchar"


def test_spark_dataframe_types(spark):
    sdf = spark.sql(
        "SELECT 1 AS i, 1.5d AS f, 'x' AS s, true AS b, "
        "timestamp'2024-01-01' AS ts, date'2024-01-01' AS d"
    )
    t = find_column_type(sdf)
    assert t == {
        "i": "int",
        "f": "float",
        "s": "varchar",
        "b": "boolean",
        "ts": "timestamp",
        "d": "date",
    }


def test_schema_and_ddl():
    types = find_column_type(pd.DataFrame({"a": [1], "b": ["x"]}))
    schema = to_spark_schema(types)
    assert [f.dataType.simpleString() for f in schema.fields] == ["bigint", "string"]
    assert ddl_from_types("t", types) == "CREATE TABLE t (a int, b varchar)"


def test_find_column_type_rejects_unknown():
    with pytest.raises(TypeError):
        find_column_type([1, 2, 3])


def test_find_column_type_polars_roundtrip(spark):
    pl = pytest.importorskip("polars")
    df = pl.DataFrame(
        {
            "i": [1, 2],
            "f": [1.5, 2.5],
            "b": [True, False],
            "s": ["x", "y"],
            "d": ["2021-01-02", "2021-03-04"],
        }
    )
    types = find_column_type(df)
    assert types == {
        "i": "int",
        "f": "float",
        "b": "boolean",
        "s": "varchar",
        "d": "date",
    }
    from locopy_spark.sources.dataframe_io import insert_dataframe_to_table

    out = insert_dataframe_to_table(spark, df, "t_polars_rt", temp_view=True)
    assert out.count() == 2


def test_find_column_type_arrow_backed():
    df = pd.DataFrame(
        {
            "i": pd.array([1, 2], dtype="int64[pyarrow]"),
            "f": pd.array([1.5, 2.5], dtype="double[pyarrow]"),
            "b": pd.array([True, False], dtype="bool[pyarrow]"),
            "s": pd.array(["x", "y"], dtype="string[pyarrow]"),
            "t": pd.array(
                [pd.Timestamp("2021-01-02"), pd.Timestamp("2021-03-04")],
                dtype="timestamp[ns][pyarrow]",
            ),
        }
    )
    assert find_column_type(df) == {
        "i": "int",
        "f": "float",
        "b": "boolean",
        "s": "varchar",
        "t": "timestamp",
    }
