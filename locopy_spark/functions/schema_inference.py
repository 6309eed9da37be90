"""Column type inference — pandas / Spark DataFrame → warehouse types.

Parity target: reference locopy/utility.py:270-470 ``find_column_type``
(pandas + polars variants mapping dtypes to
boolean/int/float/varchar/date/time/timestamp). Ours returns the same
warehouse-type dict and additionally maps it onto a Spark schema for
``createDataFrame``/DDL.
"""

from __future__ import annotations

from collections import OrderedDict

import pandas as pd
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import types as T

_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "varchar": T.StringType(),
    "date": T.DateType(),
    "time": T.StringType(),  # Spark has no TIME type — stored as string
    "timestamp": T.TimestampType(),
}

_FROM_SPARK = {
    "boolean": "boolean",
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "string": "varchar",
}


def _arrow_column_type(pa_dtype) -> str:
    """pyarrow-backed pandas column → warehouse type (reference
    utility.py:331 check_column_type_pyarrow).

    Note: ALL temporal dtypes (incl. date32) map to "timestamp" — that
    matches the reference's pyarrow path verbatim, even though the
    polars path maps Date → "date"; the asymmetry is the reference's
    own contract, kept deliberately."""
    import pyarrow as pa

    if pa.types.is_temporal(pa_dtype):
        return "timestamp"
    if pa.types.is_boolean(pa_dtype):
        return "boolean"
    if pa.types.is_integer(pa_dtype):
        return "int"
    if pa.types.is_floating(pa_dtype):
        return "float"
    return "varchar"


def _pandas_column_type(data: pd.Series) -> str:
    import re

    dtype = str(data.dtype)
    if data.size == 0:
        return "varchar"
    if isinstance(data.dtype, pd.ArrowDtype):
        return _arrow_column_type(data.dtype.pyarrow_dtype)
    if dtype in ("datetime64[ns]", "M8[ns]") or re.match(
        r"(datetime64\[ns\,\W)([a-zA-Z/_]+)(\])", dtype
    ):
        return "timestamp"
    if dtype.lower().startswith("bool"):
        return "boolean"
    if dtype.lower().startswith(("int", "uint")):
        return "int"
    if dtype.lower().startswith("float"):
        return "float"
    if dtype.startswith("object"):
        try:
            pd.to_numeric(data)
            return "float"
        except (ValueError, TypeError):
            pass
        try:
            converted = pd.to_datetime(data, format="mixed")
            sample = converted.iloc[0]
            if getattr(sample, "hour", 0) or getattr(sample, "minute", 0) or getattr(
                sample, "second", 0
            ):
                return "timestamp"
            return "date"
        except (ValueError, TypeError):
            pass
        return "varchar"
    return "varchar"


def _is_polars(obj) -> bool:
    # duck-typed so polars stays an optional dependency: a polars
    # DataFrame identifies itself by module, no import needed here
    return type(obj).__module__.split(".")[0] == "polars"


def find_column_type_polars(dataframe, warehouse_type: str = "spark") -> "OrderedDict[str, str]":
    """Polars variant of :func:`find_column_type` (parity target:
    reference locopy/utility.py:383 ``find_column_type_polars``).

    Dtype mapping mirrors the reference: temporal → date/time/timestamp,
    bool → boolean, integer → int, other numeric → float; string
    columns are probed (numeric cast, then date, time, datetime
    parses — date first, since datetime parsing is a superset).
    """
    import polars as pl  # optional dependency, gated at call time

    def _probe_string(data) -> str:
        for caster, t in (
            (lambda s: s.cast(pl.Float64), "float"),
            (lambda s: s.str.to_date(), "date"),
            (lambda s: s.str.to_time(), "time"),
            (lambda s: s.str.to_datetime(), "timestamp"),
        ):
            try:
                caster(data)
                return t
            except Exception:
                continue
        return "varchar"

    out: "OrderedDict[str, str]" = OrderedDict()
    for column in dataframe.columns:
        data = dataframe.lazy().select(column).drop_nulls().collect().to_series()
        if data.shape[0] == 0:
            out[column] = "varchar"
        elif data.dtype.is_temporal():
            if data.dtype == pl.Date:
                out[column] = "date"
            elif data.dtype == pl.Time:
                out[column] = "time"
            else:
                out[column] = "timestamp"
        elif str(data.dtype).lower().startswith("bool"):
            out[column] = "boolean"
        elif data.dtype.is_integer():
            out[column] = "int"
        elif data.dtype.is_numeric():
            out[column] = "float"
        else:
            out[column] = _probe_string(data)
    return out


def find_column_type(dataframe, warehouse_type: str = "spark") -> "OrderedDict[str, str]":
    """Infer a warehouse type per column.

    Accepts a pandas DataFrame (dtype-based inference with
    object-column probing, mirroring the reference), a polars DataFrame
    (dispatches to :func:`find_column_type_polars`), or a Spark
    DataFrame (authoritative from the schema — no sampling needed).
    """
    if isinstance(dataframe, SparkDataFrame):
        return OrderedDict(
            (f.name, _FROM_SPARK.get(f.dataType.simpleString(), "varchar"))
            for f in dataframe.schema.fields
        )
    if isinstance(dataframe, pd.DataFrame):
        out: "OrderedDict[str, str]" = OrderedDict()
        for column in dataframe.columns:
            data = dataframe[column].dropna().reset_index(drop=True)
            out[column] = _pandas_column_type(data)
        return out
    if _is_polars(dataframe):
        return find_column_type_polars(dataframe, warehouse_type)
    raise TypeError("find_column_type expects a pandas, polars or Spark DataFrame")


def to_spark_schema(column_types: "OrderedDict[str, str]") -> T.StructType:
    """Map a warehouse-type dict onto a Spark StructType."""
    return T.StructType(
        [
            T.StructField(name, _SPARK_TYPES.get(t.lower().split("(")[0], T.StringType()))
            for name, t in column_types.items()
        ]
    )


def ddl_from_types(table_name: str, column_types: "OrderedDict[str, str]") -> str:
    """CREATE TABLE DDL from the inferred types (reference builds this
    string for the warehouse; useful for Spark SQL DDL too)."""
    cols = ", ".join(f"{c} {t}" for c, t in column_types.items())
    return f"CREATE TABLE {table_name} ({cols})"
