"""SQL execution surface over a SparkSession.

Parity target: reference locopy/database.py:32-283 (``Database``). The
reference manages a DBAPI connection + cursor; here the "warehouse" is
Spark itself, so ``connect`` builds/attaches a SparkSession, ``execute``
runs SQL through Catalyst, and the fetch helpers move results across
the Arrow boundary.
"""

from __future__ import annotations

import logging
import time
from typing import Generator, Optional

import pandas

from locopy_spark.errors import CredentialsError, DBError
from locopy_spark.session import get_spark
from locopy_spark.utility import read_config_yaml

logger = logging.getLogger(__name__)


def _split_sql_statements(sql: str) -> list[str]:
    """Split on ``;`` only at top level — quotes (``'``/``"``/backtick,
    with ``''`` escaping), line comments (``--``) and block comments
    (``/* */``) are honored, so ``SELECT ';' AS c`` stays one statement.
    """
    statements, buf = [], []
    quote: str | None = None  # active quote char
    comment_start = -1  # index of '/' opening the active block comment
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if quote:
            buf.append(ch)
            if quote in "'\"" and ch == "\\" and i + 1 < n:
                buf.append(sql[i + 1])  # Spark backslash escape: \' \" \\
                i += 2
                continue
            if quote in "'\"`" and ch == quote:
                if ch == "'" and i + 1 < n and sql[i + 1] == "'":
                    buf.append("'")
                    i += 1  # escaped '' inside a string literal
                else:
                    quote = None
            elif quote == "--" and ch == "\n":
                quote = None
            elif (
                quote == "/*"
                and ch == "/"
                and sql[i - 1] == "*"
                and i >= comment_start + 3  # the opener's '*' can't close it: '/*/'
            ):
                quote = None
            i += 1
            continue
        if ch in "'\"`":
            quote = ch
        elif ch == "-" and sql[i : i + 2] == "--":
            quote = "--"
        elif ch == "/" and sql[i : i + 2] == "/*":
            quote = "/*"
            comment_start = i
        elif ch == ";":
            statements.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    statements.append("".join(buf))
    return [s.strip() for s in statements if s.strip()]


class Database:
    """Manage a SparkSession and execute queries against it.

    Parameters
    ----------
    spark : SparkSession, optional
        An existing session to attach to. If omitted, ``connect()``
        builds one from the remaining configuration.
    config_yaml : str, optional
        YAML file of Spark conf / session options (parity with the
        reference's connection YAML, locopy/database.py:44).
    **kwargs
        Session options passed to :func:`locopy_spark.session.get_spark`
        (``app_name``, ``master``, ``shuffle_partitions``) or arbitrary
        ``spark.*`` conf keys.
    """

    def __init__(self, spark=None, config_yaml: Optional[str] = None, **kwargs):
        if config_yaml and kwargs:
            raise CredentialsError("Please provide kwargs or a YAML configuration, not both.")
        self.connection = dict(kwargs) if kwargs else {}
        if config_yaml:
            self.connection = read_config_yaml(config_yaml) or {}
        self.spark = spark
        self._result = None  # last executed DataFrame (the "cursor")

    # -- lifecycle ---------------------------------------------------------
    def connect(self) -> None:
        """Create/attach the SparkSession (reference: database.py:91)."""
        try:
            if self.spark is None:
                named = {
                    k: self.connection[k]
                    for k in ("app_name", "master", "shuffle_partitions")
                    if k in self.connection
                }
                extra = {
                    k: v for k, v in self.connection.items()
                    if k not in ("app_name", "master", "shuffle_partitions")
                }
                self.spark = get_spark(extra_conf=extra, **named)
        except Exception as e:
            raise DBError("Error connecting to the database.") from e

    def disconnect(self) -> None:
        """Detach from the session (reference: database.py:108).

        Does NOT ``spark.stop()`` by default: sessions are shared
        process-wide; stopping one would kill sibling users. Pass-through
        available via ``shutdown()``.
        """
        self._result = None

    def shutdown(self) -> None:
        """Actually stop the SparkSession."""
        if self.spark is not None:
            self.spark.stop()
            self.spark = None

    def _is_connected(self) -> bool:
        try:
            return self.spark is not None
        except Exception:
            return False

    # -- execution ---------------------------------------------------------
    def execute(
        self,
        sql: str,
        commit: bool = True,
        params=None,
        many: bool = False,
        verbose: bool = True,
    ):
        """Execute SQL (reference: database.py:131).

        Multiple ``;``-separated statements run in order (split
        quote-aware, so literals containing ``;`` survive); the last
        result is retained for ``to_dataframe``/``to_dict``. ``params``
        maps to Spark named-parameter SQL (``:name`` placeholders).
        With ``many=True`` (reference database.py:136 executemany),
        ``params`` is an iterable of parameter sets and the statement
        runs once per set. Returns the last result DataFrame (lazily
        evaluated).
        """
        if not self._is_connected():
            raise DBError("Cannot execute SQL on a closed connection.")
        start = time.time()
        if verbose:
            logger.info("Running SQL: %s", sql)
        statements = _split_sql_statements(sql)
        if many:
            # materialize: generators would be exhausted by the first
            # statement (the loop below re-iterates per statement) and an
            # empty iterator must raise, not silently run zero times
            params = list(params) if params is not None else []
            if not params:
                raise DBError("execute(many=True) requires a non-empty params sequence.")
        try:
            for stmt in statements:
                if many:
                    for p in params:
                        self._result = self.spark.sql(stmt, args=p)
                elif params:
                    self._result = self.spark.sql(stmt, args=params)
                else:
                    self._result = self.spark.sql(stmt)
        except DBError:
            raise
        except Exception as e:
            logger.error("Error running SQL query. err: %s", e)
            raise DBError("Error running SQL query.") from e
        logger.info("Time elapsed: %.3fs", time.time() - start)
        return self._result

    def column_names(self) -> list[str]:
        """Column names of the last result, lower-cased
        (reference: database.py:192)."""
        if self._result is None:
            raise DBError("No query has been executed.")
        return [c.lower() for c in self._result.columns]

    def to_dataframe(self, df_type: str = "pandas", size: Optional[int] = None):
        """Fetch the last result as a pandas DataFrame
        (reference: database.py:207).

        ``size`` fetches only the first ``size`` rows (the reference's
        chunked ``fetchmany``); None fetches everything via Arrow.
        Returns None when the result is empty, matching the reference.
        """
        if df_type not in ("pandas", "polars", "spark"):
            raise ValueError("df_type must be `pandas`, `polars` or `spark`.")
        if self._result is None:
            raise DBError("No query has been executed.")
        if df_type == "spark":
            return self._result
        pdf = (
            self._result.limit(size).toPandas()
            if size is not None
            else self._result.toPandas()
        )
        if len(pdf) == 0:
            return None
        pdf.columns = [c.lower() for c in pdf.columns]
        if df_type == "polars":
            # reference parity (snowflake.py:514); polars is optional
            try:
                import polars as pl
            except ImportError as e:  # pragma: no cover
                raise DBError(
                    "polars is not installed; use df_type='pandas'."
                ) from e
            return pl.from_pandas(pdf)
        return pdf

    def to_dict(self) -> Generator[dict, None, None]:
        """Generate rows of the last result as dicts
        (reference: database.py:247)."""
        if self._result is None:
            raise DBError("No query has been executed.")
        cols = self.column_names()
        for row in self._result.toLocalIterator():
            yield dict(zip(cols, row))

    # -- convenience -------------------------------------------------------
    def register_parquet_dir(self, sf_dir: str, tables: Optional[list[str]] = None) -> list[str]:
        """Register every ``<table>.parquet`` under ``sf_dir`` as a temp view."""
        import glob as _glob
        import os as _os

        paths = sorted(_glob.glob(_os.path.join(sf_dir, "*.parquet")))
        if tables:
            paths = [p for p in paths if _os.path.basename(p).split(".")[0] in tables]
        names = []
        for p in paths:
            name = _os.path.basename(p).split(".")[0]
            self.spark.read.parquet(p).createOrReplaceTempView(name)
            names.append(name)
        return names

    def __enter__(self):
        self.connect()
        return self

    def __exit__(self, exc_type, exc, exc_tb):
        self.disconnect()
