"""Reference-shaped warehouse facade: ``Redshift``/``Snowflake`` method
surface over Spark.

Parity targets: reference locopy/redshift.py:93 (``class Redshift(S3,
Database)`` — copy/load_and_copy/unload/unload_and_copy/
insert_dataframe_to_table) and locopy/snowflake.py:113 (``class
Snowflake`` — upload_to_internal/download_from_internal/copy/unload).
The reference classes render SQL strings (COPY/UNLOAD/PUT/GET) for the
warehouse to run; here each method IS the operation, delegating to the
Spark-first implementations in ``sources/``. One class serves both
flavors — the split only existed because the two warehouses speak
different SQL — with ``Redshift``/``Snowflake`` aliases so reference
call-sites and ``except`` clauses port verbatim.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame

from locopy_spark.database import Database
from locopy_spark.errors import DBError
from locopy_spark.sources.copy import copy_files
from locopy_spark.sources.dataframe_io import insert_dataframe_to_table
from locopy_spark.sources.stage import Stage
from locopy_spark.sources.unload import unload as _unload
from locopy_spark.sources.unload import unload_and_fetch


def _parse_unload_options(unload_options: list[str] | None) -> dict:
    """Map reference UNLOAD option strings onto writer kwargs.

    Recognized (reference redshift.py:443 passes these verbatim to the
    warehouse): ``PARALLEL OFF`` → single output file, ``HEADER`` →
    header row, ``GZIP`` → gzip codec, ``DELIMITER 'x'`` → field
    delimiter. Unknown options raise rather than silently no-op.
    """
    out: dict = {}
    for opt in unload_options or []:
        u = opt.strip()
        up = u.upper()
        if up == "PARALLEL OFF":
            out["splits"] = 1
        elif up == "HEADER":
            out["header"] = True
        elif up == "GZIP":
            out["compression"] = "gzip"
        elif up.startswith("DELIMITER "):
            # both Redshift forms: DELIMITER '|' and DELIMITER |
            rest = u[len("DELIMITER ") :].strip()
            if rest.upper().startswith("AS "):  # DELIMITER AS '|'
                rest = rest[3:].strip()
            if len(rest) >= 2 and rest[0] == "'" and rest[-1] == "'":
                rest = rest[1:-1]
            if not rest:
                raise DBError(f"Malformed UNLOAD DELIMITER option: {opt!r}")
            out["delim"] = rest
        else:
            raise DBError(f"Unsupported UNLOAD option: {opt!r}")
    return out


class Warehouse(Database):
    """``Database`` plus the bulk-transfer method surface of the
    reference warehouse classes.

    ``stage_root`` plays the role of the S3 bucket / internal stage: a
    URI or directory the stage transport (:class:`Stage`) reads and
    writes. Methods mirror the reference names and argument order so a
    port is a change of import, not of call-sites.
    """

    def __init__(
        self,
        spark=None,
        config_yaml: Optional[str] = None,
        stage_root: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(spark=spark, config_yaml=config_yaml, **kwargs)
        self._stage = Stage(stage_root) if stage_root else None

    # -- stage transport (reference snowflake.py:213,247; s3.py) ----------
    def _require_stage(self) -> Stage:
        if self._stage is None:
            raise DBError("No stage_root configured for stage transport.")
        return self._stage

    def upload_to_internal(self, local: str, stage: str = "") -> str:
        """PUT a local file to the stage (reference snowflake.py:213)."""
        import os

        key = os.path.join(stage, os.path.basename(local)) if stage else None
        return self._require_stage().upload(local, key)

    def download_from_internal(self, stage: str, local: str = ".") -> list[str]:
        """GET stage files matching ``stage`` (reference snowflake.py:247)."""
        return self._require_stage().download(stage, local)

    # -- bulk load (reference redshift.py:193; snowflake.py:268) ----------
    def copy(
        self,
        table_name: str,
        path: str,
        delim: str | None = "|",
        copy_options: list[str] | None = None,
        file_format: str = "csv",
    ) -> DataFrame:
        """COPY files into ``table_name`` (reference redshift.py:193:
        same (table, path, delim, copy_options) argument order)."""
        if not self._is_connected():
            raise DBError("No connection object is present.")
        return copy_files(
            self.spark,
            path,
            table_name,
            delim=delim,
            file_format=file_format,
            copy_options=copy_options,
        )

    def load_and_copy(
        self,
        local_file: str,
        stage_folder: str,
        table_name: str,
        delim: str | None = "|",
        copy_options: list[str] | None = None,
    ) -> DataFrame:
        """Local file → stage → COPY (reference redshift.py:235
        load_and_copy: upload then load). The stage hop is real file
        transport (so the staged artifact exists for audit/replay),
        then Spark reads it directly."""
        staged = self.upload_to_internal(local_file, stage_folder)
        return self.copy(
            table_name, staged, delim=delim, copy_options=copy_options
        )

    # -- bulk export (reference redshift.py:349,443; snowflake.py:339) ----
    def unload(
        self,
        query: str,
        path: str,
        unload_options: list[str] | None = None,
    ) -> DataFrame:
        """UNLOAD ``query`` results to files under ``path`` (reference
        redshift.py:443: same (query, path, options) argument order)."""
        if not self._is_connected():
            raise DBError("No connection object is present.")
        return _unload(self.spark, query, path, **_parse_unload_options(unload_options))

    def unload_and_copy(
        self,
        query: str,
        path: str,
        unload_options: list[str] | None = None,
    ) -> pd.DataFrame:
        """UNLOAD then fetch back as one local pandas frame (reference
        redshift.py:349 unload_and_copy's export_path+return-frame
        behavior)."""
        if not self._is_connected():
            raise DBError("No connection object is present.")
        opts = _parse_unload_options(unload_options)
        header = opts.pop("header", True)
        return unload_and_fetch(self.spark, query, path, header=header, **opts)

    # -- dataframe insert (reference redshift.py:532; snowflake.py:412) ---
    def insert_dataframe_to_table(
        self,
        dataframe,
        table_name: str,
        columns: list[str] | None = None,
        create: bool = True,
        metadata: dict[str, str] | None = None,
    ) -> DataFrame:
        """Insert a pandas/polars frame (reference argument order)."""
        if not self._is_connected():
            raise DBError("No connection object is present.")
        return insert_dataframe_to_table(
            self.spark,
            dataframe,
            table_name,
            columns=columns,
            create=create,
            metadata=metadata,
        )


# reference class names — port `from locopy import Redshift` unchanged
Redshift = Warehouse
Snowflake = Warehouse
