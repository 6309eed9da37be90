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
from locopy_spark.logger import get_logger
from locopy_spark.sources.unload import unload as _unload
from locopy_spark.sources.unload import unload_and_fetch

logger = get_logger(__name__)


def _parse_unload_options(unload_options: list[str] | None) -> dict:
    """Map reference UNLOAD option strings onto writer kwargs.

    Recognized (reference redshift.py:443 passes these verbatim to the
    warehouse): ``PARALLEL OFF`` → single output file, ``HEADER`` →
    header row, ``GZIP`` → gzip codec, ``DELIMITER 'x'`` → field
    delimiter, ``MAXFILESIZE [AS] n [MB|GB]`` → size-bounded output
    files. Unknown options raise rather than silently no-op.
    """
    import re

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
        elif up.startswith("MAXFILESIZE"):
            rest = u[len("MAXFILESIZE") :].strip()
            if rest.upper().startswith("AS "):  # MAXFILESIZE AS 6.2 GB
                rest = rest[3:].strip()
            m = re.match(r"^([0-9]*\.?[0-9]+)\s*(MB|GB)?$", rest, re.IGNORECASE)
            if not m:
                raise DBError(f"Malformed UNLOAD MAXFILESIZE option: {opt!r}")
            val = float(m.group(1))
            if (m.group(2) or "MB").upper() == "GB":
                val *= 1024
            out["max_file_mb"] = val
        else:
            raise DBError(f"Unsupported UNLOAD option: {opt!r}")
    return out


# Snowflake FILE_FORMAT format options accepted per file type — the
# subset with an exact Spark equivalent (reference snowflake.py:40-60
# COPY_FORMAT_OPTIONS / UNLOAD_FORMAT_OPTIONS enumerate the full set;
# unsupported names raise rather than silently no-op).
_FMT_TYPES = {"csv", "json", "parquet"}


def _parse_format_options(
    file_type: str, format_options: list[str] | None
) -> dict:
    """Map Snowflake ``FILE_FORMAT = (TYPE=.. a=b c=d)`` option strings
    onto copy/unload kwargs (reference snowflake.py:268,339 pass these
    as ``["a=b", ...]``).

    Returns kwargs: ``file_format``, optionally ``delim`` and
    ``copy_options`` / ``compression`` fragments.
    """
    ft = file_type.lower()
    if ft not in _FMT_TYPES:
        raise ValueError(
            f"Invalid file_type. Must be one of {sorted(_FMT_TYPES)}"
        )
    out: dict = {"file_format": ft}
    copy_opts: list[str] = []
    for opt in format_options or []:
        if "=" not in opt:
            raise DBError(f"Malformed format option: {opt!r}")
        name, _, value = opt.partition("=")
        name = name.strip().upper()
        value = value.strip()
        if len(value) >= 2 and value[0] == "'" and value[-1] == "'":
            value = value[1:-1]
        if name == "FIELD_DELIMITER":
            out["delim"] = value
        elif name == "SKIP_HEADER":
            if int(value) > 0:
                copy_opts.append(f"IGNOREHEADER {int(value)}")
        elif name == "COMPRESSION":
            v = value.lower()
            if v in ("gzip", "none", "auto"):
                if v == "gzip":
                    out["compression"] = "gzip"
            else:
                raise DBError(f"Unsupported COMPRESSION: {value!r}")
        else:
            raise DBError(f"Unsupported format option: {opt!r}")
    if copy_opts:
        out["copy_options"] = copy_opts
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
        self._file_formats: dict[str, dict] = {}

    # -- named file formats (reference snowflake.py file_format_name:
    #    "CREATE FILE FORMAT" objects referenced by name) ----------------
    def create_file_format(
        self,
        name: str,
        file_type: str = "csv",
        format_options: list[str] | None = None,
    ) -> None:
        """Register a named file format (Snowflake ``CREATE FILE
        FORMAT`` parity): later ``copy``/``unload`` calls reference it
        via ``file_format_name`` and it overrides file_type +
        format_options, exactly as the reference documents."""
        self._file_formats[name] = _parse_format_options(
            file_type, format_options
        )

    def _resolve_format(
        self,
        file_type: str | None,
        format_options: list[str] | None,
        file_format_name: str,
    ) -> dict | None:
        if file_format_name:
            if file_format_name not in self._file_formats:
                raise DBError(
                    f"Unknown file_format_name: {file_format_name!r} "
                    "(register it with create_file_format)."
                )
            return dict(self._file_formats[file_format_name])
        if file_type is not None or format_options:
            return _parse_format_options(file_type or "csv", format_options)
        return None

    # -- stage transport (reference snowflake.py:213,247; s3.py) ----------
    def _require_stage(self) -> Stage:
        if self._stage is None:
            raise DBError("No stage_root configured for stage transport.")
        return self._stage

    def upload_to_internal(
        self,
        local: str,
        stage: str = "",
        parallel: int = 4,
        auto_compress: bool = True,
        overwrite: bool = True,
    ) -> list[str]:
        """PUT local file(s) to the stage (reference snowflake.py:213:
        ``PUT 'file://local' @stage PARALLEL=n AUTO_COMPRESS=b
        OVERWRITE=b``).  Wildcards in ``local`` upload every match;
        ``parallel`` bounds the transfer thread pool;
        ``auto_compress`` gzips files not already compressed (the
        staged name gains ``.gz``, Snowflake AUTO_COMPRESS semantics —
        Spark reads them back transparently); ``overwrite=False``
        leaves an existing staged file untouched (Snowflake reports
        such files as SKIPPED).  Returns the staged paths in match
        order."""
        import glob as _glob
        import os
        import tempfile

        from locopy_spark.utility import compress_file

        st = self._require_stage()
        matches = sorted(_glob.glob(local)) or [local]

        def put_one(path: str) -> str:
            src, name = path, os.path.basename(path)
            tmp = None
            if auto_compress and not name.endswith(
                (".gz", ".bz2", ".zst", ".br", ".parquet", ".orc")
            ):
                fd, tmp = tempfile.mkstemp(suffix=".gz")
                os.close(fd)
                compress_file(path, tmp)
                src, name = tmp, name + ".gz"
            key = os.path.join(stage, name) if stage else name
            try:
                dest = st._dest(key)
                if not overwrite and os.path.exists(dest):
                    return dest  # OVERWRITE=FALSE → SKIPPED
                return st.upload(src, key)
            finally:
                if tmp is not None:
                    os.unlink(tmp)

        if parallel > 1 and len(matches) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(int(parallel), len(matches))
            ) as ex:
                return list(ex.map(put_one, matches))
        return [put_one(p) for p in matches]

    def download_from_internal(
        self, stage: str, local: str = ".", parallel: int = 10
    ) -> list[str]:
        """GET stage files matching ``stage`` (reference
        snowflake.py:247: ``GET @stage 'file://local' PARALLEL=n``);
        ``parallel`` is the transfer thread count."""
        return self._require_stage().download(stage, local, parallel=parallel)

    # -- bulk load (reference redshift.py:193; snowflake.py:268) ----------
    def copy(
        self,
        table_name: str,
        path: str,
        delim: str | None = "|",
        copy_options: list[str] | None = None,
        file_format: str = "csv",
        file_type: str | None = None,
        format_options: list[str] | None = None,
        file_format_name: str = "",
        schema=None,
    ) -> DataFrame:
        """COPY files into ``table_name`` (reference redshift.py:193:
        same (table, path, delim, copy_options) argument order; the
        snowflake.py:268 ``file_type``/``format_options``/
        ``file_format_name`` FILE_FORMAT surface is also accepted and,
        as in the reference, a named format overrides the others).

        Redshift copy-option parity (reference redshift.py:219-222):
        a format marker inside ``copy_options`` (``PARQUET``, ``FORMAT
        AS PARQUET``, ``JSON 'auto'``, ...) selects the file format —
        ``copy("t", path, delim=None, copy_options=["PARQUET"])``
        loads parquet — and suppresses the delimited-load default
        options; otherwise the defaults (``DATEFORMAT 'auto'
        COMPUPDATE ON TRUNCATECOLUMNS``) are appended exactly as
        ``add_default_copy_options`` does in the reference.

        Snowflake ``PURGE = TRUE`` (the copy option the reference's
        integration suite passes through — tests/test_integration_sf.py
        test_copy) deletes the staged source files after a successful
        load.  Deleting the sources under a lazy temp view would
        corrupt later reads, so PURGE materializes the load first
        (``localCheckpoint`` — blocks stored, file lineage dropped),
        the Spark analog of Snowflake's eager ``COPY INTO table``."""
        if not self._is_connected():
            raise DBError("No connection object is present.")
        import os

        from locopy_spark.sources.copy import (
            add_default_copy_options,
            detect_format_option,
        )

        purge = False
        if copy_options:
            kept, purge_seen = [], 0
            for opt in copy_options:
                toks = opt.replace("=", " ").upper().split()
                if toks and toks[0] == "PURGE":
                    purge_seen += 1
                    if purge_seen > 1:
                        raise DBError(
                            "Duplicate PURGE option in copy_options: "
                            f"{opt!r}"
                        )
                    if len(toks) != 2 or toks[1] not in ("TRUE", "FALSE"):
                        raise DBError(
                            f"Malformed PURGE option: {opt!r} "
                            "(expected PURGE = TRUE|FALSE)"
                        )
                    purge = toks[1] == "TRUE"
                else:
                    kept.append(opt)
            copy_options = kept
        purge_keys: list[str] = []
        if purge:
            # fail fast: PURGE needs the stage transport AND every
            # load path must live under the stage root — discovering
            # either AFTER a successful load would leave the caller
            # with a loaded table, an error, and (worse, silently)
            # staged data it believes was purged
            import glob as _glob

            st = self._require_stage()
            for p in path if isinstance(path, list) else [path]:
                for m in _glob.glob(p) or [p]:
                    key = os.path.relpath(m, st.root)
                    if key.startswith(".."):
                        raise DBError(
                            f"PURGE = TRUE but load path {m!r} is outside "
                            f"the stage root {st.root!r}; the stage "
                            "transport cannot purge it"
                        )
                    purge_keys.append(key)
        fmt = self._resolve_format(file_type, format_options, file_format_name)
        if fmt is not None:
            file_format = fmt.get("file_format", file_format)
            delim = fmt.get("delim", delim)
            copy_options = list(copy_options or []) + fmt.get(
                "copy_options", []
            )
        marker = detect_format_option(copy_options)
        if marker is not None:
            file_format = marker
        else:
            copy_options = add_default_copy_options(
                list(copy_options or [])
            )
        result = copy_files(
            self.spark,
            path,
            table_name,
            delim=delim,
            file_format=file_format,
            copy_options=copy_options,
            schema=schema,
            materialize=purge,
        )
        if purge:
            # keys were glob-expanded and root-validated BEFORE the
            # copy (see above) — a failure here would otherwise strand
            # staged data after a successful load
            st = self._require_stage()
            for key in purge_keys:
                if os.path.exists(st._dest(key)):
                    st.delete(key)
        return result

    def load_and_copy(
        self,
        local_file: str,
        stage_folder: str,
        table_name: str,
        delim: str | None = "|",
        copy_options: list[str] | None = None,
        delete_stage_after: bool = False,
        splits: int = 1,
        compress: bool = True,
        schema=None,
    ) -> DataFrame:
        """Local file → stage → COPY (reference redshift.py:235
        load_and_copy: split, compress, upload, then load — same
        parameter semantics: ``splits`` breaks the file for parallel
        load, ``compress`` gzips each part, ``delete_stage_after``
        (reference ``delete_s3_after``) removes the staged artifacts
        once loaded). The stage hop is real file transport (so the
        staged artifact exists for audit/replay), then Spark reads it
        directly — splits simply become input partitions.

        ``schema`` (DDL string or StructType) plays the role of the
        reference flow's preceding ``CREATE TABLE (id INTEGER, ...)``:
        the integration suite always creates the typed target before
        COPY (tests/test_integration.py:102-104) and the load adopts
        its column names and types — here the reader does."""
        import os
        from pathlib import Path

        from locopy_spark.utility import get_ignoreheader_number, split_file

        opts = list(copy_options or [])
        # reference redshift.py:309-324: an IGNOREHEADER option is
        # honored by stripping the header rows DURING the split (each
        # part must not lose its own first line to a per-file skip),
        # after which the option is removed; a directory input uploads
        # every file under it unsplit (parquet-folder loads)
        ignore_header = get_ignoreheader_number(opts)
        lp = Path(local_file)
        if lp.is_dir():
            # Spark listing rules: _SUCCESS/.crc markers are skipped;
            # each file keeps its directory-relative subpath so
            # same-named part files in different partition dirs
            # (year=1/part-0000, year=2/part-0000) cannot collide
            parts = [
                x
                for x in sorted(lp.glob("**/*"))
                if x.is_file() and not x.name.startswith(("_", "."))
            ]
            did_split = False
        else:
            parts = split_file(
                local_file, local_file, splits=splits, ignore_header=ignore_header
            )  # splits == 1 → [local_file] untouched
            did_split = splits > 1
        if did_split and ignore_header > 0:
            opts = [
                i for i in opts if not i.upper().startswith("IGNOREHEADER")
            ]
        staged: list[str] = []
        for p in parts:
            if isinstance(p, Path):
                sub = os.path.dirname(os.path.relpath(p, lp))
                dest = os.path.join(stage_folder, sub) if sub else stage_folder
                p = str(p)
            else:
                dest = stage_folder
            staged += self.upload_to_internal(
                p, dest, auto_compress=compress
            )
        if delete_stage_after:
            # same semantics as Snowflake PURGE: materialize the load,
            # then drop the staged artifacts (reference redshift.py:235
            # delete_s3_after deletes only after a successful COPY)
            opts.append("PURGE = TRUE")
        try:
            return self.copy(
                table_name,
                staged,
                delim=delim,
                copy_options=opts,
                schema=schema,
            )
        finally:
            if did_split:
                for p in parts:
                    if os.path.exists(p):
                        os.remove(p)

    # -- bulk export (reference redshift.py:349,443; snowflake.py:339) ----
    def unload(
        self,
        query: str,
        path: str,
        unload_options: list[str] | None = None,
        file_type: str | None = None,
        format_options: list[str] | None = None,
        file_format_name: str = "",
        header: bool | None = None,
    ) -> DataFrame:
        """UNLOAD ``query`` results to files under ``path`` (reference
        redshift.py:443: same (query, path, options) argument order;
        the snowflake.py:339 FILE_FORMAT surface is also accepted)."""
        if not self._is_connected():
            raise DBError("No connection object is present.")
        kwargs = _parse_unload_options(unload_options)
        fmt = self._resolve_format(file_type, format_options, file_format_name)
        if fmt is not None:
            kwargs.setdefault("file_format", fmt.get("file_format", "csv"))
            if "delim" in fmt:
                kwargs.setdefault("delim", fmt["delim"])
            if "compression" in fmt:
                kwargs.setdefault("compression", fmt["compression"])
        if header is not None:
            kwargs["header"] = header
        return _unload(self.spark, query, path, **kwargs)

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
