"""COPY — bulk load files into a Spark table/view.

Parity target: the reference's COPY paths (reference:
locopy/redshift.py:193-347 ``copy``/``load_and_copy``,
locopy/snowflake.py:268-337 ``copy``). There, files are compressed,
split, pushed to S3/stage and COPY'd by the warehouse; here Spark IS
the warehouse: ``spark.read`` parallelizes over files/blocks natively,
gzip is decoded inline, IGNOREHEADER maps to the csv header/skip
options, and "splits" are simply input partitions. The COPY-option
strings the reference accepts are parsed for compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from locopy_spark.errors import DBError
from locopy_spark.utility import get_ignoreheader_number, get_maxerror_number

_DEFAULT_DATEFORMAT = "yyyy-MM-dd"
_DEFAULT_TIMEFORMAT = "yyyy-MM-dd HH:mm:ss"
_CORRUPT_COL = "_corrupt_record"


def load_errors_view(table_name: str) -> str:
    """Name of the per-table load-errors view populated by a MAXERROR
    COPY — the engine's analog of Redshift's STL_LOAD_ERRORS."""
    return f"{table_name}__load_errors"


def _apply_maxerror(
    spark: SparkSession, df: DataFrame, table_name: str, max_error: int
) -> DataFrame:
    """Enforce Redshift MAXERROR semantics on a PERMISSIVE csv read:
    rows whose raw line failed schema parsing are counted; beyond
    ``max_error`` the load fails (DBError), otherwise the bad rows are
    dropped from the result and kept queryable in
    ``<table>__load_errors`` (raw line + a reason placeholder), the
    STL_LOAD_ERRORS shape.

    The frame is persisted before the corrupt-column filter — Spark
    requires the raw parse to be materialized before a query can
    reference ONLY the corrupt column (SPARK-38523 semantics), and the
    count + clean split then reuse one scan.
    """
    df = df.cache()
    bad = df.filter(F.col(_CORRUPT_COL).isNotNull())
    n_bad = bad.count()
    if n_bad > max_error:
        df.unpersist()
        raise DBError(
            f"COPY into {table_name} aborted: {n_bad} unparseable rows "
            f"exceed MAXERROR {max_error}"
        )
    bad.select(
        F.col(_CORRUPT_COL).alias("raw_line"),
        F.lit("row failed schema parse").alias("err_reason"),
    ).createOrReplaceTempView(load_errors_view(table_name))
    return df.filter(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)


def _lines_after_header(spark: SparkSession, path, n_skip: int):
    """RDD of csv lines with the first ``n_skip`` lines of EACH file
    removed — the Redshift ``IGNOREHEADER n`` (n > 1) semantics that
    Spark's csv reader (one header line max per file) cannot express
    (reference: locopy/redshift.py:193 passes the option through to
    the warehouse, which skips n lines per file).

    Per file, ``zipWithIndex`` assigns exact in-file line numbers
    (the read itself stays distributed over the file's blocks; the
    index pass adds one small count job per file), so the skip is
    exact regardless of how splits are packed into partitions — a
    ``monotonically_increasing_id`` over the multi-file text read
    would not be, because Spark packs splits by size, not file
    order. Lines transit Python once here, which makes this the
    compat path for legacy multi-line-header files; single-header
    loads (the common case) keep the native JVM csv reader.
    """
    sc = spark.sparkContext
    # enumerate leaf files (handles dirs, globs, .gz transparently)
    files = sorted(
        r.f
        for r in spark.read.text(path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    rdds = [
        sc.textFile(f)
        .zipWithIndex()
        .filter(lambda kv: kv[1] >= n_skip)
        .map(lambda kv: kv[0])
        for f in files
    ]
    return sc.union(rdds) if rdds else sc.emptyRDD()


def add_default_copy_options(copy_options: list[str] | None = None) -> list[str]:
    """Append the reference's default COPY options when absent
    (reference: locopy/redshift.py:47-71)."""
    copy_options = list(copy_options or [])
    default_options = ("DATEFORMAT 'auto'", "COMPUPDATE ON", "TRUNCATECOLUMNS")
    first_words = [o.split()[0].upper() for o in copy_options]
    for option in default_options:
        if option.split()[0] not in first_words:
            copy_options.append(option)
    return copy_options


def copy_files(
    spark: SparkSession,
    path: str | list[str],
    table_name: str,
    delim: str | None = "|",
    file_format: str = "csv",
    copy_options: list[str] | None = None,
    schema=None,
    mode: str = "overwrite",
    temp_view: bool = True,
    reader_options: dict | None = None,
) -> DataFrame:
    """Load file(s) into ``table_name``.

    Parameters mirror the reference ``copy`` (delimiter, options list
    incl. ``IGNOREHEADER n``, gzip transparency); ``file_format`` adds
    the snowflake-style csv/json/parquet choice. With ``temp_view``
    (default) the loaded data is registered as a temp view — zero-copy;
    otherwise it is written to a managed table (``saveAsTable``) for
    cross-session durability.
    """
    opts = copy_options or []
    ignore_header = get_ignoreheader_number(opts)
    max_error = get_maxerror_number(opts)
    fmt = file_format.lower()
    if max_error is not None and (fmt != "csv" or schema is None):
        # Redshift MAXERROR semantics need per-row parse verdicts: only
        # the csv reader in PERMISSIVE mode against an EXPLICIT schema
        # produces them (inferSchema relaxes every column to string and
        # nothing can fail). Fail loud instead of silently ignoring.
        raise DBError(
            "MAXERROR requires file_format='csv' and an explicit schema"
        )
    try:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if reader_options:
            # passthrough for format-specific knobs (mergeSchema,
            # recursiveFileLookup, pathGlobFilter, ...)
            reader = reader.options(**reader_options)
        if fmt == "csv":
            reader = reader.options(
                sep=delim or "|",
                # n>1 headers are stripped below before parsing, so the
                # native single-header option applies only when n == 1
                header=ignore_header == 1,
                inferSchema=schema is None,
                dateFormat=_DEFAULT_DATEFORMAT,
                timestampFormat=_DEFAULT_TIMEFORMAT,
                # gzip etc. handled natively by extension
            )
            if max_error is not None:
                reader = (
                    reader.schema(
                        T.StructType(
                            list(schema.fields)
                            + [T.StructField(_CORRUPT_COL, T.StringType())]
                        )
                    )
                    .option("mode", "PERMISSIVE")
                    .option("columnNameOfCorruptRecord", _CORRUPT_COL)
                )
            if ignore_header > 1:
                # per-file exact n-line skip; the resulting string RDD
                # goes through the same csv parser (all options incl.
                # PERMISSIVE/corrupt-record apply)
                df = reader.csv(
                    _lines_after_header(spark, path, ignore_header)
                )
            else:
                df = reader.csv(path)
        elif fmt == "json":
            df = reader.json(path)
        elif fmt == "parquet":
            df = reader.parquet(*path if isinstance(path, list) else [path])
        elif fmt == "orc":
            df = reader.orc(path)
        elif fmt == "text":
            # raw line-per-row ingestion (column: value) — corpus landing
            df = reader.text(path)
        elif fmt == "xml":
            # native in Spark 4 (SPARK-44265); rowTag defaults to "row",
            # override via reader_options={"rowTag": ...}. Spark reader
            # options are case-INsensitive, so match the user's key that
            # way — a later .option("rowTag", "row") would clobber a
            # user-supplied "rowtag".
            xml_reader = reader.format("xml")
            has_rowtag = reader_options and any(
                k.lower() == "rowtag" for k in reader_options
            )
            if not has_rowtag:
                xml_reader = xml_reader.option("rowTag", "row")
            df = xml_reader.load(path)
        elif fmt == "binaryfile":
            # whole-file payload ingestion (path, modificationTime,
            # length, content binary) — the multimodal landing format;
            # pathGlobFilter via reader_options scopes the scan
            df = reader.format("binaryFile").load(path)
        elif fmt == "avro":
            # built-in but an EXTERNAL module (spark-avro jar) since
            # Spark 2.4: try it — deployments that ship the jar just
            # work — and on the classpath-miss enrich the error with
            # the full resolvable coordinate
            try:
                df = reader.format("avro").load(path)
            except Exception as avro_err:
                if "avro" in str(avro_err).lower():
                    raise ValueError(
                        "file_format='avro' needs the spark-avro package "
                        "on the session classpath, e.g. --packages "
                        "org.apache.spark:spark-avro_2.13:<spark-version>"
                    ) from avro_err
                raise
        else:
            raise ValueError(f"unsupported file_format: {file_format}")
    except Exception as e:
        raise DBError(f"Error loading {path} into {table_name}.") from e
    if fmt == "csv" and max_error is not None:
        # outside the wrapper: a MAXERROR abort is its own diagnosis,
        # not a generic load failure
        df = _apply_maxerror(spark, df, table_name, max_error)
    if temp_view:
        df.createOrReplaceTempView(table_name)
    else:
        df.write.mode(mode).saveAsTable(table_name)
        df = spark.table(table_name)
    return df
