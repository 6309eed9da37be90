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
from locopy_spark.logger import get_logger
from locopy_spark.utility import get_ignoreheader_number, get_maxerror_number

logger = get_logger(__name__)

_DEFAULT_DATEFORMAT = "yyyy-MM-dd"
_DEFAULT_TIMEFORMAT = "yyyy-MM-dd HH:mm:ss"
_CORRUPT_COL = "_corrupt_record"

# Redshift COPY option grammar (reference: locopy passes copy_options
# verbatim to the warehouse — redshift.py:282).  First-word → class:
#   semantic  — changes what this engine reads (parsed elsewhere in
#               copy_files: IGNOREHEADER, MAXERROR, DATEFORMAT,
#               TIMEFORMAT, DELIMITER) or names the file format
#   hint      — warehouse-side load tuning with no Spark analog
#               (accepted pass-through, logged at debug): column
#               compression analysis, stats, varchar truncation, ...
#   codec     — compression markers; Spark decodes these natively by
#               file extension, so they are accepted as assertions
# Anything else logs a WARNING (the reference would surface a grammar
# error from the warehouse; we surface it in the log, not silently).
_SEMANTIC_COPY_OPTIONS = {
    "IGNOREHEADER", "MAXERROR", "DATEFORMAT", "TIMEFORMAT", "DELIMITER",
    "FORMAT", "PARQUET", "JSON", "ORC", "AVRO", "CSV",
}
_HINT_COPY_OPTIONS = {
    "COMPUPDATE", "STATUPDATE", "TRUNCATECOLUMNS", "ACCEPTINVCHARS",
    "ACCEPTANYDATE", "BLANKSASNULL", "EMPTYASNULL", "TRIMBLANKS",
    "FILLRECORD", "ROUNDEC", "ESCAPE", "REMOVEQUOTES", "NULL",
    "ENCODING", "EXPLICIT_IDS", "COMPROWS", "REGION", "ENCRYPTED",
}
_CODEC_COPY_OPTIONS = {"GZIP", "BZIP2", "ZSTD", "LZOP"}

_FORMAT_MARKERS = {
    "PARQUET": "parquet", "JSON": "json", "ORC": "orc",
    "AVRO": "avro", "CSV": "csv",
}


def combine_copy_options(copy_options: list[str]) -> str:
    """Join COPY options into one SQL fragment
    (reference: locopy/redshift.py:74 ``combine_copy_options``)."""
    return " ".join(copy_options)


def classify_copy_options(
    copy_options: list[str] | None,
) -> tuple[list[str], list[str], list[str]]:
    """Split a COPY option list into (semantic, hints, unknown) by the
    Redshift grammar above; one WARNING per unknown option.  Lets
    ``copy_files`` accept the reference's full pass-through surface
    (test_redshift.py's permutations) without silently eating typos."""
    semantic: list[str] = []
    hints: list[str] = []
    unknown: list[str] = []
    for opt in copy_options or []:
        first = opt.strip().split(" ", 1)[0].upper() if opt.strip() else ""
        if first in _SEMANTIC_COPY_OPTIONS:
            semantic.append(opt)
        elif first in _HINT_COPY_OPTIONS or first in _CODEC_COPY_OPTIONS:
            hints.append(opt)
        else:
            unknown.append(opt)
            logger.warning(
                "COPY option %r is not recognized by this engine; "
                "accepted as pass-through (the reference would forward "
                "it to the warehouse verbatim)", opt,
            )
    if hints:
        logger.debug("COPY tuning hints accepted (no Spark analog): %s",
                     hints)
    return semantic, hints, unknown


def detect_format_option(copy_options: list[str] | None) -> str | None:
    """Return the file format named inside ``copy_options`` when
    present (Redshift forms: ``PARQUET`` / ``FORMAT AS PARQUET`` /
    ``FORMAT PARQUET`` / ``JSON 'auto'`` / ``CSV``), else None.
    Reference parity: ``Redshift.copy(..., delim=None,
    copy_options=["PARQUET"])`` loads parquet
    (reference: locopy/redshift.py:219 special-cases PARQUET)."""
    for opt in copy_options or []:
        toks = opt.strip().upper().split()
        if not toks:
            continue
        if toks[0] in _FORMAT_MARKERS:
            return _FORMAT_MARKERS[toks[0]]
        if toks[0] == "FORMAT":
            rest = toks[2:] if len(toks) > 2 and toks[1] == "AS" else toks[1:]
            if rest and rest[0] in _FORMAT_MARKERS:
                return _FORMAT_MARKERS[rest[0]]
    return None


# Redshift datetime-format tokens → Java SimpleDateTimeFormatter
# (longest-first so MON doesn't half-match inside MONTH etc.)
_RS_TIME_TOKENS = [
    ("YYYY", "yyyy"), ("YY", "yy"), ("MON", "MMM"), ("MM", "MM"),
    ("DD", "dd"), ("HH24", "HH"), ("HH12", "hh"), ("HH", "HH"),
    ("MI", "mm"), ("SS", "ss"), ("AM", "a"), ("PM", "a"),
]


def redshift_dateformat_to_java(fmt: str) -> str:
    """Translate a Redshift DATEFORMAT/TIMEFORMAT pattern
    (``'MM/DD/YYYY'`` grammar, case-insensitive tokens) to the Java
    pattern Spark's csv reader expects.  ``auto`` maps to the engine
    defaults."""
    out: list[str] = []
    i, up = 0, fmt.upper()
    while i < len(up):
        for tok, java in _RS_TIME_TOKENS:
            if up.startswith(tok, i):
                out.append(java)
                i += len(tok)
                break
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def get_dateformat(options: list[str] | None, keyword: str = "DATEFORMAT") -> str | None:
    """Extract a ``DATEFORMAT [AS] 'fmt'`` / ``TIMEFORMAT [AS] 'fmt'``
    value from a COPY option list, translated to the Java pattern; None
    when absent or ``'auto'`` (reference: redshift.py:47 defaults
    ``DATEFORMAT 'auto'``)."""
    for opt in options or []:
        toks = opt.strip().split()
        if toks and toks[0].upper() == keyword:
            val = toks[-1].strip()
            if len(val) >= 2 and val[0] == "'" and val[-1] == "'":
                val = val[1:-1]
            if val.lower() in ("auto", "epochsecs", "epochmillisecs"):
                return None
            return redshift_dateformat_to_java(val)
    return None


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

    def one_file(f: str):
        if "," in f:
            # sc.textFile splits its path string on commas BEFORE any
            # unescaping (a comma-named file becomes two bogus paths),
            # so such files go through the DataFrame text source,
            # which takes each path argument verbatim
            lines = spark.read.text(f).rdd.map(lambda r: r[0])
        else:
            lines = sc.textFile(f)
        return (
            lines.zipWithIndex()
            .filter(lambda kv: kv[1] >= n_skip)
            .map(lambda kv: kv[0])
        )

    rdds = [one_file(f) for f in sorted(_leaf_files(spark, path))]
    return sc.union(rdds) if rdds else sc.emptyRDD()


def _leaf_files(spark: SparkSession, path) -> list[str]:
    """Enumerate leaf data files under ``path`` (a file, dir, glob, or
    list thereof) via the Hadoop FileSystem API — metadata-only, no
    data read (a ``spark.read.text`` + ``input_file_name`` scan would
    read every byte just to learn the file list).  Mirrors Spark's own
    listing rules: hidden files (``_``/``.`` prefixes) are skipped.
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    out: list[str] = []
    for p in path if isinstance(path, list) else [path]:
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(hconf)
        statuses = fs.globStatus(hpath)
        if statuses is None:
            continue
        for st in statuses:
            if st.isDirectory():
                for sub in fs.listStatus(st.getPath()):
                    name = sub.getPath().getName()
                    if sub.isFile() and not name.startswith(("_", ".")):
                        out.append(sub.getPath().toString())
            else:
                name = st.getPath().getName()
                if not name.startswith(("_", ".")):
                    out.append(st.getPath().toString())
    return out


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
    materialize: bool = False,
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
    classify_copy_options(opts)  # warn on non-grammar options
    ignore_header = get_ignoreheader_number(opts)
    max_error = get_maxerror_number(opts)
    date_fmt = get_dateformat(opts, "DATEFORMAT") or _DEFAULT_DATEFORMAT
    time_fmt = get_dateformat(opts, "TIMEFORMAT") or _DEFAULT_TIMEFORMAT
    fmt = (detect_format_option(opts) or file_format).lower()
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
                dateFormat=date_fmt,
                timestampFormat=time_fmt,
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
    if materialize:
        # Break lineage to the source files BEFORE registering: the
        # PURGE / delete_stage_after callers delete the staged sources
        # right after the load, and a lazy view would silently re-scan
        # the (now missing) files on first read.  localCheckpoint
        # stores the loaded blocks and drops the file lineage — a lost
        # block then fails loudly instead of re-reading.  Cross-session
        # durability uses temp_view=False (saveAsTable) instead.
        df = df.localCheckpoint(eager=True)
    if temp_view:
        df.createOrReplaceTempView(table_name)
    else:
        df.write.mode(mode).saveAsTable(table_name)
        df = spark.table(table_name)
    return df
