"""Utility functions: config loading, option parsing, local file helpers.

Parity targets: reference locopy/utility.py:49-537. The file-shaping
utilities (split/compress/concatenate) exist here for API parity on
local files, but the Spark-first equivalents live in
``locopy_spark.sources.files`` — on a cluster you shape files by
controlling write partitioning and codecs, not by re-reading bytes.
"""

from __future__ import annotations

import gzip
import os
import shutil
from itertools import cycle
from typing import IO, Union

from locopy_spark.errors import (
    CompressionError,
    CredentialsError,
    DBError,
    LocopyConcatError,
    LocopyIgnoreHeaderError,
    LocopySplitError,
)


def read_config_yaml(config_yaml: Union[str, IO]) -> dict:
    """Read a YAML configuration file (reference: locopy/utility.py:228).

    Returns a dict of options — for us these become Spark conf entries
    or engine parameters rather than DB credentials.
    """
    try:
        import yaml

        if isinstance(config_yaml, str):
            with open(config_yaml) as config:
                parsed = yaml.safe_load(config)
        else:
            parsed = yaml.safe_load(config_yaml)
    except Exception as e:
        raise CredentialsError("Error reading yaml.") from e
    return parsed


def get_ignoreheader_number(options: list[str]) -> int:
    """Return ``number_rows`` from an ``IGNOREHEADER [AS] n`` option
    (reference: locopy/utility.py:511)."""
    ignore = [i for i in options or [] if i.startswith("IGNOREHEADER ")]
    if len(ignore) == 0:
        return 0
    if len(ignore) == 1:
        return int(ignore[0].strip().split(" ")[-1])
    raise LocopyIgnoreHeaderError("Found more than one IGNOREHEADER in the options")


def get_maxerror_number(options: list[str]) -> int | None:
    """Return ``n`` from a Redshift-style ``MAXERROR [AS] n`` option,
    or None when absent. Redshift's COPY continues past up to ``n``
    unparseable rows and fails beyond that; locopy users pass the
    option through ``copy_options`` (reference: locopy/redshift.py:282
    passes options verbatim to the warehouse)."""
    # match the token exactly (first word == MAXERROR) so unrelated
    # options sharing the prefix are not swallowed
    found = [
        i
        for i in options or []
        if (i.strip().split(" ", 1)[0] if i.strip() else "").upper()
        == "MAXERROR"
    ]
    if len(found) == 0:
        return None
    if len(found) > 1:
        raise DBError("Found more than one MAXERROR in the options")
    try:
        return int(found[0].strip().split(" ")[-1])
    except ValueError as e:
        raise DBError(
            f"Could not parse MAXERROR count from option {found[0]!r}"
        ) from e


def write_file(data, delimiter: str, filepath: str, mode: str = "w") -> None:
    """Write rows (list of lists) to a delimited file
    (reference: locopy/utility.py:49)."""
    with open(filepath, mode) as f:
        for row in data:
            f.write(delimiter.join(str(r) for r in row) + "\n")


def compress_file(input_file: str, output_file: str) -> None:
    """Gzip a file (reference: locopy/utility.py:82)."""
    try:
        with open(input_file, "rb") as f_in, gzip.open(output_file, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
    except Exception as e:
        raise CompressionError("Error compressing the file.") from e


def compress_file_list(file_list: list[str]) -> list[str]:
    """Gzip each file in the list, removing originals
    (reference: locopy/utility.py:101)."""
    out = []
    for f in file_list:
        gz = f"{f}.gz"
        compress_file(f, gz)
        os.remove(f)
        out.append(gz)
    return out


def split_file(
    input_file: str, output_file: str, splits: int = 1, ignore_header: int = 0
) -> list[str]:
    """Round-robin split a file by lines (reference: locopy/utility.py:123).

    On a cluster you'd let Spark read the single file and repartition;
    this exists for local parity and for feeding split inputs to
    ``copy_files``.
    """
    if type(splits) is not int or splits <= 0:
        raise LocopySplitError("Number of splits must be greater than zero and an integer.")
    if splits == 1:
        return [input_file]
    files = []
    try:
        pool = list(range(splits))
        cpool = cycle(pool)
        files = [open(f"{output_file}.{x}", "wb") for x in pool]  # noqa: SIM115
        with open(input_file, "rb") as f_in:
            for _ in range(ignore_header):
                next(f_in)
            for line in f_in:
                files[next(cpool)].write(line)
        for fh in files:
            fh.close()
        return [fh.name for fh in files]
    except Exception as e:
        for fh in files:
            fh.close()
            if os.path.exists(fh.name):
                os.remove(fh.name)
        raise LocopySplitError("Error splitting the file.") from e


def concatenate_files(input_list: list[str], output_file: str, remove: bool = True) -> None:
    """Concatenate files into one (reference: locopy/utility.py:192)."""
    if len(input_list) == 0:
        raise LocopyConcatError("Input list is empty.")
    try:
        with open(output_file, "ab") as main_f:
            for f in input_list:
                with open(f, "rb") as temp_f:
                    shutil.copyfileobj(temp_f, main_f)
                if remove:
                    os.remove(f)
    except Exception as e:
        raise LocopyConcatError("Error concatenating files.") from e


class ProgressPercentage:
    """Byte-progress callback for stage uploads/downloads.

    Parity target: reference locopy/utility.py:473 ``ProgressPercentage``
    (the boto3 S3Transfer callback protocol: constructed with a
    filename, invoked repeatedly with byte deltas). Thread-safe so a
    multipart transfer's worker threads can share one instance;
    ``Stage.upload``/``download`` accept it as their ``callback``.
    """

    def __init__(self, filename: str):
        import os
        import threading

        self._filename = filename
        self._size = float(os.path.getsize(filename)) or 1.0
        self._seen_so_far = 0
        self._lock = threading.Lock()

    def __call__(self, bytes_amount: int) -> None:
        import sys

        with self._lock:
            self._seen_so_far += bytes_amount
            pct = (self._seen_so_far / self._size) * 100
            sys.stdout.write(
                f"\r{self._filename}  {self._seen_so_far} / "
                f"{self._size:.0f}  ({pct:.2f}%)"
            )
            sys.stdout.flush()
