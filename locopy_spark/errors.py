"""Error hierarchy.

Mirrors the reference's exception surface (reference:
locopy/errors.py:19-67) so users of the reference can port
``except`` clauses unchanged.
"""


class LocopyError(Exception):
    """Base class for all engine errors."""


class CompressionError(LocopyError):
    """Raised when there is an error compressing or decompressing a file."""


class LocopySplitError(LocopyError):
    """Raised when there is an error splitting an input into parts."""


class LocopyIgnoreHeaderError(LocopyError):
    """Raised when the IGNOREHEADER option cannot be parsed."""


class LocopyConcatError(LocopyError):
    """Raised when there is an error concatenating output files."""


class DBError(LocopyError):
    """Base class for all database (SparkSession/SQL) errors."""


class CredentialsError(DBError):
    """Raised when configuration / credentials are invalid."""


class StageError(LocopyError):
    """Base class for stage (storage transport) errors."""


class StageInitializationError(StageError):
    """Raised when the stage client cannot be initialized."""


class StageCredentialsError(StageError):
    """Raised when stage credentials are invalid."""


class StageUploadError(StageError):
    """Raised when an upload to a stage fails."""


class StageDownloadError(StageError):
    """Raised when a download from a stage fails."""


class StageDeletionError(StageError):
    """Raised when deleting from a stage fails."""


# Aliases keeping the reference's S3-flavored names importable.
S3Error = StageError
S3InitializationError = StageInitializationError
S3CredentialsError = StageCredentialsError
S3UploadError = StageUploadError
S3DownloadError = StageDownloadError
S3DeletionError = StageDeletionError
