"""locopy_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capability surface of the reference ETL client
(capitalone/locopy: SQL execution, bulk COPY/UNLOAD, stage transport,
dataframe insert, schema inference) with Spark itself as the warehouse,
and adds the analytics + LLM-data-pipeline operators such an engine
serves at 100 TB scale.
"""

from locopy_spark.database import Database
from locopy_spark.errors import (
    CompressionError,
    CredentialsError,
    DBError,
    LocopyConcatError,
    LocopyError,
    LocopyIgnoreHeaderError,
    LocopySplitError,
    StageError,
)
from locopy_spark.session import get_spark
from locopy_spark.sources.stage import Stage
from locopy_spark.warehouse import Redshift, Snowflake, Warehouse

# reference export name (locopy/__init__.py exports S3)
S3 = Stage

__all__ = [
    "Database",
    "Warehouse",
    "Redshift",
    "Snowflake",
    "S3",
    "Stage",
    "get_spark",
    "LocopyError",
    "DBError",
    "CredentialsError",
    "CompressionError",
    "LocopySplitError",
    "LocopyConcatError",
    "LocopyIgnoreHeaderError",
    "StageError",
]

__version__ = "0.1.0"
