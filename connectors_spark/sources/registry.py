"""Source readers: the Spark mapping of the reference's 30+ connectors.

The reference registers data sources by FQN string and streams documents
per record (reference: app/connectors_service/connectors/config.py:118-150
registry; libs/connectors_sdk/connectors_sdk/source.py:592-617 get_docs).
On Spark each source class collapses to a reader returning a DataFrame —
pagination (S4), prefix listings (S7) and time windows (S9) become
partitioning/pushdown concerns the planner owns:

| reference source            | reader here                  | notes |
|-----------------------------|------------------------------|-------|
| S1 full scan                | read_parquet / read_table    | |
| S3 directory (glob + stat)  | read_binary_glob             | binaryFile: path, length, modificationTime, content |
| S4/S5 RDBMS page-scan       | read_jdbc                    | numPartitions/partitionColumn replace LIMIT/OFFSET paging |
| S7 object-store listing     | read_binary_glob over s3a:// | pathGlobFilter = extension filter |
| S9 time-windowed API scan   | read_time_window             | partition-pruned ts predicate |
| S2/S10 incremental          | operators.sync.incremental_extract / streaming.incremental |
| S8 cursor-paginated API     | sources/paged.py read_paged    | sequential pull (cursor APIs admit no parallelism), spill-bounded, cursor-checkpointed resume |

Registered by name like the reference's config registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_READERS: dict[str, Callable[..., DataFrame]] = {}


def register_source(name: str):
    def deco(fn):
        _READERS[name] = fn
        return fn
    return deco


def get_source(name: str) -> Callable[..., DataFrame]:
    """FQN-style lookup (reference: connectors/utils.py:932-944
    get_source_klass)."""
    try:
        return _READERS[name]
    except KeyError:
        raise KeyError(
            f"unknown source {name!r}; registered: {sorted(_READERS)}"
        ) from None


@register_source("parquet")
def read_parquet(spark: SparkSession, path: str, **_) -> DataFrame:
    return spark.read.parquet(path)


@register_source("json")
def read_json(spark: SparkSession, path: str, schema=None, **_) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


@register_source("csv")
def read_csv(spark: SparkSession, path: str, schema=None, **_) -> DataFrame:
    r = spark.read.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


@register_source("binary_glob")
def read_binary_glob(spark: SparkSession, path: str,
                     glob: str | None = None, **_) -> DataFrame:
    """Directory/object-store scan (S3/S7): stat metadata + content,
    extension filtering via pathGlobFilter (reference: app/
    connectors_service/connectors/sources/directory/datasource.py:81-114,
    sources/s3/datasource.py:74-110)."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


@register_source("jdbc")
def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None, num_partitions: int = 8,
              lower_bound=None, upper_bound=None, **opts) -> DataFrame:
    """RDBMS scan (S4): Spark partition-parallelism replaces the
    reference's ORDER BY pk LIMIT/OFFSET page loop (reference: app/
    connectors_service/connectors/sources/postgresql/queries.py:35-37,
    fetch_size=50 client.py:24). No JDBC driver ships in this sandbox;
    the reader is exercised against file-backed tables in tests via the
    same option surface."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        r = (r.option("partitionColumn", partition_column)
             .option("numPartitions", num_partitions)
             .option("lowerBound", str(lower_bound))
             .option("upperBound", str(upper_bound)))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def read_time_window(source: DataFrame, lo, hi, ts_col: str = "ts") -> DataFrame:
    """S9: time-windowed scan — a partition-prunable predicate
    (reference: app/connectors_service/connectors/sources/slack/
    datasource.py:97-121 oldest/latest window)."""
    return source.filter(F.col(ts_col).between(F.lit(lo), F.lit(hi)))
