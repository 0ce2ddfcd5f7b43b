"""File-based sources (SURVEY §2.1 S1-S4, S7).

All scans go through spark.read so Catalyst gets pushdown/pruning for free;
explicit schemas skip inference jobs (an extra full pass over 100 TB inputs
is not acceptable -- the reference already knew this for FDIC bronze,
silverLayer/BuildSilverLayer.py:88-106).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
    corrupt_col: str | None = None,
) -> DataFrame:
    """S1: JSON scan (reference df_from_json, bronzeLayer/BuildBronzeLayer.py:66-77).

    Prefer an explicit schema: schema inference is a separate full scan.

    `corrupt_col` opts into PERMISSIVE corrupt-record capture: malformed
    lines land with their raw text in that column instead of silently
    becoming all-NULL rows -- the source-level twin of the silver layer's
    quarantine discipline (reject rows stay observable). The column must
    be part of `schema` (StringType); filter on it to split clean vs
    quarantine.
    """
    reader = spark.read.option("multiLine", multiline)
    if corrupt_col is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_inferred(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """S2: CSV scan with inferred schema
    (reference csvfile_to_inferred_df, bronzeLayer/BuildBronzeLayer.py:100-113).
    """
    return spark.read.option("inferSchema", True).csv(path, header=header)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    corrupt_col: str | None = None,
) -> DataFrame:
    """S2 variant with a declared contract -- the scale path (no inference
    pass). `corrupt_col` opts into PERMISSIVE corrupt-record capture
    (same contract as read_json): malformed lines keep their raw text in
    that column instead of silently becoming all-NULL rows; the column
    must be a StringType member of `schema`."""
    reader = spark.read
    if corrupt_col is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return reader.schema(schema).csv(path, header=header)


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S3/S4: Parquet scan, optionally under a StructType contract
    (reference BronzeDFs, silverLayer/BuildSilverLayer.py:88-136)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan (columnar interchange beyond the reference's formats).

    Spark's native vectorized ORC reader gets the same Catalyst treatment
    as parquet: predicate pushdown, column pruning, partition pruning.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """Feature probe for the external spark-avro module (same pattern as
    the delta probe in sinks.py): Avro is row-oriented interchange --
    right for Kafka payloads and cross-system handoff, not for analytic
    scans -- and ships outside Spark core since 2.4. Probed once per
    session via the DataSource registry, no job run."""
    try:
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsc.sc().conf()
        )
        return True
    except Exception:  # noqa: BLE001 - missing module surfaces as Py4J error
        return False


def read_avro(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Avro scan behind the module probe. Raises a clear error (instead of
    a deep Py4J trace) where spark-avro is not deployed; this container
    ships without it and installs are disallowed, so the round-trip test
    skip-marks itself exactly like the delta gold test."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro module not deployed; add org.apache.spark:spark-avro "
            "to spark.jars.packages"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("avro").load(path)


_TESTDATA_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one of the driver-generated star-schema tables.

    The resolved DataFrame is memoized per (session, path): the testdata
    dirs are immutable, so re-resolving the scan (file listing + footer
    schema) on every query is pure overhead -- this is what a catalog's
    table resolution does once. DataFrames are immutable plans; sharing
    one across queries is safe.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark refuses by default
    (TIMESTAMP is micros); read it as a long and convert with integer DIV
    (float division loses precision on 1e18-scale nanos). The generated data
    is micro-precision, so the conversion is lossless.
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    key = (spark.sparkContext.applicationId, sf_dir, table)
    cached = _TESTDATA_CACHE.get(key)
    if cached is not None:
        return cached
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = spark.read.parquet(path)
    # Driver-generated parquet has drifted between rounds on timestamp
    # flavor (NANOS, micros-with-UTC, micros-no-tz).  Micros-no-tz arrives
    # as TIMESTAMP_NTZ, which epoch functions (unix_micros & co) reject.
    # Session tz is pinned UTC, so NTZ -> TIMESTAMP is value-identical
    # here and matches how DuckDB reads the same file; normalizing at the
    # catalog boundary keeps every downstream plan type-stable.
    ntz_cols = [c for c, dt in df.dtypes if dt == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    _TESTDATA_CACHE[key] = df
    return df


def testdata_tables(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    names = tables or TESTDATA_TABLES
    return {t: read_testdata(spark, sf_dir, t) for t in names}


def read_text_lines(
    spark: SparkSession, path: str, line_col: str = "text"
) -> DataFrame:
    """Raw-text corpus scan, one row per line (`spark.read.text`): the
    natural shape for line-delimited corpora (one document per line).
    Adds no parsing cost -- rows are the raw bytes split on newlines --
    and the scan parallelizes by file split like any other source. Pair
    with `F.monotonically_increasing_id()` downstream only for
    scratch ids; durable doc ids should hash the content
    (`F.xxhash64(text)`) or carry provenance (`with_file_provenance`)."""
    return spark.read.text(path).withColumnRenamed("value", line_col)


def read_whole_text_files(
    spark: SparkSession, path: str, text_col: str = "text"
) -> DataFrame:
    """One row per FILE (wholetext mode): for corpora stored as
    document-per-file. Each file must fit an executor's task memory --
    at 100 TB this is for the many-small-files layout (crawl dumps,
    scraped pages), not multi-GB archives (those stream through the
    zip/archive source instead)."""
    return spark.read.text(path, wholetext=True).withColumnRenamed(
        "value", text_col
    )


def with_file_provenance(df: DataFrame, col: str = "source_file") -> DataFrame:
    """Attach the originating file path to every row
    (`F.input_file_name` is deprecated in favor of the _metadata
    struct): lineage for corpus rows -- which shard/dump produced a
    document -- without any join. Reads the scan's hidden `_metadata`
    column, so it works on any file-based source and costs nothing."""
    return df.withColumn(col, F.col("_metadata.file_path"))
