"""TSV ingestion with externally-declared schemas (SURVEY.md §2.A3-A4).

The reference ships headerless GeoNames dumps and prepends fixed header
rows from config files (download.sh:117-125,188-196); SPARQL-Anything then
treats '' as NULL (places.rq:49).  Spark equivalent: explicit StructType
per source — never inferSchema — with ``nullValue=''`` and tab delimiter.
Chunking (CHUNK_SIZE=1M rows, download.sh:12) maps to Spark file-split
partitioning (`spark.sql.files.maxPartitionBytes`) — built in, nothing to
implement.

Container formats: Spark reads gzip/bzip2/zstd TSV natively (codec by
extension).  The reference's raw inputs are ZIP archives
(download.sh:62-83), which Spark does NOT read — moot while external
fetch (A1) is out of scope per the brief; a real deployment unzips at
ingest (the reference does exactly that, once, before any processing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# config/headers-gn.csv:1 — the 19 dump columns + derived adm1/adm2/bestName
FEATURES_SCHEMA = T.StructType([
    T.StructField("geonameid", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("asciiname", T.StringType()),
    T.StructField("alternatenames", T.StringType()),
    T.StructField("latitude", T.DoubleType()),
    T.StructField("longitude", T.DoubleType()),
    T.StructField("feature_class", T.StringType()),
    T.StructField("feature_code", T.StringType()),
    T.StructField("country_code", T.StringType()),
    T.StructField("cc2", T.StringType()),
    T.StructField("admin1_code", T.StringType()),
    T.StructField("admin2_code", T.StringType()),
    T.StructField("admin3_code", T.StringType()),
    T.StructField("admin4_code", T.StringType()),
    T.StructField("population", T.LongType()),
    T.StructField("elevation", T.IntegerType()),
    T.StructField("dem", T.IntegerType()),
    T.StructField("timezone", T.StringType()),
    T.StructField("modification_date", T.DateType()),
    T.StructField("adm1", T.StringType()),
    T.StructField("adm2", T.StringType()),
    T.StructField("bestName", T.StringType()),
])

# config/headers-alternateNamesV2.csv:1 (rows padded to 10 fields,
# download.sh:110-111 — a fixed schema makes the padding implicit)
ALT_NAMES_SCHEMA = T.StructType([
    T.StructField("alternateNameId", T.LongType()),
    T.StructField("geonameid", T.LongType()),
    T.StructField("isolanguage", T.StringType()),
    T.StructField("alternateName", T.StringType()),
    T.StructField("isPreferredName", T.StringType()),
    T.StructField("isShortName", T.StringType()),
    T.StructField("isColloquial", T.StringType()),
    T.StructField("isHistoric", T.StringType()),
    T.StructField("valid_from", T.StringType()),
    T.StructField("valid_to", T.StringType()),
])

# config/headers-hierarchy.csv:1
HIERARCHY_SCHEMA = T.StructType([
    T.StructField("parentId", T.LongType()),
    T.StructField("childId", T.LongType()),
    T.StructField("type", T.StringType()),
])


def read_tsv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = False) -> DataFrame:
    """Reference-faithful TSV scan: tab-delimited, '' == NULL, explicit
    schema, optional header row.  Handles .gz/.bz2 transparently (A2)."""
    return spark.read.csv(
        path, sep="\t", schema=schema, header=header,
        nullValue="", emptyValue="", mode="PERMISSIVE",
    )


def write_tsv(df: DataFrame, path: str, header: bool = False) -> None:
    df.write.mode("overwrite").csv(
        path, sep="\t", header=header, nullValue="", emptyValue=""
    )
