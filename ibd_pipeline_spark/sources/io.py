"""Batch source/sink adapters: parquet / CSV / JSON readers and
writers, partitioned layouts, and bucketed tables.

The reference's only batch I/O is implicit (it has none — Kafka in,
InfluxDB out); these adapters are the engine's storage surface, and
they encode the 100 TB layout decisions:

  * parquet everywhere by default (columnar, predicate/pushdown,
    page indexes);
  * partitionBy(low-cardinality time/tenant column) → partition
    pruning turns full scans into directory lookups;
  * bucketBy(join key) for fact tables joined repeatedly on the same
    key → co-located, shuffle-free sort-merge joins;
  * explicit schemas on read for CSV/JSON (schema inference is a
    full extra pass at scale — never in production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet writer with optional hive-style partitioning. At scale
    pair partitionBy with a pre-repartition on the same columns so
    each task writes one file per partition value, not
    tasks×partitions small files."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """CSV with an explicit schema — inference costs a full scan and
    guesses types; production readers always declare."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed identically on their join key sort-merge-join
    WITHOUT a shuffle — the single biggest join win available at
    100 TB for repeated fact-fact joins (orders ⋈ lineitem on
    orderkey). Bucket count should match target parallelism
    (≈ cluster cores × small multiple)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the columnar alternative when the downstream stack
    is Hive/Presto-flavored. Same pushdown/pruning story as parquet
    (Spark's ORC reader is vectorized and filter-pushing); parquet
    stays this engine's default, ORC exists for interchange."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_assets(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-binary ingestion via the `binaryFile` source — the front
    door for multimodal corpora (images/audio/video land as files, not
    rows). Returns (path, modificationTime, length, content) with
    content as the raw bytes column the operators/multimodal.py
    decoders consume.

    Scale: one row per FILE; Spark parallelizes the listing and each
    task streams its files — no driver-side reads. Filter on `length`
    or path BEFORE decoding: both come from the file metadata, so a
    size gate never opens the blob."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.option("recursiveFileLookup", "true").load(path)


def read_text_docs(spark: SparkSession, path: str, whole: bool = True) -> DataFrame:
    """Raw-text corpus ingestion: whole=True reads ONE DOCUMENT PER
    FILE (the crawl-dump layout — `wholetext` keeps each file a single
    row, path as the natural doc id); whole=False reads one row per
    LINE (JSONL-adjacent layouts). Returns (doc_path, text).

    Scale: wholetext makes a file the unit of parallelism — fine for
    crawl shards (MBs), wrong for one giant file; re-shard upstream
    rather than raising executor memory."""
    from pyspark.sql import functions as F

    # NB: pass wholetext as the text() kwarg — a prior .option() call
    # is ignored by DataFrameReader.text() on this Spark version.
    df = spark.read.text(path, wholetext=whole)
    return df.select(
        F.input_file_name().alias("doc_path"), F.col("value").alias("text")
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema=None,
) -> DataFrame:
    """XML ingestion via Spark 4's NATIVE xml source (no spark-xml
    package needed): one output row per `row_tag` element, nested
    elements as structs/arrays, attributes as `_attr` columns — the
    feed-dump format (sitemaps, RSS/Atom, Wikipedia exports, legacy
    enterprise drops) that crawl pipelines still receive.

    Schema: pass one for production (schema inference reads the data
    TWICE and types drift between drops); inference is fine for
    exploration. Malformed elements follow the same
    mode/columnNameOfCorruptRecord contract as the JSON reader —
    quarantine rather than crash (scalar_json_quarantine is the
    pattern).

    Scale: splittable per FILE (a row boundary can't be detected
    mid-file safely), so parallelism = file count — shard dumps
    upstream like wholetext, never one giant XML."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (native Spark 4 writer) — interchange with XML-ingesting
    consumers; parquet remains the engine-internal format."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).save(path)


def _avro_format(spark: SparkSession) -> str:
    """Resolve the Avro datasource name for THIS classpath, or raise.

    Avro is an EXTERNAL data source module since Spark 2.4: the
    `avro` short name registers via spark-avro's DataSourceRegister
    service file, which plain pip distributions don't ship. Spark
    4.1's spark-sql jar DOES bundle the implementation class itself
    (`org.apache.spark.sql.avro.AvroFileFormat` — verified in this
    container), so when the short name is absent we fall back to the
    fully-qualified class name, which `DataSource.lookupDataSource`
    accepts directly. Probe-don't-assume, same pattern as the Kafka
    connector pin (reference `spark_processor.py:38-41`)."""
    lookup = (
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource
    )
    conf = spark._jsparkSession.sessionState().conf()
    for name in ("avro", "org.apache.spark.sql.avro.AvroFileFormat"):
        try:
            lookup.lookupDataSource(name, conf)
            return name
        except Exception:  # noqa: BLE001 — try the next candidate
            continue
    raise RuntimeError(
        "no Avro datasource on the classpath: spark-avro is an "
        "external module since Spark 2.4 and this distribution also "
        "lacks the bundled AvroFileFormat class — deploy with "
        "--packages org.apache.spark:spark-avro_2.13:<spark version>"
    )


def avro_available(spark: SparkSession) -> bool:
    """True when an Avro datasource resolves (short name or bundled
    class) — see `_avro_format`."""
    try:
        _avro_format(spark)
        return True
    except RuntimeError:
        return False


def read_avro(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    avro_schema_json: str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Avro ingestion (the Kafka-ecosystem interchange format: schema
    registry payloads, Debezium CDC dumps, Hadoop-era archives).
    Datasource resolution is probed (`_avro_format`): `avro` short
    name when spark-avro is deployed, the bundled class name on bare
    pip installs, a clear RuntimeError with the deploy instruction
    otherwise — instead of Spark's opaque
    "Failed to find data source: avro".

    Schema: pass a Spark `schema` for production reads (same contract
    as read_csv/read_json — inference is an extra pass); or pass the
    writer's Avro schema JSON via `avro_schema_json` (`avroSchema`
    option) to get Avro-level schema evolution (field defaults,
    reader-vs-writer resolution) instead of Spark-level casting.

    Malformed-record behavior follows the datasource `mode` option:
    FAILFAST (default — Avro is a binary format; a corrupt block is
    an upstream incident, not a row to quarantine) or PERMISSIVE.

    Scale: Avro is row-oriented and block-splittable, so scans
    parallelize within files, but there is NO column pruning or
    predicate pushdown — land Avro drops into parquet once and query
    the parquet (write_parquet), never query Avro repeatedly."""
    r = spark.read.format(_avro_format(spark)).option("mode", mode)
    if schema is not None:
        r = r.schema(schema)
    if avro_schema_json is not None:
        r = r.option("avroSchema", avro_schema_json)
    return r.load(path)


def write_avro(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Avro sink — interchange with Kafka-ecosystem consumers (schema
    registry, Flink/Hadoop jobs); parquet remains the engine-internal
    format. Same datasource probe as read_avro. Compression: snappy
    (default) / deflate / bzip2 / xz / zstandard / uncompressed."""
    w = (
        df.write.mode(mode)
        .format(_avro_format(df.sparkSession))
        .option("compression", compression)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
