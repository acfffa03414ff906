"""JSONL documents source — the de-facto interchange format of
training-data pipelines (one JSON object per line, possibly gzipped;
Spark's json source splits and decompresses per file automatically).

Generalizes the reference's raw-article ingestion (SURVEY §2 S1-S3:
RawArticleInputStream.java) to the format a curation pipeline actually
receives. Corrupt lines are quarantined, never silently dropped: the
reader returns (documents, corrupt) so the pipeline can count/inspect
rejects — the same no-silent-loss contract as the streaming state caps.

Scale notes: schema is supplied explicitly (schema inference re-scans
the input — never at 100 TB); the reader is a plain FileScan, so column
pruning and partition-directory pruning apply as with parquet, though
JSON itself is row-major (convert to parquet/Iceberg with
``sinks.maintenance.compact_parquet`` after ingest — JSONL is the
INGEST format, not the storage format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_JSON_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "_corrupt string"
)


def read_jsonl_documents(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Batch JSONL reader. Returns (documents, corrupt): rows that parse
    land in ``documents`` (doc_id, text, lang, source); raw lines that
    do not land in ``corrupt`` (line string).

    The parsed frame is cached before the split: Spark's PERMISSIVE
    json source forbids selecting ONLY the corrupt-record column from
    the raw scan, and the cache also keeps the two consumers from
    re-reading the input.
    """
    df = (spark.read.schema(DOCUMENTS_JSON_SCHEMA)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(path).cache())
    good = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("line"))
    return good, bad


def read_jsonl_documents_stream(spark: SparkSession, path: str,
                                max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming JSONL reader (continuous ingest). Emits parsed rows
    only; corrupt lines are dropped at the source (streaming cannot
    fork the scan two ways — run the batch reader over the same
    directory for the quarantine audit)."""
    return (spark.readStream.schema(DOCUMENTS_JSON_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .json(path)
            .filter(F.col("_corrupt").isNull()).drop("_corrupt"))
