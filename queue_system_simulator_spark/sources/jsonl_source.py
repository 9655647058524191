"""JSONL (JSON Lines) source/sink — the lingua franca of LLM corpora.

Training-data pipelines interchange documents as newline-delimited JSON
(one object per line: The Pile, RedPajama, Dolma all ship this shape).
Spark's native json reader IS a JSONL reader (one object per line is the
default; ``multiLine`` is the special case), so both directions stay fully
JVM-side and splittable: a 100 TB JSONL prefix fans out by HDFS/S3 block
with no Python in the scan path.

Malformed-line policy mirrors ``csv_source``'s A3 semantics (reference
``/root/reference/src/csv_parser.py:62-75``, row-numbered cast errors):
PERMISSIVE mode + ``_corrupt_record`` captures bad lines as data instead
of failing the job, and ``read_documents_jsonl`` splits them into a
separate frame the caller can count/log/quarantine.

Scale notes: schema is always pinned (never inferred — inference is a
full extra pass over 100 TB); compression for the sink defaults to gzip
per-file (splittable-enough via many files, universal for JSONL
consumers); ``maxRecordsPerFile`` bounds file sizes without a shuffle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The documents-table contract (TESTDATA.md): one text document with
#: language/source metadata, ready for the curation operators.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame, Callable[[], None]]:
    """Read a JSONL corpus -> (good rows, corrupt lines, release).

    Good rows carry exactly ``schema``'s columns; corrupt lines come back
    as one string column ``raw`` for quarantine.  Spark requires the
    corrupt-record column to be cached/materialized separately from the
    data columns (the parser only fills it when a line fails), hence the
    two-frame contract rather than a mixed frame.

    The shared scan is ``cache()``d so one pass serves both frames; call
    ``release()`` once good/bad are materialized (written, counted) to
    unpersist it — long-lived sessions doing many reads would otherwise
    accumulate cached blocks (ADVICE r2).
    """
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .cache()  # one scan serves both frames; tiny vs re-reading
    )
    good = raw.filter(F.col(_CORRUPT).isNull()).select(
        *[f.name for f in schema.fields]
    )
    bad = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )

    def release() -> None:
        raw.unpersist()

    return good, bad, release


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    max_records_per_file: int | None = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as JSONL, one object per line, optionally gzipped."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.json(path)
