"""JSONL crawl-dump ingestion — the file format web-scale text corpora
actually arrive in (one JSON document per line, usually gzipped; the
Common Crawl/Dolma/RedPajama distribution shape). The reference's only
ingress is protobuf-over-Kafka (`/root/reference/inserter/inserter.go`);
this extends the source tier for the training-data side.

Spark-first: `spark.read.json` with an EXPLICIT schema (never inferred
— inference is a full extra pass over 100 TB and locks in whatever the
first files looked like) in PERMISSIVE mode, with malformed lines
quarantined into a corrupt-record column instead of killing the job —
crawl dumps always contain a few truncated/garbled lines, and a
multi-hour ingest that dies on line 40 billion is operationally
useless. The quarantine frame is returned alongside the clean frame so
the pipeline can count/sample/alert on it (the Deequ-tier contract).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
])


class JsonlDump(NamedTuple):
    """Result of :func:`read_jsonl_documents`. ``raw`` is the CACHED
    parsed frame both views derive from — ``unpersist()`` on a derived
    view is a no-op on the parent, so release storage through
    ``raw.unpersist()`` when done with both views."""
    docs: DataFrame
    quarantine: DataFrame
    raw: DataFrame


def read_jsonl_documents(spark: SparkSession, path: str, *,
                         schema: T.StructType = DOC_SCHEMA,
                         corrupt_col: str = "_corrupt_record"
                         ) -> JsonlDump:
    """Read a JSONL document dump (plain or .gz — Spark decompresses by
    extension). Returns ``JsonlDump(docs, quarantine, raw)``: ``docs``
    has exactly the ``schema`` columns from well-formed lines;
    ``quarantine`` holds the RAW text of every malformed line (one
    ``raw`` column) for counting/inspection; ``raw`` is the cached
    parsed parent — call ``raw.unpersist()`` when done (unpersisting a
    derived view would NOT release it).

    The frame is cached before the corrupt-column split — Spark
    refuses filters that reference only the internal corrupt-record
    column on an uncached frame (the documented `columnNameOfCorrupt
    Record` caveat), and the cache also makes the two returned frames
    share one parse pass.

    Scale: schema is explicit (no inference pass); gzip files are
    NON-SPLITTABLE — one task per .gz file, so shard the dump into
    many files (every public crawl dump already is); parquet-ize early
    and run the pipeline off the parquet, not the JSONL."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField(corrupt_col, T.StringType())])
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corrupt_col)
          .json(path)
          .cache())
    docs = (df.filter(F.col(corrupt_col).isNull())
            .select(*[f.name for f in schema.fields]))
    quarantine = (df.filter(F.col(corrupt_col).isNotNull())
                  .select(F.col(corrupt_col).alias("raw")))
    return JsonlDump(docs, quarantine, df)
