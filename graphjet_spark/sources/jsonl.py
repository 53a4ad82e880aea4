"""JSONL (newline-delimited JSON) document-corpus source and sink.

JSONL is the de-facto interchange format for LLM training corpora
(C4, Dolma, RedPajama, FineWeb all ship as ``.jsonl`` /
``.jsonl.gz``): one JSON object per line, schema-on-read.  GraphJet's
ingest surface is a live tweet stream (reference:
graphjet-demo/src/main/java/com/twitter/graphjet/demo/
TwitterStreamReader.java:129-160); for the training-data tier of this
engine, the batch-file equivalent is a JSONL drop of documents.  This
connector lets a user point the engine's whole dedup / quality /
selection pipeline at a public JSONL corpus without a bespoke loader,
and export keep-listed corpora back out in the same shape.

Scale notes: Spark's native JSON scan is splittable on uncompressed
files and parallel-per-file on gzip members, parses JVM-side, and
applies the explicit schema at scan (no sampling pass over 100 TB —
``spark.read.json`` without a schema reads everything TWICE).  Corrupt
lines follow the same drop-or-fail contract as the edge-list
connector: ``"drop"`` uses PERMISSIVE + corrupt-record filtering so
one bad crawl line never kills a 1000-executor job, ``"fail"`` uses
FAILFAST for curated inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical documents-table schema (matches testdata documents.parquet)
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType = DOC_SCHEMA,
    on_malformed: str = "drop",
) -> DataFrame:
    """Read a JSONL document corpus with an explicit schema.

    ``on_malformed="drop"`` discards lines that fail to parse as JSON
    or miss the required ``doc_id``/``text`` fields; ``"fail"`` raises
    on the first corrupt line.  Extra JSON keys are ignored by the
    schema projection (standard for heterogeneous crawl dumps).
    """
    if on_malformed not in ("drop", "fail"):
        raise ValueError(f"on_malformed must be 'drop' or 'fail': {on_malformed!r}")
    if on_malformed == "fail":
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return (
        df.filter(F.col(_CORRUPT).isNull())
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .drop(_CORRUPT)
    )


def write_jsonl_docs(
    docs: DataFrame, path: str, *, mode: str = "overwrite"
) -> None:
    """Write a document corpus as JSONL — one JSON object per line,
    partition-parallel (the export of a 100 TB keep-listed corpus must
    not funnel through one writer), published stage-and-rename via
    :func:`graphjet_spark.sources.committer.commit_staged` so a killed
    job leaves the output path untouched."""
    from graphjet_spark.sources.committer import commit_staged

    commit_staged(path, mode, lambda stage: docs.write.json(stage))
