"""SNAP / WebGraph-ASCII edge-list source and sink.

The standard interchange format for public web and social graphs
(SNAP datasets, LAW ASCII dumps, twitter-2010): one edge per line,
``src<sep>dst[<sep>weight]``, with ``#``-prefixed comment headers and
possibly blank lines.  GraphJet's edge source is a live stream feeding
``addEdge(long left, long right, byte type)`` (reference:
graphjet-demo/src/main/java/com/twitter/graphjet/demo/
TwitterStreamReader.java:129-160 for the stream source,
graphjet-core/src/main/java/com/twitter/graphjet/bipartite/
LeftIndexedMultiSegmentBipartiteGraph.java:144-158 for the typed
append); this connector is the batch-file equivalent so a public web
graph can be dropped into the engine (and the engine's graphs exported
for other tools) without a bespoke loader.

Scale notes: the delimited path reads through Spark's native CSV
reader — splittable (a 1 TB edge file fans out across executors by
HDFS/object-store block), JVM-side parse inside whole-stage codegen,
schema applied at scan so downstream column pruning works.  The
whitespace-agnostic path reads ``spark.read.text`` and splits with a
JVM column expression.  Neither path ever loops over lines in Python.
The writer emits ``concat_ws`` text — one shuffle-free projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: schema fragments for the delimited (CSV-reader) path
_SCHEMA_PLAIN = "src BIGINT, dst BIGINT"
_SCHEMA_WEIGHTED = "src BIGINT, dst BIGINT, weight DOUBLE"


def read_edgelist(
    spark: SparkSession,
    path: str,
    *,
    sep: str | None = "\t",
    weighted: bool = False,
    comment: str = "#",
    on_malformed: str = "drop",
) -> DataFrame:
    """Read a SNAP-style edge list into ``(src, dst[, weight])``.

    ``sep`` of a single character (default TAB) uses the native CSV
    scan; ``sep=None`` means "any run of whitespace" (common in older
    LAW/Pajek-adjacent dumps) and goes through text + JVM split.
    ``on_malformed``: ``"drop"`` discards lines that do not parse into
    the expected arity/types (SNAP headers beyond ``comment`` lines,
    stray text); ``"fail"`` raises on the first such line instead —
    the loud option for curated inputs.
    """
    if on_malformed not in ("drop", "fail"):
        raise ValueError(f"on_malformed must be 'drop' or 'fail': {on_malformed!r}")
    schema = _SCHEMA_WEIGHTED if weighted else _SCHEMA_PLAIN
    n_cols = 3 if weighted else 2
    if sep is not None:
        mode = "DROPMALFORMED" if on_malformed == "drop" else "FAILFAST"
        df = spark.read.csv(path, sep=sep, comment=comment, schema=schema, mode=mode)
        # DROPMALFORMED keeps rows whose FIELDS parse but are null
        # (e.g. a short line yields src with dst NULL); a valid edge
        # needs every column non-null.
        cond = F.col("src").isNotNull() & F.col("dst").isNotNull()
        if weighted:
            cond = cond & F.col("weight").isNotNull()
        return df.filter(cond) if on_malformed == "drop" else df
    # whitespace-agnostic: text scan + split on \s+ (JVM expression)
    lines = (
        spark.read.text(path)
        .filter(~F.col("value").startswith(comment))
        .filter(F.trim("value") != "")
        .select(F.split(F.trim("value"), r"\s+").alias("f"))
    )
    good = lines.filter(F.size("f") == n_cols)
    if on_malformed == "fail":
        # one cheap aggregate; arity errors surface before any compute
        bad = lines.filter(F.size("f") != n_cols).limit(1).count()
        if bad:
            raise ValueError(f"malformed edge-list line under {path}")
    cols = [
        F.element_at("f", 1).cast("bigint").alias("src"),
        F.element_at("f", 2).cast("bigint").alias("dst"),
    ]
    if weighted:
        cols.append(F.element_at("f", 3).cast("double").alias("weight"))
    out = good.select(*cols)
    cond = F.col("src").isNotNull() & F.col("dst").isNotNull()
    if weighted:
        cond = cond & F.col("weight").isNotNull()
    if on_malformed == "fail":
        n_bad = out.filter(~cond).limit(1).count()
        if n_bad:
            raise ValueError(f"non-numeric edge fields under {path}")
        return out
    return out.filter(cond)


def write_edgelist(
    edges: DataFrame,
    path: str,
    *,
    sep: str = "\t",
    weighted: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write ``(src, dst[, weight])`` as delimited text, one edge per
    line — the SNAP interchange shape.  Partition-parallel (one file
    per task, no coalesce: a 100 TB export must not funnel through one
    writer), published stage-and-rename via
    :func:`graphjet_spark.sources.committer.commit_staged` so a killed
    job leaves the output path untouched."""
    from graphjet_spark.sources.committer import commit_staged

    cols = ["src", "dst"] + (["weight"] if weighted else [])
    line = F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])
    sel = edges.select(line.alias("value"))
    commit_staged(path, mode, lambda stage: sel.write.text(stage))
