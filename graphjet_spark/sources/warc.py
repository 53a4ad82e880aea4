"""WARC (Web ARChive, ISO 28500) page source and sink.

WARC is the container format of the actual Common Crawl: one file
holds a sequence of length-prefixed records, each a fetched page with
its URL, capture timestamp, and raw payload bytes.  An engine whose
north star is "Common-Crawl-style pages" needs to ingest the format
Common Crawl ships — this connector reads a WARC drop into the
engine's pages shape ``(url, warc_ts, html, lang)`` and exports pages
back out as standards-shaped WARC response records.

Reference analogue: the reference's only ingest surface is a live
JSON tweet stream (reference graphjet-demo/src/main/java/com/twitter/
graphjet/demo/TwitterStreamReader.java:129-160); WARC is the
batch-file equivalent for the web-page domain, alongside the JSONL
(:mod:`graphjet_spark.sources.jsonl`) and edge-list
(:mod:`graphjet_spark.sources.edgelist`) connectors.

Scale shape (100 TB): WARC framing is inherently sequential WITHIN a
file (each record's extent is its ``Content-Length``; there is no
random access), so the unit of parallelism is the FILE — exactly how
every production WARC pipeline (warcio, Common Crawl's own jobs) runs:
Common Crawl ships ~1 GB segments by the tens of thousands, one task
per file.  The reader is ``binaryFile`` scan → Arrow-batched record
splitter (C-level ``bytes.index`` scanning, no per-line regex); the
writer emits one ``.warc`` per partition, partition-parallel.  Record
payloads are arbitrary bytes — framing is length-based, never
delimiter-based, so payloads containing ``\\r\\n\\r\\n`` or invalid
UTF-8 round-trip exactly (pinned by pytest).

Compression: ``compress=True`` / ``.warc.gz`` files use Common
Crawl's actual wire layout — each record its own gzip MEMBER,
members concatenated — so any single record is decompressible
without touching the rest of the file.  Member splitting uses
streaming ``zlib`` decompression (each member's extent is discovered
by decompressing it), never magic-byte scanning, which compressed
payload bytes could spoof.

Commit discipline: the writer stages all part files and publishes the
output with one atomic rename (:mod:`graphjet_spark.sources.
committer`) — a killed job leaves the target path untouched, the
same stage-and-rename contract ``plans/checkpoints.py`` applies to
engine state (kill-mid-write pinned by pytest).
"""

from __future__ import annotations

import gzip
import os
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphjet_spark.sources.committer import commit_staged

_READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_epoch", T.LongType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _iso(epoch: int) -> str:
    return datetime.fromtimestamp(int(epoch), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _record(url: str, epoch: int, payload: bytes, lang: str) -> bytes:
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_iso(epoch)}\r\n"
        f"WARC-Identified-Content-Language: {lang}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def write_warc_pages(
    pages: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compress: bool = False,
) -> None:
    """Export pages ``(url, warc_ts, html, lang)`` as WARC response
    records, one ``.warc`` (or ``.warc.gz``, one gzip member per
    record — Common Crawl's layout) file per partition
    (partition-parallel), published with the stage-and-rename commit
    of :func:`graphjet_spark.sources.committer.commit_staged` — a
    killed job leaves the output path untouched."""
    ext = ".warc.gz" if compress else ".warc"
    sel = pages.select(
        F.col("url"),
        F.col("warc_ts").cast("long").alias("warc_epoch"),
        F.col("html"),
        F.col("lang"),
    )

    def _job(stage: str) -> None:
        os.makedirs(stage, exist_ok=True)

        def _write(idx: int, rows) -> Iterator[int]:
            fn = os.path.join(stage, f"part-{idx:05d}{ext}")
            n = 0
            with open(fn, "wb") as f:
                for r in rows:
                    rec = _record(r.url, r.warc_epoch, bytes(r.html), r.lang)
                    # mtime=0 keeps members deterministic run-to-run
                    f.write(
                        gzip.compress(rec, 6, mtime=0) if compress else rec
                    )
                    n += 1
            if n == 0:
                os.remove(fn)
            yield n

        sel.rdd.mapPartitionsWithIndex(_write).sum()
        # job-level success marker, the Hadoop-committer convention
        open(os.path.join(stage, "_SUCCESS"), "wb").close()

    commit_staged(path, mode, _job)


def _gzip_members(buf: bytes) -> Iterator[bytes]:
    """Decompress a concatenated-gzip-member file one member at a
    time (streaming zlib; each member's extent falls out of its own
    decompression — robust against payload bytes that look like gzip
    magic)."""
    pos, n = 0, len(buf)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(buf[pos:])
        yield out + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:  # trailing garbage that is not a member
            raise ValueError(f"bad gzip member at byte {pos}")
        pos += consumed


def _split_records(buf: bytes) -> Iterator[tuple[str, int, bytes, str]]:
    """Walk one WARC file's bytes by Content-Length framing."""
    pos, n = 0, len(buf)
    while pos < n:
        head_end = buf.index(b"\r\n\r\n", pos)
        fields: dict[str, str] = {}
        for line in buf[pos:head_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body = head_end + 4
        payload = buf[body : body + clen]
        yield (
            fields["warc-target-uri"],
            int(
                datetime.strptime(
                    fields["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
                )
                .replace(tzinfo=timezone.utc)
                .timestamp()
            ),
            payload,
            fields.get("warc-identified-content-language", ""),
        )
        pos = body + clen + 4  # skip the record's trailing \r\n\r\n


def read_warc_pages(
    spark: SparkSession, path: str, *, compress: bool = False
) -> DataFrame:
    """Read a directory of ``.warc`` (or, with ``compress=True``,
    member-gzipped ``.warc.gz``) files into the pages shape
    ``(url, warc_ts timestamp, html binary, lang)`` — one task per
    file (the format's natural parallel unit), record splitting via
    length-based framing so arbitrary payload bytes survive."""
    ext = "*.warc.gz" if compress else "*.warc"
    files = spark.read.format("binaryFile").load(os.path.join(path, ext))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[str, int, bytes, str]] = []
            for buf in pdf["content"]:
                raw = bytes(buf)
                if compress:
                    for member in _gzip_members(raw):
                        out.extend(_split_records(member))
                else:
                    out.extend(_split_records(raw))
            yield pd.DataFrame(
                out, columns=["url", "warc_epoch", "html", "lang"]
            )

    parsed = files.select("content").mapInPandas(_parse, _READ_SCHEMA)
    return parsed.select(
        "url",
        F.timestamp_seconds(F.col("warc_epoch")).alias("warc_ts"),
        "html",
        "lang",
    )
