"""WARC connector: length-framed record round-trips.

The framing must be Content-Length-based, never delimiter-based —
pinned here by payloads that contain the record separator bytes
themselves and invalid UTF-8.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphjet_spark.sources.warc import (
    _record,
    _split_records,
    read_warc_pages,
    write_warc_pages,
)


def test_split_records_is_length_framed():
    """A payload containing \\r\\n\\r\\n and non-UTF-8 bytes survives
    because the splitter walks Content-Length, not separators."""
    nasty = b"<html>\r\n\r\nmid-record separator \xff\x00\xfe</html>"
    buf = _record("https://a.example/x", 1767225600, nasty, "en") + _record(
        "https://b.example/y", 1767225605, b"", "de"
    )
    recs = list(_split_records(buf))
    assert [(r[0], r[1], r[3]) for r in recs] == [
        ("https://a.example/x", 1767225600, "en"),
        ("https://b.example/y", 1767225605, "de"),
    ]
    assert recs[0][2] == nasty
    assert recs[1][2] == b""


def test_warc_write_read_roundtrip(spark, tmp_path):
    """Distributed round-trip: pages out as .warc files, back through
    binaryFile + the Arrow splitter, every column exact (binary html
    compared byte-for-byte, timestamps to the second)."""
    rows = [
        ("https://h0.example.org/a", 1767225600, b"plain body", "en"),
        (
            "https://h1.example.org/b",
            1767225777,
            b"bin\r\n\r\n\xff\x00tail",
            "de",
        ),
        ("https://h2.example.org/c", 1767300000, b"", "und"),
    ]
    pages = spark.createDataFrame(
        [(u, e, h, lg) for u, e, h, lg in rows],
        "url string, warc_epoch long, html binary, lang string",
    ).select(
        "url",
        F.timestamp_seconds("warc_epoch").alias("warc_ts"),
        "html",
        "lang",
    )
    dest = str(tmp_path / "warc_out")
    write_warc_pages(pages, dest)
    assert any(f.endswith(".warc") for f in os.listdir(dest))

    back = read_warc_pages(spark, dest).withColumn(
        "epoch", F.col("warc_ts").cast("long")
    )
    got = {
        r["url"]: (r["epoch"], bytes(r["html"]), r["lang"])
        for r in back.collect()
    }
    assert got == {u: (e, h, lg) for u, e, h, lg in rows}


def test_warc_gz_member_roundtrip(spark, tmp_path):
    """Common-Crawl layout: one gzip MEMBER per record, members
    concatenated.  The member splitter must recover every record even
    when a compressed payload embeds gzip magic bytes."""
    rows = [
        ("https://h0.example.org/a", 1767225600, b"\x1f\x8b\x08 fake magic inside", "en"),
        ("https://h1.example.org/b", 1767225605, b"x" * 5000, "fr"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_epoch long, html binary, lang string"
    ).select(
        "url",
        F.timestamp_seconds("warc_epoch").alias("warc_ts"),
        "html",
        "lang",
    )
    dest = str(tmp_path / "warcgz_out")
    write_warc_pages(pages, dest, compress=True)
    assert any(f.endswith(".warc.gz") for f in os.listdir(dest))

    back = read_warc_pages(spark, dest, compress=True).withColumn(
        "epoch", F.col("warc_ts").cast("long")
    )
    got = {
        r["url"]: (r["epoch"], bytes(r["html"]), r["lang"])
        for r in back.collect()
    }
    assert got == {u: (e, h, lg) for u, e, h, lg in rows}

    # each record is its own member: decompressing the first member of
    # some part file yields exactly one whole record
    from graphjet_spark.sources.warc import _gzip_members

    part = sorted(
        f for f in os.listdir(dest) if f.endswith(".warc.gz")
    )[0]
    buf = open(os.path.join(dest, part), "rb").read()
    first = next(iter(_gzip_members(buf)))
    recs = list(_split_records(first))
    assert len(recs) == 1
