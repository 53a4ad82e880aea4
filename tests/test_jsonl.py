"""JSONL document-corpus connector: lossless round-trip (including
newlines/unicode/quotes), corrupt-line contract, extra-key tolerance."""

from __future__ import annotations

import os

import pytest

from graphjet_spark.sources.jsonl import (
    DOC_SCHEMA,
    read_jsonl_docs,
    write_jsonl_docs,
)

DOCS = [
    (1, "plain words here", "en", "web", 16),
    (2, 'quotes " and \\ backslash', "en", "web", 24),
    (3, "newline\nand\ttab inside", "de", "crawl", 22),
    (4, "unicode: naïve café 東京 🙂", "ja", "crawl", 24),
    (5, "", "en", "empty", 0),
]


def _rows(df):
    return {
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    }


def test_roundtrip_lossless(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
    dest = str(tmp_path / "docs")
    write_jsonl_docs(docs, dest)
    back = read_jsonl_docs(spark, dest)
    assert _rows(back) == set(DOCS)
    assert back.schema == DOC_SCHEMA


def _write_jsonl(dirpath, lines):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_corrupt_lines_dropped_or_fail(spark, tmp_path):
    d = str(tmp_path / "bad")
    _write_jsonl(
        d,
        [
            '{"doc_id": 1, "text": "ok", "lang": "en", "source": "w", "n_chars": 2}',
            "this is not json at all {{{",
            '{"doc_id": null, "text": "no id", "lang": "en", "source": "w", "n_chars": 5}',
            '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "w", "n_chars": 7}',
        ],
    )
    back = read_jsonl_docs(spark, d)
    assert {r["doc_id"] for r in back.collect()} == {1, 2}
    with pytest.raises(Exception):
        read_jsonl_docs(spark, d, on_malformed="fail").collect()


def test_extra_keys_ignored(spark, tmp_path):
    d = str(tmp_path / "extra")
    _write_jsonl(
        d,
        [
            '{"doc_id": 7, "text": "t", "lang": "en", "source": "w",'
            ' "n_chars": 1, "url": "http://x", "score": 0.5}',
        ],
    )
    back = read_jsonl_docs(spark, d)
    assert _rows(back) == {(7, "t", "en", "w", 1)}


def test_gzip_jsonl_read(spark, tmp_path):
    """Crawl dumps ship as .jsonl.gz; Spark's JSON scan must read them
    transparently (gzip members parallelize per-file, not per-split)."""
    import gzip

    d = str(tmp_path / "gz")
    os.makedirs(d, exist_ok=True)
    line = '{"doc_id": 42, "text": "zipped", "lang": "en", "source": "w", "n_chars": 6}\n'
    with gzip.open(os.path.join(d, "part-0.jsonl.gz"), "wt") as f:
        f.write(line)
    back = read_jsonl_docs(spark, d)
    assert _rows(back) == {(42, "zipped", "en", "w", 6)}
