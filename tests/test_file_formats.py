"""Adversarial payloads through the JSONL/CSV round-trip sources:
quoting, escaping, and unicode asymmetries between writer and reader
must surface as md5 mismatches."""

from __future__ import annotations

import pytest

from git_etl_spark.operators.file_formats import (
    source_csv_roundtrip,
    source_jsonl_roundtrip,
)

ADVERSARIAL_CSV = [
    'comma, separated, "quoted", done',
    'she said ""hi"" twice',
    "tab\tand unicode: ümlaut — em-dash 你好",
    '","',
    "   leading and trailing   ",
    "",
]
ADVERSARIAL_JSON = ADVERSARIAL_CSV + [
    "line one\nline two\nline three",
    "backslash \\n is not a newline \\",
]


def _write_corpus(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "srcX", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _expected(spark, sf_dir):
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    return sorted(
        (
            r["doc_id"],
            r["lang"],
            r["source"],
            r["n_chars"],
            hashlib.md5(r["text"].encode()).hexdigest(),
        )
        for r in docs
    )


def test_csv_roundtrip_adversarial_quoting(spark, tmp_path):
    sf = _write_corpus(spark, tmp_path, ADVERSARIAL_CSV)
    got = sorted(map(tuple, source_csv_roundtrip(spark, sf).collect()))
    assert got == _expected(spark, sf)


def test_jsonl_roundtrip_adversarial_including_newlines(spark, tmp_path):
    sf = _write_corpus(spark, tmp_path, ADVERSARIAL_JSON)
    got = sorted(map(tuple, source_jsonl_roundtrip(spark, sf).collect()))
    assert got == _expected(spark, sf)


ADVERSARIAL_XML = [
    "ampersand & and entities &amp; &lt; &gt; literal",
    "<tag>looks like markup</tag> and </doc> early close",
    "quotes \" and ' apostrophes",
    "unicode: ümlaut — em-dash 你好",
    "CDATA-ish ]]> terminator and <![CDATA[ opener",
    "",
    # surrounding whitespace (r14 skew-sweep finding): the XML
    # reader's DEFAULT trims it inside element text — the query pins
    # ignoreSurroundingSpaces=false, and these payloads keep that pin
    # load-bearing
    "ends with a space ",
    " starts with one",
    "   both sides   ",
]


def test_xml_roundtrip_adversarial_entities(spark, tmp_path):
    """XML's failure mode is entity escaping: &, <, >, stray closing
    tags, CDATA terminators — and since r14, surrounding whitespace
    (the reader's default TRIMS it; the skew corpus's trailing-space
    exact-dup text caught the silent normalization). All must invert
    exactly through write+read or the md5 comparison breaks."""
    from git_etl_spark.operators.file_formats import source_xml_roundtrip

    sf = _write_corpus(spark, tmp_path, ADVERSARIAL_XML)
    got = sorted(map(tuple, source_xml_roundtrip(spark, sf).collect()))
    assert got == _expected(spark, sf)
