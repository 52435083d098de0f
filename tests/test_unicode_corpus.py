"""Standing Unicode/encoding-hostility robustness gate — the seventh
corpus axis (r14, self-directed after the six ordered ones).

The r14 survey ran the FULL 239-oracle parity sweep (per the temporal
axis's lesson: hash-check, don't just execute) against the 3× build of
``unicode_corpus.build_unicode_corpus`` — NFC/NFD twins, fullwidth
forms, RTL, space-free CJK, ZWJ emoji clusters, combining storms,
zero-width chars, interior BOM, NBSP/ideographic spaces, C0/C1
controls (incl. VT/FF/NEL), EMBEDDED NUL, U+FFFD, case-fold traps,
U+2028/U+2029/CRLF newlines, a 400-emoji astral run and a
200-combining-mark grapheme cluster, spliced into documents.text,
events.props JSON (escaped and raw encodings of identical payloads),
and customer/part names. **235/239 matched on first contact**; the
four failures were four distinct cross-engine defect classes, all
fixed:

1. ``source_csv_roundtrip`` — raw \\r/\\n inside quoted fields split
   documents into extra records under the splittable (multiLine=off)
   reader. Fixed by the reversible estate encoding in
   ``operators/file_formats.py`` (percent-encode framing-hostile
   bytes at write, invert at read, md5-verified).
2. ``source_xml_roundtrip`` — XML 1.0 cannot represent C0 controls at
   all; the writer TASK_WRITE_FAILed. Same estate-encoding fix (plus
   \\r, which XML parsers line-end-normalize to \\n).
3. ``map_from_json_pack`` — a value-typed ``map<string,bigint>``
   schema nulls the ENTIRE record when one value is a string
   (PERMISSIVE is per-record), erasing keys the oracle kept. Fixed:
   schema-on-read ``map<string,string>`` + per-field try_cast,
   TRY_CAST mirrored in the oracle.
4. ``filter_validation_quarantine`` — regex ``.`` excludes U+2028/
   U+2029/NEL in Java but only \\n in RE2, so a raw-U+2028 payload
   (legal unescaped JSON) was quarantined by Spark, passed by DuckDB.
   Fixed: regex-free starts_with/ends_with on both engines.
   The same audit added ``(?s)`` to ``filter_regex_gate`` on both
   engines (latent: the corpus happened not to trigger it).

This gate keeps the axis closed on a 1× build of the same shape: the
four fixed queries plus one delegate per unicode-sensitive family
hash-match their oracles ON the hostile corpus. Whole gate ~90 s.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .oracle_utils import compare_query
from .unicode_corpus import HOSTILE_NAMES, HOSTILE_TEXTS, build_unicode_corpus


@pytest.fixture(scope="session")
def unicode_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("unicode") / "sf1x"
    return build_unicode_corpus(SF_SMOKE, str(out), factor=1)


def test_corpus_shape_is_hostile(unicode_dir):
    """The builder must keep its teeth: a refactor that silently drops
    an injected codepoint class would turn the gate into a no-op."""
    import pyarrow.parquet as pq

    texts = [
        t
        for t in pq.read_table(f"{unicode_dir}/documents.parquet")
        .column("text")
        .to_pylist()
        if t
    ]
    seen = {ord(ch) for t in texts for ch in t}
    required = {
        0x00: "embedded NUL",
        0x0B: "VT (Java \\s vs RE2 \\s divergence char)",
        0x85: "NEL",
        0x9F: "C1 control",
        0xA0: "NBSP",
        0x200B: "zero-width space",
        0x200D: "ZWJ",
        0xFEFF: "interior BOM",
        0xFFFD: "replacement char",
        0x2028: "line separator",
        0x2029: "paragraph separator",
        0x3000: "ideographic space",
        0x1F389: "astral emoji",
        0x0301: "combining mark",
    }
    missing = [nm for cp, nm in required.items() if cp not in seen]
    assert not missing, f"hostile codepoint classes missing: {missing}"
    # NFC/NFD twin pairs present and byte-distinct
    import unicodedata

    from .unicode_corpus import TWIN_BASE

    nfc = unicodedata.normalize("NFC", TWIN_BASE)
    nfd = unicodedata.normalize("NFD", TWIN_BASE)
    assert nfc != nfd and nfc in texts and nfd in texts
    # hostile JSON present in both encodings of the same payload
    props = [
        p
        for p in pq.read_table(f"{unicode_dir}/events.parquet")
        .column("props")
        .to_pylist()
        if p and "emoji" in p
    ]
    assert any("\U0001F389" in p for p in props), "raw-UTF-8 JSON missing"
    assert any("\\ud83c" in p.lower() for p in props), "escaped JSON missing"


def test_rotation_is_importable_and_encodable():
    """Every rotation entry must be UTF-8-encodable (parquet string
    columns cannot carry lone surrogates) and the module source must
    stay importable (no raw NUL in source — it happened once)."""
    for t in HOSTILE_TEXTS + HOSTILE_NAMES:
        t.encode("utf-8")


# the four r14 survey fixes — must hash-match on the hostile shape
FIXED = [
    "source_csv_roundtrip",
    "source_xml_roundtrip",
    "map_from_json_pack",
    "filter_validation_quarantine",
]

# one hash-checked delegate per unicode-sensitive family: exact dedup
# over byte-distinct NFC/NFD twins, token-set near-dup over spliced
# fragments, whitespace tokenization, fingerprint md5, langid
# heuristics, JSON extraction across escaped/raw encodings, the (?s)
# regex gate, JSONL roundtrip, string min/max over hostile names
UNICODE_ORACLED = [
    "dedup_exact_rebuild",
    "dedup_jaccard_pairs",
    "text_token_stats",
    "text_fingerprint",
    "text_langid_heuristic",
    "proj_json_extract",
    "filter_regex_gate",
    "source_jsonl_roundtrip",
    "agg_minmax_by",
]


@pytest.mark.parametrize("name", FIXED + UNICODE_ORACLED)
def test_unicode_oracled(name, unicode_dir, spark):
    compare_query(spark, name, str(unicode_dir))
