"""Unicode/encoding-hostility corpus builder — the seventh robustness
axis (r14, self-directed after the six VERDICT-ordered axes).

Every prior axis varied KEYS, VALUES, TIME, or CARDINALITY but left
text content well-behaved: ASCII words, single spaces, no control
characters. At 100 TB none of that holds — a crawl corpus is full of
multi-byte scripts, combining marks, zero-width characters, decode
wreckage (U+FFFD), embedded NULs from binary sniff failures, exotic
newlines, and case-fold traps — and the text surface (tokenization,
n-grams, BPE, fingerprints, regex gates, format round-trips, JSON
extraction) is exactly where two SQL engines can LEGALLY disagree:
code-unit vs codepoint semantics, ASCII-vs-Unicode character classes,
locale-sensitive case mapping, C-string truncation at NUL. This
builder replicates sf0.001 ``factor``× through pyarrow (preserving
physical types, like the skew/temporal builders) and injects:

- **Hostile text rotation** (``uni_frac`` of documents): a fixed,
  deterministic rotation of 18 shapes — NFC/NFD accented twins,
  fullwidth forms, RTL Arabic/Hebrew mixed with LTR, space-free CJK,
  Hangul, ZWJ emoji families + skin-tone modifiers, Zalgo-style
  combining storms, zero-width chars inside ASCII words + interior
  BOM, NBSP/ideographic-space separators, C0/C1 control chars
  (including VT — inside Java's ``\\s`` but outside RE2's — FF and
  NEL), an
  EMBEDDED NUL, U+FFFD decode remnants, Turkish dotted-İ / German ß /
  final-sigma case traps, U+2028/U+2029/CRLF newlines, a 400-emoji
  astral run, and a single 200-combining-mark grapheme cluster. The
  fragment is spliced into the MIDDLE of the original text (docs stay
  doc-like; near-dup structure survives), and ``n_chars`` is
  recomputed as Python ``len`` = codepoints, the unit both engines'
  ``length()`` count.
- **NFC/NFD twin docs** (``nfc_band``): a small band carries the SAME
  visible text normalized NFC or NFD by (row + replica) parity —
  byte-distinct, visually identical. Dedup/fingerprint families must
  treat them as what they byte-wise are (distinct exact keys, close
  near-dups) and the two engines must AGREE; a hash built on one
  engine's normalization would split here.
- **events.props**: a band of JSON payloads with non-ASCII keys,
  emoji values, and the same value escaped ``\\uXXXX`` on odd
  replicas vs raw UTF-8 on even ones (both valid JSON encodings of
  identical strings — extraction must agree across engines AND across
  encodings), plus an escaped ``\\u0000`` NUL payload.
- **customer.c_name / part.p_name** (``n_names`` each): hostile names
  flow through joins, group-bys, min/max string aggregates (binary
  UTF-8 collation on both engines) and LIKE gates.
- orders / lineitem / embeddings / dims: 1× copies — this axis varies
  TEXT BYTES only, so any new failure is attributable.

Used by the r14 full-oracle survey (PERFORMANCE.md) and the standing
gate ``test_unicode_corpus.py``. Per the temporal axis's lesson the
survey hash-checks every oracle on the hostile corpus (execute-only
surveys miss value defects).
"""

from __future__ import annotations

import glob
import json
import os
import unicodedata

# The hostile rotation. Every entry is valid UTF-8 (no lone
# surrogates — unencodable in a parquet string column, so decode
# wreckage is represented the way real pipelines see it: U+FFFD).
HOSTILE_TEXTS = [
    unicodedata.normalize("NFC", "caf\u00e9 r\u00e9sum\u00e9 na\u00efve d\u00e9j\u00e0 vu"),
    unicodedata.normalize("NFD", "caf\u00e9 r\u00e9sum\u00e9 na\u00efve d\u00e9j\u00e0 vu"),  # byte-distinct twin
    "ＡＢＣ fullwidth ０９ digits ａｚ",
    "مرحبا بالعالم hello مرحبا bidi",
    "עברית text עם mixed כיוונים",
    "日本語のテキストと中文文本が混在",  # CJK, no spaces
    "한국어 텍스트 조각 hangul",
    "\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466 family \U0001F3F3️‍\U0001F308 flag \U0001F44D\U0001F3FD tone",
    "z̵̧̤ä́͐l̢g̴o͓ combining storm",
    "zero​width‌joined‍words﻿interior bom",
    "nbsp separated words　ideographic　space",
    "control\x01chars\x02inside\x7f\x9f\x0b\x0c\x85text",
    "nul\x00byte\x00inside text",
    "replacement � chars � from bad decode",
    "İstanbul ısparta STRASSE straße ΣΟΦΟΣ σοφος",
    "line separator paragraph\r\nmixed\rnewlines",
    "\U0001F389" * 400 + " astral run",
    "a" + "́" * 200 + " one mega grapheme cluster",
]

# the NFC/NFD twin base (visible text identical across the two forms)
TWIN_BASE = "Motörhead élan protégé über naïveté"

HOSTILE_NAMES = [
    "Zürich​Customer",
    "İSTANBUL supplier",
    "日本の会社",
    "nul\x00name",
    "café" + "́",
]

# replica id offsets: far above any sf0.1 key range, far below 2^53
_OFF = 10_000_000


def _cls(i: int, rep: int, n: int) -> int:
    # deterministic row-class assignment, same idiom as the skew and
    # temporal builders: no RNG, stable across rebuilds
    return ((i + rep * n) * 7919) % 1000


def build_unicode_corpus(
    src_dir: str,
    out_dir: str,
    factor: int = 3,
    uni_frac: float = 0.15,
    nfc_band: float = 0.02,
    json_frac: float = 0.10,
    n_names: int = 5,
) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(src_dir, "*.parquet"))):
        name = os.path.basename(path)[: -len(".parquet")]
        t = pq.read_table(path)
        if name == "documents":
            out = _hostile_documents(pa, t, factor, uni_frac, nfc_band)
        elif name == "events":
            out = _hostile_props(pa, t, factor, json_frac)
        elif name == "customer":
            out = _hostile_names(pa, t, "c_name", n_names)
        elif name == "part":
            out = _hostile_names(pa, t, "p_name", n_names)
        else:
            out = t  # text-free tables stay 1x: failures stay attributable
        pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    return out_dir


def _hostile_documents(pa, t, factor, uni_frac, nfc_band):
    cols = {f.name: t.column(f.name).to_pylist() for f in t.schema}
    n = t.num_rows
    uni_cut = int(uni_frac * 1000)
    nfc_cut = uni_cut + int(nfc_band * 1000)

    out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for rep in range(factor):
        for i in range(n):
            text = cols["text"][i]
            c = _cls(i, rep, n)
            if text is not None and c < uni_cut:
                frag = HOSTILE_TEXTS[(i + rep * n) % len(HOSTILE_TEXTS)]
                k = len(text) // 2
                text = text[:k] + " " + frag + " " + text[k:]
            elif c < nfc_cut:
                # NFC/NFD alternating by (row + replica) parity:
                # byte-distinct, visually identical twins — both forms
                # exist at ANY factor (including the 1x standing gate),
                # and each doc flips form across replicas
                form = "NFC" if (i + rep) % 2 == 0 else "NFD"
                text = unicodedata.normalize(form, TWIN_BASE)
            out["doc_id"].append(cols["doc_id"][i] + rep * _OFF)
            out["text"].append(text)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            # len() counts codepoints — the unit both engines' length()
            # agree on (astral chars count 1, combining marks count 1
            # each); keeps the stored stat consistent with the text
            out["n_chars"].append(None if text is None else len(text))
    arrays = [pa.array(out[f.name], type=f.type) for f in t.schema]
    return pa.table(arrays, schema=pa.schema([(f.name, f.type) for f in t.schema]))


def _hostile_props(pa, t, factor, json_frac):
    cols = {f.name: t.column(f.name).to_pylist() for f in t.schema}
    n = t.num_rows
    cut = int(json_frac * 1000)

    names = [f.name for f in t.schema]
    out = {k: [] for k in names}
    for rep in range(factor):
        for i in range(n):
            for k in names:
                v = cols[k][i]
                if k == "event_id":
                    v = v + rep * _OFF
                elif k == "props" and _cls(i, rep, n) < cut:
                    frag = HOSTILE_TEXTS[(i + rep * n) % len(HOSTILE_TEXTS)]
                    # NUL is JSON-representable only escaped; rotate it in
                    note = "esc\x00nul" if (i + rep * n) % 7 == 0 else frag
                    # identical payload, two legal JSON encodings,
                    # alternating by (row + replica) parity so BOTH
                    # exist at any factor (incl. the 1x gate) —
                    # extraction must agree across engines AND encodings
                    v = json.dumps(
                        {"note": note, "emoji": "\U0001F389", "küy": 1},
                        ensure_ascii=((i + rep) % 2 == 1),
                    )
                out[k].append(v)
    arrays = [pa.array(out[f.name], type=f.type) for f in t.schema]
    return pa.table(arrays, schema=pa.schema([(f.name, f.type) for f in t.schema]))


def _hostile_names(pa, t, col, n_names):
    cols = {f.name: t.column(f.name).to_pylist() for f in t.schema}
    n = t.num_rows
    placed = 0
    vals = cols[col]
    for i in range(n):
        if placed < n_names and i % 83 == 0 and vals[i] is not None:
            vals[i] = HOSTILE_NAMES[placed % len(HOSTILE_NAMES)] + f" {i}"
            placed += 1
    arrays = [pa.array(cols[f.name], type=f.type) for f in t.schema]
    return pa.table(arrays, schema=pa.schema([(f.name, f.type) for f in t.schema]))
