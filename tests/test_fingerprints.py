"""QUERY_FINGERPRINTS.json must track the live registry.

The re-verification rotation (``__spark_entry__.queries()``) compares
each query's live definition fingerprint against the committed file as
of its green-round commit; a stale committed file would mark queries
"changed" forever (safe but noisy) or — if a name is missing — drop
them to the coarse module-ancestry signal. This test pins the file to
the registry: on failure, regenerate with
``python -m git_etl_spark.fingerprints``.
"""

import json
import re

import __spark_entry__  # noqa: F401  (populates the registry)
from git_etl_spark import registry
from git_etl_spark.fingerprints import (
    FINGERPRINT_FILE,
    current_fingerprints,
    fingerprints_differ,
    referenced_helper_sources,
)


def test_fingerprint_file_is_fresh():
    committed = json.loads(FINGERPRINT_FILE.read_text())
    live = current_fingerprints()
    missing = sorted(set(live) - set(committed))
    extra = sorted(set(committed) - set(live))
    stale = sorted(
        n for n in set(live) & set(committed) if live[n] != committed[n]
    )
    assert not (missing or extra or stale), (
        f"QUERY_FINGERPRINTS.json out of date — regenerate with "
        f"`python -m git_etl_spark.fingerprints` "
        f"(missing={missing[:5]}, extra={extra[:5]}, stale={stale[:5]})"
    )


def test_rotation_orders_fingerprint_changed_before_stale():
    """The sort key must place fine-changed (True) ahead of unknown
    (None) and unchanged (False) at equal staleness."""
    key = lambda fine, coarse, rnd: (  # noqa: E731 — mirrors queries()
        True,
        not (fine is True),
        not coarse,
        rnd,
        0.0,
        "",
    )
    fine_changed = key(True, True, 6)
    helper_changed = key(False, True, 6)
    unknown_changed = key(None, True, 6)
    untouched = key(False, False, 6)
    stale_untouched = key(False, False, 4)
    assert fine_changed < helper_changed
    assert fine_changed < unknown_changed
    assert helper_changed < untouched
    assert unknown_changed < untouched
    assert stale_untouched < untouched  # staleness still orders tier 4


def test_fingerprint_format_is_shallow_colon_deep():
    """Round-11 format: every value is '<shallow md5>:<deep md5>'."""
    live = current_fingerprints()
    pat = re.compile(r"^[0-9a-f]{32}:[0-9a-f]{32}$")
    bad = sorted(n for n, v in live.items() if not pat.match(v))
    assert not bad, f"malformed fingerprints: {bad[:5]}"


def test_deep_fingerprint_covers_shared_helpers():
    """ADVICE r10 regression: the round-10 repartition landed in the
    shared helper _pca_power_solve, leaving the PCA queries' own-source
    (shallow) hashes unchanged and invisible to the changed-since-green
    tier. The deep component must include called-helper sources so a
    helper-only edit flags every query that calls it."""
    fn = registry.QUERIES["embedding_pca_loading_ppm"]
    helpers = referenced_helper_sources(fn)
    assert "git_etl_spark.operators.similarity._pca_power_solve" in helpers
    # transitive closure, not just direct calls: the helper's own
    # callees participate too (io.load_table is reached via the query,
    # vector helpers via the moment pass)
    assert any(k.startswith("git_etl_spark.functions.vector.") for k in helpers)
    # and the round-10 spread helper is in the brute-force closure
    fn2 = registry.QUERIES["simsearch_topk_bruteforce"]
    assert (
        "git_etl_spark.operators.similarity._spread_corpus"
        in referenced_helper_sources(fn2)
    )


def test_fingerprints_differ_legacy_and_deep():
    """Stored pre-r11 values are shallow-only: compare shallow-vs-
    shallow (same rule their greens were recorded under). Two-component
    values compare deep-vs-deep so helper edits count."""
    assert fingerprints_differ("aaa", "aaa:deep1") is False  # legacy match
    assert fingerprints_differ("old", "new:deep1") is True   # legacy drift
    assert fingerprints_differ("s:d1", "s:d2") is True       # helper edit
    assert fingerprints_differ("s1:d", "s2:d") is False      # deep rules
