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

import __spark_entry__  # noqa: F401  (populates the registry)
from git_etl_spark.fingerprints import FINGERPRINT_FILE, current_fingerprints


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
