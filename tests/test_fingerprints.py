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


def test_rotation_orders_fingerprint_change_as_bounded_penalty():
    """A fine-flag (definition drifted since the green) costs a
    bounded staleness penalty — the query sorts _FLAG_PENALTY rounds
    older than its recorded green and ahead of unflagged greens at the
    same effective age — instead of outranking the whole staleness
    tier, so a refactor round's flags cannot starve the oldest greens
    out of the driver's exactly-50-row budget."""
    import __spark_entry__ as e

    key = lambda fine, coarse, rnd: (  # noqa: E731 — mirrors queries()
        True,
        True,
        rnd - e._FLAG_PENALTY if fine is True else rnd,
        0 if fine is None else (1 if fine else 2),
        not coarse,
        0.0,
        "",
    )
    flagged_fresh = key(True, True, 11)       # flagged r11 -> eff r8
    unflagged_stale = key(False, False, 6)    # the age-6 cohort
    unflagged_seven = key(None, False, 7)
    unflagged_eight = key(False, False, 8)
    flagged_stale = key(True, True, 6)        # flagged r6 -> eff r3
    assert unflagged_stale < flagged_fresh    # age-6 beats flagged-r11
    assert unflagged_seven < flagged_fresh    # age-5 too
    assert flagged_fresh < unflagged_eight    # ...but flag beats CLEAN equals
    assert flagged_stale < unflagged_stale    # flag still fronts in-tier
    # r13 refinement: a NEVER-drift-checked green (fine=None — its
    # green predates the fingerprint file; in practice the oldest
    # cohorts) outranks a penalty-ADVANCED flagged green at the same
    # effective age, so a refactor round's uniform flags cannot
    # displace the stalest pre-file greens from the exactly-50 budget
    # (at r13: 7 flagged r10 greens vs the 44-green r07 cohort, both
    # at effective round 7).
    never_checked_seven = key(None, False, 7)
    flagged_ten = key(True, True, 10)         # flagged r10 -> eff r7
    assert never_checked_seven < flagged_ten


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


def test_flag_resolution_applies_only_until_next_round_records():
    """A _FLAG_RESOLVED stamp clears a fine-flag only while no
    CORRECTNESS round newer than the stamp exists — once a later round
    records, the stamp is inert, so documented local evidence from
    round N can never mask an edit made in round N+1."""
    import __spark_entry__ as e

    name = next(iter(e._FLAG_RESOLVED))
    stamp = e._FLAG_RESOLVED[name]

    # active: latest recorded round == stamp round → flag cleared
    fine = {name: True, "other": True}
    e._apply_flag_resolutions(fine, {name: 10, "other": stamp})
    assert fine[name] is False
    assert fine["other"] is True  # non-listed queries untouched

    # expired: a round newer than the stamp has recorded → flag stays
    fine = {name: True}
    e._apply_flag_resolutions(fine, {name: 10, "other": stamp + 1})
    assert fine[name] is True

    # never force-flags: a clean query stays clean
    fine = {name: False}
    e._apply_flag_resolutions(fine, {name: 10, "other": stamp})
    assert fine[name] is False


def test_selectivity_floor_unflags_untouched_queries(monkeypatch):
    """The r13 floor, tightened r14 (ADVICE r13): a flag is cleared
    only when the LIVE fingerprint matches BOTH the latest round's
    START snapshot (commit adding CORRECTNESS_r{latest-1}) and its
    CLOSE snapshot (commit adding CORRECTNESS_r{latest}) — provably
    untouched during the latest round. A query edited MID-round
    (after the driver's verification run, before round close) matches
    the close snapshot but not the start snapshot and must KEEP its
    flag — the pre-r14 single-snapshot check silently cleared exactly
    that case."""
    import json as _json

    import __spark_entry__ as e

    live = {
        "untouched": "s1:dNEW",     # moved since green, == start AND close
        "edited_mid": "s2:dMID",    # != start, == close (mid-round edit)
        "edited_now": "s4:dNOW",    # != start AND != close (current edit)
        "fresh": "s3:dNEW",         # r11 green, unchanged — anchors the
    }                               # latest recorded round at 11
    snapshots = {
        # green-round as-of (round 10 start = commit adding r09 file)
        "c09": {
            "untouched": "s1:dOLD",
            "edited_mid": "s2:dOLD",
            "edited_now": "s4:dOLD",
        },
        # latest round START (commit adding the r10 file)
        "c10": {
            "untouched": "s1:dNEW",
            "edited_mid": "s2:dOLD",
            "edited_now": "s4:dOLD",
            "fresh": "s3:dNEW",
        },
        # latest round CLOSE (commit adding the r11 file)
        "c11": {
            "untouched": "s1:dNEW",
            "edited_mid": "s2:dMID",
            "edited_now": "s4:dOLD",
            "fresh": "s3:dNEW",
        },
    }
    file_commit = {
        "CORRECTNESS_r09.json": "c09",
        "CORRECTNESS_r10.json": "c10",
        "CORRECTNESS_r11.json": "c11",
    }

    def fake_git(*args):
        if args[0] == "log":
            return file_commit.get(args[-1])
        if args[0] == "show":
            commit = args[1].split(":")[0]
            snap = snapshots.get(commit)
            return _json.dumps(snap) if snap else None
        return None

    monkeypatch.setattr(e, "_git", fake_git)
    import git_etl_spark.fingerprints as fp

    monkeypatch.setattr(fp, "current_fingerprints", lambda: live)

    verified = {"untouched": 10, "edited_mid": 10, "edited_now": 10, "fresh": 11}
    round_commit = {10: "c10", 11: "c11"}
    out = e._fp_changed_since_green(verified, round_commit)
    assert out["untouched"] is False    # floor cleared the universal flag
    assert out["edited_mid"] is True    # mid-round edit KEEPS its flag (r14)
    assert out["edited_now"] is True    # current-round edit still flags
    assert out["fresh"] is False        # clean green stays clean

    # one bracket missing (start snapshot unresolvable) → floor
    # disabled entirely; flags over-include, the safe direction
    del file_commit["CORRECTNESS_r10.json"]
    out = e._fp_changed_since_green(verified, round_commit)
    assert out["untouched"] is True
    assert out["edited_mid"] is True
    assert out["fresh"] is False        # never force-flags a clean green


def test_entry_dicts_have_no_duplicate_literal_keys():
    """VERDICT r14 watch item: a repeated literal key in
    _REVERIFY_FIRST / _FLAG_RESOLVED silently last-wins, so one future
    re-listing in the wrong order would invert a pin with no error.
    Walk the AST of __spark_entry__.py and assert every dict literal's
    constant keys are unique."""
    import ast
    from pathlib import Path

    src = (Path(__spark_entry__.__file__)).read_text()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        seen: dict[object, int] = {}
        for k in node.keys:
            if isinstance(k, ast.Constant):
                assert k.value not in seen, (
                    f"duplicate dict key {k.value!r} at lines "
                    f"{seen[k.value]} and {k.lineno}"
                )
                seen[k.value] = k.lineno
