"""Property-based spot checks (SURVEY.md §5.2(4)) — invariants over
generated commit data, pure-Python side (the Spark twins of these
invariants are covered by the e2e golden test)."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from git_etl_spark.sources.git_log import (
    FIELD_SEP,
    RECORD_SENTINEL,
    parse_git_log_text,
    resolve_rename_path,
)

# tokens that cannot contain our NUL separators or newlines
_token = st.text(
    alphabet=st.characters(blacklist_characters="\x00\n\r\t", codec="utf-8"),
    min_size=1,
    max_size=20,
)
_sha = st.text(alphabet="0123456789abcdef", min_size=40, max_size=40)
_epoch = st.integers(min_value=1, max_value=2_000_000_000)
_count = st.integers(min_value=0, max_value=10_000)


@st.composite
def commit_blocks(draw):
    sha = draw(_sha)
    email = draw(_token)
    name = draw(_token)
    epoch = draw(_epoch)
    n_parents = draw(st.integers(min_value=0, max_value=3))
    parents = " ".join(draw(_sha) for _ in range(n_parents))
    subject = draw(_token)
    files = draw(
        st.lists(
            st.tuples(_count, _count, _token.filter(lambda s: s.strip())),
            max_size=5,
        )
    )
    numstat = [f"{a}\t{d}\t{p}" for a, d, p in files]
    header = FIELD_SEP.join([sha, email, name, str(epoch), parents, subject])
    block = RECORD_SENTINEL + header + ("\n" + "\n".join(numstat) if numstat else "")
    return block, {
        "sha": sha,
        "epoch": epoch,
        "n_parents": n_parents,
        "files": files,
        "subject": subject,
    }


@given(st.lists(commit_blocks(), min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)
def test_parse_invariants(blocks):
    text = "".join(b for b, _ in blocks)
    parsed = parse_git_log_text(text, "r", "main")
    assert len(parsed) == len(blocks)
    for commit, (_, meta) in zip(parsed, blocks):
        # additions/deletions/files_changed always equal the sum/count
        # of the nested file_changes (the reference keeps these in sync
        # by construction; we must too)
        assert commit["additions"] == sum(
            fc["additions"] for fc in commit["file_changes"]
        )
        assert commit["deletions"] == sum(
            fc["deletions"] for fc in commit["file_changes"]
        )
        assert commit["files_changed"] == len(commit["file_changes"])
        assert commit["is_merge"] == (meta["n_parents"] > 1)
        assert commit["message"] == meta["subject"]
        assert commit["committed_at"] == datetime.fromtimestamp(
            meta["epoch"], tz=timezone.utc
        ).replace(tzinfo=None)
        # file order and count preserved
        assert len(commit["file_changes"]) == len(meta["files"])


@given(_token)
@settings(max_examples=200, deadline=None)
def test_rename_resolution_idempotent(path):
    # f(f(x)) == f(x): resolving twice never changes the result again
    once = resolve_rename_path(path)
    assert resolve_rename_path(once) == once


@given(st.lists(st.tuples(_token, _token), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_config_dedup_idempotent(pairs):
    """SET1 dedup invariant: resolution is stable under repetition."""
    from git_etl_spark.sources.discovery import normalize_path

    paths = [p for p, _ in pairs]
    seen, out = set(), []
    for p in (normalize_path(x) for x in paths + paths):
        if p not in seen:
            seen.add(p)
            out.append(p)
    # doubling the input changes nothing
    seen2, out2 = set(), []
    for p in (normalize_path(x) for x in paths):
        if p not in seen2:
            seen2.add(p)
            out2.append(p)
    assert out == out2
