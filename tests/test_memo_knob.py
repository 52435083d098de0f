"""The memo-bypass measurement knob (VERDICT r11 task 4): with
SPARK_GRAFT_DISABLE_MEMO set, every intra-session memo site must
bypass both GET and PUT so a scale measurement times the solve, not a
cache hit; with it unset (the default, used by bench and the driver),
memoization is unchanged."""

from git_etl_spark.session import memo_disabled


def test_flag_semantics(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DISABLE_MEMO", raising=False)
    assert not memo_disabled()
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_MEMO", "0")
    assert not memo_disabled()
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_MEMO", "")
    assert not memo_disabled()
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_MEMO", "1")
    assert memo_disabled()


def test_every_memo_site_is_gated():
    """Each module-level memo dict must gate its get/put on
    memo_disabled — a new memo added without the gate would silently
    reopen the r11 blind spot (its scale readings would be cache
    hits). Source-level check: in every operators module that declares
    a *_MEMO dict, the number of memo_disabled mentions must be at
    least the number of distinct memo dicts times two (one get gate +
    one put gate)."""
    import re
    from pathlib import Path

    ops = Path(__file__).resolve().parent.parent / "git_etl_spark"
    for path in ops.rglob("*.py"):
        src = path.read_text()
        memos = set(re.findall(r"^(_[A-Z0-9_]+_MEMO)\s*[:=]", src, re.M))
        if not memos:
            continue
        gates = src.count("memo_disabled()")
        assert gates >= 2 * len(memos), (
            f"{path.name}: {len(memos)} memo dicts ({sorted(memos)}) but "
            f"only {gates} memo_disabled() gates — each memo needs a "
            "gated get and a gated put"
        )
