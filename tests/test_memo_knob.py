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


def test_bypass_written_dirs_still_cleaned(spark, monkeypatch):
    """With the knob ON, written source/format dirs skip the memo PUT
    but must land on the unconditional cleanup list — otherwise every
    per-solve measurement run leaks a full-table copy in /tmp
    (ADVICE-class leak caught by the r12 self-review)."""
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_MEMO", "1")
    sf_dir = "/root/testdata/sf0.001"

    from git_etl_spark.operators import file_formats as ff
    from git_etl_spark.operators import streaming_bridge as sb
    from git_etl_spark.io import load_table

    before_fmt = len(ff._FMT_EXTRA_DIRS)
    path = ff._written_copy(spark, sf_dir, "json")
    assert path in ff._FMT_EXTRA_DIRS and path not in ff._FMT_MEMO.values()
    assert len(ff._FMT_EXTRA_DIRS) == before_fmt + 1

    before_sink = len(sb._SINK_DIRS)
    events = load_table(spark, sf_dir, "events")
    src = sb._replay_source(spark, sf_dir, events, n_parts=2)
    assert src in sb._SINK_DIRS and src not in sb._SRC_MEMO.values()
    assert len(sb._SINK_DIRS) == before_sink + 1


def test_global_ntile_non_identifier_out_name(spark):
    """``out`` feeds a generated column name into raw SQL — names with
    spaces/reserved words must survive (backtick quoting)."""
    from pyspark.sql import functions as F

    from git_etl_spark.functions.ranking import global_ntile

    df = spark.range(10).select(F.col("id"))
    got = global_ntile(df, 3, [F.col("id")], out="tile 2", num_partitions=2)
    rows = {(r["id"], r["tile 2"]) for r in got.collect()}
    # NTILE(3) over 10 rows: sizes 4,3,3
    want = {(i, 1) for i in range(4)} | {(i, 2) for i in range(4, 7)} | {
        (i, 3) for i in range(7, 10)
    }
    assert rows == want
