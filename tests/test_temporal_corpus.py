"""Standing temporal/ordering-hostility robustness gate — the sixth
corpus axis (r14; VERDICT r13 task 4).

The r14 survey ran all 246 registry queries against the 3× version of
``temporal_corpus.build_temporal_corpus`` (out-of-order file layout,
hour-boundary timestamp collisions, pre-1970/epoch/far-future
extremes on one "time-traveler" user, DST-transition bursts): **246
executed, 0 crashes, no pathological runtime** (max 9.0 s under
concurrent load; the per-user gap-fill spine absorbed a 3-century
outlier span — 2.69M output rows — in 0.9 s because the LOCF plan
generates segments instead of materializing the spine join). One
VALUE defect was found by hash-checking the temporal-sensitive
oracles: ``streaming_session_window_replay`` silently lost every
fully-pre-epoch session — Spark's event-time watermark lattice
bottoms at epoch 0 and the session-window operator filters sessions
against that INITIAL watermark even in the first micro-batch
(engine repro: test_streaming.py::test_session_window_pre_epoch_
engine_drop). Fixed by an explicit pre-epoch quarantine mirrored in
the transform and its oracle (streaming/events_stream.sessionized).

This gate keeps the axis closed on a 1× build of the same shape:
the fixed replay and one delegate per temporal-sensitive family
hash-match their oracles ON the hostile corpus (ties at window
boundaries, epoch extremes, shuffled file order — value proofs, not
just no-crash proofs), and the spine/gap-fill family executes across
the 3-century span. Whole gate budget ~60 s.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .temporal_corpus import build_temporal_corpus


@pytest.fixture(scope="session")
def temporal_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("temporal") / "sf1x"
    return build_temporal_corpus(SF_SMOKE, str(out), factor=1)


def test_corpus_shape_is_hostile(temporal_dir):
    """The builder must keep its teeth: a refactor that silently drops
    an injected shape would turn the gate into a no-op."""
    import pyarrow.parquet as pq

    ts = pq.read_table(f"{temporal_dir}/events.parquet").column("ts").to_pylist()
    pre = [x for x in ts if x and x.year < 1970]
    fut = [x for x in ts if x and x.year > 2100]
    snapped = [
        x for x in ts
        if x and x.minute == 0 and x.second == 0 and x.microsecond == 0
    ]
    pairs = [(a, b) for a, b in zip(ts, ts[1:]) if a and b]
    inversions = sum(1 for a, b in pairs if b < a)
    assert pre, "pre-epoch extremes missing"
    assert fut, "far-future extremes missing"
    assert len(snapped) >= 30, "hour-boundary tie mass missing"
    assert inversions >= 20, "file order is not out of time order"


# the r14 survey's one value fix — must hash-match on the hostile shape
FIXED = ["streaming_session_window_replay"]

# one hash-checked delegate per temporal-sensitive family: tie-broken
# OHLC first/last, gaps-and-islands sessions, earliest-dup pick, lag
# transitions over tied ts, watermark window agg, as-of nearest with
# ties, interval concurrency, fixed-range spine over hostile dates
TEMPORAL_ORACLED = [
    "events_hourly_ohlc",
    "events_sessionize",
    "events_dedup_earliest",
    "events_markov_transitions",
    "streaming_hourly_agg_replay",
    "join_asof_nearest_click",
    "events_max_concurrency",
    "gen_date_spine_zero_fill",
]

# execute-only delegates: the 3-century spine (output ∝ outlier span —
# 2.6M rows; value parity for the family is carried by the oracled
# members above at survey scale, and a row-compare that size has no
# place in a 60 s gate) plus the watermarked replays without cheap
# hostile-corpus oracles
TEMPORAL_EXECUTE = [
    "events_gapfill_locf",
    "events_interarrival_stats",
    "streaming_dedup_replay",
    "streaming_attribution_replay",
]


@pytest.mark.parametrize("name", FIXED + TEMPORAL_ORACLED)
def test_temporal_corpus_oracle_parity(spark, temporal_dir, name):
    from .oracle_utils import compare_query

    compare_query(spark, name, temporal_dir)


@pytest.mark.parametrize("name", TEMPORAL_EXECUTE)
def test_temporal_corpus_executes(spark, temporal_dir, name):
    from git_etl_spark import registry

    registry.load_all()
    assert registry.QUERIES[name](spark, temporal_dir).count() >= 0
