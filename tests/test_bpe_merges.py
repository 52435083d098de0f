"""text_bpe_merges semantic tests: the relational BPE learner must
reproduce the classic greedy algorithm (Sennrich et al. 2016) exactly —
including self-pair merges like (a, a) on odd-length runs, where
string-replace-based merge devices provably diverge (a replaced
occurrence consumes the separator the next match needs).
"""

from __future__ import annotations

from collections import Counter

import pytest


def greedy_merge(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    """Reference greedy BPE merge: scan left to right, merge every
    non-overlapping occurrence of ``pair``."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def fold_merge(symbols: list[str], pair: tuple[str, str]) -> str:
    """Python model of the engine-side device (the same fold both the
    Spark F.aggregate expression and the DuckDB list_reduce oracle
    run): accumulate the spelled string, merging when the last emitted
    token is the pair's left symbol and the incoming one its right."""
    pa, pb = pair
    acc = ""
    for x in symbols:
        if acc == "":
            acc = x
        elif (acc == pa or acc.endswith(" " + pa)) and x == pb:
            if acc == pa:
                acc = pa + pb
            else:
                acc = acc[: len(acc) - len(pa) - 1] + " " + pa + pb
        else:
            acc = acc + " " + x
    return acc


@pytest.mark.parametrize(
    "word,pair",
    [
        ("a" * 9, ("a", "a")),  # odd overlapping run — replace devices fail here
        ("a" * 16, ("a", "a")),  # power-of-two overlapping run
        ("ab" * 12, ("a", "b")),  # long non-overlapping run
        ("ababa", ("b", "a")),  # offset matches
        ("xaaay", ("a", "a")),  # interior run
        ("abcabcabc", ("b", "c")),
        ("aab", ("a", "b")),  # merge at the very end
        ("baa", ("b", "a")),  # merge at the very start
    ],
)
def test_fold_merge_equals_greedy(word, pair):
    expect = " ".join(greedy_merge(list(word), pair))
    assert fold_merge(list(word), pair) == expect


def reference_bpe(words: Counter, k: int) -> list[tuple[int, str, int]]:
    """Pure-Python reference learner: weighted pair counts, (count
    DESC, pair ASC) argmax, greedy merge of every word."""
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(1, k + 1):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += words[w]
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append((rank, f"{pair[0]} {pair[1]}", counts[pair]))
        vocab = {w: greedy_merge(s, pair) for w, s in vocab.items()}
    return merges


def test_bpe_merges_match_reference(spark, tmp_path):
    # 'aaaa'-heavy corpus forces self-pair merges through the learner
    corpus = [
        "aaaaa aaaa abab",
        "banana bandana cabana",
        "low lower lowest newer newest",
        "x aaaaa banana low low low",
    ]
    spark.createDataFrame(
        [(i, t, "en", "planted", len(t)) for i, t in enumerate(corpus)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    from git_etl_spark.operators.text import BPE_MERGES, text_bpe_merges

    words = Counter(w for t in corpus for w in t.split(" ") if w)
    expect = reference_bpe(words, BPE_MERGES)
    got = [
        (r["rank"], r["pair"], r["pair_cnt"])
        for r in text_bpe_merges(spark, str(tmp_path)).orderBy("rank").collect()
    ]
    assert got == expect
