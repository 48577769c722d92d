"""Distributed BPE training: parity with a pure-Python reference, greedy
left-to-right apply semantics, determinism, encode round-trip."""

from __future__ import annotations

from collections import Counter

import pytest

from autoextract.operators.tokenizer import bpe_encode, bpe_train


def ref_bpe(word_counts, k):
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pairs[best]))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


WC = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "newer": 4, "wider": 1}


def _corpus_df(spark, wc):
    return spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(sorted(wc.items()))],
        "doc_id long, text string",
    )


def test_matches_python_reference(spark):
    got = bpe_train(_corpus_df(spark, WC), 8)
    want = ref_bpe(WC, 8)
    assert [(l, r, c) for _, l, r, _, c in got] == [
        (l, r, c) for (l, r), c in [((m[0], m[1]), m[2]) for m in want]
    ]
    assert [s for s, *_ in got] == list(range(1, 9))


def test_overlapping_pairs_merge_left_to_right(spark):
    # "aaaa"x3: (a,a) count = 9 (3 adjacencies x 3); after merge, words
    # become [aa, aa] — greedy non-overlapping, exactly like the reference
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa")], "doc_id long, text string")
    got = bpe_train(df, 2)
    want = ref_bpe({"aaaa": 3}, 2)
    assert [(l, r, c) for _, l, r, _, c in got] == [(m[0], m[1], m[2]) for m in want]
    assert got[0][:3] == (1, "a", "a") and got[0][4] == 9
    assert got[1][1:3] == ("aa", "aa")


def test_early_stop_and_validation(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert bpe_train(df, 5) == []  # all words single-char: no pairs ever
    with pytest.raises(ValueError):
        bpe_train(df, 0)


def test_partition_invariant(spark):
    df = _corpus_df(spark, WC)
    a = bpe_train(df.repartition(1), 6)
    b = bpe_train(df.repartition(8), 6)
    assert a == b


def test_encode_replays_merges(spark):
    df = _corpus_df(spark, WC)
    merges = bpe_train(df, 8)
    enc = bpe_encode(
        spark.createDataFrame(
            [(0, "newest lower"), (1, "unseen")], "doc_id long, text string"
        ),
        merges,
    ).collect()
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in enc}
    # replay the same merges with the reference apply
    def ref_encode(word, merges):
        syms = list(word)
        for _, l, r, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    assert by_id[0] == ref_encode("newest", merges) + ref_encode("lower", merges)
    assert by_id[1] == ref_encode("unseen", merges)
