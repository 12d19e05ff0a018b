"""r13 vocabulary coverage curve (functions/text.vocab_coverage):
integer-exact most-frequent-first coverage math over the bounded
frequency summary, vs a brute Counter reference."""

from __future__ import annotations

import collections
import random
import re

from ngff_zarr_spark.functions.text import vocab_coverage


def _brute(texts, fractions):
    cnt = collections.Counter()
    for t in texts:
        cnt.update(x for x in re.sub(r"\s+", " ", t).strip().split(" ") if x)
    total = sum(cnt.values())
    vocab = len(cnt)
    freqs = sorted(cnt.values(), reverse=True)
    out = {}
    for num, den in fractions:
        th = -(-total * num // den)
        c = n = 0
        for f in freqs:
            if c >= th:
                break
            c += f
            n += 1
        out[(num, den)] = (th, n, vocab, total)
    return out


def _run(spark, texts, fractions):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        (r.cov_num, r.cov_den): (
            r.threshold_tokens, r.n_vocab_needed, r.vocab_size, r.total_tokens
        )
        for r in vocab_coverage(df, fractions).collect()
    }


def test_hand_fixture(spark):
    # "a" x6, "b" x3, "c" x1: total 10; 50% -> threshold 5 -> 1 token;
    # 90% -> 9 -> 2 tokens; 99% -> ceil(9.9)=10 -> 3 tokens
    texts = ["a a a b b c", "a a a b"]
    got = _run(spark, texts, [(1, 2), (9, 10), (99, 100)])
    assert got[(1, 2)] == (5, 1, 3, 10)
    assert got[(9, 10)] == (9, 2, 3, 10)
    assert got[(99, 100)] == (10, 3, 3, 10)


def test_tied_frequencies_need_no_tiebreak(spark):
    # four tokens, each freq 2 (one tied group): 50% of 8 = 4 -> 2 of
    # the interchangeable tokens
    got = _run(spark, ["p q r s", "s r q p"], [(1, 2)])
    assert got[(1, 2)] == (4, 2, 4, 8)


def test_matches_brute_on_random_corpora(spark):
    rng = random.Random(13)
    fr = [(1, 2), (3, 4), (99, 100)]
    for trial in range(3):
        vocab = [f"w{j}" for j in range(rng.randrange(5, 40))]
        texts = [
            " ".join(rng.choices(vocab, weights=range(1, len(vocab) + 1),
                                 k=rng.randrange(5, 60)))
            for _ in range(rng.randrange(5, 30))
        ]
        assert _run(spark, texts, fr) == _brute(texts, fr), f"trial {trial}"


def test_full_coverage_needs_whole_vocab(spark):
    got = _run(spark, ["x y z"], [(1, 1)])
    assert got[(1, 1)] == (3, 3, 3, 3)
