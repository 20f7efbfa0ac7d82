"""Distributed BPE trainer/encoder (operators/bpe.py) pinned EXACTLY
against a sequential pure-Python reference implementation of the Sennrich
et al. 2016 algorithm — merge table, greedy merge application, and
rank-greedy encoding. Beyond-reference operator (the reference engine has
no tokenizer trainer), so the reference implementation here is the oracle.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from quackspark.operators.bpe import (
    EOW,
    _encode_word,
    apply_bpe,
    merge_table_df,
    train_bpe,
    word_frequencies,
)

TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the lowest newest of the new",
    "wide wide open the low road",
]


def ref_train(texts, n, min_count=2):
    """Sequential reference trainer: identical tie-breaking
    (count DESC, left ASC, right ASC), greedy left-to-right merges."""
    wf = Counter(w.lower() for t in texts for w in t.split())
    words = {w: list(w) + [EOW] for w in wf}
    merges = []
    for _ in range(n):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_merge_table_matches_reference_exactly(corpus):
    got = train_bpe(corpus, "text", 20)
    want = ref_train(TEXTS, 20)
    assert got == want
    assert len(got) >= 10  # the fixture corpus supports a real table


def test_word_frequencies_one_shuffle(corpus):
    wf = word_frequencies(corpus, "text")
    rows = {r["word"]: (r["freq"], r["symbols"]) for r in wf.collect()}
    assert rows["low"][0] == 6
    assert rows["low"][1] == ["l", "o", "w", EOW]
    # ONE shuffle in the plan: the groupBy — nothing corpus-wide after it
    # (AQE prints final + initial renderings of the same plan — count the
    # final section only)
    plan = wf._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1


def test_encode_matches_reference_and_roundtrips(corpus):
    merges = train_bpe(corpus, "text", 14)
    ranks = {m: i for i, m in enumerate(merges)}
    enc = apply_bpe(corpus, "text", merges)
    for r in enc.collect():
        want = []
        for w in r["text"].split():
            want.extend(_encode_word(w.lower(), ranks))
        assert r["bpe_tokens"] == want
        # lossless: concatenation reproduces the words + EOW markers
        assert "".join(r["bpe_tokens"]) == "".join(
            w.lower() + EOW for w in r["text"].split()
        )


def test_early_stop_on_min_pair_count(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    # every pair occurs once — below min_pair_count=2 → no merges
    assert train_bpe(df, "text", 10, min_pair_count=2) == []


def test_registry_entries_run(spark):
    from quackspark.queries.textops import text_bpe_encode, text_bpe_train

    mt = text_bpe_train(spark, "/root/testdata/sf0.001")
    rows = mt.collect()
    assert len(rows) == 24
    assert mt.columns == ["rank", "left", "right", "merged"]
    assert [r["rank"] for r in rows] == list(range(24))
    top = text_bpe_encode(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(top) <= 40
    assert top[0]["cnt"] >= top[-1]["cnt"]
