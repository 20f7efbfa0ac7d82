"""Text-analysis primitives for the training-data pipeline operators
(language-ID, quality scoring, token counting, fingerprinting, shingling).

These extend the reference's string/similarity surface (duckdb-6.cpp:
5993-6040) with the document-scale ops a 100 TB corpus pipeline needs.
Everything is built-in Column expressions / higher-order functions — no
Python UDFs — so the whole pipeline stays inside whole-stage codegen and
scales with executor count, not driver memory.

Portability rule for the DuckDB differential oracle: only engine-agnostic
primitives (split/lower/length/ascii/md5/arithmetic) — never engine hash()
functions, whose values differ per engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus / multiplier of the rolling fingerprint (Rabin-Karp style)
FP_MOD = 1_000_000_007
FP_MULT = 131


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization: array of non-empty tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish sub-word split: break on whitespace AND at letter/digit
    boundaries (the regex pre-tokenizer shape GPT-2-style BPE uses).
    Implemented as boundary-space insertion + whitespace split so the same
    construction runs on RE2 (no lookaround) for the DuckDB oracle."""
    c = F.col(text) if isinstance(text, str) else text
    spaced = F.regexp_replace(
        F.regexp_replace(c, "([a-z])([0-9])", "$1 $2"), "([0-9])([a-z])", "$1 $2"
    )
    return F.filter(F.split(F.trim(spaced), r"\s+"), lambda t: t != "")


def word_code(w: Column) -> Column:
    """Portable per-token integer code: length*31 + first-char codepoint."""
    return (F.length(w) * 31 + F.ascii(w)).cast("long")


def rolling_hash(toks: Column) -> Column:
    """Rabin-Karp rolling hash over the token stream:
    ``acc = (acc * 131 + code(tok)) mod 1e9+7`` — the document fingerprint."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * FP_MULT + word_code(w)) % FP_MOD,
    )


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles (space-joined) — the dedup unit for MinHash/Jaccard.
    Empty result when the document has fewer than k tokens.

    Built from k array slices folded with zip_with — O(n) per document.
    (The naive transform+element_at form is O(n²): element_at re-evaluates
    the token expression per element, a 20× slowdown at ~150 tokens/doc.)"""
    n = F.size(toks)
    length = F.greatest(n - (k - 1), F.lit(0))
    out = F.slice(toks, 1, length)
    for j in range(1, k):
        nxt = F.slice(toks, j + 1, length)
        out = F.zip_with(out, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return out


def word_chunks(toks: Column, size: int) -> Column:
    """Consecutive ``size``-word chunks (space-joined), last chunk ragged —
    the "paragraph" unit for chunk-level dedup on corpora without layout.
    Empty array for empty documents (guards sequence(1, 0) descending)."""
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(size)).cast("int")
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda g: F.array_join(
                F.slice(toks, (g - 1) * size + 1, size), " "
            ),
        )
    )


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Number of tokens that belong to `words` (lowercased exact match)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def char_class_count(text: Column | str, chars: str) -> Column:
    """Occurrences of any character of `chars` (explicit class — identical
    semantics in RE2/Java/DuckDB regex)."""
    c = F.col(text) if isinstance(text, str) else text
    cls = "[" + chars.replace("\\", r"\\").replace("]", r"\]") + "]"
    return F.length(c) - F.length(F.regexp_replace(c, cls, ""))


def quality_score(text: Column | str, stopwords: list[str]) -> Column:
    """Composite document-quality score in [0,1] (stopword ratio,
    punctuation ratio, digit ratio, type-token ratio) — the shared
    expression behind queries/textops.text_quality_score and the
    training-prep pipeline gate. Pure per-row column arithmetic.

    The token array is re-derived per ratio term (interpreted HOFs are
    not CSE'd); when the caller can stage the tokens in their OWN
    projection first, :func:`quality_score_toks` evaluates the split
    once (the _exploded_shingles CollapseProject precedent — measured
    2.6× → 1.7× on the span-scrub pipeline at sf1)."""
    c = F.col(text) if isinstance(text, str) else text
    return quality_score_toks(c, tokens(c), stopwords)


def quality_score_toks(
    text: Column | str, toks: Column, stopwords: list[str]
) -> Column:
    """:func:`quality_score` with the token array supplied by the caller
    (identical arithmetic — callers stage ``toks`` in a separate
    projection so the whitespace split runs once per document)."""
    c = F.col(text) if isinstance(text, str) else text
    ntok = F.greatest(F.size(toks), F.lit(1))
    nchar = F.greatest(F.length(c), F.lit(1))
    stop_ratio = stopword_hits(toks, stopwords) / ntok
    punct_ratio = char_class_count(c, ".,!?;:") / nchar
    digit_ratio = char_class_count(c, "0123456789") / nchar
    ttr = F.size(F.array_distinct(toks)) / ntok
    return (
        F.lit(0.25) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.25) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.25) * (1 - F.least(digit_ratio * 10, F.lit(1.0)))
        + F.lit(0.25) * ttr
    )


def fingerprint_arrow(text: Column | str) -> Column:
    """Arrow-vectorized document fingerprints, op-order-identical to the
    expression forms (:func:`rolling_hash` fold + ``md5(concat_ws(' '))``
    + ``array_min(transform(md5))``), following the
    ``srp_signature_arrow`` precedent (operators/simsearch.py): one
    batched kernel replaces three interpreted HOF walks per row.
    Non-BMP first chars: Python ``ord(t[0])`` is the full codepoint, and
    so are Spark 4's ``ascii()`` and DuckDB's ``ascii()`` (verified:
    U+1F600 → 128512 in all three) — no UTF-16 code-unit divergence;
    pinned by tests/test_advice_r5.py with an astral-plane token.

    Identity argument, pinned by tests/test_oracle_parity.py and the
    kernel-vs-expression test: tokenization is Java-regex ``\\s+`` after
    the empty filter, replayed with Python ``re.ASCII`` (both engines'
    ``\\s`` is the ASCII class); the rolling fold is exact int64
    arithmetic mod 1e9+7 (no float); per-token md5 min is order-free so
    it runs over the distinct token set; md5 of the space-joined stream
    is byte-identical by construction.

    Returns struct<rk_fp bigint, md5_fp string, minhash1 string>
    (NULL fields for NULL text; minhash1 NULL for token-less docs —
    matching array_min([]) = NULL)."""
    import hashlib
    import re as _re

    import pandas as pd
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    ws = _re.compile(r"\s+", _re.ASCII)
    out_type = StructType([
        StructField("rk_fp", LongType()),
        StructField("md5_fp", StringType()),
        StructField("minhash1", StringType()),
    ])

    def _build():
        @F.pandas_udf(out_type)
        def _fp(texts):
            rks: list = []
            md5s: list = []
            mins: list = []
            for txt in texts:
                if txt is None:
                    rks.append(None); md5s.append(None); mins.append(None)
                    continue
                toks = [t for t in ws.split(txt) if t]
                acc = 0
                for t in toks:
                    acc = (acc * FP_MULT + len(t) * 31 + ord(t[0])) % FP_MOD
                rks.append(acc)
                md5s.append(hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest())
                if toks:
                    mins.append(min(
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in set(toks)
                    ))
                else:
                    mins.append(None)
            return pd.DataFrame({"rk_fp": rks, "md5_fp": md5s, "minhash1": mins})

        return _fp

    from quackspark.functions._udfmemo import memo_udf

    c = F.col(text) if isinstance(text, str) else text
    return memo_udf(("fingerprint_arrow",), _build)(c)
