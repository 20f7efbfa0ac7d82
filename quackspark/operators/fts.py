"""Full-text search scoring — the Spark-first stand-in for the
reference's `fts` loadable extension (known-extension list
/root/reference/duckdb-7.cpp:4405-4410; the extension itself builds an
inverted index + `match_bm25` macro). On Spark the inverted index is
unnecessary for batch scoring: BM25 over a fixed query-term set is a
pure projection + one tiny global aggregate, so the whole scan stays in
whole-stage codegen and the only shuffle is the final top-k
(TakeOrderedAndProject).

Shape at 100 TB: per-term tf is `size(filter(tokens, = term))` — no
explode, no per-term shuffle. Corpus stats (N, total dl, per-term df)
are ONE global partial-aggregated row, broadcast back via crossJoin.
Top-k never materializes a global sort.

Formula (documented so the oracle mirrors it op-for-op):
  idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)          [Lucene BM25]
  w(d, t)  = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  score(d) = sum over query terms, fixed left-to-right order
with k1 = 1.2, b = 0.75, avgdl = sum(dl)/N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from quackspark.functions import text as T

K1 = 1.2
B = 0.75

__all__ = ["bm25_topk", "K1", "B"]


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 score for a fixed bag of query terms.
    Ties (and cross-engine float jitter) are neutralized by ranking on
    the 6-dp rounded score with the doc id as tiebreak."""
    # two-step projection: materialize the token array ONCE — Catalyst's
    # CollapseProject keeps an expensive alias referenced 4+ times in its
    # own stage, so the regex split never re-evaluates per tf column
    base = df.select(
        F.col(id_col).alias("doc"),
        T.tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    feat = base.select(
        "doc",
        F.size("toks").alias("dl"),
        *[_tf(F.col("toks"), t).alias(f"tf_{t}") for t in terms],
    )
    stats = feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
    )
    j = feat.crossJoin(F.broadcast(stats))
    n = F.col("n").cast("double")
    avgdl = F.col("sdl").cast("double") / F.col("n")
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        dfreq = F.col(f"df_{t}").cast("double")
        idf = F.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        w = idf * tf * (K1 + 1.0) / (
            tf + K1 * (1.0 - B + B * F.col("dl").cast("double") / avgdl)
        )
        score = w if score is None else score + w
    return (
        j.select(
            "doc",
            "dl",
            *[f"tf_{t}" for t in terms],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc")
        .limit(k)
    )
