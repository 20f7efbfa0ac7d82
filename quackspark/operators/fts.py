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

K1 = 1.2
B = 0.75

__all__ = ["bm25_topk", "bm25_features_arrow", "K1", "B"]


def _tf(toks: Column, term: str) -> Column:
    """Expression-form per-term tf — kept as the generic/reference
    implementation the Arrow kernel is pinned against in tests."""
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_features_arrow(text: Column, terms: list[str]) -> Column:
    """Arrow-vectorized (dl, tf per term) features, identical to the
    expression form (lower → \\s+ split → empty filter → per-term count):
    the expression path re-walks the token array once per term through
    interpreted HOFs (measured 2.2× vs DuckDB at sf1); this kernel
    tokenizes once per document and counts every term in the same pass
    (Counter lookup), following the srp_signature_arrow precedent
    (operators/simsearch.py:100). Python re.ASCII \\s matches Java's
    ASCII \\s class, so tokenization is engine-identical.

    Returns struct<dl int, tf_<term> int ...>; NULL text → zero counts
    like the expression form (split(NULL) handled upstream — documents
    fixture has no NULL text, kernel still guards)."""
    import re as _re
    from collections import Counter

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    ws = _re.compile(r"\s+", _re.ASCII)
    out_type = StructType(
        [StructField("dl", IntegerType())]
        + [StructField(f"tf_{t}", IntegerType()) for t in terms]
    )

    def _build():
        @F.pandas_udf(out_type)
        def _feat(texts):
            cols: dict[str, list] = {f.name: [] for f in out_type.fields}
            for txt in texts:
                if txt is None:
                    for name in cols:
                        cols[name].append(None)
                    continue
                toks = [t for t in ws.split(txt.lower()) if t]
                counts = Counter(toks)
                cols["dl"].append(len(toks))
                for t in terms:
                    cols[f"tf_{t}"].append(counts.get(t, 0))
            return pd.DataFrame(cols)

        return _feat

    from quackspark.functions._udfmemo import memo_udf

    return memo_udf(("fts_feat", tuple(terms)), _build)(text)


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 score for a fixed bag of query terms.
    Ties (and cross-engine float jitter) are neutralized by ranking on
    the 6-dp rounded score with the doc id as tiebreak.

    Feature extraction (dl + per-term tf) is one Arrow kernel pass per
    document (bm25_features_arrow); the scoring arithmetic and the
    broadcast corpus-stats join stay codegen'd expressions."""
    from quackspark.queries._util import parallelize_kernel_input

    # lazily checkpointed: feat feeds BOTH the corpus-stats aggregate and
    # the scoring projection — without the cut Spark re-executes the
    # Arrow kernel (and its input exchange) once per consumer (r13: the
    # plan showed two ArrowEvalPython + two exchanges for one kernel).
    # The materialized frame is the narrow (doc, dl, tf…) features, never
    # the text.
    feat = parallelize_kernel_input(df).select(
        F.col(id_col).alias("doc"),
        bm25_features_arrow(F.col(text_col), terms).alias("f"),
    ).select("doc", "f.dl", *[f"f.tf_{t}" for t in terms]).localCheckpoint(
        eager=False
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
