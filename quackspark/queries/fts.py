"""Full-text-search corpus queries (operators/fts.py): BM25 top-k over
`documents` — parity target is the reference's `fts` extension surface
(/root/reference/duckdb-7.cpp:4405-4410 known-extension list;
`match_bm25` is what its users call). The oracle recomputes the exact
formula in SQL — same expression tree, same fixed term order, 6-dp
rounding on the ranking key — so the differential check covers tf/df
computation, length normalization, and the top-k cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from quackspark.operators import fts as X
from quackspark.queries._util import load_table
from quackspark.queries.textops import _SQL_TOKS_LOWER

TERMS = ["spark", "hash", "vector"]


def fts_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.bm25_topk(d, "text", "doc_id", TERMS, k=10)


QUERIES = {"fts_bm25_topk": fts_bm25_topk}


def _score_sql() -> str:
    terms = []
    for t in TERMS:
        tf = f"CAST(tf_{t} AS DOUBLE)"
        dfq = f"CAST(df_{t} AS DOUBLE)"
        idf = f"ln((CAST(n AS DOUBLE) - {dfq} + 0.5) / ({dfq} + 0.5) + 1.0)"
        denom = (
            f"({tf} + {X.K1} * (1.0 - {X.B} + {X.B} * "
            f"CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / n)))"
        )
        terms.append(f"{idf} * {tf} * {X.K1 + 1.0} / {denom}")
    return " + ".join(terms)


ORACLES = {
    "fts_bm25_topk": f"""
        WITH feat AS (
            SELECT doc_id AS doc, len(toks) AS dl,
                   {", ".join(f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in TERMS)}
            FROM (SELECT doc_id, {_SQL_TOKS_LOWER} AS toks FROM documents) _b
        ), stats AS (
            SELECT count(*) AS n, sum(dl) AS sdl,
                   {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in TERMS)}
            FROM feat
        )
        SELECT doc, dl, {", ".join(f"tf_{t}" for t in TERMS)},
               round({_score_sql()}, 6) AS score
        FROM feat CROSS JOIN stats
        ORDER BY score DESC, doc LIMIT 10
    """,
}
