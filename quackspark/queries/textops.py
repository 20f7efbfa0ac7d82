"""Text analysis over the `documents` table — the training-data pipeline
layer on top of the reference's string functions (duckdb-6.cpp:5993-6040):
token counting, quality scoring, n-gram/stopword language-ID, rolling-hash
fingerprinting.

All pure Column expressions + higher-order functions (functions/text.py):
per-row, shuffle-free until the final aggregate, pushdown-friendly — at
100 TB this runs as a single map stage over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.functions import text as T
from quackspark.queries._util import (
    davg,
    load_table,
    o_davg,
    parallelize_kernel_input,
)

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "in"],
    "de": ["der", "die", "das", "und", "ein"],
    "fr": ["le", "la", "les", "et", "un"],
    "es": ["el", "la", "los", "y", "una"],
}


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish sub-word tokens, distinct
    tokens, mean token length."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").alias("chars"),
        F.size(toks).alias("n_tok"),
        F.size(T.bpe_ish_tokens(F.col("text"))).alias("n_bpe"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
            )
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("mean_len"),
    ).orderBy("doc_id")


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: train a bigram model ON the corpus
    itself (one groupBy per n-gram order), then score each document by
    its mean bigram log-probability ln(c(w1 w2)/c(w1 ·)). Low scores =
    incoherent/boilerplate text — the standard pretraining quality gate.

    Determinism contract: per-position log-probs are re-collected and
    folded in position order (array_sort on (pos, lp) structs), so the
    sum never depends on Spark's partial-agg order and the oracle can
    replay it with `list(lp ORDER BY pos)` + the same left fold.

    Scale shape (100 TB): bigram/first-word count tables are vocab-sized
    (tiny vs corpus) — broadcast them; the per-doc re-collect groups by
    doc_id, a uniform key. One pass to count, one to score.
    """
    d = load_table(spark, sf_dir, "documents")
    toked = d.select(
        F.col("doc_id").alias("doc"),
        T.tokens(F.lower(F.col("text"))).alias("t"),
    )
    n = F.size("t")
    pairs = toked.where(n >= 2).select(
        "doc",
        F.posexplode(
            F.arrays_zip(
                F.slice("t", 1, n - 1).alias("w1"),
                F.slice(F.col("t"), 2, n - 1).alias("w2"),
            )
        ).alias("pos", "p"),
    )
    bg = pairs.select(
        "doc",
        "pos",
        F.col("p.w1").alias("w1"),
        F.concat_ws(" ", "p.w1", "p.w2").alias("b"),
    )
    bgc = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    w1c = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    scored = (
        bg.join(F.broadcast(bgc), "b")
        .join(F.broadcast(w1c), "w1")
        .select(
            "doc",
            "pos",
            F.log(F.col("cb").cast("double") / F.col("cw")).alias("lp"),
        )
    )
    agg = scored.groupBy("doc").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lp"))), lambda s: s["lp"]
        ).alias("lps")
    )
    out = toked.join(agg, "doc", "left").select(
        "doc",
        F.coalesce(F.size("lps"), F.lit(0)).alias("n_bigrams"),
        F.round(
            F.coalesce(
                F.aggregate("lps", F.lit(0.0), lambda a, x: a + x)
                / F.size("lps"),
                F.lit(0.0),
            ),
            6,
        ).alias("avg_logprob"),
    )
    return out.orderBy("doc")


_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24  # 8-token overlap


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking: overlapping token windows (32 tokens, stride
    24) per document — the retrieval-prep stage between cleaning and
    embedding. Pure expression pipeline: window starts come from
    `sequence`, slices from `slice`, all inside one codegen projection;
    the only row expansion is the posexplode of the per-doc window list.
    Zero-token documents are excluded (no window to emit)."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select(
        F.col("doc_id").alias("doc"), T.tokens(F.lower(F.col("text"))).alias("t")
    ).where(F.size("t") >= 1)
    starts = F.sequence(F.lit(1), F.size("t"), F.lit(_CHUNK_STRIDE))
    wins = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(F.col("t"), s, _CHUNK_TOKENS))
    )
    out = toked.select("doc", F.posexplode(wins).alias("i", "chunk"))
    return out.select(
        "doc",
        (F.col("i") + 1).alias("chunk_no"),
        "chunk",
        F.size(T.tokens(F.col("chunk"))).alias("n_tokens"),
    ).orderBy("doc", "chunk_no")


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, punctuation ratio, digit ratio,
    type-token ratio → composite score in [0,1]."""
    d = load_table(spark, sf_dir, "documents")
    # tokens staged in their own projection: the score references the
    # array 3× and interpreted HOFs are not CSE'd (quality_score_toks
    # docstring / _exploded_shingles CollapseProject precedent)
    d = d.select("doc_id", "text", T.tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    ntok = F.greatest(F.size(toks), F.lit(1))
    nchar = F.greatest(F.length("text"), F.lit(1))
    stop_ratio = T.stopword_hits(toks, _STOPWORDS["en"]) / ntok
    punct_ratio = T.char_class_count(F.col("text"), ".,!?;:") / nchar
    digit_ratio = T.char_class_count(F.col("text"), "0123456789") / nchar
    ttr = F.size(F.array_distinct(toks)) / ntok
    score = (
        F.lit(0.25) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.25) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.25) * (1 - F.least(digit_ratio * 10, F.lit(1.0)))
        + F.lit(0.25) * ttr
    )
    return d.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(ttr, 6).alias("ttr"),
        F.round(score, 6).alias("quality"),
    ).orderBy("doc_id")


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword hit counts, argmax with
    deterministic tie-break (en > de > fr > es > unknown)."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.lower(F.col("text")))
    hits = {lang: T.stopword_hits(toks, words) for lang, words in _STOPWORDS.items()}
    best = F.greatest(*hits.values())
    guess = (
        F.when(best == 0, "unknown")
        .when(hits["en"] == best, "en")
        .when(hits["de"] == best, "de")
        .when(hits["fr"] == best, "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        "lang",
        *[hits[lang].alias(f"hits_{lang}") for lang in _STOPWORDS],
        guess.alias("lang_guess"),
    ).orderBy("doc_id")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: Rabin-Karp rolling hash over the token
    stream + md5 of the normalized text + min-token-digest (a 1-permutation
    MinHash) — the exact-dup and near-dup keys used by the dedup operators.

    Hot path is ONE Arrow kernel (functions/text.fingerprint_arrow): the
    expression form was three interpreted HOF walks per row (fold +
    per-token md5) and measured 3.4× vs DuckDB at sf1 with superlinear
    growth; the kernel computes all three fingerprints in a single batched
    pass (tests pin kernel == expression form == oracle)."""
    d = parallelize_kernel_input(load_table(spark, sf_dir, "documents"))
    return (
        d.select("doc_id", T.fingerprint_arrow(F.col("text")).alias("fp"))
        .select("doc_id", "fp.rk_fp", "fp.md5_fp", "fp.minhash1")
        .orderBy("doc_id")
    )


def text_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling rollup: per (source, lang) doc counts, token totals,
    mean quality inputs — the aggregation stage after the per-row map."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return (
        d.select("source", "lang", F.size(toks).alias("ntok"), F.length("text").alias("nch"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("ntok").alias("tokens"),
            F.sum("nch").alias("chars"),
            F.round(F.avg("ntok"), 6).alias("mean_tokens"),
        )
        .orderBy("source", "lang")
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher-style filters a training
    pipeline gates on): duplicate-bigram fraction per document and the
    most-frequent-token mass ratio. The bigram part is a per-row HOF; the
    top-token part is the map-reduce shape (explode → per-(doc,token)
    count → per-doc max), partial-aggregated both levels."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    grams = T.word_shingles(toks, 2)
    per_row = d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.round(
            F.when(
                F.size(grams) > 0,
                1 - F.size(F.array_distinct(grams)) / F.size(grams),
            ).otherwise(0.0),
            6,
        ).alias("dup_bigram_frac"),
    )
    tok_counts = (
        d.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok_n"))
    )
    return (
        per_row.join(tok_counts, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            "dup_bigram_frac",
            "top_tok_n",
            F.round(F.col("top_tok_n") / F.greatest(F.col("n_tok"), F.lit(1)), 6)
            .alias("top_tok_ratio"),
        )
        .orderBy("doc_id")
    )


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: global token frequencies, top 20 —
    the vocabulary-building scan of a tokenizer-training pipeline. One
    explode + count shuffle, then TakeOrdered."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


#: PII patterns — Java-regex ∩ RE2 subset so the identical literal runs on
#: both engines (no lookaround, no backrefs)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{4}-\d{4}"
_IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (the scrub stage of an LLM training-data
    pipeline; capability extension — the reference's regex surface is
    duckdb-6.cpp:4822-4860). The fixture corpus carries no PII, so a
    deterministic dirty column is constructed per row, then detected and
    redacted with pure regexp expressions — whole-stage codegen, no
    Python. Redaction order: email → phone → IP (email eats its host
    before the IP pattern could)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 2000)
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@mail"),
        F.col("doc_id") % 7,
        F.lit(".example.com or call 555-12"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit("-4321 from 10.0."),
        F.col("doc_id") % 256,
        F.lit("."),
        (F.col("doc_id") * 7) % 256,
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(dirty, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(dirty, F.lit(_EMAIL_RE)).cast("bigint").alias("n_email"),
        F.regexp_count(dirty, F.lit(_PHONE_RE)).cast("bigint").alias("n_phone"),
        F.regexp_count(dirty, F.lit(_IP_RE)).cast("bigint").alias("n_ip"),
        # explicit last-80-chars form — identical clamping on both engines
        F.substring(
            scrubbed, F.greatest(F.length(scrubbed) - 79, F.lit(1)), F.lit(80)
        ).alias("scrub_tail"),
    ).orderBy("doc_id")


#: hashed-feature buckets of the linear classifier
_CLS_BUCKETS = 256


def text_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear classifier inference over hashed token features — the
    fastText-style 'apply a small model to every document' pass a
    curation pipeline runs at full-corpus scale. The model here is a
    deterministic md5-derived weight table (so the oracle replays it
    bit-for-bit without shipping artifacts); a real deployment swaps the
    generated CTE for its trained weights and keeps the identical plan:
    weights generated IN-PLAN from range(B) and broadcast into the
    token→bucket join, per-doc mean via the exact scaled-long path, one
    shuffle keyed by doc_id. Nothing about the plan changes when B grows
    to a few million parameters — the broadcast is the model size."""
    d = load_table(spark, sf_dir, "documents")
    weights = spark.range(_CLS_BUCKETS).select(
        F.col("id").cast("int").alias("bucket"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("w"), F.col("id"))), 1, 4),
                16, 10,
            ).cast("long") % 2000 / 1000.0 - 1.0
        ).alias("w"),
    )
    toks = d.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
            % _CLS_BUCKETS
        ).cast("int").alias("bucket"),
    )
    return (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            davg("w").alias("score"),
        )
        .withColumn("keep", F.col("score") > 0)
        .orderBy("doc_id")
    )




def pipeline_lm_head_middle_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: bucket the corpus by corpus-trained
    LM score terciles (head = most fluent third, tail = least) — the
    canonical perplexity-stratified curation step before sampling. The
    tercile thresholds are ONE global percentile row broadcast back
    (rounded 6dp on both engines so boundary docs bucket identically);
    the LM scores come from text_bigram_logprob's plan, so the whole
    split is counts + one tiny agg on top of the scoring pass."""
    scores = text_bigram_logprob(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("doc"), "source"
    )
    s = scores.join(d, "doc")
    th = s.agg(
        F.round(F.expr("percentile(avg_logprob, 0.3333333333333333)"), 6).alias("t1"),
        F.round(F.expr("percentile(avg_logprob, 0.6666666666666666)"), 6).alias("t2"),
    )
    j = s.crossJoin(F.broadcast(th))
    bucket = (
        F.when(F.col("avg_logprob") < F.col("t1"), "tail")
        .when(F.col("avg_logprob") < F.col("t2"), "middle")
        .otherwise("head")
    )
    return (
        j.select(bucket.alias("bucket"), "source", "avg_logprob")
        .groupBy("bucket", "source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(davg("avg_logprob"), 6).alias("mean_lp"),
        )
        .orderBy("bucket", "source")
    )

def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py — beyond the
    reference, which has no tokenizer trainer): one corpus-wide
    word-frequency shuffle, then each merge is a pair-count groupBy over
    the cached DISTINCT-word table + a 1-row argmax. Deterministic
    tie-breaking (count DESC, pair ASC) makes the merge table
    reproducible; tests/test_bpe.py pins it against a pure-Python
    reference trainer exactly. Rows-only for the driver (BPE training is
    not SQL-expressible for the oracle)."""
    from quackspark.operators.bpe import merge_table_df, train_bpe
    from quackspark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", 24)
    return merge_table_df(spark, merges)


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoded with the trained merge table (operators/bpe.py
    apply_bpe: Arrow-batched rank-greedy kernel, merge ranks shipped in
    the closure — never corpus-proportional): top trained-token
    frequencies, deterministic ordering."""
    from quackspark.operators.bpe import apply_bpe, train_bpe
    from quackspark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", 16)
    enc = apply_bpe(docs, "text", merges)
    return (
        enc.select(F.explode("bpe_tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(40)
    )


QUERIES = {
    "text_bpe_train": text_bpe_train,
    "text_bpe_encode": text_bpe_encode,
    "text_hashed_classifier": text_hashed_classifier,
    "pipeline_lm_head_middle_tail": pipeline_lm_head_middle_tail,
    "text_bigram_logprob": text_bigram_logprob,
    "text_chunk_windows": text_chunk_windows,
    "text_pii_scrub": text_pii_scrub,
    "text_repetition": text_repetition,
    "text_vocab_topk": text_vocab_topk,
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_source_profile": text_source_profile,
}

_SQL_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')"
_SQL_TOKS_LOWER = (
    r"list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t != '')"
)


def _sql_hits(toks: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter({toks}, t -> list_contains([{lst}], lower(t))))"
    )


def _sql_bigrams() -> str:
    # dedup's _TOKS (lambda var `x`) — textops' `t`-lambda collides with
    # the shingle subquery's column alias `t` in DuckDB's binder
    from quackspark.queries.dedup import _sql_shingles, _TOKS

    return _sql_shingles(_TOKS, 2)


ORACLES = {
    "text_pii_scrub": f"""
        WITH dirty AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id || '@mail'
                        || (doc_id % 7) || '.example.com or call 555-12'
                        || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                        || '-4321 from 10.0.' || (doc_id % 256) || '.'
                        || ((doc_id * 7) % 256) AS s
            FROM documents WHERE doc_id <= 2000
        ), scrub AS (
            SELECT doc_id, s,
                   regexp_replace(regexp_replace(regexp_replace(s,
                       '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PHONE_RE}', '<PHONE>', 'g'),
                       '{_IP_RE}', '<IP>', 'g') AS sc
            FROM dirty
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(s, '{_EMAIL_RE}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(s, '{_PHONE_RE}')) AS BIGINT)
                   AS n_phone,
               CAST(len(regexp_extract_all(s, '{_IP_RE}')) AS BIGINT) AS n_ip,
               substr(sc, greatest(length(sc) - 79, 1), 80) AS scrub_tail
        FROM scrub ORDER BY doc_id
    """,
    "text_repetition": f"""
        WITH g AS (
            SELECT doc_id,
                   CAST(len({_SQL_TOKS}) AS INT) AS n_tok,
                   {_sql_bigrams()} AS grams
            FROM documents
        ), per_row AS (
            SELECT doc_id, n_tok,
                   CASE WHEN len(grams) > 0
                        THEN round(1 - CAST(len(list_distinct(grams))
                                            AS DOUBLE) / len(grams), 6)
                        ELSE 0.0 END AS dup_bigram_frac
            FROM g
        ), tc AS (
            SELECT doc_id, max(c) AS top_tok_n FROM (
                SELECT doc_id, tok, count(*) AS c FROM (
                    SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
                ) GROUP BY 1, 2
            ) GROUP BY 1
        )
        SELECT per_row.doc_id, n_tok, dup_bigram_frac, top_tok_n,
               round(CAST(top_tok_n AS DOUBLE) / greatest(n_tok, 1), 6)
                   AS top_tok_ratio
        FROM per_row JOIN tc ON per_row.doc_id = tc.doc_id
        ORDER BY per_row.doc_id
    """,
    "text_vocab_topk": f"""
        SELECT tok, count(*) AS n
        FROM (SELECT unnest({_SQL_TOKS_LOWER}) AS tok FROM documents)
        GROUP BY tok ORDER BY n DESC, tok LIMIT 20
    """,
    "text_token_stats": f"""
        SELECT doc_id,
               CAST(length(text) AS INT) AS chars,
               CAST(len({_SQL_TOKS}) AS INT) AS n_tok,
               CAST(len(list_filter(string_split_regex(trim(
                   regexp_replace(regexp_replace(text, '([a-z])([0-9])', '\\1 \\2', 'g'),
                                  '([0-9])([a-z])', '\\1 \\2', 'g')),
                   '\\s+'), t -> t != '')) AS INT) AS n_bpe,
               CAST(len(list_distinct({_SQL_TOKS})) AS INT) AS n_uniq,
               round(CAST(list_sum(list_transform({_SQL_TOKS}, t -> length(t)))
                          AS DOUBLE)
                     / greatest(len({_SQL_TOKS}), 1), 6) AS mean_len
        FROM documents ORDER BY doc_id
    """,
    "text_quality_score": f"""
        WITH scored AS (
            SELECT doc_id,
                   {_SQL_TOKS} AS toks,
                   greatest(len({_SQL_TOKS}), 1) AS ntok,
                   greatest(length(text), 1) AS nchar,
                   length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                       AS npunct,
                   length(text) - length(regexp_replace(text, '[0123456789]', '', 'g'))
                       AS ndigit
            FROM documents
        ), ratios AS (
            SELECT doc_id,
                   CAST({_sql_hits("toks", _STOPWORDS["en"])} AS DOUBLE) / ntok
                       AS stop_ratio,
                   CAST(npunct AS DOUBLE) / nchar AS punct_ratio,
                   CAST(ndigit AS DOUBLE) / nchar AS digit_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / ntok AS ttr
            FROM scored
        )
        SELECT doc_id,
               round(stop_ratio, 6) AS stop_ratio,
               round(punct_ratio, 6) AS punct_ratio,
               round(digit_ratio, 6) AS digit_ratio,
               round(ttr, 6) AS ttr,
               round(0.25 * least(stop_ratio * 5, 1.0)
                     + 0.25 * (1 - least(punct_ratio * 10, 1.0))
                     + 0.25 * (1 - least(digit_ratio * 10, 1.0))
                     + 0.25 * ttr, 6) AS quality
        FROM ratios ORDER BY doc_id
    """,
    "text_lang_id": f"""
        WITH h AS (
            SELECT doc_id, lang,
                   {_sql_hits(_SQL_TOKS_LOWER, _STOPWORDS["en"])} AS hits_en,
                   {_sql_hits(_SQL_TOKS_LOWER, _STOPWORDS["de"])} AS hits_de,
                   {_sql_hits(_SQL_TOKS_LOWER, _STOPWORDS["fr"])} AS hits_fr,
                   {_sql_hits(_SQL_TOKS_LOWER, _STOPWORDS["es"])} AS hits_es
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(hits_en AS INT) AS hits_en,
               CAST(hits_de AS INT) AS hits_de,
               CAST(hits_fr AS INT) AS hits_fr,
               CAST(hits_es AS INT) AS hits_es,
               CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0
                        THEN 'unknown'
                    WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es)
                        THEN 'en'
                    WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es)
                        THEN 'de'
                    WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es)
                        THEN 'fr'
                    ELSE 'es' END AS lang_guess
        FROM h ORDER BY doc_id
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform({_SQL_TOKS},
                           t -> CAST(length(t) * 31 + ascii(t) AS BIGINT))),
                   (a, b) -> (a * 131 + b) % 1000000007) AS BIGINT) AS rk_fp,
               md5(list_aggregate({_SQL_TOKS}, 'string_agg', ' ')) AS md5_fp,
               list_min(list_transform({_SQL_TOKS}, t -> md5(t))) AS minhash1
        FROM documents ORDER BY doc_id
    """,
    "text_source_profile": f"""
        SELECT source, lang,
               count(*) AS docs,
               sum(CAST(len({_SQL_TOKS}) AS BIGINT)) AS tokens,
               sum(CAST(length(text) AS BIGINT)) AS chars,
               round(avg(CAST(len({_SQL_TOKS}) AS DOUBLE)), 6) AS mean_tokens
        FROM documents
        GROUP BY source, lang ORDER BY source, lang
    """,
}


# bigram LM scoring oracle: identical counts, identical position-ordered
# left fold (the Spark side's array_sort(collect_list(struct)) + aggregate)
ORACLES["text_hashed_classifier"] = f"""
    WITH weights AS (
        SELECT CAST(i AS INT) AS bucket,
               ('0x' || substr(md5('w' || i), 1, 4))::BIGINT % 2000
                   / 1000.0 - 1.0 AS w
        FROM generate_series(0, {_CLS_BUCKETS - 1}) _r(i)
    ), toks AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 4))::BIGINT
                    % {_CLS_BUCKETS} AS INT) AS bucket
        FROM (SELECT doc_id, unnest({{toks}}) AS tok FROM documents) _t
    )
    SELECT doc_id, count(*) AS n_tok,
           {o_davg('w')} AS score,
           {o_davg('w')} > 0 AS keep
    FROM toks JOIN weights USING (bucket)
    GROUP BY doc_id ORDER BY doc_id
""".replace("{toks}", _SQL_TOKS_LOWER)



# head/middle/tail: identical scoring CTEs as text_bigram_logprob, then
# quantile_cont terciles (rounded 6dp like the Spark side) and the rollup
ORACLES["pipeline_lm_head_middle_tail"] = f"""
    WITH toked AS (
        SELECT doc_id AS doc, {_SQL_TOKS_LOWER} AS t FROM documents
    ), bg AS (
        SELECT doc, i AS pos, t[i] AS w1, t[i] || ' ' || t[i+1] AS b
        FROM (SELECT doc, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toked WHERE len(t) >= 2) _e
    ), bgc AS (
        SELECT b, count(*) AS cb FROM bg GROUP BY b
    ), w1c AS (
        SELECT w1, count(*) AS cw FROM bg GROUP BY w1
    ), scored AS (
        SELECT doc, pos, ln(CAST(cb AS DOUBLE) / cw) AS lp
        FROM bg JOIN bgc USING (b) JOIN w1c USING (w1)
    ), agg AS (
        SELECT doc, list(lp ORDER BY pos) AS lps FROM scored GROUP BY doc
    ), per_doc AS (
        SELECT t.doc,
               round(coalesce(
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lps),
                               (x, y) -> x + y) / len(lps),
                   0.0), 6) AS avg_logprob,
               d.source
        FROM toked t LEFT JOIN agg ON agg.doc = t.doc
        JOIN documents d ON d.doc_id = t.doc
    ), th AS (
        SELECT round(quantile_cont(avg_logprob, 0.3333333333333333), 6) AS t1,
               round(quantile_cont(avg_logprob, 0.6666666666666666), 6) AS t2
        FROM per_doc
    )
    SELECT CASE WHEN avg_logprob < t1 THEN 'tail'
                WHEN avg_logprob < t2 THEN 'middle'
                ELSE 'head' END AS bucket,
           source,
           count(*) AS docs,
           round({o_davg('avg_logprob')}, 6) AS mean_lp
    FROM per_doc CROSS JOIN th
    GROUP BY 1, 2 ORDER BY bucket, source
"""

ORACLES["text_bigram_logprob"] = f"""
    WITH toked AS (
        SELECT doc_id AS doc, {_SQL_TOKS_LOWER} AS t FROM documents
    ), bg AS (
        SELECT doc, i AS pos, t[i] AS w1, t[i] || ' ' || t[i+1] AS b
        FROM (SELECT doc, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toked WHERE len(t) >= 2) _e
    ), bgc AS (
        SELECT b, count(*) AS cb FROM bg GROUP BY b
    ), w1c AS (
        SELECT w1, count(*) AS cw FROM bg GROUP BY w1
    ), scored AS (
        SELECT doc, pos, ln(CAST(cb AS DOUBLE) / cw) AS lp
        FROM bg JOIN bgc USING (b) JOIN w1c USING (w1)
    ), agg AS (
        SELECT doc, list(lp ORDER BY pos) AS lps FROM scored GROUP BY doc
    )
    SELECT t.doc,
           coalesce(len(lps), 0) AS n_bigrams,
           round(coalesce(
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lps),
                           (x, y) -> x + y) / len(lps),
               0.0), 6) AS avg_logprob
    FROM toked t LEFT JOIN agg ON agg.doc = t.doc
    ORDER BY t.doc
"""


# chunk-window oracle: same starts (generate_series inclusive), same
# inclusive-slice reassembly, same zero-token exclusion
ORACLES["text_chunk_windows"] = f"""
    WITH toked AS (
        SELECT doc_id AS doc, {_SQL_TOKS_LOWER} AS t FROM documents
    ), wins AS (
        SELECT doc, t,
               unnest(generate_series(1, len(t), {_CHUNK_STRIDE})) AS s
        FROM toked WHERE len(t) >= 1
    )
    SELECT doc,
           CAST((s - 1) / {_CHUNK_STRIDE} + 1 AS INT) AS chunk_no,
           list_aggregate(t[s : least(s + {_CHUNK_TOKENS - 1}, len(t))],
                          'string_agg', ' ') AS chunk,
           least(s + {_CHUNK_TOKENS - 1}, len(t)) - s + 1 AS n_tokens
    FROM wins ORDER BY doc, chunk_no
"""
