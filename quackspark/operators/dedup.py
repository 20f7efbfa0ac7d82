"""Deduplication operators for the training-data pipeline: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Built on the reference's similarity primitives (jaccard/levenshtein/
mismatches, duckdb-6.cpp:6020-6021) but restructured for scale: the
reference computes pairwise similarity on demand inside one process; at
100 TB the all-pairs product is impossible, so every near-dup operator
here goes through a *blocking* stage first (shared shingle, LSH band
bucket, or SimHash band) so the only shuffle is on block keys and the
quadratic verify runs per-bucket on candidate pairs only.

Portability: all hashing is md5-derived (`md5_int32`), identical in
Spark (`conv(hex,16,10)`) and DuckDB (`('0x'||hex)::BIGINT`) — never an
engine-native `hash()`, whose values are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quackspark.functions import text as T


def md5_int32(c: Column, seed: int | None = None) -> Column:
    """First 32 bits of md5(seed|value) as a non-negative BIGINT — the
    portable hash family indexed by `seed` used for MinHash permutations."""
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 8), 16, 10).cast("long")


def _seeded_hasher(seed: int):
    # NB: the lambda must take exactly one parameter — PySpark dispatches
    # transform()'s (element, index) form on lambda arity, so a default
    # second parameter silently binds the array index.
    return lambda s: md5_int32(s, seed)


def minhash_signature(shingles: Column, n_hashes: int) -> Column:
    """MinHash signature: per hash-seed i, min over the shingle set of
    md5_int32(i|shingle). Approximates Jaccard: P(sig_a[i]=sig_b[i]) = J."""
    return F.array(
        *[F.array_min(F.transform(shingles, _seeded_hasher(i))) for i in range(n_hashes)]
    )


def lsh_band_keys(sig: Column, bands: int, rows: int) -> Column:
    """Split the signature into `bands` bands of `rows` values; each band
    key is 'band_index:joined-values'. Docs sharing any band key become
    candidate pairs — the blocking structure that replaces all-pairs."""
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(b),
                F.concat_ws(",", F.slice(sig, b * rows + 1, rows)),
            )
            for b in range(bands)
        ]
    )


def simhash32(toks: Column) -> Column:
    """32-bit SimHash over the token stream: bit i is set when the sum over
    tokens of ±1 (by bit i of the token's md5_int32) is positive."""
    codes = F.transform(toks, lambda t: md5_int32(t))

    def _bit_folder(bit: int):
        return lambda acc, c: acc + F.when(
            F.shiftright(c, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(32):
        bit_sum = F.aggregate(codes, F.lit(0).cast("long"), _bit_folder(i))
        out = out + F.when(bit_sum > 0, F.lit(2**i).cast("long")).otherwise(0)
    return out


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on the whitespace-normalized lowered text: one shuffle
    on the 128-bit fingerprint, survivor = min id per group."""
    norm = F.concat_ws(" ", T.tokens(F.lower(F.col(text_col))))
    return (
        df.select(F.col(id_col), F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("survivor"),
            F.count(F.lit(1)).alias("dupes"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact k-shingle Jaccard.

    Plan shape: explode distinct shingles → self-equi-join on the shingle
    (the blocking key — only docs sharing a shingle meet) → per-pair
    intersection counts → Jaccard from |A|+|B|-|∩|. The shuffle key is the
    shingle, so skew = hottest shingle; at scale drop top-frequency
    shingles (stopword shingles) before the join.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(T.word_shingles(T.tokens(F.col(text_col)), k))).alias("sh"),
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("nsh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    sa = sizes.select(F.col("doc").alias("d1"), F.col("nsh").alias("n1"))
    sb = sizes.select(F.col("doc").alias("d2"), F.col("nsh").alias("n2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .select(
            "d1",
            "d2",
            F.round(
                F.col("ninter") / (F.col("n1") + F.col("n2") - F.col("ninter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: signature → band keys → candidate pairs
    from band-bucket equi-join → verify with the *estimated* Jaccard
    (signature agreement rate).

    The 100 TB shape: per-row signature map (no shuffle), one shuffle on
    band keys, per-bucket pairing; bucket sizes are ~collision counts, not
    corpus size, so the join never goes quadratic in the corpus.
    """
    sig_df = df.select(
        F.col(id_col).alias("doc"),
        minhash_signature(
            F.array_distinct(T.word_shingles(T.tokens(F.col(text_col)), k)), n_hashes
        ).alias("sig"),
    )
    rows = n_hashes // bands
    banded = sig_df.select(
        "doc", "sig", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.col("a.sig").alias("sig1"),
            F.col("b.sig").alias("sig2"),
        )
        .dropDuplicates(["d1", "d2"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig1"), F.col("sig2"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    return cand.select(
        "d1",
        "d2",
        F.round(agree / F.lit(n_hashes), 6).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= threshold)


def simhash_docs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document 32-bit SimHash plus its four 8-bit bands (the blocking
    keys for hamming-distance≤k search: distance≤3 pairs must agree on at
    least one of 4 bands)."""
    toks = T.tokens(F.lower(F.col(text_col)))
    out = df.select(F.col(id_col).alias("doc"), simhash32(toks).alias("simhash"))
    return out.select(
        "doc",
        "simhash",
        *[
            F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)).alias(f"band{b}")
            for b in range(4)
        ],
    )
