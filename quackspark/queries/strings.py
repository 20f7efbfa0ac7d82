"""String / regex / similarity functions (reference registration
duckdb-6.cpp:5993-6040; LIKE-family operators duckdb-6.cpp:3862-3880;
RE2 regex fns duckdb-6.cpp:4822-4860).

Spark-first: every query below is pure built-in Column expressions
(whole-stage codegen'd) except jaro_winkler, which is an Arrow-vectorized
pandas UDF (compat.jaro_winkler) — the vectorized-UDF slot the reference
fills with CreateVectorizedFunction (duckdb.hpp:19002-19022).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.functions import compat
from quackspark.queries._util import load_table


def str_basic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/length/reverse/substring/lpad/rpad/trim/replace/repeat/
    left/right/ascii/chr (duckdb-6.cpp:5993-6040)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    name = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.lower(name).alias("lo"),
        F.upper(F.col("c_mktsegment")).alias("up"),
        F.length(name).alias("len"),
        F.reverse(name).alias("rev"),
        F.substring(name, 10, 5).alias("sub"),
        F.lpad(F.col("c_mktsegment"), 12, ".").alias("lp"),
        F.rpad(F.col("c_mktsegment"), 12, ".").alias("rp"),
        F.trim(F.lit("  x  ")).alias("tr"),
        F.regexp_replace(name, "Customer", "Cust").alias("repl"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.substring(name, 1, 8).alias("l8"),
        name.substr(F.length(name) - 2, F.lit(3)).alias("r3"),
        F.ascii(name).alias("asc"),
        F.chr(F.col("c_custkey") % 26 + 65).alias("ch"),
    )


def str_concat_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat / || / concat_ws / string_split / split_part
    (duckdb-6.cpp:5995,6017)."""
    nation = load_table(spark, sf_dir, "nation")
    sentence = F.concat_ws(" ", F.lit("the"), F.col("n_name"), F.lit("nation"))
    return nation.select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit("-"), F.col("n_regionkey")).alias("cat"),
        F.concat_ws("/", F.col("n_name"), F.col("n_regionkey"), F.lit("x")).alias("catws"),
        # word list serialized: driver canon cannot hash ArrayType columns
        F.to_json(F.split(sentence, " ")).alias("words"),
        F.split_part(sentence, F.lit(" "), F.lit(2)).alias("word2"),
    ).orderBy("n_nationkey")


def str_like_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE / starts_with / contains / ends_with operators
    (~~ family, duckdb-6.cpp:3862-3880)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_name").like("%green%").alias("has_green"),
        F.col("p_name").ilike("%BLUE%").alias("has_blue_i"),
        F.col("p_type").startswith("STANDARD").alias("is_std"),
        F.col("p_brand").contains("#3").alias("brand3"),
        F.col("p_type").endswith("COPPER").alias("ends_cu"),
        F.col("p_name").like("a%").alias("a_prefix"),
    ).orderBy("p_partkey")


def str_glob_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOB (pattern-translated to anchored regex, compat.glob_to_regex) +
    regexp_matches / regexp_replace / regexp_extract (duckdb-6.cpp:4822-4860).
    RE2 and Java regex agree on this class-and-quantifier subset."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_name").rlike(compat.glob_to_regex("*mint*")).alias("glob_mint"),
        F.col("p_name").rlike("^[a-f]").alias("re_af"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devowel"),
        F.regexp_extract(F.col("p_name"), "([a-z]+)$", 1).alias("last_word"),
        F.col("p_type").rlike("^PROMO.*STEEL$").alias("full_match"),
    ).orderBy("p_partkey")


def str_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """levenshtein / jaccard / mismatches(hamming) / jaro_winkler
    (duckdb-6.cpp:6020-6021) — the primitives under the dedup operators."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("a")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("b")
    )
    pairs = n1.join(n2, F.col("k1") < F.col("k2"))
    return pairs.select(
        "k1",
        "k2",
        F.levenshtein("a", "b").alias("lev"),
        F.round(compat.jaccard("a", "b"), 6).alias("jac"),
        compat.hamming(F.substring("a", 1, 4), F.substring("b", 1, 4)).alias("ham4"),
        F.round(compat.jaro_winkler("a", "b"), 6).alias("jw"),
    ).orderBy("k1", "k2")


def str_codec_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / base64 / from_base64 roundtrip / printf(format_string)
    (duckdb-6.cpp:6005-6036)."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.md5(F.col("s_name")).alias("h"),
        F.base64(F.col("s_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("s_name").cast("binary")))
        .cast("string")
        .alias("roundtrip"),
        F.format_string("supp %d: %s", F.col("s_suppkey"), F.col("s_name")).alias(
            "fmt"
        ),
    ).orderBy("s_suppkey")


def str_accents_bar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strip_accents (translate-table form) + bar chart string
    (duckdb-6.cpp:5996,6014). Bar values are integers so both engines emit
    whole blocks only."""
    region = load_table(spark, sf_dir, "region")
    accented = F.concat(F.lit("café-"), F.col("r_name"), F.lit("-ñöü"))
    return region.select(
        "r_regionkey",
        compat.strip_accents(accented).alias("plain"),
        compat.bar(F.col("r_regionkey").cast("double"), 0.0, 4.0, 8).alias("bar8"),
    ).orderBy("r_regionkey")


def str_bits_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIT functions (get_bit/set_bit, duckdb-6.cpp:6030-6032) over the
    '0'/'1'-string representation (Spark has no BIT type — SURVEY.md §1.2
    maps BIT→string), plus LIKE…ESCAPE (like_escape, duckdb-6.cpp:3880),
    instr/prefix/suffix/unicode. The oracle computes get_bit/set_bit with
    DuckDB's *native* BIT type — proving the representation is faithful.
    (bit_position is represented as instr on the string form; the native
    function's alignment semantics have no Spark analog.)"""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    b = F.lpad(F.bin(k + 37), 8, "0")
    return n.select(
        "n_nationkey",
        b.alias("bstr"),
        F.substring(b, 3, 1).cast("int").alias("get2"),
        F.concat(F.substring(b, 1, 3), F.lit("1"), F.substring(b, 5, 8)).alias("set3"),
        F.instr(b, "01").alias("pos01"),
        F.expr("n_name LIKE 'NATION$_1%' ESCAPE '$'").alias("esc_like"),
        F.instr(F.col("n_name"), "_1").alias("in_n"),
        F.col("n_name").startswith("NATION_1").alias("pfx"),
        F.col("n_name").endswith("3").alias("sfx"),
        F.ascii(F.concat(F.lit("ü"), F.col("n_name"))).alias("uni"),
    ).orderBy("n_nationkey")


def str_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nfc_normalize (duckdb-6.cpp:6016): combining-mark sequences collapse
    to composed form; both engines use the same Unicode tables."""
    region = load_table(spark, sf_dir, "region")
    # 'cafe' + combining-acute (U+0301) + '-...': NFC composes the accent
    decomposed = F.concat(
        F.lit("cafe\u0301-"), F.col("r_name")
    )
    return region.select(
        "r_regionkey",
        compat.nfc_normalize(decomposed).alias("nfc"),
        F.length(compat.nfc_normalize(decomposed)).alias("nfc_len"),
        F.length(decomposed).alias("raw_len"),
    ).orderBy("r_regionkey")


_STR_COLLATE_SQL = """
        SELECT c_custkey,
               c_mktsegment COLLATE NOCASE = 'automobile' AS is_auto,
               ('CAFÉ-' || c_name) COLLATE NOACCENT = ('CAFE-' || c_name)
                   AS acc_eq,
               c_name COLLATE NOCASE.NOACCENT = upper(c_name) AS chain_eq
        FROM customer WHERE c_custkey <= 300
        ORDER BY c_name COLLATE NOCASE, c_custkey
    """


def str_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATE NOCASE / NOACCENT / chained collations (reference collation
    binder; DuckDB ships these as built-ins). The collation attaches to the
    comparison: sqlfront._rewrite_collate wraps BOTH operands in the
    wrapper chain (lower / accent-translate), so the Spark plan stays pure
    codegen'd expressions — runs the oracle text itself through the
    frontend, the strongest parity statement."""
    from quackspark.relation import Connection
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return Connection(spark).sql(_STR_COLLATE_SQL).df


QUERIES = {
    "str_basic_funcs": str_basic_funcs,
    "str_collate": str_collate,
    "str_bits_misc": str_bits_misc,
    "str_nfc_normalize": str_nfc_normalize,
    "str_concat_split": str_concat_split,
    "str_like_family": str_like_family,
    "str_glob_regexp": str_glob_regexp,
    "str_similarity": str_similarity,
    "str_codec_funcs": str_codec_funcs,
    "str_accents_bar": str_accents_bar,
}

ORACLES = {
    "str_collate": _STR_COLLATE_SQL,
    "str_nfc_normalize": """
        SELECT r_regionkey,
               nfc_normalize('cafe' || chr(769) || '-' || r_name) AS nfc,
               CAST(length(nfc_normalize('cafe' || chr(769) || '-' || r_name))
                    AS INT) AS nfc_len,
               CAST(length('cafe' || chr(769) || '-' || r_name) AS INT)
                   AS raw_len
        FROM region ORDER BY r_regionkey
    """,
    "str_bits_misc": """
        WITH b AS (
            SELECT n_nationkey, n_name,
                   lpad(bin(n_nationkey + 37), 8, '0') AS bstr
            FROM nation
        )
        SELECT n_nationkey,
               bstr,
               CAST(get_bit(CAST(bstr AS BIT), 2) AS INT) AS get2,
               CAST(set_bit(CAST(bstr AS BIT), 3, 1) AS VARCHAR) AS set3,
               CAST(instr(bstr, '01') AS INT) AS pos01,
               n_name LIKE 'NATION$_1%' ESCAPE '$' AS esc_like,
               CAST(instr(n_name, '_1') AS INT) AS in_n,
               prefix(n_name, 'NATION_1') AS pfx,
               suffix(n_name, '3') AS sfx,
               CAST(unicode('ü' || n_name) AS INT) AS uni
        FROM b ORDER BY n_nationkey
    """,
    "str_basic_funcs": """
        SELECT c_custkey,
               lower(c_name) AS lo,
               upper(c_mktsegment) AS up,
               CAST(length(c_name) AS INT) AS len,
               reverse(c_name) AS rev,
               substring(c_name, 10, 5) AS sub,
               lpad(c_mktsegment, 12, '.') AS lp,
               rpad(c_mktsegment, 12, '.') AS rp,
               trim('  x  ') AS tr,
               replace(c_name, 'Customer', 'Cust') AS repl,
               repeat('ab', 3) AS rep,
               left(c_name, 8) AS l8,
               right(c_name, 3) AS r3,
               CAST(ascii(c_name) AS INT) AS asc,
               chr(CAST(c_custkey % 26 + 65 AS INT)) AS ch
        FROM customer WHERE c_custkey <= 500
    """,
    "str_concat_split": """
        SELECT n_nationkey,
               n_name || '-' || n_regionkey AS cat,
               concat_ws('/', n_name, n_regionkey, 'x') AS catws,
               to_json(string_split('the ' || n_name || ' nation', ' ')) AS words,
               split_part('the ' || n_name || ' nation', ' ', 2) AS word2
        FROM nation ORDER BY n_nationkey
    """,
    "str_like_family": """
        SELECT p_partkey,
               p_name LIKE '%green%' AS has_green,
               p_name ILIKE '%BLUE%' AS has_blue_i,
               starts_with(p_type, 'STANDARD') AS is_std,
               contains(p_brand, '#3') AS brand3,
               p_type LIKE '%COPPER' AS ends_cu,
               p_name LIKE 'a%' AS a_prefix
        FROM part ORDER BY p_partkey
    """,
    "str_glob_regexp": """
        SELECT p_partkey,
               p_name GLOB '*mint*' AS glob_mint,
               regexp_matches(p_name, '^[a-f]') AS re_af,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
               regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
               regexp_full_match(p_type, 'PROMO.*STEEL') AS full_match
        FROM part ORDER BY p_partkey
    """,
    "str_similarity": """
        SELECT a.n_nationkey AS k1, b.n_nationkey AS k2,
               CAST(levenshtein(a.n_name, b.n_name) AS INT) AS lev,
               round(jaccard(a.n_name, b.n_name), 6) AS jac,
               CAST(mismatches(substring(a.n_name, 1, 4),
                               substring(b.n_name, 1, 4)) AS INT) AS ham4,
               round(jaro_winkler_similarity(a.n_name, b.n_name), 6) AS jw
        FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        ORDER BY k1, k2
    """,
    "str_codec_funcs": """
        SELECT s_suppkey,
               md5(s_name) AS h,
               base64(CAST(s_name AS BLOB)) AS b64,
               CAST(from_base64(base64(CAST(s_name AS BLOB))) AS VARCHAR)
                   AS roundtrip,
               printf('supp %d: %s', s_suppkey, s_name) AS fmt
        FROM supplier ORDER BY s_suppkey
    """,
    "str_accents_bar": """
        SELECT r_regionkey,
               strip_accents('café-' || r_name || '-ñöü') AS plain,
               bar(r_regionkey, 0, 4, 8) AS bar8
        FROM region ORDER BY r_regionkey
    """,
}
