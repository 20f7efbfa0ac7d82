"""r13 optimization-round equivalence pins: every optimization that
changes an operator's internals must leave its results bit-identical.

- MinHash signature Arrow kernel (operators/dedup._minhash_sig_kernel)
  vs the original explode + 16-min-groupBy expression form.
- Connected-components driver union-find fast path vs the distributed
  large/small-star loop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_minhash_kernel_equals_expression(spark):
    from quackspark.operators import dedup as D
    from quackspark.session import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    kw = dict(k=3, n_hashes=16, bands=8, threshold=0.25)
    a = _rows(
        D.minhash_lsh_pairs(d, "text", "doc_id", kernel=False, **kw), "d1", "d2"
    )
    b = _rows(
        D.minhash_lsh_pairs(d, "text", "doc_id", kernel=True, **kw), "d1", "d2"
    )
    assert a == b
    assert len(a) > 0  # the fixture must actually exercise the band join


def test_minhash_kernel_short_and_null_docs(spark):
    """Docs below k tokens (and NULL text) drop out of the signature set
    on both paths — the kernel's NULL-return mirrors the explode's
    empty-array drop-out."""
    from quackspark.operators import dedup as D

    df = spark.createDataFrame(
        [
            (1, "one two"),                        # < k tokens: no shingles
            (2, None),                             # NULL text
            (3, "alpha beta gamma delta"),
            (4, "alpha beta gamma delta"),         # exact dup of 3
            (5, "  alpha   beta\tgamma  delta  "), # whitespace-noisy dup
        ],
        "doc_id bigint, text string",
    )
    kw = dict(k=3, n_hashes=16, bands=8, threshold=0.25)
    a = _rows(D.minhash_lsh_pairs(df, "text", "doc_id", kernel=False, **kw),
              "d1", "d2")
    b = _rows(D.minhash_lsh_pairs(df, "text", "doc_id", kernel=True, **kw),
              "d1", "d2")
    assert a == b
    pairs = {(r[0], r[1]) for r in b}
    assert (3, 4) in pairs and (3, 5) in pairs  # dups found, short/null absent


def test_minhash_kernel_respects_hot_shingles(spark):
    """With an aggressive DF cutoff (unsampled), the kernel bakes the hot
    list into its closure and must agree with the stream-filter form."""
    from quackspark.operators import dedup as D
    from quackspark.session import load_table

    d = load_table(spark, SF_ORACLE, "documents").limit(200)
    kw = dict(k=3, n_hashes=16, bands=8, threshold=0.2, max_shingle_df=3)
    a = _rows(D.minhash_lsh_pairs(d, "text", "doc_id", kernel=False, **kw),
              "d1", "d2")
    b = _rows(D.minhash_lsh_pairs(d, "text", "doc_id", kernel=True, **kw),
              "d1", "d2")
    assert a == b


def test_cc_driver_path_equals_distributed(spark):
    from quackspark.operators import components as CC
    from quackspark.operators import dedup as D
    from quackspark.session import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    pairs = D.minhash_lsh_pairs(
        d, "text", "doc_id", k=3, n_hashes=16, bands=8, threshold=0.25
    ).localCheckpoint()
    dist = _rows(CC.connected_components(pairs, "d1", "d2", driver_cap=0), "node")
    drv = _rows(CC.connected_components(pairs, "d1", "d2"), "node")
    assert dist == drv
    assert len(drv) > 0


@pytest.mark.parametrize(
    "edges",
    [
        # chain, star, two components, duplicate + reversed + self edges
        [(1, 2), (2, 3), (3, 4), (4, 5)],
        [(10, 1), (10, 2), (10, 3), (10, 4)],
        [(1, 2), (3, 4), (5, 6), (6, 5), (2, 1), (7, 7)],
    ],
)
def test_cc_driver_path_synthetic_graphs(spark, edges):
    from quackspark.operators import components as CC

    e = spark.createDataFrame(edges, "d1 bigint, d2 bigint")
    dist = _rows(CC.connected_components(e, "d1", "d2", driver_cap=0), "node")
    drv = _rows(CC.connected_components(e, "d1", "d2"), "node")
    assert dist == drv


def test_cc_driver_cap_zero_forces_distributed(spark):
    """driver_cap larger than the edge count takes the fast path; a cap
    below it falls back to the distributed loop — both agree."""
    from quackspark.operators import components as CC

    edges = [(i, i + 1) for i in range(50)]
    e = spark.createDataFrame(edges, "d1 bigint, d2 bigint")
    small_cap = _rows(CC.connected_components(e, "d1", "d2", driver_cap=10), "node")
    big_cap = _rows(CC.connected_components(e, "d1", "d2", driver_cap=1000), "node")
    assert small_cap == big_cap
    comp = {r[1] for r in big_cap}
    assert comp == {0}  # one chain, min node 0


@pytest.mark.parametrize(
    "name", ["pipeline_training_prep_v2", "pipeline_training_prep_v3"]
)
def test_single_pass_mix_identical(spark, name):
    """r14 (supersedes the r13 narrow-gate checkpoint pin): the capstones
    run the temperature mix as ONE linear plan over a per-(source,
    bucket) pre-aggregate — no gate checkpoint, one gate subtree.
    Results must be bit-identical to the r13 joined form in BOTH its
    checkpoint modes, and the single-pass plan must contain exactly one
    copy of the keep-gate semi-join (the subtree the r13 checkpoint
    existed to deduplicate)."""
    from quackspark.queries import pipeline as P

    fn = getattr(P, name)
    a = _rows(fn(spark, SF_ORACLE), "source")
    b = _rows(
        fn(spark, SF_ORACLE, single_pass=False, checkpoint_gate=True), "source"
    )
    c = _rows(
        fn(spark, SF_ORACLE, single_pass=False, checkpoint_gate=False), "source"
    )
    assert a == b == c
    assert len(a) > 0
    plan = (
        fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("LeftSemi") == 1, plan
    # the narrow projection still never carries the text column past the
    # gate: the mix pre-aggregate reads (source, quality, _ntok, bucket)
    assert "_ntok" in plan


def test_lane_signature_equals_hash_family(spark):
    """r13: _lane_signature stages the 4 md5 lanes in one projection and
    derives every seed's min from a staged lane column. Must be
    bit-identical to the original per-seed md5_hash_family aggregation
    (same formula, un-staged), including empty-shingle dropout."""
    from quackspark.operators import dedup as D
    from quackspark.session import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    sh = D._exploded_shingles(d, "text", "doc_id", 3)
    staged = _rows(D._lane_signature(sh, 16), "doc")
    aggs = [
        F.min(D.md5_hash_family(F.col("sh"), i)).alias(f"h{i}")
        for i in range(16)
    ]
    orig = _rows(
        sh.groupBy("doc")
        .agg(*aggs)
        .select("doc", F.array(*[f"h{i}" for i in range(16)]).alias("sig")),
        "doc",
    )
    assert staged == orig
    assert len(staged) > 0


def test_simhash_staged_code_identical(spark):
    """r13: simhash_docs stages the per-token hash once before the 32
    bit-aggs; results must match the declared oracle twin (parity suite)
    and the band reassembly must be unchanged — pin a snapshot here."""
    from quackspark.operators import dedup as D
    from quackspark.session import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    out = _rows(D.simhash_docs(d, "text", "doc_id"), "doc")
    assert len(out) > 0
    # every simhash is a 32-bit value and the 4 bands reassemble it
    for row in out[:50]:
        doc, simhash, b0, b1, b2, b3 = row
        assert 0 <= simhash < 2**32
        assert simhash == b0 + (b1 << 8) + (b2 << 16) + (b3 << 24)


def test_pair_score_table_equals_join_form(spark):
    """r13: the size-gated broadcast-table scoring path of
    embedding_neardup_pairs must be bit-identical to the re-attach-join
    + dot_arrow form (same banding, same IEEE fold order, same round)."""
    from quackspark.operators import simsearch as S
    from quackspark.session import load_table

    e = load_table(spark, SF_ORACLE, "embeddings")
    # cap forced high so this side provably takes the table path (an env
    # override or a non-integral id column would otherwise silently turn
    # the comparison into join-vs-join)
    tdf = S.embedding_neardup_pairs(e, threshold=0.45, score_table_cap=10**9)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        tdf.explain("formatted")
    assert "ArrowEvalPython" in buf.getvalue()  # the table kernel, not joins
    table = _rows(tdf, "d1", "d2")
    joins = _rows(
        S.embedding_neardup_pairs(e, threshold=0.45, score_table_cap=0),
        "d1", "d2",
    )
    assert table == joins
    assert len(table) > 0  # the fixture must exercise the band join


def test_pair_score_table_fallbacks(spark):
    """Duplicate ids and empty corpora must fall back to the join form
    (searchsorted would silently pick an arbitrary copy; an empty table
    has no width) — same results, no crash."""
    from pyspark.sql import functions as F

    from quackspark.operators import simsearch as S

    dup = spark.createDataFrame(
        [(1, [1.0] * 64), (1, [0.5] * 64), (2, [1.0] * 64), (3, [-1.0] * 64)],
        "vec_id bigint, embedding array<float>",
    )
    a = _rows(S.embedding_neardup_pairs(
        dup, threshold=0.1, n_rows=4, score_table_cap=10**9), "d1", "d2")
    b = _rows(S.embedding_neardup_pairs(
        dup, threshold=0.1, n_rows=4, score_table_cap=0), "d1", "d2")
    assert a == b
    empty = dup.filter(F.col("vec_id") < 0)
    out = S.embedding_neardup_pairs(
        empty, threshold=0.1, n_rows=0, score_table_cap=10**9
    )
    assert out.count() == 0
