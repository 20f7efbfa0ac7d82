"""Derived storage layout (sources/derived.py): the engine-written twin
tables must be transparent (same surface schema, bit-identical results),
must carry the materialized columns, and must buy the promised plan —
no fact-side exchange on orderkey joins/aggregations.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from quackspark.entry import queries
from quackspark.session import _read_raw, load_table, load_table_derived
from quackspark.sources import derived

SF = "/root/testdata/sf0.001"


def test_surface_schema_matches_raw(spark):
    for name in ("lineitem", "orders", "events"):
        raw = _read_raw(spark, SF, name)
        got = load_table(spark, SF, name)
        assert got.columns == raw.columns, name
        assert got.count() == raw.count(), name


def test_derived_columns_present_and_exact(spark):
    li = load_table_derived(spark, SF, "lineitem")
    for c in ("l_qty_u", "l_eprice_u", "l_disc_u", "l_rev_u", "l_charge_u",
              "l_edisc_u"):
        assert c in li.columns
    # stored micro-unit term == the query-time dsum term, row for row
    bad = li.filter(
        F.col("l_rev_u")
        != F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000)
        .cast("long")
    ).count()
    assert bad == 0

    ev = load_table_derived(spark, SF, "events")
    assert "props_k" in ev.columns
    bad = ev.filter(
        ~F.col("props_k").eqNullSafe(F.get_json_object(F.col("props"), "$.k"))
    ).count()
    assert bad == 0


def test_bucketed_fact_join_has_no_fact_exchange(spark):
    """lineitem⋈orders on orderkey and the q21 per-order aggregation must
    plan without shuffling the fact table (broadcast disabled so the
    bucketed path is what's exercised even at tiny SF)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF, "lineitem")
        od = load_table(spark, SF, "orders")
        plan = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Bucketed: true" in plan
        # per-order aggregation rides the same partitioning
        agg_plan = (
            li.groupBy("l_orderkey").agg(F.sum("l_quantity"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_headline_queries_read_twins_and_match_raw(spark):
    """q3 executes against the bucketed twins and returns exactly what the
    raw-parquet plan returns."""
    qs = queries()
    plan = (
        qs["q3_shipping_priority"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "qs_drv_" in plan  # twin scan, not raw parquet
    got = [tuple(r) for r in qs["q3_shipping_priority"](spark, SF).collect()]
    os.environ["QUACKSPARK_DERIVED"] = "0"
    try:
        from quackspark.session import _TABLE_CACHE

        saved = dict(_TABLE_CACHE)
        _TABLE_CACHE.clear()
        want = [tuple(r) for r in qs["q3_shipping_priority"](spark, SF).collect()]
        _TABLE_CACHE.clear()
        _TABLE_CACHE.update(saved)
    finally:
        os.environ.pop("QUACKSPARK_DERIVED", None)
    assert got == want


def test_reregistration_after_catalog_loss(spark):
    """A fresh session re-registers the already-built twin from its spec
    sidecar without rebuilding (files untouched)."""
    from quackspark.session import _TABLE_CACHE

    path = derived.derived_path(SF, "lineitem")
    assert os.path.exists(derived._spec_path(path))
    mtime = os.path.getmtime(derived._spec_path(path))
    spark.sql(f"DROP TABLE IF EXISTS {derived._table_name(SF, 'lineitem')}")
    _TABLE_CACHE.clear()
    li = load_table(spark, SF, "lineitem")
    assert li.count() > 0
    assert os.path.getmtime(derived._spec_path(path)) == mtime  # no rebuild
    plan = (
        li.groupBy("l_orderkey").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # bucket metadata survived re-registration


def test_stale_twin_invalidated_on_fixture_regen(spark, tmp_path):
    """Regenerating a fixture dir in place (tools/make_sf1.py does this)
    must invalidate the twin — the spec stores a source fingerprint."""
    import shutil

    from quackspark.session import _TABLE_CACHE, _read_raw

    fx = str(tmp_path / "fx")
    os.makedirs(fx)
    li = _read_raw(spark, SF, "lineitem").limit(100)
    li.write.mode("overwrite").parquet(os.path.join(fx, "lineitem.parquet"))
    _TABLE_CACHE.clear()
    assert load_table(spark, fx, "lineitem").count() == 100
    assert os.path.exists(derived.derived_path(fx, "lineitem"))

    # regenerate the fixture with different contents
    li2 = _read_raw(spark, SF, "lineitem").limit(250)
    li2.write.mode("overwrite").parquet(os.path.join(fx, "lineitem.parquet"))
    _TABLE_CACHE.clear()
    assert load_table(spark, fx, "lineitem").count() == 250  # not stale 100
    # drop the registered twin and its files: pytest reclaims tmp_path,
    # and a catalog entry over vanished files would poison later
    # whole-catalog operations (EXPORT DATABASE)
    spark.sql(f"DROP TABLE IF EXISTS {derived._table_name(fx, 'lineitem')}")
    _TABLE_CACHE.clear()
    shutil.rmtree(derived.derived_path(fx, "lineitem"), ignore_errors=True)


def test_projection_by_secondary_key(spark):
    """ensure_projection: orders bucketed on o_custkey — a custkey join
    plans with no orders-side exchange, and rows are identical to the
    primary table."""
    from quackspark.session import load_table_projection

    proj = load_table_projection(spark, SF, "orders", "o_custkey")
    base = load_table(spark, SF, "orders")
    assert proj.columns == base.columns
    assert proj.count() == base.count()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cust = load_table(spark, SF, "customer")
        plan = (
            cust.join(proj, cust.c_custkey == proj.o_custkey, "left_outer")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" in plan  # dim side shuffles
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_date_zone_map_prunes_scan(spark):
    """r8 layout: the ym+orderkey within-bucket sort plus the
    materialized `l_shipdate_d` DATE column must let an out-of-range
    date predicate skip every row group — the SCAN (not the filter)
    outputs zero rows for q6's 1994 window on the 1995+ fixture. Spark
    cannot push TIMESTAMP_NTZ predicates, so this only holds through the
    derived DATE twin column (_util.day_bound)."""
    from quackspark.catalog import explain_analyze
    from quackspark.entry import queries

    df = queries()["q6_forecast_revenue"](spark, SF)
    scan_rows = None
    for r in explain_analyze(df).collect():
        if "Scan" in r["operator"] and r["metric"] == "numOutputRows":
            scan_rows = r["value"]
    assert scan_rows == 0, f"zone-map pruning regressed: scan read {scan_rows}"
    # and the coarse predicate actually reached the scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_shipdate_d" in plan


def test_q13_colocated_projections_no_fact_exchange(spark):
    """q13 reads orders__by_o_custkey + customer__by_c_custkey (equal
    bucket counts): with broadcast disabled, the only exchanges left are
    the two post-aggregation dimension-sized ones (histogram groupBy +
    final sort) — neither input re-partitions."""
    import re

    from quackspark.entry import queries

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            queries()["q13_customer_distribution"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    exchanges = [
        l for l in plan.splitlines() if re.search(r"\bExchange\b", l)
    ]
    assert len(exchanges) <= 2, exchanges
    for l in exchanges:
        assert "c_custkey" not in l and "o_custkey" not in l, l


def test_spec_records_storage_bytes(spark):
    """Projection budget accounting (SCALE.md): every built unit's spec
    sidecar records its storage_bytes."""
    load_table(spark, SF, "lineitem")
    spec = derived._read_spec(derived.derived_path(SF, "lineitem"))
    assert spec and spec.get("storage_bytes", 0) > 0


def test_q5_supplier_first_exchange_free(spark):
    """q5's r8 probe order: the ASIA-supplier broadcast reduces lineitem
    BEFORE the shuffle_hash probe, and the fact side still never
    re-partitions (bucketed lineitem + o_red inheriting orders'
    bucketing through broadcasts)."""
    import re

    from quackspark.entry import queries

    plan = (
        queries()["q5_local_supplier_volume"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no exchange may touch the fact keys
    for l in plan.splitlines():
        if re.search(r"\bExchange hashpartitioning", l):
            assert "l_orderkey" not in l and "o_orderkey" not in l, l
    # supplier broadcast happens on the lineitem side (probe reduction)
    assert plan.count("BroadcastHashJoin") >= 3


def test_q5_resolves_in_decimal_sum_mode(spark, monkeypatch):
    """Column pruning in q5 must track the exact-sum mode: decimal mode
    ignores the stored u-column and evaluates REVENUE() from
    price × discount, so pruning those away made the plan unresolvable
    (caught by a QUACKSPARK_EXACT_SUM=decimal differential in r8). The
    full decimal-mode value parity is covered by the subprocess-level
    differential; this pins analysis + row shape in-process."""
    from quackspark.queries import _util

    from quackspark.entry import queries

    long_rows = queries()["q5_local_supplier_volume"](spark, SF).collect()
    monkeypatch.setattr(_util, "EXACT_SUM_MODE", "decimal")
    dec_rows = queries()["q5_local_supplier_volume"](spark, SF).collect()
    assert [r["n_name"] for r in dec_rows] == [r["n_name"] for r in long_rows]
    for a, b in zip(dec_rows, long_rows):
        assert abs(a["revenue"] - b["revenue"]) < 1e-6


def test_q10_narrow_agg_exchange(spark):
    """q10's r10 shape: the bucketed fact join is exchange-free, the ONE
    data exchange carries (o_custkey, sum-state) partial-agg rows, and
    the customer/nation broadcasts sit ABOVE the aggregate (they probe
    the ~|customer|-sized agg output, not the fact rows)."""
    import re

    plan = (
        queries()["q10_returned_items"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    hash_exchanges = [
        l for l in plan.splitlines() if re.search(r"\bExchange hashpartitioning", l)
    ]
    # exactly one data exchange, keyed by custkey — never the fact keys
    assert len(hash_exchanges) == 1, plan
    assert "o_custkey" in hash_exchanges[0], hash_exchanges[0]
    assert "l_orderkey" not in hash_exchanges[0]
    # broadcasts above the agg: in the operator string the final
    # HashAggregate must appear BELOW (after) the BroadcastHashJoins
    first_bcast = plan.find("BroadcastHashJoin")
    final_agg = plan.find("HashAggregate")
    assert 0 <= first_bcast < final_agg, (first_bcast, final_agg)


def test_q18_colocated_fact_plan(spark):
    """q18's facts arrive orderkey-bucketed: neither the lineitem
    groupBy(l_orderkey) nor the orders⋈big join may re-partition on the
    order key, and the hinted hash join replaces SMJ's two sorts."""
    import re

    plan = (
        queries()["q18_large_orders"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for l in plan.splitlines():
        if re.search(r"\bExchange hashpartitioning", l):
            assert "l_orderkey" not in l and "o_orderkey" not in l, l
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
