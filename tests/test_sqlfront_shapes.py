"""Round-3 probe-wave pins: composed query shapes a migrating DuckDB
user pastes — deep CTE chains, correlated scalars/LATERAL, WITHIN
GROUP, quantified filters, window edges. Each statement runs through
the SQL frontend AND DuckDB executing identical text (the same
differential as test_fn_gaps; these are *shapes*, not functions)."""

from __future__ import annotations

import pytest

from quackspark.oracle import compare
from quackspark.relation import Connection
from quackspark.session import register_testdata_views

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con(spark):
    register_testdata_views(spark, SF)
    return Connection(spark)


CASES = {
    "cte_chain_left_join": """
        WITH a AS (SELECT n_regionkey k, count(*) c FROM nation GROUP BY 1),
        b AS (SELECT k, c * 2 AS c2 FROM a WHERE c > 3),
        c AS (SELECT a.k, a.c, b.c2 FROM a LEFT JOIN b USING (k))
        SELECT * FROM c ORDER BY k""",
    "triple_nested_subquery": "SELECT * FROM (SELECT * FROM "
        "(SELECT n_nationkey AS x FROM nation) WHERE x < 5) WHERE x > 1 ORDER BY x",
    "union_in_derived": """
        SELECT k, sum(c) AS s FROM (
            SELECT n_regionkey AS k, 1 AS c FROM nation
            UNION ALL SELECT r_regionkey, 10 FROM region
        ) GROUP BY k ORDER BY k""",
    "self_join_inequality": "SELECT a.n_name AS x, b.n_name AS y FROM nation a "
        "JOIN nation b ON a.n_regionkey = b.n_regionkey "
        "AND a.n_nationkey < b.n_nationkey ORDER BY 1, 2 LIMIT 6",
    "correlated_scalar_in_select": "SELECT r_name, (SELECT max(n_name) "
        "FROM nation WHERE n_regionkey = r_regionkey) AS mx FROM region ORDER BY 1",
    "multi_filter_clause": """
        SELECT n_regionkey, count(*) AS total,
               count(*) FILTER (WHERE n_nationkey % 2 = 0) AS evens,
               max(n_name) FILTER (WHERE n_nationkey > 10) AS mx
        FROM nation GROUP BY 1 ORDER BY 1""",
    "within_group_percentile": "SELECT l_returnflag, percentile_cont(0.5) "
        "WITHIN GROUP (ORDER BY l_quantity) AS med FROM lineitem "
        "GROUP BY 1 ORDER BY 1",
    "lateral_correlated_agg": """
        SELECT x.g, y.mx FROM
        (SELECT n_regionkey AS g FROM nation GROUP BY 1) x,
        LATERAL (SELECT max(n_name) AS mx FROM nation n
                 WHERE n.n_regionkey = x.g) y ORDER BY 1""",
    "having_on_alias": "SELECT n_regionkey AS grp, count(*) cnt FROM nation "
        "GROUP BY grp HAVING cnt > 4 ORDER BY grp",
    "interval_first_arith": "SELECT INTERVAL 90 MINUTE "
        "+ TIMESTAMP '2020-01-01 23:00:00' AS t",
    "exists_pair": "SELECT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = 999) "
        "AS e1, NOT EXISTS (SELECT 1 FROM nation) AS e2",
    "quantile_cont_global": "SELECT quantile_cont(l_quantity, 0.9) AS q90 "
        "FROM lineitem",
    # --- window edges ---
    "win_range_numeric_frame": "SELECT n_name, sum(n_nationkey) OVER "
        "(ORDER BY n_nationkey RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s "
        "FROM nation ORDER BY n_nationkey LIMIT 8",
    "win_nth_full_frame": "SELECT n_name, nth_value(n_name, 2) OVER "
        "(PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv "
        "FROM nation ORDER BY n_name LIMIT 6",
    "win_cume_percent": "SELECT n_name, cume_dist() OVER (ORDER BY n_regionkey) "
        "AS cd, percent_rank() OVER (ORDER BY n_regionkey) AS pr "
        "FROM nation ORDER BY n_name LIMIT 5",
    "win_count_over_empty": "SELECT n_name, count(*) OVER () AS total "
        "FROM nation ORDER BY n_name LIMIT 3",
    "win_desc_running": "SELECT n_name, sum(n_nationkey) OVER "
        "(ORDER BY n_nationkey DESC ROWS UNBOUNDED PRECEDING) AS s "
        "FROM nation ORDER BY n_nationkey LIMIT 5",
    "distinct_over_window": "SELECT DISTINCT n_regionkey, min(n_nationkey) "
        "OVER (PARTITION BY n_regionkey) AS mn FROM nation ORDER BY 1",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_shape_differential(con, name):
    sql = CASES[name]
    probs = compare(con.sql(sql).df, sql, SF)
    assert not probs, f"{name}:\n" + "\n".join(probs)
