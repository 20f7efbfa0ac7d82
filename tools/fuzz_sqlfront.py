"""Template-grammar fuzzer for the SQL frontend (VERDICT r3 directive #3).

The frontend (quackspark/sqlfront.py) is a token rewriter with no grammar
to prove coverage against; its failure class that matters is SILENT
WRONGNESS — a statement that transpiles, runs, and returns different rows
than DuckDB (history: commits 64dcd0f, a82b928, dbec2da). This fuzzer
composes statements from the dialect's building blocks (SELECT cores ×
set-ops × CTE nesting × subquery FROMs × window/aggregate modifiers ×
dialect literals, vocabulary drawn from the reference grammar
/root/reference/duckdb-libpg_query.cpp surface the corpus exercises) and
runs every statement through BOTH engines:

  MATCH        rows equal after canonicalization          → good
  UNSUPPORTED  transpiler raised UnsupportedSQL            → honest refusal
  DUCK_ERROR   DuckDB itself rejects the statement         → generator noise
  SPARK_ERROR  transpiled but Spark failed LOUDLY          → acceptable-but-
               logged (never silent; triaged for fixes)
  MISMATCH     both ran, rows differ                       → THE BUG CLASS;
               gate: zero tolerated (tests/test_sqlfront_fuzz.py)

Determinism: every statement is a pure function of (seed, index); rows are
compared as sorted multisets with float cells rounded (ORDER BY in
generated SQL is only for LIMIT stability). Aggregates over DOUBLE columns
are restricted to order-independent forms (min/max/count) so cross-engine
partial-sum jitter can't masquerade as a frontend bug.

CLI:  python tools/fuzz_sqlfront.py [--n 500] [--seed 1] [--verbose]
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- vocabulary -------------------------------------------------------------

INT_COLS = {
    "nation": ["n_nationkey", "n_regionkey"],
    "region": ["r_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "orders": ["o_orderkey", "o_custkey"],
}
STR_COLS = {
    "nation": ["n_name"],
    "region": ["r_name"],
    "customer": ["c_name", "c_mktsegment"],
    "orders": ["o_orderstatus", "o_orderpriority"],
}
DBL_COLS = {"customer": ["c_acctbal"], "orders": ["o_totalprice"]}
TS_COLS = {"orders": ["o_orderdate"]}
TABLES = ["nation", "region", "customer", "orders"]
#: full physical column order (star-modifier forms compare positionally)
ALL_COLS = {
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "region": ["r_regionkey", "r_name"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
}

STR_LITS = ["'A'", "'BRAZIL'", "'x%'", "'_a_'", "$tag$dollar ' quoted$tag$",
            "E'esc\\nline'", "'it''s'"]

#: (left, right, left_key, right_key) equi-join relationships
JOINS = [
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
]
INT_LITS = ["0", "1", "7", "42", "1_000", "-3"]


class Gen:
    def __init__(self, rng: random.Random):
        self.r = rng

    def pick(self, xs):
        return self.r.choice(xs)

    # --- scalar expressions over a table's columns --------------------------

    def int_expr(self, t: str, depth: int = 0):
        c = self.pick(INT_COLS[t])
        if depth > 1 or self.r.random() < 0.4:
            return c
        form = self.r.randrange(7)
        a, b = self.int_expr(t, depth + 1), self.pick(INT_LITS)
        if form == 0:
            return f"({a} + {b})"
        if form == 1:
            return f"({a} % 7)"
        if form == 2:
            return f"abs({a} - 3)"
        if form == 3:
            return f"greatest({a}, {self.pick(INT_LITS)})"
        if form == 4:
            return f"CASE WHEN {a} > 2 THEN {a} ELSE -{a} END"
        if form == 5:
            return f"CAST(length({self.str_expr(t, 2)}) AS INTEGER)"
        return f"({a} * 2)"

    def misc_expr(self, t: str):
        """Occasional non-int/str projections: dates, list/struct literals,
        scalar subqueries — the shapes a rewriter mis-nests first."""
        form = self.r.randrange(7)
        if form == 0 and t in TS_COLS:
            return f"CAST(year({self.pick(TS_COLS[t])}) AS INTEGER)"
        if form == 1 and t in TS_COLS:
            return f"date_trunc('month', {self.pick(TS_COLS[t])})"
        if form == 2:
            return f"[1, 2, {self.int_expr(t, 2)}][2]"
        if form == 3:
            return f"{{'a': {self.int_expr(t, 2)}, 'b': 'x'}}.a"
        if form == 4:
            t2 = self.pick([x for x in TABLES if x != t])
            return f"(SELECT max({self.pick(INT_COLS[t2])}) FROM {t2})"
        if form == 5:
            # r12 fn-surface additions in expression position
            s, k = self.pick(STR_COLS[t]), self.pick(INT_COLS[t])
            return self.pick([
                f"regexp_replace({s}, '[AEO]', '@')",   # first-match only
                f"json_object('k', {k}, 'n', {s})",
                f"json_contains('[0,1,2,3]', CAST({k} % 6 AS VARCHAR))",
                f"list_element('abcdef', {k} % 8)",
                f"parse_dirname({s} || '/x/y')",
                f"bit_length({s})",
                f"round(gamma({k} % 5 + 0.5), 6)",
                f"bin({k} % 9)",
                f"greatest({k})",
            ])
        return f"coalesce(nullif({self.int_expr(t, 2)}, 0), -1)"

    def str_expr(self, t: str, depth: int = 0):
        c = self.pick(STR_COLS[t])
        if depth > 1 or self.r.random() < 0.4:
            return c
        form = self.r.randrange(6)
        if form == 0:
            return f"upper({self.str_expr(t, depth + 1)})"
        if form == 1:
            return f"lower({c})"
        if form == 2:
            return f"substr({c}, 1, 4)"
        if form == 3:
            return f"({c} || '_' || {self.pick(STR_LITS)})"
        if form == 4:
            return f"trim(concat(' ', {c}, ' '))"
        return f"replace({c}, 'A', '@')"

    def pred(self, t: str, depth: int = 0):
        form = self.r.randrange(10)
        if form == 0:
            return f"{self.int_expr(t)} {self.pick(['<', '<=', '>', '>=', '=', '<>'])} {self.pick(INT_LITS)}"
        if form == 1:
            pat = self.pick(["'%A%'", "'B%'", "'%a'", "'_____'"])
            return f"{self.pick(STR_COLS[t])} LIKE {pat}"
        if form == 2:
            return f"{self.pick(STR_COLS[t])} ILIKE '%a%'"
        if form == 3:
            vals = ", ".join(str(x) for x in self.r.sample(range(0, 25), 3))
            return f"{self.pick(INT_COLS[t])} IN ({vals})"
        if form == 4:
            return f"{self.pick(INT_COLS[t])} BETWEEN 2 AND 17"
        if form == 5:
            return f"{self.pick(STR_COLS[t])} IS NOT NULL"
        if form == 6:
            return f"{self.pick(STR_COLS[t])} SIMILAR TO '[A-M].*'"
        if form == 7 and depth == 0:
            return f"({self.pred(t, 1)} {self.pick(['AND', 'OR'])} {self.pred(t, 1)})"
        if form == 8:
            return (f"{self.pick(STR_COLS[t])} IS DISTINCT FROM "
                    f"{self.pick(STR_LITS)}")
        return f"length({self.pick(STR_COLS[t])}) % 2 = {self.r.randrange(2)}"

    # --- SELECT cores --------------------------------------------------------

    def agg_item(self, t: str, i: int):
        form = self.r.randrange(12)
        if form >= 8:
            # r12 aggregate-surface additions (NULL-skipping arg_max
            # family, entropy, bitstring_agg). The arg key must be UNIQUE
            # (the table's PK) — ties make arg_max scan-order-dependent
            # in BOTH engines, which would masquerade as a frontend bug.
            v, k = self.pick(STR_COLS[t]), INT_COLS[t][0]
            extra = [
                f"arg_max(nullif({v}, 'A'), {k}) AS a{i}",
                f"arg_min_null({v}, {k}) AS a{i}",
                f"round(entropy({self.pick(INT_COLS[t])} % 4), 6) AS a{i}",
                f"bitstring_agg({self.pick(INT_COLS[t])} % 16) AS a{i}",
            ]
            return extra[form - 8]
        if form == 0:
            return f"count(*) AS a{i}"
        if form == 1:
            return f"count(DISTINCT {self.pick(STR_COLS[t])}) AS a{i}"
        if form == 2:
            return f"sum({self.int_expr(t)}) AS a{i}"
        if form == 3:
            return f"min({self.pick(STR_COLS[t])}) AS a{i}"
        if form == 4 and t in DBL_COLS:
            return f"round(max({self.pick(DBL_COLS[t])}), 2) AS a{i}"
        if form == 5:
            return f"count(*) FILTER (WHERE {self.pred(t, 1)}) AS a{i}"
        if form == 6:
            return f"sum({self.int_expr(t)} ORDER BY {self.pick(INT_COLS[t])}) AS a{i}"
        return f"max({self.int_expr(t)}) AS a{i}"

    def grouped_core(self, t: str):
        key = self.pick(INT_COLS[t] + STR_COLS[t])
        items = [f"{key} AS k"] + [self.agg_item(t, i) for i in range(self.r.randrange(1, 3))]
        sql = f"SELECT {', '.join(items)} FROM {t}"
        if self.r.random() < 0.5:
            sql += f" WHERE {self.pred(t)}"
        sql += " GROUP BY " + ("1" if self.r.random() < 0.3 else "k")
        if self.r.random() < 0.3:
            sql += self.pick([" HAVING count(*) >= 1",
                              f" HAVING count(*) > 0 AND min({key}) IS NOT NULL"])
        return sql, ["k"] + [f"a{i}" for i in range(len(items) - 1)]

    def plain_core(self, t: str, n: int | None = None):
        n = n if n is not None else self.r.randrange(1, 4)
        items, names = [], []
        for i in range(n):
            kind = self.r.randrange(8)
            e = (self.int_expr(t) if kind <= 2
                 else self.str_expr(t) if kind <= 5
                 else self.misc_expr(t) if kind == 6
                 else f"CAST({self.pick(INT_COLS[t])} AS VARCHAR)")
            items.append(f"{e} AS c{i}")
            names.append(f"c{i}")
        head = "SELECT DISTINCT" if self.r.random() < 0.15 else "SELECT"
        sql = f"{head} {', '.join(items)} FROM {t}"
        if self.r.random() < 0.6:
            sql += f" WHERE {self.pred(t)}"
        return sql, names

    def window_core(self, t: str):
        key = self.pick(INT_COLS[t])
        part = self.pick(STR_COLS[t])
        wf = self.r.randrange(9)
        uniq = INT_COLS[t][0]  # deterministic total order within partitions
        if wf >= 5:
            # r12 frame/modifier edges: RANGE offsets, EXCLUDE, ntile,
            # nth_value IGNORE NULLS — ORDER BY the unique key so frame
            # contents are engine-interchangeable
            extra = [
                f"sum({key}) OVER (PARTITION BY {part} ORDER BY {uniq} "
                f"RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)",
                f"count(*) OVER (PARTITION BY {part} ORDER BY {uniq} "
                f"ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW)",
                f"ntile(3) OVER (PARTITION BY {part} ORDER BY {uniq})",
                f"nth_value(nullif({key} % 3, 0), 2 IGNORE NULLS) "
                f"OVER (PARTITION BY {part} ORDER BY {uniq} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
            ]
            w = extra[wf - 5]
            sql = f"SELECT {uniq} AS c0, {part} AS c1, {w} AS c2 FROM {t}"
            if self.r.random() < 0.4:
                sql += f" WHERE {self.pred(t)}"
            return sql, ["c0", "c1", "c2"]
        if wf == 0:
            w = f"row_number() OVER (PARTITION BY {part} ORDER BY {key}, {self.pick(STR_COLS[t])})"
        elif wf == 1:
            w = f"sum({key}) OVER (PARTITION BY {part} ORDER BY {key} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        elif wf == 2:
            w = f"lag({key}, 1, -1) OVER (PARTITION BY {part} ORDER BY {key})"
        elif wf == 3:
            w = f"rank() OVER (ORDER BY {key})"
        else:
            w = f"count(*) OVER (PARTITION BY {part})"
        sql = f"SELECT {key} AS c0, {part} AS c1, {w} AS c2 FROM {t}"
        if self.r.random() < 0.4:
            sql += f" WHERE {self.pred(t)}"
        return sql, ["c0", "c1", "c2"]

    def values_core(self):
        rows = ", ".join(
            f"({self.r.randrange(10)}, {self.pick(STR_LITS)})" for _ in range(3)
        )
        return f"SELECT * FROM (VALUES {rows}) AS v(c0, c1)", ["c0", "c1"]

    def star_core(self, t: str):
        """Star modifiers and COLUMNS expressions (r12: position-preserving
        REPLACE, paren-less forms, qualified stars, item replication) —
        compared positionally, so a REPLACE that drifts ordinals fails."""
        cols = ALL_COLS[t]
        form = self.r.randrange(6)
        if form == 0:
            drop = self.pick(cols)
            keep = [c for c in cols if c != drop]
            paren = self.r.random() < 0.5
            mod = f"({drop})" if paren else drop
            return f"SELECT * EXCLUDE {mod} FROM {t}", keep
        if form == 1:
            tgt = self.pick(INT_COLS[t])
            return (f"SELECT * REPLACE ({tgt} % 5 + 100 AS {tgt}) FROM {t}",
                    list(cols))
        if form == 2:
            tgt = self.pick(STR_COLS[t])
            return (f"SELECT * REPLACE lower({tgt}) AS {tgt} FROM {t}",
                    list(cols))
        if form == 3:
            tgt = self.pick(INT_COLS[t])
            return (f"SELECT {t}.* REPLACE ({tgt} * 2 AS {tgt}) FROM {t}",
                    list(cols))
        if form == 4:
            pre = t[0] + "_"
            matched = [c for c in cols if "e" in c]
            if not matched:
                matched = list(cols)
                rx, names = f"'{pre}'", matched
            else:
                rx, names = "'e'", matched
            return (f"SELECT min(COLUMNS({rx})) FROM {t}", list(names))
        matched = INT_COLS[t]
        rx = "'key'"
        return (f"SELECT COLUMNS({rx}) + 1 FROM {t}", list(matched))

    def core(self, t: str):
        form = self.r.randrange(12)
        if form < 4:
            return self.plain_core(t)
        if form < 7:
            return self.grouped_core(t)
        if form < 9:
            return self.window_core(t)
        if form < 11:
            return self.star_core(t)
        return self.values_core()

    # --- composition ----------------------------------------------------------

    def join_core(self):
        """Two-table equi join: projection/aggregate over the joined pair,
        USING-vs-ON and join-type variety."""
        lt, rt, lk, rk = self.pick(JOINS)
        jt = self.pick(["JOIN", "INNER JOIN", "LEFT JOIN"])
        cond = f"ON {lk} = {rk}"
        form = self.r.randrange(3)
        if form == 0:
            items = [f"{self.pick(INT_COLS[lt])} AS c0",
                     f"{self.pick(STR_COLS[rt])} AS c1"]
            sql = (f"SELECT {', '.join(items)} FROM {lt} {jt} {rt} {cond}")
            names = ["c0", "c1"]
            if self.r.random() < 0.5:
                sql += f" WHERE {self.pred(lt)}"
        elif form == 1:
            key = self.pick(STR_COLS[rt])
            sql = (f"SELECT {key} AS k, count(*) AS a0, "
                   f"max({self.pick(INT_COLS[lt])}) AS a1 "
                   f"FROM {lt} {jt} {rt} {cond} GROUP BY k")
            names = ["k", "a0", "a1"]
        else:
            # join against an aggregated subquery (derived dimension)
            sql = (f"SELECT {self.pick(STR_COLS[lt])} AS c0, agg.a AS c1 "
                   f"FROM {lt} JOIN (SELECT {rk} AS jk, count(*) AS a "
                   f"FROM {rt} GROUP BY jk) agg ON {lk} = agg.jk")
            names = ["c0", "c1"]
        return sql, names

    def prepared_script(self):
        """PREPARE/EXECUTE template (VERDICT r11 #3): parameterize an
        integer expression with ?, $1, or a named $p marker; the script
        runs through BOTH engines' prepared-statement machinery (ours:
        sqlfront._run_prepared splice; DuckDB: native)."""
        t = self.pick(TABLES)
        e = self.int_expr(t)
        p = self.pred(t)
        val = self.pick(["0", "1", "7", "42", "-3"])
        marker = self.pick(["?", "$1", "$p"])
        name = f"fzp{self.r.randrange(10**9)}"
        body = (
            f"SELECT {e} + {marker} AS c0, count(*) AS n FROM {t} "
            f"WHERE {p} GROUP BY 1"
        )
        arg = f"p := {val}" if marker == "$p" else val
        return f"PREPARE {name} AS {body}; EXECUTE {name}({arg})"

    def statement(self):
        t = self.pick(TABLES)
        form = self.r.randrange(13)
        if form == 12:
            return self.prepared_script()
        if form >= 10:
            sql, names = self.join_core()
        elif form < 4:
            sql, names = self.core(t)
        elif form < 6:
            # set op between two same-shaped plain cores
            a, names = self.plain_core(t)
            b, _ = self.plain_core(t, n=len(names))
            op = self.pick(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
            sql = f"({a}) {op} ({b})"
        elif form < 8:
            # CTE (possibly nested)
            inner, names = self.core(t)
            if self.r.random() < 0.4:
                sql = (f"WITH c1 AS ({inner}), "
                       f"c2 AS (SELECT * FROM c1 WHERE {names[0]} IS NOT NULL) "
                       f"SELECT * FROM c2")
            else:
                sql = f"WITH c1 AS ({inner}) SELECT * FROM c1"
        elif form < 9:
            # subquery in FROM with an outer filter/projection
            inner, names = self.core(t)
            sql = f"SELECT {names[0]} FROM ({inner}) sub WHERE {names[0]} IS NOT NULL"
            names = [names[0]]
        else:
            # scalar subquery / EXISTS against another table
            t2 = self.pick([x for x in TABLES if x != t])
            sql = (f"SELECT {self.pick(INT_COLS[t])} AS c0 FROM {t} "
                   f"WHERE EXISTS (SELECT 1 FROM {t2} WHERE "
                   f"{self.pick(INT_COLS[t2])} = {self.pick(INT_COLS[t])} % 5)")
            names = ["c0"]
        # deterministic tail: ORDER BY every output ordinal (ties at a
        # LIMIT cut are then identical full rows — engine-interchangeable)
        if self.r.random() < 0.5:
            keys = ", ".join(f"{j + 1} NULLS LAST" for j in range(len(names)))
            sql += f" ORDER BY {keys}"
            if self.r.random() < 0.5:
                sql += f" LIMIT {self.r.randrange(1, 30)}"
                if self.r.random() < 0.3:
                    sql += f" OFFSET {self.r.randrange(0, 5)}"
        return sql


# --- execution / comparison ---------------------------------------------------

SF = "/root/testdata/sf0.001"


def _canon(rows):
    out = []
    for row in rows:
        cells = []
        for c in row:
            if isinstance(c, float):
                if math.isnan(c):
                    cells.append("NaN")
                else:
                    cells.append(round(c, 6))
            elif isinstance(c, bool):
                cells.append(int(c))
            else:
                cells.append(c)
        out.append(tuple(cells))
    return sorted(out, key=repr)


def run_fuzz(n: int = 500, seed: int = 1, verbose: bool = False,
             spark=None) -> dict:
    import duckdb

    from quackspark.session import get_session, register_testdata_views
    from quackspark.sqlfront import UnsupportedSQL, transpile

    spark = spark or get_session("sqlfront-fuzz", cpus=8)
    register_testdata_views(spark, SF)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    gen = Gen(random.Random(seed))
    stats = {"MATCH": 0, "UNSUPPORTED": 0, "DUCK_ERROR": 0,
             "SPARK_ERROR": 0, "MISMATCH": 0}
    failures: list[tuple[str, str, str]] = []
    from quackspark import sqlfront

    for i in range(n):
        sql_text = gen.statement()
        prepared = sql_text.lstrip().upper().startswith("PREPARE")
        try:
            want = _canon(con.execute(sql_text).fetchall()) if prepared \
                else _canon(con.sql(sql_text).fetchall())
        except Exception:
            stats["DUCK_ERROR"] += 1
            continue
        try:
            if prepared:
                # scripts go through the statement dispatch, not transpile
                got = _canon(
                    [tuple(r) for r in sqlfront.sql(spark, sql_text).collect()]
                )
                if got == want:
                    stats["MATCH"] += 1
                else:
                    stats["MISMATCH"] += 1
                    failures.append(("MISMATCH", sql_text,
                                     f"duck={want[:4]!r} spark={got[:4]!r}"))
                continue
            spark_sql = transpile(sql_text, spark)
        except UnsupportedSQL as exc:
            stats["UNSUPPORTED"] += 1
            if verbose:
                print(f"[{i}] UNSUPPORTED: {sql_text!r} ({exc})")
            continue
        except Exception as exc:
            stats["SPARK_ERROR"] += 1
            failures.append(("SPARK_ERROR", sql_text, str(exc)[:300]))
            continue
        try:
            got = _canon([tuple(r) for r in spark.sql(spark_sql).collect()])
        except Exception as exc:
            stats["SPARK_ERROR"] += 1
            failures.append(("SPARK_ERROR", sql_text, str(exc)[:300]))
            continue
        if got == want:
            stats["MATCH"] += 1
        else:
            stats["MISMATCH"] += 1
            failures.append(("MISMATCH", sql_text,
                             f"duck={want[:4]!r} spark={got[:4]!r}"))
    stats["failures"] = failures
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    stats = run_fuzz(args.n, args.seed, args.verbose)
    failures = stats.pop("failures")
    print(stats)
    for kind, sql_text, detail in failures:
        print(f"--- {kind}\n{sql_text}\n{detail}\n")
    return 1 if stats["MISMATCH"] else 0


if __name__ == "__main__":
    sys.exit(main())
