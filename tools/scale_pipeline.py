"""Composed-curation-pipeline scale record → SCALE_PIPELINE.json
(r12 verdict directive #1: every component has an individual scale
record — SCALE_DUPSPANS 5M, SCALE_SEMDEDUP 2M, SCALE_CC_DEMO, SCALE_BPE
800x — but the PRODUCT query had never executed above sf1).

Runs `pipeline_training_prep_v3` (exact dedup → span scrub → LSH pairs
over scrubbed text → connected components → lang/quality gates →
temperature mix → rollup, quackspark/queries/pipeline.py) at 50 k / 500 k
/ 5 M documents and records, per tier:

1. fused wall seconds — the whole composition as ONE lazy plan, the way
   a deployment runs it;
2. per-stage wall + output rows — each stage materialized against the
   previous stage's checkpoint, so a stage that stops scaling is named,
   not inferred;
3. shuffle/scan metric breakdown (explain_analyze SQLMetrics) at the
   mid tier, where a full profiled re-run is affordable;
4. JVM peak RSS (VmHWM) after each tier — the "no corpus-proportional
   driver/executor state" claim as a measured number;
5. the DuckDB oracle side run under a 64 GB memory limit + spill disk
   until it completes or DNFs (the recursive-CTE clustering is the
   expected first casualty — the DNF is recorded verbatim, exactly as
   SCALE_DUPSPANS recorded the window-form OOM).

Repro: python tools/make_sf10.py && python tools/scale_pipeline.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = [
    ("sf1", os.path.join(REPO, "localdata", "sf1")),
    ("sf10", os.path.join(REPO, "localdata", "sf10")),
    ("sf100-equivalent", os.path.join(REPO, "localdata", "sf100_docs")),
]
#: cap for the single-node oracle before we interrupt and record a DNF
ORACLE_CAP_S = 1800


def _ensure_sf100_docs() -> None:
    """Same construction as tools/scale_duplicate_spans.py: 5 M docs =
    sf10 documents x 10, strided ids, ' repx{i}' suffix."""
    dst = os.path.join(REPO, "localdata", "sf100_docs")
    out = os.path.join(dst, "documents.parquet")
    src = os.path.join(REPO, "localdata", "sf10", "documents.parquet")
    if os.path.exists(out) or not os.path.exists(src):
        return
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    con.execute(f"""
        COPY (
            SELECT doc_id + i * 10000000000 AS doc_id,
                   text || ' repx' || i AS text,
                   lang, source
            FROM '{src}', range(10) t(i)
        ) TO '{out}' (FORMAT PARQUET)
    """)
    print("sf100 documents ready", file=sys.stderr)


def _jvm_peak_gb() -> float | None:
    """Peak RSS (VmHWM) of the Spark JVM, GiB."""
    import subprocess

    try:
        pids = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True, timeout=10,
        ).stdout.split()
        best = 0
        for pid in pids:
            with open(f"/proc/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmHWM"):
                        best = max(best, int(line.split()[1]))
        return round(best / 1024 / 1024, 2) if best else None
    except Exception:
        return None


def _drop(spark) -> None:
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def _stages(spark, sf):
    """The v3 composition with an eager checkpoint boundary after each
    stage — mirrors pipeline_training_prep_v3 stage for stage (the fused
    product correctness is oracled at sf0.01; this variant exists to
    attribute wall clock per stage)."""
    from pyspark.sql import functions as F

    from quackspark.functions import text as T
    from quackspark.operators import components as CC
    from quackspark.operators import dedup as D
    from quackspark.queries.pipeline import (
        _EST_THRESHOLD,
        _QUALITY_THRESHOLD,
        _STOPWORDS,
        _TEMP_FRAC,
    )
    from quackspark.queries.dedup import N_HASHES
    from quackspark.queries._util import davg
    from quackspark.session import load_table

    d = load_table(spark, sf, "documents")

    def s1_exact_dedup():
        fp = F.md5(F.concat_ws(" ", T.tokens(F.lower(F.col("text")))))
        surv_ids = (
            d.select("doc_id", fp.alias("fp"))
            .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return d.join(surv_ids, "doc_id", "left_semi")

    def s2_span_scrub(surv):
        scrubbed = D.span_scrub(surv, "text", "doc_id", window_tokens=15)
        return (
            scrubbed.join(
                surv.select(F.col("doc_id").alias("doc"), "lang", "source"),
                "doc",
            )
            .select(
                F.col("doc").alias("doc_id"),
                F.col("kept_text").alias("text"),
                "lang", "source", "n_tokens", "n_removed",
            )
        )

    def s3_lsh_pairs(sdocs):
        return D.minhash_lsh_pairs(
            sdocs, "text", "doc_id", k=3, n_hashes=N_HASHES, bands=8,
            threshold=_EST_THRESHOLD,
        )

    def s4_components(pairs):
        return CC.connected_components(pairs, "d1", "d2")

    def s5_survivor_gates(sdocs, cc):
        docs = sdocs.select(
            F.col("doc_id").alias("doc"), F.length("text").alias("len")
        )
        lab = docs.join(cc, docs["doc"] == cc["node"], "left").select(
            "doc", "len", F.coalesce("comp", "doc").alias("comp")
        )
        best = lab.groupBy("comp").agg(
            F.min(
                F.struct((-F.col("len")).alias("nl"), F.col("doc").alias("d"))
            ).alias("b")
        )
        keep_ids = best.select(F.col("b.d").alias("doc_id"))
        kept = sdocs.join(keep_ids, "doc_id", "left_semi")
        return (
            kept.filter(F.col("lang") == "en")
            .withColumn(
                "quality",
                F.round(T.quality_score(F.col("text"), _STOPWORDS["en"]), 6),
            )
            .filter(F.col("quality") >= _QUALITY_THRESHOLD)
        )

    def s6_mix_rollup(gated):
        cnt = gated.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        stats = cnt.agg(
            F.sum("n").alias("n_total"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("source", "n"))),
                    lambda s: F.sqrt(s["n"].cast("double")),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("ssum"),
        )
        target = F.floor(F.lit(_TEMP_FRAC) * F.col("n_total")).cast("double")
        rate = F.least(
            F.lit(1.0),
            target * F.sqrt(F.col("n").cast("double"))
            / F.col("ssum") / F.col("n"),
        )
        rates = cnt.crossJoin(F.broadcast(stats)).select(
            "source", F.floor(F.lit(256.0) * rate).cast("int").alias("thr")
        )
        bucket = F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
        ).cast("int")
        mixed = gated.join(F.broadcast(rates), "source").filter(
            bucket < F.col("thr")
        )
        return (
            mixed.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("docs_kept"),
                F.sum(F.size(T.tokens(F.col("text")))).alias("total_tokens"),
                F.sum("n_removed").alias("tokens_removed"),
                davg("quality").alias("mean_quality"),
            )
            .orderBy("source")
        )

    return [
        ("exact_dedup", s1_exact_dedup, ()),
        ("span_scrub", s2_span_scrub, (0,)),
        ("lsh_pairs", s3_lsh_pairs, (1,)),
        ("connected_components", s4_components, (2,)),
        ("survivor_and_gates", s5_survivor_gates, (1, 3)),
        ("mix_rollup", s6_mix_rollup, (4,)),
    ]


def main() -> int:
    import subprocess

    if not os.path.isdir(os.path.join(REPO, "localdata", "sf10")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf10.py")],
            check=True,
        )
    _ensure_sf100_docs()
    import duckdb

    from quackspark.queries import all_oracles, all_queries
    from quackspark.session import get_session

    spark = get_session("pipeline-scale")
    qs, osql = all_queries(), all_oracles()
    out: dict = {"tool": "tools/scale_pipeline.py", "sizes": {},
                 "oracle_cap_s": ORACLE_CAP_S}

    for tag, sf in SIZES:
        if not os.path.exists(os.path.join(sf, "documents.parquet")):
            print(f"skip {tag}: no fixture", file=sys.stderr)
            continue
        from quackspark.session import load_table

        n_docs = load_table(spark, sf, "documents").count()
        row: dict = {"docs": n_docs}

        # 1. fused product plan — warm median at the small tiers, one
        # run (which IS the measurement at this magnitude) at 5 M
        fn = qs["pipeline_training_prep_v3"]
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        first = time.perf_counter() - t0
        if first > 60:
            row["fused_spark_sec"] = round(first, 2)
        else:
            runs = [first]
            for _ in range(2):
                _drop(spark)
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            row["fused_spark_sec"] = round(statistics.median(runs), 2)
        _drop(spark)

        # 2. per-stage walls against checkpointed inputs
        mats: list = []
        stage_rows = {}
        for name, fn_s, dep_idx in _stages(spark, sf):
            args = [mats[i] for i in dep_idx]
            t0 = time.perf_counter()
            df = fn_s(*args).localCheckpoint(eager=True)
            n = df.count()
            stage_rows[name] = {
                "sec": round(time.perf_counter() - t0, 2), "rows": n,
            }
            mats.append(df)
            print(f"  {tag} {name}: {stage_rows[name]}", file=sys.stderr,
                  flush=True)
        row["stages"] = stage_rows
        for df in mats:
            df.unpersist()
        _drop(spark)
        row["jvm_peak_rss_gb"] = _jvm_peak_gb()

        # 3. profiled metric breakdown at the mid tier
        if tag == "sf10":
            try:
                from quackspark.catalog import explain_analyze

                prof = explain_analyze(fn(spark, sf))
                keep = ("shuffleRecordsWritten", "shuffleBytesWritten",
                        "numOutputRows", "shuffle bytes written",
                        "records read")
                agg: dict = {}
                for r in prof.collect():
                    if not any(k in r["metric"] for k in keep):
                        continue
                    cls = ("scan" if "Scan" in r["operator"]
                           else "join" if "Join" in r["operator"]
                           else "exchange" if "Exchange" in r["operator"]
                           or "Shuffle" in r["operator"]
                           else "agg" if "Aggregate" in r["operator"]
                           else "other")
                    key = f"{cls}.{r['metric'].split('(')[0].strip()}"
                    agg[key] = agg.get(key, 0) + int(r["value"])
                row["sf10_metric_breakdown"] = agg
            except Exception as exc:
                row["sf10_metric_breakdown_err"] = str(exc)[:200]
            _drop(spark)

        # 4. the single-node oracle, capped
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        con.execute("SET memory_limit = '64GB'")
        os.makedirs("/tmp/duck_spill", exist_ok=True)
        con.execute("SET temp_directory = '/tmp/duck_spill'")
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(sf, 'documents.parquet')}'"
        )
        import threading

        done = threading.Event()

        def _reaper():
            if not done.wait(ORACLE_CAP_S):
                con.interrupt()

        reaper = threading.Thread(target=_reaper, daemon=True)
        reaper.start()
        t0 = time.perf_counter()
        try:
            con.execute(osql["pipeline_training_prep_v3"]).fetchall()
            row["duckdb_sec"] = round(time.perf_counter() - t0, 2)
            row["ratio"] = round(row["fused_spark_sec"] / row["duckdb_sec"], 3)
        except duckdb.Error as exc:
            row["duckdb_sec"] = None
            row["ratio"] = None
            row["duckdb_dnf"] = (
                f"{type(exc).__name__} after "
                f"{round(time.perf_counter() - t0, 1)}s under 64GB limit + "
                f"spill disk (cap {ORACLE_CAP_S}s): {str(exc)[:160]}"
            )
        finally:
            done.set()
        con.close()

        out["sizes"][tag] = row
        print(tag, json.dumps(row), flush=True)

    with open(os.path.join(REPO, "SCALE_PIPELINE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
