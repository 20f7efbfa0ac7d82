"""Commit-log versioned tables (sources/commitlog.py): optimistic
concurrency, snapshot pinning, conflict detection — the minimal slice of
the reference's MVCC+WAL transaction machinery (DuckTransaction
duckdb-internal.hpp:10232, WriteAheadLog duckdb-internal.hpp:9421) that
makes sense on immutable distributed storage (SURVEY.md §4.2)."""

from __future__ import annotations

import os
import threading

import pytest

from quackspark.sources.commitlog import (
    CommitConflict,
    VersionedTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_create_read_roundtrip(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    assert not t.exists()
    v = t.create(_df(spark, [("a", 1), ("b", 2)]))
    assert v == 0 and t.exists()
    got = sorted(tuple(r) for r in t.snapshot().read(spark).collect())
    assert got == [("a", 1), ("b", 2)]
    with pytest.raises(CommitConflict):
        t.create(_df(spark, [("x", 9)]))  # double-create loses the claim


def test_append_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("a", 1)]))
    v1 = t.append(_df(spark, [("b", 2)]))
    assert v1 == 1
    assert t.snapshot().read(spark).count() == 2
    # time travel: version 0 still reads exactly the original rows
    assert [tuple(r) for r in t.snapshot(0).read(spark).collect()] == [("a", 1)]


def test_snapshot_pinned_across_rewrite(spark, tmp_path):
    """A reader holding a snapshot keeps its exact file list (and the
    files stay on disk) while a rewrite commits under it."""
    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("a", 1), ("b", 2)]))
    pinned = t.snapshot()
    t.rewrite(_df(spark, [("a", 100)]), read_version=pinned.version)
    # new tip sees the rewrite…
    assert [tuple(r) for r in t.snapshot().read(spark).collect()] == [("a", 100)]
    # …the pinned reader still sees version 0, files intact on disk
    got = sorted(tuple(r) for r in pinned.read(spark).collect())
    assert got == [("a", 1), ("b", 2)]
    assert all(os.path.exists(f) for f in pinned.files)


def test_concurrent_appends_both_commit(spark, tmp_path):
    """Two writers that read the same tip and both append: the version
    claim is atomic, the loser rebases, both land."""
    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("a", 1)]))
    va = t.append(_df(spark, [("b", 2)]))
    vb = t.append(_df(spark, [("c", 3)]))
    assert {va, vb} == {1, 2}
    assert t.snapshot().read(spark).count() == 3


def test_disjoint_rewrites_both_commit(spark, tmp_path):
    """Writers touching provably disjoint partition keys never conflict —
    the 'concurrent disjoint writers' contract."""
    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("seed", 0)]), keys={"date": "d0"})
    t.append(_df(spark, [("a", 1)]), keys={"date": "d1"})
    t.append(_df(spark, [("b", 2)]), keys={"date": "d2"})
    base = t.snapshot().version
    # both rewrites read the SAME version, touch different partitions
    v1 = t.rewrite(_df(spark, [("a", 10)]), read_version=base, keys={"date": "d1"})
    v2 = t.rewrite(_df(spark, [("b", 20)]), read_version=base, keys={"date": "d2"})
    assert v2 > v1 > base
    got = dict(
        (r["k"], r["v"]) for r in t.snapshot().read(spark).collect()
    )
    assert got == {"seed": 0, "a": 10, "b": 20}


def test_overlapping_rewrites_conflict(spark, tmp_path):
    """Second rewrite of the SAME keys from a stale read version raises
    one clean retryable CommitConflict — and the retry (re-read, re-try)
    then succeeds."""
    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("a", 1)]), keys={"date": "d1"})
    base = t.snapshot().version
    t.rewrite(_df(spark, [("a", 10)]), read_version=base, keys={"date": "d1"})
    loser = _df(spark, [("a", 99)])
    with pytest.raises(CommitConflict):
        t.rewrite(loser, read_version=base, keys={"date": "d1"})
    # the documented recovery: re-read the tip, retry
    v = t.rewrite(loser, read_version=t.snapshot().version, keys={"date": "d1"})
    assert [tuple(r) for r in t.snapshot(v).read(spark).collect()] == [("a", 99)]


def test_full_table_rewrite_conflicts_with_append(spark, tmp_path):
    """An unkeyed (whole-table) rewrite must conflict with ANY intervening
    commit — it may cover the newly appended rows."""
    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("a", 1)]))
    base = t.snapshot().version
    t.append(_df(spark, [("b", 2)]))
    with pytest.raises(CommitConflict):
        t.rewrite(_df(spark, [("a", 10)]), read_version=base)


def test_version_claim_race_is_atomic(tmp_path):
    """The filesystem claim itself (no Spark): 16 threads race every
    version; exactly one wins each, nobody double-claims, nobody stalls."""
    t = VersionedTable(str(tmp_path / "t"))
    os.makedirs(t.log_dir, exist_ok=True)
    wins: list[tuple[int, int]] = []
    lock = threading.Lock()

    def run(tid: int):
        for v in range(30):
            if t._claim(v, {"op": "test", "tid": tid, "add": [], "remove": []}):
                with lock:
                    wins.append((v, tid))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(16)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    versions = [v for v, _ in wins]
    assert sorted(versions) == list(range(30))  # each claimed exactly once
    # every winning commit file parses back and no temp junk is left
    assert t._versions() == list(range(30))
    assert not [f for f in os.listdir(t.log_dir) if f.startswith(".tmp")]


def test_vacuum_removes_only_orphans(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("a", 1)]))
    pinned = t.snapshot()
    t.rewrite(_df(spark, [("a", 2)]), read_version=0)
    # removed-but-once-referenced files survive vacuum (time travel works)
    assert t.vacuum() == []
    assert pinned.read(spark).count() == 1
    # a FRESH unreferenced file is an in-flight write, NOT an orphan:
    # every writer lands data files before the commit that references
    # them, so default vacuum must leave it alone (fuzz seed 271828
    # found the no-grace vacuum erasing a concurrent UPDATE's rows)
    orphan_dir = os.path.join(t.data_dir, "deadbeef")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-orphan.parquet")
    open(orphan, "wb").close()
    assert t.vacuum() == []
    assert os.path.exists(orphan)
    # once older than the grace window it is a genuine crashed-writer
    # orphan and is collected
    old = os.path.getmtime(orphan) - 3600
    os.utime(orphan, (old, old))
    assert t.vacuum() == [os.path.join("data", "deadbeef", "part-orphan.parquet")]
    assert not os.path.exists(orphan)


def test_checkpointed_replay_equivalence(spark, tmp_path):
    """Every _CHECKPOINT_EVERY commits a full-state checkpoint lands;
    snapshots resolved through a checkpoint are identical to full replay,
    at the tip, between checkpoints, and below the first one (time
    travel). The Delta checkpoint idea — replay cost bounded by the
    interval, not table age."""
    import glob

    t = VersionedTable(str(tmp_path / "t"))
    t.create(_df(spark, [("seed", 0)]))
    for i in range(1, 46):
        t.append(_df(spark, [("row", i)]))
    assert t._checkpoints() == [20, 40]
    by_ckpt = {v: sorted(t.snapshot(v).files) for v in (5, 20, 25, 45)}
    for f in glob.glob(os.path.join(t.log_dir, "*.checkpoint.json")):
        os.unlink(f)
    for v, files in by_ckpt.items():
        assert sorted(t.snapshot(v).files) == files, f"version {v}"
    # checkpoint files never count as versions
    assert t._versions() == list(range(46))
