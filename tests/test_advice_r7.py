"""r7 ADVICE regression pins: derived-twin invalidation safety, the
ns-resolution source fingerprint, the TIMETZ type-token fix, and the
bench layout pre-build covering secondary projections."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from quackspark.sources import derived


def test_translate_type_timetz_consumes_one_token():
    """TIMETZ consumes exactly its own token: a trailing suffix like
    TIMETZ(3) must surface as a malformed downstream type, not be
    silently swallowed (r7 ADVICE #5: the zone-scan ate every remaining
    token, so `TIMETZ(3)` lost the `(3)` and `TIMETZ, b INT` would have
    eaten the rest of the column list)."""
    from quackspark.ddl import _translate_type
    from quackspark.sqlfront import _tokens

    assert _translate_type(_tokens("TIMETZ")) == (
        "STRUCT<micros:BIGINT,offset_s:INT>"
    )
    assert _translate_type(_tokens("TIME WITH TIME ZONE")) == (
        "STRUCT<micros:BIGINT,offset_s:INT>"
    )
    # the suffix SURVIVES (malformed → loud Spark DDL parse error)
    assert "(3)" in _translate_type(_tokens("TIMETZ(3)"))


def test_fingerprint_uses_mtime_ns(tmp_path):
    """Same-size same-second rewrite must change the fingerprint (r7
    ADVICE #3: int(st_mtime)+size missed deterministic same-second
    parquet rewrites)."""
    p = tmp_path / "t.parquet"
    p.write_bytes(b"x" * 64)
    fp1 = derived._source_fingerprint(str(tmp_path), "t")
    # bump mtime by 1µs, same size, same whole second
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000))
    fp2 = derived._source_fingerprint(str(tmp_path), "t")
    assert fp1 != fp2


def _mk_unit(path: str, fp: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_QS_SPEC.json"), "w") as f:
        json.dump(
            {"version": derived.LAYOUT_VERSION, "source_fingerprint": fp,
             "bucket_key": None},
            f,
        )


def test_swap_into_place_never_deletes_concurrent_fresh_build(tmp_path):
    """The invalidation race from r7 ADVICE #1: our build loses the
    publish race to a concurrent builder whose twin is already fresh —
    the fresh dir must survive untouched and our tmp must be discarded."""
    final = str(tmp_path / "unit")
    tmp = str(tmp_path / "unit.tmp.123")
    _mk_unit(final, "fresh-fp")  # concurrent builder's published result
    _mk_unit(tmp, "fresh-fp")  # our slower duplicate build
    derived._swap_into_place(tmp, final, "fresh-fp")
    assert os.path.isdir(final)
    assert derived._read_spec(final, "fresh-fp") is not None
    assert not os.path.exists(tmp)


def test_swap_into_place_replaces_stale_dir(tmp_path):
    final = str(tmp_path / "unit")
    tmp = str(tmp_path / "unit.tmp.124")
    _mk_unit(final, "old-fp")  # stale twin from the previous fixture
    _mk_unit(tmp, "new-fp")
    derived._swap_into_place(tmp, final, "new-fp")
    assert derived._read_spec(final, "new-fp") is not None
    assert not os.path.exists(tmp)
    # the stale dir was renamed aside and removed, not left behind
    assert not any(".stale." in n for n in os.listdir(tmp_path))


def test_swap_into_place_replaces_torn_dir(tmp_path):
    final = str(tmp_path / "unit")
    tmp = str(tmp_path / "unit.tmp.125")
    os.makedirs(final)  # torn build: no spec sidecar
    with open(os.path.join(final, "part-0.parquet"), "w") as f:
        f.write("junk")
    _mk_unit(tmp, "fp")
    derived._swap_into_place(tmp, final, "fp")
    assert derived._read_spec(final, "fp") is not None


def test_bench_layout_prebuilds_q13_projection(tmp_path):
    """bench._ensure_layout must pre-build the orders__by_o_custkey
    projection q13 reads (r7 ADVICE #2: the sf1 section takes a >5s
    first run as THE measurement, so an in-query projection build would
    contaminate it). Checked structurally: the helper calls
    load_table_projection for orders/o_custkey."""
    import inspect

    import bench

    src = inspect.getsource(bench._ensure_layout)
    assert "load_table_projection" in src
    assert "o_custkey" in src
