"""WITH RECURSIVE fixpoint loop (reference PhysicalRecursiveCTE,
duckdb-4.cpp:7608: repeatedly executes the recursive part against the
working table until no new rows).

Spark has no recursive-query primitive, so the fixpoint runs as a
driver-side loop over DataFrames. Scale posture (SURVEY.md §7):

- UNION (distinct) semantics dedupe via ``exceptAll``/``dropDuplicates``
  against the accumulated set — a shuffle per iteration, same as the
  reference's group-by-all dedup per iteration.
- ``localCheckpoint`` every iteration truncates the lineage so plan size
  stays O(1) in iteration count instead of O(n) (the classic driver-OOM
  trap of iterative Spark jobs).
- Only ``isEmpty()`` touches the driver — never the row data, so the
  working set stays distributed no matter how wide the frontier gets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

MAX_ITERATIONS = 1000


def recursive_cte(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    *,
    union_all: bool = False,
    max_iterations: int = MAX_ITERATIONS,
) -> DataFrame:
    """Evaluate ``WITH RECURSIVE t AS (seed UNION [ALL] step(t)) SELECT * FROM t``.

    ``step`` receives the previous iteration's *frontier* (the rows produced
    by the last recursive step, matching the reference's working-table
    semantics) and returns the next candidate rows.

    With ``union_all=False`` (UNION), rows already in the accumulated result
    are removed from the frontier each round — this terminates on cyclic
    data, exactly like the reference's dedup against the intermediate table.
    """
    acc = seed.localCheckpoint(eager=True)
    frontier = acc
    for _ in range(max_iterations):
        nxt = step(frontier)
        if not union_all:
            nxt = nxt.dropDuplicates().exceptAll(acc)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc
        acc = acc.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(f"recursive_cte did not converge in {max_iterations} iterations")
