"""quackspark — a PySpark-native analytical engine.

A brand-new engine with the query surface of DuckDB v0.7.0 (reference:
``/root/reference``, see SURVEY.md), rebuilt idiomatically on Apache Spark:
DataFrame API + Spark SQL for execution, Catalyst/Tungsten for optimization
and codegen, Structured Streaming for the streaming extension, and
Pandas-UDF-backed operators only where built-ins cannot express the
semantics (minhash, simhash, multimodal decode).

Layers (SURVEY.md §7):
  - :mod:`quackspark.session`   — session + catalog presets
  - :mod:`quackspark.functions` — DuckDB-gap function compat layer
  - :mod:`quackspark.queries`   — the operator-inventory query corpus
  - :mod:`quackspark.operators` — dedup / similarity / text-analysis /
    multimodal operators (LLM-data-pipeline extensions)
  - :mod:`quackspark.sources`   — readers (csv/parquet/json + replacement
    scan dispatch)
  - :mod:`quackspark.plans`     — Relation API (reference entry point C,
    duckdb-7.cpp:3468-3561)
  - :mod:`quackspark.streaming` — event-time windows over streams
"""

from quackspark.session import get_session, register_testdata_views

__all__ = ["get_session", "register_testdata_views"]
__version__ = "0.1.0"
