"""Sources & sinks (SURVEY.md §2.2): read_csv option parity, COPY TO,
replacement scans, glob listing."""

from quackspark.sources.csvio import copy_to, from_path, read_csv  # noqa: F401
