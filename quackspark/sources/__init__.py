"""Sources & sinks (SURVEY.md §2.2): read_csv option parity, COPY TO,
replacement scans, glob listing."""

from quackspark.sources.csvio import (  # noqa: F401
    copy_to,
    from_path,
    read_csv,
    read_csv_auto,
)
from quackspark.sources.sniffer import sniff_csv  # noqa: F401
