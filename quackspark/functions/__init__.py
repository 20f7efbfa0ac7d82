"""Function-compatibility layer: DuckDB-surface functions Spark lacks
(SURVEY.md §2.3-2.9), as Column-expression builders first, pandas UDFs only
where composition genuinely can't express the semantics.
"""

from quackspark.functions.compat import (
    bar,
    duck_kurtosis,
    duck_skewness,
    glob_to_regex,
    hamming,
    jaccard,
    jaro_winkler,
    list_product_sorted,
    sem,
    strip_accents,
    time_bucket,
)
from quackspark.functions.timefmt import strftime_spark, strptime_spark, translate_format

__all__ = [
    "bar",
    "duck_kurtosis",
    "duck_skewness",
    "glob_to_regex",
    "hamming",
    "jaccard",
    "jaro_winkler",
    "list_product_sorted",
    "sem",
    "strip_accents",
    "time_bucket",
    "strftime_spark",
    "strptime_spark",
    "translate_format",
]
