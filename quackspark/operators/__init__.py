"""Custom operators Spark lacks a single primitive for (SURVEY.md §2.1
"no Spark analog" rows): recursive CTE fixpoint, plus the training-data
north-star ops (dedup, similarity) in sibling modules."""
