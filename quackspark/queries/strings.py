"""strings — filled in during round 1."""

QUERIES = {}
ORACLES = {}
