"""Structured Streaming layer — capability extension beyond the reference,
which has no event-time streaming at all (SURVEY.md §2.10: its STREAMING_*
operators are pipelined batch delivery, duckdb.hpp:11923,11935-11936).
"""
