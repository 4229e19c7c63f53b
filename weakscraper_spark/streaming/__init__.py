"""Optional Structured Streaming wrapper around the batch extract
stage (SURVEY.md §4.4 — not required by the north rule, provided for
API completeness)."""

from .stream import stream_extract, stream_extract_latest  # noqa: F401
