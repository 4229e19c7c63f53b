"""Spark session construction and the end-to-end extraction pipeline
(C1–C13 of SURVEY.md §3C)."""
