"""Sink adapters (SURVEY.md §2.10, K1-K5)."""

from . import files, jdbc, kafka  # noqa: F401
