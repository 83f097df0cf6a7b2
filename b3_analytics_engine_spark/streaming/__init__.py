"""Structured-Streaming layer (SURVEY.md §2.9, T1-T8)."""

from . import pipeline  # noqa: F401
