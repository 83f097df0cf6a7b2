"""Source adapters (SURVEY.md §2.1, S1-S9).

Thin wrappers so every operator is testable on Parquet fixtures while
the same code path serves Kafka/JDBC/object-store in production.
External I/O (REST, yfinance-style fetchers) stays DRIVER-side and
enters the engine as a DataFrame — the engine proper never does
per-row network calls.
"""

from . import files, jdbc, kafka, rest  # noqa: F401
