"""Composable DataFrame operators — the engine's operator library.

Each module groups one family from SURVEY.md §2 (the reference operator
inventory) plus the LLM-data extension operators. Everything is a pure
function ``DataFrame -> DataFrame`` (or Column helpers) so operators
compose into pipelines and stay fully Catalyst-optimizable.
"""

from . import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    multimodal,
    rowops,
    similarity,
    text,
    windows,
)
