"""Python UDTFs (Spark 4 user-defined table functions).

The reference has no UDF/UDAF/UDTF surface at all (SURVEY.md §2.11);
the rebuild needs none for parity either — every parity operator is
native Catalyst expressions. This module exists for the cases a
training-data pipeline genuinely can't express relationally: per-row
imperative expansion with stateful loops (overlapping context windows,
format-specific record splitting). A UDTF is the right escape hatch
shape — it streams rows out per input row inside the executor, joins
laterally, and never collects to the driver.

Cost note: a Python UDTF is still the slow path (pickled rows through
a Python worker). ``ChunkWithOverlap(overlap=0)`` is deliberately
row-identical to the native posexplode/groupBy chunker
(queries/llmdata.py::chunk_documents_q, asserted in tests) so the
native plan remains the default; reach for the UDTF only when the
expansion logic stops being expressible (overlap > 0, tokenizer state,
variable stride).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_id bigint, n_chunk_tokens bigint, chunk_text string"
)
class ChunkWithOverlap:
    """Split whitespace tokens into ``size``-token chunks where each
    chunk overlaps the previous by ``overlap`` tokens (stride =
    size − overlap) — the standard long-document → context-window
    expansion for LLM pretraining. Empty/whitespace-only text yields
    one empty chunk (parity with the native chunker's behavior on a
    single empty token)."""

    def eval(self, text: str, size: int, overlap: int):
        toks = (text or "").strip().split()
        if not toks:
            yield 0, 1, ""
            return
        stride = max(size - overlap, 1)
        chunk_id = 0
        for start in range(0, len(toks), stride):
            piece = toks[start : start + size]
            yield chunk_id, len(piece), " ".join(piece)
            chunk_id += 1
            if start + size >= len(toks):
                break


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on ``spark`` for SQL lateral use:
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL
    chunk_with_overlap(text, 32, 8) c``."""
    spark.udtf.register("chunk_with_overlap", ChunkWithOverlap)
