"""Persisted MinHash signature / hashed-postings artifacts — compute
once, reuse across every MinHash-family consumer.

Why this exists (r9 verdict task #3): the three slowest bench queries
(`decontaminate_fuzzy`, `dedup_minhash_lsh`, `dedup_simhash`) each
recompute signatures from raw text per run. A 100 TB pipeline never
does that — tokenize → shingle → hash → min-aggregate is the dominant
corpus-scan cost, and dedup, decontamination, and clustering passes
all consume the SAME (id, shingle-hash) inverted index and the SAME
(id, m0..m{k-1}) signature table. This module persists both as
Parquet artifacts keyed by (corpus, n, portable[, num_hashes, seed])
with read-through semantics: the first consumer pays the computation
and the write; every later consumer pays a Parquet scan.

Scale notes:
- The postings artifact is O(total tokens) rows of (long id, long
  hash) — a narrow two-column table that Parquet RLE/dictionary
  encodes well. On a cluster you would additionally ``bucketBy(id)``
  into a metastore table so the verify self-join is co-located; plain
  directory Parquet keeps this module metastore-free and the join
  AQE-planned.
- Writes go through a staging directory + atomic rename swap
  (:func:`..sinks.files.replace_directory`), so a crashed writer
  never leaves a half-artifact that a reader mistakes for complete;
  completeness is additionally gated on the ``_SUCCESS`` marker.
- Artifacts are immutable snapshots of the corpus AT WRITE TIME.
  ``refresh=True`` recomputes; callers appending to a corpus must
  refresh (or key a new corpus name per snapshot, the lakehouse way).

The registered oracle queries never touch this module — they stay
pure functions of the test Parquet (bit-exact DuckDB parity). This is
the production entry point, like the hot-bucket cap defaults in
``pipelines``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .operators.dedup import (
    _signatures_from_hashed,
    hashed_postings,
    simhash_signatures,
)
from .sinks.files import _hadoop_fs, replace_directory


class SignatureStore:
    """Read-through Parquet cache for MinHash-family artifacts.

    ``root`` is any directory Spark can read/write (local path, s3a://,
    hdfs://). Layout::

        <root>/hashed_postings/<corpus>/n=<n>/portable=<0|1>/
        <root>/minhash_signatures/<corpus>/n=<n>/portable=<0|1>/k=<k>/seed=<s>/
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------------------------------------------------------- paths
    def postings_path(self, corpus: str, n: int = 3, portable: bool = False) -> str:
        return os.path.join(
            self.root, "hashed_postings", corpus, f"n={n}", f"portable={int(portable)}"
        )

    def signatures_path(
        self,
        corpus: str,
        n: int = 3,
        portable: bool = False,
        num_hashes: int = 64,
        seed: int = 42,
    ) -> str:
        return os.path.join(
            self.root,
            "minhash_signatures",
            corpus,
            f"n={n}",
            f"portable={int(portable)}",
            f"k={num_hashes}",
            f"seed={seed}",
        )

    # -------------------------------------------------------- helpers
    def _is_complete(self, path: str) -> bool:
        jvm, fs, _ = _hadoop_fs(self.spark, path)
        return fs.exists(
            jvm.org.apache.hadoop.fs.Path(os.path.join(path, "_SUCCESS"))
        )

    def _write_atomic(self, df: DataFrame, path: str) -> None:
        """Write to a staging dir, then atomic-rename into place — a
        crashed write leaves no ``_SUCCESS``-bearing half-artifact."""
        tmp = path.rstrip("/") + "__staging"
        df.write.mode("overwrite").parquet(tmp)
        replace_directory(self.spark, tmp, path)

    # ------------------------------------------------------ artifacts
    def postings(
        self,
        df: DataFrame,
        corpus: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        portable: bool = False,
        refresh: bool = False,
    ) -> DataFrame:
        """The ``(id, sh)`` hashed inverted index for ``corpus`` —
        computed from ``df`` and persisted on first call, read from
        Parquet afterwards. Row-identical to
        :func:`..operators.dedup.hashed_postings` (pinned by
        ``tests/test_signature_store.py``)."""
        path = self.postings_path(corpus, n, portable)
        if refresh or not self._is_complete(path):
            self._write_atomic(
                hashed_postings(df, id_col, text_col, n, portable), path
            )
        return self.spark.read.parquet(path)

    def signatures(
        self,
        df: DataFrame,
        corpus: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        portable: bool = False,
        num_hashes: int = 64,
        seed: int = 42,
        refresh: bool = False,
    ) -> DataFrame:
        """The ``(id, m0..m{k-1})`` MinHash signature table — derived
        from the postings ARTIFACT (never re-tokenizes if postings
        already exist) and itself persisted. Row-identical to
        :func:`..operators.dedup.minhash_signatures`."""
        path = self.signatures_path(corpus, n, portable, num_hashes, seed)
        if refresh or not self._is_complete(path):
            posts = self.postings(
                df, corpus, id_col, text_col, n, portable, refresh=refresh
            )
            self._write_atomic(
                _signatures_from_hashed(posts, num_hashes, seed), path
            )
        return self.spark.read.parquet(path)

    def simhash_path(
        self, corpus: str, nbits: int = 64, portable: bool = False
    ) -> str:
        return os.path.join(
            self.root,
            "simhash_signatures",
            corpus,
            f"nbits={nbits}",
            f"portable={int(portable)}",
        )

    def simhash(
        self,
        df: DataFrame,
        corpus: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        nbits: int = 64,
        portable: bool = False,
        refresh: bool = False,
    ) -> DataFrame:
        """The ``(id, sig)`` SimHash table — token-level (not derived
        from the shingle postings), so it is its own first-class
        artifact. Row-identical to
        :func:`..operators.dedup.simhash_signatures`; feeds
        ``simhash_pairs(sig=...)``."""
        path = self.simhash_path(corpus, nbits, portable)
        if refresh or not self._is_complete(path):
            self._write_atomic(
                simhash_signatures(df, id_col, text_col, nbits, portable),
                path,
            )
        return self.spark.read.parquet(path)
