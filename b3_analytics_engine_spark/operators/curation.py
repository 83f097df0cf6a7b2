"""Corpus-curation operators for LLM-training-data pipelines:
deterministic stratified sampling and token-aware sequence packing.

Extension surface (BASELINE.json north star; not in the reference —
see SURVEY.md §2 'beyond-reference'). Both operators are built for the
100 TB shape:

- **stratified_sample** — per-stratum hash sampling. The keep/drop
  decision is a pure function of (id, stratum), so it is reproducible
  across runs/retries/engines, requires no shuffle at all (filter
  pushes into the scan stage), and never needs a global count or sort
  the way reservoir sampling does.
- **pack_sequences** — greedy sequential packing of documents into
  fixed-token-capacity bins (the standard pre-training batching step).
  Packing is a per-stream recurrence, so the corpus is sharded into
  ``(lang, shard)`` streams that pack independently and in parallel —
  one shuffle on the stream key, one ordered mapInPandas pass, carry
  state across Arrow batches. Bin quality is unaffected by sharding
  (any greedy stream gives ≥ 50% fill at reasonable capacity) and the
  parallelism scales with shard_mod, not corpus size.

The sampling/sharding hash is md5-derived (not xxhash64) so DuckDB
oracles can reproduce it bit-for-bit: both engines lowercase-hex md5.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import token_count


def md5_bucket(col: Column, mod: int) -> Column:
    """Deterministic bucket in [0, mod): first 8 hex chars of
    md5(string(col)) as an integer, mod ``mod``.

    Cross-engine reproducible — DuckDB:
    ``('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT % mod``.
    32 hash bits ≫ any practical mod, so bucket skew is ~uniform.
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(mod))


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Keep each row iff ``md5_bucket(id, 1000) < rate(stratum)``.

    ``rates_permille`` maps stratum value → keep-rate in ‰ (1000 keeps
    everything); unlisted strata use ``default_permille``. Adds the
    ``bucket_permille`` column so the decision is auditable.
    """
    bucket = md5_bucket(F.col(id_col), 1000)
    rate = F.lit(default_permille)
    for stratum, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum_col) == stratum, permille).otherwise(rate)
    return df.withColumn("bucket_permille", bucket).filter(
        F.col("bucket_permille") < rate
    )


def shard_hash(id_col: str, salt: str = "0") -> Column:
    """60-bit md5-derived hash of ``id:salt`` — the deterministic
    permutation key behind :func:`shard_assignment` and the
    training-shard writer (``sinks.files.write_training_shards``).
    DuckDB replay: ``('0x'||substr(md5(id::VARCHAR||':salt'),1,15))::BIGINT``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def shard_assignment(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "0",
) -> DataFrame:
    """Deterministic global shuffle into training shards: the manifest
    ``(id, shard, pos)`` a 100 TB training-data writer materializes
    before emitting one file per shard.

    ``shard`` is a 60-bit md5-derived hash of ``id:salt`` mod
    ``n_shards`` — a pure function of the row, so reruns, retries and
    other engines agree; changing ``salt`` is a fresh epoch-level
    reshuffle with zero state. ``pos`` ranks the hash within the shard
    (ties broken by id), giving a pseudo-random read order WITHIN each
    shard too — the "global shuffle" training wants, without ever
    sorting the corpus globally. Physical plan: one hash shuffle on
    ``shard`` + a per-shard sort (window); the writer twin is
    ``df.repartition(n_shards, col).sortWithinPartitions(...)`` which
    streams straight into per-shard files.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), shard_hash(id_col, salt).alias("h"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


PACKING_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("shard", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("bin_fill", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    shard_mod: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Greedy sequential sequence packing into token bins.

    Within each ``(lang, shard)`` stream, documents are taken in id
    order; a document goes into the current bin unless it would push
    the fill past ``capacity``, in which case it opens the next bin
    (a document longer than ``capacity`` gets a bin of its own).
    Output: one row per doc with its (1-based) ``bin_id`` within the
    stream and the bin's running ``bin_fill`` after placing it.

    Same physical shape as the batch EWMA: shuffle on the stream key,
    sort within partitions, one mapInPandas pass whose carry dict
    seeds streams that span Arrow-batch boundaries. The recurrence is
    the textbook non-SQL-expressible scan — the oracle uses a
    recursive CTE.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: dict[tuple, tuple[int, int]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            bins, fills = [], []
            # plain-list zip instead of itertuples: the recurrence is
            # inherently sequential (bin reset depends on prior
            # resets), but namedtuple construction per row was ~3x the
            # loop body; .tolist() converts each column once per batch
            for lang, shard, n_tokens in zip(
                pdf["lang"].tolist(),
                pdf["shard"].tolist(),
                pdf["n_tokens"].tolist(),
            ):
                key = (lang, shard)
                bin_id, fill = carry.get(key, (0, 0))
                if bin_id == 0 or fill + n_tokens > capacity:
                    bin_id, fill = bin_id + 1, int(n_tokens)
                else:
                    fill += int(n_tokens)
                carry[key] = (bin_id, fill)
                bins.append(bin_id)
                fills.append(fill)
            yield pdf.assign(bin_id=bins, bin_fill=fills)

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        md5_bucket(F.col(id_col), shard_mod).alias("shard"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    return (
        base.repartition("lang", "shard")
        .sortWithinPartitions("lang", "shard", "doc_id")
        .mapInPandas(fn, schema=PACKING_SCHEMA)
    )
