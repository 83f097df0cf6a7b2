"""Pure-SQL Bloom filter: distributed build, broadcast probe.

Spark's cost-based runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) inject
`BloomFilterMightContain` only where the optimizer chooses, and the
`bloom_filter_agg` expression behind them is not registered as a
public SQL function.  This module builds the same data structure out
of *public* codegen-friendly expressions so a query can demand a
bloom prefilter explicitly — the pattern a 100 TB decontamination or
semi-join pass needs: the huge probe side is filtered scan-stage
against a broadcast bitset of a few KiB, and only the surviving
candidate fraction enters any shuffle.

Design:

- the filter is ``m_bits`` wide, stored as a ``map<int, bigint>``
  from 64-bit slot index to slot bits (sparse: slots with no bits set
  are simply absent, and ``try_element_at`` → NULL → coalesce 0);
- the build is a two-level aggregation — per-row (slot, mask) pairs
  from ``k`` salted xxhash64 probes, ``bit_or`` per slot, then one
  ``map_from_entries(collect_list(...))`` row.  ``bit_or`` is
  map-side combinable, so at any scale the shuffle carries at most
  ``m_bits / 64`` rows per partition;
- the probe is an unrolled (no higher-order functions, stays inside
  whole-stage codegen) conjunction of ``k`` bit tests against the
  broadcast map.

Bloom filters have no false negatives, so `might_contain == false`
rows are *definitely* absent and can skip the exact join entirely;
false positives are killed by a follow-up exact semi/inner join over
the (small) candidate set — results stay exactly equal to the
un-prefiltered query, which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^17 bits = 16 KiB — comfortable broadcast, <1% false-positive rate
# for ~10k keys at k=3. Scale m_bits with the expected build-side
# cardinality; the broadcast cost grows linearly and stays tiny
# relative to the shuffle it avoids.
M_BITS_DEFAULT = 1 << 17
SEEDS_DEFAULT = (1, 2, 3)


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = M_BITS_DEFAULT,
    seeds: tuple[int, ...] = SEEDS_DEFAULT,
) -> DataFrame:
    """Aggregate ``df[col]`` into a 1-row frame with a single
    ``bloom: map<int, bigint>`` column (sparse bitset).

    ``col`` may be any hashable type — each of the ``k`` probes is
    ``pmod(xxhash64(col, seed), m_bits)`` (the seed literal is an
    extra hashed column, which decorrelates the probes).
    """
    key = F.col(col)
    positions = F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(int(s))), F.lit(m_bits))
            for s in seeds
        ]
    )
    slots = (
        df.select(F.explode(positions).alias("h"))
        .select(
            F.expr("cast(h div 64 as int)").alias("slot"),
            F.expr("shiftleft(1L, cast(h % 64 as int))").alias("mask"),
        )
        .groupBy("slot")
        .agg(F.bit_or("mask").alias("mask"))
    )
    # ≤ m_bits/64 entries by construction — collect_list is bounded
    # by a constant (the filter width), not by data size.
    return slots.agg(
        F.map_from_entries(
            F.collect_list(F.struct("slot", "mask"))
        ).alias("bloom")
    )


def might_contain(
    bloom_col: str,
    key_col: str,
    m_bits: int = M_BITS_DEFAULT,
    seeds: tuple[int, ...] = SEEDS_DEFAULT,
) -> Column:
    """Boolean probe column: true iff every salted probe bit is set.

    Unrolled per-seed (no ``aggregate``/``transform`` lambda) so the
    whole predicate compiles into the surrounding whole-stage-codegen
    scan. ``bloom_col``/``key_col`` are column *names* in the frame
    the predicate is applied to (the 1-row bloom frame is typically
    ``crossJoin(hint_small(...))``-ed in first).
    """
    terms = []
    for s in seeds:
        h = f"pmod(xxhash64({key_col}, {int(s)}), {int(m_bits)})"
        slot = f"cast(({h}) div 64 as int)"
        bit = f"cast(({h}) % 64 as int)"
        terms.append(
            f"(coalesce(try_element_at({bloom_col}, {slot}), 0L)"
            f" & shiftleft(1L, {bit})) != 0"
        )
    return F.expr(" AND ".join(terms))
