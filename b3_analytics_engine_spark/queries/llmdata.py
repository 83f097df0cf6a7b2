"""LLM-training-data extension queries over ``documents`` and
``embeddings`` (BASELINE.json north star; FIXTURES.md §C).

Dedup / text-analysis / similarity-search operators as first-class
registry entries. SQL-expressible ones carry a DuckDB oracle; the
LSH-based ones (non-deterministic recall by design) are verified in
pytest against their exact counterparts and registered rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as TX
from ..tables import load_table
from . import register


@register(
    "dedup_exact",
    oracle="""
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keep_id,
       count(*) AS n_copies,
       list_sort(list(doc_id)) AS member_ids
FROM documents
GROUP BY 1
""",
    survey="ext:dedup-exact",
    description="Exact dedup: hash-groupBy on a normalized md5 content "
    "fingerprint. Only (16-byte hash, id) pairs shuffle — document "
    "text never leaves the scan.",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(load_table(spark, sf_dir, "documents"))


@register(
    "text_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         length(text) AS n_chars_computed
  FROM documents
)
SELECT doc_id, n_tokens, n_chars_computed,
       round(n_chars_computed / greatest(n_tokens, 1), 6) AS mean_word_len
FROM toks
""",
    survey="ext:text-analysis",
    description="Per-document token/char counts and mean word length — "
    "the quality-scoring feature base, all codegen'd SQL expressions.",
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    n_tok = TX.token_count(c)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length(c).alias("n_chars_computed"),
        F.round(
            F.length(c) / F.greatest(n_tok, F.lit(1)), 6
        ).alias("mean_word_len"),
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
    survey="ext:text-fingerprint",
    description="128-bit normalized content fingerprint (md5) per "
    "document — the dedup/caching key primitive.",
)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fingerprint"))


@register(
    "ngram_jaccard_pairs",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, sh FROM toks,
  UNNEST(list_distinct(list_transform(
    range(1, greatest(len(t) - 3, 0) + 2),
    i -> array_to_string(t[i:i+2], ' ')
  ))) AS u(sh)
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.12
""",
    survey="ext:dedup-ngram-jaccard",
    description="Exact 3-token-shingle Jaccard near-dup pairs via "
    "inverted-index self-join (never materializes N² pairs; only "
    "docs sharing a shingle meet).",
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.12
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,  # LSH recall < 1 by design → rows-only driver check;
    # exactness vs ngram_jaccard_pairs asserted in tests/test_llmdata.py
    survey="ext:dedup-minhash-lsh",
    description="MinHash(64)+LSH(16 bands) candidate generation with "
    "exact-Jaccard verification — same output contract as "
    "ngram_jaccard_pairs but candidate cost O(N·bands) instead of "
    "posting-list joins over every shared shingle.",
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=64,
        bands=16,
        n=3,
        threshold=0.12,
    )


@register(
    "dedup_simhash",
    oracle=None,  # signature function (xxhash64) is Spark-specific →
    # rows-only driver check + pytest structural assertions
    survey="ext:dedup-simhash",
    description="64-bit SimHash near-dup pairs; candidates via 16-bit "
    "chunk banding (pigeonhole over Hamming ≤ 3), exact Hamming "
    "filter. One signature per doc, no text shuffle.",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


def _queries_side(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@register(
    "cosine_topk",
    oracle="""
SELECT query_id, rank, neighbor_id, cos_sim
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos_sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                    c.vec_id ASC
         ) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
)
WHERE rank <= 5
""",
    survey="ext:similarity-bruteforce",
    description="Exact cosine top-5 neighbors for 10 query vectors: "
    "broadcast query side, corpus streamed once (never shuffled), "
    "dot products as codegen'd array folds, per-query top-k window. "
    "Ties broken by neighbor_id; cosine computed in double + "
    "round(6) for cross-engine determinism.",
)
def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_bruteforce(emb, _queries_side(spark, sf_dir), k=5)


@register(
    "cosine_ann_lsh",
    oracle=None,  # approximate by design; recall vs brute force
    # asserted in tests/test_llmdata.py
    survey="ext:similarity-ann-lsh",
    description="ANN cosine top-5 via random-hyperplane LSH (8 bits × "
    "12 tables, 1-bit multiprobe): bucket equi-join replaces the "
    "all-pairs scan — the 100 TB scale path for similarity search.",
)
def cosine_ann_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_ann_lsh(
        emb, _queries_side(spark, sf_dir), k=5, dim=64, bits=8, tables=12
    )


@register(
    "embedding_neardup",
    oracle=None,  # LSH recall < 1 by design; verified in tests
    survey="ext:dedup-embedding-cosine",
    description="Embedding-cosine near-duplicate pairs (cos ≥ 0.95) "
    "via random-hyperplane LSH self-join.",
)
def embedding_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_neardup_pairs(emb, threshold=0.95, dim=64)
