"""LLM-data-pipeline operators as named queries (driver-mandated
extensions; BASELINE.json north star).

Dedup, similarity search, and text analysis over the `documents` /
`embeddings` tables. Exact variants carry full DuckDB oracles; the
probabilistic variants (MinHash/SimHash/hyperplane LSH) hash with
Spark's xxhash64, which DuckDB cannot reproduce, so they are
registered without oracles — the driver records rows-only checks, and
tests/test_dedup.py verifies them against the exact operators instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs_blas,
    simhash,
    simhash_near_pairs,
)
from ..operators.multimodal import (
    frame_sample,
    image_histogram_features,
    image_resize,
    image_stats,
    synthetic_images,
)
from ..operators.similarity import all_pairs_cosine, brute_force_topk, ivf_topk, lsh_topk
from ..operators.text import STOPWORDS, fingerprints, language_id, quality_scores, token_counts
from ..sources.registry import load_table
from .registry import query

# DuckDB equivalent of operators.dedup.normalized_text — note the 'g'
# flag: DuckDB's regexp_replace is first-match-only by default, Spark's
# replaces all.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_NORM}) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_duplicates
    FROM documents
    GROUP BY md5({_NORM})
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5 of normalized text, keep lowest
    doc_id (operators.dedup.exact_dedup). One shuffle keyed on the
    fingerprint — the always-first pass of a 100 TB dedup pipeline."""
    return exact_dedup(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_WORDS} AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM docs
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS sh
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(sh / CAST(sa.sz + sb.sz - sh AS DOUBLE), 4) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(sh / CAST(sa.sz + sb.sz - sh AS DOUBLE), 4) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs ≥ 0.2. Dense-kernel
    tier (operators.dedup.ngram_jaccard_pairs_blas): broadcast gram
    bitmap, per-batch BLAS block matmul, O(matches) shuffle — chosen
    because this corpus's shared vocabulary makes ~all pairs join
    candidates, where the relational gram-join tier
    (operators.dedup.ngram_jaccard_pairs, the unbounded-scale path)
    materializes 36M intermediate rows. Equality of the two tiers is
    property-tested in tests/test_dedup.py; this is the exact baseline
    the probabilistic ops are judged against."""
    return ngram_jaccard_pairs_blas(_docs(spark, sf_dir), "doc_id", "text", n=2, threshold=0.2)


@query("dedup_minhash_lsh")  # xxhash64-based → no cross-engine oracle (rows-only)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands × 4 rows) near-dup candidates with
    estimated Jaccard ≥ 0.2 (operators.dedup.minhash_dedup_pairs).
    Banding keeps candidate generation bucket-local — the scale path
    that replaces the all-pairs join. Verified against the exact
    n-gram Jaccard in tests/test_dedup.py."""
    return minhash_dedup_pairs(
        _docs(spark, sf_dir), "doc_id", "text",
        num_hashes=64, num_bands=16, shingle_n=2, threshold=0.2,
    )


@query("dedup_minhash_exact")  # candidate set is xxhash64-based → rows-only
def dedup_minhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed production pipeline
    (operators.dedup.minhash_exact_dedup_pairs): LSH candidates →
    EXACT n-gram Jaccard verification of candidates only —
    probabilistic recall, exact precision, no quadratic pass.
    tests/test_dedup.py asserts every returned pair appears in the
    all-pairs exact baseline with the identical jaccard value."""
    from ..operators.dedup import minhash_exact_dedup_pairs

    return minhash_exact_dedup_pairs(
        _docs(spark, sf_dir), "doc_id", "text",
        num_hashes=64, num_bands=16, shingle_n=2, threshold=0.2,
    )


@query("dedup_simhash")  # xxhash64-based → rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup pairs with hamming ≤ 12
    (operators.dedup.simhash + simhash_near_pairs); candidates via
    16-bit chunk banding — same bucketed-join shape as LSH."""
    sigs = simhash(_docs(spark, sf_dir), "doc_id", "text")
    return simhash_near_pairs(sigs, "doc_id", max_hamming=12)


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine ≥ threshold
    (operators.similarity.all_pairs_cosine — broadcast corpus matrix,
    BLAS batches, O(matches) shuffle). Threshold 0.45 because the
    synthetic embeddings top out at pairwise cosine ≈0.51 — a 0.95
    run would vacuously return 0 rows and prove nothing. The 100 TB
    path buckets by hyperplane signature first (ann_lsh_topk's
    machinery)."""
    return all_pairs_cosine(_emb(spark, sf_dir), "vec_id", "embedding", threshold=0.45)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
    ), scored AS (
      SELECT query_id, neighbor_id,
             ROUND(list_cosine_similarity(qv, cv), 4) AS cosine
      FROM q, c WHERE query_id <> neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors
    (operators.similarity.brute_force_topk): queries broadcast, corpus
    scanned once and never shuffled; dot products are codegen'd
    zip_with/aggregate folds (deterministic summation order — matches
    the oracle bit-for-bit before rounding)."""
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries_df, "vec_id", "embedding", k=5)


@query("ann_ivf_topk")  # seeded k-means quantizer → rows-only
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (operators.similarity.ivf_topk): k-means
    coarse quantizer → inverted lists → probe nprobe nearest lists →
    exact in-list ranking. The bucketed-storage ANN path: corpus
    shards by list_id (partition pruning at probe time), recall tuned
    by nprobe without re-indexing. Recall vs brute force measured in
    tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries_df, "vec_id", "embedding", k=5, n_lists=16, nprobe=4)


@query("ann_lsh_topk")  # plan-identical check impossible in SQL (pseudorandom planes) → rows-only
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (operators.similarity.lsh_topk):
    hyperplane sign buckets → in-bucket exact ranking. The 100 TB
    plan: equi-join on bucket key instead of a nested loop. Recall vs
    brute force is measured in tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries_df, "vec_id", "embedding", k=5, dim=64, n_planes=4)


# ---------------------------------------------------------------------------
# Multimodal (stubbed codec, real plumbing — operators.multimodal)
# ---------------------------------------------------------------------------


@query("mm_image_stats")  # synthetic SMF codec → no SQL oracle (rows-only)
def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + per-image stats over a binary media column
    (operators.multimodal.image_stats): pixels stay executor-local,
    only scalars shuffle. Codec stubbed (SMF synthetic format);
    exactness vs direct numpy decode is tested in
    tests/test_multimodal.py."""
    return image_stats(synthetic_images(spark, n=200), min_partitions=1)


@query("mm_frame_sample")  # rows-only
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over video-like containers
    (operators.multimodal.frame_sample) — the 1→n/k fan-out shape,
    emitting re-encoded frame blobs with typed metadata."""
    return frame_sample(
        synthetic_images(spark, n=100, width=16, height=32), every_k=4, min_partitions=1
    ).select(
        "id", "frame_id", F.length("content").alias("frame_bytes"), F.col("meta.height").alias("frame_rows")
    )


@query("mm_image_near_dup")  # rows-only
def mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media → embedding bridge: resize, histogram features, then the
    embedding near-dup operator (multimodal → similarity composition).
    Ids ≥ 1000 are re-labeled copies of ids 0-9 (same seed → identical
    pixels), so the result always contains those pairs at cosine 1.0 —
    asserted in tests/test_multimodal.py."""
    base = synthetic_images(spark, n=60)
    dups = base.filter(F.col("id") < 10).withColumn("id", F.col("id") + 1000)
    resized = image_resize(base.unionByName(dups), 16, 12, min_partitions=1)
    # cache: all_pairs_cosine evaluates its input twice (driver collect
    # for the broadcast matrix + the distributed batch pass); without
    # this the 3-stage python-kernel chain above runs twice end-to-end
    feats = image_histogram_features(resized, min_partitions=1).cache()
    return all_pairs_cosine(feats, "id", "embedding", threshold=0.999, min_partitions=1)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('de')}, w))) AS INT) AS hits_de,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('en')}, w))) AS INT) AS hits_en,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('es')}, w))) AS INT) AS hits_es,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('fr')}, w))) AS INT) AS hits_fr
      FROM documents
    )
    SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
           CASE WHEN GREATEST(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
                WHEN hits_de = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
                WHEN hits_en = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
                WHEN hits_es = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-hit scoring (operators.text.language_id)
    — vectorized set-membership counts, argmax with deterministic tie
    order."""
    return language_id(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "text_quality_scores",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_measured,
             CAST(len({_WORDS}) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(length(array_to_string({_WORDS}, '')) AS BIGINT) AS total_word_chars,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('en')}, w))) AS BIGINT) AS en_hits
      FROM documents
    )
    SELECT doc_id, n_chars_measured, n_words,
           ROUND(CAST(total_word_chars AS DOUBLE) / GREATEST(n_words, 1), 4) AS avg_word_len,
           ROUND(CAST(n_punct AS DOUBLE) / GREATEST(n_chars_measured, 1), 4) AS punct_ratio,
           ROUND(CAST(en_hits AS DOUBLE) / GREATEST(n_words, 1), 4) AS stopword_ratio,
           ROUND(LEAST(GREATEST(
             ROUND(CAST(en_hits AS DOUBLE) / GREATEST(n_words, 1), 4) * 2 + 0.5
             - ROUND(CAST(n_punct AS DOUBLE) / GREATEST(n_chars_measured, 1), 4) * 5,
             0.0), 1.0), 4) AS quality_score
    FROM base
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals (operators.text.quality_scores):
    length / word stats / punctuation & stopword ratios / composite
    score — the cheap pre-filters of an LLM data pipeline."""
    return quality_scores(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS regex_tokens
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (operators.text.token_counts): whitespace tokens
    + BPE-ish regex tokens, both JVM-side regex — no Python."""
    return token_counts(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "text_ngram_topk",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_WORDS} AS w FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM docs
    )
    SELECT gram,
           COUNT(*) AS occurrences,
           COUNT(DISTINCT doc_id) AS doc_frequency
    FROM grams
    GROUP BY gram
    ORDER BY occurrences DESC, gram ASC
    LIMIT 50
    """,
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics (SURVEY.md §7: n-gram counts via
    explode + A1): bigram occurrences + document frequency, top-50 with
    a deterministic tiebreak. The explode shuffles one row per gram
    OCCURRENCE — at 100 TB this is the heaviest text shuffle, which is
    why partial hash aggregation (map-side combine on the gram key)
    and the TakeOrderedAndProject top-k matter: only (gram, counts)
    pairs reach the exchange, and no global sort materializes."""
    docs = _docs(spark, sf_dir)
    from ..operators.dedup import normalized_text, word_ngrams

    grams = (
        docs.withColumn("__words", F.split(normalized_text("text"), " "))
        .select(F.col("doc_id"), F.explode(word_ngrams("__words", 2)).alias("gram"))
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_frequency"),
        )
        .orderBy(F.desc("occurrences"), F.asc("gram"))
        .limit(50)
    )


@query(
    "text_fingerprints",
    oracle=f"""
    SELECT doc_id, md5({_NORM}) AS md5_fingerprint
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (operators.text.fingerprints). The
    xxhash64 shard key is Spark-specific, so the oracle checks the md5
    column only; the full operator (with xxh64) is exercised in
    tests/test_text.py."""
    return fingerprints(_docs(spark, sf_dir), "doc_id", "text").select(
        "doc_id", "md5_fingerprint"
    )
