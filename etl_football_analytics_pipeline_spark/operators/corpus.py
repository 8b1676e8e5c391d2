"""Corpus-assembly operators for training-data pipelines: deterministic
splits, train/test decontamination, and sequence packing.

Driver-mandated LLM-pipeline extensions (no reference counterpart —
the reference stops at the warehouse; these cover what a large-scale
training-data pipeline needs AFTER curation: carving held-out splits,
checking evaluation contamination, and packing documents into
fixed-length training sequences).

Every operator here is exactly reproducible in ANSI SQL (md5-based
splits, string n-grams, window cumulative sums), so all three carry
full DuckDB value oracles — unlike the seeded/xxhash64 probabilistic
dedup family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _with_grams, normalized_text

# (name, lo_hex, hi_hex) over the FIRST hex char of md5(id): 16 equal
# buckets → 12/2/2 = 75% / 12.5% / 12.5%. Hex-char ranges compare
# lexicographically in any engine, so the split is portable SQL.
DEFAULT_SPLITS: tuple[tuple[str, str, str], ...] = (
    ("train", "0", "b"),
    ("val", "c", "d"),
    ("test", "e", "f"),
)


def deterministic_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, str, str]] = DEFAULT_SPLITS,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split from a content-free hash of
    its id — the train/val/test carve of a training corpus.

    md5(cast(id as string)) is deterministic across runs, engines,
    partitionings, and cluster sizes (no seed, no RNG state), so the
    same document lands in the same split forever — the property a
    held-out set must have. Pure Column expressions, ZERO shuffle:
    at 100 TB this is a free map over the scan.

    `splits` is (name, lo_hex_char, hi_hex_char) over the first hex
    digit of the md5, giving 16 equally likely buckets (md5's first
    digit is uniform); overlapping ranges are rejected (an overlap
    would silently assign the overlap to whichever split sorts last).
    Rows matching no range get NULL — callers can treat that as
    "excluded"."""
    spans = sorted((lo, hi, name) for name, lo, hi in splits)
    for (_, hi_prev, name_prev), (lo, _, name) in zip(spans, spans[1:]):
        if lo <= hi_prev:
            raise ValueError(
                f"split ranges overlap: {name_prev!r} and {name!r} both cover {lo!r}"
            )
    first = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    expr = F.lit(None).cast("string")
    for name, lo, hi in reversed(splits):
        expr = F.when((first >= lo) & (first <= hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def _hex_threshold(fraction: float) -> str:
    """Threshold for `fraction` of the md5 keyspace — lowercase
    zero-padded 8 hex digits, so LEXICOGRAPHIC comparison against the
    first 8 md5 hex chars equals the numeric comparison in any SQL
    engine (no hex→int conversion needed anywhere). Full keep returns
    the sentinel 'g' (above every hex char — an 8-digit encoding of
    16^8 would need 9 digits and break the trick); zero returns
    '00000000', which no key compares below."""
    f = min(max(fraction, 0.0), 1.0)
    if f >= 1.0:
        return "g"
    t = int(round(f * 16**8))
    # fractions within 2^-33 of 1.0 ROUND to 16^8 itself, which would
    # format as nine digits and invert the 8-char lexicographic
    # comparison (only keys starting '0' would pass) — that rounding
    # means "keep everything", same as f >= 1.0
    return "g" if t >= 16**8 else format(t, "08x")


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic `fraction` sample: keep a row iff the first 8 hex
    chars of md5(salt:id) fall below the fraction's threshold — the
    seedless downsampling used to thin a source before mixing.

    Unlike DataFrame.sample (seeded RNG over the PARTITIONING — a
    repartition changes the sample), membership depends only on
    (salt, id): stable across runs, engines, partitionings, and
    cluster sizes, and different salts draw independent samples.
    Pure Column expression, ZERO shuffle."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.limit(0)
    key = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
    )
    return df.filter(key < _hex_threshold(fraction))


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-domain mixture sampling: keep `fractions[g]` of each
    `group_col` domain (default_fraction for unlisted domains) — the
    training-mix reweighting step (e.g. keep all of wiki, a tenth of
    crawl). Same deterministic md5 membership as hash_sample, with the
    threshold chosen per domain by a literal CASE — no join, no
    shuffle, no per-domain pass: ONE map over the scan regardless of
    how many domains the mix names."""
    key = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
    )
    thr = F.lit(_hex_threshold(default_fraction))
    for g, frac in sorted(fractions.items()):
        thr = F.when(F.col(group_col) == g, F.lit(_hex_threshold(frac))).otherwise(thr)
    return df.filter(key < thr)


def ngram_containment(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-test-document n-gram containment against a training corpus —
    the decontamination check run before trusting any benchmark score
    (a test doc whose grams mostly appear in training data is leaked).

    containment(d) = |grams(d) ∩ grams(train)| / |grams(d)| over
    distinct word n-grams. Relational end to end:

    - train side reduces to its DISTINCT GRAM SET (one hash shuffle
      keyed on the gram — at 100 TB the set is far smaller than the
      corpus and never driver-resident);
    - test grams LEFT JOIN that set on xxhash64(gram) — an 8-byte
      join key instead of the gram string (the documented ~|grams|²/2^65
      collision bound shared with the dedup family); both sides
      hash-partition on the key, AQE splits hot grams;
    - one groupBy(test id) folds match flags into the fraction.

    Returns (id, n_grams, n_matched, containment) — one row per test
    doc with at least one gram, containment rounded to 4dp."""
    train_grams = (
        _with_grams(train, id_col, text_col, n)
        .select(F.xxhash64("gram").alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    test_grams = _with_grams(test, id_col, text_col, n).select(
        F.col("__id"), F.xxhash64("gram").alias("__g")
    )
    return (
        test_grams.join(train_grams, "__g", "left")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_matched"),
        )
        .withColumn(
            "containment",
            F.round(F.col("n_matched") / F.col("n_grams").cast("double"), 4),
        )
    )


def whitespace_token_count_expr(text_col: str) -> F.Column:
    """The normalized whitespace word-count Column (see
    whitespace_token_counts) — exposed so composed suites can ride it
    on a wider projection (e.g. one per-doc metadata checkpoint
    carrying id/source/n_chars/n_tokens) instead of a separate pass."""
    norm = normalized_text(text_col)
    return (
        F.when(norm.isNull() | (norm == ""), F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
    )


def whitespace_token_counts(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "n_tokens"
) -> DataFrame:
    """(id, n_tokens) where n_tokens is the normalized whitespace word
    count — the cheap token proxy used for packing budgets and split
    accounting (exact BPE counts swap in via operators.text).

    NULL and empty/whitespace-only text count 0 tokens: bare
    size(split(...)) would bill empty docs 1 (split('') is ['']) and
    NULL docs -1 (legacy sizeOfNull) — a NEGATIVE count that would
    walk pack_sequences' cumulative token position backwards and
    misassign every later document in the bucket."""
    return df.select(
        F.col(id_col), whitespace_token_count_expr(text_col).alias(out_col)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    num_partitions: int | None = None,
    id_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    `id_col` order into one virtual token stream, which is cut into
    fixed `seq_len` windows; each document is tagged with the training
    sequence its FIRST token falls in and its offset inside it — the
    deterministic packing used to build fixed-length LM batches.

    Needs a global cumulative sum in id order WITHOUT a global window
    (a single-partition WindowExec dies at fact scale — same hazard as
    operators.surrogate). Two-phase scheme, numeric value buckets:

    - bucket rows by fixed-width ranges of the numeric id (bounds from
      one min/max agg — deterministic across jobs, no sampling, no
      cache);
    - pass 1: per-bucket token sums → driver prefix sums (ONE long per
      bucket crosses the wire);
    - pass 2: intra-bucket running sum (window partitioned by bucket —
      matches the shuffle, every bucket sums concurrently) + bucket
      offset = each doc's global stream position.

    Ids must be non-null and unique for a total order (both hold for
    surrogate-keyed corpora). Integer ids bucket by fixed-width value
    ranges (bounds from one min/max agg — deterministic, no sampling,
    no cache); other id types fall back to repartitionByRange +
    spark_partition_id, cached for the two passes because the range
    sampler's boundaries must not move between them (the same
    dispatch as operators.surrogate.zip_with_index). Returns
    (id, tokens, seq_id, seq_offset) with seq_id = floor(pos/seq_len),
    seq_offset = pos mod seq_len, pos = tokens before this doc.

    `id_bounds` (r12, guide §1.3/§6): callers that already KNOW the
    integer id range — e.g. from parquet footer column statistics
    (sources.registry.parquet_col_bounds), the same metadata pushdown
    trusts — pass it to skip the min/max aggregation job. The bounds
    only shape the BUCKETING; the packed positions are provably
    identical for any contiguous bucketing that covers the ids (the
    driver prefix sum accumulates per-bucket totals in ascending
    bucket order, so every document's global stream position is the
    sum of tokens of all lower-id documents regardless of where the
    bucket boundaries fall). Bounds merely need to cover the true
    range; they need not be tight."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if dict(df.dtypes).get(id_col) not in ("tinyint", "smallint", "int", "bigint"):
        bucketed = (
            df.select(id_col, tokens_col)
            .repartitionByRange(parts, F.asc(id_col))
            .withColumn("__pid", F.spark_partition_id())
            # localCheckpoint (not cache): pins the materialized
            # partition ids AND releases storage when the frame is
            # dropped — a cache() entry would outlive the call
            .localCheckpoint()
        )
        return _pack_bucketed(bucketed, id_col, tokens_col, seq_len)
    if id_bounds is not None:
        mn, mx = id_bounds
    else:
        mn, mx = df.agg(F.min(id_col), F.max(id_col)).first()
    if mn is None:
        return df.select(
            F.col(id_col),
            F.col(tokens_col),
            F.lit(0).cast("long").alias("seq_id"),
            F.lit(0).cast("long").alias("seq_offset"),
        ).limit(0)
    width = max(1, ((int(mx) - int(mn)) // parts) + 1)
    bucketed = df.select(id_col, tokens_col).withColumn(
        "__pid", ((F.col(id_col) - F.lit(int(mn))) / F.lit(width)).cast("long")
    )
    return _pack_bucketed(bucketed, id_col, tokens_col, seq_len)


def _pack_bucketed(
    bucketed: DataFrame, id_col: str, tokens_col: str, seq_len: int
) -> DataFrame:
    """Shared second half of pack_sequences: per-bucket sums → driver
    prefix offsets (one long per bucket) → intra-bucket running sum."""
    sums = {
        r["__pid"]: r["__s"]
        for r in bucketed.groupBy("__pid").agg(F.sum(tokens_col).alias("__s")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid])
    offset_map = F.create_map(
        *[lit for pid, off in offsets.items() for lit in (F.lit(pid), F.lit(off))]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)) + offset_map[F.col("__pid")]
    return bucketed.select(
        F.col(id_col),
        F.col(tokens_col),
        F.floor(pos / seq_len).cast("long").alias("seq_id"),
        (pos % seq_len).cast("long").alias("seq_offset"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    word-token windows of `chunk_size` tokens advancing by
    `chunk_size - overlap` — the retrieval/embedding preprocessing
    step (chunk → embed → ANN-index, feeding operators.similarity).

    Output: (id, chunk_id, chunk_text, n_tokens) with chunk_id 0-based
    in document order. Every document emits at least one chunk (short
    and empty docs yield one chunk with whatever tokens exist), the
    final chunk may be short, and a document's token stream is exactly
    reconstructable from its chunks minus the overlaps.

    Pure narrow plan: whitespace-split → posexplode over a
    `sequence()` of chunk starts → `slice` + `array_join`. Zero
    shuffle, zero UDFs; chunking 100 TB is embarrassingly parallel
    and this plan keeps it that way.
    """
    if chunk_size <= 0 or overlap < 0 or overlap >= chunk_size:
        raise ValueError("need chunk_size > 0 and 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # NULL text follows the empty-doc contract ('' chunk, 0 tokens) —
    # same coalesce policy as every other text operator; without it
    # size(split(NULL)) propagates NULL through greatest/least and a
    # NULL-text doc would emit (chunk_text=NULL, n_tokens=64)
    words = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    # trim('') splits to [''] — treat as zero tokens
    n_words = F.when(
        (F.size(words) == 1) & (F.element_at(words, 1) == ""), F.lit(0)
    ).otherwise(F.size(words))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n_words - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return (
        df.select(
            F.col(id_col),
            words.alias("__w"),
            n_words.alias("__nw"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("__w"), F.col("__start") * stride + 1, chunk_size), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_size), F.col("__nw") - F.col("__start") * stride
            ).cast("int").alias("n_tokens"),
        )
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    k: int,
    salt: str = "strat",
) -> DataFrame:
    """EXACT-size stratified sample: the k rows of each stratum whose
    md5(salt:id) keys are smallest — deterministic across runs,
    engines, partitionings, and cluster sizes (hash_sample's seedless
    membership idea, upgraded from a fraction to an exact per-stratum
    count; different salts draw independent samples).

    Scale shape: the naive plan is one row_number window per stratum —
    correct, but a giant stratum funnels through a single partition's
    sort. This plan puts a partition-local Arrow combiner in front:
    each input partition keeps only its own k smallest keys per
    stratum (bounded state: k rows x strata per partition), so the
    window's exchange carries at most k x num_partitions rows per
    stratum instead of the stratum itself. The combiner never changes
    the answer — a row in the global top-k is in its partition's
    top-k — and the final window runs on the reduced set.
    """
    import pandas as pd  # noqa: PLC0415 — Arrow combiner only

    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    tagged = df.withColumn("__sk", key)
    schema = tagged.schema

    def local_topk(batches):
        best: dict[object, pd.DataFrame] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pool = (
                pd.concat([*best.values(), pdf], ignore_index=True)
                if best
                else pdf
            )
            best = {
                # na_position='first' mirrors the Spark window's
                # F.asc (nulls FIRST): a NULL sample key (NULL id)
                # must survive the combiner iff the uncombined window
                # would rank it — pandas' default nulls-last would
                # silently drop it from the local top-k
                s: g.sort_values(
                    "__sk", kind="stable", na_position="first"
                ).head(k)
                for s, g in pool.groupby(stratum_col, dropna=False, sort=False)
            }
        if best:
            yield pd.concat(best.values(), ignore_index=True)

    reduced = tagged.mapInPandas(local_topk, schema)
    w = Window.partitionBy(stratum_col).orderBy(F.asc("__sk"))
    return (
        reduced.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__sk", "__rn")
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    n_shards: int = 1024,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic EPOCH SHUFFLE + sharding — the training-reader
    layout step downstream of packing: every example gets a
    pseudo-random (shard, position-within-shard) so N data-loader
    workers each read one shard's files SEQUENTIALLY and the global
    visit order is still shuffled. Changing ``seed`` reshuffles
    (epoch 2 = seed+1); same seed reproduces the exact order on any
    cluster size, partitioning, or engine — the property checkpointed
    training needs to resume mid-epoch.

    No RNG state anywhere: the shuffle key is
    ``md5('shuffle:<seed>:' || id)`` (the corpus family's seedless-
    hash discipline — deterministic_split / hash_sample /
    stratified_sample), the shard is the key's first 8 hex digits mod
    ``n_shards``, and the position is a row_number within the shard
    ordered by (key, id) — totally ordered, so ties cannot make
    engines disagree.

    NULL ids hash to a NULL key and land together in a NULL shard
    (the corpus family's convention — deterministic, never an error);
    filter them upstream if the reader layout requires dense shards.

    100 TB shape: one hash-partition exchange on the shard key, then a
    PARTITION-LOCAL sort of corpus/n_shards rows — pick ``n_shards``
    so a shard fits an executor's sort budget (10k shards over 100 TB
    = 10 GB/shard; spill-safe either way). No global sort exists in
    the plan, and nothing depends on input layout.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = F.md5(
        F.concat(F.lit(f"shuffle:{seed}:"), F.col(id_col).cast("string"))
    )
    tagged = df.withColumn("__sk", key).withColumn(
        shard_col,
        (F.conv(F.substring("__sk", 1, 8), 16, 10).cast("long") % n_shards)
        .cast("int"),
    )
    w = Window.partitionBy(shard_col).orderBy(F.asc("__sk"), F.asc(id_col))
    return (
        tagged.withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__sk")
    )
