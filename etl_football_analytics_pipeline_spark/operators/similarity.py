"""Similarity search over embedding columns (array<float>).

Driver-mandated extension (BASELINE.json north star): nearest-neighbor
and near-duplicate search over `embeddings.parquet`.

Design: dense vector math is the one place where built-in Column
expressions lose badly — Catalyst's higher-order functions (zip_with/
aggregate) are interpreted per element, ~100× slower than BLAS. So the
kernels here are Arrow-vectorized `mapInPandas` batches doing numpy
matrix products against a broadcast query/corpus matrix, which is the
idiomatic PySpark fast path. The *orchestration* stays relational:

- brute-force top-k: corpus scanned once, never shuffled; the small
  query set ships as a broadcast variable; each batch emits its local
  top-k per query under the exact global ordering key, so the global
  window top-k over (batches × k × |Q|) rows is provably identical to
  a full sort — a distributed TakeOrdered.
- all-pairs near-dup: corpus matrix broadcast, batches emit only pairs
  above threshold. O(n²) compute but O(matches) shuffle. At 100 TB
  this brute-force tier is replaced by the hyperplane-LSH bucketed
  join below — same kernels, candidates restricted to equal buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..utils import spread


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    # reciprocal-then-multiply: elementwise division is ~40× slower
    # than multiply on this host, so divide once per row, not per cell
    return mat * (1.0 / norms)


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side collect of a SMALL vector set (query set / broadcast
    corpus). The big side always streams through mapInPandas."""
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, _unit_rows(mat)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 4,
    min_partitions: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector, self-matches excluded.
    Returns (query_id, neighbor_id, cosine, rank).

    Each corpus batch computes a (batch × |Q|) cosine matrix in BLAS
    and emits its top-k per query under the exact global order key
    (rounded cosine desc, neighbor_id asc) — the global window then
    merges per-batch winners. Since the order key is total (ids
    unique), per-batch pruning cannot change the global result.
    """
    spark = corpus.sparkSession
    if queries.isEmpty():  # np.stack cannot build an empty matrix
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qids, qmat = _collect_matrix(queries, id_col, vec_col)
    bq = spark.sparkContext.broadcast((qids, qmat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, q_mat = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy()
            c_mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            cos = np.round(c_mat @ q_mat.T, round_to)  # B × Q
            frames = []
            for j, qid in enumerate(q_ids):
                col = cos[:, j]
                mask = c_ids != qid
                ids_j, cos_j = c_ids[mask], col[mask]
                if len(ids_j) > k:
                    # exact global order: (-cosine, neighbor_id)
                    order = np.lexsort((ids_j, -cos_j))[:k]
                    ids_j, cos_j = ids_j[order], cos_j[order]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids_j, "cosine": cos_j}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    # small single-file corpora arrive as one partition; spread the
    # BLAS blocks across cores (workers run 1 BLAS thread each).
    # Project FIRST: Spark cannot prune columns through a mapInPandas
    # black box, so an unprojected corpus would ship every metadata
    # column through Arrow into the Python workers
    scored = spread(corpus.select(id_col, vec_col), min_partitions).mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def all_pairs_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 4,
    min_partitions: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold — the embedding
    near-duplicate detector. Corpus matrix broadcast; each batch emits
    only its above-threshold pairs, so shuffle volume is O(matches).

    Brute-force tier: correct at any size, economical up to corpora
    whose matrix fits the broadcast (~10M×64 floats ≈ 2.5 GB). Beyond
    that, bucket with hyperplane_signatures first and run this within
    buckets.
    """
    spark = df.sparkSession
    ids, mat = _collect_matrix(df, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, mat))

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            b_ids = pdf[id_col].to_numpy()
            b_mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            cos = np.round(b_mat @ all_mat.T, round_to)  # B × N
            rows, cols = np.nonzero((cos >= threshold) & (b_ids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": b_ids[rows],
                    "id_b": all_ids[cols],
                    "cosine": cos[rows, cols],
                }
            )

    # project first: mapInPandas blocks column pruning, so metadata
    # columns would otherwise ride the Arrow transfer
    return spread(df.select(id_col, vec_col), min_partitions).mapInPandas(
        pairs, "id_a long, id_b long, cosine double"
    )


def hyperplane_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket key: sign bits of dot products with
    `n_planes` seeded pseudorandom hyperplanes, packed into a long.
    Deterministic across runs/partitionings (fixed RNG seed, exact sign
    tests). Vectorized: one (batch × planes) matrix product per batch.
    """
    spark = df.sparkSession
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bp = spark.sparkContext.broadcast(planes)
    out_schema = f"{id_col} long, {vec_col} array<float>, {out} long"

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        weights = (1 << np.arange(pl.shape[0], dtype=np.int64))
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ pl.T) >= 0  # B × planes
            bucket = (bits.astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), vec_col: pdf[vec_col], out: bucket}
            )

    return spread(df.select(id_col, vec_col)).mapInPandas(sign, out_schema)


def lsh_all_pairs_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
    round_to: int = 4,
    min_partitions: int | None = None,
    center: bool = False,
    scoring: str = "auto",
) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ threshold) via hyperplane-LSH
    bucketing — the 100 TB tier that replaces all_pairs_cosine's
    broadcast-corpus matrix.

    `center=True` buckets on mean-centered projections (scoring stays
    on the ORIGINAL vectors, so emitted cosines are unchanged): for
    mean-dominated families — histogram features, frequency profiles —
    every vector points near the corpus mean, all sign bits agree, and
    the buckets degenerate to one quadratic blob per table. Subtracting
    the mean spreads the residual directions so the 2^n_planes buckets
    actually split. Centering is projection-side only: project(v - μ) =
    project(v) - project(μ), so it costs one tiny avg-per-component
    aggregate (map-side combined) plus a length-(tables·planes) offset
    broadcast — nothing corpus-sized moves. Recall semantics under
    centering: candidates are pairs with similar RESIDUALS (v - μ).
    Exact duplicates center identically (recall 1.0), and true
    near-dups of mean-dominated families (a re-encoded image, a
    lightly edited document) share their residual pattern, so they
    stay candidates. What centering deliberately drops: pairs whose
    original-space cosine clears the threshold only because the
    shared mean dominates independent residuals — at 0.999 on uniform
    histograms those are the noise floor, not near-duplication. Both
    sides of the boundary are pinned in tests/test_similarity.py.

    `scoring` picks how candidates inside a (table, bucket) cell are
    scored: 'bucket' = one dense matmul per group via applyInPandas
    (wins when few planes → few, large buckets); 'join' = a
    shuffle_hash self-equi-join on (table, bucket) followed by a
    row-wise Arrow-batched cosine (wins when many planes → a huge
    sparse bucket space where per-group pandas overhead on
    near-singleton groups dominates). 'auto' switches to 'join' at
    2^n_planes ≥ 4096. Both tiers emit identical pairs; cosines are
    float64 unit-row dots rounded to `round_to` either way, deduped
    per pair by max() below.

    OR-amplified sign-LSH: `n_tables` independent sets of `n_planes`
    hyperplanes; a pair is a candidate iff it lands in the same bucket
    in ANY table (P[candidate] = 1-(1-p^planes)^tables with
    p = 1-θ/π). Scoring is BUCKET-LOCAL: one exchange hash-partitions
    the (id, vec, table, bucket) rows by bucket key, and each bucket
    scores its own all-pairs cosine as a single dense matmul, emitting
    only above-threshold pairs — so the expensive candidate stream
    (quadratic in bucket size) exists only inside executor-local numpy
    and never shuffles; the one post-shuffle is a distinct over
    SURVIVORS (pairs found in several tables score identically, so the
    dedup is exact). Nothing broadcast grows with the corpus; hot
    buckets are bounded by n_planes (each plane halves the expected
    bucket occupancy). Probabilistic recall (tests/test_similarity.py
    measures ≥0.9 vs the brute-force tier at the registered
    threshold), exact precision.
    """
    spark = df.sparkSession
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    bp = spark.sparkContext.broadcast(planes)  # tables×planes×dim floats: O(1) in corpus
    if center:
        # one map-side-combined aggregate → a dim-length mean on the
        # driver; folded into a constant per-plane offset so the sign
        # kernel needs no per-row subtraction
        mean_row = df.select(
            *[F.avg(F.col(vec_col)[i]).alias(f"m{i}") for i in range(dim)]
        ).first()
        mu = np.array([mean_row[i] or 0.0 for i in range(dim)], dtype=np.float64)
        offset = planes @ mu  # (tables·planes,)
    else:
        offset = np.zeros(n_tables * n_planes)
    bo = spark.sparkContext.broadcast(offset)

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        off = bo.value
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ pl.T - off) >= 0  # B × (tables·planes)
            per_table = bits.reshape(len(pdf), n_tables, n_planes)
            bucket = (per_table.astype(np.int64) * weights).sum(axis=2)  # B × T
            nrows = len(pdf)
            yield pd.DataFrame(
                {
                    "__id": np.repeat(pdf[id_col].to_numpy(), n_tables),
                    vec_col: pdf[vec_col].iloc[
                        np.repeat(np.arange(nrows), n_tables)
                    ].to_numpy(),
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), nrows),
                    "bucket": bucket.reshape(-1),
                }
            )

    buckets = spread(df.select(id_col, vec_col), min_partitions).mapInPandas(
        sign, f"__id long, {vec_col} array<float>, table int, bucket long"
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ids = pdf["__id"].to_numpy()
        mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
        cos = np.round(mat @ mat.T, round_to)
        rows, cols = np.nonzero((cos >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"id_a": ids[rows], "id_b": ids[cols], "cosine": cos[rows, cols]}
        )

    if scoring == "auto":
        # few planes → few big buckets: per-bucket dense matmul wins.
        # many planes → bucket space (2^planes) dwarfs any realistic
        # group size, applyInPandas would pay its per-GROUP pandas
        # overhead on near-singleton groups (measured 2× slower than
        # brute at 15k imgs / 16 planes) — the candidate equi-join
        # pays per-CANDIDATE instead.
        scoring = "join" if (1 << n_planes) >= 4096 else "bucket"
    if scoring == "join":
        # both join sides read the sign kernel's output — materialize
        # it once (eager checkpoint, ContextCleaner-freed) or the
        # full-corpus stack+matmul mapInPandas pass executes twice
        buckets = buckets.localCheckpoint(eager=True)
        a = buckets.select(
            F.col("__id").alias("id_a"), F.col(vec_col).alias("__va"), "table", "bucket"
        )
        b = buckets.select(
            F.col("__id").alias("id_b"), F.col(vec_col).alias("__vb"), "table", "bucket"
        )
        cand = (
            a.hint("shuffle_hash")
            .join(b, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__va", "__vb")
        )

        def score_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                va = _unit_rows(np.stack(pdf["__va"].to_numpy()).astype(np.float64))
                vb = _unit_rows(np.stack(pdf["__vb"].to_numpy()).astype(np.float64))
                cos = np.round(np.einsum("ij,ij->i", va, vb), round_to)
                keep = cos >= threshold
                yield pd.DataFrame(
                    {
                        "id_a": pdf["id_a"].to_numpy()[keep],
                        "id_b": pdf["id_b"].to_numpy()[keep],
                        "cosine": cos[keep],
                    }
                )

        scored = cand.mapInPandas(score_pairs, "id_a long, id_b long, cosine double")
    else:
        scored = buckets.groupBy("table", "bucket").applyInPandas(
            score_bucket, "id_a long, id_b long, cosine double"
        )
    # dedup KEYED ON THE PAIR, not the float: BLAS reduction order
    # varies with bucket matrix shape, so a cosine at a 4dp rounding
    # boundary can round differently across buckets — distinct() over
    # (id_a, id_b, cosine) would then emit the same pair twice. max()
    # is a deterministic per-pair choice at the same one-shuffle cost.
    return scored.groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample: int = 4096,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means on a bounded deterministic
    sample (lowest ids — stable across runs/partitionings), Lloyd
    iterations driver-side in one BLAS block. The sample bound keeps
    driver memory O(sample × dim) no matter the corpus size; at 100 TB
    the training set is still a few thousand vectors."""
    pdf = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)  # cosine on unit rows
        for j in range(len(centroids)):
            members = mat[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
        centroids = _unit_rows(centroids)
    return centroids


def _assign_lists(
    df: DataFrame,
    centroids_bc,
    id_alias: str,
    vec_col: str,
    vec_alias: str,
    nprobe: int,
) -> DataFrame:
    """(id, vec, list_id) — each vector is replicated into its nprobe
    nearest inverted lists (queries probe several; corpus uses 1)."""
    out_schema = f"{id_alias} long, {vec_alias} array<float>, list_id int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = centroids_bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            sims = mat @ cents.T  # B × k
            # a quantizer trained on a tiny sample can hold fewer than
            # nprobe centroids — clamp, or the id/list columns would
            # disagree in length and the executor kernel would crash
            p = min(nprobe, cents.shape[0])
            top = np.argsort(-sims, axis=1)[:, :p]  # B × p
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_alias: np.repeat(pdf.iloc[:, 0].to_numpy(), p),
                    vec_alias: pdf[vec_col].iloc[np.repeat(np.arange(n), p)].to_numpy(),
                    "list_id": top.reshape(-1).astype(np.int32),
                }
            )

    return spread(df).mapInPandas(assign, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → inverted
    lists → probe the query's nprobe nearest lists → exact cosine
    ranking within candidates.

    The scale shape: corpus vectors partition by list_id (each list is
    a co-located shard; at 100 TB, write the corpus bucketed by
    list_id so probes prune partitions), the candidate join is an
    equi-join on list_id with the tiny probe table broadcast, and
    recall is tunable via nprobe without touching the stored lists —
    the knob LSH lacks. Recall vs brute force is measured in
    tests/test_similarity.py."""
    spark = corpus.sparkSession
    centroids = kmeans_centroids(corpus, id_col, vec_col, k=n_lists, seed=seed)
    bc = spark.sparkContext.broadcast(centroids)

    cb = _assign_lists(corpus.select(id_col, vec_col), bc, "neighbor_id", vec_col, "__cvec", 1)
    qb = _assign_lists(queries.select(id_col, vec_col), bc, "query_id", vec_col, "__qvec", nprobe)
    # no pair dedup needed: corpus vectors are assigned to exactly ONE
    # list (nprobe=1 above), so a (query, neighbor) pair can match the
    # list_id equi-join at most once — a dropDuplicates here would be
    # a pure extra shuffle
    pairs = (
        cb.join(F.broadcast(qb), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            a = _unit_rows(np.stack(pdf["__qvec"].to_numpy()).astype(np.float64))
            b = _unit_rows(np.stack(pdf["__cvec"].to_numpy()).astype(np.float64))
            cos = np.round(np.einsum("ij,ij->i", a, b), round_to)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cosine": cos,
                }
            )

    scored = pairs.mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the IVF index: corpus parquet PARTITIONED BY
    list_id (each inverted list is its own directory — the bucketed
    storage layout where a probe reads only its lists' files) plus the
    trained centroids stored alongside. Returns the centroids.

    `centroids` (optional): use this FIXED quantizer instead of
    training — the deploy-a-frozen-model path, and what lets the
    registered query pin literal centroids its oracle can replay.

    This is the persisted form of ivf_topk's in-flight assignment: at
    100 TB you pay the k-means + one partitioned write once, and every
    subsequent query prunes partitions instead of scanning the corpus.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = kmeans_centroids(corpus, id_col, vec_col, k=n_lists, seed=seed)
    else:
        centroids = _unit_rows(np.asarray(centroids, dtype=np.float64))
    bc = spark.sparkContext.broadcast(centroids)
    assigned = _assign_lists(corpus.select(id_col, vec_col), bc, id_col, vec_col, vec_col, 1)
    # repartition BY LIST before the partitioned write: without it every
    # input partition writes its own part-file into every list dir
    # (n_input × n_lists small files — a probe then pays hundreds of
    # scan-task overheads); with it each list is one coherent file per
    # shuffle partition holding it, which is the layout a probe wants
    # to open. At larger scale this also bounds file count by the
    # shuffle partitioning instead of input × lists.
    from .tombstones import replace_dir

    # manifest-commit both relations (replace_dir): a plain in-place
    # overwrite of an EXISTING index under a caller's
    # partitionOverwriteMode=dynamic keeps ghost list partitions the
    # new corpus never touches — the same resurrection defect class
    # bm25_build_index guards; the fresh manifest tree is immune, and
    # the publish is object-store-safe (no tree renames)
    replace_dir(
        spark, f"{path}/lists",
        lambda p: assigned.repartition(F.col("list_id"))
        .write.partitionBy("list_id")
        .parquet(p),
    )
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    cent_df = spark.createDataFrame(
        cent_rows, "list_id int, centroid array<double>"
    ).coalesce(1)
    replace_dir(spark, f"{path}/centroids", lambda p: cent_df.write.parquet(p))
    return centroids


def stored_centroids(spark, path: str) -> np.ndarray:
    """The index's trained centroids, row i = list i — bounded
    (n_lists × dim) driver state by construction."""
    from ..manifest import read_relation

    pdf = read_relation(spark, f"{path}/centroids").toPandas()
    pdf = pdf.sort_values("list_id")
    return np.stack([np.asarray(c, dtype=np.float64) for c in pdf["centroid"]])


def ivf_append_index(
    spark,
    path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign new vectors to the
    EXISTING centroids and append them to their list partitions — no
    quantizer retrain, no rewrite of the resident lists. At 100 TB
    this is the nightly-ingest path: the append touches only the list
    directories the delta lands in, and probes read the new files
    through the same partition pruning.

    Standard IVF caveat (documented, not hidden): appended mass does
    not move the centroids, so a drifting distribution degrades list
    balance over time — rebuild periodically (ivf_build_index), the
    same discipline every IVF system prescribes. Appends are
    file-atomic per task but not transactional across lists; wrap the
    index dir in sources.versioned for snapshot-isolated readers."""
    from ..manifest import resolved_dir

    bc = spark.sparkContext.broadcast(stored_centroids(spark, path))
    assigned = _assign_lists(delta.select(id_col, vec_col), bc, id_col, vec_col, vec_col, 1)
    # same repartition-by-list discipline as the build: each touched
    # list gains ONE coherent file per shuffle partition holding it,
    # not one per input partition. The append lands in the LIVE
    # manifest tree (new files only — object-store-safe).
    assigned.repartition(F.col("list_id")).write.mode("append").partitionBy(
        "list_id"
    ).parquet(resolved_dir(spark, f"{path}/lists"))


def ivf_delete_index(
    spark, path: str, doomed: DataFrame, id_col: str = "vec_id"
) -> None:
    """Tombstone vectors out of the persisted IVF index: doomed ids
    append to `path/tombstones`; every probe anti-joins them AFTER the
    partition-pruned list scan, so a deleted vector can never appear
    as a neighbor — exactly as if the index were rebuilt without it
    (asserted in tests/test_similarity.py). No list rewrite;
    compaction = periodic rebuild, same discipline as append drift."""
    from .tombstones import append_tombstones

    append_tombstones(doomed, path, id_col)


def ivf_compact_index(spark, path: str, id_col: str = "vec_id") -> None:
    """Physically rewrite the inverted lists WITHOUT tombstoned
    vectors and reset the tombstone set — hard erasure for the vector
    index (IVF-PQ shares the layout and tombstones, so this compacts
    both probe paths). Centroids are untouched (deletes don't move the
    quantizer; retraining is the separate rebuild path). The lists
    relation rewrites via replace_dir (survivors into a fresh
    manifest tree, one marker-file commit — object-store-safe since
    r8): durable before the source is touched, and immune to
    a caller's partitionOverwriteMode=dynamic, under which an in-place
    overwrite would keep fully-tombstoned list partitions on disk.
    Probe results unchanged by construction (asserted in tests)."""
    from ..manifest import read_relation
    from .tombstones import drop_tombstones, filter_tombstones, replace_dir

    live = filter_tombstones(
        spark, path, read_relation(spark, f"{path}/lists"), id_col
    )
    replace_dir(
        spark, f"{path}/lists",
        lambda p: live.repartition(F.col("list_id"))
        .write.partitionBy("list_id")
        .parquet(p),
    )
    drop_tombstones(spark, path)


def ivf_search_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Probe a persisted IVF index: rank each query against ONLY its
    nprobe nearest lists. The scan filter `list_id IN (...)` reaches
    the partitioned layout as partition pruning — the files of
    unprobed lists are never opened (asserted via inputFiles in
    tests/test_similarity.py). Returns (query_id, neighbor_id, cosine,
    rank), self-matches excluded — identical semantics to the
    in-flight ivf_topk given the same centroids.

    The probe set is assigned DRIVER-SIDE: queries are by definition
    the small side (every tier broadcasts them), the centroids are
    already on the driver, and one numpy matmul replaces what would
    otherwise be three tiny distributed jobs (a spread+mapInPandas
    assignment pass, a distinct-collect of the probed lists, and a
    re-evaluation of that pass inside the join). The corpus side —
    the only thing that grows — stays a pruned distributed scan."""
    centroids = stored_centroids(spark, path)

    q_pdf = queries.select(id_col, vec_col).toPandas()
    if q_pdf.empty:  # np.stack cannot build an empty matrix
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    q_mat = _unit_rows(np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64))
    top = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]  # Q × nprobe
    qb = spark.createDataFrame(
        [
            (int(q_pdf[id_col].iloc[i]), [float(x) for x in q_pdf[vec_col].iloc[i]], int(l))
            for i in range(len(q_pdf))
            for l in top[i]
        ],
        "query_id long, __qvec array<float>, list_id int",
    )
    probed_lists = sorted({int(l) for row in top for l in row})
    from ..manifest import read_relation
    from .tombstones import filter_tombstones

    corpus = (
        filter_tombstones(
            spark,
            path,
            read_relation(spark, f"{path}/lists").filter(
                F.col("list_id").isin(probed_lists)
            ),
            id_col,
        )
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"), "list_id")
    )
    # no pair dedup needed: the stored index assigns each corpus vector
    # to exactly ONE list (ivf_build_index uses nprobe=1), so the
    # list_id equi-join matches a (query, neighbor) pair at most once
    pairs = (
        corpus.join(F.broadcast(qb), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            a = _unit_rows(np.stack(pdf["__qvec"].to_numpy()).astype(np.float64))
            b = _unit_rows(np.stack(pdf["__cvec"].to_numpy()).astype(np.float64))
            cos = np.round(np.einsum("ij,ij->i", a, b), round_to)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cosine": cos,
                }
            )

    scored = pairs.mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    hyperplane buckets, exact ranking within them.

    OR-amplified LSH: `n_tables` independent plane sets; a candidate
    qualifies if it shares a bucket with the query in ANY table
    (P[found] = 1-(1-p^planes)^tables where p = 1-θ/π — single-table
    sign-LSH misses moderately-similar neighbors badly). The scale
    path: bucket assignment is a narrow map over the corpus, the
    candidate join is an equi-join on (table, bucket) — hash-
    partitioned, AQE-skew-safe, no nested loop over the full corpus.
    Recall vs brute force is measured in tests/test_similarity.py."""

    spark = corpus.sparkSession
    rng = np.random.default_rng(seed)
    # (tables × planes × dim), all tables signed in ONE corpus pass
    planes = rng.standard_normal((n_tables * n_planes, dim))
    bp = spark.sparkContext.broadcast(planes)

    def buckets(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        out_schema = f"{id_alias} long, {vec_alias} array<float>, table int, bucket long"

        def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pl = bp.value
            weights = 1 << np.arange(n_planes, dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                bits = (mat @ pl.T) >= 0  # B × (tables·planes)
                per_table = bits.reshape(len(pdf), n_tables, n_planes)
                bucket = (per_table.astype(np.int64) * weights).sum(axis=2)  # B × T
                n = len(pdf)
                yield pd.DataFrame(
                    {
                        id_alias: np.repeat(pdf[id_col].to_numpy(), n_tables),
                        vec_alias: pdf[vec_col].iloc[np.repeat(np.arange(n), n_tables)].to_numpy(),
                        "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                        "bucket": bucket.reshape(-1),
                    }
                )

        return spread(df.select(id_col, vec_col)).mapInPandas(sign, out_schema)

    cb = buckets(corpus, "neighbor_id", "__cvec")
    qb = buckets(queries, "query_id", "__qvec")
    pairs = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            a = _unit_rows(np.stack(pdf["__qvec"].to_numpy()).astype(np.float64))
            b = _unit_rows(np.stack(pdf["__cvec"].to_numpy()).astype(np.float64))
            cos = np.round(np.einsum("ij,ij->i", a, b), round_to)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cosine": cos,
                }
            )

    scored = pairs.mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compression tier
# ---------------------------------------------------------------------------


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    iters: int = 8,
    seed: int = 42,
    sample: int = 4096,
) -> np.ndarray:
    """Train PQ codebooks: split the (unit-normalized) vector into `m`
    contiguous subspaces and k-means each independently — the classic
    product quantizer (Jégou et al., TPAMI 2011). Returns an
    (m × n_codes × dim/m) array.

    Same driver discipline as kmeans_centroids: a bounded
    deterministic sample (lowest ids), Lloyd iterations in one BLAS
    block per subspace — O(sample × dim) driver memory regardless of
    corpus size. Vectors are unit-normalized BEFORE splitting, so
    summed subspace dot products equal the full cosine."""
    pdf = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).toPandas()
    mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(n_codes, len(mat)), sub))
    for j in range(m):
        block = mat[:, j * sub : (j + 1) * sub]
        cents = block[rng.choice(len(block), size=min(n_codes, len(block)), replace=False)]
        for _ in range(iters):
            # squared-L2 assignment per subspace (PQ quantizes raw
            # subvectors; unit norm holds only for the FULL vector)
            d2 = ((block[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = block[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j, : len(cents)] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_partitions: int | None = None,
) -> DataFrame:
    """Encode each vector as m uint8-range code indices — dim×4 bytes
    shrink to m bytes (16× at dim=64, m=16... the compression that
    lets a 100 TB embedding corpus live in cluster memory). Map-only
    Arrow kernel: the codebooks broadcast (m × n_codes × dim/m —
    fixed size), vectors never shuffle. Returns (id, codes array<int>).
    """
    from ..utils import spread

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        m, _, sub = books.shape
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                block = mat[:, j * sub : (j + 1) * sub]
                # ||x - c||² = ||x||² - 2x·c + ||c||²; argmin over c
                d2 = -2.0 * (block @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return spread(corpus.select(id_col, vec_col), min_partitions).mapInPandas(
        encode, f"{id_col} long, codes array<int>"
    )


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 4,
    rerank: DataFrame | None = None,
    oversample: int = 4,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    builds an (m × n_codes) lookup table of subspace dot products
    against the EXACT query vector, and a corpus vector's estimated
    cosine is the sum of m table lookups — no decompression, no
    per-pair float math beyond the gather.

    Scale shape mirrors brute_force_topk: the code table is scanned
    once and never shuffled; queries (the small side) broadcast; each
    Arrow batch emits only its local top-k per query under an exact
    order key, and one final window merges per-batch candidates —
    a distributed TakeOrdered over estimated scores. Estimates are
    within PQ quantization error of true cosine (recall-tested vs
    brute force).

    `rerank` (the raw-vector corpus) switches on the production
    two-stage shape: ADC selects `oversample`×k candidates from the
    compressed codes, then ONLY those candidates' raw vectors are
    fetched (an id equi-join against O(|Q|·oversample·k) rows — the
    small side broadcasts) and exact cosine re-ranks the final k.
    Compression does the winnowing, floats only touch the shortlist —
    recall climbs to near-exact while the scan stays byte-sized."""
    spark = encoded.sparkSession
    if queries.isEmpty():
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, "
            + ("cosine double" if rerank is not None else "est_cosine double")
            + ", rank int"
        )
    if rerank is not None:
        cand = pq_topk(
            encoded, codebooks, queries, id_col, vec_col,
            k=k * oversample, round_to=round_to,
        ).select("query_id", "neighbor_id")
        vecs = rerank.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
        )
        pairs = vecs.join(F.broadcast(cand), "neighbor_id")
        qids, qmat = _collect_matrix(queries, id_col, vec_col)
        bq = spark.sparkContext.broadcast((qids, qmat))

        def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            q_ids, q_mat = bq.value
            index = {int(q): i for i, q in enumerate(q_ids)}
            for pdf in batches:
                if pdf.empty:
                    continue
                nvec = _unit_rows(np.stack(pdf["__nvec"].to_numpy()).astype(np.float64))
                qrows = q_mat[[index[int(q)] for q in pdf["query_id"]]]
                cos = np.round(np.einsum("ij,ij->i", nvec, qrows), round_to)
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy(),
                        "neighbor_id": pdf["neighbor_id"].to_numpy(),
                        "cosine": cos,
                    }
                )

        rescored = pairs.mapInPandas(
            exact, "query_id long, neighbor_id long, cosine double"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            rescored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )
    q_pdf = queries.select(id_col, vec_col).toPandas()
    q_ids = q_pdf[id_col].to_numpy()
    q_mat = _unit_rows(np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64))
    m, n_codes, sub = codebooks.shape
    # LUT[q, j, c] = q_subvec_j · codebook_j[c]
    lut = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), codebooks)
    bc = spark.sparkContext.broadcast((q_ids, lut))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, table = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # B × m
            n_ids = pdf[id_col].to_numpy()
            # gather: est[q, b] = Σ_j LUT[q, j, codes[b, j]]
            est = table[:, np.arange(codes.shape[1])[None, :], codes].sum(axis=2)
            for qi, qid in enumerate(ids):
                row = est[qi]
                mask = n_ids != qid
                cand = np.flatnonzero(mask)
                if not len(cand):
                    continue
                # batch-local selection and the global merge share ONE
                # total order — (unrounded est desc, id asc) — so the
                # result is independent of batch/partition layout even
                # when estimates tie after rounding (lexsort keys are
                # last-primary)
                order = np.lexsort((n_ids[cand], -row[cand]))
                take = cand[order[:k]]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(take), qid),
                        "neighbor_id": n_ids[take],
                        "est_cosine": row[take],
                    }
                )

    scored = encoded.mapInPandas(
        score, "query_id long, neighbor_id long, est_cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("est_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("est_cosine", round_to).alias("est_cosine"),
            "rank",
        )
    )


def ivf_pq_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    m: int = 8,
    n_codes: int = 256,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> None:
    """IVF-PQ index: the production ANN layout — a coarse quantizer
    shards the corpus into inverted lists (partition pruning at probe
    time, as in ivf_build_index) and each list stores PQ CODES instead
    of raw floats (m bytes per vector, as in pq_encode). The probe
    then reads only its lists' files AND only code bytes — the two
    compressions multiply, which is what makes exhaustive in-list
    scoring affordable at 100 TB.

    Raw-vector PQ within lists (IVF-Flat-PQ): codes quantize the
    vector itself, not the residual to its centroid — simpler, and the
    exact re-rank stage (ivf_pq_search's `rerank`) recovers what
    residual coding would; swap in residual encoding if search must be
    accurate WITHOUT a re-rank corpus. Both quantizers train on the
    same bounded driver sample; pass `centroids`/`codebooks` to deploy
    FIXED frozen models instead (the pinned-literal registered path).
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = kmeans_centroids(corpus, id_col, vec_col, k=n_lists, seed=seed)
    else:
        centroids = _unit_rows(np.asarray(centroids, dtype=np.float64))
    books = (
        pq_train_codebooks(corpus, id_col, vec_col, m=m, n_codes=n_codes, seed=seed)
        if codebooks is None
        else np.asarray(codebooks, dtype=np.float64)
    )
    bc = spark.sparkContext.broadcast(centroids)
    # persist the assignment for its two consumers (the encode pass
    # and the list_id re-attach join) so the kernel lineage runs once
    assigned = _assign_lists(
        corpus.select(id_col, vec_col), bc, id_col, vec_col, vec_col, 1
    ).persist()
    coded = pq_encode(assigned.select(id_col, vec_col), books, id_col, vec_col)
    # pq_encode projects (id, codes); re-attach list_id via the
    # assignment — both derive from the cached pass, joined on id
    coded = coded.join(assigned.select(id_col, "list_id"), id_col)
    from .tombstones import replace_dir

    # manifest commits (see ivf_build_index): ghost-partition-immune
    # rebuilds, object-store-safe publish
    replace_dir(
        spark, f"{path}/lists",
        lambda p: coded.repartition(F.col("list_id"))
        .write.partitionBy("list_id")
        .parquet(p),
    )
    assigned.unpersist()
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    cent_df = spark.createDataFrame(
        cent_rows, "list_id int, centroid array<double>"
    ).coalesce(1)
    replace_dir(spark, f"{path}/centroids", lambda p: cent_df.write.parquet(p))
    mm, nn, sub = books.shape
    book_rows = [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(mm)
        for c in range(nn)
    ]
    book_df = spark.createDataFrame(
        book_rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1)
    replace_dir(spark, f"{path}/codebooks", lambda p: book_df.write.parquet(p))


def stored_codebooks(spark, path: str) -> np.ndarray:
    """(m × n_codes × sub) PQ codebooks back from the index dir."""
    from ..manifest import read_relation

    pdf = read_relation(spark, f"{path}/codebooks").toPandas()
    m = int(pdf["subspace"].max()) + 1
    n = int(pdf["code"].max()) + 1
    sub = len(pdf["centroid"].iloc[0])
    books = np.empty((m, n, sub))
    for r in pdf.itertuples(index=False):
        books[r.subspace, r.code] = np.asarray(r.centroid)
    return books


def ivf_pq_search(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    round_to: int = 4,
    rerank: DataFrame | None = None,
    oversample: int = 4,
) -> DataFrame:
    """Probe an IVF-PQ index: nearest `nprobe` lists per query from the
    stored coarse centroids (driver-side, queries are the small side),
    then ADC-score ONLY the probed lists' code files — `list_id IN`
    reaches the layout as partition pruning, and each scanned row is m
    bytes. With `rerank` (the raw corpus), the ADC shortlist
    (oversample×k) is exact-rescored — the full two-stage production
    path. Returns (query_id, neighbor_id, score, rank); score is the
    ADC estimate, or exact cosine when re-ranked."""
    if queries.isEmpty():
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )
    centroids = stored_centroids(spark, path)
    books = stored_codebooks(spark, path)
    q_pdf = queries.select(id_col, vec_col).toPandas()
    q_ids = q_pdf[id_col].to_numpy()
    q_mat = _unit_rows(np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64))
    top = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    probed = sorted({int(l) for row in top for l in row})
    m, n_codes, sub = books.shape
    lut = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), books)
    allowed = {int(q): {int(l) for l in row} for q, row in zip(q_ids, top)}
    bc = spark.sparkContext.broadcast((q_ids, lut, allowed))
    kk = k * oversample if rerank is not None else k

    from ..manifest import read_relation
    from .tombstones import filter_tombstones

    codes_df = filter_tombstones(
        spark,
        path,
        read_relation(spark, f"{path}/lists").filter(F.col("list_id").isin(probed)),
        id_col,
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, table, allow = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(pdf["codes"].to_numpy())
            n_ids = pdf[id_col].to_numpy()
            lists = pdf["list_id"].to_numpy()
            est = table[:, np.arange(codes.shape[1])[None, :], codes].sum(axis=2)
            for qi, qid in enumerate(ids):
                ok = np.fromiter(
                    (int(l) in allow[int(qid)] for l in lists), bool, len(lists)
                ) & (n_ids != qid)
                cand = np.flatnonzero(ok)
                if not len(cand):
                    continue
                row = est[qi]
                # batch selection and the global merge share ONE total
                # order — (unrounded est desc, id asc) — so the result
                # is independent of batch layout even when estimates
                # tie after rounding (same discipline as pq_topk)
                order = np.lexsort((n_ids[cand], -row[cand]))
                take = cand[order[:kk]]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(take), qid),
                        "neighbor_id": n_ids[take],
                        "score": row[take],
                    }
                )

    scored = codes_df.mapInPandas(score, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= kk)
    )
    if rerank is None:
        return shortlist.filter(F.col("rank") <= k).select(
            "query_id",
            "neighbor_id",
            F.round("score", round_to).alias("score"),
            "rank",
        )
    vecs = rerank.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
    )
    pairs = vecs.join(F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id")
    bq = spark.sparkContext.broadcast((q_ids, q_mat))

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bq.value
        index = {int(q): i for i, q in enumerate(ids)}
        for pdf in batches:
            if pdf.empty:
                continue
            nvec = _unit_rows(np.stack(pdf["__nvec"].to_numpy()).astype(np.float64))
            qrows = mat[[index[int(q)] for q in pdf["query_id"]]]
            cos = np.round(np.einsum("ij,ij->i", nvec, qrows), round_to)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "score": cos,
                }
            )

    rescored = pairs.mapInPandas(exact, "query_id long, neighbor_id long, score double")
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means cluster the
    embedding space, then GREEDILY prune each cluster — scanning ids
    ascending, a vector is dropped when its cosine to an already-KEPT
    lower-id vector in the same cluster reaches `threshold`.

    Output: (id, cluster_id, is_kept, dup_of, cosine) — dropped rows
    name the kept vector that shadowed them. Deterministic end to end
    (seeded sample-bounded quantizer, id-ordered greedy), so the kept
    set is identical under any partitioning.

    Recall boundary (the SemDeDup trade, stated not hidden): near-dup
    pairs SPLIT ACROSS CLUSTERS are not compared — recall against the
    exact all-pairs baseline is tested at ~1.0 on clusterable data
    (tests/test_similarity.py) but is not a guarantee; raise
    `n_clusters` resolution or fall back to lsh_all_pairs_cosine when
    cross-cluster recall matters.

    Scale shape: quantizer trains on a bounded sample (driver
    O(sample × dim)); assignment is map-only; pruning is ONE
    hash-partitioned exchange on cluster_id into a grouped Arrow
    kernel whose greedy loop is BLAS row-vs-kept-matrix per member —
    O(|cluster|²) FLOPs bucket-locally, never an all-pairs shuffle.
    Cluster sizes concentrate near corpus/n_clusters; scale n_clusters
    with the corpus to bound the quadratic term (same knob as IVF).
    """
    spark = corpus.sparkSession
    # `centroids`: use a FIXED quantizer (the frozen-model deploy path,
    # and what lets the registered leg pin oracle-replayable literals)
    if centroids is None:
        cents = kmeans_centroids(corpus, id_col, vec_col, k=n_clusters, seed=seed)
    else:
        cents = _unit_rows(np.asarray(centroids, dtype=np.float64))
    bc = spark.sparkContext.broadcast(cents)
    assigned = _assign_lists(corpus.select(id_col, vec_col), bc, "id", vec_col, "__vec", 1)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="stable").reset_index(drop=True)
        mat = _unit_rows(np.stack(pdf["__vec"].to_numpy()).astype(np.float64))
        n = len(pdf)
        kept_rows: list[int] = []
        dup_of = np.full(n, -1, dtype=np.int64)
        cos = np.full(n, np.nan)
        for i in range(n):
            if kept_rows:
                sims = mat[kept_rows] @ mat[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold - 1e-12:
                    dup_of[i] = pdf["id"].iloc[kept_rows[j]]
                    cos[i] = round(float(sims[j]), 6)
                    continue
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cluster_id": pdf["list_id"],
                "is_kept": dup_of < 0,
                "dup_of": np.where(dup_of < 0, None, dup_of),
                "cosine": cos,
            }
        )

    return assigned.groupBy("list_id").applyInPandas(
        prune, "id long, cluster_id int, is_kept boolean, dup_of long, cosine double"
    )
