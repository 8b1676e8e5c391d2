"""LLM-data-pipeline operators as named queries (driver-mandated
extensions; BASELINE.json north star).

Dedup, similarity search, and text analysis over the `documents` /
`embeddings` tables. EVERY registered entry carries a full DuckDB
value oracle (all 50 hash-match at sf0.01) — each probabilistic
family is made portable its own way:

- MinHash / SimHash: PORTABLE md5-derived hash families
  (operators.dedup) — DuckDB recomputes signatures, banding,
  candidates and scores bit-for-bit;
- hyperplane LSH (dedup_embedding_lsh, ann_lsh_topk): the seeded
  planes are embedded as float64 LITERALS in the oracle SQL
  (_plane_values), so both engines dot the identical plane values;
  a sign disagreement would need a dot within ~1e-13 of zero
  (see _plane_values — ~1e-9 odds across the corpus, green at
  sf0.001/0.01/0.1);
- IVF / PQ: the k-means models are PINNED as literal centroids
  (ivf_model.py), so assignment and scoring replay exactly;
- scores are ROUND()ed to 4 dp on both sides, absorbing any residual
  last-ulp reduction-order noise in the exact-cosine stages.

tests/test_dedup.py / test_similarity.py additionally verify the
probabilistic entries against their exact counterparts (recall
floors), independent of the oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs_auto,
    simhash,
    simhash_near_pairs,
)
from ..operators.multimodal import (
    frame_sample,
    image_feature_pipeline,
    image_stats,
    synthetic_images,
)
from ..operators.similarity import (
    all_pairs_cosine,
    brute_force_topk,
    ivf_build_index,
    ivf_search_index,
    lsh_all_pairs_cosine,
    lsh_topk,
)
from ..operators.text import PII_PATTERNS, STOPWORDS
from ..sources.registry import load_table
from .registry import query

# DuckDB equivalent of operators.dedup.normalized_text — note the 'g'
# flag: DuckDB's regexp_replace is first-match-only by default, Spark's
# replaces all.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


def _ivf_cents_values() -> str:
    """The pinned coarse quantizer (plans/ivf_model.py) as a DuckDB
    VALUES list: (list_id, [64 doubles]). Shared by the ann_ivf_topk
    and dedup_embedding_cosine (semdedup part) oracles."""
    from .ivf_model import IVF_CENTROIDS

    return ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])"
        for i, c in enumerate(IVF_CENTROIDS)
    )


def _pq_books_values() -> str:
    """The pinned PQ codebooks (plans/ivf_model.py) as a DuckDB VALUES
    list: (subspace, code, [16 doubles]) — 64 rows."""
    from .ivf_model import PQ_CODEBOOKS

    return ", ".join(
        f"({j}, {c}, [{', '.join(repr(x) for x in PQ_CODEBOOKS[j][c])}])"
        for j in range(len(PQ_CODEBOOKS))
        for c in range(len(PQ_CODEBOOKS[j]))
    )


def _pq_cte_block() -> str:
    """Shared oracle CTEs for the pinned-PQ tiers: unit-normalized
    embeddings, the literal codebooks, per-subspace argmin-L2 encoding
    (code tie-break) and the one-row-per-vector code tuple. Used by
    the ann_cosine_topk (pq part) and ann_ivf_topk (ivfpq part)
    oracles."""
    return f"""vq AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), vn AS (
      SELECT vec_id,
             list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
      FROM vq
    ), books(j, code, b) AS (VALUES {_pq_books_values()}),
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT vn.vec_id, bk.j, bk.code,
               -2 * list_dot_product(u[bk.j * 16 + 1 : bk.j * 16 + 16], bk.b)
                 + list_dot_product(bk.b, bk.b) AS d2,
               ROW_NUMBER() OVER (PARTITION BY vn.vec_id, bk.j
                                  ORDER BY d2 ASC, bk.code ASC) AS rn
        FROM vn CROSS JOIN books bk)
      WHERE rn = 1
    ), encw AS (
      SELECT vec_id,
             MAX(CASE WHEN j = 0 THEN code END) AS c0,
             MAX(CASE WHEN j = 1 THEN code END) AS c1,
             MAX(CASE WHEN j = 2 THEN code END) AS c2,
             MAX(CASE WHEN j = 3 THEN code END) AS c3
      FROM enc GROUP BY vec_id
    )"""


# explicit left-to-right association: both engines are internally
# consistent, and identical code tuples therefore produce exact ties
# broken by neighbor id on both sides
_ADC_EST = """((list_dot_product(qn.u[1:16], b0.b)
               + list_dot_product(qn.u[17:32], b1.b))
               + list_dot_product(qn.u[33:48], b2.b))
               + list_dot_product(qn.u[49:64], b3.b)"""


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
    """Exact word-bigram Jaccard near-dup pairs ≥ 0.2, bound to the
    byte-budgeted dispatcher (operators.dedup.ngram_jaccard_pairs_auto):
    gram collect within a 1 GiB budget (cheap pre-scan) and
    docs×vocab×4 B matrix within a 2 GiB budget (checked exactly
    before allocation) → dense BLAS kernel (this synthetic corpus's
    shared vocabulary makes ~every pair a join candidate, where the
    dense kernel wins >10×, and its matrix is kilobytes — the driver
    exercises this tier); beyond either budget → the PREFIX-FILTERING
    tier (ngram_jaccard_pairs_prefix): rarest-first
    prefix grams generate candidates, exact array-intersect verifies —
    100% recall by construction, every stage a hash-partitioned
    shuffle, nothing unbounded driver-side. At 100 TB the byte budgets
    always dispatch to that prefix tier — the BLAS tier this entry
    exercises is the small-corpus fast path, not the scale plan. All
    three tiers
    (prefix/BLAS/naive gram-join) are property-tested equal in
    tests/test_dedup.py, so dispatch can only change the physical
    plan, never the answer. This exact operator is the baseline the
    probabilistic ops are judged against."""
    return ngram_jaccard_pairs_auto(_docs(spark, sf_dir), "doc_id", "text", n=2, threshold=0.2)


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE docs_w AS (
      SELECT doc_id, {_WORDS} AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM docs_w
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS sh
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
      SELECT id_a, id_b
      FROM shared
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ROUND(sh / CAST(sa.sz + sb.sz - sh AS DOUBLE), 4) >= 0.2
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.r
    )
    SELECT node AS doc_id,
           MIN(r) AS cluster_rep,
           MIN(r) = node AS is_canonical
    FROM walk GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS — the decision stage of the dedup pipeline:
    exact n-gram Jaccard pairs (≥ 0.2) → connected components
    (operators.dedup.connected_components, iterative min-label
    propagation, O(diameter) distributed join rounds) → every document
    labeled with its cluster representative (lowest id; singletons
    represent themselves) and a keep/drop flag. The DuckDB oracle
    states the same fixpoint as a recursive transitive-closure CTE, so
    the component labeling is value-checked end to end — pair
    generation, closure, and canonical choice."""
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs_auto(docs, "doc_id", "text", n=2, threshold=0.2)
    comp = connected_components(pairs)
    return docs.select("doc_id").join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("cluster_rep"),
        (F.coalesce("component", F.col("doc_id")) == F.col("doc_id")).alias("is_canonical"),
    )


def _minhash_oracle_sql() -> str:
    """DuckDB mirror of the WHOLE portable minhash suite — shingles →
    32-bit md5 gram hashes → the identical seeded (a·h+b) mod 2^31−1
    permutation family (coefficients embedded as literals from
    operators.dedup.minhash_params, the single source of truth) →
    band keys → candidates → estimated + exact Jaccard → the three
    stage row sets. Formula-fidelity notes: `sizes` counts DISTINCT
    grams (Spark's array length after array_distinct), the
    intersection counts DISTINCT shared hash values (Spark's
    array_intersect dedups), so even a 32-bit gram-hash collision
    yields identical numbers in both engines."""
    from ..operators.dedup import minhash_params

    a, b = minhash_params(64, portable=True)
    values = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(64))
    return f"""
    WITH w AS (
      SELECT doc_id, {_WORDS} AS ws FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS gram
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws)::BIGINT)) AS i FROM w)
    ),
    gh AS (
      SELECT doc_id, gram,
             CAST(('0x' || substring(md5(gram), 1, 8)) AS BIGINT) AS hv
      FROM grams
    ),
    params(i, a, b) AS (VALUES {values}),
    sig AS (
      SELECT doc_id, p.i, MIN((p.a * hv + p.b) % 2147483647) AS mv
      FROM gh CROSS JOIN params p GROUP BY doc_id, p.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band,
             CAST(('0x' || substring(
               md5(string_agg(mv::VARCHAR, ',' ORDER BY i)), 1, 15)) AS BIGINT) AS bucket
      FROM sig GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    candx AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM gh GROUP BY doc_id),
    est AS (
      SELECT c.id_a, c.id_b,
             ROUND(SUM(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) / 64.0, 4) AS score
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
      GROUP BY c.id_a, c.id_b
    ),
    jacp AS (
      SELECT c.id_a, c.id_b,
             ROUND(COUNT(DISTINCT ga.hv)
                   / (sza.sz + szb.sz - COUNT(DISTINCT ga.hv))::DOUBLE, 4) AS score
      FROM cand c
      JOIN gh ga ON ga.doc_id = c.id_a
      JOIN gh gb ON gb.doc_id = c.id_b AND gb.hv = ga.hv
      JOIN sizes sza ON sza.doc_id = c.id_a
      JOIN sizes szb ON szb.doc_id = c.id_b
      GROUP BY c.id_a, c.id_b, sza.sz, szb.sz
    ),
    jacx AS (
      SELECT c.id_a, c.id_b,
             ROUND(COUNT(DISTINCT ga.hv)
                   / (sza.sz + szb.sz - COUNT(DISTINCT ga.hv))::DOUBLE, 4) AS score
      FROM candx c
      JOIN gh ga ON ga.doc_id = c.id_a
      JOIN gh gb ON gb.doc_id = c.id_b AND gb.hv = ga.hv
      JOIN sizes sza ON sza.doc_id = c.id_a
      JOIN sizes szb ON szb.doc_id = c.id_b
      GROUP BY c.id_a, c.id_b, sza.sz, szb.sz
    )
    SELECT 'lsh' AS stage, id_a, id_b, score FROM est WHERE score >= 0.2
    UNION ALL
    SELECT 'exact' AS stage, id_a, id_b, score FROM jacp WHERE score >= 0.2
    UNION ALL
    SELECT 'index' AS stage, id_a, id_b, score FROM jacx WHERE score >= 0.2
    """


@query("dedup_minhash_suite", oracle=_minhash_oracle_sql())
def dedup_minhash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup SUITE — both tiers of the probabilistic
    pipeline under one roof (formerly the separate dedup_minhash_lsh /
    dedup_minhash_exact entries, merged to hold the registry at the
    driver's 50-query sampling cap):

    - stage='lsh': MinHash(64) + LSH(16 bands × 4 rows) candidates
      with ESTIMATED Jaccard ≥ 0.2 (operators.dedup.
      minhash_dedup_pairs) — banding keeps candidate generation
      bucket-local, the scale path that replaces the all-pairs join;
    - stage='exact': the composed production pipeline (operators.
      dedup.minhash_exact_dedup_pairs): the same LSH candidates
      verified by EXACT n-gram Jaccard — probabilistic recall, exact
      precision, no quadratic pass.

    - stage='index': the persisted-index probe (incremental-ingest
      path) — even-id docs as the resident corpus, odd-id docs as the
      delta (see the inline comment at the build site).

    Registered with the PORTABLE hash family (md5-derived 32-bit gram
    hashes, Mersenne-prime permutations, band-value bucket keys) so a
    DuckDB oracle reproduces every signature component, candidate
    pair, and score bit-for-bit — the driver value-checks the full
    probabilistic pipeline instead of recording rows-only. Production
    tier stays the xxhash64/mod-2^64 family (library defaults) — same
    plans, cheaper hashes. tests/test_dedup.py pins the default tier:
    LSH recall vs the exact all-pairs baseline, every 'exact' pair
    appearing there with the identical jaccard value, and the index
    probe identical to in-flight union banding.

    Physical shape: ONE per-doc frame carries both the signature and
    the gram array (minhash_signatures keep_grams=True — the kernel
    emits the grams it already holds, so the grams⋈signatures join
    never exists), and ONE candidate join chain scores BOTH verifiers
    per pair before exploding into the two stage rows — half the
    shuffles of running the verifiers as separate join chains, with
    expressions identical to minhash_est_pairs /
    exact_jaccard_for_pairs (pinned by tests/test_dedup.py)."""
    from ..operators.dedup import gram_hashes, minhash_lsh_candidates, minhash_signatures

    docs = _docs(spark, sf_dir)
    frame = minhash_signatures(
        docs, "doc_id", "text", 64, shingle_n=2,
        grams=gram_hashes(docs, "doc_id", "text", 2, portable=True),
        keep_grams=True, portable=True,
    ).localCheckpoint()  # shared by all three legs; freed on GC (no CacheManager entry)
    cand = minhash_lsh_candidates(
        frame, "doc_id", num_bands=16, rows_per_band=4, portable=True
    )
    fa = frame.select(
        F.col("doc_id").alias("id_a"),
        F.col("signature").alias("__sig_a"),
        F.col("__gh").alias("__gh_a"),
    )
    fb = frame.select(
        F.col("doc_id").alias("id_b"),
        F.col("signature").alias("__sig_b"),
        F.col("__gh").alias("__gh_b"),
    )
    est = F.round(
        F.expr("size(filter(zip_with(__sig_a, __sig_b, (x, y) -> x = y), b -> b))")
        / F.lit(64.0),
        4,
    )
    inter = F.size(F.array_intersect("__gh_a", "__gh_b"))
    sz_a, sz_b = F.size("__gh_a"), F.size("__gh_b")
    jac = F.round(inter / (sz_a + sz_b - inter).cast("double"), 4)
    scored = (
        cand.hint("shuffle_hash").join(fa, "id_a")
        .hint("shuffle_hash").join(fb, "id_b")
        .select("id_a", "id_b", est.alias("__est"), jac.alias("__jac"))
    )
    staged = scored.select(
        "id_a", "id_b",
        F.explode(
            F.array(
                F.struct(F.lit("lsh").alias("stage"), F.col("__est").alias("score")),
                F.struct(F.lit("exact").alias("stage"), F.col("__jac").alias("score")),
            )
        ).alias("s"),
    )
    inflight = staged.select("s.stage", "id_a", "id_b", "s.score").filter(
        F.col("score") >= 0.2
    )
    # stage='index': the INCREMENTAL-INGEST path — even-id docs play
    # the resident corpus (signed once into a persisted index, reused
    # across calls like ann_ivf_topk's), odd-id docs the nightly
    # delta probed against it (minhash_index_probe: column-pruned
    # signature scan → banded candidates → exact verify of candidates
    # only, O(delta+candidates) never O(corpus)). Probe ≡ in-flight
    # union banding is pinned in tests/test_dedup.py.
    import os

    from ..operators.dedup import minhash_index_build, minhash_index_probe
    from ..sources.registry import owned_ready, user_cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    mtime = int(os.stat(src).st_mtime) if os.path.exists(src) else 0
    # p2: the bands-persisting index layout (probe never re-bands the
    # resident corpus) — bumping the tag rebuilds caches from the old
    # layout once
    tag = f"{sf_dir.strip('/').replace('/', '_')}_{mtime}_p2".replace(".", "_")
    path = user_cache_dir("neardup-index", tag)
    if not owned_ready(os.path.join(path, "docs")):
        minhash_index_build(
            docs.filter(F.col("doc_id") % 2 == 0), path, "doc_id", "text",
            num_hashes=64, num_bands=16, shingle_n=2, portable=True,
        )
    # the suite's cached full frame already holds the odd docs'
    # signatures+grams — hand it over so the probe runs zero kernels
    probed = minhash_index_probe(
        spark, path, docs.filter(F.col("doc_id") % 2 == 1), "text", threshold=0.2,
        new_frame=frame.filter(F.col("doc_id") % 2 == 1),
    ).select(
        F.lit("index").alias("stage"),
        F.col("new_id").alias("id_a"),
        F.col("resident_id").alias("id_b"),
        F.col("jaccard").alias("score"),
    )
    return inflight.unionByName(probed)


@query(
    "dedup_simhash",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents
    ),
    h AS (
      SELECT doc_id, CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) AS hv
      FROM words
    ),
    votes AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h CROSS JOIN (SELECT unnest(range(60)) AS bit) b
      GROUP BY doc_id, b.bit
    ),
    sig AS (
      SELECT doc_id,
             SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS s
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 12
      AND ( (a.s & 32767) = (b.s & 32767)
         OR ((a.s >> 15) & 32767) = ((b.s >> 15) & 32767)
         OR ((a.s >> 30) & 32767) = ((b.s >> 30) & 32767)
         OR ((a.s >> 45) & 32767) = ((b.s >> 45) & 32767) )
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with hamming ≤ 12 (operators.dedup.
    simhash + simhash_near_pairs); candidates via 4-chunk pigeonhole
    banding — same bucketed-join shape as LSH. Registered with the
    PORTABLE (md5-derived, 60-bit) hash family so DuckDB reproduces
    every signature bit-for-bit and the driver value-checks the full
    pipeline (signature → banding → hamming filter); the oracle
    mirrors the banding recall predicate too (an equal 15-bit chunk),
    not just the hamming bound, so both engines emit the identical
    pair set. Production tier stays xxhash64/64-bit (simhash
    default) — same plan, cheaper hash."""
    sigs = simhash(_docs(spark, sf_dir), "doc_id", "text", portable=True)
    return simhash_near_pairs(sigs, "doc_id", max_hamming=12, n_bits=60)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), cents(list_id, c) AS (VALUES {_ivf_cents_values()}),
    sim AS (
      SELECT v.vec_id, ct.list_id, list_cosine_similarity(v.e, ct.c) AS s
      FROM v CROSS JOIN cents ct
    ), asg AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, list_id ASC) AS rn
        FROM sim) WHERE rn = 1
    ), m AS (
      SELECT a.vec_id, a.list_id, v.e,
             ROW_NUMBER() OVER (PARTITION BY a.list_id
                                ORDER BY a.vec_id ASC) AS rn
      FROM asg a JOIN v ON v.vec_id = a.vec_id
    ), greedy(list_id, rn, vec_id, dup_of, cos, kept) AS (
      SELECT list_id, rn, vec_id, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
             [vec_id]
      FROM m WHERE rn = 1
      UNION ALL
      SELECT m2.list_id, m2.rn, m2.vec_id,
             CASE WHEN b.c >= 0.45 - 1e-12 THEN b.id END,
             CASE WHEN b.c >= 0.45 - 1e-12 THEN b.c END,
             CASE WHEN b.c >= 0.45 - 1e-12 THEN g.kept
                  ELSE list_append(g.kept, m2.vec_id) END
      FROM greedy g
      JOIN m m2 ON m2.list_id = g.list_id AND m2.rn = g.rn + 1
      LEFT JOIN LATERAL (
        SELECT kv.vec_id AS id, list_cosine_similarity(m2.e, kv.e) AS c
        FROM unnest(g.kept) AS u(kid) JOIN v kv ON kv.vec_id = u.kid
        ORDER BY c DESC, kv.vec_id ASC LIMIT 1
      ) b ON TRUE
    )
    SELECT 'pairs' AS part, a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(NULL AS BIGINT) AS k1, CAST(NULL AS DOUBLE) AS kept,
           ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.45
    UNION ALL
    SELECT 'semdedup' AS part, vec_id AS id_a, dup_of AS id_b,
           CAST(list_id AS BIGINT) AS k1,
           CASE WHEN dup_of IS NULL THEN 1.0 ELSE 0.0 END AS kept,
           ROUND(ROUND(cos, 6), 4) AS cosine
    FROM greedy
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding dedup suite, exact tier + SemDeDup tier:

    - part='pairs': all pairs with cosine ≥ threshold
      (operators.similarity.all_pairs_cosine — broadcast corpus
      matrix, BLAS batches, O(matches) shuffle). Threshold 0.45
      because the synthetic embeddings top out at pairwise cosine
      ≈0.51 — a 0.95 run would vacuously return 0 rows and prove
      nothing. The 100 TB path is dedup_embedding_lsh below — same
      exact scoring, candidates restricted to hyperplane buckets;
    - part='semdedup': SemDeDup-style semantic pruning
      (operators.similarity.semantic_dedup) with the PINNED quantizer
      (plans/ivf_model.py — shared with ann_ivf_topk): cluster on
      argmax-cosine centroid, then greedily drop members whose cosine
      to an already-kept lower-id member reaches the threshold.
      Cluster-bucketed quadratic (never all-pairs); the oracle replays
      the ENTIRE greedy cascade via a recursive CTE whose state
      carries each cluster's kept-id list, value-checking cluster
      assignment, every drop decision, the shadowing kept id, and the
      recorded cosine.

      Cross-engine float boundary (stated, same class as the LSH sign
      boundary): each drop decision compares an engine-computed
      float64 cosine against the threshold, and the greedy state makes
      one flipped decision cascade through its cluster. A flip needs a
      member's max-cosine-to-kept within ~1e-15 of the threshold
      (engines agree to the last ulps; the 1e-12 epsilon absorbs exact-
      representation cases) — odds ~1e-10 per member on continuous
      synthetic cosines, verified green at sf0.001/0.01/0.1."""
    import numpy as np

    from ..operators.similarity import semantic_dedup
    from .ivf_model import IVF_CENTROIDS

    emb = _emb(spark, sf_dir)
    pairs = all_pairs_cosine(emb, "vec_id", "embedding", threshold=0.45).select(
        F.lit("pairs").alias("part"),
        "id_a",
        "id_b",
        F.lit(None).cast("long").alias("k1"),
        F.lit(None).cast("double").alias("kept"),
        "cosine",
    )
    sd = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.45,
        centroids=np.asarray(IVF_CENTROIDS, dtype=np.float64),
    ).select(
        F.lit("semdedup").alias("part"),
        F.col("id").alias("id_a"),
        F.col("dup_of").alias("id_b"),
        F.col("cluster_id").cast("long").alias("k1"),
        F.when(F.col("is_kept"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("kept"),
        F.when(F.col("is_kept"), F.lit(None).cast("double"))
        .otherwise(F.round("cosine", 4))
        .alias("cosine"),
    )
    return pairs.unionByName(sd)


def _plane_values(n_tables: int, n_planes: int, dim: int = 64, seed: int = 42) -> str:
    """Literal (table, bit, plane_vector) VALUES rows reproducing the
    EXACT seeded hyperplanes the LSH kernels broadcast (numpy
    default_rng(seed).standard_normal fills row-major, plane idx =
    t·n_planes + b — same layout the kernel reshapes). repr() of a
    float64 round-trips, and DuckDB parses a decimal literal to the
    nearest double, so both engines dot the identical plane values;
    sign disagreement would need a dot within ~1e-13 of zero
    (probability ~1e-9 across the whole sf corpus)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    rows = []
    for idx in range(n_tables * n_planes):
        t, b = divmod(idx, n_planes)
        arr = ", ".join(repr(float(x)) for x in planes[idx])
        rows.append(f"({t}, {b}, [{arr}])")
    return ", ".join(rows)


def _bucket_cte(n_tables: int, n_planes: int) -> str:
    """Shared oracle CTEs: embeddings as doubles + per-(vector, table)
    hyperplane sign-bucket keys — the DuckDB mirror of the LSH
    kernels' bucket assignment."""
    return f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    planes(t, b, p) AS (VALUES {_plane_values(n_tables, n_planes)}),
    bk AS (
      SELECT vec_id, t,
             SUM(CASE WHEN list_dot_product(v.e, pl.p) >= 0
                      THEN (1::BIGINT << pl.b) ELSE 0::BIGINT END) AS bucket
      FROM v CROSS JOIN planes pl GROUP BY vec_id, t
    )"""


@query(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH {_bucket_cte(16, 4)},
    cand AS (
      SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
      FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket
      WHERE x.vec_id < y.vec_id
    )
    SELECT c.id_a, c.id_b, ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
    FROM cand c JOIN v a ON a.vec_id = c.id_a JOIN v b ON b.vec_id = c.id_b
    WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.45
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at 100 TB scale
    (operators.similarity.lsh_all_pairs_cosine): OR-amplified
    hyperplane-LSH buckets → self equi-join on (table, bucket), hash-
    partitioned with nothing corpus-sized broadcast → exact einsum
    cosine on candidates only. Probabilistic recall (measured ≥0.9 vs
    dedup_embedding_cosine in tests/test_similarity.py), exact
    precision — every returned pair carries its true cosine.

    Value-oracled: the hyperplanes are seeded and embedded as literal
    vectors in the oracle SQL (_plane_values), so DuckDB reproduces
    bucket assignment, the candidate set, and the 4dp cosine of every
    emitted pair."""
    return lsh_all_pairs_cosine(
        _emb(spark, sf_dir), "vec_id", "embedding",
        threshold=0.45, dim=64, n_planes=4, n_tables=16,
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


# BM25 retrieval queries for the text_ngram_suite 'bm25' part: small
# literal term lists drawn from the synthetic corpus vocabulary
# (present at every SF). The same literals feed the Spark operator and
# the DuckDB oracle, so both engines score the identical query set.
BM25_QUERIES = {
    "q1": ["hash", "join", "stream"],
    "q2": ["vector", "scan", "merge"],
    "q3": ["window", "agg", "filter"],
}

_BM25_VALUES = ", ".join(
    f"('{qid}', {i + 1}, '{t}')"
    for qid, terms in sorted(BM25_QUERIES.items())
    for i, t in enumerate(terms)
)


def _bm25_index(spark: SparkSession, docs, sf_dir: str) -> str:
    """Build-once location of the persisted BM25 inverted index for a
    corpus dir (ownership-gated per-user cache, keyed by the corpus
    mtime — the ann_ivf_topk contract). Shared by the text_ngram_suite
    bm25 leg and the ann_cosine_topk hybrid leg so one build serves
    both."""
    import os as _os

    from ..operators.text import bm25_build_index
    from ..sources.registry import owned_ready, user_cache_dir

    src = _os.path.join(sf_dir, "documents.parquet")
    mt = int(_os.stat(src).st_mtime) if _os.path.exists(src) else 0
    base = f"{sf_dir.strip('/').replace('/', '_')}_{mt}".replace(".", "_")
    idx = user_cache_dir("bm25-index", base)
    if not (
        owned_ready(_os.path.join(idx, "postings"))
        and owned_ready(_os.path.join(idx, "stats"))
    ):
        bm25_build_index(docs, "doc_id", "text", idx)
    return idx


def _bm25_cte_block() -> str:
    """The full BM25 scoring pipeline as oracle CTEs (tokenize → tf/dl
    → df → fixed-order contributions → ranked scores in `bm_rank`) —
    shared verbatim by text_ngram_suite's 'bm25' part and
    ann_cosine_topk's 'hybrid' part so the lexical stage is stated
    exactly once."""
    return f"""bm_docs AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(COALESCE(text, '')),
                                                          '\\s+', ' ', 'g')), ' '),
                         x -> x <> '') AS w
      FROM documents
    ), bm_n AS (
      SELECT COUNT(*) AS n, SUM(len(w)) AS sdl FROM bm_docs
    ), bm_q(query_id, tidx, term) AS (
      VALUES {_BM25_VALUES}
    ), bm_tf AS (
      SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM bm_docs
    ), bm_tfg AS (
      SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
      FROM bm_tf
      WHERE term IN (SELECT term FROM bm_q)
      GROUP BY doc_id, term
    ), bm_df AS (
      SELECT term, COUNT(*) AS df FROM bm_tfg GROUP BY term
    ), bm_contrib AS (
      SELECT q.query_id, t.doc_id, q.tidx,
             ln(1.0 + (n.n - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / (CAST(n.sdl AS DOUBLE) / n.n))) AS c
      FROM bm_tfg t
      JOIN bm_q q ON t.term = q.term
      JOIN bm_df d ON t.term = d.term
      CROSS JOIN bm_n n
    ), bm_scores AS (
      SELECT query_id, doc_id,
             COALESCE(MAX(CASE WHEN tidx = 1 THEN c END), 0.0)
               + COALESCE(MAX(CASE WHEN tidx = 2 THEN c END), 0.0)
               + COALESCE(MAX(CASE WHEN tidx = 3 THEN c END), 0.0) AS score
      FROM bm_contrib GROUP BY query_id, doc_id
    ), bm_rank AS (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rnk
      FROM bm_scores
    )"""


@query(
    "ann_cosine_topk",
    oracle=f"""
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
    ), {_pq_cte_block()}, adc AS (
      SELECT qn.vec_id AS query_id, w.vec_id AS neighbor_id,
             {_ADC_EST} AS est
      FROM vn qn CROSS JOIN encw w
      JOIN books b0 ON b0.j = 0 AND b0.code = w.c0
      JOIN books b1 ON b1.j = 1 AND b1.code = w.c1
      JOIN books b2 ON b2.j = 2 AND b2.code = w.c2
      JOIN books b3 ON b3.j = 3 AND b3.code = w.c3
      WHERE qn.vec_id < 10 AND qn.vec_id <> w.vec_id
    ), pq_ranked AS (
      SELECT query_id, neighbor_id, est,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY est DESC, neighbor_id ASC) AS rank
      FROM adc
    ), {_bm25_cte_block()}, hyb_q(hqid, qid) AS (
      VALUES (0, 'q1'), (1, 'q2'), (2, 'q3')
    ), hyb_cand AS (
      SELECT hq.hqid AS query_id, br.doc_id
      FROM bm_rank br JOIN hyb_q hq ON br.query_id = hq.qid
      WHERE br.rnk <= 20
    ), hyb_scored AS (
      SELECT hc.query_id, hc.doc_id AS neighbor_id,
             ROUND(list_cosine_similarity(qv.cv, cv.cv), 4) AS cosine
      FROM hyb_cand hc
      JOIN c qv ON qv.neighbor_id = hc.query_id
      JOIN c cv ON cv.neighbor_id = hc.doc_id
    ), hyb_ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM hyb_scored
    )
    SELECT 'brute' AS part, query_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= 5
    UNION ALL
    SELECT 'pq' AS part, query_id, neighbor_id,
           ROUND(est, 4) AS cosine, CAST(rank AS INT) AS rank
    FROM pq_ranked WHERE rank <= 5
    UNION ALL
    SELECT 'hybrid' AS part, CAST(query_id AS BIGINT) AS query_id, neighbor_id,
           cosine, CAST(rank AS INT) AS rank
    FROM hyb_ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-search suite, exact tier + compressed tier:

    - part='brute': brute-force cosine top-5 for 10 query vectors
      (operators.similarity.brute_force_topk): queries broadcast,
      corpus scanned once and never shuffled; dot products are
      codegen'd zip_with/aggregate folds (deterministic summation
      order — matches the oracle bit-for-bit before rounding);
    - part='pq': the SAME search over PQ CODES (operators.similarity.
      pq_encode + pq_topk, asymmetric-distance scoring) with the
      PINNED codebooks (plans/ivf_model.PQ_CODEBOOKS, m=4 × 16 codes):
      each corpus vector collapses to 4 code bytes, each query builds
      a subspace lookup table, and estimated cosine is 4 table
      gathers — no decompression, the byte-sized scan that makes a
      100 TB embedding corpus searchable. The oracle replays encoding
      (per-subspace argmin L2, code tie-break) and the full ADC
      ranking from the literal codebooks; ranking uses the unrounded
      estimate with id tie-break on BOTH engines, so batch layout and
      4dp display rounding can't reorder it. Recall vs brute measured
      in tests/test_similarity.py.
    - part='hybrid': the production two-stage retrieval stack
      (operators.retrieval.hybrid_topk) — BM25 lexical candidates
      (top-20 per literal query; the oracle reuses the SAME bm25 CTE
      block as text_ngram_suite) reranked by exact embedding cosine
      to top-5. FULLY value-oracled end to end: DuckDB replays the
      lexical scoring, the candidate cut, the embedding join, every
      4dp cosine and the final rank."""
    import numpy as np

    from ..operators.similarity import pq_encode, pq_topk
    from .ivf_model import PQ_CODEBOOKS

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    brute = brute_force_topk(emb, queries_df, "vec_id", "embedding", k=5).select(
        F.lit("brute").alias("part"), "query_id", "neighbor_id", "cosine", "rank"
    )
    books = np.asarray(PQ_CODEBOOKS, dtype=np.float64)
    enc = pq_encode(emb, books, "vec_id", "embedding")
    pq = pq_topk(enc, books, queries_df, "vec_id", "embedding", k=5).select(
        F.lit("pq").alias("part"),
        "query_id",
        "neighbor_id",
        F.col("est_cosine").alias("cosine"),
        "rank",
    )
    # part='hybrid': the two-stage retrieval stack
    # (operators.retrieval.hybrid_topk) — BM25 bounds the candidates
    # (top-20 per query, the SAME lexical pipeline the oracle's shared
    # bm25 CTE block states), exact embedding cosine reranks to top-5.
    # Query vectors are embeddings 0/1/2 (one bounded 3-row collect);
    # the qid→vec_id mapping is the sorted-BM25_QUERIES order, stated
    # literally in the oracle's hyb_q VALUES.
    from ..operators.retrieval import hybrid_topk

    docs = _docs(spark, sf_dir)
    hqueries = {
        qid: {"terms": BM25_QUERIES[qid], "vec_id": i}
        for i, qid in enumerate(sorted(BM25_QUERIES))
    }
    qid_to_vec = F.create_map(
        *[
            x
            for i, qid in enumerate(sorted(BM25_QUERIES))
            for x in (F.lit(qid), F.lit(i))
        ]
    )
    hybrid = hybrid_topk(
        docs, emb, hqueries, k=5, oversample=4,
        index_dir=_bm25_index(spark, docs, sf_dir),
    ).select(
        F.lit("hybrid").alias("part"),
        qid_to_vec[F.col("query_id")].cast("long").alias("query_id"),
        F.col("doc_id").alias("neighbor_id"),
        "cosine",
        "rank",
    )
    return brute.unionByName(pq).unionByName(hybrid)


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), cents(list_id, c) AS (VALUES {_ivf_cents_values()}),
    sim AS (
      SELECT v.vec_id, ct.list_id,
             list_cosine_similarity(v.e, ct.c) AS s
      FROM v CROSS JOIN cents ct
    ), cassign AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, list_id ASC) AS rn
        FROM sim) WHERE rn = 1
    ), qassign AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, list_id ASC) AS rn
        FROM sim WHERE vec_id < 10) WHERE rn <= 4
    ), cand AS (
      SELECT q.vec_id AS query_id, c2.vec_id AS neighbor_id
      FROM qassign q JOIN cassign c2 USING (list_id)
      WHERE q.vec_id <> c2.vec_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
      FROM cand JOIN v a ON a.vec_id = query_id
                JOIN v b ON b.vec_id = neighbor_id
    ), {_pq_cte_block()}, adc2 AS (
      SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
             {_ADC_EST} AS est
      FROM qassign q
      JOIN cassign c2 USING (list_id)
      JOIN vn qn ON qn.vec_id = q.vec_id
      JOIN encw w ON w.vec_id = c2.vec_id
      JOIN books b0 ON b0.j = 0 AND b0.code = w.c0
      JOIN books b1 ON b1.j = 1 AND b1.code = w.c1
      JOIN books b2 ON b2.j = 2 AND b2.code = w.c2
      JOIN books b3 ON b3.j = 3 AND b3.code = w.c3
      WHERE q.vec_id <> c2.vec_id
    )
    SELECT 'ivf' AS part, query_id, neighbor_id,
           cosine AS score, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    UNION ALL
    SELECT 'ivfpq' AS part, query_id, neighbor_id,
           ROUND(est, 4) AS score, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY est DESC, neighbor_id ASC) AS rank
      FROM adc2
    ) WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k through the PERSISTED index
    (operators.similarity.ivf_build_index / ivf_search_index) with the
    PINNED quantizer (plans/ivf_model.py — trained once, frozen, the
    FAISS deploy pattern): corpus parquet partitioned by list_id (each
    inverted list its own directory) → probes prune partitions (the
    `list_id IN (...)` filter is a PartitionFilter — unprobed lists'
    files are never opened, asserted in tests/test_similarity.py) →
    exact in-list ranking. Build is paid once per (sf_dir, mtime) into
    a tmp path; every call after that is probe-only — the bucketed-
    storage shape where at 100 TB a query reads nprobe/n_lists of the
    corpus bytes. Recall tuned by nprobe without re-indexing.

    part='ivfpq' adds the COMPOSED production layout through its own
    persisted index (operators.similarity.ivf_pq_build_index /
    ivf_pq_search, both models pinned): the same partition-pruned
    inverted lists, but each list stores m=4 PQ CODE BYTES per vector
    instead of 256 float bytes — the probe reads nprobe/n_lists of
    the corpus AND only code bytes, the two compressions multiplying.
    Scores are ADC estimates ranked by the unrounded value with id
    tie-break (same discipline as the pq part of ann_cosine_topk).

    FULLY value-oracled: the literal centroids + codebooks let DuckDB
    replay list assignment (argmax cosine, list_id tie-break), the
    nprobe=4 probe selection, the pruned candidate join, PQ encoding,
    ADC estimation, and every returned 4dp score and rank."""
    import hashlib
    import os

    import numpy as np

    from ..sources.registry import owned_ready, user_cache_dir
    from .ivf_model import IVF_CENTROIDS, PQ_CODEBOOKS

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    # deterministic per-corpus location under the per-user 0700 cache
    # root (ownership-gated reuse): the corpus mtime in the tag
    # invalidates the persisted index when the parquet is regenerated,
    # and the MODEL HASH invalidates it mechanically when the pinned
    # literals change — re-pinning the quantizer/codebooks cannot
    # silently reuse an index built from the old models
    src = os.path.join(sf_dir, "embeddings.parquet")
    mtime = int(os.stat(src).st_mtime) if os.path.exists(src) else 0
    cent_h = hashlib.md5(repr(IVF_CENTROIDS).encode()).hexdigest()[:8]
    book_h = hashlib.md5(repr(PQ_CODEBOOKS).encode()).hexdigest()[:8]
    base = f"{sf_dir.strip('/').replace('/', '_')}_{mtime}".replace(".", "_")
    path = user_cache_dir("ivf-index", f"{base}_{cent_h}")
    if not (
        owned_ready(os.path.join(path, "lists"))
        and owned_ready(os.path.join(path, "centroids"))
    ):
        ivf_build_index(
            emb, path, "vec_id", "embedding", n_lists=16,
            centroids=np.asarray(IVF_CENTROIDS, dtype=np.float64),
        )
    ivf = ivf_search_index(
        spark, path, queries_df, "vec_id", "embedding", k=5, nprobe=4
    ).select(
        F.lit("ivf").alias("part"),
        "query_id",
        "neighbor_id",
        F.col("cosine").alias("score"),
        "rank",
    )
    from ..operators.similarity import ivf_pq_build_index, ivf_pq_search

    pq_path = user_cache_dir("ivfpq-index", f"{base}_{cent_h}_{book_h}")
    if not (
        owned_ready(os.path.join(pq_path, "lists"))
        and owned_ready(os.path.join(pq_path, "centroids"))
        and owned_ready(os.path.join(pq_path, "codebooks"))
    ):
        ivf_pq_build_index(
            emb, pq_path, "vec_id", "embedding", n_lists=16, m=4, n_codes=16,
            centroids=np.asarray(IVF_CENTROIDS, dtype=np.float64),
            codebooks=np.asarray(PQ_CODEBOOKS, dtype=np.float64),
        )
    ivfpq = ivf_pq_search(
        spark, pq_path, queries_df, "vec_id", "embedding", k=5, nprobe=4
    ).select(F.lit("ivfpq").alias("part"), "query_id", "neighbor_id", "score", "rank")
    return ivf.unionByName(ivfpq)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH {_bucket_cte(8, 4)},
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM bk qb JOIN bk cb ON qb.t = cb.t AND qb.bucket = cb.bucket
      WHERE qb.vec_id < 10 AND qb.vec_id != cb.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
      FROM cand c
      JOIN v a ON a.vec_id = c.query_id
      JOIN v b ON b.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (operators.similarity.lsh_topk):
    hyperplane sign buckets → in-bucket exact ranking. The 100 TB
    plan: equi-join on bucket key instead of a nested loop. Recall vs
    brute force is measured in tests/test_similarity.py.

    Value-oracled like dedup_embedding_lsh: seeded hyperplanes as
    literal vectors (8 tables × 4 planes here), candidate buckets,
    4dp cosines and the deterministic (cosine DESC, neighbor ASC)
    ranking all recomputed by DuckDB."""
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries_df, "vec_id", "embedding", k=5, dim=64, n_planes=4)


# ---------------------------------------------------------------------------
# Multimodal (stubbed codec, real plumbing — operators.multimodal)
# ---------------------------------------------------------------------------


def _media_corpus_n(spark: SparkSession, sf_dir: str) -> int:
    """Media corpus size = COUNT(documents). The testdata ships no
    media table (and the container no codecs — the SMF stub is the
    documented boundary), so the mm_* inputs are synthesized; keying
    their size to a real table's row count keeps the bench rows
    proportional to sf AND lets the static oracle SQL derive the SAME
    size via `(SELECT COUNT(*) FROM documents)` — no sf tag parsing on
    either side. Parquet footer count: no data pages read (r12: read
    via pyarrow metadata directly — the previous `.count()` action
    launched a full Spark job, ~0.1 s of pure scheduling, twice per
    bench pass; the footer row count is the identical number). Falls
    back to the Spark count for non-local layouts."""
    import os as _os

    src = _os.path.join(sf_dir, "documents.parquet")
    if _os.path.isfile(src):
        import pyarrow.parquet as _pq

        try:
            return _pq.ParquetFile(src).metadata.num_rows
        except Exception:  # noqa: BLE001 — unreadable footer → Spark path
            pass
    from ..sources.registry import load_table

    return load_table(spark, sf_dir, "documents").count()


# Shared by both mm oracles: pixel k of image `seed` is the hex pair
# (k%16)*2+1..+2 of md5(seed || ':' || k//16) — the exact generator
# operators.multimodal.portable_pixels runs (portable md5 block family).
_HEXD = "'0123456789abcdef'"


def _px_val(hx: str, j: str) -> str:
    """DuckDB expression: byte value of hex pair j (0-based) in digest
    column `hx` — (strpos of first nibble)*16 + strpos of second."""
    return (
        f"(strpos({_HEXD}, substr({hx}, ({j})*2+1, 1)) - 1) * 16 + "
        f"strpos({_HEXD}, substr({hx}, ({j})*2+2, 1)) - 1"
    )


@query(
    "mm_decode_suite",
    oracle=f"""
    WITH imgs AS (
      SELECT unnest(generate_series(0, (SELECT COUNT(*) FROM documents) - 1)) AS id
    ), blocks AS (SELECT unnest(generate_series(0, 31)) AS b),
    bytes AS (SELECT unnest(generate_series(0, 15)) AS j),
    blk AS (
      SELECT i.id, b.b, md5(i.id || ':' || b.b) AS hx
      FROM imgs i CROSS JOIN blocks b
    ), px AS (
      SELECT blk.id, {_px_val('blk.hx', 'y.j')} AS val
      FROM blk CROSS JOIN bytes y
    )
    SELECT id,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(val) AS DOUBLE) / COUNT(*) AS mean_px,
           CAST(MIN(val) AS INT) AS min_px,
           CAST(MAX(val) AS INT) AS max_px,
           CAST(2 AS BIGINT) AS n_frames_sampled,
           CAST(160 AS BIGINT) AS frame_bytes_total
    FROM px GROUP BY id
    """,
)
def mm_decode_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-path suite over a binary media column: per-image stats
    (operators.multimodal.image_stats — pixels stay executor-local,
    only scalars shuffle) joined with per-container frame-sampling
    aggregates (operators.multimodal.frame_sample — the 1→n/k fan-out
    shape, re-encoded frame blobs with typed metadata). FULL value
    oracle: the portable md5 pixel codec lets DuckDB recompute every
    pixel, so the stats leg is value-checked end-to-end; the frame
    leg's expected counts/bytes are geometry constants (h/frame_rows
    frames, every 4th sampled, 16-byte header + w*frame_rows pixel
    bytes) the oracle pins, verifying Spark's fan-out and re-encode.
    Exactness vs direct numpy decode is additionally tested in
    tests/test_multimodal.py. Input size = COUNT(documents) (500 at
    sf0.01 → 5,000 at sf0.1) so bench rows track scale and the static
    oracle SQL derives the same corpus size from the same table."""
    n = _media_corpus_n(spark, sf_dir)
    # partitioning scales with input (fixed min_partitions=1 would
    # serialize the decode kernels once n grows with the sf tag)
    parts = max(1, min(32, n // 100))
    images = synthetic_images(spark, n=n, width=16, height=32).localCheckpoint()
    stats = image_stats(images, min_partitions=parts)
    frames = (
        frame_sample(images, every_k=4, min_partitions=parts)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.sum(F.length("content")).alias("frame_bytes_total"),
        )
    )
    return stats.join(frames, "id")


@query(
    "mm_image_near_dup",
    oracle=f"""
    WITH base AS (
      SELECT unnest(generate_series(0, (SELECT COUNT(*) // 8 FROM documents) - 1)) AS id
    ), imgs AS (
      SELECT id AS img, id AS seed FROM base
      UNION ALL
      SELECT 100000 + d.id, d.id
      FROM (SELECT unnest(generate_series(0, 9)) AS id) d
    ), rk AS (
      /* nearest-neighbor resize 32x24 -> 16x12: source linear index
         k = (y*24//12)*32 + (x*32//16), row-major over w=32 */
      SELECT (y.y * 24 // 12) * 32 + (x.x * 32 // 16) AS k
      FROM (SELECT unnest(generate_series(0, 11)) AS y) y
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x) x
    ), rb AS (SELECT DISTINCT k // 16 AS b FROM rk),
    blk AS (
      SELECT i.img, rb.b, md5(i.seed || ':' || rb.b) AS hx
      FROM imgs i CROSS JOIN rb
    ), px AS (
      SELECT blk.img, {_px_val('blk.hx', 'r.k % 16')} AS val
      FROM rk r JOIN blk ON blk.b = r.k // 16
    ), bins AS (SELECT unnest(generate_series(0, 15)) AS bin),
    cnts AS (SELECT img, val // 16 AS bin, COUNT(*) AS c FROM px GROUP BY 1, 2),
    hist AS (
      /* float32 embedding exactly as the kernel: count * (1/192) in
         double, then one rounding to REAL */
      SELECT i.img, b.bin,
             CAST(CAST(COALESCE(c.c, 0) AS DOUBLE) * (1.0 / 192.0) AS REAL) AS h
      FROM imgs i CROSS JOIN bins b
      LEFT JOIN cnts c ON c.img = i.img AND c.bin = b.bin
    ), emb AS (
      SELECT img, list(CAST(h AS DOUBLE) ORDER BY bin) AS e FROM hist GROUP BY img
    )
    SELECT a.img AS id_a, b.img AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
    FROM emb a JOIN emb b ON a.img < b.img
    WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.999
    """,
)
def mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media → embedding bridge: resize, histogram features, then the
    embedding near-dup operator (multimodal → similarity composition).
    Ids ≥ 100000 are re-labeled copies of ids 0-9 (same seed →
    identical pixels), so the result always contains those pairs at
    cosine 1.0 — asserted in tests/test_multimodal.py.

    FULL value oracle via the portable md5 pixel codec: DuckDB re-runs
    generate → resize (index-map replay) → 16-bin histogram → float32
    embedding → all-pairs cosine. Cross-engine float boundary (stated,
    same class as dedup_embedding_cosine): numpy normalizes rows then
    takes dot products, DuckDB divides the dot by the norm product —
    last-ulp differences absorbed by the 4 dp round; a flip needs a
    pair within ~1e-15 of the 0.999 threshold, and the measured
    non-dup cosine maximum is 0.9913 at both sf0.01 and sf0.1
    geometries (only exact-dup pairs at 1.0 cross). Input size =
    COUNT(documents)//8 (62 at sf0.01 → 625 at sf0.1)."""
    n = _media_corpus_n(spark, sf_dir) // 8
    base = synthetic_images(spark, n=n)
    dups = base.filter(F.col("id") < 10).withColumn("id", F.col("id") + 100_000)
    # partitioning scales with the input (a fixed min_partitions=1
    # serializes the python decode kernels once n grows with sf); small
    # corpora keep few partitions so worker startup isn't the bill
    parts = max(1, min(32, n // 50))
    # FUSED decode→resize→histogram kernel (image_feature_pipeline):
    # pixels cross the Arrow boundary zero times instead of twice —
    # pinned equal to the resize∘histogram composition in tests
    feats = image_feature_pipeline(
        base.unionByName(dups), 16, 12, min_partitions=parts
    ).localCheckpoint()
    # localCheckpoint: all_pairs_cosine evaluates its input twice
    # (driver collect for the broadcast matrix + the distributed batch
    # pass); without materialization the generate+feature kernel chain
    # runs twice end-to-end, and unlike cache() the checkpoint blocks
    # are released when the frame is garbage-collected
    return all_pairs_cosine(feats, "id", "embedding", threshold=0.999, min_partitions=parts)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


# Deterministic PII injection for the text_profile oracle: the synthetic
# documents carry no natural PII, so both engines append the SAME
# synthetic contact block (keyed off doc_id) before counting/redacting —
# the dialect-neutral fragment runs verbatim under Spark SQL and DuckDB.
_PII_AUG = (
    "CASE CAST(doc_id % 3 AS INT) "
    "WHEN 0 THEN text || ' Contact user' || CAST(doc_id AS VARCHAR(20)) || "
    "'@mail.example.com or +1 (415) 555-01' || CAST(doc_id % 10 AS VARCHAR(20)) || "
    "CAST(doc_id % 7 AS VARCHAR(20)) "
    "WHEN 1 THEN text || ' See https://docs.example.org/p/' || CAST(doc_id AS VARCHAR(20)) || "
    "' from host 10.0.' || CAST(doc_id % 9 AS VARCHAR(20)) || '.7' "
    "ELSE text END"
)


def _pii_oracle_cols() -> str:
    """DuckDB column expressions mirroring operators.text.pii_signals /
    redact_pii over the augmented text (built with %-formatting, not an
    f-string, because the regex patterns contain literal braces)."""
    counts = ", ".join(
        "CAST(len(regexp_extract_all(aug, '%s')) AS INT) AS n_%s" % (pat, name)
        for name, pat in PII_PATTERNS.items()
    )
    red = "aug"
    for name, pat in PII_PATTERNS.items():
        red = "regexp_replace(%s, '%s', '<%s>', 'g')" % (red, pat, name.upper())
    return counts + ", CAST(length(%s) AS BIGINT) AS redacted_len" % red


_PII_ORACLE_CTE = (
    "SELECT doc_id, " + _pii_oracle_cols() + " FROM (SELECT doc_id, " + _PII_AUG
    + " AS aug FROM documents)"
)


@query(
    "text_profile",
    oracle=f"""
    WITH l AS (
      SELECT doc_id,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('de')}, w))) AS INT) AS hits_de,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('en')}, w))) AS INT) AS hits_en,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('es')}, w))) AS INT) AS hits_es,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('fr')}, w))) AS INT) AS hits_fr
      FROM documents
    ), q AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_measured,
             CAST(len({_WORDS}) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(length(array_to_string({_WORDS}, '')) AS BIGINT) AS total_word_chars,
             CAST(len(list_filter({_WORDS}, w -> list_contains({_sw_list('en')}, w))) AS BIGINT) AS en_hits
      FROM documents
    ), t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS ws_tokens,
             CASE WHEN text IS NULL THEN 0
                  ELSE CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) END AS regex_tokens
      FROM documents
    ), f AS (
      SELECT doc_id, md5({_NORM}) AS md5_fingerprint FROM documents
    ), p AS (
      {_PII_ORACLE_CTE}
    ), rg AS (
      SELECT doc_id,
             string_split(text, chr(10)) AS ls,
             list_transform(generate_series(1, greatest(len({_WORDS}) - 1, 0)),
                            i -> ({_WORDS})[i] || ' ' || ({_WORDS})[i + 1]) AS bg
      FROM documents
    ), r AS (
      SELECT doc_id,
             ROUND(CASE WHEN len(ls) > 0
                        THEN (len(ls) - len(list_distinct(ls)))
                             / CAST(len(ls) AS DOUBLE)
                        ELSE 0.0 END, 4) AS dup_line_frac,
             ROUND(CASE WHEN len(bg) > 0
                        THEN (len(bg) - len(list_distinct(bg)))
                             / CAST(len(bg) AS DOUBLE)
                        ELSE 0.0 END, 4) AS dup_bigram_frac
      FROM rg
    ), wc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM (
        SELECT doc_id, unnest({_WORDS}) AS w FROM documents
      ) WHERE w <> '' GROUP BY doc_id, w
    ), topw AS (
      SELECT doc_id,
             ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 4) AS top_word_frac
      FROM wc GROUP BY doc_id
    ), c AS (
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS cr_bytes,
             CASE WHEN text IS NULL THEN NULL ELSE 1 END AS cr_in_bound
      FROM documents
    )
    SELECT l.doc_id, l.hits_de, l.hits_en, l.hits_es, l.hits_fr,
           CASE WHEN GREATEST(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
                WHEN hits_de = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
                WHEN hits_en = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
                WHEN hits_es = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           q.n_chars_measured, q.n_words,
           ROUND(CAST(q.total_word_chars AS DOUBLE) / GREATEST(q.n_words, 1), 4) AS avg_word_len,
           ROUND(CAST(q.n_punct AS DOUBLE) / GREATEST(q.n_chars_measured, 1), 4) AS punct_ratio,
           ROUND(CAST(q.en_hits AS DOUBLE) / GREATEST(q.n_words, 1), 4) AS stopword_ratio,
           ROUND(LEAST(GREATEST(
             ROUND(CAST(q.en_hits AS DOUBLE) / GREATEST(q.n_words, 1), 4) * 2 + 0.5
             - ROUND(CAST(q.n_punct AS DOUBLE) / GREATEST(q.n_chars_measured, 1), 4) * 5,
             0.0), 1.0), 4) AS quality_score,
           t.ws_tokens, t.regex_tokens,
           f.md5_fingerprint,
           p.n_email, p.n_url, p.n_ipv4, p.n_phone, p.redacted_len,
           r.dup_line_frac, r.dup_bigram_frac,
           COALESCE(topw.top_word_frac, 0.0) AS top_word_frac,
           c.cr_bytes, c.cr_in_bound
    FROM l
    JOIN q USING (doc_id)
    JOIN t USING (doc_id)
    JOIN f USING (doc_id)
    JOIN p USING (doc_id)
    JOIN r USING (doc_id)
    LEFT JOIN topw USING (doc_id)
    JOIN c USING (doc_id)
    """,
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document text-analysis profile — language ID, quality
    signals, token counts, and the md5 fingerprint in ONE pass:

    - language ID via stopword-hit scoring (operators.text.language_id)
      — vectorized set-membership counts, argmax with deterministic tie
      order;
    - quality signals (operators.text.quality_scores): length / word
      stats / punctuation & stopword ratios / composite score — the
      cheap pre-filters of an LLM data pipeline;
    - token counting (operators.text.token_counts): whitespace + BPE-ish
      regex tokens, both JVM-side regex;
    - fingerprints (operators.text.fingerprints; md5 column — the
      xxhash64 shard key is Spark-specific and verified in
      tests/test_text_ops.py instead);
    - PII signals + redaction (operators.text.pii_signals/redact_pii)
      over deterministically PII-augmented text (the synthetic corpus
      carries no natural PII, so both engines inject the same
      doc_id-keyed contact block first — `_PII_AUG` runs verbatim in
      Spark SQL and DuckDB): per-kind hit counts and the redacted
      length, all chained `regexp_count`/`regexp_replace` Columns;
    - repetition signals (operators.text.repetition_signals):
      dup_line_frac / dup_bigram_frac (pure array ops, no shuffle)
      and top_word_frac (relational mode: explode → (doc, word)
      count → max/sum — one hash-partitioned shuffle, map-side
      combined), the C4/Gopher-style repetition filters; 4dp-rounded
      at the output boundary on both engines;
    - compression-ratio signal (operators.text.compression_ratio —
      zlib over an Arrow-batched kernel) under the SKETCH-SUITE
      oracle contract: zlib is not expressible in SQL, so the driver
      row carries (cr_bytes = the exact utf-8 byte length both
      engines compute, cr_in_bound = 1 iff the measured ratio sits
      inside the PROVABLE zlib envelope [stream-overhead/L,
      1 + (5·⌈L/16383⌉ + 11)/L] with 1e-4 rounding slack; empty text
      must report exactly 0.0). The oracle asserts the flag is 1 for
      every document; the discriminative behavior (repetitive ≪
      natural text) is pinned in tests/test_text_signals.py.

    All pure Column expressions, composed COLUMN-WISE into one
    projection over ONE documents scan (r12, guide §2.1/§1.3: the
    former operator-join form — seven doc_id self-joins of the same
    scan — planned each sub-broadcast-threshold leg as a sequential
    single-task broadcast-build job, ~9 serialized jobs redoing the
    heavy regex work per leg; fused, the whole profile is one 22-
    Exchange → 1-join plan whose regex/array work runs once, spread
    across all cores). The operators stay independently reusable —
    they share these exact expression builders
    (operators.text.*_exprs), so the fused values are the operators'
    values by construction. Only the compression-ratio leg remains a
    join: its zlib kernel is an Arrow mapInPandas boundary no Column
    projection can absorb.
    """
    from ..operators.text import (
        compression_ratio,
        language_hit_exprs,
        pii_count_exprs,
        predicted_lang_expr,
        quality_exprs,
        redacted_expr,
        repetition_exprs,
        token_exprs,
        _words as _text_words,
    )
    from ..operators.dedup import normalized_text
    from ..utils import spread

    # spread: documents.parquet is one sub-split-size file → a 1-task
    # scan; the fused projection carries ALL the regex/array CPU, so a
    # tiny repartition shuffle first lets it run at full width
    docs = spread(_docs(spark, sf_dir).select("doc_id", "text"))
    base = docs.select(
        "doc_id",
        "text",
        _text_words("text").alias("__w"),
        F.expr(_PII_AUG).alias("__aug"),
    )
    wcol = F.col("__w")
    hits = language_hit_exprs(wcol)
    rep = repetition_exprs("text", wcol)
    # compression-ratio leg, bound-flag contract: the measured zlib
    # ratio (4dp) must sit inside the provable envelope — lower bound
    # the fixed stream overhead (2B header + 4B adler + >=2B deflate)
    # over L, upper bound stored-block worst case (5B per <=16383B
    # block + overhead) over L, each with 1e-4 slack for the 4dp
    # rounding of the ratio itself; empty text reports exactly 0.0
    byt = F.col("cr_bytes").cast("double")
    in_bound = F.when(
        F.col("cr_bytes") == 0, (F.col("compression_ratio") == 0.0).cast("int")
    ).otherwise(
        (
            (F.col("compression_ratio") >= F.lit(8.0) / byt - F.lit(0.0001))
            & (
                F.col("compression_ratio")
                <= F.lit(1.0)
                + (F.lit(5.0) * F.ceil(byt / F.lit(16383.0)) + F.lit(11.0)) / byt
                + F.lit(0.0001)
            )
        ).cast("int")
    )
    # the kernel emits cr_bytes itself (same encode it compresses), so
    # no second docs scan + join behind the mapInPandas boundary
    cr = compression_ratio(docs, "doc_id", "text").select(
        "doc_id", "cr_bytes", in_bound.alias("cr_in_bound")
    )
    prof = base.select(
        "doc_id",
        *[c.alias(f"hits_{l}") for l, c in hits.items()],
        *[c.alias(n) for n, c in quality_exprs("text", wcol).items()],
        *[c.alias(n) for n, c in token_exprs("text").items()],
        F.md5(normalized_text("text")).alias("md5_fingerprint"),
        *[c.alias(n) for n, c in pii_count_exprs(F.col("__aug")).items()],
        F.length(redacted_expr(F.col("__aug"))).cast("long").alias("redacted_len"),
        *[F.round(c, 4).alias(n) for n, c in rep.items()],
    ).withColumn(
        "predicted_lang",
        predicted_lang_expr({l: F.col(f"hits_{l}") for l in hits}),
    )
    return prof.join(cr, "doc_id").select(
        "doc_id",
        *[f"hits_{l}" for l in hits],
        "predicted_lang",
        "n_chars_measured", "n_words", "avg_word_len", "punct_ratio",
        "stopword_ratio", "quality_score",
        "ws_tokens", "regex_tokens",
        "md5_fingerprint",
        "n_email", "n_url", "n_ipv4", "n_phone", "redacted_len",
        "dup_line_frac", "dup_bigram_frac", "top_word_frac",
        "cr_bytes", "cr_in_bound",
    )


@query(
    "text_ngram_suite",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_WORDS} AS w FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM docs
    ), topk AS (
      SELECT 'topk' AS part, gram AS s1,
             COUNT(*) AS k1,
             CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS v1
      FROM grams
      GROUP BY gram
      ORDER BY COUNT(*) DESC, gram ASC
      LIMIT 50
    ), lm_toks AS (
      SELECT doc_id,
             string_split_regex(trim(concat('<s> ', lower(text))), '\\s+') AS t
      FROM documents
    ), lm_grams AS (
      SELECT doc_id, t[i] AS context, t[i + 1] AS token
      FROM lm_toks,
           LATERAL unnest(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
    ), lm AS (
      SELECT context, token, COUNT(*) AS cnt FROM lm_grams GROUP BY 1, 2
    ), totals AS (
      SELECT context, SUM(cnt) AS ctx_total FROM lm GROUP BY 1
    ), scored AS (
      SELECT g.doc_id,
             ln((COALESCE(l.cnt, 0) + 0.1)
                / (COALESCE(t.ctx_total, 0)
                   + 0.1 * (SELECT COUNT(DISTINCT token) FROM lm))) AS lp
      FROM lm_grams g
      LEFT JOIN lm l ON g.context = l.context AND g.token = l.token
      LEFT JOIN totals t ON g.context = t.context
    ), lm_agg AS (
      SELECT doc_id, COUNT(*) AS k1, ROUND(AVG(lp), 4) AS v1
      FROM scored GROUP BY doc_id
    ), lm_part AS (
      SELECT 'lm' AS part, CAST(d.doc_id AS VARCHAR) AS s1,
             COALESCE(a.k1, 0) AS k1, a.v1 AS v1
      FROM documents d LEFT JOIN lm_agg a ON d.doc_id = a.doc_id
    ), sp_toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sp_wins AS (
      SELECT doc_id, i - 1 AS s,
             array_to_string(t[i:i+7], ' ') AS content
      FROM sp_toks,
           LATERAL unnest(generate_series(1, greatest(len(t) - 7, 0))) AS u(i)
    ), sp_stats AS (
      SELECT content, COUNT(DISTINCT doc_id) AS nd,
             MIN(doc_id * 1000000 + s) AS first_key
      FROM sp_wins GROUP BY content
    ), sp_covered AS (
      SELECT w.doc_id, w.s
      FROM sp_wins w JOIN sp_stats st USING (content)
      WHERE st.nd >= 2 AND (w.doc_id * 1000000 + w.s) <> st.first_key
    ), sp_marked AS (
      SELECT doc_id, s, s + 7 AS e,
             CASE WHEN s > COALESCE(MAX(s + 7) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 1 ELSE 0 END AS nw
      FROM sp_covered
    ), sp_grp AS (
      SELECT doc_id, s, e,
             SUM(nw) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS UNBOUNDED PRECEDING) AS g
      FROM sp_marked
    ), span_part AS (
      SELECT 'span' AS part,
             CAST(doc_id AS VARCHAR) || ':' || CAST(MIN(s) AS VARCHAR) AS s1,
             MAX(e) AS k1,
             CAST(MAX(e) - MIN(s) + 1 AS DOUBLE) AS v1
      FROM sp_grp GROUP BY doc_id, g
    ), bo_aug AS (
      SELECT doc_id,
             text || chr(10) || 'chrome line ' || CAST(doc_id % 3 AS VARCHAR)
                  || chr(10) || 'sig ' || CAST(doc_id AS VARCHAR) AS t
      FROM documents
    ), bo_ln AS (
      SELECT doc_id, u.i AS idx, ls[u.i] AS line
      FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM bo_aug),
           LATERAL unnest(generate_series(1, len(ls))) AS u(i)
    ), bo_common AS (
      SELECT h FROM (
        SELECT DISTINCT md5(line) AS h, doc_id FROM bo_ln
      ) GROUP BY h HAVING COUNT(*) > 2
    ), bo_built AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS cleaned
      FROM bo_ln
      WHERE md5(line) NOT IN (SELECT h FROM bo_common)
      GROUP BY doc_id
    ), boiler_part AS (
      SELECT 'boiler' AS part,
             CAST(d.doc_id AS VARCHAR) || ':' || md5(COALESCE(b.cleaned, '')) AS s1,
             CAST(length(COALESCE(b.cleaned, '')) AS BIGINT) AS k1,
             CAST(NULL AS DOUBLE) AS v1
      FROM documents d LEFT JOIN bo_built b ON d.doc_id = b.doc_id
    ), {_bm25_cte_block()}, bm25_part AS (
      SELECT 'bm25' AS part,
             query_id || ':' || CAST(doc_id AS VARCHAR) AS s1,
             rnk AS k1, ROUND(score, 4) AS v1
      FROM bm_rank WHERE rnk <= 10
    )
    SELECT * FROM topk
    UNION ALL SELECT * FROM lm_part
    UNION ALL SELECT * FROM span_part
    UNION ALL SELECT * FROM boiler_part
    UNION ALL SELECT * FROM bm25_part
    """,
)
def text_ngram_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics AND the n-gram LM quality gate as one
    suite (the former text_ngram_topk plus the CCNet-style scorer,
    part-discriminated to hold the registry at the driver's 50-entry
    cap; both parts keep full value oracles):

    - part='topk' (s1=gram, k1=occurrences, v1=doc_frequency):
      bigram stats, top-50 with a deterministic tiebreak (SURVEY.md
      §7: n-gram counts via explode + A1). The explode shuffles one
      row per gram OCCURRENCE — at 100 TB this is the heaviest text
      shuffle, which is why partial hash aggregation (map-side
      combine on the gram key) and the TakeOrderedAndProject top-k
      matter: only (gram, counts) pairs reach the exchange, no
      global sort materializes.
    - part='lm' (s1=doc_id, k1=n_scored, v1=mean bigram log-prob,
      4dp): every document scored against the corpus-trained bigram
      LM (operators.text.ngram_lm_train/ngram_lm_score, add-0.1
      smoothing) — the perplexity-style fluency gate, value-checked
      against DuckDB computing the identical model and smoothing.
      The model is a DataFrame joined on (context, token); nothing
      collects (the vocab size is one scalar count).
    - part='span' (s1=doc_id:span_start, k1=span_end, v1=span_tokens):
      substring-level exact dedup (operators.text.duplicated_spans,
      min_tokens=8, cross-doc, keep-first) — maximal duplicated token
      spans per document. The operator keys windows on a 64-bit
      content hash; the ORACLE recomputes the identical spans from
      window CONTENT equality directly (DuckDB has no xxhash64), so
      the value check covers the whole pipeline modulo the documented
      2^-64 collision odds.
    - part='bm25' (s1=query_id:doc_id, k1=rank, v1=score 4dp): BM25
      top-10 retrieval for three literal queries, served from the
      PERSISTED inverted index (operators.text.bm25_build_index /
      bm25_search_index; built once per (sf_dir, mtime), probe-only
      after — the ann_ivf_topk contract): the probe opens only the
      query terms' md5-bucket postings dirs (PartitionFilters), then
      runs the same scoring tail as the in-flight bm25_topk — salted
      two-stage per-query top-k, fixed-order term sums so the doubles
      are bit-identical across engines; the oracle recomputes
      idf/tf/dl scoring whole."""
    from ..operators.dedup import normalized_text, word_ngrams
    from ..operators.text import ngram_lm_score, ngram_lm_train
    from ..utils import spread

    # r12 (guide §2.6): one spread scan shared by all five parts — the
    # single-file documents scan otherwise pins each part's map side
    # (gram explode, LM tokenization, span hashing, line posexplode)
    # to sequential 1-task AQE stages; every leg reuses this exchange
    docs = spread(_docs(spark, sf_dir))
    grams = (
        docs.withColumn("__words", F.split(normalized_text("text"), " "))
        .select(F.col("doc_id"), F.explode(word_ngrams("__words", 2)).alias("gram"))
    )
    topk = (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_frequency"),
        )
        .orderBy(F.desc("occurrences"), F.asc("gram"))
        .limit(50)
        .select(
            F.lit("topk").alias("part"),
            F.col("gram").alias("s1"),
            F.col("occurrences").alias("k1"),
            F.col("doc_frequency").cast("double").alias("v1"),
        )
    )
    # the trained bigram model persists like the other build-once
    # artifacts (bm25/ivf/minhash indexes): trained ONCE per
    # (sf_dir, mtime) into the ownership-gated cache, read-only after —
    # a trusted-corpus LM is a reusable asset, not per-query work.
    # (Replaces the earlier per-call eager localCheckpoint, which
    # retrained on every invocation.) The model frame is dim-sized
    # (distinct (context, token) pairs), so the one-time write is
    # cheap and every later call costs one parquet read.
    import os as _os2

    from ..sources.registry import owned_ready, user_cache_dir

    _lm_src = _os2.path.join(sf_dir, "documents.parquet")
    _lm_mt = int(_os2.stat(_lm_src).st_mtime) if _os2.path.exists(_lm_src) else 0
    _lm_base = f"{sf_dir.strip('/').replace('/', '_')}_{_lm_mt}".replace(".", "_")
    _lm_dir = user_cache_dir("lm-model", _lm_base)
    _lm_path = _os2.path.join(_lm_dir, "bigram")
    if not owned_ready(_lm_path):
        ngram_lm_train(docs, "text", n=2).write.mode("overwrite").parquet(_lm_path)
    from ..sources.registry import read_parquet_memo

    lm = read_parquet_memo(spark, _lm_path)
    lm_part = ngram_lm_score(docs, lm, "doc_id", "text", n=2).select(
        F.lit("lm").alias("part"),
        F.col("doc_id").cast("string").alias("s1"),
        F.col("n_scored").alias("k1"),
        F.round("lm_logprob", 4).alias("v1"),
    )
    from ..operators.text import duplicated_spans

    span_part = duplicated_spans(docs, "doc_id", "text", min_tokens=8).select(
        F.lit("span").alias("part"),
        F.concat_ws(":", F.col("doc_id").cast("string"),
                    F.col("span_start").cast("string")).alias("s1"),
        F.col("span_end").cast("long").alias("k1"),
        F.col("span_tokens").cast("double").alias("v1"),
    )
    # part='boiler': C4-style cross-document boilerplate-line removal
    # (operators.text.strip_common_lines). The synthetic corpus has no
    # natural shared lines, so — PII-leg precedent — both engines
    # append the same deterministic chrome first: a doc_id%3-keyed
    # "chrome line" (lands in ~N/3 docs, provably stripped) and a
    # per-doc unique "sig" line (df=1, provably KEPT, order
    # preserved). s1 carries the md5 of the rebuilt text, so the
    # value check covers the full strip → reassemble path.
    from ..operators.text import strip_common_lines

    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nchrome line "),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("\nsig "),
            F.col("doc_id").cast("string"),
        ).alias("t"),
    )
    boiler_part = strip_common_lines(aug, "doc_id", "t", max_df=2).select(
        F.lit("boiler").alias("part"),
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.md5("text_cleaned")
        ).alias("s1"),
        F.length("text_cleaned").cast("long").alias("k1"),
        F.lit(None).cast("double").alias("v1"),
    )
    # part='bm25': distributed BM25 retrieval, REGISTERED through the
    # persisted inverted index (operators.text.bm25_build_index /
    # bm25_search_index — the same build-once/probe-only contract as
    # ann_ivf_topk): postings partitioned by md5 term bucket, probe
    # prunes to the query terms' buckets via PartitionFilters. Probe ≡
    # in-flight bm25_topk by construction (shared scoring tail,
    # asserted in tests), so the oracle recomputes the full scoring
    # function unchanged.
    from ..operators.text import bm25_search_index

    _idx = _bm25_index(spark, docs, sf_dir)
    bm25_part = bm25_search_index(spark, _idx, BM25_QUERIES, k=10).select(
        F.lit("bm25").alias("part"),
        F.concat_ws(":", "query_id", F.col("doc_id").cast("string")).alias("s1"),
        F.col("rank").cast("long").alias("k1"),
        F.col("score").alias("v1"),
    )
    return (
        topk.unionByName(lm_part).unionByName(span_part)
        .unionByName(boiler_part).unionByName(bm25_part)
    )


# ---------------------------------------------------------------------------
# Corpus assembly (operators.corpus) — splits, decontamination, packing
# ---------------------------------------------------------------------------

_SPLIT_CASE = """CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                 WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                 ELSE 'test' END"""


# Pinned quality-classifier model for the 'clf' leg: 32 portable
# (md5-bucket) hashed-BOW weights + bias, trained once by
# scripts/train_clf_weights.py (fastText-style labels: stopword_ratio
# above the sf0.01 median = 1). Literal here for the same reason the
# LSH planes and minhash coefficients are literal — the oracle embeds
# the exact values, so DuckDB recomputes every feature bucket, the dot
# product, and the sigmoid, value-checking corpus-wide scoring.
CLF_WEIGHTS = (
    -0.15873192921450938, -0.4129983442853019, 0.0, 0.0,
    0.1475325424246873, 0.0004748341708171633, 0.0, -0.28024177616203233,
    0.0, -0.4859046231793358, -0.9453371065386753, 0.0,
    -0.30528219511971805, 2.3616726171020233, -0.07386626255935837, 0.0,
    -0.05080847401309474, 0.29650854723193354, 0.0, -0.6457495624406642,
    0.0, 0.0, -0.38200237766803297, -0.05884010671888656,
    -0.5226169465881679, 3.3099864169469484, -1.0338463978778925, -0.5036493671912268,
    0.0, -0.23908025209537398, -0.3899359305770012, 0.11369314774846008,
    -0.26725822245551295,
)
_CLF_DIM = 32
_CLF_WLIST = "[" + ", ".join(repr(w) for w in CLF_WEIGHTS[:_CLF_DIM]) + "]"
_CLF_BIAS = repr(CLF_WEIGHTS[_CLF_DIM])


@query(
    "corpus_mixture_suite",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents
    ), sp AS (
      SELECT doc_id, {_SPLIT_CASE} AS split FROM documents
    ), split_part AS (
      SELECT 'split' AS part, split AS key,
             COUNT(*) AS n1, CAST(SUM(n_tokens) AS DOUBLE) AS v1
      FROM sp JOIN toks USING (doc_id) GROUP BY split
    ), docs_w AS (
      SELECT doc_id, {_WORDS} AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                   i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
      FROM docs_w
    ), train_g AS (
      SELECT DISTINCT gram FROM grams JOIN sp USING (doc_id) WHERE sp.split = 'train'
    ), dec AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) AS matched
      FROM grams g
      JOIN sp ON sp.doc_id = g.doc_id AND sp.split = 'test'
      LEFT JOIN train_g t ON g.gram = t.gram
      GROUP BY g.doc_id
    ), decontam_part AS (
      SELECT 'decontam' AS part, CAST(doc_id AS VARCHAR) AS key,
             n_grams AS n1, ROUND(matched / CAST(n_grams AS DOUBLE), 4) AS v1
      FROM dec
    ), pos AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
      FROM toks
    ), pack_part AS (
      SELECT 'pack' AS part, CAST(doc_id AS VARCHAR) AS key,
             CAST(FLOOR(p / 512) AS BIGINT) AS n1, CAST(p % 512 AS DOUBLE) AS v1
      FROM pos
    ), samp AS (
      SELECT source, doc_id FROM documents
      WHERE substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) <
            CASE WHEN source = 'src0' THEN 'g'
                 WHEN source = 'src1' THEN '80000000'
                 ELSE '40000000' END
    ), sample_part AS (
      SELECT 'sample' AS part, source AS key,
             COUNT(*) AS n1, CAST(SUM(n_tokens) AS DOUBLE) AS v1
      FROM samp JOIN toks USING (doc_id) GROUP BY source
    ), strat_part AS (
      SELECT 'strat' AS part, CAST(doc_id AS VARCHAR) AS key,
             n_chars AS n1, CAST(NULL AS DOUBLE) AS v1
      FROM (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)) ASC) AS rn
        FROM documents
      ) WHERE rn <= 50
    ), clf_tok AS (
      SELECT doc_id, unnest({_WORDS}) AS w FROM documents
    ), clf_b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % {_CLF_DIM} AS b
      FROM clf_tok
    ), clf_dot AS (
      SELECT doc_id,
             SUM(({_CLF_WLIST})[b + 1]) / COUNT(*) + {_CLF_BIAS} AS dot
      FROM clf_b GROUP BY doc_id
    ), clf_part AS (
      SELECT 'clf' AS part, CAST(doc_id AS VARCHAR) AS key,
             CASE WHEN 1.0 / (1.0 + exp(-dot)) >= 0.5
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS n1,
             ROUND(1.0 / (1.0 + exp(-dot)), 4) AS v1
      FROM clf_dot
    ), shuf AS (
      SELECT doc_id, md5('shuffle:7:' || CAST(doc_id AS VARCHAR)) AS sk
      FROM documents
    ), sharded AS (
      SELECT doc_id, sk,
             CAST(('0x' || substring(sk, 1, 8)) AS BIGINT) % 4 AS shard
      FROM shuf
    ), shard_part AS (
      SELECT 'shard' AS part, CAST(doc_id AS VARCHAR) AS key,
             shard AS n1, CAST(pos AS DOUBLE) AS v1
      FROM (
        SELECT doc_id, shard,
               ROW_NUMBER() OVER (PARTITION BY shard
                                  ORDER BY sk ASC, doc_id ASC) AS pos
        FROM sharded
      )
    )
    SELECT * FROM split_part
    UNION ALL SELECT * FROM decontam_part
    UNION ALL SELECT * FROM pack_part
    UNION ALL SELECT * FROM sample_part
    UNION ALL SELECT * FROM strat_part
    UNION ALL SELECT * FROM clf_part
    UNION ALL SELECT * FROM shard_part
    """,
)
def corpus_mixture_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-ASSEMBLY suite — the training-data steps downstream of
    curation, each fully value-oracled (no RNG anywhere):

    - part='split': deterministic md5-bucket train/val/test carve
      (operators.corpus.deterministic_split — content-free, seedless,
      zero shuffle; 75/12.5/12.5) with per-split doc and token
      accounting;
    - part='decontam': per-TEST-doc word-trigram containment against
      the train split's distinct gram set (operators.corpus.
      ngram_containment — the benchmark-leak check; train side reduces
      to one hash-shuffled gram set, test grams left-join it on an
      8-byte xxhash64 key, one groupBy folds the fraction);
    - part='pack': concat-and-chunk sequence packing at seq_len=512
      (operators.corpus.pack_sequences — global token cumsum WITHOUT a
      single-partition window: value-bucket two-phase offsets, the
      surrogate-key scheme applied to running sums);
    - part='sample': per-domain mixture sampling (operators.corpus.
      mixture_sample — keep all of src0, half of src1, a quarter of
      every other source via seedless md5-threshold membership; one
      literal-CASE map over the scan, no RNG, no shuffle) with
      per-surviving-domain doc and token accounting;
    - part='strat': EXACT-size stratified sample, 50 docs per source
      (operators.corpus.stratified_sample — k smallest md5(salt:id)
      keys per stratum; the partition-local Arrow combiner bounds the
      window exchange and provably cannot change the answer);
    - part='shard' (NEW r8): deterministic epoch shuffle + sharding
      (operators.corpus.shard_shuffle, seed=7, 4 shards) — every doc's
      pseudo-random (shard, position) for parallel training readers,
      reproducible on any cluster size/engine (md5 key, total order);
      the oracle replays shard assignment AND within-shard positions
      bit-for-bit;
    - part='clf': corpus-wide SUPERVISED quality scoring
      (operators.classifier.quality_score) with the pinned
      CLF_WEIGHTS model in the portable md5-bucket feature family —
      per doc the sigmoid probability (4dp) and the ≥0.5 keep/drop
      gate bit. Map-only: the weight vector broadcasts, a document's
      tokens never leave its row; the oracle recomputes every bucket,
      the L1-normalized dot product, and the sigmoid from the literal
      weights. Training (iterative, driver-merged) is pinned by
      pytest; scoring — the pass that actually touches 100 TB — is
      value-checked here.
    """
    from ..operators.classifier import quality_score
    from ..operators.corpus import (
        deterministic_split,
        mixture_sample,
        ngram_containment,
        pack_sequences,
        stratified_sample,
        whitespace_token_count_expr,
    )

    from ..utils import spread

    # r12 (guide §2.6/§1.3): ONE spread scan shared by every part —
    # documents is a single sub-split file, so each part's map side
    # (gram hashing, md5 split keys, classifier features) otherwise
    # runs as its own sequential 1-task AQE stage; the shared
    # repartition is one tiny shuffle and every leg reuses the same
    # exchange at full width
    docs = spread(_docs(spark, sf_dir))
    # r12 (guide §2.4): legs that need ONLY doc_id (split keys, shard
    # keys) would have Catalyst prune text straight through the shared
    # spread exchange, giving each its own 1-task doc_id-only scan +
    # private exchange (three extra sequential AQE stages measured).
    # They read the toks checkpoint instead — same one-row-per-doc id
    # domain, already materialized for pack_sequences, zero new scans.
    sp = deterministic_split(docs, "doc_id")
    # materialized once: pack_sequences drives eager actions over its
    # input (per-bucket sums) before the main job, and the split /
    # sample / strat / shard legs re-read it too — without this the
    # whitespace tokenizer re-runs the corpus regex 4x per call.
    # r13 (guide §2.4): widened from (id, n_tokens) to the per-doc
    # METADATA frame (id, source, n_chars, n_tokens) — still O(rows x
    # ~32 B), same bounded-materialization discipline — so the sample
    # and strat legs read the checkpoint instead of their own pruned
    # 1-task documents scans, and the sample leg's toks join-back
    # disappears (its n_tokens already rides the frame)
    meta = docs.select(
        "doc_id", "source", "n_chars",
        whitespace_token_count_expr("text").alias("n_tokens"),
    ).localCheckpoint()
    toks = meta.select("doc_id", "n_tokens")
    # split accounting straight off the toks checkpoint: the split key
    # is md5(doc_id), toks holds exactly one row per doc, so the former
    # sp⋈toks join (and the doc_id-only scan behind it) is a no-op
    split_part = (
        deterministic_split(toks, "doc_id")
        .groupBy(F.col("split").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum("n_tokens").cast("double").alias("v1"),
        )
        .select(F.lit("split").alias("part"), "key", "n1", "v1")
    )
    decontam_part = ngram_containment(
        sp.filter(F.col("split") == "train"),
        sp.filter(F.col("split") == "test"),
        "doc_id", "text", n=3,
    ).select(
        F.lit("decontam").alias("part"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("n_grams").alias("n1"),
        F.col("containment").alias("v1"),
    )
    # r12 (guide §1.3/§6): doc_id bounds from the parquet footer column
    # stats (no Spark job) — pack_sequences' bucketing is provably
    # bounds-insensitive (see its docstring), so this removes one of
    # its two driver actions plus that action's Catalyst pass
    import os as _osb

    from ..sources.registry import parquet_col_bounds

    _bounds = parquet_col_bounds(
        _osb.path.join(sf_dir, "documents.parquet"), "doc_id"
    )
    pack_part = pack_sequences(
        toks, "doc_id", "n_tokens", seq_len=512, id_bounds=_bounds
    ).select(
        F.lit("pack").alias("part"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("seq_id").alias("n1"),
        F.col("seq_offset").cast("double").alias("v1"),
    )
    sample_part = (
        mixture_sample(
            meta, "doc_id", "source", {"src0": 1.0, "src1": 0.5}, default_fraction=0.25
        )
        .groupBy(F.col("source").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum("n_tokens").cast("double").alias("v1"),
        )
        .select(F.lit("sample").alias("part"), "key", "n1", "v1")
    )
    strat_part = stratified_sample(
        meta.select("doc_id", "source", "n_chars"), "doc_id", "source", k=50
    ).select(
        F.lit("strat").alias("part"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("n_chars").alias("n1"),
        F.lit(None).cast("double").alias("v1"),
    )
    import numpy as np

    clf_part = quality_score(
        docs, np.asarray(CLF_WEIGHTS), "doc_id", "text", portable=True
    ).select(
        F.lit("clf").alias("part"),
        F.col("doc_id").cast("string").alias("key"),
        (F.col("quality_prob") >= 0.5).cast("long").alias("n1"),
        F.round("quality_prob", 4).alias("v1"),
    )
    from ..operators.corpus import shard_shuffle

    shard_part = shard_shuffle(
        toks.select("doc_id"), "doc_id", seed=7, n_shards=4
    ).select(
        F.lit("shard").alias("part"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("shard").cast("long").alias("n1"),
        F.col("pos").cast("double").alias("v1"),
    )
    return (
        split_part.unionByName(decontam_part)
        .unionByName(pack_part)
        .unionByName(sample_part)
        .unionByName(strat_part)
        .unionByName(clf_part)
        .unionByName(shard_part)
    )




@query(
    "doc_chunk_suite",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ), nw AS (
      SELECT doc_id, w,
             CASE WHEN len(w) = 1 AND w[1] = '' THEN 0 ELSE len(w) END AS n
      FROM w
    ), nc AS (
      SELECT doc_id, w, n,
             GREATEST(1, CAST(CEIL((n - 16) / 48.0) AS INTEGER)) AS n_chunks
      FROM nw
    ), st AS (
      SELECT doc_id, w, n, UNNEST(generate_series(0, n_chunks - 1)) AS cid FROM nc
    )
    SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
           md5(array_to_string(w[cid * 48 + 1 : cid * 48 + 64], ' ')) AS chunk_md5,
           CAST(LEAST(64, n - cid * 48) AS INTEGER) AS n_tokens
    FROM st
    """,
)
def doc_chunk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (operators.corpus.
    chunk_documents): 64-token windows, 16-token overlap — the
    retrieval/embedding preprocessing step upstream of the ANN
    operators. Value-checked to the byte: the oracle recomputes every
    chunk's md5 from DuckDB's own list slicing, so window boundaries,
    overlap arithmetic, short-doc and empty-doc edges all hash-match.
    Plan is pure narrow (split → posexplode over chunk starts → slice)
    — zero shuffle, zero UDFs."""
    from ..operators.corpus import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), "doc_id", "text", chunk_size=64, overlap=16
    ).select(
        "doc_id",
        "chunk_id",
        F.md5("chunk_text").alias("chunk_md5"),
        "n_tokens",
    )
