"""Similarity-search tests: LSH recall vs brute force, determinism of
hyperplane bucketing, and top-k ordering invariants."""

from __future__ import annotations

from etl_football_analytics_pipeline_spark.manifest import read_relation as _read_rel

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.similarity import (
    all_pairs_cosine,
    brute_force_topk,
    hyperplane_signatures,
    lsh_all_pairs_cosine,
    lsh_topk,
)
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_brute_force_topk_ordering(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 5
        ranked = sorted(rows, key=lambda r: r.rank)
        # cosine non-increasing with rank; no self-matches
        for a, b in zip(ranked, ranked[1:]):
            assert (a.cosine, -a.neighbor_id) >= (b.cosine, -b.neighbor_id)
        assert all(r.neighbor_id != q for r in rows)


def test_lsh_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=1).filter(F.col("rank") == 1).collect()
    approx = lsh_topk(emb, queries, k=5, dim=64, n_planes=4).collect()
    approx_by_q = {}
    for r in approx:
        approx_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    # the true nearest neighbor should land in the query's bucket for
    # most queries with only 4 planes (same-sign probability is high
    # for near-identical vectors)
    hits = sum(1 for r in exact if r.neighbor_id in approx_by_q.get(r.query_id, set()))
    assert hits / len(exact) >= 0.6, f"top-1 recall {hits}/{len(exact)}"


def test_lsh_all_pairs_recall_and_precision(spark, emb):
    """dedup_embedding_lsh contract: every returned pair appears in the
    brute-force all-pairs result with the identical cosine (exact
    precision), and recall ≥ 0.9 at the registered threshold."""
    brute = {(r.id_a, r.id_b): r.cosine for r in all_pairs_cosine(
        emb, "vec_id", "embedding", threshold=0.45).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine for r in lsh_all_pairs_cosine(
        emb, "vec_id", "embedding", threshold=0.45, dim=64, n_planes=4, n_tables=16
    ).collect()}
    assert set(lsh) <= set(brute)
    for pair, cos in lsh.items():
        assert cos == brute[pair]
    assert len(lsh) / max(len(brute), 1) >= 0.9, f"recall {len(lsh)}/{len(brute)}"


def test_lsh_all_pairs_scoring_tiers_agree(spark, emb):
    """'bucket' (per-group matmul) and 'join' (candidate equi-join +
    row-wise cosine) are alternative physical strategies for the same
    operator — identical pairs, identical 4dp cosines."""
    kw = dict(threshold=0.45, dim=64, n_planes=4, n_tables=16)
    bucket = {(r.id_a, r.id_b): r.cosine for r in lsh_all_pairs_cosine(
        emb, "vec_id", "embedding", scoring="bucket", **kw).collect()}
    join = {(r.id_a, r.id_b): r.cosine for r in lsh_all_pairs_cosine(
        emb, "vec_id", "embedding", scoring="join", **kw).collect()}
    assert bucket == join


def test_lsh_all_pairs_centered_mean_dominated(spark):
    """center=True contract on a mean-dominated family (histogram-like
    vectors = big uniform component + small residual): scored cosines
    still come from the ORIGINAL vectors (subset-of-brute with equal
    values); planted exact dups (identical vectors) and planted true
    near-dups (SHARED residual + a much smaller perturbation — the
    re-encoded-image shape) are all recovered. Mean-coincidence pairs
    (independent residuals whose original cosine clears 0.999 only
    because the shared mean dominates) are the documented drop side of
    the centered-bucketing boundary — asserted absent."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    base = np.full(16, 1.0 / 16)
    vecs = base + rng.normal(0, 0.004, size=(80, 16))
    exact_dups = vecs[:5]  # ids 80-84 duplicate ids 0-4
    near_dups = vecs[5:10] + rng.normal(0, 0.0002, size=(5, 16))  # ids 85-89 ≈ ids 5-9
    vecs = np.vstack([vecs, exact_dups, near_dups])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": [r.astype("float32") for r in vecs]}
    )
    df = spark.createDataFrame(pdf)
    brute = {(r.id_a, r.id_b): r.cosine for r in all_pairs_cosine(
        df, "vec_id", "embedding", threshold=0.999).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine for r in lsh_all_pairs_cosine(
        df, "vec_id", "embedding", threshold=0.999, dim=16,
        n_planes=16, n_tables=8, center=True,
    ).collect()}
    assert set(lsh) <= set(brute)
    for pair, cos in lsh.items():
        assert cos == brute[pair]
    for i in range(5):
        assert (i, i + 80) in lsh, f"exact dup ({i},{i+80}) missed"
        assert (i + 5, i + 85) in lsh, f"near dup ({i+5},{i+85}) missed"
    # every surviving pair is planted-dup shaped; mean-coincidence
    # pairs between independent draws are dropped by design
    for id_a, id_b in lsh:
        assert id_b - id_a == 80, f"unexpected candidate ({id_a},{id_b})"


def test_hyperplane_buckets_deterministic(spark, emb):
    a = {r.vec_id: r.bucket for r in hyperplane_signatures(emb, n_planes=8).collect()}
    b = {
        r.vec_id: r.bucket
        for r in hyperplane_signatures(emb.repartition(5), n_planes=8).collect()
    }
    assert a == b


def test_ivf_recall_vs_brute_force(spark, emb):
    from etl_football_analytics_pipeline_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=1).filter(F.col("rank") == 1).collect()
    approx = ivf_topk(emb, queries, k=5, n_lists=8, nprobe=4).collect()
    approx_by_q = {}
    for r in approx:
        approx_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for r in exact if r.neighbor_id in approx_by_q.get(r.query_id, set()))
    # probing half the lists should catch the true NN for most queries
    assert hits / len(exact) >= 0.6, f"top-1 recall {hits}/{len(exact)}"


def test_ivf_index_persists_and_prunes_partitions(spark, emb, tmp_path):
    """The persisted IVF index must (a) return the same results as the
    in-flight ivf_topk with the same centroids/seed, and (b) actually
    prune: the probe scan opens only the probed lists' files."""
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        ivf_build_index,
        ivf_search_index,
        ivf_topk,
    )

    path = str(tmp_path / "ivf")
    ivf_build_index(emb, path, n_lists=16, seed=42)
    queries = emb.filter(F.col("vec_id") < 10)
    got = ivf_search_index(spark, path, queries, k=5, nprobe=4)
    inflight = ivf_topk(emb, queries, k=5, n_lists=16, nprobe=4, seed=42)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in inflight.collect()
    )
    # partition pruning: the list_id filter must reach the scan as a
    # PartitionFilter (pruned at planning — unprobed list directories
    # are never opened). inputFiles() reports the unpruned relation,
    # so assert on the physical plan.
    import contextlib
    import io

    scan = _read_rel(spark, f"{path}/lists").filter(F.col("list_id").isin([0, 1]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "list_id" in pf_line
    # and the pruned row count equals those partitions' contents
    expected = _read_rel(spark, f"{path}/lists").where("list_id in (0,1)").count()
    assert scan.count() == expected
    # layout: each inverted list is ONE coherent file (the build
    # repartitions by list_id before the partitioned write) — without
    # this, every input partition writes a part-file into every list
    # dir and probes pay input×lists scan-task overheads
    import glob
    import os

    for ldir in glob.glob(f"{path}/lists/list_id=*"):
        parts = [f for f in os.listdir(ldir) if f.endswith(".parquet")]
        assert len(parts) == 1, (ldir, parts)


def test_ivf_deterministic(spark, emb):
    from etl_football_analytics_pipeline_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(emb, queries, k=3, n_lists=8).collect()))
    b = sorted(map(tuple, ivf_topk(emb.repartition(7), queries, k=3, n_lists=8).collect()))
    assert a == b  # seeded quantizer + total-order ranking


def test_ivf_append_reaches_probes(spark, emb, tmp_path):
    """Incremental maintenance: build on half the corpus, append the
    rest — appended vectors are assigned to the EXISTING centroids,
    land in the partitioned layout, and probes find them with the
    same scores a from-scratch index over the same centroids gives."""
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        ivf_append_index,
        ivf_build_index,
        ivf_search_index,
        stored_centroids,
    )

    path = str(tmp_path / "ivf_grow")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    cents = ivf_build_index(half_a, path, n_lists=8, seed=42)
    ivf_append_index(spark, path, half_b)
    # centroids untouched by the append
    assert (stored_centroids(spark, path) == cents).all()
    # the index now holds the whole corpus, each vector exactly once
    total = _read_rel(spark, f"{path}/lists").count()
    assert total == emb.count()
    # a query that IS an appended vector finds appended near-dups:
    # the test corpus ships vec_id>=100000 rotated copies of low ids
    # (see testdata design) — at minimum every query must rank SOME
    # neighbor at cosine-descending order with correct rank keys
    queries = half_b.filter(F.col("vec_id") < 20)
    got = ivf_search_index(spark, path, queries, k=5, nprobe=8)
    rows = got.collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"], r["neighbor_id"]))
    appended_ids = {r["vec_id"] for r in half_b.select("vec_id").collect()}
    seen_appended = False
    for q, lst in by_q.items():
        lst.sort()
        cosines = [c for _, c, _ in lst]
        assert cosines == sorted(cosines, reverse=True), q
        if any(n in appended_ids for _, _, n in lst):
            seen_appended = True
    # nprobe=8 probes every list, so appended neighbors MUST surface
    assert seen_appended


def test_pq_recall_and_compression(spark, emb):
    """PQ codes: (a) encode is deterministic and emits m codes per
    vector; (b) ADC top-k recall vs exact brute force stays high at
    16x compression; (c) estimated cosines track true cosines."""
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    books = pq_train_codebooks(emb, m=16, n_codes=256, seed=42)
    assert books.shape[0] == 16
    encoded = pq_encode(emb, books)
    first = encoded.orderBy("vec_id").limit(5).collect()
    again = pq_encode(emb.repartition(9), books).orderBy("vec_id").limit(5).collect()
    assert [list(r["codes"]) for r in first] == [list(r["codes"]) for r in again]
    assert all(len(r["codes"]) == 16 for r in first)

    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    approx = pq_topk(encoded, books, queries, k=5)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got_sets = {}
    est = {}
    for r in approx.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        est[(r["query_id"], r["neighbor_id"])] = r["est_cosine"]
    hits = sum(len(exact_sets[q] & got_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.5, f"raw ADC recall {hits}/{total}"
    # estimates within quantization error of the true cosine for the
    # pairs both tiers rank
    true = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    common = set(true) & set(est)
    assert common
    for pair in common:
        assert abs(true[pair] - est[pair]) < 0.2, pair


def test_pq_rerank_recovers_exact_topk(spark, emb):
    """The production two-stage shape: ADC shortlist → exact re-rank.
    Re-ranked cosines are EXACT (bit-equal to brute force for shared
    pairs) and recall climbs near exact-search levels."""
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    books = pq_train_codebooks(emb, m=16, n_codes=256, seed=42)
    encoded = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10)
    exact_rows = brute_force_topk(emb, queries, k=5).collect()
    got_rows = pq_topk(encoded, books, queries, k=5, rerank=emb, oversample=8).collect()
    exact_sets, true = {}, {}
    for r in exact_rows:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        true[(r["query_id"], r["neighbor_id"])] = r["cosine"]
    got_sets = {}
    for r in got_rows:
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        pair = (r["query_id"], r["neighbor_id"])
        if pair in true:
            assert r["cosine"] == true[pair], pair  # exact re-rank
    hits = sum(len(exact_sets[q] & got_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.85, f"re-ranked recall {hits}/{total}"


def test_ivf_pq_index_end_to_end(spark, emb, tmp_path):
    """IVF-PQ composition: lists hold m-byte codes (no floats), probes
    prune partitions, and the re-ranked two-stage search recovers
    brute-force recall with exact cosines."""
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_build_index,
        ivf_pq_search,
    )

    path = str(tmp_path / "ivfpq")
    ivf_pq_build_index(emb, path, n_lists=8, m=16, n_codes=256, seed=42)
    lists = _read_rel(spark, f"{path}/lists")
    # compression: codes only — the raw embedding column must NOT be
    # stored in the lists
    assert set(lists.columns) == {"vec_id", "codes", "list_id"}
    assert lists.count() == emb.count()
    # probes prune partitions (same layout contract as plain IVF)
    import contextlib
    import io

    scan = lists.filter(F.col("list_id").isin([0, 1]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    assert "list_id" in next(
        ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln
    )

    queries = emb.filter(F.col("vec_id") < 10)
    exact_rows = brute_force_topk(emb, queries, k=5).collect()
    got_rows = ivf_pq_search(
        spark, path, queries, k=5, nprobe=8, rerank=emb, oversample=8
    ).collect()
    exact_sets, true = {}, {}
    for r in exact_rows:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        true[(r["query_id"], r["neighbor_id"])] = r["cosine"]
    got_sets = {}
    for r in got_rows:
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        pair = (r["query_id"], r["neighbor_id"])
        if pair in true:
            assert r["score"] == true[pair], pair  # exact re-rank
    hits = sum(len(exact_sets[q] & got_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    # nprobe=8 probes EVERY list, so the only loss is PQ shortlist
    # misses — with 8x oversampling that should be rare
    assert hits / total >= 0.85, f"IVF-PQ re-ranked recall {hits}/{total}"
    # ADC-only search (no rerank) still returns ranked rows per query
    raw = ivf_pq_search(spark, path, queries, k=5, nprobe=4)
    counts = {r["query_id"]: r["n"] for r in
              raw.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert counts and all(v <= 5 for v in counts.values())


def test_semantic_dedup_prunes_near_copies(spark):
    import numpy as np

    from etl_football_analytics_pipeline_spark.operators.similarity import (
        all_pairs_cosine,
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    # 6 well-separated anchors, each with 3 near-copies (tiny noise):
    # clusterable data — every near-dup pair lands in one cluster
    rows = []
    vid = 0
    for a in range(6):
        anchor = rng.normal(size=16)
        anchor /= np.linalg.norm(anchor)
        for c in range(4):
            v = anchor + rng.normal(scale=0.01, size=16) * (c > 0)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # n_clusters=1 → the single cluster IS the corpus, so the greedy
    # result is exact: the lowest id of each near-copy group survives
    global_out = semantic_dedup(emb, threshold=0.98, n_clusters=1).collect()
    assert sorted(r.id for r in global_out if r.is_kept) == [0, 4, 8, 12, 16, 20]
    assert all(
        r.dup_of == (r.id // 4) * 4 for r in global_out if not r.is_kept
    )

    # clustered run: assert the operator's INVARIANTS, not a specific
    # cluster layout (k-means may split a group — the documented
    # recall boundary)
    out = semantic_dedup(emb, threshold=0.98, n_clusters=6).collect()
    kept = {r.id for r in out if r.is_kept}
    by_id = {r.id: r for r in out}
    vecs = {i: np.asarray(v) / np.linalg.norm(v) for i, v in rows}
    for r in out:
        if r.is_kept:
            continue
        shadow = by_id[r.dup_of]
        # soundness: the shadowing vector is kept, lower-id, in the
        # same cluster, and genuinely >= threshold
        assert shadow.is_kept and shadow.id < r.id
        assert shadow.cluster_id == r.cluster_id
        assert float(vecs[r.id] @ vecs[r.dup_of]) >= 0.98 - 1e-9
    # maximality: no two kept ids in one cluster within threshold
    from itertools import combinations

    for a, b in combinations(sorted(kept), 2):
        if by_id[a].cluster_id == by_id[b].cluster_id:
            assert float(vecs[a] @ vecs[b]) < 0.98
    # deterministic under repartitioning
    again = semantic_dedup(emb.repartition(7), threshold=0.98, n_clusters=6).collect()
    assert {r.id for r in again if r.is_kept} == kept
    # measured recall vs the exact all-pairs baseline on this
    # clusterable data (deterministic seed → fixed value)
    exact_pairs = {
        (r.id_a, r.id_b) for r in all_pairs_cosine(emb, threshold=0.98).collect()
    }
    covered = sum(1 for a, b in exact_pairs if not (a in kept and b in kept))
    assert covered / len(exact_pairs) >= 0.8


def test_ivf_index_tombstone_delete_equals_rebuild_without(spark, tmp_path):
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        ivf_build_index,
        ivf_delete_index,
        ivf_search_index,
    )
    from etl_football_analytics_pipeline_spark.sources.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = f"{tmp_path}/ivf_idx"
    ivf_build_index(emb, idx, "vec_id", "embedding", n_lists=8, seed=7)
    before = ivf_search_index(spark, idx, queries, k=5, nprobe=3).collect()
    doomed_ids = sorted({r.neighbor_id for r in before})[:4]
    ivf_delete_index(
        spark, idx,
        spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long"),
    )
    after = sorted(map(tuple, ivf_search_index(spark, idx, queries, k=5, nprobe=3).collect()))
    assert not any(t[1] in doomed_ids for t in after)
    # identical to an index built without the doomed vectors (same
    # quantizer: reuse the FIRST index's stored centroids so list
    # assignment is unchanged)
    import numpy as np

    from etl_football_analytics_pipeline_spark.operators.similarity import (
        stored_centroids,
    )

    cents = stored_centroids(spark, idx)
    idx2 = f"{tmp_path}/ivf_idx2"
    ivf_build_index(
        emb.filter(~F.col("vec_id").isin([int(i) for i in doomed_ids])),
        idx2, "vec_id", "embedding", n_lists=8, centroids=np.asarray(cents),
    )
    want = sorted(map(tuple, ivf_search_index(spark, idx2, queries, k=5, nprobe=3).collect()))
    assert after == want
    # COMPACTION: rewrite the lists without the tombstoned vectors —
    # probes unchanged, tombstone dir gone, doomed vectors absent from
    # list storage, partitioned layout preserved
    import os

    from etl_football_analytics_pipeline_spark.operators.similarity import (
        ivf_compact_index,
    )

    ivf_compact_index(spark, idx)
    assert not os.path.isdir(f"{idx}/tombstones")
    assert (
        _read_rel(spark, f"{idx}/lists")
        .filter(F.col("vec_id").isin([int(i) for i in doomed_ids]))
        .count()
        == 0
    )
    compacted = sorted(
        map(tuple, ivf_search_index(spark, idx, queries, k=5, nprobe=3).collect())
    )
    assert compacted == want
    # the list_id partitioning survives the rewrite (probe pruning
    # depends on it) — inside the live manifest tree since r8
    from etl_football_analytics_pipeline_spark.manifest import resolved_dir

    assert any(
        d.startswith("list_id=")
        for d in os.listdir(resolved_dir(spark, f"{idx}/lists"))
    )


def test_ivf_pq_index_tombstone_delete_drops_neighbors(spark, tmp_path):
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        ivf_delete_index,
        ivf_pq_build_index,
        ivf_pq_search,
    )
    from etl_football_analytics_pipeline_spark.sources.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    idx = f"{tmp_path}/ivfpq_idx"
    ivf_pq_build_index(emb, idx, "vec_id", "embedding", n_lists=8, m=16, seed=3)
    before = ivf_pq_search(spark, idx, queries, k=5, nprobe=3).collect()
    doomed_ids = sorted({r.neighbor_id for r in before})[:3]
    ivf_delete_index(
        spark, idx, spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long")
    )
    after = ivf_pq_search(spark, idx, queries, k=5, nprobe=3).collect()
    assert after, "probe returned nothing after delete"
    assert not any(r.neighbor_id in doomed_ids for r in after)


def test_empty_query_sets_return_empty_frames(spark, tmp_path):
    """Empty query sets return typed empty frames (the contract the PQ
    paths already had) instead of crashing np.stack on the driver."""
    from etl_football_analytics_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_build_index,
        ivf_search_index,
    )
    from etl_football_analytics_pipeline_spark.sources.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    none = emb.filter("vec_id < 0")
    out = brute_force_topk(emb, none)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    idx = f"{tmp_path}/ivf_empty"
    ivf_build_index(emb, idx, n_lists=8)
    out2 = ivf_search_index(spark, idx, none)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_ivf_nprobe_exceeding_lists_is_clamped(spark):
    """nprobe > trained centroid count must clamp instead of crashing
    the executor kernel with mismatched column lengths."""
    from etl_football_analytics_pipeline_spark.operators.similarity import ivf_topk
    from etl_football_analytics_pipeline_spark.sources.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 3")
    out = ivf_topk(emb, queries, k=3, n_lists=2, nprobe=8)
    assert out.count() == 9  # 3 queries x k
