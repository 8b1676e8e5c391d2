"""End-to-end right-to-be-forgotten: one `forget_keys` call makes a
document unreachable via the table scan, time-travel-latest, and every
registered index probe (BM25, minhash near-dup, IVF vector search) —
and re-running the call is a no-op (every step idempotent)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_football_analytics_pipeline_spark.operators.dedup import (
    minhash_index_build,
    minhash_index_probe,
)
from etl_football_analytics_pipeline_spark.operators.similarity import (
    ivf_build_index,
    ivf_search_index,
)
from etl_football_analytics_pipeline_spark.operators.text import (
    bm25_build_index,
    bm25_search_index,
)
from etl_football_analytics_pipeline_spark.pipeline.forget import (
    IndexRef,
    forget_keys,
)
from etl_football_analytics_pipeline_spark.manifest import read_relation
from etl_football_analytics_pipeline_spark.sources.registry import load_table
from etl_football_analytics_pipeline_spark.sources.versioned import (
    commit_version,
    read_latest,
    read_version,
)

SF = "/root/testdata/sf0.001"


TID = 100_000  # the sentinel to-be-forgotten id, unique in both tables


@pytest.fixture(scope="module")
def corpus(spark):
    """A real-corpus slice plus one sentinel doc (unique term, cloned
    embedding) whose reachability through every index is guaranteed
    pre-delete — common-vocabulary docs can miss a top-10."""
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 120)
    base = docs.orderBy("doc_id").first()
    sent_doc = docs.sparkSession.createDataFrame(
        [(TID, base.text + " zzzqforgetme zzzqforgetme")],
        "doc_id long, text string",
    )
    sent_emb = emb.filter(F.col("vec_id") == base.doc_id).select(
        F.lit(TID).alias("vec_id"), "embedding"
    )
    return (
        docs.select("doc_id", "text").unionByName(sent_doc).localCheckpoint(),
        emb.select("vec_id", "embedding")
        .unionByName(sent_emb)
        .localCheckpoint(),
    )


def _bm25_hits(spark, idx, terms):
    return sorted(
        map(tuple, bm25_search_index(spark, idx, {"q": terms}, k=10).collect())
    )


def test_forget_keys_erases_everywhere_and_is_idempotent(
    spark, corpus, tmp_path
):
    docs, emb = corpus
    tid = TID
    terms = ["zzzqforgetme"]

    tbl = str(tmp_path / "tbl")
    v1 = commit_version(docs, tbl)
    bm25_dir = str(tmp_path / "bm25")
    bm25_build_index(docs, "doc_id", "text", bm25_dir)
    mh_dir = str(tmp_path / "mh")
    minhash_index_build(docs, mh_dir, id_col="doc_id", text_col="text")
    ivf_dir = str(tmp_path / "ivf")
    ivf_build_index(emb, ivf_dir, n_lists=4, seed=42)

    # the doc is reachable everywhere pre-delete
    assert read_latest(spark, tbl).filter(F.col("doc_id") == tid).count() == 1
    assert any(r[1] == tid for r in _bm25_hits(spark, bm25_dir, terms))
    probe = docs.filter(F.col("doc_id") == tid).select(
        F.lit(999_999).alias("doc_id"), "text"
    )
    mh_pre = minhash_index_probe(spark, mh_dir, probe, threshold=0.9)
    assert any(r[1] == tid for r in mh_pre.collect())
    qvec = emb.filter(F.col("vec_id") == tid).select(
        F.lit(-1).alias("vec_id"), "embedding"
    )
    ivf_pre = ivf_search_index(spark, ivf_dir, qvec, k=3, nprobe=4)
    assert any(r.neighbor_id == tid for r in ivf_pre.collect())

    # rebuild-without referee for BM25, before the delete mutates state
    ref_dir = str(tmp_path / "bm25_ref")
    bm25_build_index(
        docs.filter(F.col("doc_id") != tid), "doc_id", "text", ref_dir
    )
    want = _bm25_hits(spark, ref_dir, terms)

    doomed = spark.createDataFrame([(tid,)], "doc_id long")
    indexes = [
        IndexRef("bm25", bm25_dir),
        IndexRef("minhash", mh_dir),
        IndexRef("ivf", ivf_dir, "vec_id"),
    ]
    v2 = forget_keys(spark, tbl, doomed, ["doc_id"], indexes)
    assert v2 == v1 + 1

    def assert_unreachable():
        assert (
            read_latest(spark, tbl).filter(F.col("doc_id") == tid).count()
            == 0
        )
        # delete ≡ rebuild-without, scores and all
        assert _bm25_hits(spark, bm25_dir, terms) == want
        assert not [
            r
            for r in minhash_index_probe(
                spark, mh_dir, probe, threshold=0.9
            ).collect()
            if r[1] == tid
        ]
        assert not [
            r
            for r in ivf_search_index(
                spark, ivf_dir, qvec, k=3, nprobe=4
            ).collect()
            if r.neighbor_id == tid
        ]
        # the pre-delete snapshot stays auditable until vacuum
        assert (
            read_version(spark, tbl, v1)
            .filter(F.col("doc_id") == tid)
            .count()
            == 1
        )

    assert_unreachable()

    # re-running the same erasure is safe: tombstones dedupe, the BM25
    # stats compensation sees no live sidecar row (zero row), and the
    # table commit re-removes nothing
    v3 = forget_keys(spark, tbl, doomed, ["doc_id"], indexes)
    assert v3 == v2 + 1
    assert_unreachable()


def test_forget_keys_hard_erases_storage(spark, corpus, tmp_path):
    """forget_keys_hard must remove the rows from STORAGE, not just
    from probe results: no historical table version, no index relation
    row, no tombstone dir survives — and every probe still answers
    exactly like an index rebuilt without the doc."""
    import os

    from etl_football_analytics_pipeline_spark.pipeline.forget import (
        forget_keys_hard,
    )

    docs, emb = corpus
    tid = TID
    terms = ["zzzqforgetme"]

    tbl = str(tmp_path / "tbl")
    commit_version(docs, tbl)
    bm25_dir = str(tmp_path / "bm25")
    bm25_build_index(docs, "doc_id", "text", bm25_dir)
    mh_dir = str(tmp_path / "mh")
    minhash_index_build(docs, mh_dir, id_col="doc_id", text_col="text")
    ivf_dir = str(tmp_path / "ivf")
    ivf_build_index(emb, ivf_dir, n_lists=4, seed=42)

    ref_dir = str(tmp_path / "bm25_ref")
    bm25_build_index(
        docs.filter(F.col("doc_id") != tid), "doc_id", "text", ref_dir
    )
    want = _bm25_hits(spark, ref_dir, terms)

    doomed = spark.createDataFrame([(tid,)], "doc_id long")
    indexes = [
        IndexRef("bm25", bm25_dir),
        IndexRef("minhash", mh_dir),
        IndexRef("ivf", ivf_dir, "vec_id"),
    ]
    # forge a CRASHED compaction attempt on one index relation: a tree
    # written at the next version, no marker (died pre-publish), still
    # holding the doomed doc. The commit-path vacuum spares it (it sits
    # where an in-flight concurrent writer's tree would), so hard
    # erasure must finish with the explicit full-GC sweep (r9) — the
    # raw parquet walk below proves the residue is gone.
    from etl_football_analytics_pipeline_spark.manifest import (
        manifest_versions,
        tree_dir,
    )

    docs_rel = f"{mh_dir}/docs"
    top_v = manifest_versions(spark, docs_rel)[-1][0]
    orphan = tree_dir(docs_rel, top_v + 1, "deadbeef0000")
    read_relation(spark, docs_rel).write.parquet(orphan)

    v = forget_keys_hard(spark, tbl, doomed, ["doc_id"], indexes)
    assert not os.path.isdir(orphan)  # crash residue swept

    # probes: compaction must not change any answer
    assert _bm25_hits(spark, bm25_dir, terms) == want
    probe = docs.filter(F.col("doc_id") == tid).select(
        F.lit(999_999).alias("doc_id"), "text"
    )
    assert not [
        r
        for r in minhash_index_probe(
            spark, mh_dir, probe, threshold=0.9
        ).collect()
        if r[1] == tid
    ]
    qvec = emb.filter(F.col("vec_id") == tid).select(
        F.lit(-1).alias("vec_id"), "embedding"
    )
    assert not [
        r
        for r in ivf_search_index(spark, ivf_dir, qvec, k=3, nprobe=4).collect()
        if r.neighbor_id == tid
    ]

    # storage: tombstone dirs gone, no relation row carries the doc
    for d in (bm25_dir, mh_dir, ivf_dir):
        assert not os.path.isdir(os.path.join(d, "tombstones")), d
    assert (
        read_relation(spark, f"{bm25_dir}/postings")
        .filter(F.col("term") == terms[0])
        .count()
        == 0
    )
    assert (
        read_relation(spark, f"{bm25_dir}/docs")
        .filter(F.col("__id") == tid)
        .count()
        == 0
    )
    for rel, col in ((f"{mh_dir}/docs", "doc_id"), (f"{mh_dir}/bands", "__id")):
        assert read_relation(spark, rel).filter(F.col(col) == tid).count() == 0
    assert (
        read_relation(spark, f"{ivf_dir}/lists")
        .filter(F.col("vec_id") == tid)
        .count()
        == 0
    )
    # RAW-STORAGE proof, independent of manifest resolution: walk every
    # parquet file anywhere under each index dir (retired trees, orphan
    # trees, legacy roots included — nothing is exempt) and assert the
    # forgotten id appears in NO file. This is the "rows exist nowhere
    # on disk" contract the manifest retention's verified deletes back.
    import glob

    id_cols = {bm25_dir: "__id", mh_dir: None, ivf_dir: "vec_id"}
    for d, col in id_cols.items():
        for f in glob.glob(f"{d}/**/*.parquet", recursive=True):
            if os.path.basename(f)[0] in "._":
                continue
            pdf = spark.read.parquet(f)
            cols = (
                [col]
                if col is not None
                else [c for c in ("doc_id", "__id") if c in pdf.columns]
            )
            for c in cols:
                if c in pdf.columns:
                    assert (
                        pdf.filter(F.col(c) == tid).count() == 0
                    ), f"forgotten id survives in {f} ({c})"
    # table: only the post-delete snapshot remains on disk
    vdirs = [d for d in os.listdir(tbl) if d.startswith("v")]
    assert [int(d[1:]) for d in vdirs] == [v]
    assert read_latest(spark, tbl).filter(F.col("doc_id") == tid).count() == 0

    # hard-erasing again is a no-op that stays consistent
    v2 = forget_keys_hard(spark, tbl, doomed, ["doc_id"], indexes)
    assert v2 == v + 1
    assert _bm25_hits(spark, bm25_dir, terms) == want


def test_forget_keys_rejects_composite_keys_with_indexes(spark, tmp_path):
    df = spark.createDataFrame([(1, 2, "x")], "a long, b long, v string")
    tbl = str(tmp_path / "t")
    commit_version(df, tbl)
    with pytest.raises(ValueError, match="single-column key"):
        forget_keys(
            spark, tbl, df, ["a", "b"], [IndexRef("bm25", str(tmp_path))]
        )
    # composite keys are fine table-only
    v = forget_keys(spark, tbl, df.filter("a = 1"), ["a", "b"])
    assert v == 2
    assert read_latest(spark, tbl).count() == 0


def test_forget_keys_hard_on_remote_scheme(spark, tmp_path):
    """End-to-end GDPR over scheme'd paths (r8): the versioned table
    commits via remote markers, every index builds/compacts through
    manifest-pointer replaces, and after forget_keys_hard the doomed
    doc's rows exist in NO parquet file anywhere under the local
    mirror of those URIs — the full hard-erasure contract on the code
    path an object store would take."""
    import glob
    import os

    from etl_football_analytics_pipeline_spark.pipeline.forget import (
        forget_keys_hard,
    )

    tid = 77_777
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") < 60
    ).select("doc_id", "text")
    sent = spark.createDataFrame(
        [(tid, "zzzqremoteforget unique sentinel text zzzqremoteforget")],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(sent).localCheckpoint()

    tbl = f"file://{tmp_path}/tbl"
    commit_version(corpus, tbl)
    bm25_dir = f"file://{tmp_path}/bm25"
    bm25_build_index(corpus, "doc_id", "text", bm25_dir)
    mh_dir = f"file://{tmp_path}/mh"
    minhash_index_build(corpus, mh_dir, id_col="doc_id", text_col="text")

    # reachable pre-delete
    assert any(
        r[1] == tid
        for r in bm25_search_index(
            spark, bm25_dir, {"q": ["zzzqremoteforget"]}, k=10
        ).collect()
    )

    doomed = spark.createDataFrame([(tid,)], "doc_id long")
    indexes = [IndexRef("bm25", bm25_dir), IndexRef("minhash", mh_dir)]
    forget_keys_hard(spark, tbl, doomed, ["doc_id"], indexes)

    # unreachable via every probe
    assert not any(
        r[1] == tid
        for r in bm25_search_index(
            spark, bm25_dir, {"q": ["zzzqremoteforget"]}, k=10
        ).collect()
    )
    assert read_latest(spark, tbl).filter(F.col("doc_id") == tid).count() == 0

    # raw storage walk over the LOCAL mirrors of the URIs: no file
    # anywhere (trees, retired versions, tombstones) still carries the
    # doc — the hard-erasure contract
    for d, col in (
        (f"{tmp_path}/tbl", "doc_id"),
        (f"{tmp_path}/bm25", "__id"),
        (f"{tmp_path}/mh", "doc_id"),
    ):
        for f in glob.glob(f"{d}/**/*.parquet", recursive=True):
            if os.path.basename(f)[0] in "._":
                continue
            pdf = spark.read.parquet(f)
            for c in {col, "doc_id", "__id"} & set(pdf.columns):
                assert (
                    pdf.filter(F.col(c) == tid).count() == 0
                ), f"forgotten id survives in {f} ({c})"
