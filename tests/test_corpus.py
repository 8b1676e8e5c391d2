"""Corpus-assembly operators: deterministic splits, decontamination,
sequence packing (operators/corpus.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.corpus import (
    DEFAULT_SPLITS,
    _hex_threshold,
    deterministic_split,
    hash_sample,
    mixture_sample,
    ngram_containment,
    pack_sequences,
    whitespace_token_counts,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_split_matches_reference_md5_and_is_stable(spark, ids_df):
    """Every row's split equals the python-side md5 reference, so the
    assignment is engine- and run-independent (the held-out contract)."""
    out = {r["doc_id"]: r["split"] for r in deterministic_split(ids_df, "doc_id").collect()}
    for doc_id, split in out.items():
        first = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        expected = next(name for name, lo, hi in DEFAULT_SPLITS if lo <= first <= hi)
        assert split == expected, doc_id
    # repartitioning must not move any document between splits
    again = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(ids_df.repartition(7), "doc_id").collect()
    }
    assert again == out


def test_split_is_shuffle_free(spark, ids_df):
    """The split is a pure map over the scan — no Exchange anywhere."""
    df = deterministic_split(ids_df, "doc_id")
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained


def test_split_fractions_are_hex_bucket_shaped(spark, ids_df):
    """12/2/2 hex buckets → ~75/12.5/12.5; md5 uniformity keeps each
    bucket within a loose tolerance at n=2000."""
    counts = {
        r["split"]: r["count"]
        for r in deterministic_split(ids_df, "doc_id").groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 2000 and set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.75) < 0.05
    assert abs(counts["val"] / n - 0.125) < 0.04
    assert abs(counts["test"] / n - 0.125) < 0.04


def test_hash_sample_matches_reference_md5(spark, ids_df):
    """Membership equals the python md5 reference at every fraction,
    and is invariant under repartitioning — the property DataFrame
    .sample (seeded over the partitioning) does NOT have."""
    for fraction in (0.25, 0.5):
        thr = _hex_threshold(fraction)
        expected = {
            i for i in range(2000)
            if hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8] < thr
        }
        got = {r["doc_id"] for r in hash_sample(ids_df, "doc_id", fraction).collect()}
        assert got == expected
        again = {
            r["doc_id"]
            for r in hash_sample(ids_df.repartition(11), "doc_id", fraction).collect()
        }
        assert again == expected
        assert abs(len(got) / 2000 - fraction) < 0.05
    assert hash_sample(ids_df, "doc_id", 1.0).count() == 2000
    assert hash_sample(ids_df, "doc_id", 0.0).count() == 0


def test_hash_sample_salts_draw_independent_samples(spark, ids_df):
    a = {r["doc_id"] for r in hash_sample(ids_df, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(ids_df, "doc_id", 0.5, salt="b").collect()}
    assert a != b
    # independent halves overlap in ~a quarter of the corpus
    assert abs(len(a & b) / 2000 - 0.25) < 0.06


def test_mixture_sample_per_domain_rates(spark):
    """Per-domain fractions apply to their domain only; unlisted
    domains get the default; rate 1.0 keeps every row ('g' sentinel
    beats the 9-digit-hex edge); membership equals uniform
    hash_sample at the same salt (the mix only picks the threshold)."""
    rows = [(i, f"d{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = mixture_sample(
        df, "doc_id", "domain", {"d0": 1.0, "d1": 0.5}, default_fraction=0.25
    )
    counts = {r["domain"]: r["count"] for r in out.groupBy("domain").count().collect()}
    assert counts["d0"] == 1000
    assert abs(counts["d1"] / 1000 - 0.5) < 0.1
    for d in ("d2", "d3"):
        assert abs(counts[d] / 1000 - 0.25) < 0.1
    kept_d1 = {r["doc_id"] for r in out.filter(F.col("domain") == "d1").collect()}
    uniform = {
        r["doc_id"]
        for r in hash_sample(df.filter(F.col("domain") == "d1"), "doc_id", 0.5).collect()
    }
    assert kept_d1 == uniform


def test_sampling_is_shuffle_free(spark, ids_df):
    df = hash_sample(ids_df, "doc_id", 0.5)
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_ngram_containment_exact_fractions(spark):
    """Hand-built corpus with known trigram overlap: identical doc →
    1.0, disjoint doc → 0.0, half-shared doc → the exact fraction."""
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "p q r s")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (10, "a b c d e"),      # grams {abc,bcd,cde} all in train → 1.0
            (11, "x y z w v"),      # disjoint → 0.0
            (12, "a b c z z z"),    # {abc} in train, {bcz,czz,zzz} not → 1/4
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_matched"], r["containment"])
        for r in ngram_containment(train, test, "doc_id", "text", n=3).collect()
    }
    assert out[10] == (3, 3, 1.0)
    assert out[11] == (3, 0, 0.0)
    assert out[12] == (4, 1, 0.25)


def test_ngram_containment_short_docs_absent(spark):
    """Docs shorter than n words have no grams and no defined
    containment — they must not appear (same contract as the jaccard
    family)."""
    train = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    test = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    assert ngram_containment(train, test, "doc_id", "text", n=3).count() == 0


def test_pack_sequences_matches_serial_reference(spark):
    """Packing equals the obvious serial concat-and-chunk walk, and is
    invariant under repartitioning (global order comes from the id,
    not the physical layout)."""
    rows = [(i, f"doc {i} " + "tok " * (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = whitespace_token_counts(df, "doc_id", "text")
    expected = {}
    pos = 0
    for doc_id, n in sorted((r["doc_id"], r["n_tokens"]) for r in toks.collect()):
        expected[doc_id] = (n, pos // 64, pos % 64)
        pos += n
    for shuffled in (toks, toks.repartition(13)):
        got = {
            r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
            for r in pack_sequences(shuffled, "doc_id", "n_tokens", seq_len=64).collect()
        }
        assert got == expected


def test_pack_sequences_no_single_partition_window(spark):
    """The global cumsum must not funnel through one partition: the
    executed plan's Window sorts are partitioned by the value bucket,
    never SinglePartition."""
    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n_tokens")
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", seq_len=512)
    packed.count()
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"), F.lit(5).alias("n_tokens"))
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tokens", seq_len=0)


def test_pack_sequences_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("doc_id"), F.lit(1).alias("n_tokens"))
    out = pack_sequences(df, "doc_id", "n_tokens", seq_len=8)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "seq_id", "seq_offset",
    ]


def test_pack_sequences_string_ids_fallback(spark):
    """Non-numeric ids take the repartitionByRange fallback and still
    match the serial reference in lexicographic id order."""
    rows = [(f"doc-{i:04d}", (i % 5) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    expected = {}
    pos = 0
    for doc_id, n in sorted(rows):
        expected[doc_id] = (n, pos // 32, pos % 32)
        pos += n
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df.repartition(7), "doc_id", "n_tokens", seq_len=32).collect()
    }
    assert got == expected


# -- randomized packing / sampling properties (hypothesis) --------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    token_rows = st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 40)),
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @given(rows=token_rows, seq_len=st.integers(1, 64))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_pack_sequences_properties(spark, rows, seq_len):
        """Invariants for ANY corpus: offsets within [0, seq_len),
        positions equal the serial cumsum in id order, and sequence
        ids are a non-decreasing step function of id order."""
        from etl_football_analytics_pipeline_spark.operators.corpus import (
            pack_sequences,
        )

        schema = "doc_id long, n_tokens long"
        df = (
            spark.createDataFrame(sorted(rows), schema)
            if rows
            else spark.createDataFrame([], schema)
        )
        got = {
            r["doc_id"]: (r["seq_id"], r["seq_offset"])
            for r in pack_sequences(df, "doc_id", "n_tokens", seq_len=seq_len).collect()
        }
        pos = 0
        prev_seq = 0
        for doc_id, n in sorted(rows):
            seq_id, seq_offset = got[doc_id]
            assert 0 <= seq_offset < seq_len
            assert (seq_id, seq_offset) == (pos // seq_len, pos % seq_len), doc_id
            assert seq_id >= prev_seq
            prev_seq = seq_id
            pos += n
        assert len(got) == len(rows)

    @given(
        ids=st.lists(st.integers(0, 10_000), max_size=60, unique=True),
        fraction=st.floats(0.0, 1.0),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_hash_sample_properties(spark, ids, fraction):
        """Membership matches the md5 reference exactly for ANY id set
        and fraction, and sampling twice at the same (salt, fraction)
        is identical (determinism, not statistics)."""
        import hashlib

        from etl_football_analytics_pipeline_spark.operators.corpus import (
            _hex_threshold,
            hash_sample,
        )

        df = (
            spark.createDataFrame([(i,) for i in sorted(ids)], "doc_id long")
            if ids
            else spark.createDataFrame([], "doc_id long")
        )
        thr = _hex_threshold(fraction)
        expected = {
            i for i in ids if hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8] < thr
        }
        got = {r["doc_id"] for r in hash_sample(df, "doc_id", fraction).collect()}
        assert got == expected
        again = {r["doc_id"] for r in hash_sample(df, "doc_id", fraction).collect()}
        assert again == got


def test_split_rejects_overlapping_ranges(spark, ids_df):
    with pytest.raises(ValueError, match="overlap"):
        deterministic_split(
            ids_df, "doc_id", splits=(("a", "0", "8"), ("b", "8", "f"))
        )


def test_whitespace_token_counts_null_and_empty_are_zero(spark):
    """NULL and empty text bill 0 tokens: bare size(split(...)) gives
    1 for '' and -1 for NULL — a negative count walks pack_sequences'
    cumulative position backwards."""
    from etl_football_analytics_pipeline_spark.operators.corpus import (
        whitespace_token_counts,
    )

    df = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens for r in whitespace_token_counts(df, "doc_id", "text").collect()}
    assert got == {1: 2, 2: 0, 3: 0, 4: 0}


def test_hash_sample_fraction_just_below_one_keeps_everything(spark):
    """Fractions within 2^-33 of 1.0 round to the full 16^8 keyspace:
    the threshold must stay the keep-all sentinel, not a 9-digit hex
    string that lexicographically keeps only keys starting '0'."""
    from etl_football_analytics_pipeline_spark.operators.corpus import (
        _hex_threshold,
        hash_sample,
    )

    assert _hex_threshold(1.0 - 2**-40) == "g"
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    assert hash_sample(df, "doc_id", 1.0 - 2**-40).count() == 200


def test_quality_gate_portable_passthrough(spark):
    """A portable-trained model must gate with portable features —
    the gate exposes the same hasher knobs as training/scoring."""
    from etl_football_analytics_pipeline_spark.operators.classifier import (
        quality_gate,
        quality_score,
        quality_train,
    )

    rows = [(i, "good clean text here" if i % 2 == 0 else "zz xx qq ww", i % 2 == 0)
            for i in range(40)]
    df = spark.createDataFrame(
        [(i, t, int(l)) for i, t, l in rows], "doc_id long, text string, label long"
    )
    w = quality_train(df, "text", "label", dim=256, iters=10, portable=True)
    scores = {
        r.doc_id: r.quality_prob
        for r in quality_score(df, w, "doc_id", "text", dim=256, portable=True).collect()
    }
    thresh = 0.5
    kept = quality_gate(df, w, "doc_id", "text", threshold=thresh, dim=256, portable=True)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        i for i, p in scores.items() if p >= thresh
    )
