"""Text-operator invariants not covered by the SQL oracle (the
xxhash64 shard key is Spark-specific) plus determinism checks."""

from __future__ import annotations

from etl_football_analytics_pipeline_spark.manifest import read_relation as _read_rel

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.text import (
    fingerprints,
    language_id,
    quality_scores,
)
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_fingerprints_deterministic_and_aligned(spark, docs):
    """xxh64 must be stable under repartitioning, and md5/xxh64 must
    partition the corpus identically (same groups of identical docs)."""
    a = {r.doc_id: (r.md5_fingerprint, r.xxh64_fingerprint)
         for r in fingerprints(docs, "doc_id", "text").collect()}
    b = {r.doc_id: (r.md5_fingerprint, r.xxh64_fingerprint)
         for r in fingerprints(docs.repartition(7), "doc_id", "text").collect()}
    assert a == b
    md5_to_xxh = {}
    for md5, xxh in a.values():
        md5_to_xxh.setdefault(md5, set()).add(xxh)
    assert all(len(s) == 1 for s in md5_to_xxh.values())


def test_quality_scores_bounded(spark, docs):
    rows = quality_scores(docs, "doc_id", "text").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.n_words >= 0 and r.n_chars_measured >= 0


def test_language_id_covers_known_langs(spark, docs):
    preds = {r.predicted_lang for r in language_id(docs, "doc_id", "text").collect()}
    assert preds <= {"de", "en", "es", "fr", "und"}


def test_strip_common_lines(spark):
    from etl_football_analytics_pipeline_spark.operators.text import (
        strip_common_lines,
    )

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}\nreal content one\nmore real text"),
            (2, f"{boiler}\nother content"),
            (3, f"{boiler}\nthird body\n{boiler}"),  # repeats within doc
            (4, boiler),                              # only boilerplate
            (5, "fully unique document"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.text_cleaned
        for r in strip_common_lines(docs, "doc_id", "text", max_df=2).collect()
    }
    assert out[1] == "real content one\nmore real text"
    assert out[2] == "other content"
    assert out[3] == "third body"
    assert out[4] == ""  # fully-boilerplate doc survives as empty
    assert out[5] == "fully unique document"
    # within-doc repeats count once: a line in only 2 DOCS stays even
    # if one doc repeats it 5 times
    docs2 = spark.createDataFrame(
        [(1, "x\nx\nx\nx\nx"), (2, "x\ny")], "doc_id int, text string"
    )
    out2 = {
        r.doc_id: r.text_cleaned
        for r in strip_common_lines(docs2, "doc_id", "text", max_df=2).collect()
    }
    assert out2[1] == "x\nx\nx\nx\nx" and out2[2] == "x\ny"


def test_strip_common_lines_plan_has_no_corpus_broadcast(spark):
    from etl_football_analytics_pipeline_spark.operators.text import (
        strip_common_lines,
    )

    docs = spark.createDataFrame([(1, "a\nb")], "doc_id int, text string")
    plan = (
        strip_common_lines(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Substring-level exact dedup (repeated-span detection / removal)
# ---------------------------------------------------------------------------

def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_spans_keep_first_and_maximal(spark):
    """A shared passage longer than min_tokens merges into ONE maximal
    span, flagged only on the later copy (keep_first); the stripped
    corpus keeps exactly the first copy."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        duplicated_spans,
        strip_duplicated_spans,
    )

    shared = " ".join(f"w{i}" for i in range(12))
    df = _mk_docs(
        spark,
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, "delta " + shared + " epsilon zeta"),
            (3, "unrelated text with no duplication at all in this one"),
        ],
    )
    spans = duplicated_spans(df, "doc_id", "text", min_tokens=5).collect()
    assert len(spans) == 1
    s = spans[0]
    # doc 2 tokens: delta(0) w0..w11(1..12) epsilon zeta -> one maximal span
    assert (s.doc_id, s.span_start, s.span_end, s.span_tokens) == (2, 1, 12, 12)
    out = {
        r.doc_id: r.text_cleaned
        for r in strip_duplicated_spans(df, "doc_id", "text", min_tokens=5).collect()
    }
    assert out[1] == "alpha beta " + shared + " gamma"
    assert out[2] == "delta epsilon zeta"
    assert out[3] == "unrelated text with no duplication at all in this one"


def test_duplicated_spans_below_threshold_not_flagged(spark):
    from etl_football_analytics_pipeline_spark.operators.text import duplicated_spans

    shared = "a b c d"  # 4 tokens < min_tokens=5
    df = _mk_docs(spark, [(1, "x " + shared + " y"), (2, "p " + shared + " q r")])
    assert duplicated_spans(df, "doc_id", "text", min_tokens=5).count() == 0


def test_duplicated_spans_scope_global_vs_cross_doc(spark):
    """Within-doc repetition trips scope='global' but not
    'cross_doc' (that axis belongs to repetition_signals)."""
    from etl_football_analytics_pipeline_spark.operators.text import duplicated_spans

    phrase = " ".join(f"t{i}" for i in range(6))
    df = _mk_docs(spark, [(1, phrase + " mid " + phrase)])
    assert duplicated_spans(df, "doc_id", "text", min_tokens=6).count() == 0
    got = duplicated_spans(
        df, "doc_id", "text", min_tokens=6, scope="global"
    ).collect()
    assert len(got) == 1 and got[0].doc_id == 1
    # keep_first spares the first occurrence: flagged span is the SECOND
    assert got[0].span_start == 7 and got[0].span_end == 12


def test_duplicated_spans_deterministic_under_repartition(spark):
    from etl_football_analytics_pipeline_spark.operators.text import duplicated_spans

    shared = " ".join(f"s{i}" for i in range(8))
    rows = [(i, f"doc{i} " + (shared if i % 3 == 0 else f"own text {i} only here")
             + f" tail{i}") for i in range(30)]
    df = _mk_docs(spark, rows)
    a = sorted(map(tuple, duplicated_spans(df, "doc_id", "text", 5).collect()))
    b = sorted(
        map(
            tuple,
            duplicated_spans(df.repartition(7, "doc_id"), "doc_id", "text", 5).collect(),
        )
    )
    assert a == b and len(a) > 0
    # keep_first: exactly one sharing doc (the lowest id, 0) is unflagged
    flagged = {t[0] for t in a}
    sharers = {i for i in range(30) if i % 3 == 0}
    assert flagged == sharers - {min(sharers)}


def test_duplicated_spans_rejects_bad_args(spark):
    import pytest

    from etl_football_analytics_pipeline_spark.operators.text import duplicated_spans

    df = _mk_docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        duplicated_spans(df, "doc_id", "text", min_tokens=1)
    with pytest.raises(ValueError):
        duplicated_spans(df, "doc_id", "text", scope="nope")


# ---------------------------------------------------------------------------
# n-gram LM quality gate (CCNet/KenLM-style perplexity filter)
# ---------------------------------------------------------------------------

def test_ngram_lm_exact_and_ordering(spark):
    """Scores match hand-computed add-alpha bigram log-probs exactly;
    in-distribution text outscores OOV text and degenerate repetition."""
    import math

    from etl_football_analytics_pipeline_spark.operators.text import (
        ngram_lm_score,
        ngram_lm_train,
    )

    train = _mk_docs(
        spark,
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "the cat ran"),
        ],
    )
    lm = ngram_lm_train(train, "text", n=2).cache()
    model = {(r.context, r.token): (r.cnt, r.ctx_total) for r in lm.collect()}
    assert model[("<s>", "the")] == (3, 3)
    assert model[("the", "cat")] == (2, 5)
    test = _mk_docs(
        spark,
        [
            (10, "the cat sat"),
            (11, "zq xv qqq unknown words entirely"),
            (12, "the the the"),
        ],
    )
    got = {
        r.doc_id: r
        for r in ngram_lm_score(test, lm, "doc_id", "text", n=2).collect()
    }
    V = len({t for (_, t) in model})
    a = 0.1
    totals = {c: t for (c, _), (_, t) in model.items()}

    def lp(c, t):
        cnt = model.get((c, t), (0, 0))[0]
        tot = totals.get(c, 0)
        return math.log((cnt + a) / (tot + a * V))

    want = (lp("<s>", "the") + lp("the", "cat") + lp("cat", "sat")) / 3
    assert abs(got[10].lm_logprob - want) < 1e-12
    assert got[10].n_scored == 3
    assert got[10].lm_logprob > got[11].lm_logprob
    assert got[10].lm_logprob > got[12].lm_logprob


def test_ngram_lm_unigram_and_pruning(spark):
    """n=1 trains a unigram model (empty context); min_count prunes
    rows but totals stay unbiased (taken before the prune)."""
    from etl_football_analytics_pipeline_spark.operators.text import ngram_lm_train

    train = _mk_docs(spark, [(1, "a a a b"), (2, "a b c")])
    uni = {r.token: (r.cnt, r.ctx_total) for r in
           ngram_lm_train(train, "text", n=1).collect()}
    assert uni == {"a": (4, 7), "b": (2, 7), "c": (1, 7)}
    pruned = {r.token: (r.cnt, r.ctx_total) for r in
              ngram_lm_train(train, "text", n=1, min_count=2).collect()}
    assert pruned == {"a": (4, 7), "b": (2, 7)}  # totals still include 'c'


def test_ngram_lm_deterministic_under_repartition(spark):
    from etl_football_analytics_pipeline_spark.operators.text import (
        ngram_lm_score,
        ngram_lm_train,
    )

    rows = [(i, f"common words here plus token{i % 5} again") for i in range(40)]
    docs = _mk_docs(spark, rows)

    def run(d, lm_src):
        out = ngram_lm_score(d, ngram_lm_train(lm_src, "text", n=2),
                             "doc_id", "text", n=2).collect()
        # mean log-prob is a float average — partial-sum order moves
        # the last ulp with partitioning, so compare at the rounded
        # precision every consumer (the registered suite, the
        # curation gate) actually uses
        return sorted((r.doc_id, r.n_scored, round(r.lm_logprob, 9)) for r in out)

    a = run(docs, docs)
    b = run(docs.repartition(7), docs.repartition(5))
    assert a == b


# -- randomized span-dedup equality vs brute force (hypothesis) ---------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


def _brute_spans(texts, k, scope, keep_first):
    """Reference implementation: enumerate every k-token window,
    find duplicated window contents, merge covered positions into
    maximal spans per doc."""
    wins = []  # (doc, start, content)
    for doc, text in enumerate(texts):
        toks = text.strip().split()
        for i in range(max(len(toks) - k + 1, 0)):
            wins.append((doc, i, tuple(toks[i : i + k])))
    by_content = {}
    for doc, start, content in wins:
        by_content.setdefault(content, []).append((doc, start))
    covered = set()
    for content, occs in by_content.items():
        docs_set = {d for d, _ in occs}
        dup = len(docs_set) >= 2 if scope == "cross_doc" else len(occs) >= 2
        if not dup:
            continue
        first = min(occs)
        for occ in occs:
            if keep_first and occ == first:
                continue
            covered.add(occ)
    spans = []
    by_doc = {}
    for doc, start in covered:
        by_doc.setdefault(doc, []).append(start)
    for doc, starts in by_doc.items():
        starts.sort()
        cur_s, cur_e = starts[0], starts[0] + k - 1
        for s in starts[1:]:
            if s <= cur_e + 1:
                cur_e = max(cur_e, s + k - 1)
            else:
                spans.append((doc, cur_s, cur_e, cur_e - cur_s + 1))
                cur_s, cur_e = s, s + k - 1
        spans.append((doc, cur_s, cur_e, cur_e - cur_s + 1))
    return sorted(spans)


if _HAS_HYPOTHESIS:
    _w = st.sampled_from(["aa", "bb", "cc", "dd"])
    _txt = st.lists(_w, min_size=0, max_size=10).map(" ".join)
    _docs_strat = st.lists(_txt, min_size=1, max_size=8)

    @given(
        texts=_docs_strat,
        k=st.sampled_from([2, 3]),
        scope=st.sampled_from(["cross_doc", "global"]),
        keep_first=st.booleans(),
    )
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_duplicated_spans_equal_brute_force(spark, texts, k, scope, keep_first):
        """The distributed span detector must agree with a brute-force
        reference on ANY corpus — tiny alphabet so windows collide
        hard, plus empty docs and within-doc repeats."""
        from etl_football_analytics_pipeline_spark.operators.text import (
            duplicated_spans,
        )

        df = _mk_docs(spark, list(enumerate(texts)))
        got = sorted(
            tuple(r)
            for r in duplicated_spans(
                df, "doc_id", "text", min_tokens=k, scope=scope, keep_first=keep_first
            ).collect()
        )
        assert got == _brute_spans(texts, k, scope, keep_first)


def test_span_ops_tolerate_null_and_preserve_lines(spark):
    """NULL text behaves like '' (no crash, no spans); the stripped
    rebuild preserves LINE structure — only intra-line spacing is
    normalized — so downstream line-based signals still work."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        duplicated_spans,
        strip_duplicated_spans,
    )

    shared = " ".join(f"q{i}" for i in range(6))
    df = spark.createDataFrame(
        [
            (1, f"first line here\n{shared}\nlast line"),
            (2, f"{shared}\nsecond doc tail line"),
            (3, None),
            (4, "one\n\nthree"),  # empty middle line survives
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(df, "doc_id", "text", min_tokens=6).collect()
    assert {s.doc_id for s in spans} == {2}  # keep-first spares doc 1
    out = {
        r.doc_id: r.text_cleaned
        for r in strip_duplicated_spans(df, "doc_id", "text", min_tokens=6).collect()
    }
    assert out[1] == f"first line here\n{shared}\nlast line"
    assert out[2] == "\nsecond doc tail line"  # stripped line stays a line
    assert out[3] == ""
    assert out[4] == "one\n\nthree"


def test_ngram_lm_score_emits_zero_gram_docs(spark):
    """Docs yielding no n-grams score (0, NULL) instead of vanishing."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        ngram_lm_score,
        ngram_lm_train,
    )

    train = _mk_docs(spark, [(1, "the cat sat")])
    lm = ngram_lm_train(train, "text", n=2)
    test = spark.createDataFrame(
        [(10, "the cat"), (11, ""), (12, None), (13, "  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_scored, r.lm_logprob)
           for r in ngram_lm_score(test, lm, "doc_id", "text", n=2).collect()}
    assert set(got) == {10, 11, 12, 13}
    assert got[10][0] == 2 and got[10][1] is not None
    for d in (11, 12, 13):
        assert got[d] == (0, None)


# ---------------------------------------------------------------------------
# BM25 retrieval (operators.text.bm25_topk)
# ---------------------------------------------------------------------------


def _bm25_manual(corpus, queries, k1=1.2, b=0.75):
    """Reference BM25 on a token-list corpus: {qid: [(doc_id, score)]}."""
    import math

    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {}
    for toks in corpus.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for d, toks in corpus.items():
            s = 0.0
            for t in terms:
                tf = toks.count(t)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(toks) / avgdl)
                )
            if s > 0.0:
                scores[d] = s
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def test_bm25_matches_reference_formula(spark):
    from etl_football_analytics_pipeline_spark.operators.text import bm25_topk

    corpus = {
        1: "spark shuffles the hash join keys".split(),
        2: "hash hash hash everywhere hash".split(),
        3: "a very long document about sort merge join ops " .split() * 4,
        4: "nothing relevant here at all".split(),
        5: "hash join".split(),
    }
    queries = {"qa": ["hash", "join"], "qb": ["sort", "merge"]}
    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in bm25_topk(df, "doc_id", "text", queries, k=3).collect()
    }
    want = _bm25_manual(corpus, queries)
    for qid, ranked in want.items():
        for rank, (d, s) in enumerate(ranked[:3], start=1):
            assert got[(qid, d)][0] == rank, (qid, d, got)
            assert got[(qid, d)] == (rank, round(s, 4)), (qid, d, s)
    # docs with zero matching terms never appear
    assert (("qa", 4)) not in got
    assert len([k for k in got if k[0] == "qb"]) == 1  # only doc 3 matches


def test_bm25_deterministic_under_repartition_and_salt(spark):
    from etl_football_analytics_pipeline_spark.operators.text import bm25_topk

    docs = load_table(spark, SF, "documents")
    queries = {"q1": ["hash", "join", "stream"], "q2": ["vector", "scan", "merge"]}
    a = bm25_topk(docs, "doc_id", "text", queries, k=10).collect()
    b = bm25_topk(
        docs.repartition(7), "doc_id", "text", queries, k=10, salt_buckets=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 20
    # every query has contiguous ranks 1..10
    for q in queries:
        assert sorted(r.rank for r in a if r.query_id == q) == list(range(1, 11))


def test_bm25_null_and_empty_text_excluded(spark):
    from etl_football_analytics_pipeline_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "hash join"), (2, None), (3, "   "), (4, "join")],
        "doc_id long, text string",
    )
    rows = bm25_topk(df, "doc_id", "text", {"q": ["join"]}, k=10).collect()
    assert sorted(r.doc_id for r in rows) == [1, 4]


def test_bm25_index_probe_equals_inflight_and_append_equals_rebuild(spark, tmp_path):
    from etl_football_analytics_pipeline_spark.operators.text import (
        bm25_append_index,
        bm25_build_index,
        bm25_search_index,
        bm25_topk,
    )

    docs = load_table(spark, SF, "documents")
    queries = {"q1": ["hash", "join", "stream"], "q2": ["vector", "scan", "merge"]}
    inflight = sorted(map(tuple, bm25_topk(docs, "doc_id", "text", queries, k=10).collect()))

    full = f"{tmp_path}/idx_full"
    bm25_build_index(docs, "doc_id", "text", full)
    probed = sorted(
        map(tuple, bm25_search_index(spark, full, queries, k=10).collect())
    )
    assert probed == inflight

    # build on half the corpus, append the other half: identical probe
    half = f"{tmp_path}/idx_half"
    bm25_build_index(docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", half)
    bm25_append_index(docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text", half)
    appended = sorted(
        map(tuple, bm25_search_index(spark, half, queries, k=10).collect())
    )
    assert appended == inflight


def test_bm25_index_probe_prunes_term_buckets(spark, tmp_path):
    """The probe's postings scan must carry PartitionFilters on the
    term bucket — unprobed bucket dirs never open."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_search_index,
        _term_bucket_py,
    )

    docs = load_table(spark, SF, "documents")
    idx = f"{tmp_path}/idx"
    bm25_build_index(docs, "doc_id", "text", idx)
    out = bm25_search_index(spark, idx, {"q": ["hash", "join"]}, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan, plan
    # and the pruning is real: only the probed buckets' dirs are read
    import re

    want = sorted({_term_bucket_py(t) for t in ("hash", "join")})
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "tb" in m.group(1), plan
    assert out.count() == 5  # one query, k=5


def test_bm25_index_tombstone_delete_equals_rebuild_without(spark, tmp_path):
    from etl_football_analytics_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_delete_from_index,
        bm25_search_index,
        bm25_topk,
    )

    docs = load_table(spark, SF, "documents")
    queries = {"q1": ["hash", "join", "stream"], "q2": ["vector", "scan", "merge"]}
    idx = f"{tmp_path}/idx"
    bm25_build_index(docs, "doc_id", "text", idx)
    # delete the docs that currently win q1's top-3 (forces rank churn)
    top3 = [
        r.doc_id
        for r in bm25_search_index(spark, idx, queries, k=10).collect()
        if r.query_id == "q1" and r.rank <= 3
    ]
    doomed = spark.createDataFrame([(i,) for i in top3], "doc_id long")
    bm25_delete_from_index(doomed.withColumnRenamed("doc_id", "__id"), idx)
    after = sorted(
        map(tuple, bm25_search_index(spark, idx, queries, k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            bm25_topk(
                docs.filter(~F.col("doc_id").isin(top3)),
                "doc_id", "text", queries, k=10,
            ).collect(),
        )
    )
    assert after == want
    assert not any(r[1] in top3 for r in after)
    # deleting a never-indexed id is a no-op
    bm25_delete_from_index(
        spark.createDataFrame([(10_000_000,)], "__id long"), idx
    )
    again = sorted(
        map(tuple, bm25_search_index(spark, idx, queries, k=10).collect())
    )
    assert again == after
    # re-deleting already-tombstoned ids is idempotent: the (n, sdl)
    # compensation must come from the tombstone-filtered doc view, so a
    # second delete appends no second negative stats row (a double
    # subtraction would corrupt idf/avgdl for every later probe)
    stats_before = _read_rel(spark, f"{idx}/stats").groupBy().sum().collect()
    bm25_delete_from_index(doomed.withColumnRenamed("doc_id", "__id"), idx)
    stats_after = _read_rel(spark, f"{idx}/stats").groupBy().sum().collect()
    assert stats_after == stats_before
    twice = sorted(
        map(tuple, bm25_search_index(spark, idx, queries, k=10).collect())
    )
    assert twice == after
    # COMPACTION: physically rewrite without the tombstoned docs —
    # probes unchanged, tombstone dir gone, stats collapsed to one
    # row, the doomed ids absent from postings and sidecar storage,
    # and the index stays APPENDABLE afterwards (append ≡ rebuild on
    # the corresponding corpus)
    import os

    from etl_football_analytics_pipeline_spark.operators.text import (
        bm25_append_index,
        bm25_compact_index,
    )

    bm25_compact_index(spark, idx)
    assert not os.path.isdir(f"{idx}/tombstones")
    assert _read_rel(spark, f"{idx}/stats").count() == 1
    assert (
        _read_rel(spark, f"{idx}/postings")
        .filter(F.col("__id").isin(top3))
        .count()
        == 0
    )
    compacted = sorted(
        map(tuple, bm25_search_index(spark, idx, queries, k=10).collect())
    )
    assert compacted == after
    extra = spark.createDataFrame(
        [(9_000_001, "hash join stream vector")], "doc_id long, text string"
    )
    bm25_append_index(extra, "doc_id", "text", idx)
    appended = sorted(
        map(tuple, bm25_search_index(spark, idx, queries, k=10).collect())
    )
    want2 = sorted(
        map(
            tuple,
            bm25_topk(
                docs.filter(~F.col("doc_id").isin(top3))
                .select("doc_id", "text")
                .unionByName(extra),
                "doc_id", "text", queries, k=10,
            ).collect(),
        )
    )
    assert appended == want2


def test_bm25_delete_zero_token_doc_compensates_stats(spark, tmp_path):
    """A doc whose text tokenizes to zero words has no postings rows
    but contributed n+=1 at build time; delete must still compensate n
    (from the per-doc sidecar) or idf/avgdl skew — delete ≡
    rebuild-without for empty docs too."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_delete_from_index,
        bm25_search_index,
        bm25_topk,
    )

    df = spark.createDataFrame(
        [(1, "hash join scan"), (2, "hash table probe"), (3, "...!!!"),
         (4, "join merge hash")],
        "doc_id long, text string",
    )
    idx = f"{tmp_path}/idx"
    bm25_build_index(df, "doc_id", "text", idx)
    bm25_delete_from_index(spark.createDataFrame([(3,)], "__id long"), idx)
    n, sdl = _read_rel(spark, f"{idx}/stats").groupBy().agg(
        F.sum("n"), F.sum("sdl")
    ).first()
    assert (n, sdl) == (3, 9)
    queries = {"q": ["hash", "join"]}
    after = sorted(map(tuple, bm25_search_index(spark, idx, queries, k=5).collect()))
    want = sorted(
        map(
            tuple,
            bm25_topk(df.filter("doc_id != 3"), "doc_id", "text", queries, k=5).collect(),
        )
    )
    assert after == want


def test_bm25_absent_and_repeated_query_terms(spark):
    """A query whose terms never occur returns zero rows (not an
    error); repeated terms in one query count per-instance on BOTH the
    operator and any oracle mirroring it (documented BM25 semantics)."""
    from etl_football_analytics_pipeline_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "hash join scan"), (2, "hash hash table")], "doc_id long, text string"
    )
    assert bm25_topk(df, "doc_id", "text", {"q": ["zzz", "qqq"]}, k=5).count() == 0
    # absent term alongside present ones: present terms still score
    rows = bm25_topk(df, "doc_id", "text", {"q": ["hash", "zzz"]}, k=5).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]
    # repeated term: doubled contribution (per-instance semantics)
    single = {r.doc_id: r.score for r in bm25_topk(df, "doc_id", "text", {"q": ["hash"]}, k=5).collect()}
    double = {r.doc_id: r.score for r in bm25_topk(df, "doc_id", "text", {"q": ["hash", "hash"]}, k=5).collect()}
    for d in single:
        assert abs(double[d] - round(2 * single[d], 4)) <= 0.0002, (d, single[d], double[d])


def test_bm25_compact_hard_erasure_under_dynamic_overwrite(spark, tmp_path):
    """A caller's partitionOverwriteMode=dynamic must not defeat hard
    erasure (ADVICE r6: text.py:1051): with an in-place dynamic
    overwrite, a term bucket whose postings were ALL tombstoned is
    never rewritten and the deleted doc's terms stay on disk. The
    sibling-dir swap makes the session setting irrelevant."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_compact_index,
        bm25_delete_from_index,
        bm25_search_index,
    )

    docs = spark.createDataFrame(
        [(1, "zebra quagga okapi"), (2, "hash join shuffle")],
        "doc_id long, text string",
    )
    idx = f"{tmp_path}/bm25_dyn"
    bm25_build_index(docs, "doc_id", "text", idx)
    bm25_delete_from_index(
        spark.createDataFrame([(1,)], "__id long"), idx
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        bm25_compact_index(spark, idx)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    post = _read_rel(spark, f"{idx}/postings")
    assert post.filter("__id = 1").count() == 0
    assert post.filter(
        F.col("term").isin(["zebra", "quagga", "okapi"])
    ).count() == 0, "deleted doc's terms must not survive compaction on disk"
    got = bm25_search_index(spark, idx, {"q": ["hash"]}, k=5).collect()
    assert [r.doc_id for r in got] == [2]


def test_bm25_query_terms_are_case_normalized(spark):
    """Documents tokenize lowercased, so an uppercase query term must
    match the lowercased vocabulary instead of silently returning
    nothing; empty term lists raise."""
    from etl_football_analytics_pipeline_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "apple pie recipe"), (2, "banana bread")], "doc_id long, text string"
    )
    lower = sorted(map(tuple, bm25_topk(docs, "doc_id", "text", {"q": ["apple"]}).collect()))
    upper = sorted(map(tuple, bm25_topk(docs, "doc_id", "text", {"q": ["Apple"]}).collect()))
    assert lower == upper and len(lower) == 1
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk(docs, "doc_id", "text", {"q": []})


def test_bm25_rebuild_replaces_index_and_clears_tombstones(spark, tmp_path):
    """bm25_build_index has full-REBUILD semantics: ghost postings from
    the previous corpus must not survive (even under
    partitionOverwriteMode=dynamic), and the previous generation's
    tombstones must not exclude freshly-indexed ids."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_delete_from_index,
        bm25_search_index,
    )

    idx = f"{tmp_path}/bm25_rebuild"
    docs_a = spark.createDataFrame(
        [(1, "zebra stripes"), (2, "zebra crossing")], "doc_id long, text string"
    )
    bm25_build_index(docs_a, "doc_id", "text", idx)
    bm25_delete_from_index(spark.createDataFrame([(1,)], "__id long"), idx)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        docs_b = spark.createDataFrame(
            [(1, "hash join"), (3, "stream merge")], "doc_id long, text string"
        )
        bm25_build_index(docs_b, "doc_id", "text", idx)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # ghost postings from corpus A must be gone
    assert bm25_search_index(spark, idx, {"q": ["zebra"]}, k=5).count() == 0
    # doc 1 (tombstoned in the OLD generation) is findable again
    got = [r.doc_id for r in bm25_search_index(spark, idx, {"q": ["hash"]}, k=5).collect()]
    assert got == [1]


def test_ngram_lm_unigram_ignores_empty_docs(spark):
    """n=1 LMs must not learn a '' token from empty/whitespace docs,
    and empty docs score (n_scored=0, NULL) as documented."""
    from etl_football_analytics_pipeline_spark.operators.text import (
        ngram_lm_score,
        ngram_lm_train,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    lm = ngram_lm_train(df, "text", n=1)
    toks = {r.token for r in lm.collect()}
    assert toks == {"hello", "world"}
    scored = {r.doc_id: r for r in ngram_lm_score(df, lm, "doc_id", "text", n=1).collect()}
    for d in (2, 3, 4):
        assert scored[d].n_scored == 0 and scored[d].lm_logprob is None
    assert scored[1].n_scored == 2
