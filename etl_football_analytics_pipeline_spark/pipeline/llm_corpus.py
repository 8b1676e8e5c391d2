"""End-to-end training-corpus curation — the LLM-data-pipeline
operators composed in their production order (driver-mandated
extension; BASELINE.json north star).

The canonical curation sequence over a documents table:

1. quality gate   — cheap Column-expression signals drop junk first,
                    shrinking every later stage (operators.text);
2. exact dedup    — md5-fingerprint hash-groupBy, keep lowest id: one
                    shuffle removes byte-identical copies
                    (operators.dedup.exact_dedup);
3. near-dup dedup — MinHash+LSH candidates → exact n-gram Jaccard
                    verification → connected components → keep each
                    cluster's lowest id (operators.dedup.*): the
                    bucket-local candidate join is what makes this
                    quadratic-free at 100 TB;
4. token account  — per-doc and corpus token totals for budget
                    tracking (operators.text.token_counts).

Every stage is a DataFrame → DataFrame function, so the composition is
ONE lazy plan per output and Catalyst prunes columns end to end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_exact_dedup_pairs,
)
from ..operators.text import (
    compression_ratio,
    quality_scores,
    repetition_signals,
    token_counts,
)


@dataclass
class CurationStats:
    """Row counts per stage — the audit trail a data pipeline logs
    (the LLM analog of the reference's inserted/skipped counts,
    `scr/Load.py:291-302`)."""

    input_docs: int
    after_quality: int
    after_exact_dedup: int
    after_neardup_dedup: int
    total_tokens: int


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 2,
    max_dup_line_frac: float | None = None,
    max_top_word_frac: float | None = None,
    min_compression_ratio: float | None = None,
    strip_lines_max_df: int | None = None,
    strip_span_min_tokens: int | None = None,
    min_lm_logprob: float | None = None,
    lm_reference: DataFrame | None = None,
    classifier_weights: "np.ndarray | None" = None,
    min_classifier_prob: float = 0.5,
    with_stats: bool = False,
) -> DataFrame | tuple[DataFrame, CurationStats]:
    """Quality-gate, dedup (exact then near-dup), and token-account a
    documents table; returns the curated docs with `regex_tokens`
    attached (plus a CurationStats audit when `with_stats`).

    The optional repetition/compression knobs add the C4/Gopher-style
    gates (operators.text.repetition_signals / compression_ratio) to
    the quality stage — repetitive boilerplate is cheaper to drop
    before the dedup shuffles than after. `strip_lines_max_df` runs
    cross-document boilerplate-line removal FIRST
    (operators.text.strip_common_lines): stripping shared chrome
    before hashing keeps near-identical pages from surviving dedup on
    the strength of their navigation text. `strip_span_min_tokens`
    then runs substring-level exact dedup
    (operators.text.strip_duplicated_spans, keep-first): passages of
    >= that many tokens duplicated across documents survive only in
    their first document — the within-document-boundary duplication
    that document-level dedup cannot see.

    Keep rules are deterministic everywhere (lowest id wins), so the
    curated set is identical under any partitioning — the property
    that makes re-runs and incremental curation reproducible.

    `min_lm_logprob` adds the CCNet-style perplexity gate: documents
    scoring below that mean bigram log-probability under an n-gram LM
    (operators.text.ngram_lm_train/score) are dropped with the other
    quality filters. The LM trains on `lm_reference` when given (the
    trusted-corpus setup CCNet uses — e.g. a wiki snapshot) and on the
    input corpus itself otherwise (self-scoring: outliers against the
    corpus's own distribution go).

    `classifier_weights` adds the SUPERVISED gate
    (operators.classifier): a hashed-BoW logistic model trained on a
    labeled sample (`quality_train`) scores every document map-only;
    those below `min_classifier_prob` are dropped alongside the other
    quality filters — the fastText/DCLM-style fourth signal.
    """
    if strip_lines_max_df is not None:
        from ..operators.text import strip_common_lines

        docs = (
            strip_common_lines(docs, id_col, text_col, max_df=strip_lines_max_df)
            .drop(text_col)
            .withColumnRenamed("text_cleaned", text_col)
        )
    if strip_span_min_tokens is not None:
        from ..operators.text import strip_duplicated_spans

        docs = (
            strip_duplicated_spans(
                docs, id_col, text_col, min_tokens=strip_span_min_tokens
            )
            .drop(text_col)
            .withColumnRenamed("text_cleaned", text_col)
        )
    quality = quality_scores(docs, id_col, text_col)
    good_ids = quality.filter(F.col("quality_score") >= min_quality).select(id_col)
    if max_dup_line_frac is not None or max_top_word_frac is not None:
        rep = repetition_signals(docs, id_col, text_col)
        if max_dup_line_frac is not None:
            rep = rep.filter(F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top_word_frac is not None:
            rep = rep.filter(F.col("top_word_frac") <= max_top_word_frac)
        good_ids = good_ids.join(rep.select(id_col), id_col)
    if min_compression_ratio is not None:
        cz = compression_ratio(docs, id_col, text_col).filter(
            F.col("compression_ratio") >= min_compression_ratio
        )
        good_ids = good_ids.join(cz.select(id_col), id_col)
    if min_lm_logprob is not None:
        from ..operators.text import ngram_lm_score, ngram_lm_train

        # eager localCheckpoint: three plan branches read the model
        # (counts, totals, vocab) — unmaterialized, the full train
        # lineage would re-execute for each; and unlike cache() the
        # checkpoint storage is ContextCleaner-freed when the model
        # frame goes out of scope, so repeated curation calls don't
        # accumulate pinned executor storage
        lm = ngram_lm_train(
            lm_reference if lm_reference is not None else docs, text_col, n=2
        ).localCheckpoint(eager=True)
        # zero-gram docs score NULL (no evidence): pass them through —
        # the length/quality gates own empty-text policy
        fluent = ngram_lm_score(docs, lm, id_col, text_col, n=2).filter(
            (F.col("lm_logprob") >= min_lm_logprob) | F.col("lm_logprob").isNull()
        )
        good_ids = good_ids.join(fluent.select(id_col), id_col)
    if classifier_weights is not None:
        # the supervised (fastText/DCLM-style) gate — weights come from
        # operators.classifier.quality_train on a labeled sample;
        # scoring is a map-only broadcast-weights pass
        from ..operators.classifier import quality_score

        liked = quality_score(docs, classifier_weights, id_col, text_col).filter(
            F.col("quality_prob") >= min_classifier_prob
        )
        good_ids = good_ids.join(liked.select(id_col), id_col)
    good = docs.join(good_ids, id_col)

    exact_keep = exact_dedup(good, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    exact_unique = good.join(exact_keep, id_col)

    pairs = minhash_exact_dedup_pairs(
        exact_unique, id_col, text_col,
        shingle_n=shingle_n, threshold=jaccard_threshold,
    )
    comp = connected_components(pairs)
    dropped = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    curated = exact_unique.join(dropped, id_col, "left_anti")

    out = curated.join(
        token_counts(curated, id_col, text_col).select(id_col, "regex_tokens"), id_col
    )
    if not with_stats:
        return out
    # the stat counts are FOUR separate actions over the curation DAG —
    # uncached, each would re-run the quality gates, exact dedup and
    # the MinHash/LSH shuffle from scratch (~4x the most expensive
    # stage). One eager checkpoint of the final frame bounds that; the
    # upstream counts reuse its lineage-truncated inputs where possible
    # and the caller's own consumption of `out` is free afterwards.
    out = out.localCheckpoint(eager=True)
    stats = CurationStats(
        input_docs=docs.count(),
        after_quality=good.count(),
        after_exact_dedup=exact_unique.count(),
        after_neardup_dedup=out.count(),
        total_tokens=out.agg(F.sum("regex_tokens")).collect()[0][0] or 0,
    )
    return out, stats


@dataclass
class AssemblyStats:
    """Audit trail of the assembly stage: split sizes, mixture-sample
    survivors, decontaminated (dropped) eval docs, packed sequences."""

    split_docs: dict[str, int]
    sampled_train_docs: int
    contaminated_test_docs: int
    n_sequences: int
    contaminated_val_docs: int = 0


def assemble_training_set(
    curated: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    mixture: dict[str, float] | None = None,
    group_col: str = "source",
    default_fraction: float = 1.0,
    contamination_n: int = 3,
    contamination_threshold: float = 0.8,
    with_stats: bool = False,
):
    """The assembly stage DOWNSTREAM of curation — what turns a clean
    corpus into trainable data (operators.corpus composed in
    production order):

    1. deterministic md5 split  — train/val/test, seedless, the same
                                  doc lands in the same fold forever;
    2. mixture sampling         — optional per-`group_col` keep rates
                                  over the TRAIN fold (reweighting
                                  domains without an RNG);
    3. decontamination          — word-`contamination_n`-gram
                                  containment of every test doc
                                  against the (sampled) train fold;
                                  test docs at/above the threshold
                                  are DROPPED from the eval fold (a
                                  leaked benchmark measures memory,
                                  not ability);
    4. sequence packing         — concat-and-chunk the train fold
                                  into `seq_len` training sequences.

    Returns a dict of DataFrames: 'train' (sampled fold), 'val',
    'test' (decontaminated), 'decontam' (the per-test-doc audit), and
    'train_packed' ((id, n_tokens, seq_id, seq_offset)); plus an
    AssemblyStats when `with_stats`. Deterministic end to end — every
    stage is hash- or value-keyed, so re-runs produce identical
    folds, samples, and sequence ids under any partitioning."""
    from ..operators.corpus import (
        deterministic_split,
        mixture_sample,
        ngram_containment,
        pack_sequences,
        whitespace_token_counts,
    )

    sp = deterministic_split(curated, id_col)
    train = sp.filter(F.col("split") == "train").drop("split")
    val = sp.filter(F.col("split") == "val").drop("split")
    test = sp.filter(F.col("split") == "test").drop("split")
    if mixture is not None:
        train = mixture_sample(
            train, id_col, group_col, mixture, default_fraction=default_fraction
        )
    decontam = ngram_containment(train, test, id_col, text_col, n=contamination_n)
    leaked = decontam.filter(
        F.col("containment") >= contamination_threshold
    ).select(id_col)
    clean_test = test.join(leaked, id_col, "left_anti")
    # the VAL fold is an eval set too: a benchmark near-copy that
    # hash-landed in val would otherwise survive and validation-based
    # decisions (early stopping, mixture tuning) would measure
    # memorization — the exact failure decontamination exists to stop
    decontam_val = ngram_containment(train, val, id_col, text_col, n=contamination_n)
    leaked_val = decontam_val.filter(
        F.col("containment") >= contamination_threshold
    ).select(id_col)
    clean_val = val.join(leaked_val, id_col, "left_anti")
    toks = whitespace_token_counts(train, id_col, text_col)
    packed = pack_sequences(toks, id_col, "n_tokens", seq_len=seq_len)
    out = {
        "train": train,
        "val": clean_val,
        "test": clean_test,
        "decontam": decontam,
        "decontam_val": decontam_val,
        "train_packed": packed,
    }
    if not with_stats:
        return out
    stats = AssemblyStats(
        split_docs={
            r["split"]: r["count"] for r in sp.groupBy("split").count().collect()
        },
        sampled_train_docs=train.count(),
        contaminated_test_docs=leaked.count(),
        n_sequences=packed.select("seq_id").distinct().count(),
        contaminated_val_docs=leaked_val.count(),
    )
    return out, stats


def curation_sink(
    table_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    keep_versions: int = 0,
):
    """`foreachBatch` sink: INCREMENTAL corpus curation — the
    streaming tier of curate_corpus, for corpora that arrive
    continuously instead of as one batch. Each micro-batch:

    1. quality gate — stateless Column expressions, nothing carried
       between batches;
    2. exact dedup WITHIN the batch — md5 fingerprint, keep lowest id
       (deterministic, so replays pick the same row);
    3. exact dedup AGAINST the corpus — insert-if-absent keyed on the
       fingerprint into a snapshot-versioned table
       (sources.versioned.merge_commit): docs whose fingerprint is
       already live are dropped, everything else commits as a new
       atomic snapshot.

    Replay-safe: re-merging a batch inserts nothing new
    (insert-if-absent is idempotent by key), so the sink is
    effectively exactly-once per fingerprint — the same guarantee as
    streaming.windowed.merge_sink, with snapshot isolation for
    readers. State discipline: nothing streaming-stateful accumulates
    here (the corpus table IS the state, bounded by the corpus);
    NEAR-dup curation stays a periodic batch job over the versioned
    table — per-batch LSH against an ever-growing corpus would be a
    join per micro-batch, and cross-batch LSH state is unbounded.

    Usage:
        (stream.writeStream.foreachBatch(curation_sink(dir))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    """
    from pyspark.sql import Window

    from ..operators.dedup import normalized_text
    from ..operators.text import quality_scores
    from ..sources.versioned import merge_commit

    def apply(batch: DataFrame, batch_id: int) -> None:
        good_ids = (
            quality_scores(batch, id_col, text_col)
            .filter(F.col("quality_score") >= min_quality)
            .select(id_col)
        )
        good = batch.join(good_ids, id_col)
        fp = good.withColumn("fingerprint", F.md5(normalized_text(text_col)))
        w = Window.partitionBy("fingerprint").orderBy(F.asc(id_col))
        first = (
            fp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        merge_commit(
            batch.sparkSession, table_dir, first, keys=["fingerprint"], insert_only=True
        )
        # every micro-batch commits a FULL corpus snapshot: without a
        # retention bound a 30s-trigger stream retains thousands of
        # dead versions per day until the volume fills. Retention is
        # OPT-IN (keep_versions=0 default, ADVICE r7: destroying
        # time-travel history silently is worse than growth callers
        # can see) — long-running streams SHOULD pass a bound, e.g.
        # keep_versions=2, exactly like write_warehouse's default.
        if keep_versions > 0:
            from ..sources.versioned import vacuum

            vacuum(table_dir, keep=keep_versions)

    return apply
