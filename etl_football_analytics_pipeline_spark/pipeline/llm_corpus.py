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
    with_stats: bool = False,
) -> DataFrame | tuple[DataFrame, CurationStats]:
    """Quality-gate, dedup (exact then near-dup), and token-account a
    documents table; returns the curated docs with `regex_tokens`
    attached (plus a CurationStats audit when `with_stats`).

    The optional repetition/compression knobs add the C4/Gopher-style
    gates (operators.text.repetition_signals / compression_ratio) to
    the quality stage — repetitive boilerplate is cheaper to drop
    before the dedup shuffles than after.

    Keep rules are deterministic everywhere (lowest id wins), so the
    curated set is identical under any partitioning — the property
    that makes re-runs and incremental curation reproducible.
    """
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
    stats = CurationStats(
        input_docs=docs.count(),
        after_quality=good.count(),
        after_exact_dedup=exact_unique.count(),
        after_neardup_dedup=curated.count(),
        total_tokens=out.agg(F.sum("regex_tokens")).collect()[0][0] or 0,
    )
    return out, stats
