"""End-to-end training-corpus runner — curate → assemble → publish as
one schedulable entry point (the LLM-pipeline sibling of
pipeline.runner's reference-ETL DAG, same per-stage retry semantics).

Stage mapping:
- curate  — pipeline.llm_corpus.curate_corpus (quality gate → exact
  dedup → near-dup dedup → token accounting);
- assemble — pipeline.llm_corpus.assemble_training_set (md5 split →
  optional mixture sample → decontaminate the eval fold → pack train
  sequences);
- publish — every output lands as a snapshot-versioned table
  (sources.versioned.commit_version): train / val / test /
  train_packed / decontam, each an atomic pointer commit, so a
  consumer reading mid-publish sees the previous complete corpus.

Deterministic end to end (hash-keyed splits/samples, lowest-id keep
rules, value-bucketed packing), so re-running on the same input
produces identical folds and sequence ids — the property that makes
scheduled re-builds and incremental refreshes reproducible.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from .runner import EtlReport, _run_stage


def run_corpus_pipeline(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    seq_len: int = 2048,
    mixture: dict[str, float] | None = None,
    group_col: str = "source",
    strip_lines_max_df: int | None = None,
    strip_span_min_tokens: int | None = None,
    retries: int = 2,
    retry_delay_s: float = 0.0,
) -> EtlReport:
    """Curate `docs_path` (parquet with at least id/text columns),
    assemble the training set, and publish every fold as a versioned
    table under `out_dir`. Returns an EtlReport whose `table_rows`
    carries the published row counts."""
    from ..sources.versioned import commit_version
    from .llm_corpus import assemble_training_set, curate_corpus

    report = EtlReport()

    curated = _run_stage(
        report,
        "curate",
        lambda: curate_corpus(
            spark.read.parquet(docs_path),
            id_col,
            text_col,
            min_quality=min_quality,
            jaccard_threshold=jaccard_threshold,
            strip_lines_max_df=strip_lines_max_df,
            strip_span_min_tokens=strip_span_min_tokens,
        ),
        retries,
        retry_delay_s,
    )
    if curated is None:
        return report

    assembled = _run_stage(
        report,
        "assemble",
        lambda: assemble_training_set(
            curated,
            id_col,
            text_col,
            seq_len=seq_len,
            mixture=mixture,
            group_col=group_col,
        ),
        retries,
        retry_delay_s,
    )
    if assembled is None:
        return report

    def _publish() -> dict[str, int]:
        counts: dict[str, int] = {}
        for name, df in assembled.items():
            commit_version(df, f"{out_dir}/{name}")
            counts[name] = df.count()
        return counts

    published = _run_stage(report, "publish", _publish, retries, retry_delay_s)
    if published is not None:
        report.table_rows.update(published)
    return report


def main(argv: list[str] | None = None) -> int:
    """CLI: python -m etl_football_analytics_pipeline_spark.pipeline.corpus_runner
    DOCS_PARQUET OUT_DIR [--seq-len N] [--min-quality Q] [--retries N]
    """
    from ..session import get_spark

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("docs_path")
    ap.add_argument("out_dir")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument(
        "--strip-lines-max-df", type=int, default=None,
        help="drop lines shared verbatim by more than this many docs "
        "(cross-document boilerplate removal) before curation",
    )
    ap.add_argument(
        "--strip-span-min-tokens", type=int, default=None,
        help="strip passages of at least this many tokens duplicated "
        "across documents (substring-level exact dedup, keep-first) "
        "before curation",
    )
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--retry-delay", type=float, default=0.0)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="corpus-pipeline")
    report = run_corpus_pipeline(
        spark,
        args.docs_path,
        args.out_dir,
        min_quality=args.min_quality,
        jaccard_threshold=args.jaccard_threshold,
        strip_lines_max_df=args.strip_lines_max_df,
        strip_span_min_tokens=args.strip_span_min_tokens,
        seq_len=args.seq_len,
        retries=args.retries,
        retry_delay_s=args.retry_delay,
    )
    for s in report.stages:
        status = "OK " if s.ok else "FAIL"
        print(f"{status} {s.name:10s} attempts={s.attempts} {s.seconds:.1f}s"
              + (f"  {s.error}" if s.error else ""))
    for t, n in sorted(report.table_rows.items()):
        print(f"  {t:24s} {n} rows")
    spark.stop()
    return 0 if report.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
