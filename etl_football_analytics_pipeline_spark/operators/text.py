"""Text-analysis operators for the documents table (driver-mandated
extension; generalizes the reference's string layer X1/X2,
`scr/Transform.py:395-404,235-242`).

All pure Column expressions — language ID, quality scoring, token
counting, and fingerprinting run inside whole-stage codegen with zero
Python in the hot path, so they cost one scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .dedup import normalized_text

# Tiny per-language stopword sets for the n-gram/stopword-ratio
# language heuristic. Deliberately small and public-knowledge: the
# point is the plan shape (vectorized set-membership scoring), not
# lexical coverage.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "en"],
}


def _words(text_col: str) -> F.Column:
    return F.split(normalized_text(text_col), " ")


def _stopword_hits(words: F.Column, stopwords: list[str]) -> F.Column:
    return F.size(F.filter(words, lambda w: w.isin(stopwords)))


def language_hit_exprs(words: F.Column) -> dict[str, F.Column]:
    """Per-language stopword hit-count expressions over a words array —
    {lang: unaliased Column}, shared by language_id and fused profiles
    (which compute every text signal in ONE projection over one scan)."""
    return {lang: _stopword_hits(words, sws) for lang, sws in STOPWORDS.items()}


def predicted_lang_expr(hits: dict[str, F.Column]) -> F.Column:
    """argmax over the per-language hit columns via greatest + chained
    when (first language in sorted code order wins ties, deterministic);
    'und' when every count is zero."""
    langs = sorted(hits)
    best = F.greatest(*[hits[l] for l in langs])
    pred = None
    for l in langs:
        cond = hits[l] == best
        pred = F.when(cond, F.lit(l)) if pred is None else pred.when(cond, F.lit(l))
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts over the
    word bag; predicted language = argmax (ties broken by language code
    order, deterministic). Returns (id, per-language hit counts,
    predicted_lang)."""
    hits = language_hit_exprs(_words(text_col))
    out = df.select(
        F.col(id_col), *[c.alias(f"hits_{lang}") for lang, c in hits.items()]
    )
    # predicted_lang references the already-projected hit columns, so
    # each count is computed once per row
    return out.withColumn(
        "predicted_lang",
        predicted_lang_expr({l: F.col(f"hits_{l}") for l in STOPWORDS}),
    )


def quality_exprs(text_col: str, words: F.Column) -> dict[str, F.Column]:
    """Quality-signal expressions ({name: unaliased Column}) over a
    text column and its words array — shared by quality_scores and
    fused profiles."""
    n_chars = F.length(F.col(text_col))
    n_words = F.size(words)
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?'\"]", ""))
    en_hits = _stopword_hits(words, STOPWORDS["en"])
    avg_word_len = F.round(
        (F.length(F.concat_ws("", words)) / F.greatest(n_words, F.lit(1))).cast("double"), 4
    )
    punct_ratio = F.round((n_punct / F.greatest(n_chars, F.lit(1))).cast("double"), 4)
    stop_ratio = F.round((en_hits / F.greatest(n_words, F.lit(1))).cast("double"), 4)
    # Composite: reward stopword presence (naturalness), penalize
    # extreme punctuation; clamp to [0, 1].
    score = F.round(
        F.least(
            F.greatest(
                stop_ratio * 2 + F.lit(0.5) - punct_ratio * 5, F.lit(0.0)
            ),
            F.lit(1.0),
        ),
        4,
    )
    return {
        "n_chars_measured": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "avg_word_len": avg_word_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document quality signals: length, word count, mean word length,
    punctuation ratio, stopword ratio, and a composite score — the
    standard cheap pre-filters of an LLM data pipeline."""
    exprs = quality_exprs(text_col, _words(text_col))
    return df.select(F.col(id_col), *[c.alias(n) for n, c in exprs.items()])


def token_exprs(text_col: str) -> dict[str, F.Column]:
    """Token-count expressions ({name: unaliased Column}) — shared by
    token_counts and fused profiles."""
    stripped = F.trim(F.col(text_col))
    # empty / whitespace-only / NULL text counts 0 tokens: bare
    # size(split(...)) bills empty docs 1 (split('') is ['']) and NULL
    # docs -1/NULL — inflating token budgets and breaking ws_tokens=0
    # empty-doc filters
    ws_tokens = F.when(
        stripped.isNull() | (stripped == ""), F.lit(0)
    ).otherwise(F.size(F.split(stripped, r"\s+")))
    bpe_ish = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    )
    return {
        "ws_tokens": ws_tokens.cast("long"),
        "regex_tokens": bpe_ish.cast("long"),
    }


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    tokenization (letter runs / digit runs / single non-space symbols)
    — the cheap proxy for LLM token budgeting."""
    exprs = token_exprs(text_col)
    return df.select(F.col(id_col), *[c.alias(n) for n, c in exprs.items()])


def repetition_exprs(text_col: str, words: F.Column) -> dict[str, F.Column]:
    """Repetition-signal expressions ({name: unaliased Column}) over a
    text column and its words array — shared by repetition_signals and
    fused profiles. All three signals are in-array JVM expressions:
    zero shuffle, zero joins, one pass.

    top_word_frac (share of the most frequent word) is computed as the
    longest equal-run of the SORTED non-empty word array divided by its
    size — identical integers, hence a bit-identical IEEE division, to
    the former relational form (explode → per-(doc, word) count →
    max/sum), which cost a (doc, word)-keyed shuffle plus a join back
    (r12, guide §2.1: removed outright; at 100 TB the shuffle was the
    whole cost of this operator)."""
    lines = F.split(F.col(text_col), "\n")
    g_len = F.greatest(F.size(words) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(words, F.lit(1), g_len),
        F.slice(words, F.lit(2), g_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    nz = F.filter(words, lambda w: w != "")
    n_nz = F.size(nz)

    def step(acc: F.Column, w: F.Column) -> F.Column:
        run = (
            F.when(acc["prev"].isNotNull() & (w == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            w.alias("prev"),
        )

    top_n = F.aggregate(
        F.array_sort(nz),
        F.struct(
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit(None).cast("string").alias("prev"),
        ),
        step,
        lambda acc: acc["best"],
    )
    return {
        "dup_line_frac": (
            F.when(
                F.size(lines) > 0,
                (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
        ),
        "dup_bigram_frac": (
            F.when(
                F.size(grams) > 0,
                (F.size(grams) - F.size(F.array_distinct(grams))) / F.size(grams),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
        ),
        "top_word_frac": (
            F.when(n_nz > 0, (top_n / n_nz).cast("double")).otherwise(F.lit(0.0))
        ),
    }


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition-based quality signals (the C4/Gopher-style filters a
    training-data pipeline applies before dedup):

    - dup_line_frac: fraction of lines that are repeats of an earlier
      line (array ops, no shuffle);
    - dup_bigram_frac: fraction of word bigrams that are repeats
      (zip_with n-grams, no shuffle);
    - top_word_frac: share of the most frequent word — longest equal
      run in the sorted word array over its size (see repetition_exprs;
      formerly relational explode + shuffle + join, removed r12).
    All ratios are 0 for empty docs (no NULL propagation into
    downstream filters).
    """
    exprs = repetition_exprs(text_col, F.col("__w"))
    return df.withColumn("__w", _words(text_col)).select(
        F.col(id_col), *[c.alias(n) for n, c in exprs.items()]
    )


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    cheap entropy proxy LLM pipelines use to drop boilerplate and
    near-random text (very low ratio = templated/repetitive, ~1 =
    high-entropy noise). zlib is not expressible as Column algebra, so
    this is an Arrow-batched mapInPandas kernel — bytes stay
    executor-local, one (ratio, byte length) pair per doc shuffles.

    Also emits `cr_bytes` (the utf-8 byte length the ratio divides by;
    NULL for NULL text, matching octet_length) — the kernel already
    has the encoded bytes in hand, and emitting the length here saves
    consumers a second corpus scan + join that the mapInPandas
    boundary would keep Catalyst from collapsing."""
    import zlib

    from collections.abc import Iterator

    import pandas as pd

    def ratio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            raws = [t.encode("utf-8") if isinstance(t, str) else None for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "compression_ratio": [
                        round(len(zlib.compress(r)) / len(r), 4) if r else 0.0
                        for r in raws
                    ],
                    "cr_bytes": pd.array(
                        [len(r) if r is not None else None for r in raws],
                        dtype="Int64",
                    ),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        ratio, f"{id_col} long, compression_ratio double, cr_bytes long"
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact-dup key)
    plus a 64-bit xxhash (cheap join/shard key)."""
    norm = normalized_text(text_col)
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("md5_fingerprint"),
        F.xxhash64(norm).alias("xxh64_fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (C4-style pre-training hygiene)
# ---------------------------------------------------------------------------

#: Conservative, public-pattern PII regexes (Java dialect, also valid
#: RE2): the C4/RefinedWeb-style scrub a pre-training corpus runs
#: before anything else. Deliberately high-precision (full-string
#: shapes with anchoring context kept out) — corpus hygiene wants
#: predictable redaction, not maximal recall.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s<>\"]+",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def pii_count_exprs(col: F.Column) -> dict[str, F.Column]:
    """Per-kind PII hit-count expressions ({n_<kind>: unaliased
    Column}) — shared by pii_signals and fused profiles."""
    return {
        f"n_{name}": F.regexp_count(col, F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }


def pii_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII hit counts, one column per PII_PATTERNS entry
    (n_email, n_url, ...) — the filter signal: corpora gate or route
    documents on these before redaction. Pure `regexp_count` Column
    expressions, one scan, zero Python."""
    exprs = pii_count_exprs(F.col(text_col))
    return df.select(F.col(id_col), *[c.alias(n) for n, c in exprs.items()])


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    kinds: list[str] | None = None,
) -> DataFrame:
    """Replace each PII match with a typed placeholder token
    (`<EMAIL>`, `<URL>`, ...) — the redaction pass itself. Chained
    `regexp_replace` (replace-all) Column expressions: constant plan
    depth, inside codegen, no UDF. Pattern order is deterministic
    (dict order of PII_PATTERNS): URLs redact after emails so a
    mailto-like token inside an URL is handled by whichever pattern
    matches first — the order is part of the contract and tested."""
    out_col = out_col or text_col
    if kinds is not None:
        unknown = set(kinds) - set(PII_PATTERNS)
        if unknown:
            # a typo'd kind must not silently disable a privacy scrub
            raise ValueError(
                f"unknown PII kinds {sorted(unknown)}; "
                f"valid: {sorted(PII_PATTERNS)}"
            )
    return df.withColumn(out_col, redacted_expr(F.col(text_col), kinds))


def redacted_expr(col: F.Column, kinds: list[str] | None = None) -> F.Column:
    """The chained-regexp_replace redaction Column over `col` (same
    deterministic PII_PATTERNS order as redact_pii) — shared by
    redact_pii and fused profiles."""
    for name, pat in PII_PATTERNS.items():
        if kinds is not None and name not in kinds:
            continue
        col = F.regexp_replace(col, pat, f"<{name.upper()}>")
    return col


def strip_common_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 2,
    sep: str = "\n",
    out_col: str = "text_cleaned",
) -> DataFrame:
    """Cross-document boilerplate removal (the C4/RefinedWeb line-dedup
    rule): drop every line that appears verbatim in MORE than `max_df`
    documents — navigation chrome, cookie banners, license footers —
    and rebuild each document from its surviving lines in order.

    Within-document structure is preserved exactly: kept lines keep
    their relative order and the separator; a document whose every
    line is boilerplate comes back as ''. Comparison is on the line's
    md5 (byte-exact lines only; pair with functions.cleaning normalize
    for whitespace-insensitive matching).

    Scale shape: three keyed shuffles, all hash-partitioned — explode
    to (line_hash) → count DISTINCT docs per line (map-side partial
    agg collapses within-doc repeats first; the aggregate side prunes
    to 16-byte (hash, id) rows), anti-join lines against the
    over-threshold set (left_anti on the hash — no broadcast that
    grows with the corpus), and one groupBy(doc) to reassemble. The
    common-line set is typically tiny relative to the corpus, but the
    plan never assumes it.

    r13 note — a single-shuffle WINDOW form (per-line document
    frequency via max(dense_rank) over a __lh partitioning, the
    duplicated_spans pattern) was built, measured ~0.2 s faster at
    bench scale, and REJECTED: boilerplate lines are by definition
    corpus-wide hot keys (the blank line alone — md5('') — appears in
    ~every multi-paragraph document), a window partition must hold ALL
    of a key's payload rows in ONE task, and AQE's skew handling
    splits joins but never windows (guide §2.5). The anti-join shape
    keeps the hot-key payload shuffle AQE-splittable; the price is
    re-evaluating the (column-pruned) explode under the aggregate
    side.
    """
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias("__idx", "__line"),
    ).withColumn("__lh", F.md5(F.col("__line")))
    common = (
        lines.select("__lh", "__id")
        .distinct()  # within-doc repeats count once toward document frequency
        .groupBy("__lh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("__lh")
    )
    kept = lines.join(common, "__lh", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                lambda x: x["__line"],
            ),
            sep,
        ).alias(out_col)
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
        .drop("__id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
    )


def _window_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(__id, __start, __wh): one 64-bit content hash per overlapping
    k-token window of each document, 0-based token offsets.

    Two-phase hashing: the JVM hashes each TOKEN once (xxhash64 — one
    call per token, O(tokens)), then an Arrow kernel combines each
    k-run of token hashes into a window hash with a fixed-coefficient
    polynomial in uint64 (numpy sliding_window_view x power vector —
    wrapping multiply-add, fully vectorized). Equal windows hash
    equal; distinct windows collide with the usual ~|windows|^2/2^64
    odds, the same documented bound as every xxhash64-keyed operator
    here. A per-window interpreted Column expression
    (transform(sequence(..), i -> xxhash64(slice(..))) was measured
    ~40us/window — the kernel replaces it at >20x."""
    from collections.abc import Iterator

    import pandas as pd

    from ..utils import spread

    # NULL text must behave like '' (zero windows), matching the null
    # tolerance of the sibling operators — without the coalesce the
    # kernel would see a None array and kill the job
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.expr(
            "transform(split(trim(coalesce(%s, '')), '\\\\s+'), t -> xxhash64(t))"
            % text_col
        ).alias("__th"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        # FNV-ish odd multiplier; powers wrap in uint64 like the
        # per-window combine itself
        powers = np.uint64(1099511628211) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        for pdf in batches:
            ids: list[int] = []
            starts: list[np.ndarray] = []
            hashes: list[np.ndarray] = []
            for did, th in zip(pdf["__id"], pdf["__th"]):
                if th is None:
                    continue
                a = np.asarray(th, dtype=np.int64).view(np.uint64)
                if a.size < k:
                    continue
                w = sliding_window_view(a, k)
                h = (w * powers[None, :]).sum(axis=1, dtype=np.uint64)
                ids.append(did)
                starts.append(np.arange(h.size, dtype=np.int64))
                hashes.append(h.view(np.int64))
            if not ids:
                continue
            reps = np.array([s.size for s in starts])
            yield pd.DataFrame(
                {
                    "__id": np.repeat(np.asarray(ids, dtype=np.int64), reps),
                    "__start": np.concatenate(starts),
                    "__wh": np.concatenate(hashes),
                }
            )

    return spread(toks).mapInPandas(kernel, "__id long, __start int, __wh long")


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 20,
    scope: str = "cross_doc",
    keep_first: bool = True,
) -> DataFrame:
    """Substring-level exact-duplicate detection (the suffix-array
    dedup of Lee et al., "Deduplicating Training Data Makes Language
    Models Better", re-expressed relationally): find maximal token
    spans of length >= `min_tokens` whose content appears elsewhere in
    the corpus, per document.

    Method: every doc emits its overlapping `min_tokens`-token windows
    (whitespace tokens, window content hashed with xxhash64 — any
    duplicated span of length >= min_tokens is a run of >= 1 duplicated
    windows, and overlapping duplicated windows merge back into the
    maximal span). One groupBy on the window hash finds duplicates:
    scope='cross_doc' counts distinct documents (within-doc repetition
    is repetition_signals' job), scope='global' counts occurrences.
    With keep_first=True the globally first occurrence of each window
    (lowest (doc_id, start)) is NOT counted as covered — the canonical
    copy of a duplicated passage survives, later copies are flagged,
    matching the keep-one-copy dedup policy.

    Returns (id_col, span_start, span_end, span_tokens): inclusive
    token offsets of each maximal duplicated span.

    Scale shape: window emission is map-only off the doc scan — one
    JVM xxhash64 per TOKEN, then a vectorized Arrow kernel turns each
    doc's token-hash array into its window hashes (numpy
    sliding-window view x polynomial combine in uint64 — per-window
    cost is a fused multiply-add, not an interpreted higher-order
    expression, measured >20x over the transform/slice/xxhash64
    Column form). Duplicate detection is ONE hash-partitioned groupBy
    on a long key with map-side partial aggregation; coverage joins
    back on the same key; span merging is a per-document window scan
    (partition-parallel across docs, the interval-merge via
    running-max trick — no range join). Nothing is broadcast or
    collected; every stage hash-shuffles on window-hash or doc id, so
    the plan survives corpus growth.
    """
    if scope not in ("cross_doc", "global"):
        raise ValueError(f"scope must be 'cross_doc' or 'global', got {scope!r}")
    k = int(min_tokens)
    if k < 2:
        raise ValueError("min_tokens must be >= 2")
    wins = _window_hashes(df, id_col, text_col, k)
    # Per-window-hash stats as WINDOW functions over one hash
    # partitioning instead of groupBy + join-back: the window frame
    # evaluates `wins` once behind a single shuffle on __wh, where the
    # join form re-evaluates the whole window-emission lineage on both
    # sides and pays two more exchanges. Distinct-doc count rides the
    # max(dense_rank ordered by __id) identity — no count_distinct
    # window exists; the skew axis (a window shared corpus-wide) is
    # the same one the groupBy form has.
    w_all = W.partitionBy("__wh")
    stat = (
        F.max(F.dense_rank().over(w_all.orderBy("__id"))).over(w_all)
        if scope == "cross_doc"
        else F.count(F.lit(1)).over(w_all)
    )
    covered = (
        wins.withColumn("__stat", stat)
        .withColumn("__first", F.min(F.struct("__id", "__start")).over(w_all))
        .filter(F.col("__stat") >= 2)
    )
    if keep_first:
        covered = covered.filter(
            ~(
                (F.col("__id") == F.col("__first.__id"))
                & (F.col("__start") == F.col("__first.__start"))
            )
        )
    w_doc = W.partitionBy("__id").orderBy("__start")
    w_prev = w_doc.rowsBetween(W.unboundedPreceding, -1)
    spans = (
        covered.select("__id", "__start", (F.col("__start") + k - 1).alias("__end"))
        .withColumn(
            # a new span starts only when this window's range neither
            # overlaps NOR abuts the furthest end so far — abutting
            # covered ranges ([0,1] + [2,3]) are one maximal run of
            # covered tokens, caught by the property test against the
            # brute-force reference
            "__new",
            F.when(
                F.col("__start")
                > F.coalesce(F.max("__end").over(w_prev), F.lit(-2)) + 1,
                1,
            ).otherwise(0),
        )
        .withColumn("__span", F.sum("__new").over(w_doc))
        .groupBy("__id", "__span")
        .agg(F.min("__start").alias("span_start"), F.max("__end").alias("span_end"))
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )
    return spans


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 20,
    scope: str = "cross_doc",
    keep_first: bool = True,
    out_col: str = "text_cleaned",
) -> DataFrame:
    """Rebuild each document with its duplicated spans (see
    duplicated_spans) removed — the enforcement half of substring
    dedup. Tokens inside any flagged span are dropped; survivors are
    rejoined with single spaces WITHIN each line and the document's
    LINE structure is preserved (lines rejoined with '\\n', a line
    whose every token is covered survives as '') — so downstream
    line-based signals (dup_line_frac, strip_common_lines) still see
    the document's real line layout; only intra-line spacing is
    normalized. With keep_first=True the corpus keeps exactly the
    first copy of every duplicated passage.

    Positions line up exactly with duplicated_spans' global \\s+
    tokenization: each line's non-empty tokens concatenated in line
    order ARE that token sequence, and the per-line cumulative offset
    is one window pass. The span -> token expansion stays relational:
    spans explode to their covered positions (total size = covered
    tokens <= corpus tokens) and tokens drop by left_anti on
    (doc, position) — an equi-join, not a range join."""
    spans = duplicated_spans(df, id_col, text_col, min_tokens, scope, keep_first)
    covered_pos = spans.select(
        F.col(id_col).alias("__id"),
        F.explode(F.sequence("span_start", "span_end")).alias("__pos"),
    )
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit("\n"))
        ).alias("__li", "__line"),
    ).withColumn("__lt", F.expr("filter(split(trim(__line), '\\\\s+'), t -> t != '')"))
    w_prev_lines = (
        W.partitionBy("__id").orderBy("__li").rowsBetween(W.unboundedPreceding, -1)
    )
    lines = lines.withColumn(
        "__off", F.coalesce(F.sum(F.size("__lt")).over(w_prev_lines), F.lit(0))
    )
    toks = lines.select(
        "__id", "__li", "__off", F.posexplode("__lt").alias("__p", "__tok")
    ).withColumn("__pos", F.col("__off") + F.col("__p"))
    kept = toks.join(covered_pos, ["__id", "__pos"], "left_anti")
    rebuilt_lines = kept.groupBy("__id", "__li").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__tok"))),
                lambda x: x["__tok"],
            ),
            " ",
        ).alias("__lr")
    )
    all_lines = (
        lines.select("__id", "__li")
        .join(rebuilt_lines, ["__id", "__li"], "left")
        .withColumn("__lr", F.coalesce("__lr", F.lit("")))
    )
    rebuilt = all_lines.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__li", "__lr"))),
                lambda x: x["__lr"],
            ),
            "\n",
        ).alias(out_col)
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
        .drop("__id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
    )


def _lm_grams(
    df: DataFrame,
    text_col: str,
    n: int,
    id_col: str | None = None,
    keep_empty: bool = False,
):
    """(context, token) rows for every n-gram of every document —
    the ONE tokenization both ngram_lm_train and ngram_lm_score use
    (BOS padding, lowercase, \\s+ split, NULL text ≡ ''), factored so
    train and score can never drift apart on the gram inventory.
    With `id_col`, rows carry the doc id as __id. With `keep_empty`,
    a document yielding zero n-grams still emits ONE row (context and
    token both NULL, via explode_outer) so downstream per-doc
    aggregates see every document without a join back to the input
    (r12, guide §2.4 — the join-back was a whole extra exchange plus
    two sorts at every scale)."""
    bos = " ".join(["<s>"] * (n - 1))
    cols = [F.col(id_col).alias("__id")] if id_col else []
    body = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    full = F.split(
        F.trim(F.concat(F.lit(bos + " " if bos else ""), body)), r"\s+"
    )
    # empty/whitespace-only text has ZERO body tokens — split('')
    # fabricates one '' token, which for unigram models (no BOS pad to
    # keep size below n) would pollute the trained LM's vocabulary with
    # '' and give empty docs a real score instead of the documented
    # (n_scored=0, lm_logprob NULL)
    bos_only = (
        F.split(F.lit(bos), " ")
        if bos
        else F.expr("CAST(array() AS array<string>)")
    )
    toks = df.select(
        *cols,
        F.when(body == "", bos_only).otherwise(full).alias("__t"),
    )
    out_cols = ["__id"] if id_col else []
    gen = F.explode_outer if keep_empty else F.explode
    return toks.select(
        *out_cols,
        gen(
            F.expr(
                f"CASE WHEN size(__t) >= {n} THEN "
                f"transform(sequence(1, size(__t) - {n} + 1),"
                f" i -> struct(array_join(slice(__t, i, {n - 1}), ' ') AS context,"
                f" element_at(__t, i + {n - 1}) AS token)) "
                f"ELSE array() END"
            )
        ).alias("__g"),
    ).select(*out_cols, "__g.context", "__g.token")


def ngram_lm_train(
    df: DataFrame,
    text_col: str,
    n: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Train a corpus n-gram language model: (context, token) counts
    plus context totals, the sufficient statistics for conditional
    token probabilities P(token | previous n-1 tokens).

    This is the model behind the CCNet/RefinedWeb-style perplexity
    quality gate: score candidate documents against an LM trained on
    a trusted corpus (ngram_lm_score) and drop the tails. Tokens are
    lowercased whitespace words with BOS padding, so the first token
    of every document is conditioned and scored like any other.

    Returns (context, token, cnt, ctx_total): `context` is the
    space-joined n-1 previous tokens ('' for unigram models).
    `min_count` prunes rare n-grams AFTER totals are taken, so
    pruning thins the table without biasing surviving estimates.

    Scale shape: one explode of the corpus tokens, ONE hash-partitioned
    groupBy for the n-gram counts, and a context-window total over the
    grouped (already tiny) table — no driver state; the model IS a
    DataFrame, joined (never collected) at scoring time.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    grams = _lm_grams(df, text_col, n)
    counts = grams.groupBy("context", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w_ctx = W.partitionBy("context")
    return counts.withColumn("ctx_total", F.sum("cnt").over(w_ctx)).filter(
        F.col("cnt") >= min_count
    )


def ngram_lm_score(
    df: DataFrame,
    lm: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    alpha: float = 0.1,
    vocab_size: int | None = None,
) -> DataFrame:
    """Score each document against an n-gram LM (ngram_lm_train):
    mean token log-probability under add-alpha smoothing,
    log P(tok|ctx) = log((cnt + alpha) / (ctx_total + alpha * V)).
    Unseen (context, token) pairs fall back to cnt=0 against the
    context's total (unseen contexts: total=0, pure 1/V mass), so
    every token scores and OOV text is penalized, not skipped.

    Returns (id_col, n_scored, lm_logprob) — ONE row per input
    document: lm_logprob is the mean per-token natural-log
    probability (higher = more in-distribution; CCNet keeps the
    head/middle of this distribution), and a document yielding zero
    n-grams (empty/whitespace/NULL text shorter than the order) gets
    n_scored=0 with lm_logprob NULL — no evidence, not a low score,
    so threshold gates must decide explicitly (the curation gate
    passes them through). `vocab_size` defaults to the LM's
    distinct-token count (one tiny agg).

    Scale shape: docs explode to their n-grams once, LEFT join to the
    LM on (context, token) — both sides hash-partitioned on the same
    key; the LM is dim-like after pruning and broadcast-eligible, but
    nothing requires it — then context totals arrive the same way and
    one groupBy(doc) averages. The default vocab size rides in as a
    ONE-ROW broadcast cross join (kept lazy — no driver action at
    plan-build time; pass an explicit `vocab_size` to skip even
    that). Callers scoring repeatedly should `.cache()` the lm frame
    — three plan branches read it (counts, totals, vocab).

    r12 (guide §2.4): zero-gram documents used to be restored by a
    LEFT join back to the input frame — a whole extra exchange of the
    doc ids plus two sorts (the aggregate side's inflated cross-join
    size estimate forced a SortMergeJoin). `_lm_grams(keep_empty=
    True)` now emits ONE (NULL, NULL)-gram sentinel row per zero-gram
    document instead: NULL join keys match nothing, the sentinel's
    log-prob slot stays NULL, and `count(__lp)` / `avg(__lp)` (both
    null-skipping) reproduce exactly the old (0, NULL) contract — no
    join-back at any scale. One row per distinct id (ids are unique
    in every caller; the old form emitted per-input-row duplicates
    for duplicate ids, which no caller relied on). NULL-id docs also
    changed with that form: they now group together and score like
    any other group (the old equi-join back dropped NULL keys, so
    they always got (0, NULL)); callers with NULL ids should filter
    them first. `alpha` must be > 0 — the n_scored = count(__lp)
    identity relies on every real gram's smoothed probability being
    strictly positive (alpha = 0 would give unseen grams log(0) =
    NULL and silently undercount n_scored), so alpha <= 0 raises.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha!r}")
    if vocab_size is None:
        v_col = F.greatest(F.col("__V"), F.lit(1)).cast("double")
        v_df = lm.agg(F.count_distinct("token").alias("__V"))
    else:
        v_col = F.lit(float(vocab_size))
        v_df = None
    grams = _lm_grams(df, text_col, n, id_col=id_col, keep_empty=True)
    ctx_totals = lm.select("context", "ctx_total").distinct()
    scored = grams.join(
        lm.select("context", "token", "cnt"), ["context", "token"], "left"
    ).join(ctx_totals, "context", "left")
    if v_df is not None:
        scored = scored.crossJoin(F.broadcast(v_df))
    # real grams always yield a non-NULL log-prob (the smoothed
    # argument is strictly positive); the sentinel row's slot is NULL,
    # so the null-skipping aggregates below count exactly the grams
    scored = scored.select(
        "__id",
        F.when(
            F.col("token").isNotNull(),
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(float(alpha)))
                / (
                    F.coalesce(F.col("ctx_total"), F.lit(0))
                    + F.lit(float(alpha)) * v_col
                )
            ),
        ).alias("__lp"),
    )
    return scored.groupBy("__id").agg(
        F.count("__lp").alias("n_scored"),
        F.avg("__lp").alias("lm_logprob"),
    ).select(
        F.col("__id").alias(id_col),
        "n_scored",
        "lm_logprob",
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    salt_buckets: int = 64,
) -> DataFrame:
    """Distributed BM25 retrieval: top-``k`` documents per query under
    the Robertson/Lucene BM25 scoring function

        score(q, d) = sum_t idf(t) * tf * (k1+1)
                              / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

    over the whitespace word bag of ``normalized_text`` (the corpus
    layer's canonical tokenizer). This is the retrieval primitive of
    an LLM-data pipeline — benchmark decontamination by query, nearest
    textual neighbors for eval leakage checks, and lexical candidate
    generation in front of the embedding rerankers
    (operators/similarity.py). No reference counterpart — this is part
    of the training-data extension surface.

    Determinism contract (oracle-grade): queries are SMALL literal
    term lists (<= 8 terms). Each (query, doc) score is assembled by
    summing the per-term contributions in FIXED term-index order
    (conditional-max pivot, then a literal left-to-right add), so the
    double is bit-identical on any engine that evaluates the same
    expression tree — no dependence on aggregation order. avgdl is
    computed as exact-integer SUM(dl)/N in one double division for
    the same reason. Ranking orders by the UNROUNDED score with a
    doc-id tie-break; round only at the output boundary.

    100 TB shape: tokens are filtered to the query vocabulary BEFORE
    the (doc, term) tf aggregation, so the only corpus-wide shuffle
    carries just the matching tokens; df counts aggregate that same
    frame (map-side combined); N/avgdl ride in as a ONE-ROW broadcast;
    the query-term table and per-term df are broadcast dims. The
    per-query top-k is the salted two-stage pattern — row_number
    within (query, doc_id % salt_buckets) keeps k per salt bucket,
    then the final (query) window ranks <= k * salt_buckets survivors
    — so no single task ever sorts a whole query's corpus-sized
    posting list.

    Returns (query_id, ``id_col``, rank, score) with score rounded to
    4 dp; exactly min(k, matching docs) rows per query.
    """
    queries = _norm_queries(queries)
    vocab = sorted({t for terms in queries.values() for t in terms})
    words = _bm25_words(df, id_col, text_col)
    # exact-integer corpus stats: one row, broadcast — avgdl is a
    # single double division of two exact integers (bit-stable)
    stats = words.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.size("__w")).alias("__sdl"),
    )
    toks = words.select(
        "__id", F.size("__w").alias("__dl"), F.explode("__w").alias("term")
    ).filter(F.col("term").isin(vocab))
    tfg = toks.groupBy("__id", "term").agg(
        F.count(F.lit(1)).alias("__tf"), F.min("__dl").alias("__dl")
    )
    return _bm25_score(tfg, stats, queries, k, k1, b, salt_buckets, id_col)


def _bm25_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__id, __w): the non-empty normalized word bag per document —
    the shared tokenizer of the in-flight and indexed BM25 paths."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(normalized_text(F.coalesce(F.col(text_col), F.lit(""))), " "),
            lambda w: w != F.lit(""),
        ).alias("__w"),
    )


def _norm_queries(queries: dict[str, list[str]]) -> dict[str, list[str]]:
    """Validate + normalize a query dict for the BM25 entry points:
    documents tokenize through normalized_text (LOWERCASED), so query
    terms must be lowercased the same way or an uppercase term would
    silently match nothing; an empty dict or an empty term list is a
    caller bug and raises instead of crashing later (or returning a
    silently empty result)."""
    if not queries:
        raise ValueError("queries must be a non-empty {query_id: [terms]} dict")
    empties = sorted(q for q, terms in queries.items() if not terms)
    if empties:
        raise ValueError(f"queries {empties} have no terms")
    return {q: [t.lower() for t in terms] for q, terms in queries.items()}


def _bm25_score(
    tfg: DataFrame,
    stats: DataFrame,
    queries: dict[str, list[str]],
    k: int,
    k1: float,
    b: float,
    salt_buckets: int,
    id_col: str,
) -> DataFrame:
    """Shared BM25 scoring tail over a (__id, term, __tf, __dl) term
    frequency frame already restricted to the query vocabulary, plus a
    one-row (__n, __sdl) corpus-stats frame. Both the in-flight
    operator and the persisted-index probe end here, so index ≡
    in-flight is structural, not coincidental."""
    spark = tfg.sparkSession
    max_terms = max(len(t) for t in queries.values())
    # r12 (guide §7.3): the query dim, the per-term contribution and
    # the fixed-order slot sum all build as SINGLE SQL strings — the
    # old createDataFrame + Column-loop forms cost ~0.3 s of driver
    # py4j/analysis per build, paid by BOTH bm25 call sites. Literals
    # use repr() doubles (exact shortest round-trip) with the D
    # suffix, so the parsed trees are bit-identical to the old
    # F.lit doubles.
    esc = lambda s: s.replace("'", "''")  # noqa: E731
    qvals = ", ".join(
        f"('{esc(qid)}', {i + 1}, '{esc(term)}')"
        for qid, terms in sorted(queries.items())
        for i, term in enumerate(terms)
    )
    qdf = spark.sql(
        f"SELECT col1 AS query_id, CAST(col2 AS INT) AS tidx, col3 AS term "
        f"FROM VALUES {qvals}"
    )
    dfreq = tfg.groupBy("term").agg(F.expr("count(1)").alias("__df"))

    contrib_sql = (
        f"log({1.0!r}D + (__n - __df + {0.5!r}D) / (__df + {0.5!r}D)) "
        f"* (__tf * {k1 + 1.0!r}D) "
        f"/ (__tf + {float(k1)!r}D * ({1.0 - b!r}D "
        f"+ {float(b)!r}D * __dl / (CAST(__sdl AS DOUBLE) / __n)))"
    )
    scored_terms = (
        tfg.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .selectExpr("query_id", "__id", "tidx", f"({contrib_sql}) AS __c")
    )
    # fixed-order sum: pivot each term slot out, add left-to-right
    score_sql = " + ".join(
        f"coalesce(max(CASE WHEN tidx = {i} THEN __c END), {0.0!r}D)"
        for i in range(1, max_terms + 1)
    )
    scores = scored_terms.groupBy("query_id", "__id").agg(
        F.expr(score_sql).alias("__score")
    )

    # salted two-stage per-query top-k (operators/topk.grouped_topk):
    # (__score desc, __id asc) is a total order, so the salted form is
    # exactly the plain window's answer with no corpus-sized partition
    from .topk import grouped_topk

    return grouped_topk(
        scores,
        ["query_id"],
        [F.desc("__score"), F.asc("__id")],
        k,
        salt_col="__id",
        salt_buckets=salt_buckets,
    ).select(
        "query_id",
        F.col("__id").alias(id_col),
        "rank",
        F.round("__score", 4).alias("score"),
    )


# ---------------------------------------------------------------------------
# Persisted BM25 inverted index (build once, probe many)
# ---------------------------------------------------------------------------

BM25_TERM_BUCKETS = 64


def _term_bucket(term: F.Column) -> F.Column:
    """Partition bucket of a term — portable-family md5-60-bit hash mod
    BM25_TERM_BUCKETS, nonnegative in both engines."""
    return (
        F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")
        % BM25_TERM_BUCKETS
    )


def _term_bucket_py(term: str) -> int:
    """Driver-side mirror of _term_bucket for probe-time pruning."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % BM25_TERM_BUCKETS


def bm25_build_index(
    df: DataFrame, id_col: str, text_col: str, out_dir: str
) -> None:
    """Materialize the corpus as a BM25 inverted index:

    - ``out_dir/postings``: (__id, term, __tf, __dl) over the FULL
      vocabulary, written `partitionBy` the term's md5 bucket — the
      text-retrieval analog of the persisted IVF index's list dirs: a
      probe's PartitionFilters open only the buckets its query terms
      hash to, never the whole postings table.
    - ``out_dir/stats``: one (n, sdl) row of exact-integer corpus
      stats. Stored SUMMABLE (the probe aggregates all stats rows), so
      bm25_append_index just appends another row.

    Build is one tokenize + one (doc, term) groupBy — the same work a
    single in-flight query does, paid once. At 100 TB the index is the
    only way repeated retrieval is affordable: per query the probe
    reads a handful of term buckets instead of re-tokenizing the
    corpus."""
    from .tombstones import drop_tombstones, replace_dir

    spark = df.sparkSession
    words = _bm25_words(df, id_col, text_col)
    toks = words.select(
        "__id", F.size("__w").alias("__dl"), F.explode("__w").alias("term")
    )
    postings = (
        toks.groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("__tf"), F.min("__dl").alias("__dl"))
        .withColumn("tb", _term_bucket(F.col("term")))
    )
    # full-REBUILD semantics when out_dir already holds an index:
    # every relation rewrites via replace_dir (a bare partitioned
    # overwrite under partitionOverwriteMode=dynamic would keep ghost
    # postings in term buckets the new corpus never touches — verified
    # to resurrect old-corpus docs in probes), and the previous
    # generation's tombstones are dropped LAST (they refer to the old
    # index; carried over, they would silently exclude freshly-indexed
    # ids that reuse a tombstoned id)
    replace_dir(
        spark, f"{out_dir}/postings",
        lambda p: postings.write.partitionBy("tb").parquet(p),
    )
    replace_dir(
        spark, f"{out_dir}/stats",
        lambda p: words.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.size("__w")).alias("sdl")
        ).write.parquet(p),
    )
    # per-doc (id, dl) sidecar — deletes compensate stats from THIS
    # relation, not from postings: a doc whose text tokenizes to zero
    # words has no postings rows but did contribute n+=1 at build time,
    # and only the sidecar remembers it.
    replace_dir(
        spark, f"{out_dir}/docs",
        lambda p: words.select("__id", F.size("__w").alias("__dl")).write.parquet(p),
    )
    drop_tombstones(spark, out_dir)


def bm25_append_index(
    df: DataFrame, id_col: str, text_col: str, index_dir: str
) -> None:
    """Add a document batch to an existing index without rebuilding:
    the batch's postings append into their term-bucket dirs and its
    (n, sdl) stats land as one more summable row. append ≡ rebuild on
    the union corpus (asserted in tests) because postings rows are
    per-(doc, term) and the probe sums all stats rows — df/idf/avgdl
    derive identically either way."""
    from ..manifest import resolved_dir

    spark = df.sparkSession
    words = _bm25_words(df, id_col, text_col)
    toks = words.select(
        "__id", F.size("__w").alias("__dl"), F.explode("__w").alias("term")
    )
    # appends land in each relation's LIVE manifest tree — new files
    # only, never a replace, so the log-structured append stays
    # object-store-safe (manifest.resolved_dir; legacy plain indexes
    # resolve to the root dir unchanged)
    (
        toks.groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("__tf"), F.min("__dl").alias("__dl"))
        .withColumn("tb", _term_bucket(F.col("term")))
        .write.mode("append")
        .partitionBy("tb")
        .parquet(resolved_dir(spark, f"{index_dir}/postings"))
    )
    words.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("__w")).alias("sdl")
    ).write.mode("append").parquet(resolved_dir(spark, f"{index_dir}/stats"))
    words.select("__id", F.size("__w").alias("__dl")).write.mode(
        "append"
    ).parquet(resolved_dir(spark, f"{index_dir}/docs"))


def bm25_search_index(
    spark,
    index_dir: str,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    salt_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 retrieval against a persisted index: prune the
    postings scan to the query terms' buckets (PartitionFilters — the
    unprobed bucket dirs never open, plan-asserted in tests), filter
    to the exact vocabulary, fold the summable stats rows to one
    (__n, __sdl) row, and run the SAME scoring tail as bm25_topk —
    results are identical to the in-flight operator by construction
    (asserted)."""
    queries = _norm_queries(queries)
    vocab = sorted({t for terms in queries.values() for t in terms})
    buckets = sorted({_term_bucket_py(t) for t in vocab})
    postings = (
        _bm25_live_postings(spark, index_dir)
        .filter(F.col("tb").isin(buckets))
        .filter(F.col("term").isin(vocab))
        .select("__id", "term", "__tf", "__dl")
    )
    from ..manifest import read_relation

    stats = read_relation(spark, f"{index_dir}/stats").agg(
        F.sum("n").alias("__n"), F.sum("sdl").alias("__sdl")
    )
    return _bm25_score(postings, stats, queries, k, k1, b, salt_buckets, id_col)


def bm25_delete_from_index(
    df_or_ids: DataFrame, index_dir: str, id_col: str = "__id"
) -> None:
    """Delete documents from a persisted BM25 index WITHOUT rewriting
    the postings: the doomed ids append to ``index_dir/tombstones``
    and every probe anti-joins them (bm25_search_index) — the
    log-structured delete pattern (tombstone now, compact later), the
    index analog of sources/versioned.delete_commit.

    Correctness: a tombstoned doc vanishes from results exactly as if
    the index were rebuilt without it — its postings rows are dropped
    before scoring, and the stats row it contributed is compensated by
    appending a NEGATIVE (n, sdl) row (the stats fold is a plain SUM,
    so compensation is exact). delete ≡ rebuild-without is asserted in
    tests. The compensation derives from the LIVE per-doc sidecar
    (``index_dir/docs`` anti-joined against existing tombstones), never
    from the caller and never from raw postings, which makes three edge
    cases exact: a never-indexed id contributes nothing, a zero-token
    doc (no postings rows, but n+=1 at build) is still compensated, and
    re-deleting an already-tombstoned id yields a zero row instead of
    double-subtracting — repeated deletes are idempotent."""
    spark = df_or_ids.sparkSession
    ids = df_or_ids.select(F.col(id_col).alias("__id")).distinct()
    from ..manifest import read_relation, resolved_dir
    from .tombstones import append_tombstones, filter_tombstones

    doomed_docs = filter_tombstones(
        spark, index_dir, read_relation(spark, f"{index_dir}/docs"), "__id"
    ).join(F.broadcast(ids), "__id", "left_semi")
    comp = doomed_docs.agg(
        (-F.count(F.lit(1))).alias("n"),
        (-F.coalesce(F.sum("__dl"), F.lit(0))).alias("sdl"),
    )
    n_doomed, _ = comp.first()
    if n_doomed != 0:  # no-op deletes (unknown or re-deleted ids) add no row
        comp.write.mode("append").parquet(resolved_dir(spark, f"{index_dir}/stats"))
    append_tombstones(ids, index_dir, "__id")


def bm25_compact_index(spark, index_dir: str) -> None:
    """Physically rewrite the inverted index WITHOUT its tombstoned
    docs: live postings rewritten into their term-bucket dirs, the
    per-doc sidecar filtered, the summable stats rows (including every
    negative compensation row) collapsed to one, and the tombstone set
    reset. After compact a deleted doc's terms no longer exist in
    postings storage — the HARD-erasure half of the log-structured
    delete ("tombstone now, compact later"). Each relation rewrites
    via replace_dir (write survivors into a fresh manifest tree, one
    marker-file commit — object-store-safe since r8): the old tree is
    never retired while the only copy of
    the survivors is volatile, and the fresh-dir write is immune to
    the session's partitionOverwriteMode (an in-place dynamic
    overwrite would silently keep fully-tombstoned term buckets on
    disk — a hard-erasure failure). Probe results unchanged by
    construction (asserted in tests)."""
    from ..manifest import read_relation
    from .tombstones import drop_tombstones, filter_tombstones, replace_dir

    live_post = _bm25_live_postings(spark, index_dir)
    live_docs = filter_tombstones(
        spark, index_dir, read_relation(spark, f"{index_dir}/docs"), "__id"
    )
    stats = read_relation(spark, f"{index_dir}/stats").agg(
        F.sum("n").alias("n"), F.sum("sdl").alias("sdl")
    )
    replace_dir(
        spark, f"{index_dir}/postings",
        lambda p: live_post.write.partitionBy("tb").parquet(p),
    )
    replace_dir(spark, f"{index_dir}/docs", lambda p: live_docs.write.parquet(p))
    replace_dir(
        spark, f"{index_dir}/stats", lambda p: stats.coalesce(1).write.parquet(p)
    )
    drop_tombstones(spark, index_dir)


def _bm25_live_postings(spark, index_dir: str) -> DataFrame:
    """Postings minus tombstones (if any) — the probe's view
    (operators/tombstones.py, shared with the minhash and IVF
    indexes)."""
    from ..manifest import read_relation
    from .tombstones import filter_tombstones

    return filter_tombstones(
        spark, index_dir, read_relation(spark, f"{index_dir}/postings"), "__id"
    )
