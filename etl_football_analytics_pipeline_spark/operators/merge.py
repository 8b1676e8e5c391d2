"""MERGE library — the reference's most distinctive behavior (M1-M3).

The reference implements three flavors of keyed upsert:
- raw-layer incremental MERGE, new-wins (`scr/Extract.py:262-303`),
- dimension UPSERT `ON CONFLICT DO UPDATE` (`scr/Load.py:79-89` etc.),
- fact insert-if-absent `ON CONFLICT DO NOTHING` (`scr/Load.py:276-302`),
all via per-row psycopg2 `executemany` round-trips.

Spark has no transactional MERGE over plain parquet, but the relational
content of all three is the same anti-join + union, which Catalyst
plans as a single shuffled (or broadcast) join — a bulk set operation
instead of N network round-trips. At cluster scale the anti-join
shuffles both sides by the key; if the delta is small relative to the
target, pass `broadcast_src=True` to broadcast it and leave the target
unshuffled.

Note on atomicity: writing the merged result back over the target's
parquet location is not atomic (documented SURVEY.md §7 risk); a
transactional table format (Delta/Iceberg) slots in behind the same
function signatures.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class MergeAudit:
    """A11 — inserted/updated/skipped counts the reference logs at
    `scr/Load.py:291-302,351-363,443-455`."""

    target_rows: int
    source_rows: int
    result_rows: int

    @property
    def replaced_or_skipped(self) -> int:
        return self.target_rows + self.source_rows - self.result_rows


def merge_replace(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    broadcast_src: bool = False,
) -> DataFrame:
    """M1/M2 — keyed MERGE, new-wins: rows of `old` whose key tuple
    appears in `new` are replaced; unique old rows are kept.

    ≡ `old[~old.key.isin(new.key)] + new` (`scr/Extract.py:285-293`) and
    ≡ `INSERT ... ON CONFLICT (pk) DO UPDATE` (`scr/Load.py:79-89`).
    Idempotent: merge_replace(merge_replace(t, s), s) == merge_replace(t, s).

    Source key-uniqueness is the CALLER'S contract: a source that
    repeats a key passes every copy through (the old row is replaced
    by ALL of them), leaving duplicate keys in the result. That
    mirrors the relational content (`old ∖ keys(new) ∪ new`), but note
    Postgres would ERROR on the equivalent statement ("cannot affect
    row a second time") rather than duplicate — callers merging feeds
    that can repeat keys must pick a survivor first (see
    streaming.windowed.merge_sink, which keeps the deterministic
    first row per key, or insert_if_absent's dedup rule)."""
    keys = list(keys)
    # NULL-SAFE key comparison: a plain on=keys anti-join never matches
    # NULL key components, so a NULL-keyed old row could never be
    # replaced and every re-load would append the NULL-keyed new rows
    # again — breaking the idempotence the raw/warehouse loads promise.
    # eqNullSafe treats NULL = NULL as a match, like the reference's
    # pandas isin over object keys.
    src_keys = new.select(
        *[F.col(k).alias(f"__mk_{k}") for k in keys]
    ).dropDuplicates()
    if broadcast_src:
        src_keys = F.broadcast(src_keys)
    cond = None
    for k in keys:
        c = old[k].eqNullSafe(src_keys[f"__mk_{k}"])
        cond = c if cond is None else cond & c
    survivors = old.join(src_keys, cond, "left_anti")
    return survivors.unionByName(new)


def upsert(target: DataFrame, src: DataFrame, pk: Sequence[str], **kw) -> DataFrame:
    """M2 — alias of merge_replace with warehouse naming (dims load,
    `scr/Load.py:79-222`)."""
    return merge_replace(target, src, pk, **kw)


def insert_if_absent(
    target: DataFrame,
    src: DataFrame,
    pk: Sequence[str],
    broadcast_target_keys: bool = False,
) -> DataFrame:
    """M3 — keyed insert, old-wins: only src rows whose key tuple is
    absent from target are appended; conflicting src rows are skipped.

    ≡ `INSERT ... ON CONFLICT (pk) DO NOTHING` (`scr/Load.py:276-302`).
    Postgres also keeps only the FIRST source row when the source
    itself repeats a key (later rows conflict with the just-inserted
    one), so src is deduplicated by pk first. Row order is undefined
    in a distributed frame, so "first" is made deterministic: lowest
    row by the remaining columns' sort order (a row_number window
    keyed on pk — one extra shuffle on the same key the anti-join
    needs anyway). Idempotent by construction.
    """
    pk = list(pk)
    extra = [c for c in src.columns if c not in pk]
    if extra:
        w = Window.partitionBy(*pk).orderBy(*[F.asc(c) for c in extra])
        src = (
            src.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        src = src.dropDuplicates(pk)
    # null-safe anti-join, same rationale as merge_replace: a
    # NULL-keyed row that already exists in the target must be seen as
    # present, or every re-load appends it again
    tkeys = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in pk]
    ).dropDuplicates()
    if broadcast_target_keys:
        tkeys = F.broadcast(tkeys)
    cond = None
    for k in pk:
        c = src[k].eqNullSafe(tkeys[f"__tk_{k}"])
        cond = c if cond is None else cond & c
    fresh = src.join(tkeys, cond, "left_anti")
    return target.unionByName(fresh)


def merge_replace_with_audit(
    old: DataFrame, new: DataFrame, keys: Sequence[str], **kw
) -> tuple[DataFrame, MergeAudit]:
    """merge_replace plus the reference's row-count audit. Triggers
    actions (counts) — call on cached inputs when auditing."""
    result = merge_replace(old, new, keys, **kw)
    return result, MergeAudit(old.count(), new.count(), result.count())
