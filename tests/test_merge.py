"""MERGE library property tests (SURVEY.md §5: idempotency is the
invariant the reference claims for its incremental loads)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.merge import (
    insert_if_absent,
    merge_replace,
    merge_replace_with_audit,
)
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_merge_replace_idempotent(spark):
    old = load_table(spark, SF, "supplier")
    new = old.filter(F.col("s_suppkey") % 7 == 0).withColumn(
        "s_name", F.concat(F.col("s_name"), F.lit("+delta"))
    )
    once = merge_replace(old, new, ["s_suppkey"])
    twice = merge_replace(once, new, ["s_suppkey"])
    assert _canon(once) == _canon(twice)


def test_merge_replace_new_wins(spark):
    old = load_table(spark, SF, "supplier")
    new = old.filter(F.col("s_suppkey") == 0).withColumn("s_name", F.lit("REPLACED"))
    merged = merge_replace(old, new, ["s_suppkey"])
    assert merged.count() == old.count()
    assert merged.filter(F.col("s_suppkey") == 0).collect()[0].s_name == "REPLACED"


def test_insert_if_absent_old_wins_and_idempotent(spark):
    target = load_table(spark, SF, "supplier")
    conflicting = target.limit(5).withColumn("s_name", F.lit("SHOULD_NOT_APPEAR"))
    fresh = target.limit(3).withColumn("s_suppkey", F.col("s_suppkey") + 10_000)
    src = conflicting.unionByName(fresh)
    once = insert_if_absent(target, src, ["s_suppkey"])
    assert once.count() == target.count() + 3
    assert once.filter(F.col("s_name") == "SHOULD_NOT_APPEAR").count() == 0
    twice = insert_if_absent(once, src, ["s_suppkey"])
    assert _canon(once) == _canon(twice)


def test_insert_if_absent_dedupes_source_keys(spark):
    """ON CONFLICT DO NOTHING keeps only the first source row per key
    when the SOURCE repeats a key (`scr/Load.py:276-302`): later rows
    conflict with the just-inserted one. The distributed form keeps
    the deterministic lowest row by the non-key columns."""
    target = load_table(spark, SF, "supplier")
    fresh_a = target.limit(4).withColumn("s_suppkey", F.col("s_suppkey") + 10_000).withColumn(
        "s_name", F.lit("a-first")
    )
    fresh_b = fresh_a.withColumn("s_name", F.lit("b-second"))
    src = fresh_b.unionByName(fresh_a)  # union order must not matter
    out = insert_if_absent(target, src, ["s_suppkey"])
    assert out.count() == target.count() + 4
    inserted = out.filter(F.col("s_suppkey") >= 10_000)
    assert inserted.filter(F.col("s_name") == "a-first").count() == 4
    assert inserted.filter(F.col("s_name") == "b-second").count() == 0


def test_merge_replace_broadcast_src_same_result(spark):
    """The broadcast_src variant (M2 dimension upsert — small delta
    against a large target) must be value-identical to the shuffled
    form and actually plan a broadcast join."""
    target = load_table(spark, SF, "supplier")
    src = target.limit(10).withColumn("s_name", F.lit("v2"))
    plain = merge_replace(target, src, ["s_suppkey"])
    bcast = merge_replace(target, src, ["s_suppkey"], broadcast_src=True)
    assert _canon(plain) == _canon(bcast)
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()


def test_merge_audit_counts(spark):
    old = load_table(spark, SF, "supplier").cache()
    new = old.limit(10).withColumn("s_name", F.lit("v2")).cache()
    merged, audit = merge_replace_with_audit(old, new, ["s_suppkey"])
    assert audit.target_rows == old.count()
    assert audit.source_rows == 10
    assert audit.result_rows == old.count()  # pure update, no inserts
    assert audit.replaced_or_skipped == 10


# -- randomized idempotency / new-wins properties (hypothesis) ----------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    keyed = st.dictionaries(st.integers(0, 20), st.integers(-5, 5), max_size=25)

    @given(old=keyed, new=keyed)
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_merge_replace_properties(spark, old, new):
        from etl_football_analytics_pipeline_spark.operators.merge import merge_replace

        schema = "k long, v long"
        old_df = spark.createDataFrame(sorted(old.items()), schema) if old else spark.createDataFrame([], schema)
        new_df = spark.createDataFrame(sorted(new.items()), schema) if new else spark.createDataFrame([], schema)
        out = merge_replace(old_df, new_df, ["k"])
        got = {r.k: r.v for r in out.collect()}
        expect = dict(old)
        expect.update(new)
        # key set = union; every key present in new carries new's value
        assert got == expect
        # idempotent: merging the same delta again changes nothing
        out2 = merge_replace(out, new_df, ["k"])
        assert {r.k: r.v for r in out2.collect()} == got


def test_merges_are_null_safe_on_keys(spark):
    """NULL key components must compare null-safely: a NULL-keyed row
    already in the target is SEEN (re-loads stay idempotent), and a
    NULL-keyed old row is replaced by its NULL-keyed update."""
    from etl_football_analytics_pipeline_spark.operators.merge import (
        insert_if_absent,
        merge_replace,
    )

    t = spark.createDataFrame(
        [(1, "a"), (None, "b")], "k int, v string"
    )
    # re-inserting the same frame is a no-op, including the NULL key
    again = insert_if_absent(t, t, ["k"])
    assert sorted(map(tuple, again.collect()), key=str) == sorted(
        map(tuple, t.collect()), key=str
    )
    # new-wins replacement reaches the NULL-keyed row too
    upd = spark.createDataFrame([(None, "B")], "k int, v string")
    out = sorted(map(tuple, merge_replace(t, upd, ["k"]).collect()), key=str)
    assert out == sorted([(1, "a"), (None, "B")], key=str)
