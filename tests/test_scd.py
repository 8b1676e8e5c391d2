"""SCD Type-2 history + snapshot CDC (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.scd import (
    scd2_apply,
    scd2_build,
    table_diff,
)


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _feed(spark):
    # key 1: A@1, A@2 (no-op, collapses), B@3, B@5 (no-op), A@7
    # key 2: X@2 only
    # key 3: null@1, Y@4  (null attr is a real state)
    rows = [
        (1, "A", _ts(1), 10),
        (1, "A", _ts(2), 11),
        (1, "B", _ts(3), 12),
        (1, "B", _ts(5), 13),
        (1, "A", _ts(7), 14),
        (2, "X", _ts(2), 15),
        (3, None, _ts(1), 16),
        (3, "Y", _ts(4), 17),
    ]
    return spark.createDataFrame(rows, "k int, attr string, ts timestamp, src_id int")


def test_scd2_build_collapses_and_orders(spark):
    hist = scd2_build(_feed(spark), ["k"], ["attr"], "ts", "src_id")
    got = {
        (r.k, r.version): (r.attr, r.effective_from, r.effective_to, r.is_current)
        for r in hist.collect()
    }
    assert got[(1, 1)] == ("A", _ts(1), _ts(3), False)
    assert got[(1, 2)] == ("B", _ts(3), _ts(7), False)
    assert got[(1, 3)] == ("A", _ts(7), None, True)
    assert got[(2, 1)] == ("X", _ts(2), None, True)
    assert got[(3, 1)] == (None, _ts(1), _ts(4), False)
    assert got[(3, 2)] == ("Y", _ts(4), None, True)
    assert len(got) == 6
    # exactly one current row per key
    cur = hist.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_build_equal_ts_tiebreak(spark):
    rows = [(1, "B", _ts(1), 2), (1, "A", _ts(1), 1)]
    feed = spark.createDataFrame(rows, "k int, attr string, ts timestamp, src_id int")
    hist = scd2_build(feed, ["k"], ["attr"], "ts", "src_id")
    got = {r.version: r.attr for r in hist.collect()}
    assert got == {1: "A", 2: "B"}  # src_id breaks the ts tie


def test_scd2_apply_closes_opens_and_passes_through(spark):
    hist = scd2_build(_feed(spark), ["k"], ["attr"], "ts", "src_id")
    snap = spark.createDataFrame(
        [(1, "Z"), (3, "Y"), (9, "NEW")], "k int, attr string"
    )  # k=1 changed, k=3 unchanged, k=2 unobserved, k=9 new
    out = scd2_apply(hist, snap, ["k"], ["attr"], _ts(9))
    rows = {(r.k, r.version): r for r in out.collect()}
    assert len(rows) == 8  # 6 prior + 1 replacement + 1 new key
    closed = rows[(1, 3)]
    assert closed.attr == "A" and closed.effective_to == _ts(9) and not closed.is_current
    opened = rows[(1, 4)]
    assert opened.attr == "Z" and opened.effective_from == _ts(9) and opened.is_current
    assert rows[(3, 2)].is_current and rows[(3, 2)].attr == "Y"  # unchanged
    assert rows[(2, 1)].is_current  # unobserved key untouched
    new = rows[(9, 1)]
    assert new.attr == "NEW" and new.is_current and new.effective_from == _ts(9)
    # idempotence: re-applying the same snapshot changes nothing
    again = scd2_apply(out, snap, ["k"], ["attr"], _ts(10))
    assert again.count() == out.count()
    assert (
        again.filter("is_current").count() == out.filter("is_current").count()
    )


def test_table_diff_images_and_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, None, 3.0), (5, "e", 5.0)],
        "k int, s string, v double",
    )
    d = {r.k: r for r in table_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert set(d) == {2, 4, 5}  # 1 and 3 (null-safe equal) unchanged
    assert d[2].change_type == "update" and d[2].old_s == "b" and d[2].new_s == "B"
    assert d[4].change_type == "delete" and d[4].new_s is None and d[4].old_v == 4.0
    assert d[5].change_type == "insert" and d[5].old_s is None and d[5].new_v == 5.0


def test_scd2_single_shuffle_plan(spark):
    """The history build is one hash exchange on the key."""
    feed = _feed(spark)
    plan = scd2_build(feed, ["k"], ["attr"], "ts", "src_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_table_diff_prunes_columns(spark, sf_dir):
    """Only key + compare columns reach the parquet scan."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.filter(F.col("o_orderkey") % 3 != 0)
    new = orders.filter(F.col("o_orderkey") % 2 == 0)
    plan = (
        table_diff(old, new, ["o_orderkey"], ["o_orderstatus"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "o_totalprice" not in plan


def test_scd2_lookup_point_in_time(spark):
    from etl_football_analytics_pipeline_spark.operators.scd import scd2_lookup

    hist = scd2_build(_feed(spark), ["k"], ["attr"], "ts", "src_id")
    facts = spark.createDataFrame(
        [
            (100, 1, _ts(1)),   # at interval start → A
            (101, 1, _ts(2)),   # inside [1,3) → A
            (102, 1, _ts(3)),   # boundary → B (half-open)
            (103, 1, _ts(20)),  # current → A (v3)
            (104, 2, _ts(1)),   # before key 2's first interval → dropped
            (105, 9, _ts(5)),   # unknown key → dropped
        ],
        "fact_id int, k int, ts timestamp",
    )
    got = {r.fact_id: (r.attr, r.version) for r in scd2_lookup(facts, hist, ["k"], "ts").collect()}
    assert got == {100: ("A", 1), 101: ("A", 1), 102: ("B", 2), 103: ("A", 3)}


def test_scd2_lookup_at_most_one_match(spark):
    """Same-timestamp change bursts create empty intervals; the
    half-open predicate keeps every fact's match unique."""
    from etl_football_analytics_pipeline_spark.operators.scd import scd2_lookup

    rows = [(1, "A", _ts(1), 1), (1, "B", _ts(1), 2), (1, "C", _ts(1), 3)]
    feed = spark.createDataFrame(rows, "k int, attr string, ts timestamp, src_id int")
    hist = scd2_build(feed, ["k"], ["attr"], "ts", "src_id")
    facts = spark.createDataFrame([(1, 1, _ts(1)), (2, 1, _ts(9))], "fact_id int, k int, ts timestamp")
    got = scd2_lookup(facts, hist, ["k"], "ts").collect()
    assert len(got) == 2
    assert all(r.attr == "C" for r in got)  # only the surviving burst state matches


# -- randomized SCD2 equivalence (hypothesis) ---------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    # per key: a few (day, attr) observations on distinct days
    feeds = st.dictionaries(
        keys=st.integers(1, 4),
        values=st.lists(
            st.tuples(st.integers(1, 5), st.sampled_from(["A", "B", "C", None])),
            min_size=1,
            max_size=5,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=4,
    )

    @given(feed=feeds)
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_scd2_apply_fold_equals_build(spark, feed):
        """THE SCD2 equivalence: folding day-by-day snapshots through
        scd2_apply produces byte-identical history to scd2_build on
        the concatenated change feed — close timestamps, version
        numbers, is_current flags, no-op collapses, null attrs, all
        of it. This is what makes the streaming sink
        (streaming/history.py) the batch operator run incrementally."""
        from etl_football_analytics_pipeline_spark.operators.scd import (
            scd2_apply,
            scd2_build,
        )

        rows = [
            (k, attr, _ts(day), k * 100 + day)
            for k, obs in feed.items()
            for day, attr in obs
        ]
        full = spark.createDataFrame(
            rows, "k int, attr string, ts timestamp, src_id int"
        )
        expect = sorted(map(tuple, scd2_build(full, ["k"], ["attr"], "ts", "src_id").collect()), key=repr)

        days = sorted({day for obs in feed.values() for day, _ in obs})
        first = [r for r in rows if r[2] == _ts(days[0])]
        dim = scd2_build(
            spark.createDataFrame(first, "k int, attr string, ts timestamp, src_id int"),
            ["k"], ["attr"], "ts", "src_id",
        )
        for d in days[1:]:
            snap_rows = [(r[0], r[1]) for r in rows if r[2] == _ts(d)]
            snap = spark.createDataFrame(snap_rows, "k int, attr string")
            # truncate the fold's lineage — without this, each apply
            # stacks a full-outer join + unions on the previous plan and
            # analysis time grows superlinearly with the day count
            dim = scd2_apply(dim, snap, ["k"], ["attr"], _ts(d)).localCheckpoint()
        got = sorted(map(tuple, dim.collect()), key=repr)
        assert got == expect


def test_scd2_apply_rejects_out_of_order_snapshot(spark):
    """An observation time EARLIER than the current row's own start
    would write an empty closed interval and an overlapping
    replacement (scd2_lookup would match twice) — it must raise."""
    import datetime as dt

    import pytest as _pytest

    from etl_football_analytics_pipeline_spark.operators.scd import (
        scd2_apply,
        scd2_build,
    )

    feed = spark.createDataFrame(
        [("k", "v1", dt.datetime(2024, 1, 5), 1)],
        "key string, attr string, ts timestamp, tb long",
    )
    dim = scd2_build(feed, ["key"], ["attr"], "ts", "tb")
    late = spark.createDataFrame([("k", "v2")], "key string, attr string")
    with _pytest.raises(Exception, match="effective_from"):
        scd2_apply(
            dim, late, ["key"], ["attr"], dt.datetime(2024, 1, 3)
        ).collect()


def test_scd2_apply_dedupes_dirty_snapshot_keys(spark):
    """A snapshot repeating a key must not fan out the join into
    duplicate closed rows and two is_current rows per key."""
    import datetime as dt

    from etl_football_analytics_pipeline_spark.operators.scd import (
        scd2_apply,
        scd2_build,
    )

    feed = spark.createDataFrame(
        [("k", "v1", dt.datetime(2024, 1, 1), 1)],
        "key string, attr string, ts timestamp, tb long",
    )
    dim = scd2_build(feed, ["key"], ["attr"], "ts", "tb")
    dirty = spark.createDataFrame(
        [("k", "v2"), ("k", "v3")], "key string, attr string"
    )
    out = scd2_apply(dim, dirty, ["key"], ["attr"], dt.datetime(2024, 1, 2))
    rows = out.filter("key = 'k'").collect()
    current = [r for r in rows if r.is_current]
    assert len(current) == 1
    assert current[0].attr == "v2"  # deterministic survivor: lowest attr
    assert len(rows) == 2  # one closed + one current


def test_scd2_apply_order_col_keeps_latest(spark):
    """ADVICE r7: the dirty-snapshot dedup kept the LOWEST row by
    attrs — a stable arbitrary pick that can silently prefer the older
    payload. With order_col the highest observation time wins. (Map
    columns stay out of SCD2 attrs entirely: change detection needs
    `<=>`, which does not order maps — the dedup tiebreak now filters
    to orderable attrs so it can never be the first thing to crash.)"""
    hist = scd2_build(_feed(spark), ["k"], ["attr"], "ts", "src_id")
    dirty = spark.createDataFrame(
        [(1, "OLDER", _ts(8)), (1, "NEWER", _ts(9)), (9, "NEW", _ts(9))],
        "k int, attr string, seen_at timestamp",
    )
    out = scd2_apply(
        hist, dirty.select("k", "attr", "seen_at"), ["k"], ["attr"],
        _ts(9), order_col="seen_at",
    )
    cur = {r.k: r.attr for r in out.filter("is_current").collect()}
    assert cur[1] == "NEWER" and cur[9] == "NEW"


def test_scd2_apply_order_col_honored_with_empty_attrs(spark):
    """ADVICE r8: the ordering branch was gated on attr_cols, so a
    key-only dimension silently ignored a supplied order_col and kept
    an arbitrary dropDuplicates survivor. The dedup must honor the
    recency intent regardless — observable through which row's
    PER-ROW observation time (a Column snapshot_ts) the opened
    version carries."""
    import pyspark.sql.functions as F

    dim = scd2_build(
        spark.createDataFrame([(1, _ts(1))], "k int, seen_at timestamp"),
        ["k"], [], "seen_at", "k",
    )
    snap = spark.createDataFrame(
        [(2, _ts(5)), (2, _ts(9))], "k int, seen_at timestamp"
    )
    out = scd2_apply(dim, snap, ["k"], [], F.col("seen_at"),
                     order_col="seen_at")
    opened = out.filter("k = 2").collect()
    assert len(opened) == 1
    assert opened[0].effective_from == _ts(9)  # latest observation won


def test_scd2_apply_rejects_key_order_col(spark):
    """An order_col that is also a key is constant within each key
    partition — the recency intent is unsatisfiable; refuse loudly
    (ADVICE r8)."""
    import pytest as _pytest

    dim = scd2_build(_feed(spark), ["k"], ["attr"], "ts", "src_id")
    snap = spark.createDataFrame([(1, "x")], "k int, attr string")
    with _pytest.raises(ValueError, match="key column"):
        scd2_apply(dim, snap, ["k"], ["attr"], _ts(9), order_col="k")
