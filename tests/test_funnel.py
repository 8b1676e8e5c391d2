"""funnel_steps: ordered-step conversion — anchor semantics, horizon,
partial depth, and determinism."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.funnel import funnel_steps


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)) for u, t, m in rows],
        "user_id long, event_type string, ts timestamp",
    )


STEPS = ["view", "click", "purchase"]


def test_funnel_depths_and_ordering(spark):
    ev = _ev(spark, [
        # u1 converts in order
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # u2 clicks BEFORE viewing: click must not count
        (2, "click", 0), (2, "view", 5), (2, "purchase", 10),  # purchase after view but no valid click->depth 1? see below
        # u3 views only
        (3, "view", 0),
        # u4 never views (out-of-funnel entirely)
        (4, "purchase", 0),
        # u5: view, then purchase before click — purchase must not count
        (5, "view", 0), (5, "purchase", 5), (5, "click", 10),
    ])
    got = {r.user_id: r for r in funnel_steps(ev, STEPS).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert (got[1].steps_completed, got[1].converted) == (3, True)
    # u2: t1 = view@5; no click at/after 5 -> depth 1
    assert (got[2].steps_completed, got[2].converted) == (1, False)
    assert got[3].steps_completed == 1
    # u5: click@10 counts, but no purchase at/after 10 -> depth 2
    assert (got[5].steps_completed, got[5].converted) == (2, False)
    assert got[5].t_last == dt.datetime(2024, 1, 1, 0, 10)


def test_funnel_earliest_anchor_and_horizon(spark):
    ev = _ev(spark, [
        # two views: the EARLIEST anchors; click sits between them
        (1, "view", 0), (1, "view", 30), (1, "click", 10), (1, "purchase", 40),
        # u2 converts but outside a 15-minute horizon
        (2, "view", 0), (2, "click", 10), (2, "purchase", 60),
    ])
    got = {r.user_id: r for r in funnel_steps(ev, STEPS).collect()}
    assert got[1].converted and got[1].t_first == dt.datetime(2024, 1, 1)
    bounded = {r.user_id: r for r in funnel_steps(ev, STEPS, within="15 minutes").collect()}
    assert bounded[1].steps_completed == 2  # purchase@40 outside [0, 15]
    assert bounded[2].steps_completed == 2 and not bounded[2].converted


def test_funnel_deterministic_and_rejects_short(spark):
    ev = _ev(spark, [(u, t, m) for u in range(50)
                     for t, m in [("view", u), ("click", u + 1), ("purchase", u + 2)]])
    a = sorted(map(tuple, funnel_steps(ev, STEPS).collect()))
    b = sorted(map(tuple, funnel_steps(ev.repartition(7), STEPS).collect()))
    assert a == b and len(a) == 50
    with pytest.raises(ValueError):
        funnel_steps(ev, ["view"])
