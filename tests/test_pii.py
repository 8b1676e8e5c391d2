"""PII scrub tests: planted PII is counted and redacted exactly; clean
text passes through byte-identical; the plan stays UDF-free."""

from __future__ import annotations

from etl_football_analytics_pipeline_spark.operators.text import (
    PII_PATTERNS,
    pii_signals,
    redact_pii,
)

DOCS = [
    (0, "contact me at jane.doe+spam@example.co.uk or via mail"),
    (1, "see https://example.com/a?b=c#frag and http://x.io"),
    (2, "server at 192.168.0.1 answered; also 10.0.0.255"),
    (3, "call +1 (555) 123-4567 today"),
    (4, "perfectly clean prose with no identifiers at all"),
    (5, "mix: bob@x.org then https://y.z/w then 8.8.8.8 then 555-123-9876"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pii_counts(spark):
    got = {r.doc_id: r for r in pii_signals(_df(spark), "doc_id", "text").collect()}
    assert (got[0].n_email, got[0].n_url, got[0].n_ipv4, got[0].n_phone) == (1, 0, 0, 0)
    assert got[1].n_url == 2
    assert got[2].n_ipv4 == 2
    assert got[3].n_phone == 1
    assert (got[4].n_email, got[4].n_url, got[4].n_ipv4, got[4].n_phone) == (0, 0, 0, 0)
    assert (got[5].n_email, got[5].n_url, got[5].n_ipv4, got[5].n_phone) == (1, 1, 1, 1)


def test_redaction_replaces_with_typed_tokens(spark):
    got = {r.doc_id: r.text for r in redact_pii(_df(spark), "text").collect()}
    assert got[0] == "contact me at <EMAIL> or via mail"
    assert got[1] == "see <URL> and <URL>"
    assert got[2] == "server at <IPV4> answered; also <IPV4>"
    assert got[3] == "call <PHONE> today"
    assert got[4] == DOCS[4][1]  # clean text byte-identical
    # after a full redaction pass, a second count finds nothing
    rescanned = pii_signals(
        redact_pii(_df(spark), "text"), "doc_id", "text"
    ).collect()
    assert all(
        getattr(r, f"n_{k}") == 0 for r in rescanned for k in PII_PATTERNS
    )


def test_redaction_kind_subset(spark):
    got = {
        r.doc_id: r.text
        for r in redact_pii(_df(spark), "text", kinds=["email"]).collect()
    }
    assert got[5].startswith("mix: <EMAIL> then https://")


def test_plan_is_pure_codegen(spark):
    plan = (
        redact_pii(pii_signals(_df(spark), "doc_id", "text").join(_df(spark), "doc_id"), "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
