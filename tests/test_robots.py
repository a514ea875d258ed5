"""robots.txt compliance (operators/robots.py): RFC 9309 grammar,
longest-match + allow-tie semantics, wildcard/anchor rules, agent
group selection, WARC rule extraction, and the distributed filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.operators import robots as R

ROBOTS = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.pdf$
Disallow:

User-agent: goodbot
User-agent: greatbot
Allow: /

User-agent: badbot
Disallow: /
"""


def test_parse_groups_and_grammar():
    groups = R.parse_robots(ROBOTS)
    assert len(groups) == 3
    assert groups[0]["agents"] == ["*"]
    assert groups[1]["agents"] == ["goodbot", "greatbot"]
    assert groups[0]["disallow"] == ["/private/", "/*.pdf$", ""]
    assert groups[0]["allow"] == ["/private/ok"]
    # rules before any user-agent line are ignored, not crashes
    assert R.parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y") == [
        {"agents": ["*"], "allow": [], "disallow": ["/y"]}
    ]


def test_is_allowed_longest_match_and_ties():
    g = R.parse_robots(ROBOTS)
    assert not R.is_allowed(g, "/private/secret")
    assert R.is_allowed(g, "/private/ok/page")  # longer allow wins
    assert R.is_allowed(g, "/public/a")
    assert not R.is_allowed(g, "/docs/file.pdf")  # wildcard + anchor
    assert R.is_allowed(g, "/docs/file.pdf.html")  # $ anchor holds
    # empty Disallow: never matches (allow-all idiom)
    assert R.is_allowed(R.parse_robots("User-agent: *\nDisallow:"), "/any")
    # allow wins an exact length tie (RFC 9309)
    tie = R.parse_robots("User-agent: *\nAllow: /page\nDisallow: /page")
    assert R.is_allowed(tie, "/page")


def test_agent_group_selection():
    g = R.parse_robots(ROBOTS)
    assert R.is_allowed(g, "/private/secret", agent="goodbot/2.1")
    assert not R.is_allowed(g, "/anything", agent="BadBot/1.0")
    # exact product-token match selects the named group over '*'
    assert R.is_allowed(g, "/private/secret", agent="greatbot")
    # unknown agent falls back to *
    assert not R.is_allowed(g, "/private/secret", agent="otherbot")
    # SUBSTRING tokens must NOT capture: 'bot' is not the product
    # token of 'mybot/1.0', so the * group governs (reviewer catch —
    # substring matching flipped verdicts permissive)
    sub = R.parse_robots(
        "User-agent: bot\nAllow: /\n\nUser-agent: *\nDisallow: /private/"
    )
    assert not R.is_allowed(sub, "/private/x", agent="mybot/1.0")
    assert R.is_allowed(sub, "/private/x", agent="bot/2.0")


def test_matching_groups_merge():
    """RFC 9309 §2.2.1: all groups matching the selected agent
    combine — a second 'User-agent: *' group's rules must apply, not
    silently drop (reviewer catch)."""
    g = R.parse_robots(
        "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b"
    )
    assert not R.is_allowed(g, "/a")
    assert not R.is_allowed(g, "/b")
    assert R.is_allowed(g, "/c")


def test_rules_from_warc_and_filter(spark):
    robots_rows = [
        (1, "https://a.com/robots.txt", 200, "r1",
         bytearray(b"User-agent: *\nDisallow: /blocked/")),
        (2, "https://b.com/robots.txt", 404, "r2", bytearray(b"ignored")),
        (3, "https://a.com/page", 200, "r3", bytearray(b"not robots")),
    ]
    recs = spark.createDataFrame(
        robots_rows,
        "doc_id long, target_uri string, http_status int,"
        " record_id string, payload binary",
    )
    rules = R.rules_from_warc(recs)
    got = {r.host: r.robots_txt for r in rules.collect()}
    assert set(got) == {"a.com"}  # 404s and non-robots URLs excluded

    docs = spark.createDataFrame(
        [
            (10, "https://a.com/blocked/page"),
            (11, "https://a.com/open/page"),
            (12, "https://b.com/anything"),  # no robots row
            (13, None),  # junk URL: follows keep_unknown_hosts
        ],
        "doc_id long, target_uri string",
    )
    kept = sorted(
        r.doc_id for r in R.filter_robots_disallowed(docs, rules).collect()
    )
    assert kept == [11, 12, 13]
    strict = sorted(
        r.doc_id
        for r in R.filter_robots_disallowed(
            docs, rules, keep_unknown_hosts=False
        ).collect()
    )
    assert strict == [11]


def test_rules_scope_to_authority_and_tolerate_scheme_case(spark):
    """Rules key on the AUTHORITY (port included, www untouched): a
    staging :8080 robots file must not govern the production site —
    and an uppercase scheme in the robots URI must still register
    (RFC 3986 schemes are case-insensitive; both reviewer catches)."""
    recs = spark.createDataFrame(
        [
            (1, "HTTPS://a.com/robots.txt", 200, "r1",
             bytearray(b"User-agent: *\nDisallow: /x/")),
            (2, "https://a.com:8080/robots.txt", 200, "r2",
             bytearray(b"User-agent: *\nDisallow: /")),
        ],
        "doc_id long, target_uri string, http_status int,"
        " record_id string, payload binary",
    )
    rules = R.rules_from_warc(recs)
    assert {r.host for r in rules.collect()} == {"a.com", "a.com:8080"}
    docs = spark.createDataFrame(
        [
            (10, "https://a.com/x/page"),     # prod rules: blocked
            (11, "https://a.com/open"),       # prod rules: fine
            (12, "https://a.com:8080/open"),  # staging: disallow all
        ],
        "doc_id long, target_uri string",
    )
    kept = sorted(
        r.doc_id for r in R.filter_robots_disallowed(docs, rules).collect()
    )
    assert kept == [11]


def test_filter_uses_path_and_query(spark):
    rules = spark.createDataFrame(
        [("x.com", "User-agent: *\nDisallow: /s?*q=secret")],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [(1, "https://x.com/s?q=secret"), (2, "https://x.com/s?q=fine")],
        "doc_id long, target_uri string",
    )
    kept = [r.doc_id for r in R.filter_robots_disallowed(docs, rules).collect()]
    assert kept == [2]
