"""robots.txt compliance filtering — the crawl-hygiene step between
URL normalization and corpus admission: drop documents whose URL the
origin's robots rules disallow for your agent.

The reference has no crawl surface (SURVEY.md §2 — beyond-parity);
the semantics here are the public REP spec (RFC 9309): group rules by
user-agent, pick the MOST SPECIFIC matching agent group (longest
agent-token match, ``*`` as fallback), match paths by the
LONGEST-MATCH rule where ``allow`` wins ties, with ``*`` wildcards
and ``$`` end anchors inside rule paths.  An empty ``disallow:`` line
means allow-all (the classic idiom).

Scale shape: robots files are per-HOST — thousands to millions of
hosts, each with a handful of rules — so the rule table broadcasts
and the verdict computes inside an Arrow batch: compiled-regex
matching per (host, path), no shuffle on the document side.  Rules
typically arrive FROM the same crawl (robots.txt responses inside the
WARC), so :func:`rules_from_warc` plugs the WARC reader's output
straight in.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from scratchdata_spark.operators.urls import url_host


def parse_robots(text: str) -> list[dict]:
    """robots.txt → [{agents: [lowercased tokens], allow: [...],
    disallow: [...]}] groups, RFC 9309 grammar: consecutive
    ``user-agent`` lines open one group; rule lines bind to the open
    group; comments strip at ``#``."""
    groups: list[dict] = []
    current: dict | None = None
    agents_open = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not agents_open:
                current = {"agents": [], "allow": [], "disallow": []}
                groups.append(current)
                agents_open = True
            current["agents"].append(value.lower())
        elif key in ("allow", "disallow"):
            agents_open = False
            if current is None:
                continue  # rule before any user-agent line: ignored
            current[key].append(value)
        else:
            # sitemap/crawl-delay/unknown directives close the agent
            # run but do not affect matching
            agents_open = False
    return groups


def _rule_regex(path: str) -> re.Pattern:
    """REP rule path → anchored regex: ``*`` spans anything, a
    trailing ``$`` anchors the end, everything else is literal."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    pattern = "".join(
        ".*" if ch == "*" else re.escape(ch) for ch in path
    )
    return re.compile("^" + pattern + ("$" if anchored else ""))


def _select_group(groups: list[dict], agent: str) -> dict | None:
    """Most specific agent group: longest agent token contained in
    ``agent`` (case-insensitive); ``*`` matches with specificity 0."""
    agent = agent.lower()
    best, best_len = None, -1
    for g in groups:
        for tok in g["agents"]:
            if tok == "*":
                length = 0
            elif tok and tok in agent:
                length = len(tok)
            else:
                continue
            if length > best_len:
                best, best_len = g, length
    return best


def is_allowed(groups: list[dict], path: str, agent: str = "*") -> bool:
    """RFC 9309 verdict: longest-match rule wins; allow wins a length
    tie; no matching rule (or no matching group) ⇒ allowed.  Empty
    rule paths never match (``disallow:`` = allow all)."""
    g = _select_group(groups, agent)
    if g is None:
        return True
    best_len, best_allow = -1, True
    for allow, paths in ((True, g["allow"]), (False, g["disallow"])):
        for p in paths:
            if not p:
                continue
            m = _rule_regex(p).match(path)
            if m is None:
                continue
            # specificity = raw rule length (RFC 9309 §2.3.2 octet
            # count); allow wins exact ties via >= on the allow pass
            length = len(p)
            if length > best_len or (length == best_len and allow):
                best_len, best_allow = length, allow
    return best_allow if best_len >= 0 else True


def rules_from_warc(records: DataFrame) -> DataFrame:
    """(host, robots_txt) rows from a WARC read: keeps 2xx
    ``/robots.txt`` responses, one winner per host (min record_id —
    deterministic under re-crawls).

    The rules come from the raw ``payload``, never the ``text``
    column — the text extractor collapses whitespace, and robots
    grammar is LINE-oriented (a collapsed file reads as one
    meaningless user-agent line)."""
    r = records.filter(
        F.col("target_uri").rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt$")
        & (F.col("http_status") >= 200)
        & (F.col("http_status") < 300)
    ).select(
        url_host(F.col("target_uri")).alias("host"),
        F.col("payload").cast("string").alias("robots_txt"),
        F.col("record_id"),
    )
    w = r.groupBy("host").agg(F.min("record_id").alias("record_id"))
    return r.join(w, ["host", "record_id"], "semi").drop("record_id")


def filter_robots_disallowed(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "target_uri",
    agent: str = "*",
    keep_unknown_hosts: bool = True,
) -> DataFrame:
    """Drop rows whose URL the host's robots rules disallow for
    ``agent``.  ``robots`` is (host, robots_txt) — small by nature
    (one row per host), COLLECTED and parsed once on the driver, the
    compiled groups riding the task closure (the PQ-LUT pattern); the
    document side pays one Arrow pass, no shuffle.  Hosts without a
    robots row follow ``keep_unknown_hosts`` (the REP default: no
    robots.txt ⇒ crawl allowed)."""
    import pandas as pd

    # bounded collect: one row per host with a robots file — the
    # same cardinality class as a blocklist
    table = {
        row["host"]: parse_robots(row["robots_txt"] or "")
        for row in robots.collect()
    }
    staged = df.withColumn("__host", url_host(F.col(url_col)))
    schema = StructType(
        [f for f in df.schema.fields] + [StructField("__keep", BooleanType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urlsplit

        for pdf in batches:
            keep = []
            for host, url in zip(pdf["__host"], pdf[url_col]):
                groups = table.get(host)
                if groups is None:
                    keep.append(keep_unknown_hosts)
                    continue
                try:
                    s = urlsplit(url or "")
                    path = s.path or "/"
                    if s.query:
                        path += "?" + s.query
                except ValueError:
                    keep.append(keep_unknown_hosts)
                    continue
                keep.append(is_allowed(groups, path, agent))
            out = pdf[cols].copy()
            out["__keep"] = keep
            yield out

    return (
        staged.mapInPandas(run, schema)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
