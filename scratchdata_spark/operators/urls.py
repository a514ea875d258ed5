"""URL analysis for crawl pipelines: normalization, host/domain
extraction, and blocklist/duplicate filtering — the step between WARC
ingestion and text dedup (the same page fetched as ``http://WWW.X.com
/a?utm_source=y#frag`` and ``https://x.com/a`` must collapse before
document-level dedup ever sees it).

The reference has no URL surface (SURVEY.md §2 — beyond-parity).
Everything here is COLUMN EXPRESSIONS over Spark's built-in
``parse_url``/string functions — JVM-side, codegen, zero Python in
the hot path — so a 100 TB URL column normalizes inside the scan
stage.  The dedup/filter operators reuse the repo's existing shuffle
discipline (hash-groupBy on the normalized key; broadcast semi-join
for blocklists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "ref",
)


def _parse_url_part(col, part: str) -> Column:
    """``try_parse_url``: under Spark 4 ANSI mode the plain function
    THROWS [INVALID_URL] on any malformed URL — one junk URI in a
    crawl corpus would abort the whole job, the opposite of what a
    URL-hygiene module exists for (reviewer catch).  Malformed URLs
    yield NULL and flow through the null-passthrough paths below."""
    return F.try_parse_url(col, F.lit(part))


def url_host(col) -> Column:
    """Lowercased host with any ``www.`` prefix and port dropped;
    NULL for malformed URLs."""
    host = F.lower(_parse_url_part(col, "HOST"))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":\d+$", "")


def _last_two_labels(host: Column) -> Column:
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def url_registered_domain(col) -> Column:
    """Last two host labels (``a.b.example.co`` → ``example.co``) —
    the grouping key source caps/contamination matrices use.  A real
    public-suffix list is a broadcast join away; two labels is the
    deterministic in-tree default."""
    return _last_two_labels(url_host(col))


def normalize_url(col, strip_tracking: bool = True) -> Column:
    """Canonical duplicate-detection key:

    * scheme collapses (http/https treated alike), host lowercases,
      ``www.`` and default ports drop;
    * the fragment drops (never reaches the server);
    * the path keeps its case (paths ARE case-sensitive) but a
      trailing slash collapses;
    * known tracking parameters (utm_*, gclid, fbclid, ref) drop,
      remaining query pairs SORT so parameter order can't split a
      duplicate group; an emptied query drops its ``?``.

    Pure column algebra over parse_url/regexp — survives codegen, no
    UDF."""
    host = url_host(col)
    path = _parse_url_part(col, "PATH")
    path = F.when(
        path.isNull() | (path == ""), F.lit("/")
    ).otherwise(F.regexp_replace(path, r"/+$", ""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _parse_url_part(col, "QUERY")
    pairs = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda kv: kv != "",
    )
    if strip_tracking:
        drop = list(_TRACKING_PARAMS)
        pairs = F.filter(
            pairs,
            lambda kv: ~F.lower(F.split(kv, "=")[0]).isin(drop),
        )
    canon_q = F.array_join(F.array_sort(pairs), "&")
    return F.concat(
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_q)
        ),
    )


def dedup_by_url(
    df: DataFrame, url_col: str = "target_uri", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per normalized URL — the canonical (min id) row,
    mirroring exact_dedup's survivor rule.  One hash-groupBy shuffle
    on the (short) normalized key; document text never moves until
    the final semi-join, which AQE broadcasts when the survivor set
    is small.

    NULL/malformed URLs (try_parse_url → NULL key) pass through
    UNEXAMINED: grouping them would collapse every URL-less document
    into one survivor and silently delete the rest (reviewer catch) —
    the key coalesces to a per-row unique value instead, so each such
    row is its own group."""
    key = F.coalesce(
        normalize_url(F.col(url_col)),
        F.concat(F.lit("\x00nourl\x00"), F.col(id_col).cast("string")),
    )
    keyed = df.withColumn("__url_key", key)
    winners = keyed.groupBy("__url_key").agg(F.min(id_col).alias(id_col))
    return keyed.join(
        winners.select(id_col), id_col, "semi"
    ).drop("__url_key")


def filter_blocked_hosts(
    df: DataFrame, blocked: DataFrame | list[str], url_col: str = "target_uri"
) -> DataFrame:
    """Drop rows whose host equals a ``blocked`` entry or sits under
    it (``spam.biz`` blocks ``sub.spam.biz``; ``tracker.evil.com``
    blocks exactly that host and its subdomains, NOT all of
    evil.com).  Entries are hostname-shaped, the real-world blocklist
    convention — a pure registered-domain equality would silently
    no-op on any entry carrying a subdomain (reviewer catch).

    Broadcast anti-join: both sides key on the entry's last two
    labels (equi-join half), the suffix predicate rides the same join
    condition — blocklists are small by nature, so at 100 TB the
    corpus side never shuffles."""
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(d,) for d in blocked], "__blocked string"
        )
    else:
        blocked = blocked.toDF("__blocked")
    # entries normalize exactly like document hosts (lowercase +
    # www-strip): doc hosts are already www-stripped by url_host, so
    # an entry like 'www.spam.biz' would otherwise silently never
    # match anything (advisor catch)
    entry = F.regexp_replace(F.lower("__blocked"), r"^www\.", "")
    blocked = blocked.select(
        entry.alias("__blocked"),
        _last_two_labels(entry).alias("__bkey"),
    )
    keyed = df.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__domain", _last_two_labels(F.col("__host"))
    )
    cond = (keyed["__domain"] == blocked["__bkey"]) & (
        (keyed["__host"] == blocked["__blocked"])
        | keyed["__host"].endswith(
            F.concat(F.lit("."), blocked["__blocked"])
        )
    )
    return keyed.join(F.broadcast(blocked), cond, "left_anti").drop(
        "__host", "__domain"
    )
