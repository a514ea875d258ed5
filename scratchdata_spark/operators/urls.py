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


def url_host(col) -> Column:
    """Lowercased host with any ``www.`` prefix and port dropped."""
    host = F.lower(F.parse_url(col, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":\d+$", "")


def url_registered_domain(col) -> Column:
    """Last two host labels (``a.b.example.co`` → ``example.co``) —
    the grouping key source caps/contamination matrices use.  A real
    public-suffix list is a broadcast join away; two labels is the
    deterministic in-tree default."""
    parts = F.split(url_host(col), r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(url_host(col))


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
    path = F.parse_url(col, F.lit("PATH"))
    path = F.when(
        path.isNull() | (path == ""), F.lit("/")
    ).otherwise(F.regexp_replace(path, r"/+$", ""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.parse_url(col, F.lit("QUERY"))
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
    is small."""
    keyed = df.withColumn("__url_key", normalize_url(F.col(url_col)))
    winners = keyed.groupBy("__url_key").agg(F.min(id_col).alias(id_col))
    return keyed.join(
        winners.select(id_col), id_col, "semi"
    ).drop("__url_key")


def filter_blocked_hosts(
    df: DataFrame, blocked: DataFrame | list[str], url_col: str = "target_uri"
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocked``
    (a list or a 1-column DataFrame of domains).  Broadcast anti-join
    — blocklists are small by nature; at 100 TB the corpus side never
    shuffles."""
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(d,) for d in blocked], "__blocked_domain string"
        )
    else:
        blocked = blocked.toDF("__blocked_domain")
    keyed = df.withColumn(
        "__domain", url_registered_domain(F.col(url_col))
    )
    return keyed.join(
        F.broadcast(blocked),
        keyed["__domain"] == blocked["__blocked_domain"],
        "left_anti",
    ).drop("__domain")
