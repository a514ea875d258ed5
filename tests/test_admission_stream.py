"""Streaming admission chain (streaming/admission.py): the composed
per-record stages run on a STREAMING DataFrame in append mode, the
streamed union equals the batch run of the same stages, replays are
exactly-once, and parse-error archives quarantine instead of wedging
or silently vanishing.  The s_crawl_stream registry entry adds the
full-fixture DuckDB hash gate on top of these mechanics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.operators import warc as W
from scratchdata_spark.streaming.admission import (
    admission_stages,
    start_admission_stream,
)

GOOD = (
    "this is a perfectly reasonable paragraph of text with many "
    "common words that the filters should keep because it is long "
    "enough and has the right shape for prose."
)
CHROME = "Home | Products | Pricing | Contact"
JUNK = "0101 @@ ## 42 $$ %% 9999 ^^ && 8888 !!"


def _archive(host: str, idx: int) -> bytes:
    def page(body: str) -> bytes:
        return W.encode_http_response(
            f"<html><body><p>{CHROME}</p><p>{body}</p></body></html>".encode()
        )

    recs = [
        W.encode_warc_record(
            "response", page(f"{GOOD} page {idx} alpha."),
            target_uri=f"https://{host}/a/{idx}",
            record_id=f"<urn:uuid:{idx}-0>",
        ),
        W.encode_warc_record(
            "response", page(JUNK),
            target_uri=f"https://{host}/junk/{idx}",
            record_id=f"<urn:uuid:{idx}-1>",
        ),
        W.encode_warc_record(
            "response", page(f"{GOOD} page {idx} beta."),
            target_uri=f"https://ads.spam.biz/x/{idx}",
            record_id=f"<urn:uuid:{idx}-2>",
        ),
    ]
    return b"".join(recs)


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    now = None
    for i in range(3):
        p = d / f"c{i}.warc"
        p.write_bytes(_archive(f"h{i}.example", i))
        if now is None:
            now = os.path.getmtime(p)
        os.utime(p, (now + i, now + i))
    return str(d)


GATES = dict(
    blocked_domains=["spam.biz"],
    boilerplate={},
    min_score=0.3,
    # a two-bucket DSIR table exercising the gate expression: docs
    # pass unless their weight drops below the floor (none here do —
    # the gate's kill is pinned by the s_crawl_stream fixture margins)
    dsir_table={0: 0.1},
    dsir_default=0.05,
    dsir_buckets=16,
    dsir_min=-1e9,
    dsir_portable=True,
)


def _run_stream(spark, src_dir, base, gates=GATES):
    out = os.path.join(base, "out")
    q = start_admission_stream(
        spark, src_dir, out, os.path.join(base, "ckpt"),
        max_files_per_trigger=1, **gates,
    )
    q.awaitTermination()
    return out


def test_streamed_union_equals_batch(spark, src, tmp_path):
    out = _run_stream(spark, src, str(tmp_path / "s1"))
    got = (
        spark.read.parquet(out)
        .select("target_uri", "text", "dsir_logweight")
        .collect()
    )
    batch = admission_stages(
        W.read_warc(spark, src + "/*.warc", keep_paragraphs=True), **GATES
    ).select("target_uri", "text", "dsir_logweight").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # the chain actually filtered: junk and blocked-host pages gone
    uris = {r.target_uri for r in got}
    assert len(got) == 3 and all("/a/" in u for u in uris)
    # 3 archives, one per trigger → one batch_id partition each
    parts = {
        p for p in os.listdir(out) if p.startswith("batch_id=")
    }
    assert len(parts) == 3


def test_exactly_once_restart(spark, src, tmp_path):
    base = str(tmp_path / "s2")
    out = _run_stream(spark, src, base)
    first = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    # same checkpoint + same source: a restarted availableNow query
    # must consume nothing and change nothing
    q = start_admission_stream(
        spark, src, out, os.path.join(base, "ckpt"),
        max_files_per_trigger=1, **GATES,
    )
    q.awaitTermination()
    second = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    assert second == first
    # a FRESH checkpoint replays every archive, but the deterministic
    # overwrite-batch_id sink makes the rewrite idempotent
    q = start_admission_stream(
        spark, src, out, os.path.join(base, "ckpt2"),
        max_files_per_trigger=1, **GATES,
    )
    q.awaitTermination()
    third = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    assert third == first


def test_parse_errors_quarantine_not_admitted(spark, src, tmp_path):
    with open(os.path.join(src, "zz.warc"), "wb") as fh:
        fh.write(b"WARC/1.0\r\nThis is not a valid archive at all")
    out = _run_stream(spark, src, str(tmp_path / "s3"))
    admitted = spark.read.parquet(out)
    assert admitted.count() == 3  # good docs only, no sentinel rows
    assert not [
        r for r in admitted.collect() if r.target_uri is None
    ]
    quar = spark.read.parquet(os.path.join(out, "_quarantine"))
    assert quar.count() == 1
    row = quar.first()
    assert row.warc_file.endswith("zz.warc") and row.text


def test_crash_mid_batch_replays_exactly_once(spark, src, tmp_path,
                                              monkeypatch):
    """Kill-between-stages for the streaming sink (the
    test_dml_atomic pattern): a crash AFTER the admitted-rows write
    but BEFORE the micro-batch commits must leave no duplicates after
    restart — the overwrite-batch_id sink rewrites the same partition
    on replay, and the file-source checkpoint never re-feeds a
    COMMITTED batch.  This is the at-least-once foreachBatch edge the
    idempotent-partition design exists for."""
    import pyspark.sql.readwriter as RW

    base = str(tmp_path / "crash")
    out = os.path.join(base, "out")
    calls = {"n": 0}
    real_parquet = RW.DataFrameWriter.parquet

    def exploding_parquet(self, path, **kw):
        real_parquet(self, path, **kw)
        calls["n"] += 1
        if calls["n"] == 2:  # after batch 1's write lands, pre-commit
            raise RuntimeError("injected crash after write, before commit")

    monkeypatch.setattr(RW.DataFrameWriter, "parquet", exploding_parquet)
    q = start_admission_stream(
        spark, src, out, os.path.join(base, "ckpt"),
        max_files_per_trigger=1, **GATES,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    monkeypatch.setattr(RW.DataFrameWriter, "parquet", real_parquet)
    # restart with the same checkpoint: batch 1 replays (uncommitted),
    # batch 0 does not; the replay OVERWRITES batch 1's orphan files
    q = start_admission_stream(
        spark, src, out, os.path.join(base, "ckpt"),
        max_files_per_trigger=1, **GATES,
    )
    q.awaitTermination()
    got = spark.read.parquet(out).select("target_uri").collect()
    assert sorted(r.target_uri for r in got) == [
        f"https://h{i}.example/a/{i}" for i in range(3)
    ]
