"""Blob-store abstraction + SQS queue contract tests.

The S3/GCS/SQS SDKs aren't installed in this environment, so these
tests drive the stores with fake clients implementing the exact SDK
call surface used — the key layout, pagination, delete-after-insert
lifecycle, and visibility-timeout claim semantics are all real."""

from __future__ import annotations

import json
import os

import pytest

from scratchdata_spark.blobstore import (
    GCSBlobStore,
    LocalBlobStore,
    S3BlobStore,
    make_blobstore,
)
from scratchdata_spark.config import SinkConfig, WorkersConfig
from scratchdata_spark.queue import Queue
from scratchdata_spark.sink import FileSystemSink
from scratchdata_spark.sqs_queue import SQSQueue
from scratchdata_spark.workers import WorkerPool


# ---------------------------------------------------------------- fakes
class FakeS3Client:
    """The exact boto3 S3 surface S3BlobStore uses, with pagination."""

    def __init__(self, page_size: int = 2):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.page_size = page_size

    def upload_file(self, filename, bucket, key):
        with open(filename, "rb") as f:
            self.objects[(bucket, key)] = f.read()

    def download_file(self, bucket, key, filename):
        with open(filename, "wb") as f:
            f.write(self.objects[(bucket, key)])

    def delete_object(self, Bucket, Key):
        self.objects.pop((Bucket, Key), None)

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
        keys = sorted(
            k for (b, k) in self.objects if b == Bucket and k.startswith(Prefix)
        )
        start = int(ContinuationToken or 0)
        page = keys[start : start + self.page_size]
        truncated = start + self.page_size < len(keys)
        resp = {
            "Contents": [{"Key": k} for k in page],
            "IsTruncated": truncated,
        }
        if truncated:
            resp["NextContinuationToken"] = str(start + self.page_size)
        return resp


class FakeGCSBlob:
    def __init__(self, store, name):
        self.store, self.name = store, name

    def upload_from_filename(self, filename):
        with open(filename, "rb") as f:
            self.store[self.name] = f.read()

    def download_to_filename(self, filename):
        with open(filename, "wb") as f:
            f.write(self.store[self.name])

    def delete(self):
        del self.store[self.name]


class FakeGCSBucket:
    def __init__(self):
        self.store: dict[str, bytes] = {}

    def blob(self, name):
        return FakeGCSBlob(self.store, name)

    def list_blobs(self, prefix=""):
        return [
            FakeGCSBlob(self.store, n)
            for n in sorted(self.store)
            if n.startswith(prefix)
        ]


class FakeSQSClient:
    """receive/visibility/delete semantics of SQS, in memory."""

    def __init__(self):
        self._next = 0
        self.messages: dict[str, dict] = {}  # handle -> {body, visible}

    def send_message(self, QueueUrl, MessageBody):
        self._next += 1
        handle = f"rh-{self._next}"
        self.messages[handle] = {"body": MessageBody, "visible": True}
        return {"MessageId": f"mid-{self._next}"}

    def receive_message(self, QueueUrl, MaxNumberOfMessages=1,
                        VisibilityTimeout=30, WaitTimeSeconds=0):
        for handle, m in self.messages.items():
            if m["visible"]:
                m["visible"] = False  # claimed until timeout/complete
                return {"Messages": [{"ReceiptHandle": handle, "Body": m["body"]}]}
        return {}

    def delete_message(self, QueueUrl, ReceiptHandle):
        self.messages.pop(ReceiptHandle, None)

    def change_message_visibility(self, QueueUrl, ReceiptHandle, VisibilityTimeout):
        if ReceiptHandle in self.messages and VisibilityTimeout == 0:
            self.messages[ReceiptHandle]["visible"] = True

    def get_queue_attributes(self, QueueUrl, AttributeNames):
        n = sum(1 for m in self.messages.values() if m["visible"])
        return {"Attributes": {"ApproximateNumberOfMessages": str(n)}}


class CapturingDestination:
    """Destination double recording insert_ndjson payloads."""

    def __init__(self):
        self.inserted: list[tuple[str, bytes]] = []

    def insert_ndjson(self, table, path):
        with open(path, "rb") as f:
            self.inserted.append((table, f.read()))


# ------------------------------------------------------------ contract
def _roundtrip(store, tmp_path):
    src = tmp_path / "f.ndjson"
    src.write_bytes(b'{"a":1}\n')
    store.put_file(str(src), "db/t/001.ndjson")
    assert src.exists()  # copy semantics: caller deletes after enqueue
    dst = tmp_path / "out.ndjson"
    store.get_file("db/t/001.ndjson", str(dst))
    assert dst.read_bytes() == b'{"a":1}\n'
    # second object + listing (S3 fake pages at 2 → exercises pagination)
    for i in (2, 3):
        p = tmp_path / f"f{i}.ndjson"
        p.write_bytes(b"{}\n")
        store.put_file(str(p), f"db/t/{i:03d}.ndjson")
    assert store.list("db/t/") == [
        "db/t/001.ndjson", "db/t/002.ndjson", "db/t/003.ndjson"
    ]
    assert store.list("db/other") == []
    store.delete("db/t/001.ndjson")
    store.delete("db/t/001.ndjson")  # idempotent
    assert store.list("db/t/") == ["db/t/002.ndjson", "db/t/003.ndjson"]


def test_local_blobstore_contract(tmp_path):
    store = LocalBlobStore(str(tmp_path / "blob"))
    _roundtrip(store, tmp_path)
    assert store.local_path("db/t/002.ndjson").endswith("db/t/002.ndjson")
    assert os.path.exists(store.local_path("db/t/002.ndjson"))


def test_s3_blobstore_contract(tmp_path):
    store = S3BlobStore("bkt", prefix="ingest", client=FakeS3Client())
    _roundtrip(store, tmp_path)
    # prefix is applied to the raw S3 key but stripped from the API
    assert ("bkt", "ingest/db/t/002.ndjson") in store.client.objects
    assert store.local_path("db/t/002.ndjson") is None


def test_gcs_blobstore_contract(tmp_path):
    store = GCSBlobStore("bkt", prefix="ingest", bucket_obj=FakeGCSBucket())
    _roundtrip(store, tmp_path)
    assert "ingest/db/t/002.ndjson" in store.bucket.store


def test_make_blobstore(tmp_path):
    assert isinstance(make_blobstore({}, str(tmp_path / "b")), LocalBlobStore)
    with pytest.raises(ValueError):
        make_blobstore({"type": "nope"}, str(tmp_path))


# ------------------------------------------- sink → S3 → worker e2e
def test_sink_uploads_to_s3_and_worker_fetches_by_key(tmp_path):
    """Full ingest hop over a remote store: rotate → put to S3 →
    enqueue key-only message → worker downloads, inserts, deletes
    the blob (at-least-once lifecycle)."""
    q = Queue(str(tmp_path / "meta.sqlite"))
    store = S3BlobStore("bkt", client=FakeS3Client())
    sink = FileSystemSink(
        SinkConfig(data_dir=str(tmp_path / "data"), max_rows_per_file=1),
        q,
        blobstore=store,
    )
    sink.write_data("default", "evt", b'{"a":1}\n')
    assert sink.flush() == 1
    msg = q.dequeue()
    assert msg.payload["key"] == [k for (_, k) in store.client.objects][0]
    assert "path" not in msg.payload  # remote store → no local shortcut

    dest = CapturingDestination()
    pool = WorkerPool(q, {"default": dest}, WorkersConfig(), blobstore=store)
    pool.process(msg)
    assert dest.inserted == [("evt", b'{"a":1}\n')]
    assert store.client.objects == {}  # blob deleted after insert


def test_sink_local_store_keeps_direct_path(tmp_path):
    q = Queue(str(tmp_path / "meta.sqlite"))
    sink = FileSystemSink(
        SinkConfig(data_dir=str(tmp_path / "data"), max_rows_per_file=1), q
    )
    sink.write_data("default", "evt", b'{"a":1}\n')
    sink.flush()
    msg = q.dequeue()
    assert os.path.exists(msg.payload["path"])  # same-host fast path
    dest = CapturingDestination()
    pool = WorkerPool(q, {"default": dest}, WorkersConfig(), blobstore=sink.blobstore)
    pool.process(msg)
    assert not os.path.exists(msg.payload["path"])  # deleted via store


# ----------------------------------------------------------- SQS queue
def test_sqs_queue_claim_contract():
    q = SQSQueue("https://sqs/q", client=FakeSQSClient())
    q.enqueue("insert_data", {"table": "t", "key": "db/t/1.ndjson"})
    assert q.pending() == 1
    msg = q.dequeue()
    assert msg.type == "insert_data" and msg.payload["table"] == "t"
    assert q.dequeue() is None  # claimed → invisible
    q.fail(msg.id)  # release for retry
    msg2 = q.dequeue()
    assert msg2.payload == msg.payload
    q.complete(msg2.id)
    assert q.dequeue() is None and q.pending() == 0


def test_upload_crash_between_put_and_enqueue_is_recoverable(tmp_path):
    """If the process dies after the blob put but before the enqueue,
    the closed file must still exist so the next upload pass ships it
    (upload → enqueue → delete-local ordering)."""
    q = Queue(str(tmp_path / "meta.sqlite"))
    store = S3BlobStore("bkt", client=FakeS3Client())

    class ExplodingQueue:
        def enqueue(self, *_a, **_k):
            raise RuntimeError("crash before enqueue")

    sink = FileSystemSink(
        SinkConfig(data_dir=str(tmp_path / "data"), max_rows_per_file=1),
        ExplodingQueue(),
        blobstore=store,
    )
    sink.write_data("default", "evt", b'{"a":1}\n')
    sink.rotate(force=True)
    try:
        sink.upload()
    except RuntimeError:
        pass
    closed = tmp_path / "data" / "closed" / "default" / "evt"
    assert list(closed.iterdir()), "closed file must survive the crash"
    # recovery: a healthy pass re-uploads the same key and enqueues
    sink.queue = q
    assert sink.upload() == 1
    assert q.dequeue() is not None
    assert not list(closed.iterdir())


def test_local_blobstore_relative_root(tmp_path, monkeypatch):
    """A relative root must behave identically to an absolute one: the
    traversal guard compares absolute paths on both sides, so nested
    keys keep their directory structure and list() sees them."""
    monkeypatch.chdir(tmp_path)
    store = LocalBlobStore("blobrel")
    src = tmp_path / "payload.txt"
    src.write_text("x")
    store.put_file(str(src), "db/t/001.ndjson")
    assert store.list("db/t/") == ["db/t/001.ndjson"]
    assert os.path.exists(tmp_path / "blobrel" / "db" / "t" / "001.ndjson")
    # traversal attempts still flatten instead of escaping the root
    store.put_file(str(src), "../escape.txt")
    assert not os.path.exists(tmp_path / "escape.txt")
