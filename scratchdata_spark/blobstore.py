"""Blob-store abstraction behind the sink's durable-storage seam.

Reference interface (``pkg/storage/blobstore/blobstore.go``): upload a
local file under a key, download a key to a local file, delete, list.
Implementations mirror the reference's set:

* ``LocalBlobStore`` — a directory; upload is an atomic rename
  (the mode every test and the shipped default run in).
* ``S3BlobStore`` — reference ``pkg/storage/blobstore/s3/s3.go:27-61``.
  boto3 is not installed in this environment, so the client is
  injectable and the import is deferred; the contract (key layout,
  pagination, delete-after-insert lifecycle) is exercised in tests
  with a fake client.
* ``GCSBlobStore`` — same shape over google-cloud-storage.

Scale note: the sink uploads *closed* micro-batch files (≤100 MB by
rotation policy), so a single-part put per file is the right S3 call;
at 1000 ingest nodes each node runs its own sink + store and the
bucket fans out by ``{database}/{table}/{snowflake}.ndjson`` key —
no coordination or listing on the hot path (list is admin/recovery
only).
"""

from __future__ import annotations

import os
import shutil


class BlobStore:
    """Contract: keys are ``db/table/filename`` POSIX-style strings."""

    def put_file(self, local_path: str, key: str) -> None:
        raise NotImplementedError

    def get_file(self, key: str, local_path: str) -> None:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def list(self, prefix: str = "") -> list[str]:
        raise NotImplementedError

    def local_path(self, key: str) -> str | None:
        """If the blob is directly readable as a local file, its path —
        lets same-host workers skip the download copy. None for remote
        stores."""
        return None


class LocalBlobStore(BlobStore):
    def __init__(self, root: str):
        # abspath: the traversal check in _path compares normalized
        # absolute paths; a relative root would make every key "fail"
        # containment and collapse to a flattened name list() can't see.
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _path(self, key: str) -> str:
        p = os.path.normpath(os.path.join(self.root, key))
        if not p.startswith(self.root + os.sep) and p != self.root:
            p = os.path.join(self.root, key.replace("/", "_"))
        return p

    def put_file(self, local_path: str, key: str) -> None:
        """COPY, not move: the caller enqueues the key after the put
        and deletes its local file last, so a crash mid-sequence
        leaves the local file for the next upload pass (the
        reference's upload→enqueue→delete order, filesystem.go)."""
        dst = self._path(key)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(local_path, tmp)
        os.replace(tmp, dst)  # readers never see a partial blob

    def get_file(self, key: str, local_path: str) -> None:
        shutil.copyfile(self._path(key), local_path)

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    def list(self, prefix: str = "") -> list[str]:
        out = []
        for dirpath, _, names in os.walk(self.root):
            for n in names:
                rel = os.path.relpath(os.path.join(dirpath, n), self.root)
                key = rel.replace(os.sep, "/")
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)

    def local_path(self, key: str) -> str | None:
        return self._path(key)


class S3BlobStore(BlobStore):
    """Reference ``s3/s3.go:27-61`` (upload/download/delete/list under
    one bucket+prefix). ``client`` is a boto3 S3 client; omit it to
    construct one from the environment (requires boto3, not present
    in this container — tests inject a fake)."""

    def __init__(self, bucket: str, prefix: str = "", client=None,
                 region: str | None = None, endpoint: str | None = None):
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        if client is None:
            try:
                import boto3  # deferred: not installed in this environment
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "S3BlobStore needs boto3 (pip install boto3) or an "
                    "injected client"
                ) from e
            client = boto3.client(  # pragma: no cover
                "s3", region_name=region, endpoint_url=endpoint
            )
        self.client = client

    def _key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def put_file(self, local_path: str, key: str) -> None:
        # copy semantics: caller deletes the local file after enqueue
        self.client.upload_file(local_path, self.bucket, self._key(key))

    def get_file(self, key: str, local_path: str) -> None:
        os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        self.client.download_file(self.bucket, self._key(key), local_path)

    def delete(self, key: str) -> None:
        self.client.delete_object(Bucket=self.bucket, Key=self._key(key))

    def list(self, prefix: str = "") -> list[str]:
        full = self._key(prefix)
        keys: list[str] = []
        token = None
        while True:  # paginate: a bucket at scale exceeds one page
            kw = {"Bucket": self.bucket, "Prefix": full}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for obj in resp.get("Contents", []):
                k = obj["Key"]
                if self.prefix:
                    k = k[len(self.prefix) + 1 :]
                keys.append(k)
            if not resp.get("IsTruncated"):
                return sorted(keys)
            token = resp.get("NextContinuationToken")


class GCSBlobStore(BlobStore):
    """Same contract over google-cloud-storage; ``bucket_obj`` is an
    injected ``google.cloud.storage.Bucket`` (SDK not in container)."""

    def __init__(self, bucket: str, prefix: str = "", bucket_obj=None):
        self.prefix = prefix.strip("/")
        if bucket_obj is None:
            try:
                from google.cloud import storage  # deferred
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "GCSBlobStore needs google-cloud-storage or an "
                    "injected bucket"
                ) from e
            bucket_obj = storage.Client().bucket(bucket)  # pragma: no cover
        self.bucket = bucket_obj

    def _key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def put_file(self, local_path: str, key: str) -> None:
        # copy semantics: caller deletes the local file after enqueue
        self.bucket.blob(self._key(key)).upload_from_filename(local_path)

    def get_file(self, key: str, local_path: str) -> None:
        os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        self.bucket.blob(self._key(key)).download_to_filename(local_path)

    def delete(self, key: str) -> None:
        blob = self.bucket.blob(self._key(key))
        try:
            blob.delete()
        except Exception:  # noqa: BLE001 — absent blob, parity with Local
            pass

    def list(self, prefix: str = "") -> list[str]:
        full = self._key(prefix)
        out = []
        for blob in self.bucket.list_blobs(prefix=full):
            k = blob.name
            if self.prefix:
                k = k[len(self.prefix) + 1 :]
            out.append(k)
        return sorted(out)


def make_blobstore(settings: dict, default_root: str) -> BlobStore:
    """Config → store. ``{"type": "s3", "bucket": ..., "prefix": ...}``
    etc.; no/empty settings → LocalBlobStore at the sink's blob dir."""
    type_ = (settings or {}).get("type", "local")
    if type_ == "local":
        return LocalBlobStore(settings.get("root", default_root) if settings else default_root)
    if type_ == "s3":
        return S3BlobStore(
            settings["bucket"],
            prefix=settings.get("prefix", ""),
            region=settings.get("region"),
            endpoint=settings.get("endpoint"),
        )
    if type_ == "gcs":
        return GCSBlobStore(settings["bucket"], prefix=settings.get("prefix", ""))
    raise ValueError(f"unknown blobstore type: {type_}")
