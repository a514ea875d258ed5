"""Application assembly: Config → engine + ingest pipeline + HTTP API.

``build_app`` mirrors the reference's main wiring
(``pkg/api``, ``pkg/workers``, ``pkg/datasink`` composed over shared
storage): one SparkSession, one warehouse catalog, one metadata
sqlite (queue + shares), a sink with rotation tickers, a worker pool,
and the HTTP gateway.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from scratchdata_spark.api_server import ApiServer, Service
from scratchdata_spark.auth import KeyStore
from scratchdata_spark.blobstore import make_blobstore
from scratchdata_spark.catalog import TableCatalog
from scratchdata_spark.config import Config
from scratchdata_spark.engine import SparkDestination
from scratchdata_spark.queue import Queue
from scratchdata_spark.share import ShareStore
from scratchdata_spark.sink import FileSystemSink
from scratchdata_spark.workers import WorkerPool


@dataclass
class App:
    config: Config
    service: Service
    server: ApiServer
    sink: FileSystemSink
    workers: WorkerPool
    queue: Queue

    def start(self) -> None:
        self.sink.start()
        self.workers.start()
        self.server.start()

    def stop(self) -> None:
        self.server.stop()
        self.sink.stop()
        self.workers.drain()
        self.workers.stop()

    def drain(self) -> None:
        """Flush buffers + process every queued job (tests/admin)."""
        self.sink.flush()
        self.workers.drain()

    @property
    def port(self) -> int:
        return self.server.port


def build_app(
    spark: SparkSession,
    config: Config,
    root: str,
    extra_destinations: dict | None = None,
) -> App:
    os.makedirs(root, exist_ok=True)
    catalog = TableCatalog(os.path.join(root, config.warehouse))
    export_root = (
        config.export_root
        if os.path.isabs(config.export_root)
        else os.path.join(root, config.export_root)
    )
    # One child session per destination: temp views are session-scoped
    # in Spark, so tenants can't resolve each other's tables (the
    # reference gets this isolation from separate backend connections).
    destinations = {
        name: SparkDestination(
            spark.newSession(), catalog, name, export_root=export_root,
            retain_generations=config.retain_generations,
        )
        for name in {*config.api_keys.values(), "default"}
    }
    destinations.update(extra_destinations or {})

    meta_db = os.path.join(root, config.metadata_db)
    queue = Queue(meta_db)
    config.sink.data_dir = os.path.join(root, config.sink.data_dir)
    blobstore = make_blobstore(
        config.blobstore, os.path.join(config.sink.data_dir, "blob")
    )
    sink = FileSystemSink(config.sink, queue, blobstore=blobstore)
    workers = WorkerPool(queue, destinations, config.workers, blobstore=blobstore)
    shares = ShareStore(meta_db)
    keys = KeyStore(config.api_keys, config.admin_key)

    def destination_factory(name: str, type_: str, settings: dict):
        """Runtime destination onboarding (POST /api/destinations)."""
        if type_ == "spark":
            return SparkDestination(
                spark.newSession(), catalog, name, export_root=export_root,
                retain_generations=config.retain_generations,
            )
        if type_ == "duckdb":
            from scratchdata_spark.duckdb_destination import DuckDBDestination

            return DuckDBDestination(
                settings.get("path", ":memory:"), export_root=export_root
            )
        if type_ == "jdbc":
            from scratchdata_spark.jdbc_destination import JDBCDestination

            return JDBCDestination(
                spark,
                settings["url"],
                engine=settings.get("engine", "postgres"),
                driver=settings.get("driver"),
                user=settings.get("user"),
                password=settings.get("password"),
            )
        if type_ == "redshift":
            from scratchdata_spark.blobstore import S3BlobStore
            from scratchdata_spark.redshift_destination import (
                RedshiftDestination,
            )

            bucket = settings["s3_bucket"]
            store = S3BlobStore(
                bucket,
                prefix=settings.get("s3_prefix", ""),
                client=settings.get("s3_client"),  # test seam
                region=settings.get("s3_region"),
            )
            return RedshiftDestination(
                spark,
                settings["url"],
                blobstore=store,
                s3_bucket=bucket,
                access_key_id=settings.get("access_key_id"),
                secret_access_key=settings.get("secret_access_key"),
                iam_role=settings.get("iam_role"),
                schema=settings.get("schema", "public"),
                delete_from_s3=settings.get("delete_from_s3", True),
                driver=settings.get("driver"),
                user=settings.get("user"),
                password=settings.get("password"),
            )
        if type_ == "motherduck":
            from scratchdata_spark.duckdb_destination import DuckDBDestination

            return DuckDBDestination.motherduck(
                settings["database"], settings["token"]
            )
        if type_ == "bigquery":
            from scratchdata_spark.bigquery_destination import BigQueryDestination
            from scratchdata_spark.blobstore import GCSBlobStore

            bucket = settings["gcs_bucket"]
            store = GCSBlobStore(
                bucket,
                prefix=settings.get("gcs_prefix", ""),
                bucket_obj=settings.get("bucket_obj"),  # test seam
            )
            client = settings.get("client")
            if client is None:
                raise ValueError(
                    "bigquery destination needs an injected client"
                    " (google-cloud-bigquery is not installed here)"
                )
            return BigQueryDestination(
                client, store, bucket,
                delete_from_gcs=settings.get("delete_from_gcs", True),
            )
        if type_ == "postgres":
            from scratchdata_spark.postgres_destination import (
                PostgresCopyDestination,
            )

            transport = settings.get("copy_transport")  # test seam
            if transport is None:
                raise ValueError(
                    "postgres destination needs an injected copy"
                    " transport (no live COPY socket in this container;"
                    " production wires a v3-protocol or psycopg"
                    " copy_expert transport here)"
                )
            return PostgresCopyDestination(
                spark,
                settings["url"],
                copy_transport=transport,
                schema=settings.get("schema", "public"),
                driver=settings.get("driver"),
                user=settings.get("user"),
                password=settings.get("password"),
            )
        if type_ == "clickhouse":
            from scratchdata_spark.clickhouse_destination import (
                ClickHouseBatchDestination,
                ClickHouseHTTPClient,
            )

            http = settings.get("http_client")  # test seam
            if http is None:
                http = ClickHouseHTTPClient(
                    settings["http_url"],
                    user=settings.get("user", "default"),
                    password=settings.get("password", ""),
                    database=settings.get("database", "default"),
                )
            return ClickHouseBatchDestination(
                spark,
                settings["url"],
                http_client=http,
                database=settings.get("database", "default"),
                driver=settings.get("driver"),
                user=settings.get("user"),
                password=settings.get("password"),
            )
        raise ValueError(f"unknown destination type: {type_}")

    service = Service(
        destinations, sink, queue, workers, shares, keys,
        destination_factory=destination_factory,
    )
    from scratchdata_spark.dashboard import Dashboard

    service.dashboard = Dashboard(
        service,
        meta_db,
        external_url=config.api.external_url,
        # behind TLS (https external URL) the admin session cookie
        # must carry Secure — plain-HTTP replay would leak the token
        secure_cookies=config.api.external_url.startswith("https://"),
    )
    server = ApiServer(service, config.api.host, config.api.port)
    return App(config, service, server, sink, workers, queue)
