"""Share links (operator A17): saved query + TTL, re-executed on GET.

Reference: ``pkg/api/share.go`` + ``gorm.go:101-136`` —
``ShareQuery{UUID, DestinationID, Query, Name, ExpiresAt}``.
"""

from __future__ import annotations

import sqlite3
import threading
import time
import uuid
from dataclasses import dataclass


@dataclass
class ShareQuery:
    uuid: str
    destination: str
    name: str
    query: str
    expires_at: float


class ShareStore:
    def __init__(self, db_path: str):
        self.db_path = db_path
        self._local = threading.local()
        self._conn().execute(
            """CREATE TABLE IF NOT EXISTS share_queries (
                 uuid TEXT PRIMARY KEY, destination TEXT, name TEXT,
                 query TEXT, expires_at REAL)"""
        )

    def _conn(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = sqlite3.connect(self.db_path, timeout=30)
            conn.isolation_level = None
            self._local.conn = conn
        return conn

    def create(self, destination: str, name: str, query: str, ttl_seconds: float) -> str:
        uid = str(uuid.uuid4())
        self._conn().execute(
            "INSERT INTO share_queries VALUES (?, ?, ?, ?, ?)",
            (uid, destination, name, query, time.time() + ttl_seconds),
        )
        return uid

    def get(self, uid: str) -> ShareQuery | None:
        row = self._conn().execute(
            "SELECT uuid, destination, name, query, expires_at"
            " FROM share_queries WHERE uuid = ?",
            (uid,),
        ).fetchone()
        if row is None or row[4] < time.time():
            return None  # missing and expired look identical (reference parity)
        return ShareQuery(*row)
