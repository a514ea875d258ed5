"""DB-backed work queue with claim semantics (operator A11).

Reference: a gorm table with ``SELECT ... FOR UPDATE SKIP LOCKED``
dequeue (``gorm/queue.go:30-73``). SQLite equivalent: one atomic
UPDATE claims the oldest unclaimed row (SQLite serializes writers, so
the claim is race-free across threads and processes). Messages are
deleted on completion; a claim older than ``requeue_after`` seconds
returns to the pool — the same at-least-once contract.
"""

from __future__ import annotations

import json
import sqlite3
import threading
import time
from dataclasses import dataclass


@dataclass
class Message:
    id: int
    type: str
    payload: dict


class Queue:
    def __init__(self, db_path: str, requeue_after: float = 300.0):
        self.db_path = db_path
        self.requeue_after = requeue_after
        self._local = threading.local()
        with self._conn() as c:
            c.execute(
                """CREATE TABLE IF NOT EXISTS messages (
                       id INTEGER PRIMARY KEY AUTOINCREMENT,
                       type TEXT NOT NULL,
                       payload TEXT NOT NULL,
                       created REAL NOT NULL,
                       claimed_at REAL
                   )"""
            )

    def _conn(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = sqlite3.connect(self.db_path, timeout=30)
            conn.isolation_level = None  # autocommit; we issue explicit txns
            self._local.conn = conn
        return conn

    def enqueue(self, type_: str, payload: dict) -> int:
        c = self._conn()
        cur = c.execute(
            "INSERT INTO messages (type, payload, created) VALUES (?, ?, ?)",
            (type_, json.dumps(payload), time.time()),
        )
        return cur.lastrowid

    def dequeue(self) -> Message | None:
        """Claim the oldest available message (atomic single UPDATE)."""
        c = self._conn()
        now = time.time()
        cur = c.execute(
            """UPDATE messages SET claimed_at = ?
               WHERE id = (
                 SELECT id FROM messages
                 WHERE claimed_at IS NULL OR claimed_at < ?
                 ORDER BY id LIMIT 1
               )
               RETURNING id, type, payload""",
            (now, now - self.requeue_after),
        )
        row = cur.fetchone()
        if row is None:
            return None
        return Message(row[0], row[1], json.loads(row[2]))

    def complete(self, msg_id: int) -> None:
        self._conn().execute("DELETE FROM messages WHERE id = ?", (msg_id,))

    def release(self, msg_id: int) -> None:
        """Unclaim after a failure → immediate retry eligibility."""
        self._conn().execute(
            "UPDATE messages SET claimed_at = NULL WHERE id = ?", (msg_id,)
        )

    def depth(self) -> int:
        return self._conn().execute("SELECT COUNT(*) FROM messages").fetchone()[0]
