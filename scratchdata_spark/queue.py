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
    def __init__(
        self, db_path: str, requeue_after: float = 300.0, max_attempts: int = 5
    ):
        self.db_path = db_path
        self.requeue_after = requeue_after
        self.max_attempts = max_attempts
        self._local = threading.local()
        with self._conn() as c:
            c.execute(
                """CREATE TABLE IF NOT EXISTS messages (
                       id INTEGER PRIMARY KEY AUTOINCREMENT,
                       type TEXT NOT NULL,
                       payload TEXT NOT NULL,
                       created REAL NOT NULL,
                       claimed_at REAL,
                       attempts INTEGER NOT NULL DEFAULT 0,
                       dead INTEGER NOT NULL DEFAULT 0
                   )"""
            )
            for ddl in (  # migrate pre-dead-letter databases in place
                "ALTER TABLE messages ADD COLUMN attempts INTEGER NOT NULL DEFAULT 0",
                "ALTER TABLE messages ADD COLUMN dead INTEGER NOT NULL DEFAULT 0",
            ):
                try:
                    c.execute(ddl)
                except sqlite3.OperationalError:
                    pass  # column already exists

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
            """UPDATE messages SET claimed_at = ?, attempts = attempts + 1
               WHERE id = (
                 SELECT id FROM messages
                 WHERE dead = 0 AND (claimed_at IS NULL OR claimed_at < ?)
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

    def fail(self, msg_id: int, error: str = "") -> bool:
        """Record a failed attempt: release for retry, or dead-letter
        once ``max_attempts`` is exhausted (poison messages must not
        spin the worker pool forever). Returns True if dead-lettered."""
        c = self._conn()
        row = c.execute(
            "SELECT attempts FROM messages WHERE id = ?", (msg_id,)
        ).fetchone()
        if row is None:
            return False
        if row[0] >= self.max_attempts:
            c.execute(
                "UPDATE messages SET dead = 1, payload = json_set(payload, '$.__error', ?) WHERE id = ?",
                (error[:500], msg_id),
            )
            return True
        self.release(msg_id)
        return False

    def dead_letters(self) -> list[Message]:
        rows = self._conn().execute(
            "SELECT id, type, payload FROM messages WHERE dead = 1 ORDER BY id"
        ).fetchall()
        return [Message(r[0], r[1], json.loads(r[2])) for r in rows]

    def depth(self) -> int:
        """Live (retryable) messages only — dead letters don't count."""
        return self._conn().execute(
            "SELECT COUNT(*) FROM messages WHERE dead = 0"
        ).fetchone()[0]
