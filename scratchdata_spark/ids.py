"""Snowflake row-id + ULID generation.

Parity targets (behavior, not code):
* reference ``pkg/util/util.go:9-29`` — snowflake node id derived from
  the low 10 bits of SHA-256(hostname); ids are time-ordered int64.
* reference ``pkg/api/flattener.go:122-124`` — a ULID string per
  ingested document for the vertical flattener.

Layout (bwmarrin/snowflake default, which the reference uses):
``(ms_since_epoch << 22) | (node_id << 12) | sequence`` with the
Twitter epoch 1288834974657. ``monotonically_increasing_id()`` is NOT
a substitute: it is not time-ordered across jobs. For distributed
assignment we expose :func:`snowflake_column`, a pure column
expression usable inside executors (time ‖ partition-derived node ‖
per-partition sequence) — no driver round-trip, no UDF.
"""

from __future__ import annotations

import hashlib
import os
import socket
import threading
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

TWITTER_EPOCH_MS = 1288834974657
_NODE_BITS = 10
_SEQ_BITS = 12


def node_id() -> int:
    """Last byte of SHA-256(hostname) masked to 10 bits, exactly as the
    reference does (pkg/util/util.go:21-23 masks only the final digest
    byte with 0x3FF, so node ids 256-1023 are unreachable there too)."""
    digest = hashlib.sha256(socket.gethostname().encode()).digest()
    return digest[-1] & ((1 << _NODE_BITS) - 1)


class SnowflakeGenerator:
    """Driver-side snowflake generator (ingest path, multitable ids)."""

    def __init__(self, node: int | None = None):
        self._node = node_id() if node is None else node & ((1 << _NODE_BITS) - 1)
        self._lock = threading.Lock()
        self._last_ms = -1
        self._seq = 0

    def next_id(self) -> int:
        with self._lock:
            now = int(time.time() * 1000)
            if now == self._last_ms:
                self._seq = (self._seq + 1) & ((1 << _SEQ_BITS) - 1)
                if self._seq == 0:
                    while now <= self._last_ms:
                        now = int(time.time() * 1000)
            else:
                self._seq = 0
            self._last_ms = now
            return (
                ((now - TWITTER_EPOCH_MS) << (_NODE_BITS + _SEQ_BITS))
                | (self._node << _SEQ_BITS)
                | self._seq
            )


_default_gen: SnowflakeGenerator | None = None


def next_row_id() -> int:
    global _default_gen
    if _default_gen is None:
        _default_gen = SnowflakeGenerator()
    return _default_gen.next_id()


_COL_MS_LOCK = threading.Lock()
_COL_LAST_MS = -1
# Adjacent job bases are spaced by this stride because a partition
# with R rows advances its virtual ms by R//4096 — with only +1 ms
# between bases, job A's rows 4096.. would collide with job B's first
# rows in the same partition slot. 64 ms of headroom means a collision
# needs a >64×4096 = 262k-row single partition in a job racing one
# launched <64·k ms later; ingest micro-batches are thousands of rows,
# and a bulk job that large should repartition anyway. The clock only
# drifts ahead of wall time if jobs start faster than ~15/s sustained.
_COL_MS_STRIDE = 64


def _job_ms_base() -> int:
    """Driver-assigned millisecond base, strictly increasing by at
    least _COL_MS_STRIDE per call: two insert jobs built in the same
    wall-clock millisecond get bases far enough apart that one job's
    virtual-ms advance (rows_per_partition // 4096) cannot reach the
    next job's range (the analogue of the driver generator's
    wait-for-next-ms on sequence wrap, applied across jobs)."""
    global _COL_LAST_MS
    with _COL_MS_LOCK:
        now = int(time.time() * 1000)
        if now < _COL_LAST_MS + _COL_MS_STRIDE:
            now = _COL_LAST_MS + _COL_MS_STRIDE
        _COL_LAST_MS = now
        return now


def snowflake_column() -> Column:
    """Distributed snowflake id as a pure column expression.

    Decomposes ``monotonically_increasing_id()`` (layout:
    ``partition << 33 | row_index``) into all three snowflake fields so
    ids are provably unique WITHIN a job for ANY partition count and
    row count:

    * ``seq``  = row_index mod 4096 (the 12-bit field);
    * ``node`` = partition mod 1024 (the 10-bit field);
    * ``ms``   = driver-assigned job base ms + row_index//4096 (a
      partition with >4096 rows advances its virtual millisecond,
      mirroring the driver generator's wait-for-next-ms on sequence
      wrap)
      + (partition//1024) * 2^21  (partition groups beyond the 10-bit
      node space are pushed to disjoint ms ranges; row_index//4096 is
      always < 2^21, so groups can never collide).

    Uniqueness argument (single job): equal ids need equal node →
    partitions differ by a multiple of 1024; equal seq and ms then
    force identical row_index and partition. ACROSS jobs in one
    process, bases advance by ≥64 ms per job (see :func:`_job_ms_base`),
    so ids collide only if an earlier job's virtual-ms advance
    (rows_per_partition / 4096 ms) overruns a later job's base —
    >262k rows in ONE partition racing a job started within the next
    64 ms, at which point repartition the insert.
    Across processes the guarantee matches the reference's: node bits
    come from the host, and two generators on one host sharing a
    millisecond can collide (util.go:21-23 has the same property).
    Time-ordering is exact up to 1024 partitions per job and
    approximate beyond — uniqueness never degrades. Runs entirely
    JVM-side: whole-stage-codegen friendly, no Python UDF in the hot
    path.
    """
    mid = F.monotonically_increasing_id()
    idx = mid.bitwiseAND(F.lit((1 << 33) - 1))
    part = F.shiftrightunsigned(mid, 33)
    node = part % (1 << _NODE_BITS)
    blocks = F.shiftrightunsigned(idx, _SEQ_BITS) + F.shiftleft(
        F.shiftrightunsigned(part, _NODE_BITS), 21
    )
    ms = F.lit(_job_ms_base() - TWITTER_EPOCH_MS) + blocks
    seq = idx % (1 << _SEQ_BITS)
    return (
        F.shiftleft(ms, _NODE_BITS + _SEQ_BITS)
        + F.shiftleft(node.cast("long"), _SEQ_BITS)
        + seq
    ).cast("long")


_ULID_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"  # Crockford base32


def ulid() -> str:
    """26-char ULID string (48-bit ms timestamp + 80 random bits)."""
    ts = int(time.time() * 1000) & ((1 << 48) - 1)
    rand = int.from_bytes(os.urandom(10), "big")
    value = (ts << 80) | rand
    chars = []
    for i in range(26):
        chars.append(_ULID_ALPHABET[(value >> (125 - 5 * i)) & 0x1F])
    return "".join(chars)
