from __future__ import annotations

import time

from scratchdata_spark.ids import SnowflakeGenerator, TWITTER_EPOCH_MS, node_id, ulid


def test_snowflake_monotonic_unique():
    gen = SnowflakeGenerator()
    ids = [gen.next_id() for _ in range(5000)]
    assert ids == sorted(ids)
    assert len(set(ids)) == len(ids)
    assert all(i > 0 for i in ids)


def test_snowflake_time_ordered_across_batches():
    gen = SnowflakeGenerator()
    a = gen.next_id()
    time.sleep(0.002)
    b = gen.next_id()
    assert b > a
    # embedded timestamp decodes to ~now
    ts_ms = (a >> 22) + TWITTER_EPOCH_MS
    assert abs(ts_ms - time.time() * 1000) < 5000


def test_node_id_range():
    assert 0 <= node_id() < 1024


def test_ulid_shape():
    u = ulid()
    assert len(u) == 26
    assert u != ulid()
    # lexicographic time ordering
    a = ulid()
    time.sleep(0.002)
    b = ulid()
    assert a[:10] <= b[:10]
