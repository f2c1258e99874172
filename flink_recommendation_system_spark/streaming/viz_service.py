"""Live recommendation visualization service — the Spark-native analog of
the reference's S10 surface (`visualization/service/service.js:5-55`:
Kafka `Output` consumer relaying each message verbatim to WebSocket
clients; `visualization/web/index.js:1-34`: a browser page appending one
line per `{userId, recommendedProducts}` message).

Spark-first re-expression: the speed layer's output stream
(`streaming.pipeline.to_output_json` wire format — the exact
KafkaOutputSerialization.java:10-19 JSON) fans out to connected browsers
via **Server-Sent Events** over a stdlib `ThreadingHTTPServer`. SSE
instead of WebSocket because the relay is strictly one-directional in the
reference too (service.js only logs inbound client messages, never acts
on them), and SSE needs zero dependencies while carrying the identical
payload; the browser page is the same append-a-line-per-message table.

Scale stance: this is a DISPLAY sink — the reference consumes the topic
single-partition (`partition: 0`) and pushes every message to every
browser, so the fan-in is bounded by what a human can watch, not by the
corpus. The foreachBatch body therefore collects the micro-batch (the
same bounded-display contract as `.show()`/console sink); the data-scale
paths are the parquet/Kafka sinks in `streaming.pipeline`, not this.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

from .pipeline import to_output_json

# The reference page's one-li-per-message table (index.js:13-21), stdlib
# EventSource in place of the WebSocket handshake.
_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Recommendations</title></head>
<body><h3>Live recommendations</h3><ul id="data-display"></ul>
<script>
const es = new EventSource('/events');
es.onmessage = (evt) => {
  const res = JSON.parse(evt.data);
  const li = document.createElement('li');
  li.textContent = `Rekomendacje uzytkownika ${res["userId"]}: ` +
      JSON.stringify(res["recommendedProducts"]);
  document.getElementById('data-display').appendChild(li);
};
</script></body></html>
"""


class RecommendationVizService:
    """One-directional message relay: ``publish(json_str)`` broadcasts to
    every connected ``/events`` SSE client (service.js's
    ``connection.sendUTF(message.value)``); ``/`` serves the table page.

    Start with ``service.start()`` (returns the bound port — pass 0 to
    pick an ephemeral one) and stop with ``service.stop()``. Clients that
    disconnect are dropped on their next send, like the reference's
    ``connection.on('close')`` teardown.
    """

    def __init__(self, port: int = 8080):
        self._port = port
        self._clients: list[queue.Queue] = []
        self._lock = threading.Lock()
        self._stopped = False
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> int:
        self._stopped = False
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test/CLI output
                pass

            def do_GET(self):
                if self.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path == "/events":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    # bounded, drop-oldest on overflow (publish side):
                    # display semantics — a stalled browser tab must not
                    # grow an unbounded backlog on the driver
                    q: queue.Queue = queue.Queue(maxsize=1024)
                    with svc._lock:
                        # a client racing stop() must not register a
                        # queue nobody will ever put the shutdown
                        # sentinel on — it would block in q.get() forever
                        if svc._stopped:
                            return
                        svc._clients.append(q)
                    try:
                        while True:
                            msg = q.get()
                            if msg is None:  # server shutdown
                                return
                            self.wfile.write(
                                b"data: " + msg.encode() + b"\n\n"
                            )
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass  # client went away; drop silently
                    finally:
                        with svc._lock:
                            if q in svc._clients:
                                svc._clients.remove(q)
                    return
                self.send_response(404)  # service.js:18 — 404 anything else
                self.end_headers()

        self._server = ThreadingHTTPServer(("127.0.0.1", self._port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self._server.server_address[1]

    def publish(self, message: str) -> None:
        """Broadcast one wire-format JSON string to all connected clients.

        Queues are bounded: a client that stopped draining (full TCP
        window, stalled tab) loses its OLDEST messages rather than
        growing driver memory without limit — the live-display contract
        (the reference's relay offers no replay either)."""
        with self._lock:
            for q in list(self._clients):
                while True:
                    try:
                        q.put_nowait(message)
                        break
                    except queue.Full:
                        try:
                            q.get_nowait()  # drop oldest
                        except queue.Empty:
                            pass

    def stop(self) -> None:
        with self._lock:
            self._stopped = True
            for q in self._clients:
                while True:  # the shutdown sentinel must never block
                    try:
                        q.put_nowait(None)
                        break
                    except queue.Full:
                        try:
                            q.get_nowait()
                        except queue.Empty:
                            pass
            self._clients.clear()
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def start_recommendation_viz(
    enriched_stream: DataFrame,
    service: RecommendationVizService,
    checkpoint_dir: str,
):
    """Relay the speed layer's enriched recommendation stream to the viz
    service: each micro-batch serializes to the Kafka `Output` wire format
    (``to_output_json`` — KafkaOutputSerialization.java:10-19) and every
    row is pushed to connected browsers, the engine-side equivalent of
    service.js consuming topic `Output` and ``sendUTF``-ing each value.

    The collect here is the bounded-display contract (module docstring):
    a viz relay renders to humans, so batches are display-sized by
    construction; data-scale egress stays on the parquet/Kafka sinks.
    Returns the StreamingQuery.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        for row in to_output_json(batch_df).collect():
            service.publish(row["value"])

    return (
        enriched_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def parse_output_message(message: str) -> tuple[int, list[str]]:
    """Decode one wire message back to (userId, recommendedProducts) —
    the browser-side JSON.parse (index.js:14-20), usable for assertions
    and CLI display."""
    d = json.loads(message)
    return int(d["userId"]), list(d["recommendedProducts"])
