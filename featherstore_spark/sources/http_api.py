"""Minimal HTTP/JSON serving of feature sets (SURVEY §2 S10) — the REST
face the reference exposes alongside Flight (its HTTP mux; metrics
endpoint at /root/reference/pkg/metrics/metrics.go:204).  Pure stdlib
(ThreadingHTTPServer), wrapping the SAME ServingStore the Flight server
uses, so both transports return byte-identical rows.

Routes:
- ``GET /metrics``                               → Prometheus text counters
- ``GET /feature-sets``                          → ["name", …]
- ``GET /feature-sets/<name>``                   → metadata JSON
- ``GET /features/<name>?entity_id=a&entity_id=b[&as_of=ISO]``
                                                 → latest row per entity
- ``GET /history/<name>?entity_id=a&start=ISO&end=ISO``
                                                 → inclusive range, newest first
- ``POST /feature-sets/<name>``                  → create (JSON meta body)
- ``POST /features-at/<name>``  body ``{"points": [["conv_1", "ISO-ts"], …]}``
                                                 → point-in-time as-of vector per
                                                   (entity, ts), Flight `points` parity

JSON is a LOSSY transport for feature vectors (timestamps stringified,
no binary columns) — bulk consumers should use the Flight endpoint; this
exists for parity and for human/debug access, like the reference's REST
face next to its Flight one.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from featherstore_spark.sources.serving import ServingError, ServingStore
from featherstore_spark.sources.serving import parse_ts as _parse_ts


def _rows(table) -> list[dict]:
    return [
        {k: (v.isoformat() if isinstance(v, datetime) else v) for k, v in row.items()}
        for row in table.to_pylist()
    ]


class _Handler(BaseHTTPRequestHandler):
    store: ServingStore  # set by make_server

    def log_message(self, *a):  # quiet test output
        pass

    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib handler name)
        try:
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            q = parse_qs(u.query)
            if parts == ["metrics"]:
                # Prometheus text exposition (reference pkg/metrics
                # /metrics endpoint, metrics.go:204)
                body = self.store.metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            if parts == ["feature-sets"]:
                return self._send(200, self.store.list_feature_sets())
            if len(parts) == 2 and parts[0] == "feature-sets":
                return self._send(200, self.store.get_meta(parts[1]))
            if len(parts) == 2 and parts[0] == "features":
                t = self.store.get_features(
                    parts[1],
                    entity_ids=q.get("entity_id"),
                    as_of=_parse_ts(q.get("as_of", [None])[0]),
                )
                return self._send(200, _rows(t))
            if len(parts) == 2 and parts[0] == "history":
                # missing required param is the CLIENT's error: 400 with
                # a descriptive message, not a KeyError-turned-500
                if "entity_id" not in q:
                    return self._send(
                        400, {"error": "missing required query param 'entity_id'"}
                    )
                t = self.store.get_feature_history(
                    parts[1],
                    q["entity_id"][0],
                    _parse_ts(q.get("start", [None])[0]),
                    _parse_ts(q.get("end", [None])[0]),
                )
                return self._send(200, _rows(t))
            return self._send(404, {"error": f"no route {u.path}"})
        except ServingError as e:
            return self._send(404, {"error": str(e)})
        except Exception as e:  # pragma: no cover - defensive
            return self._send(500, {"error": f"{type(e).__name__}: {e}"})

    def do_POST(self):  # noqa: N802
        try:
            parts = [p for p in urlparse(self.path).path.split("/") if p]
            n = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(n).decode() or "{}")
            if len(parts) == 2 and parts[0] == "feature-sets":
                return self._send(201, self.store.create_feature_set(parts[1], body))
            if len(parts) == 2 and parts[0] == "features-at":
                # point-in-time as-of reads over HTTP — the same semantic
                # the Flight `points` ticket serves (bucket-pruned when
                # the set is a registered bucketed table)
                pts = body.get("points")
                if not isinstance(pts, list) or any(
                    not isinstance(p, (list, tuple)) or len(p) != 2 for p in pts
                ):
                    return self._send(
                        400,
                        {"error": "body must be {\"points\": [[entity_id, ts], ...]}"},
                    )
                # malformed timestamps and null entities are CLIENT
                # errors: 400, never a ValueError-turned-500 (the same
                # contract the GET /history fix established)
                try:
                    parsed = [(p[0], _parse_ts(p[1])) for p in pts]
                except ValueError as ex:
                    return self._send(400, {"error": f"unparseable ts: {ex}"})
                try:
                    t = self.store.get_features_at(parts[1], parsed)
                except ServingError as ex:
                    code = 404 if "does not exist" in str(ex) else 400
                    return self._send(code, {"error": str(ex)})
                return self._send(200, _rows(t))
            return self._send(404, {"error": "no route"})
        except ServingError as e:
            return self._send(409, {"error": str(e)})
        except Exception as e:  # pragma: no cover - defensive
            return self._send(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(root: str, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """HTTP server over a catalog root; port 0 auto-assigns (read
    ``server.server_address[1]``).  Run with ``serve_forever()`` or via
    :func:`start_in_thread`."""
    handler = type("BoundHandler", (_Handler,), {"store": ServingStore(root)})
    return ThreadingHTTPServer((host, port), handler)


def start_in_thread(root: str, host: str = "127.0.0.1", port: int = 0):
    """(server, thread) — daemon-threaded server for embedding/tests."""
    srv = make_server(root, host, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t
