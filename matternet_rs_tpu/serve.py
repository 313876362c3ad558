"""Minimal HTTP serving layer for a built index.

The "production serving" surface the reference reserved as a stub
(``surfface-storage/src/main.rs`` is hello-world). Stdlib-only HTTP server
(no external deps) exposing:

* ``GET  /health``         → {"status": "ok", ...}
* ``GET  /info``           → index metadata
* ``POST /search``         → {"query": [floats], "k": 10, "alpha": 0.7,
                              "approx": false} → ranked results
* ``POST /search_energy``  → energy-mode search (if the index was built
                              with the energy pipeline)

Queries are validated and errors return structured JSON (400 for bad
requests, 422 for undecidable queries) instead of taking the server down.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from matternet_rs_tpu.core import ArrowSpace, UndecidableQueryError
from matternet_rs_tpu.graph import GraphLaplacian

log = logging.getLogger(__name__)


class IndexService:
    """Thread-safe query service over a loaded index."""

    def __init__(self, aspace: ArrowSpace, gl: GraphLaplacian):
        self.aspace = aspace
        self.gl = gl
        self._lock = threading.Lock()

    @classmethod
    def from_storage(cls, path, name: str = "index") -> "IndexService":
        from matternet_rs_tpu.storage import parquet as pq

        return cls(*pq.load_arrowspace(path, name))

    def info(self) -> dict:
        return {
            "n_items": self.aspace.nitems,
            "n_features": self.aspace.nfeatures,
            "n_clusters": self.aspace.n_clusters,
            "energy_mode": self.aspace.sub_centroids is not None,
            "taumode": self.aspace.taumode.name,
        }

    def search(self, query, k: int = 10, alpha: float = 0.7,
               approx: bool = False) -> list[dict]:
        q = np.asarray(query, np.float32)
        with self._lock:     # queries share jit caches; dispatch serially
            q_lambda = self.aspace.prepare_query_item(q, self.gl)
            res = self.aspace.search_lambda_aware(
                q, q_lambda, k, alpha, approx=approx
            )
        return [{"index": i, "score": s} for i, s in res]

    def search_energy(self, query, k: int = 10) -> list[dict]:
        from matternet_rs_tpu import energymaps

        q = np.asarray(query, np.float32)
        with self._lock:
            res = energymaps.search_energy(self.aspace, q, self.gl, k)
        return [{"index": i, "distance": d} for i, d in res]


def make_handler(service: IndexService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):   # route to logging, not stderr
            log.debug("http: " + fmt, *args)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, {"status": "ok", **service.info()})
            elif self.path == "/info":
                self._reply(200, service.info())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                doc = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError) as exc:
                return self._reply(400, {"error": f"bad JSON body: {exc}"})

            query = doc.get("query")
            if not isinstance(query, list) or not query:
                return self._reply(400, {"error": "'query' must be a non-empty list"})
            k = int(doc.get("k", 10))

            try:
                if self.path == "/search":
                    results = service.search(
                        query, k, float(doc.get("alpha", 0.7)),
                        bool(doc.get("approx", False)),
                    )
                elif self.path == "/search_energy":
                    results = service.search_energy(query, k)
                else:
                    return self._reply(404, {"error": f"unknown path {self.path}"})
            except UndecidableQueryError as exc:
                return self._reply(422, {"error": str(exc)})
            except ValueError as exc:
                return self._reply(400, {"error": str(exc)})
            self._reply(200, {"results": results})

    return Handler


def serve(service: IndexService, host: str = "127.0.0.1", port: int = 8757,
          block: bool = True) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(service))
    log.info("serving index on http://%s:%d", host, port)
    if block:
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
