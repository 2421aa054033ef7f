"""Standing-process HTTP shell around the serving trio — stdlib only.

The reference runs two standing server roles next to its batch jobs: the
Qdrant collection answering vector queries over HTTP
(project/qdrant/consumer_post.py:42-49, post_distance_test.py:26-31) and
the Streamlit UI shell (project/ui/app.py:40-57). The probe kernels
(`IvfProbe`/`PqProbe`/`GraphAnnProbe`) already answer point queries from
resident numpy with batch-identical semantics; this module is the thin
process boundary that turns them into a service: `http.server` from the
standard library (no new dependencies), JSON in/out, one process per
serving shard.

Routes
------
- ``GET /health`` → ``{"status": "ok", "indexes": [...]}``
- ``POST /search`` with body
  ``{"index": "ivf", "vector": [...], "k": 10, "nprobe": 4}`` →
  ``{"index": ..., "k": ..., "results": [{"id", "score"}, ...]}``.
  Optional per-index knobs pass through to ``probe_one``: ``nprobe``
  (IVF), ``refine`` (PQ), ``beam``/``hops`` (graph).
- ``GET /search?index=ivf&k=10&nprobe=4&vector=0.1,0.2,...`` — the
  same query as URL parameters, for curl-style poking.

Scale shape: the server holds exactly one process-resident index shard
(the probes' own memory contract); a fleet of these behind any HTTP
load balancer is the standard ANN serving topology, and the cell-keyed
index layout already makes the shard split a partition filter.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_PROBE_OPTS = ("nprobe", "refine", "beam", "hops")


class ServingApp:
    """Route logic, separated from the HTTP plumbing so it unit-tests
    without sockets. `probes` maps an index name (e.g. 'ivf') to an
    object with `probe_one(vector, k=..., **opts)`."""

    def __init__(self, probes: dict) -> None:
        self.probes = dict(probes)

    def handle(self, path: str, payload: dict) -> tuple[int, dict]:
        if path == "/health":
            return 200, {"status": "ok", "indexes": sorted(self.probes)}
        if path != "/search":
            return 404, {
                "error": f"no route {path!r}",
                "routes": ["/health", "/search"],
            }
        name = payload.get("index", "ivf")
        probe = self.probes.get(name)
        if probe is None:
            return 404, {
                "error": f"unknown index {name!r}",
                "indexes": sorted(self.probes),
            }
        vector = payload.get("vector")
        if not isinstance(vector, (list, tuple)) or not vector:
            return 400, {"error": "missing or empty 'vector'"}
        try:
            vector = [float(x) for x in vector]
            k = int(payload.get("k", 10))
            opts = {
                o: int(payload[o])
                for o in _PROBE_OPTS
                if payload.get(o) is not None
            }
        except (TypeError, ValueError) as exc:
            return 400, {"error": f"bad parameter: {exc}"}
        try:
            results = probe.probe_one(vector, k=k, **opts)
        except TypeError as exc:
            # e.g. nprobe passed to the PQ probe — surface, don't 500
            return 400, {"error": f"option not supported: {exc}"}
        return 200, {
            "index": name,
            "k": k,
            "results": [{"id": i, "score": s} for i, s in results],
        }


class _Handler(BaseHTTPRequestHandler):
    app: ServingApp  # injected by start_server via a subclass attribute

    def _respond(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (http.server contract)
        url = urlparse(self.path)
        qs = {k: v[-1] for k, v in parse_qs(url.query).items()}
        payload: dict = dict(qs)
        if "vector" in payload:
            payload["vector"] = [
                x for x in payload["vector"].split(",") if x != ""
            ]
        code, obj = self.app.handle(url.path, payload)
        self._respond(code, obj)

    def do_POST(self) -> None:  # noqa: N802
        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length) if length else b""
        try:
            payload = json.loads(raw or b"{}")
            if not isinstance(payload, dict):
                raise ValueError("body must be a JSON object")
        except ValueError as exc:
            self._respond(400, {"error": f"bad JSON body: {exc}"})
            return
        code, obj = self.app.handle(urlparse(self.path).path, payload)
        self._respond(code, obj)

    def log_message(self, *args) -> None:  # silent: tests hammer it
        pass


def start_server(
    probes: dict, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Start the serving shell on a daemon thread; returns the server
    (``server.server_address`` carries the bound port — port=0 picks a
    free one). ``server.shutdown()`` stops it."""
    handler = type(
        "BoundHandler", (_Handler,), {"app": ServingApp(probes)}
    )
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv: list | None = None) -> None:
    """One serving PROCESS per index shard — the fleet deployment unit
    the module docstring describes (a load balancer or a thin fan-out
    client in front of N of these is the standard ANN serving
    topology; the reference's standing Qdrant role,
    project/qdrant/consumer_post.py:42-49).

    ``python -m echo_chambers_detection_spark.serving.http_api
    --ivf ivf=INDEX_DIR,EMB_PARQUET [--port 0]`` prints one JSON line
    ``{"port": N}`` once bound, then serves until killed."""
    import argparse
    import sys

    from echo_chambers_detection_spark.serving.ivf_probe import IvfProbe

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument(
        "--ivf",
        action="append",
        default=[],
        metavar="NAME=INDEX_DIR,EMB_PARQUET",
        help="mount an IVF index shard under route name NAME",
    )
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    args = p.parse_args(argv)
    probes = {}
    for spec in args.ivf:
        name, _, rest = spec.partition("=")
        idx_path, _, emb_path = rest.partition(",")
        if not (name and idx_path and emb_path):
            p.error(f"bad --ivf spec {spec!r}")
        probes[name] = IvfProbe(
            idx_path, emb_path, id_col=args.id_col, vec_col=args.vec_col
        )
    if not probes:
        p.error("at least one --ivf shard is required")
    server = start_server(probes, host=args.host, port=args.port)
    print(json.dumps({"port": server.server_address[1]}), flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
        sys.exit(0)


if __name__ == "__main__":
    main()
