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
    object with `probe_one(vector, k=..., **opts)`.

    The optional UI trio completes the reference's interactive shell
    (project/ui/app.py:17-85 — Streamlit title, two stat tiles with an
    'Update stats' button, a 'Run analysis' button with spinner + live
    log streaming, then the result charts) with stdlib only:

    - ``stats_fn() -> (n_users, n_posts)`` backs ``GET /stats`` (the
      tile refresh; app.py's two Cypher COUNTs).
    - ``analyze_fn(log: Callable[[str], None])`` backs
      ``POST /analyze`` — run on a daemon thread, its log lines
      streamed to pollers of ``GET /analyze/status`` exactly like
      app.py tails the subprocess stdout into the expander; terminal
      states ``done``/``failed`` are the success/error banners. A
      second POST while running answers 409 (Streamlit's single-run
      button semantics).
    - ``report_dir`` backs ``GET /report/<file>`` (report.html + the
      chart PNGs from sinks/report.py) and ``GET /ui`` serves the
      interactive page itself: tiles, both buttons, spinner, log box,
      and the results section wired to these endpoints with fetch().
    """

    def __init__(
        self,
        probes: dict,
        stats_fn=None,
        analyze_fn=None,
        report_dir: str | None = None,
    ) -> None:
        self.probes = dict(probes)
        self.stats_fn = stats_fn
        self.analyze_fn = analyze_fn
        self.report_dir = report_dir
        self._analysis = {"state": "idle", "log": ""}
        self._lock = threading.Lock()

    def _analysis_log(self, line: str) -> None:
        with self._lock:
            self._analysis["log"] += str(line) + "\n"

    def _start_analysis(self) -> tuple[int, dict]:
        if self.analyze_fn is None:
            return 404, {"error": "no analyze_fn configured"}
        with self._lock:
            if self._analysis["state"] == "running":
                return 409, {"error": "analysis already running"}
            self._analysis = {"state": "running", "log": ""}

        def run() -> None:
            try:
                self.analyze_fn(self._analysis_log)
            except Exception as exc:  # surface, don't kill the server
                self._analysis_log(f"ERROR: {exc}")
                with self._lock:
                    self._analysis["state"] = "failed"
                return
            with self._lock:
                self._analysis["state"] = "done"

        threading.Thread(target=run, daemon=True).start()
        return 202, {"state": "running"}

    def handle(self, path: str, payload: dict) -> tuple[int, dict]:
        if path == "/health":
            return 200, {"status": "ok", "indexes": sorted(self.probes)}
        if path == "/stats":
            if self.stats_fn is None:
                return 404, {"error": "no stats_fn configured"}
            n_users, n_posts = self.stats_fn()
            return 200, {"users": int(n_users), "posts": int(n_posts)}
        if path == "/analyze":
            return self._start_analysis()
        if path == "/analyze/status":
            with self._lock:
                return 200, dict(self._analysis)
        if path != "/search":
            return 404, {
                "error": f"no route {path!r}",
                "routes": [
                    "/health",
                    "/search",
                    "/stats",
                    "/analyze",
                    "/analyze/status",
                    "/ui",
                    "/report/<file>",
                ],
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


# The interactive page (reference project/ui/app.py:17-85 rendered as
# plain HTML+JS over this module's endpoints): title, the two stat
# tiles + 'Update stats', 'Run analysis' with spinner + live log box
# polling /analyze/status, and the results section revealing the chart
# images once the run lands.
_UI_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Echo Chamber Analysis</title>
<style>
body { font-family: sans-serif; margin: 2rem; }
.tiles { display: flex; gap: 1rem; }
.tile { border: 1px solid #ccc; border-radius: 8px; padding: 1rem 2rem; }
.num { font-size: 2rem; font-weight: bold; }
.lbl { color: #666; }
#log { background: #111; color: #ddd; padding: 8px; min-height: 6rem;
       white-space: pre-wrap; font-family: monospace; display: none; }
#spinner { display: none; }
button { margin: 0.5rem 0.5rem 0.5rem 0; padding: 0.4rem 1rem; }
img { max-width: 100%; }
</style></head><body>
<h1>Echo Chamber Analysis</h1>
<div class="tiles">
  <div class="tile"><div class="num" id="n-users">-</div>
    <div class="lbl">Number of users</div></div>
  <div class="tile"><div class="num" id="n-posts">-</div>
    <div class="lbl">Number of posts</div></div>
</div>
<button id="update-stats">Update stats</button>
<button id="run-analysis">Run analysis</button>
<div id="spinner">Running analysis... this may take a few minutes</div>
<div id="log"></div>
<div id="status"></div>
<div id="results"></div>
<script>
async function updateStats() {
  const r = await fetch('/stats');
  if (!r.ok) return;
  const s = await r.json();
  document.getElementById('n-users').textContent = s.users;
  document.getElementById('n-posts').textContent = s.posts;
}
async function poll() {
  const r = await fetch('/analyze/status');
  const s = await r.json();
  document.getElementById('log').textContent = s.log;
  if (s.state === 'running') { setTimeout(poll, 500); return; }
  document.getElementById('spinner').style.display = 'none';
  document.getElementById('status').textContent =
    s.state === 'done' ? 'Analysis completed successfully'
                       : 'Analysis failed';
  if (s.state === 'done') {
    document.getElementById('results').innerHTML =
      ['ecs', 'conductance', 'variance'].map(m =>
        `<figure><img src="/report/${m}_by_community.png"/>` +
        `<figcaption>${m}_by_community.png</figcaption></figure>`
      ).join('');
  }
}
document.getElementById('update-stats').onclick = updateStats;
document.getElementById('run-analysis').onclick = async () => {
  const r = await fetch('/analyze', {method: 'POST'});
  if (r.status === 409) return;
  document.getElementById('spinner').style.display = 'block';
  document.getElementById('log').style.display = 'block';
  poll();
};
updateStats();
</script></body></html>
"""

_CONTENT_TYPES = {
    ".html": "text/html; charset=utf-8",
    ".png": "image/png",
    ".csv": "text/csv",
    ".json": "application/json",
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

    def _respond_raw(self, code: int, ctype: str, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _serve_report_file(self, path: str) -> None:
        import os

        if self.app.report_dir is None:
            self._respond(404, {"error": "no report_dir configured"})
            return
        name = path[len("/report/"):]
        # basename-only: no separators, no traversal
        if not name or os.path.basename(name) != name or name.startswith("."):
            self._respond(400, {"error": "bad report file name"})
            return
        full = os.path.join(self.app.report_dir, name)
        if not os.path.isfile(full):
            self._respond(404, {"error": f"no report file {name!r}"})
            return
        ext = os.path.splitext(name)[1].lower()
        ctype = _CONTENT_TYPES.get(ext, "application/octet-stream")
        with open(full, "rb") as fh:
            self._respond_raw(200, ctype, fh.read())

    def do_GET(self) -> None:  # noqa: N802 (http.server contract)
        url = urlparse(self.path)
        if url.path == "/ui":
            self._respond_raw(
                200, "text/html; charset=utf-8", _UI_PAGE.encode("utf-8")
            )
            return
        if url.path.startswith("/report/"):
            self._serve_report_file(url.path)
            return
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
    probes: dict,
    host: str = "127.0.0.1",
    port: int = 0,
    stats_fn=None,
    analyze_fn=None,
    report_dir: str | None = None,
) -> ThreadingHTTPServer:
    """Start the serving shell on a daemon thread; returns the server
    (``server.server_address`` carries the bound port — port=0 picks a
    free one). ``server.shutdown()`` stops it. The optional UI trio
    (stats_fn / analyze_fn / report_dir) enables /ui, /stats,
    /analyze(+/status) and /report/<file> — see ServingApp."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {
            "app": ServingApp(
                probes,
                stats_fn=stats_fn,
                analyze_fn=analyze_fn,
                report_dir=report_dir,
            )
        },
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
    p.add_argument(
        "--report-dir",
        default=None,
        help="serve /ui and /report/<file> from this directory "
        "(sinks/report.py output)",
    )
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
    if not probes and not args.report_dir:
        p.error("at least one --ivf shard or a --report-dir is required")
    server = start_server(
        probes, host=args.host, port=args.port, report_dir=args.report_dir
    )
    print(json.dumps({"port": server.server_address[1]}), flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
        sys.exit(0)


if __name__ == "__main__":
    main()
