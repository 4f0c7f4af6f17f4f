"""Report push + store/serve — the reference's dashboard boundary
(S13/S14) as pure-stdlib, in-process components.

Reference behavior reproduced:

- the Airflow task POSTs the report JSON to ``DASHBOARD_API_URL`` and
  raises on a non-2xx response (``airflow/dags/pipeline.py:228-236``);
- the dashboard API stores ONLY the most recent report
  (``dashboard/dashboard_api.py:14`` — ``deque(maxlen=1)``) and serves
  it back, 404 with ``{"detail": "No report stored."}`` when empty
  (``dashboard_api.py:57-79``), plus ``GET /health`` with a stored
  count and ``DELETE /report`` for test isolation
  (``dashboard_api.py:81-99``).

The server is ``http.server`` on an ephemeral port (no FastAPI /
requests dependency — the engine ships zero extra deps); the pusher is
``urllib``. ``make_report_publisher`` adapts the pusher to
``streaming/pipeline.py:publish_minutely_reports``'s ``publish``
callback, closing the reference's full loop — stream → minutely
report → REST push → store → latest-report GET — inside one process.
A production deployment swaps the URL; nothing else changes.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable

NO_REPORT_STORED = "No report stored."


def dashboard_state(payload: dict[str, Any]) -> dict[str, Any]:
    """The render-ready chart model the reference dashboard draws —
    every derived value of ``dashboard/dashboard_ui.py:60-140``'s
    matplotlib render (grouped success/error bars per event type,
    title-cased labels, the annotation numbers, the summary stats)
    as plain JSON, so any front end can draw the same picture. The
    pixel rendering itself is presentation (SURVEY §1.4/§3) and needs
    matplotlib; everything up to it is data and lives here."""
    report = payload.get("report", payload)
    by_type = report.get("by_event_type", {})
    labels, successes, errors = [], [], []
    for key, value in by_type.items():  # UI iterates dict order as-is
        labels.append(key.replace("_", " ").title())
        successes.append(int(value.get("SUCCESS", 0)))
        errors.append(int(value.get("ERROR", 0)))
    total = int(report.get("total_events", 0))
    err = int(report.get("total_errors", 0))
    return {
        "labels": labels,
        "series": [
            {"name": "Success", "values": successes},
            {"name": "Error", "values": errors},
        ],
        "total_events": total,
        "total_errors": err,
        "error_rate": (err / total) if total else 0.0,
        "file_name": report.get("file_name"),
        "process_time": report.get("process_time"),
    }


class ReportPushError(RuntimeError):
    """Non-2xx or unreachable dashboard endpoint (the analog of
    ``requests.raise_for_status`` in the reference push task)."""


def push_report(url: str, report: dict[str, Any], timeout: float = 5.0) -> None:
    """POST one report dict as JSON; raise ``ReportPushError`` on any
    HTTP or transport failure."""
    body = json.dumps(report).encode("utf-8")
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if not 200 <= resp.status < 300:
                raise ReportPushError(f"dashboard returned {resp.status}")
    except urllib.error.URLError as exc:
        raise ReportPushError(str(exc)) from exc


def make_report_publisher(url: str, timeout: float = 5.0) -> Callable[[dict], None]:
    """Adapter for ``publish_minutely_reports(publish=...)``: each
    closed-minute report is pushed to the dashboard endpoint."""

    def publish(report: dict[str, Any]) -> None:
        push_report(url, report, timeout=timeout)

    return publish


class ReportStoreServer:
    """Latest-report store/serve API (S14) on an ephemeral local port.

    Endpoints (reference parity): ``POST /report`` (store, most recent
    only), ``GET /report`` (latest or 404), ``GET /health``,
    ``DELETE /report`` (clear). Context-managed; threaded so a
    streaming query's foreachBatch can push while a reader polls.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        storage: deque[dict[str, Any]] = deque(maxlen=1)
        self.storage = storage

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, payload: dict[str, Any]) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self) -> None:  # noqa: N802 (stdlib API)
                if self.path != "/report":
                    return self._send(404, {"detail": "Not Found"})
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    payload = json.loads(self.rfile.read(n))
                except json.JSONDecodeError:
                    return self._send(422, {"detail": "invalid JSON"})
                if "report" not in payload:
                    return self._send(422, {"detail": "missing 'report'"})
                storage.append(payload)
                self._send(200, {"stored": True})

            def do_GET(self) -> None:  # noqa: N802
                if self.path == "/health":
                    return self._send(
                        200,
                        {"status": "healthy", "reports_count": len(storage)},
                    )
                if self.path == "/dashboard":
                    # the UI's chart as data: what the reference's
                    # matplotlib render derives from the latest report
                    if not storage:
                        return self._send(404, {"detail": NO_REPORT_STORED})
                    return self._send(200, dashboard_state(storage[0]))
                if self.path != "/report":
                    return self._send(404, {"detail": "Not Found"})
                if not storage:
                    return self._send(404, {"detail": NO_REPORT_STORED})
                self._send(200, storage[0])

            def do_DELETE(self) -> None:  # noqa: N802
                if self.path != "/report":
                    return self._send(404, {"detail": "Not Found"})
                storage.clear()
                self._send(200, {"cleared": True})

            def log_message(self, *args: Any) -> None:
                pass  # keep test output quiet

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}/report"

    def __enter__(self) -> "ReportStoreServer":
        self._thread.start()
        return self

    def __exit__(self, *exc: Any) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)

    def latest(self) -> dict[str, Any] | None:
        """Driver-side convenience: the stored report without HTTP."""
        return self.storage[0] if self.storage else None


def get_latest_report(url: str, timeout: float = 5.0) -> dict[str, Any]:
    """GET the most recent report; raise ``ReportPushError`` (with the
    reference's 404 detail) when none is stored."""
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        detail = NO_REPORT_STORED if exc.code == 404 else str(exc)
        raise ReportPushError(detail) from exc
    except urllib.error.URLError as exc:
        raise ReportPushError(str(exc)) from exc
