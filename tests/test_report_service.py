"""S13/S14 — report REST push and latest-report store/serve, exercised
end-to-end in-process: unit round-trips against the reference API
semantics (``dashboard/dashboard_api.py:23-99``), then the full loop
stream → minutely report → HTTP push → store → GET latest."""

from __future__ import annotations

import pytest

from end2end_data_pipeline_spark.plans.report_service import (
    NO_REPORT_STORED,
    ReportPushError,
    ReportStoreServer,
    get_latest_report,
    make_report_publisher,
    push_report,
)

DATA_REPORT = {
    "report": {
        "total_events": 100,
        "total_errors": 15,
        "by_event_type": {"SEARCH": {"SUCCESS": 17, "ERROR": 3}},
        "process_time": 0.5,
        "file_name": "2024-01-01_12-30.json",
    }
}
NO_DATA_REPORT = {"report": "No data for 2024-01-01_12-31."}


def test_store_serve_roundtrip():
    with ReportStoreServer() as srv:
        with pytest.raises(ReportPushError, match=NO_REPORT_STORED):
            get_latest_report(srv.url)
        push_report(srv.url, DATA_REPORT)
        assert get_latest_report(srv.url) == DATA_REPORT
        # most-recent-only storage (deque maxlen=1 in the reference)
        push_report(srv.url, NO_DATA_REPORT)
        assert get_latest_report(srv.url) == NO_DATA_REPORT
        assert srv.latest() == NO_DATA_REPORT


def test_health_and_clear():
    import json
    import urllib.request

    with ReportStoreServer() as srv:
        base = srv.url.rsplit("/", 1)[0]
        health = json.loads(urllib.request.urlopen(f"{base}/health").read())
        assert health == {"status": "healthy", "reports_count": 0}
        push_report(srv.url, DATA_REPORT)
        health = json.loads(urllib.request.urlopen(f"{base}/health").read())
        assert health["reports_count"] == 1
        req = urllib.request.Request(srv.url, method="DELETE")
        urllib.request.urlopen(req)
        with pytest.raises(ReportPushError, match=NO_REPORT_STORED):
            get_latest_report(srv.url)


def test_push_rejects_malformed_and_unreachable():
    with ReportStoreServer() as srv:
        with pytest.raises(ReportPushError):
            push_report(srv.url.rsplit("/", 1)[0] + "/nope", DATA_REPORT)
    # server now down: transport error surfaces as ReportPushError
    with pytest.raises(ReportPushError):
        push_report(srv.url, DATA_REPORT, timeout=0.5)


def test_dashboard_state_matches_reference_render_model():
    """The /dashboard chart model must derive exactly what the
    reference UI's matplotlib render derives from a report
    (dashboard_ui.py:60-140): grouped success/error series in dict
    order, title-cased labels, summary stats."""
    from end2end_data_pipeline_spark.plans.report_service import (
        dashboard_state,
    )

    payload = {
        "report": {
            "total_events": 5805,
            "total_errors": 1398,
            "by_event_type": {
                "ADD_TO_CART": {"SUCCESS": 876, "ERROR": 292},
                "VIEW_PRODUCT": {"SUCCESS": 868, "ERROR": 275},
            },
            "process_time": 22.16,
            "file_name": "2025-08-04_19-04.json",
        }
    }
    state = dashboard_state(payload)
    assert state["labels"] == ["Add To Cart", "View Product"]
    assert state["series"][0] == {"name": "Success", "values": [876, 868]}
    assert state["series"][1] == {"name": "Error", "values": [292, 275]}
    assert state["total_events"] == 5805
    assert state["error_rate"] == 1398 / 5805
    assert state["file_name"] == "2025-08-04_19-04.json"


def test_dashboard_endpoint_serves_chart_model_or_404():
    import json
    import urllib.request

    from end2end_data_pipeline_spark.plans.report_service import (
        ReportStoreServer,
        push_report,
    )

    with ReportStoreServer() as srv:
        dash_url = srv.url.replace("/report", "/dashboard")
        try:
            urllib.request.urlopen(dash_url)
            raise AssertionError("expected 404 before any report")
        except urllib.error.HTTPError as exc:
            assert exc.code == 404
        push_report(
            srv.url,
            {"report": {"total_events": 10, "total_errors": 1,
                        "by_event_type": {"SEARCH": {"SUCCESS": 9,
                                                     "ERROR": 1}}}},
        )
        with urllib.request.urlopen(dash_url) as resp:
            state = json.loads(resp.read())
        assert state["labels"] == ["Search"]
        assert state["series"][1]["values"] == [1]
        assert state["error_rate"] == 0.1
