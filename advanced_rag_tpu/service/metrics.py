"""Prometheus collectors for the API service (reference service.py:128-132).

Lives in its OWN module so collector registration runs exactly once per
process: ``python -m advanced_rag_tpu.service.app`` executes app.py twice
(once via the package import in service/__init__.py, once as __main__ by
runpy), but runpy only re-executes the target module — its imports, this
module included, stay cached in sys.modules.  That makes registration
naturally idempotent without reaching into prometheus_client's private
``REGISTRY._names_to_collectors`` mapping (ADVICE r1).
"""

from __future__ import annotations

from ..utils.constants import MetricsConstants

try:
    from prometheus_client import (  # noqa: F401  (re-exported)
        CONTENT_TYPE_LATEST,
        Counter,
        Gauge,
        Histogram,
        generate_latest,
    )

    PROM = True

    REQUESTS_TOTAL = Counter("rag_api_requests_total", "API requests",
                             ["endpoint", "status"])
    RETRIEVE_LATENCY = Histogram(
        "rag_retrieve_latency_ms", "Retrieve latency (ms)",
        buckets=MetricsConstants.LATENCY_BUCKETS_MS)
    ERRORS_TOTAL = Counter("rag_errors_total", "Errors", ["error_type"])
    ACTIVE_REQUESTS = Gauge("rag_active_requests", "In-flight requests")
    EMBED_LATENCY = Histogram("rag_embedding_latency_seconds",
                              "Embedding latency (s)")
    # quality gauges backing the alert thresholds the reference
    # documents but never exports (ref ARCHITECTURE.md:369-373):
    # observability/alerts/rag_alerts.yaml fires on these
    HALLUCINATION_RISK = Gauge(
        "rag_hallucination_risk",
        "Hallucination risk of the most recent evaluated retrieve")
    DRIFT_MAGNITUDE = Gauge(
        "rag_drift_magnitude", "Magnitude from the last drift check")
    SLA_COMPLIANCE = Gauge(
        "rag_sla_compliance_ratio",
        "Rolling share of retrieves meeting the latency target")
    # shed accounting: degrade-to-empty 200s and admission rejections
    # are failures to the user that the 5xx error SLO cannot see; they
    # get their own budget (docs/SLO.md) and alert
    SHED_TOTAL = Counter(
        "rag_shed_total",
        "Requests shed (admission 429, degraded-empty, or timeout)",
        ["reason"])
except ImportError:  # pragma: no cover - prometheus is baked in
    PROM = False
    CONTENT_TYPE_LATEST = "text/plain"

    def generate_latest(*_a, **_k):  # type: ignore[misc]
        return b""


__all__ = [
    "PROM", "CONTENT_TYPE_LATEST", "generate_latest", "REQUESTS_TOTAL",
    "RETRIEVE_LATENCY", "ERRORS_TOTAL", "ACTIVE_REQUESTS", "EMBED_LATENCY",
    "HALLUCINATION_RISK", "DRIFT_MAGNITUDE", "SLA_COMPLIANCE", "SHED_TOTAL",
]
