"""Quality alert thresholds (reference docs/data_quality.md:414-421: the
alerting table — Referential Integrity Breach >0.1% = High, Data
Completeness >1% = Medium, Business Rule Violation >0.5% = High, Schema
Validation Failure = Critical).

The metrics themselves already exist (validation error arrays, dup/null
rate queries, observe() row counts); this is the POLICY layer that
consumes them: a threshold set, a severity per alert type, an evaluator
that turns one validated frame into alert rows, and a raise-on-critical
contract. The notification channel is the recorded alerts LakeTable (the
open-Spark stand-in for the reference's Email/SNS fan-out — downstream
tails it with the streaming source); `run_medallion(alert_policy=...)`
wires it in, OFF by default so metric-only runs pay nothing.

Scale: evaluation is ONE aggregate over the already-validated frame —
per-rule violation counts come from `array_contains` on the existing
error array, map-side combined; no per-rule jobs, no second validation
pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ecommerce_lakehouse_spark.quality.rules import (
    ERRORS_COL,
    NotNull,
    RefIntegrity,
)

ALERT_SCHEMA = (
    "dataset string, alert_type string, rule string, severity string, "
    "n_rows bigint, n_violations bigint, violation_pct double, "
    "threshold_pct double"
)


class QualityAlertError(RuntimeError):
    """Raised when an alert at a raise_on severity fires (reference:
    Critical alerts abort the run; HandleValidationFailure state)."""

    def __init__(self, alerts: list[dict]):
        self.alerts = alerts
        lines = "; ".join(
            f"[{a['severity']}] {a['dataset']}.{a['alert_type']} "
            f"({a['rule']}): {a['violation_pct']:.3f}% > {a['threshold_pct']}%"
            for a in alerts
        )
        super().__init__(f"quality alerts at blocking severity: {lines}")


@dataclass(frozen=True)
class AlertPolicy:
    """Thresholds in PERCENT of the batch's rows (reference defaults).

    ``rejection_critical_pct``: a batch whose overall rejection rate
    crosses this is treated as the reference's "Schema Validation
    Failure" — the input's shape is wrong, not a few bad rows — and is
    Critical. ``raise_on`` severities abort after the alerts are
    recorded."""

    ref_integrity_pct: float = 0.1  # High: >0.1% invalid references
    completeness_pct: float = 1.0  # Medium: >1% missing required values
    rule_violation_pct: float = 0.5  # High: >0.5% business rule violations
    rejection_critical_pct: float = 50.0  # Critical: schema-level failure
    metric_discrepancy_pct: float = 1.0  # High: >1% recalculated-metric drift
    sla_seconds: float | None = None  # Medium: processing time exceeds SLA
    raise_on: tuple = ("critical",)


def _classify(rule) -> tuple[str, str]:
    if isinstance(rule, RefIntegrity):
        return "referential_integrity", "high"
    if isinstance(rule, NotNull):
        return "completeness", "medium"
    return "business_rule", "high"


def evaluate_alerts(
    validated: DataFrame, rules: list, policy: AlertPolicy, dataset: str
) -> list[dict]:
    """One aggregate pass over a frame that already carries
    ``validation_errors_list``: total rows, overall rejected count, and
    one violation count per rule (array_contains on the rule's message).
    Returns alert dicts for every threshold exceeded — recording and
    raising are the caller's choice (see run_medallion)."""
    msgs = [r.message() for r in rules]
    row = validated.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.size(F.col(ERRORS_COL)) > 0).cast("long")).alias("rej"),
        *[
            F.sum(F.array_contains(F.col(ERRORS_COL), m).cast("long")).alias(
                f"r{i}"
            )
            for i, m in enumerate(msgs)
        ],
    ).first()
    n = row["n"] or 0
    if n == 0:
        return []
    alerts: list[dict] = []
    for i, rule in enumerate(rules):
        cnt = row[f"r{i}"] or 0
        pct = 100.0 * cnt / n
        alert_type, severity = _classify(rule)
        thr = {
            "referential_integrity": policy.ref_integrity_pct,
            "completeness": policy.completeness_pct,
            "business_rule": policy.rule_violation_pct,
        }[alert_type]
        if pct > thr:
            alerts.append(
                {
                    "dataset": dataset,
                    "alert_type": alert_type,
                    "rule": rule.message(),
                    "severity": severity,
                    "n_rows": n,
                    "n_violations": cnt,
                    "violation_pct": pct,
                    "threshold_pct": thr,
                }
            )
    rej = row["rej"] or 0
    rej_pct = 100.0 * rej / n
    if rej_pct > policy.rejection_critical_pct:
        alerts.append(
            {
                "dataset": dataset,
                "alert_type": "schema_validation",
                "rule": "overall rejection rate",
                "severity": "critical",
                "n_rows": n,
                "n_violations": rej,
                "violation_pct": rej_pct,
                "threshold_pct": policy.rejection_critical_pct,
            }
        )
    return alerts


def metric_discrepancy_alert(
    expected: float, actual: float, policy: AlertPolicy, dataset: str, metric: str
) -> list[dict]:
    """Reference "Metric Discrepancy" row (>1% difference in recalculated
    metrics = High): compare a metric RE-READ from the written gold table
    against its recomputation from silver — catches storage-layer drift
    the in-flight validations cannot. Pure threshold math; the two
    numbers each come from one aggregate the caller already ran."""
    if expected == 0 and actual == 0:
        return []
    denom = abs(expected) if expected != 0 else abs(actual)
    pct = 100.0 * abs(actual - expected) / denom
    if pct <= policy.metric_discrepancy_pct:
        return []
    return [
        {
            "dataset": dataset,
            "alert_type": "metric_discrepancy",
            "rule": metric,
            "severity": "high",
            "n_rows": 0,
            "n_violations": 0,
            "violation_pct": pct,
            "threshold_pct": policy.metric_discrepancy_pct,
        }
    ]


def processing_delay_alert(
    elapsed_seconds: float, policy: AlertPolicy, dataset: str
) -> list[dict]:
    """Reference "Processing Delay" row (processing time exceeds SLA =
    Medium). Off unless the policy sets ``sla_seconds``."""
    if policy.sla_seconds is None or elapsed_seconds <= policy.sla_seconds:
        return []
    return [
        {
            "dataset": dataset,
            "alert_type": "processing_delay",
            "rule": f"sla {policy.sla_seconds}s",
            "severity": "medium",
            "n_rows": 0,
            "n_violations": 0,
            "violation_pct": elapsed_seconds,
            "threshold_pct": policy.sla_seconds,
        }
    ]


def blocking(alerts: list[dict], policy: AlertPolicy) -> list[dict]:
    return [a for a in alerts if a["severity"] in policy.raise_on]
