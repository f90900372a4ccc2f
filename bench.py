"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR
(default sf0.1), fully materialized via the noop sink (so column pruning
can't skip work), printed as ONE JSON line.

Usage: python bench.py [--warmup N] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402


def materialize(df) -> None:
    # noop datasource: full pipeline execution, zero sink cost
    df.write.format("noop").mode("overwrite").save()


class _StageMeter:
    """Per-query stage metrics via the Spark UI REST API (shuffle read/
    write, input bytes): new completed stages since the last sample are
    attributed to the query that just ran. Shuffle volume is the number
    that predicts 100 TB behavior — wall time on a warm 32-core JVM
    doesn't show a shuffle that would dominate on a real cluster.
    Degrades to no-op if the UI is unreachable."""

    def __init__(self, spark):
        self.base = None
        self.seen: set[tuple] = set()
        try:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            if ui:
                self.base = f"{ui}/api/v1/applications/{app}/stages"
            self._sample()  # baseline: warmup stages are not attributed
        except Exception:
            self.base = None

    def _sample(self):
        import urllib.request

        out = []
        if not self.base:
            return out
        with urllib.request.urlopen(self.base + "?status=complete", timeout=5) as r:
            for st in json.load(r):
                key = (st["stageId"], st["attemptId"])
                if key in self.seen:
                    continue
                self.seen.add(key)
                out.append(st)
        return out

    def delta(self) -> dict | None:
        try:
            stages = self._sample()
        except Exception:
            return None
        if self.base is None:
            return None
        return {
            "stages": len(stages),
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
            "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument(
        "--detail",
        action="store_true",
        help="enable the Spark UI + per-query stage/shuffle metrics "
        "(writes BENCH_SHUFFLE.json). The UI listener inflates wall "
        "times 40-70%% on short queries, so this is OFF for timing runs.",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # UI (and its listener overhead) only for --detail runs; timing runs
    # use the lean session the driver's numbers should reflect
    spark = get_spark(
        "bench",
        extra_conf={"spark.ui.enabled": "true"} if args.detail else None,
    )

    names = [n for n in args.queries.split(",") if n] or list(REGISTRY)

    # JVM/codegen warmup on the flagship
    for _ in range(args.warmup):
        materialize(REGISTRY["daily_sales"](spark, sf_dir))

    meter = _StageMeter(spark) if args.detail else None
    times: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        materialize(REGISTRY[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
        if meter is not None:
            m = meter.delta()
            if m is not None:
                metrics[name] = m

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
    }
    if metrics:
        # separate sidecar (never on the stdout line, never in
        # BENCH_DETAIL.json): per-query stage counts and shuffle/input
        # volumes — the scale-predictive numbers
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_SHUFFLE.json"), "w") as f:
                json.dump({"queries": times, "stage_metrics": metrics}, f)
                f.write("\n")
        except OSError:
            pass
    # Full detail to stderr + sidecar file; stdout gets ONE JSON line capped
    # at ~1800 chars (the harness keeps only the last 2000 chars of stdout —
    # a 105-query dict blows that buffer and parses as null). If the full
    # dict doesn't fit, keep the slowest queries and count the rest.
    full = json.dumps(payload)
    print(full, file=sys.stderr)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            f.write(full + "\n")
    except OSError:
        pass
    if len(json.dumps(payload)) > 1800:
        slowest = dict(sorted(times.items(), key=lambda kv: -kv[1]))
        kept: dict[str, float] = {}
        for k, v in slowest.items():
            kept[k] = v
            payload["queries"] = kept
            payload["queries_omitted"] = len(times) - len(kept)
            if len(json.dumps(payload)) > 1800:
                kept.pop(k)
                payload["queries"] = kept
                payload["queries_omitted"] = len(times) - len(kept)
                break
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
