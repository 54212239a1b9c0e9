#!/usr/bin/env python
"""Per-stage wall-clock profile of registry queries (guide §1/§7).

Runs each named key once warm then once timed (collect), and prints
every Spark stage the timed run executed: submission offset, duration,
task count, executor-run vs wall time, shuffle bytes. This is the
"which wave costs what" view the UI would give — captured through the
REST status API so it works headless and can be diffed across
commits.

Usage::

    python tools/stage_profile.py [--sf DIR] [--runs 1] key [key ...]

The session here enables the UI (REST endpoint) — bench.py and the
driver keep it off; this is a profiling harness, not the bench.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from pyspark.sql import SparkSession  # noqa: E402

from etl_cnc_spark.registry import load_all  # noqa: E402


def _rest_ts_ms(ts: str) -> float:
    """REST status-API timestamp ('2026-08-18T04:12:43.123GMT') →
    epoch milliseconds.  strptime on the FULL format (ADVICE r15, low:
    the old [20:23] millisecond slice broke silently if the format
    varied, and time.mktime interpreted the GMT stamp in local time —
    offsets only stayed consistent by luck).  Parsed as UTC via
    calendar.timegm; deltas come from real datetime math."""
    import calendar
    import datetime as _dt

    dt = _dt.datetime.strptime(ts.removesuffix("GMT"), "%Y-%m-%dT%H:%M:%S.%f")
    return calendar.timegm(dt.timetuple()) * 1000.0 + dt.microsecond / 1000.0


def _spark() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("etl-cnc-stage-profile")
        .config("spark.sql.shuffle.partitions", str(max(8, cpus // 2)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .getOrCreate()
    )


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args(argv)

    reg = load_all()
    unknown = [k for k in args.keys if k not in reg]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl + "/api/v1/applications"
    app_id = _get(base)[0]["id"]

    def stages():
        return {
            s["stageId"]: s
            for s in _get(f"{base}/{app_id}/stages?status=complete")
        }

    for key in args.keys:
        build = reg[key].build
        build(spark, args.sf).collect()  # warm-up
        for run in range(args.runs):
            before = set(stages())
            spark.sparkContext.setJobDescription(f"{key} timed#{run}")
            t0 = time.perf_counter()
            build(spark, args.sf).collect()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            time.sleep(0.3)  # let the status store settle
            after = stages()
            new = sorted(set(after) - before)
            print(f"\n=== {key} run{run}: wall {wall:.3f}s, {len(new)} stages ===")
            if not new:
                continue
            t_base = min(_rest_ts_ms(after[s]["submissionTime"]) for s in new)
            for sid in new:
                s = after[sid]
                sub = _rest_ts_ms(s["submissionTime"]) - t_base
                comp = _rest_ts_ms(s["completionTime"]) - t_base
                print(
                    f"  stage {sid:4d} +{sub:7.0f}ms dur={comp - sub:6.0f}ms "
                    f"tasks={s['numCompleteTasks']:3d} "
                    f"exRun={s['executorRunTime']:6d}ms "
                    f"shR={s['shuffleReadBytes'] >> 10:6d}K shW={s['shuffleWriteBytes'] >> 10:6d}K  "
                    f"{s['name'][:70]}"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
