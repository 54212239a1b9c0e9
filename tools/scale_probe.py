#!/usr/bin/env python
"""10x scale probe: empirical "would it survive a scale-up" evidence
(VERDICT r13 item 3).

The read-only fixtures stop at sf0.1, so plan reading was the only
scale evidence above that.  This tool generates a deterministic
~sf1-equivalent dataset with the engine's own Spark write path, then
re-runs the flagship bench set plus the guard-bearing and
multi-scan-probe keys at BOTH scales and checks:

(a) no overflow/degeneracy guard fires spuriously on 10x data
    (stat_ancova's raise_error BIGINT bound, stat_hoeffding_d's
    DECIMAL cap, the bounded-grid ECDF/KDE family, events_cuped's
    HUGEINT co-moments);
(b) wall-time scales sub-quadratically: t(sf1)/t(sf0.1) must stay
    < 100 (the quadratic ratio at 10x data), and ratios > 30 are
    flagged for attribution;
(c) the 4 documented multi-scan probe-class keys (SCALE.md r13:
    etl_fk_discovery, agg_bloom_membership, sim_recall_lsh,
    embed_matryoshka_topk) keep IDENTICAL per-table parquet scan
    counts at both scales — replay bugs grow with consumers, not
    data, so count equality across a 10x scale-up pins them;
(d) optional ``--parity``: full DuckDB oracle parity at sf1 for the
    probe's hash-checked keys — the t2 gate at 10x the bench scale.

Generation (seed-free, fully deterministic): each scaled table is 10
key-shifted replicas of the sf0.1 fixture (replica i adds i*1e6 to
every entity key, so all FK joins stay consistent within a replica
and replicas never collide).  region/nation stay fixed (TPC-H dims
don't scale).  Replicas i>0 get content isolation so self-join /
dedup workloads keep their per-replica candidate structure instead
of exploding quadratically ACROSS replicas (10 copies of one doc =
45 bogus near-dup pairs): every document token is suffixed with a
replica tag (within-replica shingle/vocab relations preserved
exactly; vocabulary scales 10x — realistic corpus growth), and every
embedding gets one replica-indexed dimension shifted by +0.7
(cross-replica cosine drops out of every near-dup band).  Output is
one single-file parquet per table, byte-layout-compatible with the
fixture dirs, so ``catalog.table`` and the DuckDB oracle read it
unchanged.

Usage::

    python tools/scale_probe.py --gen            # build /tmp/etlcnc_scale_sf1
    python tools/scale_probe.py --run            # timing + guards + scan counts
    python tools/scale_probe.py --parity         # DuckDB parity at sf1
    python tools/scale_probe.py --run --keys agg_groupby tpch_q21
"""

from __future__ import annotations

import argparse
import contextlib
import glob
import io
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_cnc_spark.registry import load_all  # noqa: E402
from etl_cnc_spark.session import get_spark  # noqa: E402
from etl_cnc_spark import catalog  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/etlcnc_scale_sf1")
OFF = 1_000_000  # key shift per replica (max fixture key is 149,999)

# keys whose builds carry explicit overflow/degeneracy guards — the
# probe proves none fires on 10x data (SCALE.md documents each bound)
GUARD_KEYS = [
    "stat_ancova",            # raise_error past the milli BIGINT bound
    "stat_hoeffding_d",       # DECIMAL(38,0) cap n <= 2.3e7
    "ml_quantile_normalize",  # bounded-grid ECDF family
    "stat_kde_gaussian",      # bounded value grid + Silverman bandwidth
    "events_cuped",           # HUGEINT pooled co-moments
]

# the 4 documented >=4-same-table-scan survivors (SCALE.md r13 audit)
SCAN_KEYS = [
    "etl_fk_discovery",
    "agg_bloom_membership",
    "sim_recall_lsh",
    "embed_matryoshka_topk",
]

# entity-key columns to shift per replica, per table
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def _write_single_parquet(df, out_path: str) -> None:
    """Engine write path -> one single-file parquet matching the
    fixture layout (the DuckDB oracle reads a file, not a dir)."""
    tmp = out_path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))
    assert len(part) == 1, part
    if os.path.exists(out_path):
        os.remove(out_path)
    shutil.move(part[0], out_path)
    shutil.rmtree(tmp)


def generate(spark, out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in FIXED_DIMS:
        df = catalog.table(spark, BASE_SF, t)
        _write_single_parquet(df, f"{out_dir}/{t}.parquet")
        print(f"gen {t}: copied (fixed dim)")
    for t, keys in KEY_SHIFTS.items():
        base = catalog.table(spark, BASE_SF, t)
        parts = []
        for i in range(replicas):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, (F.col(k) + F.lit(i * OFF)).cast("long"))
            if i > 0 and t == "documents":
                # suffix every token with the replica tag: within-
                # replica shingle/vocab relations preserved exactly,
                # zero cross-replica n-gram overlap
                rep = rep.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1q{i}")
                ).withColumn("n_chars", F.length("text").cast("long"))
            if i > 0 and t == "embeddings":
                # dim cycles mod 64; the replica-scaled magnitude keeps
                # replicas i and i+64 separated when the dim collides
                def _perturb(d, eps):
                    return lambda x, j: (
                        x + F.when(j == F.lit(d), F.lit(eps)).otherwise(F.lit(0.0))
                    ).cast("float")

                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding", _perturb((i - 1) % 64, 0.7 + 0.01 * i)
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        _write_single_parquet(out, f"{out_dir}/{t}.parquet")
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"gen {t}: {n} rows ({replicas} replicas)")


def _table_scan_counts(df) -> dict[str, int]:
    """Uncached parquet scans per table from the formatted FINAL plan
    (same id-filtering discipline as tools/plan_audit.audit)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    final_ids = set(re.findall(r"\((\d+)\)", plan.split("== Initial Plan ==")[0]))
    counts: dict[str, int] = {}
    for m in re.finditer(
        r"\((\d+)\) Scan parquet.*?Location: \w+\s*\[[^\]]*?([a-z_]+)\.parquet",
        plan,
        re.S,
    ):
        if m.group(1) in final_ids:
            counts[m.group(2)] = counts.get(m.group(2), 0) + 1
    return counts


def run_probe(spark, keys: list[str] | None, base_sf: str, out_dir: str) -> int:
    reg = load_all()
    bench_keys = [k for k, q in sorted(reg.items()) if q.bench]
    probe = keys or (bench_keys + GUARD_KEYS + SCAN_KEYS)
    failures = []
    rows = []
    for k in probe:
        row = {"key": k}
        for label, sf in (("base", base_sf), ("sf1", out_dir)):
            try:
                reg[k].build(spark, sf).collect()  # warm-up
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    reg[k].build(spark, sf).collect()
                    runs.append(time.perf_counter() - t0)
                row[label] = round(min(runs), 3)
            except Exception as exc:  # noqa: BLE001 — guard fired = finding
                msg = str(exc)
                row[label] = f"EXC {type(exc).__name__}: {msg[:120]}"
                if "exactness cap" in msg:
                    # a DOCUMENTED loud-failure bound fired with its
                    # remedy message — designed behavior past the cap,
                    # recorded but not a probe failure
                    row[label] = "EXPECTED-LOUD: " + row[label]
                else:
                    failures.append(f"{k}@{label}: {row[label]}")
        if isinstance(row.get("base"), float) and isinstance(row.get("sf1"), float):
            row["ratio"] = round(row["sf1"] / max(row["base"], 1e-9), 1)
            if row["ratio"] >= 100:
                failures.append(f"{k}: super-quadratic ratio {row['ratio']}x")
        if k in SCAN_KEYS and not isinstance(row.get("sf1"), str):
            c_base = _table_scan_counts(reg[k].build(spark, base_sf))
            c_sf1 = _table_scan_counts(reg[k].build(spark, out_dir))
            row["scan_counts"] = {"base": c_base, "sf1": c_sf1}
            if c_base != c_sf1:
                failures.append(f"{k}: scan counts drifted {c_base} -> {c_sf1}")
        rows.append(row)
        print(json.dumps(row))
    total_base = sum(r["base"] for r in rows if isinstance(r.get("base"), float))
    total_sf1 = sum(r["sf1"] for r in rows if isinstance(r.get("sf1"), float))
    summary = {
        "keys": len(rows),
        "total_base_sec": round(total_base, 3),
        "total_sf1_sec": round(total_sf1, 3),
        "total_ratio": round(total_sf1 / max(total_base, 1e-9), 2),
        "flagged_gt_30x": [
            r["key"] for r in rows if isinstance(r.get("ratio"), float) and r["ratio"] > 30
        ],
        "failures": failures,
    }
    print(json.dumps(summary))
    return 1 if failures else 0


def run_parity(spark, keys: list[str] | None, out_dir: str) -> int:
    from etl_cnc_spark.oracle import compare

    reg = load_all()
    bench_keys = [k for k, q in sorted(reg.items()) if q.bench]
    probe = keys or (bench_keys + GUARD_KEYS)
    probe = [k for k in probe if reg[k].check == "hash"]
    failures = 0
    for k in probe:
        t0 = time.time()
        try:
            res = compare(reg[k], spark, out_dir)
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL {k:28s} EXC {type(exc).__name__}: {str(exc)[:200]}")
            continue
        status = "ok  " if res.ok else "FAIL"
        failures += 0 if res.ok else 1
        print(f"{status} {k:28s} rows={res.spark_rows:<8d} {time.time()-t0:5.1f}s {res.detail}")
    print(f"parity@sf1: {len(probe) - failures}/{len(probe)} passed")
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--keys", nargs="*", default=None)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--base", default=BASE_SF)
    ap.add_argument("--out", default=OUT_DIR)
    args = ap.parse_args()
    spark = get_spark("etl-cnc-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    if args.gen:
        generate(spark, args.out, args.replicas)
    if args.run:
        rc |= run_probe(spark, args.keys, args.base, args.out)
    if args.parity:
        rc |= run_parity(spark, args.keys, args.out)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
