"""CLI parity checker: local replica of the driver's t2 gate.

Usage::

    python -m etl_cnc_spark.check [--sf DIR] [key ...]

Runs every registered query (or just the named keys) against its
DuckDB oracle at the given scale-factor dir and prints PASS/FAIL
with timing. Exit code 1 if anything fails.
"""

from __future__ import annotations

import argparse
import sys
import time

from .oracle import compare
from .registry import load_all
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args(argv)

    reg = load_all()
    keys = args.keys or sorted(reg)
    unknown = [k for k in keys if k not in reg]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("etl-cnc-parity")
    failures = 0
    for k in keys:
        t0 = time.time()
        try:
            res = compare(reg[k], spark, args.sf)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"FAIL {k:28s} EXC {type(exc).__name__}: {str(exc)[:200]}")
            continue
        dt = time.time() - t0
        if res.ok:
            print(f"ok   {k:28s} rows={res.spark_rows:<8d} {dt:5.1f}s {res.detail}")
        else:
            failures += 1
            print(f"FAIL {k:28s} {res.detail}  ({dt:.1f}s)")
            for m in res.mismatches:
                print(m)
    print(f"\n{len(keys) - failures}/{len(keys)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
