"""Pre-flight: catch driver-canonicalization traps before a key
rotates into DRIVER_WINDOW.

The driver's correctness sweep canonicalizes each result with pandas
(column-sorted ``sort_values`` / factorize before hashing).  That
machinery raises ``TypeError: unhashable type`` on any cell that is a
numpy array / list / dict — i.e. any Spark output column whose type is
ArrayType / MapType / StructType (r4's ``embed_quantize`` red row).
The *local* canonicalizer (etl_cnc_spark/oracle.py) stringifies cells
and so tolerates them — a local-green / driver-red divergence.

This tool closes the gap two ways:

1. ``schema scan`` (default): build every registered query's
   DataFrame and flag any output column whose dataType is complex.
   Complex output == driver trap, period.  NOTE: "build" is not free —
   sink/stream/bucketed keys stage real data or run availableNow
   streams as part of constructing their result frame; a full no-args run executes
   dozens of small Spark jobs (~minutes), it just skips the final
   collect of every query.
2. ``--exec``: additionally run each flagged-clean query at sf0.001
   and replicate the driver's pandas canonicalization verbatim
   (``DataFrame.sort_values`` over all columns) to catch anything the
   schema scan can't see (e.g. object-dtype cells smuggled through
   binary/struct-free plans).

Exit 1 if anything is flagged, so it can gate CI / pre-rotation.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import types as T  # noqa: E402


COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def complex_cols(df) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, COMPLEX)]


def driver_sort_ok(pdf) -> str | None:
    """Replicate the driver's canonicalization: sort_values over the
    name-sorted column list.  Returns the error string, or None."""
    try:
        cols = sorted(pdf.columns)
        pdf[cols].sort_values(by=cols, kind="mergesort")
        for c in cols:
            # factorize is what actually threw in r4
            pdf[c].factorize()
    except Exception as e:  # noqa: BLE001
        return f"{type(e).__name__}: {e}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exec", dest="do_exec", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*", help="subset of keys (default: all)")
    args = ap.parse_args()

    from etl_cnc_spark.registry import load_all
    from etl_cnc_spark.session import get_spark

    reg = load_all()
    unknown = [k for k in args.keys if k not in reg]
    if unknown:
        print(f"unknown keys: {', '.join(unknown)}", file=sys.stderr)
        return 2
    keys = args.keys or sorted(reg)
    spark = get_spark()

    flagged: dict[str, str] = {}
    for k in keys:
        try:
            df = reg[k].build(spark, args.sf_dir)
        except Exception as e:  # noqa: BLE001
            flagged[k] = f"build error: {type(e).__name__}: {e}"
            continue
        bad = complex_cols(df)
        if bad:
            flagged[k] = f"complex output columns: {bad}"
            continue
        if args.do_exec:
            err = driver_sort_ok(df.toPandas())
            if err:
                flagged[k] = f"driver canonicalization: {err}"

    clean = len(keys) - len(flagged)
    print(f"# preflight: {clean}/{len(keys)} clean")
    for k, why in sorted(flagged.items()):
        print(f"FLAG {k}: {why}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
