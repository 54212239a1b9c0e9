#!/usr/bin/env python
"""Shared-constant circularity audit (VERDICT r11 item 5).

The oracle-paired design has one structural blind spot: a *magic
numeric constant* that appears in BOTH a key's Spark build source and
its DuckDB oracle SQL is replicated, not verified — if the constant is
wrong, both engines agree on the wrong answer and every hash gate
stays green (the round-11 stat_kde_gaussian Silverman-bandwidth bug:
the Spark expr, the oracle, and the mirrored pytest all carried the
same 100x-off literal).  The antidote is an INDEPENDENT from-scratch
recomputation test that derives the number a different way and so
cannot share the literal (tests/test_r11_advice.py's
dollars-from-scratch KDE bandwidth test is the template).

This tool makes the hunt systematic:

1. For every hash-checked registry key, extract numeric literals from
   the build function's source (via inspect) and from the oracle SQL.
2. Intersect them, then drop STRUCTURAL constants that are shared by
   design and carry no domain meaning: small integers (|x| <= 64),
   powers of ten (fixed-point fold scales: 100, 1e6, 1e9, 1e12, ...),
   halves/quarters, and calendar/time factors (7, 24, 60, 3600,
   86400, 365, ...).  What survives is the *suspicious* set — domain
   coefficients like Silverman's 1.06, Hampel's 1.4826, Acklam
   rational-approximation coefficients, Jaro-Winkler's 0.1, etc.
3. For each suspicious shared literal, grep the tests/ tree: a test
   file that mentions the key AND repeats the literal is CIRCULAR
   (it mirrors the constant); a test that mentions the key without
   the literal is evidence of an independent recomputation.  Keys
   where every mentioning test repeats every suspicious literal (or
   no test mentions them at all) are flagged.

Known blind spot: a constant hoisted to a module-level name (e.g.
``_DUNN_Z_CRIT``) escapes ``inspect.getsource(build)`` when the build
function references the NAME — it is still caught when the oracle SQL
interpolates the value (the common pattern here), but a key whose
Spark side AND oracle both reference pre-baked module constants would
slip through.  tests/test_r12_constants.py therefore derives every
known quantile-family constant from scratch regardless of where it
is spelled.

Run:  python tools/constants_audit.py            # full report
      python tools/constants_audit.py --flagged  # only flagged keys
Exit status is always 0 — this is an audit, not a gate; the round
close reads the report and adds from-scratch tests for the flagged
keys (or records why a literal is actually structural).
"""

from __future__ import annotations

import argparse
import glob
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cnc_spark.registry import load_all  # noqa: E402

NUM_RE = re.compile(r"(?<![\w.])(\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)(?![\w.])")

# Structural constants: shared by design, no domain meaning.
#
# Anything that is exactly an integer is treated as structural: in this
# engine integers are filter thresholds, bucket counts, grid sizes,
# epoch/time scales, projection dims/primes, and power-of-ten
# fixed-point fold scales — query PARAMETERS, which define the query
# rather than implement a named formula, so sharing them with the
# oracle is the point, not a circularity.  (Known blind spot: a
# formula constant pre-scaled into an integer, e.g. 14826 for
# 1.4826e4, would slip through — none exist today; the fixed-point
# discipline scales by powers of ten only.)  The dangerous class —
# the KDE bug class — is fractional coefficients of named formulas:
# Silverman's 1.06, the MAD consistency factor 1.4826, z/chi-square
# quantiles 1.96/3.8415, Acklam's rational-approximation
# coefficients, Winkler's 0.7 boost threshold, and the like.
_FRACTION_PARAMS = {
    # tenths/common cutoffs and CI levels: tuning parameters, not
    # derived coefficients (a wrong parameter redefines the query
    # self-consistently; a wrong coefficient falsifies its name)
    0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
    0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85, 0.95,
    0.001, 0.0001, 0.025, 0.975, 0.99, 0.999, 0.98,
    1.1, 1.5, 2.5, 0.33, 0.66,
    # hundredths below 0.1: filter thresholds (tpch_q6's 0.07 discount
    # band, agg_boolean's 0.09 bool_or predicate)
    0.01, 0.02, 0.03, 0.04, 0.06, 0.07, 0.08, 0.09,
    # sub-second time scales in fractional form
    0.000001,
}

# Published DEFINITIONAL constants: the literal IS the formula's spec
# (a table value or a named coefficient with no closed-form
# derivation) — an "independent recomputation" is impossible by
# construction, so these are allowlisted with their citation.  A
# wrong value here would be a spec mismatch, pinned by the docstring
# citation, not a derivable-math bug.
DEFINITIONAL: dict[str, dict[float, str]] = {
    "stat_kuiper_test": {
        0.155: "Stephens 1970 asymptotic V* coefficient",
        0.24: "Stephens 1970 asymptotic V* coefficient",
    },
    "stat_lilliefors": {0.886: "Dallal-Wilkinson/Lilliefors 5% asymptotic coefficient"},
    "stat_cointegration_eg": {3.37: "MacKinnon 1991 5% cointegration critical value"},
    "text_readability": {
        206.835: "Flesch 1948 reading-ease intercept",
        84.6: "Flesch 1948 syllables-per-word coefficient",
        1.015: "Flesch 1948 words-per-sentence coefficient",
    },
    "text_lexical_richness": {0.165: "Brunet 1978 W exponent"},
    "stat_fisher_exact": {1.0000001: "tie-tolerance factor of the key's spec (parameter)"},
}


def _is_structural(x: float) -> bool:
    if x == int(x):
        return True
    return x in _FRACTION_PARAMS


def _literals(text: str) -> set[float]:
    out: set[float] = set()
    for m in NUM_RE.finditer(text):
        try:
            out.add(float(m.group(1)))
        except ValueError:
            pass
    return out


def _test_chunks() -> dict[str, str]:
    """Per-test-FUNCTION granularity: a file can hold both a mirrored
    (circular) test and an independent from-scratch one — splitting on
    ``def test_`` keeps them from masking each other."""
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    chunks: dict[str, str] = {}
    for p in sorted(glob.glob(os.path.join(root, "test_*.py"))):
        text = open(p).read()
        parts = re.split(r"(?=^def test_|^\s{4}def test_)", text, flags=re.M)
        # parts[0] = module preamble (imports, shared tables): a key
        # or literal there is visible to every chunk in the file
        preamble = parts[0]
        for body in parts[1:]:
            m = re.match(r"\s*def (test_\w+)", body)
            fn = m.group(1) if m else "?"
            chunks[f"{os.path.basename(p)}::{fn}"] = preamble + body
    return chunks


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagged", action="store_true", help="print only flagged keys")
    ap.add_argument("keys", nargs="*", help="audit only these keys")
    args = ap.parse_args()

    reg = load_all()
    tests = _test_chunks()

    flagged: list[str] = []
    clean_shared = 0
    for name, q in sorted(reg.items()):
        if args.keys and name not in args.keys:
            continue
        if q.oracle is None:
            continue  # rows-only keys have no oracle to share with
        try:
            src = inspect.getsource(q.build)
        except (OSError, TypeError):
            continue
        shared = _literals(src) & _literals(q.oracle)
        defn = DEFINITIONAL.get(name, {})
        suspicious = sorted(
            x for x in shared if not _is_structural(x) and x not in defn
        )
        if not suspicious:
            if shared & set(defn):
                cites = "; ".join(defn[x] for x in sorted(shared & set(defn)))
                if not args.flagged:
                    print(f"ok   {name:32s} definitional: {cites}")
            continue
        clean_shared += 1
        # test evidence: does any test chunk mention the key WITHOUT
        # repeating the literal (i.e. derive it another way)?
        mentioning = {p: t for p, t in tests.items() if name in t}
        # ADVICE r12: match by parsed VALUE, not by one canonical repr
        # spelling — '1.4826e0', '0.10', '1.06000' are the same
        # constant and must count as circular mentions too.
        mention_lits = {p: _literals(t) for p, t in mentioning.items()}
        verdicts = []
        independent_somewhere = False
        for lit in suspicious:
            def _repeats(vals: set[float], lit: float = lit) -> bool:
                return any(
                    v == lit or abs(v - lit) <= 1e-12 * max(1.0, abs(lit))
                    for v in vals
                )
            indep = [p for p, vals in mention_lits.items() if not _repeats(vals)]
            circ = [p for p, vals in mention_lits.items() if _repeats(vals)]
            if indep:
                independent_somewhere = True
            verdicts.append((lit, len(indep), len(circ)))
        status = "ok" if (mentioning and independent_somewhere) else "FLAG"
        if status == "FLAG":
            flagged.append(name)
        if args.flagged and status != "FLAG":
            continue
        lits = ", ".join(
            f"{lit:g} (indep:{i} circ:{c})" for lit, i, c in verdicts
        )
        print(f"{status:4s} {name:32s} shared: {lits}"
              + ("" if mentioning else "  [NO test mentions this key]"))

    print(f"\n# {clean_shared} keys share nontrivial constants with their oracle; "
          f"{len(flagged)} flagged (no independent test evidence):")
    for k in flagged:
        print(f"#   {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
