"""Guard COVERAGE.md against drift from the live registry.

VERDICT r7 item 2: `parts_slow_movers` was registered and tested but
missing its COVERAGE.md table row (header said 508, table had 507).
This test makes that class of drift impossible to commit: the table
row count, the header total, and the hash/rows split must all match
the registry exactly, and every registered key must appear as a row.
"""

from __future__ import annotations

import os
import re

from etl_cnc_spark.registry import load_all

COVERAGE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")


def _table_keys(text: str) -> list[str]:
    # Rows look like: | `key_name` | hash |  | summary... |
    return re.findall(r"^\| `([a-z0-9_]+)` \|", text, flags=re.MULTILINE)


def test_coverage_table_matches_registry():
    reg = load_all()
    with open(COVERAGE) as f:
        text = f.read()

    keys = _table_keys(text)
    assert len(keys) == len(set(keys)), "duplicate rows in COVERAGE.md"
    missing = sorted(set(reg) - set(keys))
    extra = sorted(set(keys) - set(reg))
    assert not missing, f"registered keys missing from COVERAGE.md: {missing}"
    assert not extra, f"COVERAGE.md rows not in registry: {extra}"

    m = re.search(r"\*\*Total: (\d+) keys\*\* \((\d+) hash-verified, (\d+) rows", text)
    assert m, "COVERAGE.md header total line not found"
    total, n_hash, n_rows = (int(g) for g in m.groups())
    reg_hash = sum(1 for q in reg.values() if q.check == "hash")
    reg_rows = sum(1 for q in reg.values() if q.check == "rows")
    assert total == len(reg), f"header total {total} != registry {len(reg)}"
    assert n_hash == reg_hash, f"header hash count {n_hash} != registry {reg_hash}"
    assert n_rows == reg_rows, f"header rows count {n_rows} != registry {reg_rows}"


def test_plans_audit_rows_are_registry_keys():
    """PLANS.md guard (VERDICT r8 item 2 — strict): the audit must
    cover the registry EXACTLY — no orphan rows (renames/deletions)
    and no missing keys.  New keys keep this green cheaply via the
    incremental mode: `python tools/plan_audit.py --keys <new keys>`
    patches just those rows; the full regeneration still closes each
    round."""
    reg = load_all()
    plans = os.path.join(os.path.dirname(COVERAGE), "PLANS.md")
    with open(plans) as f:
        keys = _table_keys(f.read())
    assert len(keys) == len(set(keys)), "duplicate rows in PLANS.md"
    orphans = sorted(set(keys) - set(reg))
    assert not orphans, f"PLANS.md rows not in registry: {orphans}"
    missing = sorted(set(reg) - set(keys))
    assert not missing, (
        f"PLANS.md missing {len(missing)} registry keys (run "
        f"`python tools/plan_audit.py --keys ...`): {missing[:10]}"
    )
