#!/usr/bin/env python
"""Print the next DRIVER_WINDOW rotation: the registry keys that have
no driver row in any CORRECTNESS_r*.json, in registry order, capped
at 50. Paste the output into registry.py's DRIVER_WINDOW each round
until it prints nothing (full driver coverage).

Run: python tools/next_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cnc_spark.registry import load_all  # noqa: E402


def main() -> None:
    reg = load_all()
    checked: set[str] = set()
    for path in glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "CORRECTNESS_r*.json")
    ):
        with open(path) as f:
            checked |= set(json.load(f))
    never = [k for k in reg if k not in checked]
    print(f"# {len(never)} never-driver-checked keys ({len(checked)} checked, "
          f"{len(reg)} registered); next window = first 50:")
    for k in never[:50]:
        print(f'    "{k}",')
    if len(never) > 50:
        print(f"# ... plus {len(never) - 50} more for the round after")


if __name__ == "__main__":
    main()
