"""Regenerate the driver-gate walk order in ``__spark_entry__.py``.

Policy (tests/test_sql_and_plans.py::test_driver_gate_front_policy):
the driver's correctness gate walks ``queries()`` in order under a
~50-slot budget, so the front must be spent on oracle entries that
were NEVER driver-green (red rows and budget-overflow residue from
prior rounds, plus anything new this round); already-green entries
follow, stalest first (oldest last-green round), so the rotation
re-verifies the rows whose driver evidence is oldest. Rows-only
entries the driver has never row-verified ride the front (r13: the
oracle residue is zero, so the budget reaches them); already-row-
verified rows-only entries sit dead last.

Usage:  python scripts/refront_order.py R12
(rewrites the ``_DRIVER_ORDER_*`` block in place and renames every
reference to the new round tag).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, ".")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(ROOT, "__spark_entry__.py")


def driver_record() -> tuple[set[str], set[str], dict[str, int]]:
    """(hash-green names, row-verified names, name -> last green
    round) from the committed CORRECTNESS_r*.json driver artifacts."""
    green: set[str] = set()
    rowseen: set[str] = set()
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1))
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("rows_match") and row.get("schema_match", True):
                    rowseen.add(name)
                    # hash_match must be literally True: a missing/
                    # None hash means the values were never actually
                    # checked (e.g. the entry ran rows-only that
                    # round), so it must stay in the never-verified
                    # front, not rotate out as green.
                    if row.get("hash_match") is True:
                        green.add(name)
                        last[name] = max(last.get(name, 0), rnd)
    return green, rowseen, last


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "R12"
    import __spark_entry__ as entrymod

    names = list(entrymod._registry())
    oracles = set(entrymod.oracle_sql())
    green, rowseen, last = driver_record()

    pos = {n: i for i, n in enumerate(names)}
    never = [n for n in names if n in oracles and n not in green]
    greens = sorted(
        (n for n in names if n in oracles and n in green),
        key=lambda n: (last[n], pos[n]),
    )
    # rows-only entries NEVER ride the front: CORRECTNESS_r13 proved
    # the driver does not row-verify oracle-less entries (all 15 that
    # landed in the window came back `err: "no_oracle"` with every
    # field null — 15 verification slots burned, VERDICT r13 issue #1).
    # They sit behind the green rotation; never-row-verified ones
    # first in case a future driver learns to row-verify.
    ro_never = [n for n in names if n not in oracles and n not in rowseen]
    ro_seen = [n for n in names if n not in oracles and n in rowseen]
    order = never + greens + ro_never + ro_seen

    lines = [f"_DRIVER_ORDER_{tag} = ["]
    lines.append("    # --- never driver-verified: red rows + overflow residue +")
    lines.append("    # --- new-this-round entries (gate front) ---")
    for n in never:
        lines.append(f'    "{n}",')
    lines.append("    # --- driver-green entries, stalest first ---")
    cur = None
    for n in greens:
        if last[n] != cur:
            cur = last[n]
            lines.append(f"    # last driver-green r{cur}")
        lines.append(f'    "{n}",')
    lines.append("    # --- rows-only entries (never in the gate window:")
    lines.append("    # --- the driver returns no_oracle for them) ---")
    for n in ro_never:
        lines.append(f'    "{n}",')
    for n in ro_seen:
        lines.append(f'    "{n}",')
    lines.append("]")
    block = "\n".join(lines)

    src = open(ENTRY, encoding="utf-8").read()
    m = re.search(r"_DRIVER_ORDER_R\d+ = \[.*?\n\]", src, re.DOTALL)
    assert m, "order block not found"
    src = src[: m.start()] + block + src[m.end():]
    src = re.sub(r"_DRIVER_ORDER_R\d+", f"_DRIVER_ORDER_{tag}", src)
    open(ENTRY, "w", encoding="utf-8").write(src)
    print(
        f"wrote _DRIVER_ORDER_{tag}: {len(never)} never-green front, "
        f"{len(greens)} green rotation, "
        f"{len(ro_never) + len(ro_seen)} rows-only tail"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
