"""Generate the driver-verification rotation ledger in COVERAGE.md.

The external driver hash-verifies only the FIRST 50 registry entries
per round, so which query was verified in which round is rotation
state that must stay auditable. This tool reads every
CORRECTNESS_r*.json in the repo root plus the current registry order
and regenerates the ledger section of COVERAGE.md between the marker
comments, so future window rotations are mechanical:

    python tools/coverage_ledger.py          # rewrite COVERAGE.md
    python tools/coverage_ledger.py --check  # exit 1 if stale
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED VERIFICATION LEDGER (tools/coverage_ledger.py) -->"
END = "<!-- END GENERATED VERIFICATION LEDGER -->"


def _load_rounds() -> dict[str, dict[str, dict]]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rname = re.search(r"CORRECTNESS_(r\d+)\.json$", path).group(1)
        with open(path) as fh:
            rounds[rname] = json.load(fh)
    return rounds


def _status(entry: dict) -> str:
    if entry.get("hash_match"):
        return "green"
    if entry.get("err") == "no_oracle" and entry.get("spark_rows") is not None:
        return "rows-only"
    return "FAIL"


def render() -> str:
    sys.path.insert(0, ROOT)
    from adcirctime2cogs_spark import registry

    rounds = _load_rounds()
    queries = list(registry.all_queries())
    oracles = set(registry.all_oracles())
    window = set(registry._PRIORITY)

    lines = [
        BEGIN,
        "",
        "## Driver-verification ledger (generated — do not edit by hand)",
        "",
        "Per query: which round's external CORRECTNESS window hash-verified",
        "it (`green`), recorded it rows-only (`rows-only`), or has never",
        "seen it (`·`). `window` marks membership in the CURRENT first-50",
        "window; every query is additionally covered by the repo's own",
        "all-oracle DuckDB sweep (`tests/test_oracle_parity.py`).",
        "",
        "| Query | oracle | window | " + " | ".join(sorted(rounds)) + " |",
        "|---|---|---|" + "---|" * len(rounds),
    ]
    never = []
    for q in queries:
        cells = []
        seen = False
        for r in sorted(rounds):
            if q in rounds[r]:
                cells.append(_status(rounds[r][q]))
                seen = seen or _status(rounds[r][q]) != "FAIL"
            else:
                cells.append("·")
        if not seen and q in oracles:
            never.append(q)
        lines.append(
            f"| {q} | {'★' if q in oracles else '—'} "
            f"| {'✓' if q in window else ''} | " + " | ".join(cells) + " |"
        )
    lines += [
        "",
        f"**Never driver-verified (oracled): {len(never)}**"
        + (" — " + ", ".join(never) if never else ""),
        "",
        END,
    ]
    return "\n".join(lines)


def main() -> int:
    cov_path = os.path.join(ROOT, "COVERAGE.md")
    with open(cov_path) as fh:
        text = fh.read()
    section = render()
    if BEGIN in text:
        new = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END), section, text, flags=re.S
        )
    else:
        new = text.rstrip() + "\n\n" + section + "\n"
    if "--check" in sys.argv:
        if new != text:
            print("COVERAGE.md ledger is stale — run tools/coverage_ledger.py")
            return 1
        return 0
    with open(cov_path, "w") as fh:
        fh.write(new)
    print("COVERAGE.md ledger regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
