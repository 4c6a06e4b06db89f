"""Parse profiler stdout logs into a nested dict / JSON / comparison table
(analog of ref tests/profile_leafbuilders.py:1-118, which collates
profile_tree stdout across branches and devices into a nested dict and
plots it; redesigned around this repo's `key: value` profiler line format
instead of the reference's positional text).

Usage:
    python tools/parse_profiles.py run1.log [run2.log ...] [--json out.json]

Each log is `python benchmarks/profile_*.py` stdout (possibly several
blank-line-separated records, e.g. profile_tree's log2-N sweep). Output:
one table per metric with a column per input log — the "compare two
branches/devices side by side" workflow of the reference script. Also
importable: ``parse_log(text) -> list[dict]``.
"""

from __future__ import annotations

import json
import re
import sys

_LINE = re.compile(r"^\s*([A-Za-z_][\w() /=-]*?):\s+(-?[\d.]+(?:e[+-]?\d+)?)\s*$")


def parse_log(text: str) -> list[dict]:
    """Parse `key: number` stdout into a list of records (one per
    blank-line-separated block that contained at least one metric)."""
    records = []
    cur: dict = {}
    for line in text.splitlines():
        if not line.strip():
            if cur:
                records.append(cur)
                cur = {}
            continue
        m = _LINE.match(line)
        if m:
            key = m.group(1).strip().replace(" ", "_")
            val = float(m.group(2))
            cur[key] = int(val) if val == int(val) and "." not in m.group(2) \
                else val
    if cur:
        records.append(cur)
    return records


def merge(names: list[str], parsed: list[list[dict]]) -> dict:
    """{metric: {log_name: [values across records]}} nested dict."""
    out: dict = {}
    for name, records in zip(names, parsed):
        for rec in records:
            for k, v in rec.items():
                out.setdefault(k, {}).setdefault(name, []).append(v)
    return out


def table(merged: dict, names: list[str]) -> str:
    w = max((len(k) for k in merged), default=10) + 2
    lines = [" " * w + "  ".join(f"{n:>14s}" for n in names)]
    for k in sorted(merged):
        cells = []
        for n in names:
            vals = merged[k].get(n)
            if not vals:
                cells.append(f"{'-':>14s}")
            elif len(vals) == 1:
                cells.append(f"{vals[0]:>14g}")
            else:
                cells.append(f"{min(vals):>6g}..{max(vals):<6g}")
        lines.append(f"{k:<{w}}" + "  ".join(cells))
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if not argv:
        print(__doc__)
        return 1
    parsed = [parse_log(open(p).read()) for p in argv]
    merged = merge(argv, parsed)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"wrote {json_out}")
    print(table(merged, argv))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
