"""Calibration-normalized round-over-round bench comparison.

The bench host is a shared VM whose load drifts ±10-25% between rounds
(three identical-code round-6 reruns spanned 17.0-20.0 s), so a raw
per-query ratio mixes code changes with host noise. bench.py therefore
times a fixed calibration probe (a pinned-plan lineitem scan-aggregate
whose plan never changes) with the same warmup+median protocol; its
round-over-round ratio is a pure host-speed sample. This tool divides
every per-query ratio by the calibration ratio so the table reads CODE
signal:

    normalized = (q_new / q_old) / (cal_new / cal_old)

Usage:
    python tools/bench_compare.py OLD NEW [--md]

OLD/NEW each accept any of:
  - a driver round record (BENCH_rNN.json — {"tail": "..."}; the final
    stdout line inside the tail carries queries + calibration_sec),
  - a BENCH_DETAIL.json snapshot (carries "queries" since round 8),
  - a raw bench.py stdout capture (last parseable JSON line wins),
  - git:REV:PATH (e.g. git:aa55d17:BENCH_DETAIL.json).

Normalized ratios within [0.8, 1.25] print as steady; outside that band
they are flagged — with reps=3 medians and the observed per-query
spreads, smaller deltas are indistinguishable from noise.
"""

from __future__ import annotations

import json
import subprocess
import sys

STEADY = (0.8, 1.25)


def _extract(obj: dict) -> dict | None:
    """Pull {queries, calibration_sec, total, sf} out of one record shape."""
    if "queries" in obj and isinstance(obj["queries"], dict):
        total = obj.get("value", obj.get("total_sec"))
        return {
            "queries": obj["queries"],
            "calibration_sec": obj.get("calibration_sec"),
            "total": total,
            "sf": obj.get("sf"),
        }
    return None


def load(spec: str) -> dict:
    if spec.startswith("git:"):
        _, rev, path = spec.split(":", 2)
        text = subprocess.run(
            ["git", "show", f"{rev}:{path}"],
            capture_output=True, text=True, check=True,
        ).stdout
    else:
        with open(spec) as fh:
            text = fh.read()
    # whole-file JSON first (BENCH_DETAIL / driver record / headline line)
    try:
        obj = json.loads(text)
        got = _extract(obj)
        if got:
            return got
        if "tail" in obj:  # driver record: scan the tail's lines
            text = obj["tail"]
    except (json.JSONDecodeError, TypeError):
        pass
    # stdout capture / driver tail: last line that parses and has queries
    best = None
    for ln in text.splitlines():
        ln = ln.strip()
        if ln.startswith("DETAIL "):
            ln = ln[len("DETAIL "):]
        start = ln.find("{")
        if start < 0:
            continue
        try:
            got = _extract(json.loads(ln[start:]))
        except json.JSONDecodeError:
            continue
        if got:
            best = got
    if best is None:
        raise SystemExit(f"no per-query bench record found in {spec}")
    return best


def compare(old: dict, new: dict) -> dict:
    cal_o, cal_n = old["calibration_sec"], new["calibration_sec"]
    cal_ratio = (cal_n / cal_o) if cal_o and cal_n else None
    rows = []
    for q, t_old in old["queries"].items():
        t_new = new["queries"].get(q)
        if t_new is None or not t_old:
            continue
        raw = t_new / t_old
        rows.append({
            "query": q,
            "old_sec": t_old,
            "new_sec": t_new,
            "raw_ratio": round(raw, 3),
            "normalized": round(raw / cal_ratio, 3) if cal_ratio else None,
        })
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))
    tot = None
    if old.get("total") and new.get("total"):
        r = new["total"] / old["total"]
        tot = {
            "old_sec": old["total"], "new_sec": new["total"],
            "raw_ratio": round(r, 3),
            "normalized": round(r / cal_ratio, 3) if cal_ratio else None,
        }
    return {
        "sf": {"old": old.get("sf"), "new": new.get("sf")},
        "calibration": {
            "old_sec": cal_o, "new_sec": cal_n,
            "ratio": round(cal_ratio, 3) if cal_ratio else None,
        },
        "total": tot,
        "queries": sorted(rows, key=lambda r: -(r["normalized"] or 0)),
        "added": added,
        "removed": removed,
        "steady_band": list(STEADY),
    }


def to_markdown(c: dict) -> str:
    lines = []
    cal = c["calibration"]
    lines.append(
        f"calibration {cal['old_sec']} → {cal['new_sec']} s "
        f"(host ratio {cal['ratio']}); normalized = raw / {cal['ratio']}"
    )
    if c["sf"]["old"] != c["sf"]["new"]:
        lines.append(
            f"WARNING: scale factors differ (old sf={c['sf']['old']}, "
            f"new sf={c['sf']['new']}) — ratios are not comparable"
        )
    lines.append("")
    lines.append("| query | old s | new s | raw | normalized | |")
    lines.append("|---|---|---|---|---|---|")
    for r in c["queries"]:
        n = r["normalized"]
        flag = ""
        if n is not None and not (STEADY[0] <= n <= STEADY[1]):
            flag = "**slower**" if n > 1 else "**faster**"
        lines.append(
            f"| {r['query']} | {r['old_sec']} | {r['new_sec']} "
            f"| {r['raw_ratio']} | {n} | {flag} |"
        )
    if c["total"]:
        t = c["total"]
        lines.append(
            f"| **total** | {t['old_sec']} | {t['new_sec']} "
            f"| {t['raw_ratio']} | {t['normalized']} | |"
        )
    for k in ("added", "removed"):
        if c[k]:
            lines.append(f"\n{k}: {', '.join(c[k])}")
    return "\n".join(lines)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--md"]
    md = "--md" in sys.argv[1:]
    if len(args) != 2:
        raise SystemExit(__doc__)
    c = compare(load(args[0]), load(args[1]))
    print(to_markdown(c) if md else json.dumps(c, indent=1))


if __name__ == "__main__":
    main()
