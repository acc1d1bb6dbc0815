"""Calib-normalized bench comparison — the r11 reading rule as a command.

Usage:
    python scripts/bench_compare.py BENCH_r10.json BENCH_r11.json [--flag 1.2]

Accepts either the driver's BENCH_r{N}.json records (reads their
``parsed``) or raw bench.py stdout JSON lines. Computes the host-calib
ratio (``host_calib_s`` new/old — records without it, i.e. pre-r10, fall
back to 1.0 with a warning), divides every per-query ratio by it, and
prints a table sorted worst-first plus ONE summary JSON line with the
entries whose normalized ratio exceeds ``--flag`` (default 1.2×, the
SCALING.md band).

Reading rule (SCALING.md bench methodology): a flagged entry whose spread
straddles its median by ≥2× goes to the `SPARK_GRAFT_BENCH_GROUPS` group
bisect BEFORE being called a regression; only a flag that reproduces in
isolation gets a weak mark. Entries present in only one record are listed
as added/removed, not compared.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load(path: str) -> dict:
    rec = json.loads(Path(path).read_text())
    if "parsed" in rec and isinstance(rec["parsed"], dict):
        rec = rec["parsed"]
    if "queries" not in rec:
        raise SystemExit(f"{path}: no 'queries' key (not a bench record?)")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.2)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    c_old, c_new = old.get("host_calib_s"), new.get("host_calib_s")
    calib_missing = c_old is None or c_new is None or not c_old or not c_new
    if not calib_missing:
        calib = c_new / c_old
    else:
        calib = 1.0
        print(
            "# WARNING: host_calib_s missing/zero in one record — ratios below "
            "are RAW, not normalized (calib_ratio: null in the summary)",
            file=sys.stderr,
        )

    # r13 attribution fields: 32-thread shuffle calib + 1-min load averages
    # (bench.py shuffle_calibration/load_avg_1m). When the shuffle-calib
    # ratio moves with the query ratios but host_calib does not, the shift
    # is ambient parallel contention (the r12 calib-decoupling finding) —
    # the record itself now carries that evidence.
    s_old, s_new = old.get("shuffle_calib_s"), new.get("shuffle_calib_s")
    shuffle_ratio = (s_new / s_old) if s_old and s_new else None
    loads = {"old": old.get("load_avg_1m"), "new": new.get("load_avg_1m")}
    if shuffle_ratio is not None:
        print(
            f"# shuffle_calib: {s_old} -> {s_new} (ratio {shuffle_ratio:.3f}); "
            f"load_avg_1m old={loads['old']} new={loads['new']}",
            file=sys.stderr,
        )

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))

    rows = []
    for q in shared:
        a, b = old["queries"][q], new["queries"][q]
        raw = b / a if a else float("inf")
        rows.append((q, a, b, raw, raw / calib))
    rows.sort(key=lambda r: -r[4])

    print(f"# calib: {c_old} -> {c_new} (ratio {calib:.3f})", file=sys.stderr)
    print(f"# total: {old.get('value')} -> {new.get('value')}", file=sys.stderr)
    print(f"# {'query':34} {'old':>7} {'new':>7} {'raw':>6} {'norm':>6}", file=sys.stderr)
    flagged = []
    for q, a, b, raw, norm in rows:
        mark = f"  <-- >{args.flag}x" if norm > args.flag else ""
        if norm > args.flag:
            flagged.append({"query": q, "old_s": a, "new_s": b, "norm_ratio": round(norm, 2)})
        print(f"# {q:34} {a:7.3f} {b:7.3f} {raw:6.2f} {norm:6.2f}{mark}", file=sys.stderr)

    total_ratio = (
        (new.get("value") / old.get("value")) if old.get("value") and new.get("value") else None
    )
    print(
        json.dumps(
            {
                # null calib_ratio = normalization DID NOT HAPPEN (pre-r10
                # record without host_calib_s): every "norm" value is raw
                "calib_ratio": None if calib_missing else round(calib, 3),
                "calib_missing": calib_missing,
                # concurrent-throughput + load attribution (null pre-r13)
                "shuffle_calib_ratio": (
                    round(shuffle_ratio, 3) if shuffle_ratio else None
                ),
                "load_avg_1m": loads,
                "total_raw_ratio": round(total_ratio, 3) if total_ratio else None,
                "total_norm_ratio": round(total_ratio / calib, 3) if total_ratio else None,
                "n_compared": len(shared),
                "n_within_band": sum(1 for r in rows if r[4] <= args.flag),
                "flagged": flagged,
                "added": added,
                "removed": removed,
            }
        )
    )


if __name__ == "__main__":
    main()
