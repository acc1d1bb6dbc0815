#!/usr/bin/env python
"""Regenerate docs/QUERIES.md: the full gate-query inventory from the registry."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tamer_spark.queries import REGISTRY


def main() -> None:
    out = [
        "# QUERIES — correctness-gate inventory",
        "",
        f"{len(REGISTRY)} queries; each runs as a Spark plan via "
        "`__spark_entry__.queries()` and (unless noted rows-only) is "
        "hash-compared against independent DuckDB SQL at sf0.01.",
        "",
        "| query | oracle | notes |",
        "|---|---|---|",
    ]
    for name, query in REGISTRY.items():
        oracle = "SQL" if query.oracle else "rows-only"
        out.append(f"| `{name}` | {oracle} | {query.doc or ''} |")
    Path("docs/QUERIES.md").write_text("\n".join(out) + "\n")
    print(f"wrote docs/QUERIES.md ({len(REGISTRY)} queries)")


if __name__ == "__main__":
    main()
