#!/usr/bin/env python
"""Regenerate QUERIES.md (the registry catalog) from the live registry."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from instagram_data_pipeline_spark.queries import DRIVER_WINDOW, load_all

    reg = load_all()
    lines = [
        "# QUERIES — the registry catalog",
        "",
        f"{len(reg)} registered queries; every entry is a (DataFrame "
        "plan, DuckDB oracle) pair unless marked rows-only. The "
        f"driver's correctness gate scores the first {DRIVER_WINDOW} "
        "each round (window placement: "
        "`queries/__init__.py::REGISTRY_ORDER`); ALL entries are "
        "hash-checked in CI every run (`tests/test_queries_oracle.py`). "
        "Generated from the registry by `scripts/gen_query_catalog.py` "
        "— do not edit by hand.",
        "",
        "| # | Query | Oracle | Tags | What it proves |",
        "|---|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(reg.items(), 1):
        window = " (window)" if i <= DRIVER_WINDOW else ""
        oracle = "SQL hash" if spec.oracle else "rows-only"
        doc = " ".join(spec.doc.split())
        if len(doc) > 220:
            doc = doc[:217] + "..."
        tags = ", ".join(spec.tags)
        lines.append(
            f"| {i}{window} | `{name}` | {oracle} | {tags} | {doc} |"
        )
    out = Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(reg)} queries)")


if __name__ == "__main__":
    main()
