#!/usr/bin/env python
"""Regenerate COVERAGE.md's query table from the live registry.

The header and the hand-maintained "Non-query surface" section are
preserved; the per-query table and the count line are rewritten from
``etl_housing_spark.plans.all_queries()`` so the doc can never drift from
the code. Run from the repo root after adding or retagging queries:

    python scripts/gen_coverage.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from etl_housing_spark.plans import all_queries  # noqa: E402

COVERAGE = pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"


def main() -> None:
    specs = all_queries()
    rows = [
        f"| {name} | {'✓' if s.oracle is not None else '⊘'} "
        f"| {'✓' if 'bench' in s.tags else ''} | {s.description} |"
        for name, s in sorted(specs.items())
    ]
    n = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    count = f"**{n} queries; {n_oracle} oracle-checked, {n - n_oracle} rows-only ⊘.**"

    old = COVERAGE.read_text()
    # Anchor on the first data row of the table (any query id), NOT a named
    # query: a named anchor silently duplicates every row that sorts before
    # it on each regeneration.
    head, _, rest = old.partition("\n| q_")
    head += "\n"
    assert rest, "COVERAGE.md table anchor not found"
    _, _, tail = old.partition("\nNon-query surface")
    COVERAGE.write_text(head + "\n".join(rows) + "\n\n" + count + "\n\nNon-query surface" + tail)
    print(count)


if __name__ == "__main__":
    main()
