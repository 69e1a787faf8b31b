#!/usr/bin/env python
"""Refresh plans/oracle_stamps.json — the per-id md5 of the oracle SQL as
of each id's NEWEST driver verdict.

The registry's rotation treats a hash verdict whose oracle has since
changed as spent (registry.oracle_stamps), so upgraded queries re-enter
the driver window automatically instead of carrying a verdict earned
against old semantics (the q_audio_neardup staleness VERDICT r11 flagged).

Refresh rule — run at END OF ROUND, after the driver's CORRECTNESS file
for the round has landed in the repo root:
  - ids verified in the NEWEST round present: stamp := current oracle md5
    (the driver just verified exactly this committed text);
  - ids never stamped: bootstrap to the current md5 (their verdict is
    assumed current — poison the entry by hand if you know better);
  - everything else keeps its existing stamp, so a mid-round oracle edit
    shows up as a mismatch and re-fronts the id.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from etl_housing_spark.plans.registry import (
    _STAMPS_PATH,
    all_queries,
    driver_verdict_history,
    oracle_stamp,
)


def main() -> None:
    specs = all_queries()
    hist = driver_verdict_history()
    latest = max((rnd for _v, rnd in hist.values()), default=0)
    try:
        stamps = json.loads(_STAMPS_PATH.read_text())
    except (OSError, json.JSONDecodeError):
        stamps = {}
    # one refresh per driver round: if the newest CORRECTNESS round has
    # already been folded into the stamps (_round marker), refreshing
    # again would certify MID-ROUND oracle edits against a verdict that
    # never saw them — exactly the staleness class the gate exists for.
    prev_round = int(stamps.pop("_round", -1))
    refresh = latest > prev_round
    if not refresh:
        print(
            f"round r{latest} already folded in (stamps at r{prev_round}); "
            "only bootstrapping never-stamped ids"
        )
    changed = 0
    for name, spec in specs.items():
        cur = oracle_stamp(spec)
        if cur is None:
            continue
        verdict = hist.get(name)
        if name not in stamps or (
            refresh and verdict is not None and verdict[1] == latest
        ):
            if stamps.get(name) != cur:
                changed += 1
            stamps[name] = cur
    stamps = {n: s for n, s in sorted(stamps.items()) if n in specs}
    stamps["_round"] = max(latest, prev_round)
    _STAMPS_PATH.write_text(json.dumps(stamps, indent=0, sort_keys=True) + "\n")
    print(f"{len(stamps) - 1} stamps written ({changed} refreshed), latest round r{latest}")


if __name__ == "__main__":
    main()
