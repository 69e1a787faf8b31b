#!/usr/bin/env python
"""Refresh plans/oracle_stamps.json — the per-id md5 of the oracle SQL as
of each id's NEWEST driver verdict.

The registry's rotation treats a hash verdict whose oracle has since
changed as spent (registry.oracle_stamps), so upgraded queries re-enter
the driver window automatically instead of carrying a verdict earned
against old semantics (the q_audio_neardup staleness VERDICT r11 flagged).

Refresh rule — run at END OF ROUND (or round start, after the driver's
CORRECTNESS file for the newest round has landed in the repo root):
  - ids verified in the NEWEST round present: stamp := the oracle md5 AS
    OF THE DRIVER'S COMMIT (the commit that added CORRECTNESS_r{N}.json),
    snapshotted via a temporary git worktree — NOT the working-tree md5,
    which would silently certify a same-round post-driver oracle edit the
    driver never saw (ADVICE r12);
  - ids never stamped: bootstrap to the driver-commit md5 when the id
    existed there, else the current md5 — every bootstrapped id is LOGGED
    so stale bootstraps (oracle edited after the old verdict) are
    auditable instead of silent;
  - everything else keeps its existing stamp, so a mid-round oracle edit
    shows up as a mismatch and re-fronts the id.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from etl_housing_spark.plans.registry import (
    _REPO_ROOT,
    _STAMPS_PATH,
    all_queries,
    driver_verdict_history,
    oracle_stamp,
)

_DUMP_SNIPPET = """
import json, sys
sys.path.insert(0, {root!r})
from etl_housing_spark.plans.registry import all_queries, oracle_stamp
print(json.dumps({{n: oracle_stamp(s) for n, s in all_queries().items()
                   if s.oracle is not None}}))
"""


def _driver_commit_md5s(latest: int) -> dict[str, str]:
    """Oracle md5s as of the commit that added CORRECTNESS_r{latest}.json —
    the text the driver actually verified (its artifact commit is the run
    tree plus the artifacts). {} if git/worktree fails (fresh clone with no
    history): callers then fall back to current md5s, loudly."""
    art = f"CORRECTNESS_r{latest:02d}.json"
    if not (_REPO_ROOT / art).exists():
        art = f"CORRECTNESS_r{latest}.json"
    try:
        commit = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "-n1", "--", art],
            cwd=_REPO_ROOT, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not commit:
            print(
                f"WARNING: {art} is not committed — cannot snapshot the "
                "driver-run oracle text; refreshed ids will stamp the "
                "WORKING-TREE md5, which certifies any post-driver edits. "
                "Commit the driver artifacts first, then re-run."
            )
            return {}
        with tempfile.TemporaryDirectory() as td:
            wt = str(pathlib.Path(td) / "snap")
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, commit],
                cwd=_REPO_ROOT, capture_output=True, text=True, check=True,
            )
            try:
                out = subprocess.run(
                    [sys.executable, "-c", _DUMP_SNIPPET.format(root=wt)],
                    capture_output=True, text=True, check=True, cwd=wt,
                ).stdout
                return json.loads(out.strip().splitlines()[-1])
            finally:
                subprocess.run(
                    ["git", "worktree", "remove", "--force", wt],
                    cwd=_REPO_ROOT, capture_output=True, text=True,
                )
    except (subprocess.CalledProcessError, OSError, json.JSONDecodeError, IndexError) as e:
        print(f"WARNING: driver-commit snapshot unavailable ({e}); "
              "falling back to working-tree md5s for refreshed ids")
        return {}


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
    snap = _driver_commit_md5s(latest)
    changed, bootstrapped, skipped = 0, [], []
    for name, spec in specs.items():
        cur = oracle_stamp(spec)
        if cur is None:
            continue
        verdict = hist.get(name)
        if name not in stamps:
            # bootstrap: prefer the driver-commit text; always auditable
            stamp = snap.get(name, cur)
            stamps[name] = stamp
            bootstrapped.append((name, "driver-commit" if name in snap else "working-tree"))
            changed += 1
        elif refresh and verdict is not None and verdict[1] == latest:
            if name in snap:
                stamp = snap[name]
            elif snap:
                # verified this round but absent from the driver commit —
                # impossible for a real verdict; leave the old stamp so the
                # id re-fronts rather than certifying unseen text
                skipped.append(name)
                continue
            else:
                stamp = cur  # no snapshot available at all (logged above)
            if stamps.get(name) != stamp:
                changed += 1
            stamps[name] = stamp
    stamps = {n: s for n, s in sorted(stamps.items()) if n in specs}
    stamps["_round"] = max(latest, prev_round)
    _STAMPS_PATH.write_text(json.dumps(stamps, indent=0, sort_keys=True) + "\n")
    for name, src in bootstrapped:
        print(f"bootstrapped (audit): {name} <- {src}")
    for name in skipped:
        print(f"skipped (verdict without driver-commit oracle?): {name}")
    print(f"{len(stamps) - 1} stamps written ({changed} refreshed), latest round r{latest}")


if __name__ == "__main__":
    main()
