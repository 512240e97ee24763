#!/usr/bin/env python
"""Generate tools/key_rounds.json: registry key -> round it first appeared.

Round N's closing commit is the driver's ``round N: verdict/...`` commit,
which snapshots every key registered during round N. A key first appears in
round N if it matches the ``@register("<key>"`` pattern in the round-N tree
but not in the round-(N-1) tree. Keys present only in the current working
tree (not yet in any closed round) get CURRENT_ROUND.

The sweep ranker (__spark_entry__._sweep_rank) uses this file to order
driver-UNVERIFIED keys oldest-round-first, so a capped 50-key sweep drains
the oldest backlog instead of starving it behind newly-registered keys
(round-6 VERDICT "Next round" #1).

Degenerate histories (r7 VERDICT #6 — property-tested in
tests/test_entry.py::TestKeyRoundDerivation against synthetic repos):
boundary commits are ranked by the ROUND NUMBER in their subject, not by
commit order, so a history rewrite that reorders boundaries cannot
misrank; a missing round-N boundary attributes round-N keys to the next
boundary that snapshots them; duplicate subjects for one round keep the
newest commit; a history with NO boundaries puts every key in round 1
(max(default 0) + 1).

Usage: python tools/gen_key_rounds.py  (writes tools/key_rounds.json)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Earliest key registrations used @register("name" on one line; later house
# style puts the name on its own line after the open paren.
_KEY_RE = re.compile(r"@register\(\s*\n?\s*\"([A-Za-z0-9_]+)\"")

_PKG_DIR = "data_transform_spark"


def _git(repo: str, *args: str) -> str:
    return subprocess.check_output(["git", "-C", repo, *args], text=True)


def _round_boundaries(repo: str) -> list[tuple[int, str]]:
    """(round, commit) for each driver 'round N: verdict/...' commit,
    ascending BY ROUND NUMBER (commit order is irrelevant, so reordered or
    rewritten histories still rank correctly)."""
    out = _git(repo, "log", "--oneline", "--format=%H %s")
    bounds: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict/", subject)
        if m:
            rnd = int(m.group(1))
            # log is newest-first; keep the FIRST (newest) commit per round —
            # there is one per round, but be defensive.
            bounds.setdefault(rnd, sha)
    return sorted(bounds.items())


def _keys_at(repo: str, commit: str) -> set[str]:
    # One `git grep` per boundary (not one `git show` per file — that was
    # ~300 sequential forks per regeneration). -A1 covers the house style
    # where the key name sits on the line after `@register(`.
    try:
        out = subprocess.check_output(
            [
                "git", "-C", repo, "grep", "-h", "-A1", r"@register(",
                commit, "--", _PKG_DIR,
            ],
            text=True,
        )
    except subprocess.CalledProcessError:  # no matches at this commit
        return set()
    return set(_KEY_RE.findall(out))


def _keys_working_tree(repo: str) -> set[str]:
    keys: set[str] = set()
    pkg = os.path.join(repo, _PKG_DIR)
    for root, _dirs, files in os.walk(pkg):
        for name in files:
            if not name.endswith(".py"):
                continue
            with open(os.path.join(root, name)) as fh:
                keys.update(_KEY_RE.findall(fh.read()))
    return keys


def derive(repo: str) -> dict[str, int]:
    """key -> first round, from the repo's boundary commits + working tree.

    Pure derivation (no file writes) so tests can run it against synthetic
    histories. Each key gets the SMALLEST round whose boundary tree
    contains it; keys in no boundary get max(closed rounds) + 1."""
    first_round: dict[str, int] = {}
    bounds = _round_boundaries(repo)
    for rnd, commit in bounds:
        for key in _keys_at(repo, commit):
            first_round.setdefault(key, rnd)
    # Keys only in the working tree belong to the round currently being
    # built = one past the newest closed boundary (derived, not hardcoded —
    # a stale constant would rank brand-new keys equal with old ones).
    current_round = max((rnd for rnd, _ in bounds), default=0) + 1
    for key in _keys_working_tree(repo):
        first_round.setdefault(key, current_round)
    return first_round


def main() -> int:
    first_round = derive(REPO)
    out = os.path.join(REPO, "tools", "key_rounds.json")
    with open(out, "w") as fh:
        json.dump(dict(sorted(first_round.items())), fh, indent=1)
        fh.write("\n")
    by_round: dict[int, int] = {}
    for rnd in first_round.values():
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print(f"wrote {out}: {len(first_round)} keys, per-round counts {sorted(by_round.items())}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
