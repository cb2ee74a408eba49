"""Driver-gate staleness rotation for the query registry.

The correctness driver samples a PREFIX (currently 50) of the registry
returned by ``entry_queries.queries()`` each round, so dict order decides
which queries get fresh driver-gated rows. Rounds 5-7 hand-curated that
order in a ``_GATE_FIRST`` list — and round 7 then rewrote three LSH
operators (commit 341970e) *after* their last driver gate without the
list catching it, leaving their r04 greens stale (round-7 verdict,
"What's wrong" #1).

This module derives the order mechanically from two facts the repo
already records:

1. **Last gated round** per query: the ``CORRECTNESS_r*.json`` records at
   the repo root (one per round; a green row = the driver verified that
   query against its DuckDB oracle that round).
2. **Last code-change round** per operator module: the driver commits a
   ``round N: verdict/advice/correctness/bench`` boundary at the end of
   every round, so ``git log`` assigns every commit — and therefore every
   file's last modification — to a round: commits newer than the
   ``round N`` boundary belong to round N+1.

A query is STALE iff its implementing module changed in a later round
than its last green driver gate, its green is older than
``MAX_GATE_AGE`` rounds (round-8 verdict: a query whose module never
changes — or maps to no module at all — was fresh forever, carrying
r3 greens five rounds old), or it was never gated. Stale queries are
listed first, least-recently-gated first (ties keep registry order),
so any future rewrite automatically re-queues its queries — no hand-list
to forget. Fresh queries follow in registry order; the driver's 50-query
prefix then always spends its budget on the rows whose greens are oldest
relative to the code they certify.

Everything here is best-effort: if git or the correctness records are
unavailable (fresh checkout, sdist install), every query is treated as
never-gated and the registry order is preserved unchanged.
"""

from __future__ import annotations

import json
import re
import subprocess
from functools import lru_cache
from pathlib import Path
from typing import Callable, Iterable, Sequence

REPO_ROOT = Path(__file__).resolve().parent.parent

_BOUNDARY_RE = re.compile(r"^round (\d+):")

# A green driver row this many rounds old (or older) is re-queued even
# if its implementing module never changed: module attribution is
# best-effort (a query mapped to no module would otherwise never rotate
# back in), and environment/driver changes aren't module changes.
MAX_GATE_AGE = 4
_CORRECTNESS_RE = re.compile(r"^CORRECTNESS_r(\d+)\.json$")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO_ROOT), *args],
        check=True, capture_output=True, text=True, timeout=30,
    ).stdout


@lru_cache(maxsize=1)
def _commit_rounds() -> dict[str, int]:
    """Map every commit hash to the round its work belongs to.

    Walking newest-first: commits above the newest ``round N`` boundary
    are round N+1 work; the boundary commit itself (the driver's
    artifact commit for round N) and everything down to the previous
    boundary are round N.
    """
    lines = _git("log", "--format=%H%x09%s").splitlines()
    boundaries = []
    for ln in lines:
        h, _, subj = ln.partition("\t")
        m = _BOUNDARY_RE.match(subj)
        boundaries.append((h, int(m.group(1)) if m else None))
    newest = max((r for _, r in boundaries if r is not None), default=0)
    out: dict[str, int] = {}
    cur = newest + 1
    for h, r in boundaries:
        if r is not None:
            cur = r
        out[h] = cur
    return out


@lru_cache(maxsize=None)
def _module_round(path: str) -> int:
    """Round in which `path` (repo-relative file or directory) last
    changed. 0 if git can't answer (treated as never-changed, i.e. a
    gate at any round stays fresh)."""
    try:
        h = _git("log", "-1", "--format=%H", "--", path).strip()
        if not h:
            return 0
        return _commit_rounds().get(h, 0)
    except Exception:
        return 0


def current_round() -> int:
    """The in-progress round number: newest driver boundary + 1 (the
    ``round N`` artifact commit closes round N). 0 when git is
    unavailable — age staleness is then disabled."""
    try:
        lines = _git("log", "--format=%s").splitlines()
        newest = max((int(m.group(1)) for ln in lines
                      if (m := _BOUNDARY_RE.match(ln))), default=0)
        return newest + 1 if newest else 0
    except Exception:
        return 0


@lru_cache(maxsize=1)
def gated_rounds() -> dict[str, int]:
    """query name -> latest round with a GREEN driver row (err-free,
    rows/schema match, hash match unless the driver ran the weaker
    rows-only check)."""
    out: dict[str, int] = {}
    try:
        records = sorted(
            (int(m.group(1)), p)
            for p in REPO_ROOT.iterdir()
            if (m := _CORRECTNESS_RE.match(p.name))
        )
    except OSError:
        return out
    for rnd, path in records:
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (row.get("err") is None
                     and row.get("rows_match") is not False
                     and row.get("schema_match") is not False
                     and row.get("hash_match") is not False)
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def order_registry(names: Sequence[str],
                   modules_of: Callable[[str], Iterable[str]],
                   force_regate: Iterable[str] = ()) -> list[str]:
    """Reorder `names` so stale queries come first.

    `modules_of(name)` returns the repo-relative paths implementing the
    query (a directory re-queues on any change under it). `force_regate`
    is the manual escape hatch for changes git can't attribute to a
    module — e.g. a SPEC-text or oracle edit inside entry_queries.py
    itself (mapping every query to entry_queries.py would mark the whole
    registry stale every round, since this file changes every round).
    """
    try:
        gated = gated_rounds()
    except Exception:
        gated = {}
    cur = current_round()
    force = set(force_regate)
    stale: list[tuple[int, int, str]] = []
    fresh: list[str] = []
    for i, name in enumerate(names):
        last_gated = gated.get(name, 0)
        if name in force:
            # force = re-gate NOW: front of the queue alongside
            # never-gated queries, regardless of when it was last green
            stale.append((0, i, name))
            continue
        try:
            changed = max((_module_round(m) for m in modules_of(name)),
                          default=0)
        except Exception:
            changed = 0
        aged_out = bool(cur) and cur - last_gated >= MAX_GATE_AGE
        if last_gated == 0 or changed > last_gated or aged_out:
            stale.append((last_gated, i, name))
        else:
            fresh.append(name)
    stale.sort()
    return [n for _, _, n in stale] + fresh
