"""RDF Dataset Canonicalization (RDFC-1.0, W3C Recommendation).

Canonical blank-node labels for a quads dataset — the user-facing API the
reference wires into its test harness (testsuite/tests/canonicalization.rs
targets the public w3c rdf-canon suite; the harness itself is #[ignore]d
there, so this module goes further by shipping a working implementation).

Scale shape: blank nodes are a *document* feature — canonicalization runs
driver-side over ONLY the bnode-touching quads (GraphStore.canonicalize
filters them out distributed, relabels with one broadcast join); the
ground quads never leave the cluster. A warehouse dataset with zero blank
nodes canonicalizes without moving any data.

Algorithm: the spec's canonicalization function — hash first-degree
quads, issue canonical ids for unique hashes in hash order, then hash
N-degree quads with permutation search for the remainder. SHA-256
throughout (the spec's default hash)."""

from __future__ import annotations

import hashlib
from itertools import permutations
from typing import Optional

from .terms import BlankNode, Term

_CANON_PREFIX = "c14n"


class _Issuer:
    """Identifier issuer (spec §4.1): stable prefix + insertion-ordered
    issued map."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.counter = 0
        self.issued: dict[str, str] = {}

    def issue(self, old: str) -> str:
        got = self.issued.get(old)
        if got is None:
            got = f"{self.prefix}{self.counter}"
            self.counter += 1
            self.issued[old] = got
        return got

    def has(self, old: str) -> bool:
        return old in self.issued

    def clone(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.counter = self.counter
        c.issued = dict(self.issued)
        return c


def _nq_term(t: Optional[Term], ref: Optional[str], here: str) -> str:
    """Serialize one quad component for first-degree hashing: the bnode
    under consideration becomes _:a, every other bnode _:z (spec §4.6)."""
    if t is None:
        return ""
    if isinstance(t, BlankNode):
        return "_:a" if t.id == ref else "_:z"
    return str(t)


def _nq_line(quad, ref: Optional[str]) -> str:
    g, s, p, o = quad
    parts = [_nq_term(s, ref, "s"), _nq_term(p, ref, "p"),
             _nq_term(o, ref, "o")]
    if g is not None:
        parts.append(_nq_term(g, ref, "g"))
    return " ".join(parts) + " .\n"


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


class _State:
    def __init__(self, quads):
        self.quads = quads
        # bnode label → quads mentioning it (spec: blank node to quads map)
        self.b2q: dict[str, list] = {}
        for q in quads:
            for t in q:
                if isinstance(t, BlankNode):
                    self.b2q.setdefault(t.id, []).append(q)
        self.canon = _Issuer(_CANON_PREFIX)
        self._fdh_cache: dict[str, str] = {}

    # -- §4.6 Hash First Degree Quads ----------------------------------
    def hash_first_degree(self, n: str) -> str:
        got = self._fdh_cache.get(n)
        if got is None:
            lines = sorted(_nq_line(q, n) for q in self.b2q[n])
            got = self._fdh_cache[n] = _sha256("".join(lines))
        return got

    # -- §4.7 Hash Related Blank Node ----------------------------------
    def hash_related(self, related: str, quad, issuer: _Issuer,
                    position: str) -> str:
        inp = position
        if position != "g":
            inp += f"<{quad[2].iri}>"  # predicate
        if self.canon.has(related):
            inp += "_:" + self.canon.issued[related]
        elif issuer.has(related):
            inp += "_:" + issuer.issued[related]
        else:
            inp += self.hash_first_degree(related)
        return _sha256(inp)

    # -- §4.8 Hash N-Degree Quads --------------------------------------
    def hash_n_degree(self, n: str, issuer: _Issuer):
        hn: dict[str, set] = {}
        for quad in self.b2q[n]:
            g, s, p, o = quad
            for t, pos in ((s, "s"), (o, "o"), (g, "g")):
                if isinstance(t, BlankNode) and t.id != n:
                    h = self.hash_related(t.id, quad, issuer, pos)
                    hn.setdefault(h, set()).add(t.id)
        data = ""
        for h in sorted(hn):
            data += h
            chosen_path = ""
            chosen_issuer = None
            for perm in permutations(sorted(hn[h])):
                issuer_copy = issuer.clone()
                path = ""
                recursion: list[str] = []
                skip = False
                for related in perm:
                    if self.canon.has(related):
                        path += "_:" + self.canon.issued[related]
                    else:
                        if not issuer_copy.has(related):
                            recursion.append(related)
                        path += "_:" + issuer_copy.issue(related)
                    if chosen_path and len(path) >= len(chosen_path) \
                            and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                for related in recursion:
                    result_hash, result_issuer = self.hash_n_degree(
                        related, issuer_copy)
                    path += "_:" + issuer_copy.issue(related)
                    path += f"<{result_hash}>"
                    issuer_copy = result_issuer
                    if chosen_path and len(path) >= len(chosen_path) \
                            and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data += chosen_path
            issuer = chosen_issuer if chosen_issuer is not None else issuer
        return _sha256(data), issuer


def canonical_labels(quads) -> dict[str, str]:
    """RDFC-1.0 canonical issuance: {original bnode label → c14n label}.

    `quads` is an iterable of (graph, subject, predicate, object) Python
    term tuples (graph None = default graph)."""
    state = _State(list(quads))
    if not state.b2q:
        return {}

    # unique first-degree hashes get canonical ids in hash order (§4.4.3)
    by_hash: dict[str, list] = {}
    for n in state.b2q:
        by_hash.setdefault(state.hash_first_degree(n), []).append(n)
    nondegenerate: list[str] = []
    for h in sorted(by_hash):
        members = by_hash[h]
        if len(members) == 1:
            state.canon.issue(members[0])
        else:
            nondegenerate.extend(members)

    # the rest via N-degree hashing with permutation search (§4.4.4-6)
    for h in sorted(by_hash):
        members = [m for m in by_hash[h] if not state.canon.has(m)]
        if not members:
            continue
        results = []
        for m in members:
            temp = _Issuer("b")
            temp.issue(m)
            results.append(state.hash_n_degree(m, temp))
        for _, issuer in sorted(results, key=lambda r: r[0]):
            for old in issuer.issued:
                state.canon.issue(old)

    return dict(state.canon.issued)
