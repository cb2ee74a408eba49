"""SPARQL 1.1 Federated Query client (SERVICE clause execution).

The reference engine parses but never executes SERVICE (its federation
tests are #[ignore]d, rdf-fusion evaluator scope); this module goes
beyond it with a real SPARQL Protocol client. The remote pattern is
shipped verbatim (the parser captures the group's source text) wrapped
in `SELECT *`, POSTed as `application/sparql-query`, and the
`application/sparql-results+json` response is decoded with the same
conformance-tested reader used for the W3C result-format suites.

Scale note: a SERVICE result set is driver-side materialized by every
federation implementation (the remote endpoint is a single HTTP peer,
not a distributed source) — the join against local data then runs
distributed through the ordinary compatibility-join machinery.
"""

from __future__ import annotations

import urllib.error
import urllib.request

from ..results.readers import read_json_results
from ..terms import NamedNode

DEFAULT_TIMEOUT = 60.0


class ServiceError(RuntimeError):
    """Remote SERVICE evaluation failed (network, HTTP, or payload)."""


def service_query_text(prologue: str, raw_group: str) -> str:
    """The query shipped to the remote endpoint: outer prologue (so
    prefixed names in the captured group resolve identically) + SELECT *
    over the author's verbatim pattern."""
    head = (prologue + "\n") if prologue else ""
    return f"{head}SELECT * WHERE {raw_group}"


def fetch_service_bindings(endpoint: NamedNode, query: str,
                           timeout: float = DEFAULT_TIMEOUT):
    """POST `query` to `endpoint`; return (variables, rows) where rows are
    dicts var→Term. Raises ServiceError on any failure (the caller maps
    SILENT to the unit solution per spec §18.2.5.2)."""
    url = endpoint.iri if hasattr(endpoint, "iri") else str(endpoint)
    req = urllib.request.Request(
        url,
        data=query.encode("utf-8"),
        headers={
            "Content-Type": "application/sparql-query",
            "Accept": "application/sparql-results+json",
        },
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read().decode("utf-8")
    except (urllib.error.URLError, OSError, ValueError) as e:
        raise ServiceError(f"SERVICE <{url}>: {e}") from e
    try:
        parsed = read_json_results(body)
    except Exception as e:
        raise ServiceError(f"SERVICE <{url}>: bad result payload: {e}") from e
    if parsed[0] != "bindings":
        raise ServiceError(f"SERVICE <{url}>: expected bindings, got ASK result")
    _, variables, rows = parsed
    return variables, rows
