"""Property-based verification of remove_shared_windows (both modes)
against an independent pure-Python reference implementation.

The driver gate checks the operator on the fixed testdata corpus; these
tests drive RANDOM corpora (tiny vocabulary → dense duplication, doc
lengths straddling the window width k, repeated spans within and across
docs) so tokenization and window-boundary edge cases can't hide. One
shared SparkSession, small example counts — Spark round-trips are slow,
so hypothesis gets few but adversarial examples.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K = 3
VOCAB = ["a", "b", "c"]

# docs: 1-7 tokens from a 3-word vocab, up to 6 docs — tiny enough that
# identical k-grams are common and most structures (sub-k docs, full-doc
# spans, overlapping spans, within-doc repeats) occur
_doc = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=7)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _windows(tokens: list) -> list:
    return [tuple(tokens[i:i + K]) for i in range(len(tokens) - K + 1)]


def _reference(corpus: list[list[str]], mode: str) -> list[tuple]:
    """Independent re-implementation: doc ids are list indices."""
    # canonical occurrence per window value
    first_doc: dict = {}
    first_occ: dict = {}
    for d, toks in enumerate(corpus):
        for p, w in enumerate(_windows(toks)):
            if w not in first_doc:
                first_doc[w] = d
                first_occ[w] = (d, p)
    out = []
    for d, toks in enumerate(corpus):
        covered = set()
        for p, w in enumerate(_windows(toks)):
            dup = (first_doc[w] < d if mode == "cross_doc"
                   else first_occ[w] != (d, p))
            if dup:
                covered.update(range(p, p + K))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out.append((d, " ".join(kept), len(toks), len(covered)))
    return out


@pytest.mark.parametrize("mode", ["cross_doc", "corpus"])
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=_corpus)
def test_remove_shared_windows_matches_reference(spark, mode, corpus):
    from rdf_fusion_spark.pipeline.dedup import remove_shared_windows
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["deduped_text"], r["n_tokens"],
         r["n_removed_tokens"])
        for r in remove_shared_windows(df, k=K, mode=mode).collect())
    assert got == sorted(_reference(corpus, mode))
