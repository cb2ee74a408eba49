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


def test_dedup_against_index_matches_full_lsh_cross_pairs(spark):
    """Incremental dedup (batch vs corpus index) must report EXACTLY the
    cross (batch, corpus) pairs that a full minhash_lsh_pairs over the
    union reports — same bands, same exact-Jaccard verification."""
    from rdf_fusion_spark.pipeline.dedup import (
        dedup_against_index, minhash_index, minhash_lsh_pairs)
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "completely different text about spark distributed engines",
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "yet another unrelated string of words here now",
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.where("doc_id % 2 = 0")
    batch = df.where("doc_id % 2 = 1")
    got = {(r.new_id, r.corpus_id, round(r.jaccard, 9)) for r in
           dedup_against_index(batch, minhash_index(corpus), 0.5).collect()}
    full = minhash_lsh_pairs(df, 0.5).collect()
    corpus_ids = {0, 2, 4, 6}
    want = set()
    for r in full:
        a, b = r.id_a, r.id_b
        if (a in corpus_ids) != (b in corpus_ids):
            new, old = (a, b) if b in corpus_ids else (b, a)
            want.add((new, old, round(r.jaccard, 9)))
    assert got == want and want, (got, want)


def test_dedup_against_index_excludes_self_and_batch_pairs(spark):
    """A doc id present in both inputs never matches itself, and
    batch-internal duplicates are not reported (asymmetric contract)."""
    from rdf_fusion_spark.pipeline.dedup import (
        dedup_against_index, minhash_index)
    t = "some shared duplicate text appearing in many documents today"
    corpus = spark.createDataFrame([(1, t), (2, "unrelated words entirely "
                                    "about other topics")],
                                   "doc_id long, text string")
    batch = spark.createDataFrame([(1, t), (3, t), (4, t)],
                                  "doc_id long, text string")
    got = {(r.new_id, r.corpus_id) for r in
           dedup_against_index(batch, minhash_index(corpus), 0.9).collect()}
    # every batch doc matches corpus doc 1 EXCEPT doc 1 itself; the
    # (3, 4) batch-internal pair is absent
    assert got == {(3, 1), (4, 1)}, got


def test_dedup_against_index_bucket_cap_logs(spark, caplog):
    import logging
    from rdf_fusion_spark.pipeline.dedup import (
        dedup_against_index, minhash_index)
    t = "identical boilerplate text repeated across the whole corpus"
    corpus = spark.createDataFrame([(i, t) for i in range(30)],
                                   "doc_id long, text string")
    batch = spark.createDataFrame([(100, t)], "doc_id long, text string")
    with caplog.at_level(logging.WARNING,
                         logger="rdf_fusion_spark.pipeline.dedup"):
        got = {r.corpus_id for r in
               dedup_against_index(batch, minhash_index(corpus), 0.9,
                                   bucket_cap=5).collect()}
    # only the 5 lowest-id corpus members per bucket survive as
    # candidates; the dropped mass is logged exactly
    assert got == {0, 1, 2, 3, 4}, got
    assert any("beyond the 5-per-bucket cap" in r.message
               for r in caplog.records)


def test_sequential_daily_merges_equal_full_corpus_lsh(spark):
    """The lifecycle contract (r9 verdict #7): indexing a base corpus
    once, then processing N daily batches sequentially — dedup each
    batch against the index (cross pairs), minhash_lsh_pairs within the
    batch, merge_into_index the batch's signatures — must discover
    EXACTLY the pair set of one full-corpus minhash_lsh_pairs run over
    the union. bucket_cap=None on the incremental side: the cap drops
    (corpus,band) memberships by corpus-id rank, which a full run ranks
    over the whole union — equivalence is the uncapped contract."""
    from rdf_fusion_spark.pipeline.dedup import (
        dedup_against_index, merge_into_index, minhash_index,
        minhash_lsh_pairs)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "completely different text about spark distributed engines",
        "the quick brown fox jumps over the lazy dog",
        "yet another unrelated string of words here now",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
        "the quick brown fox jumps over the sleepy dog",
        "completely different text about spark distributed engines too",
        "fresh unseen sentence with mostly novel vocabulary inside",
        "the quick brown fox jumps over the lazy dog again",
    ]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    base = df.where("doc_id % 4 = 0")          # day-0 corpus
    days = [df.where(f"doc_id % 4 = {d}") for d in (1, 2, 3)]

    idx = minhash_index(base)
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b), round(r.jaccard, 9))
           for r in minhash_lsh_pairs(base, 0.5).collect()}
    for batch in days:
        cross = dedup_against_index(batch, idx, 0.5,
                                    bucket_cap=None).collect()
        got |= {(min(r.new_id, r.corpus_id), max(r.new_id, r.corpus_id),
                 round(r.jaccard, 9)) for r in cross}
        within = minhash_lsh_pairs(batch, 0.5).collect()
        got |= {(min(r.id_a, r.id_b), max(r.id_a, r.id_b),
                 round(r.jaccard, 9)) for r in within}
        idx = merge_into_index(idx, minhash_index(batch))

    want = {(r.id_a, r.id_b, round(r.jaccard, 9))
            for r in minhash_lsh_pairs(df, 0.5).collect()}
    assert got == want and want, (sorted(got), sorted(want))
    # and the merged index now IS the full-corpus index
    full_idx = {(r.id, tuple(sorted(r.sh))) for r in minhash_index(df)
                .select("id", "sh").collect()}
    merged = {(r.id, tuple(sorted(r.sh)))
              for r in idx.select("id", "sh").collect()}
    assert merged == full_idx


def test_merge_into_index_dedupes_ids_when_not_disjoint(spark):
    from rdf_fusion_spark.pipeline.dedup import merge_into_index, minhash_index
    a = minhash_index(spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "other words here")],
        "doc_id long, text string"))
    b = minhash_index(spark.createDataFrame(
        [(2, "REPLAYED row must lose"), (3, "new day new doc")],
        "doc_id long, text string"))
    merged = merge_into_index(a, b, assume_disjoint=False)
    assert sorted(r.id for r in merged.select("id").collect()) == [1, 2, 3]
    # the EXISTING row wins on id collision
    sh2 = {tuple(r.sh) for r in a.where("id = 2").select("sh").collect()}
    assert {tuple(r.sh) for r in
            merged.where("id = 2").select("sh").collect()} == sh2
