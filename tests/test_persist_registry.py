"""Shared-subquery persist registry lifecycle (plans/translator.py).

Round-8 ADVICE: reregister_persists installed its registry entry under
the lock but persist()ed afterwards outside it, so a concurrent
_release_prior_persists could pop-and-unpersist the set in between —
after which the persist() loop re-marked the DataFrames for caching
with NO registry entry tracking them (cached blocks leaked until
session stop). The fix re-checks under the lock that the entry still
holds the slot and undoes untracked persists. These tests drive the
exact interleaving deterministically by triggering the release from
inside the persist() call itself.
"""

from __future__ import annotations

from pyspark import StorageLevel

import rdf_fusion_spark.plans.translator as T


def _fresh_df(spark, tag: int):
    return spark.range(100 + tag).selectExpr("id", f"id * {tag + 2} as v")


def _is_persisted(df) -> bool:
    return df.storageLevel != StorageLevel.NONE


def test_reregister_restores_and_next_release_frees(spark):
    df = _fresh_df(spark, 1)
    T.reregister_persists(spark, [df])
    assert _is_persisted(df)
    assert T.query_shared_persists(spark) == [df]
    T._release_prior_persists(spark)
    # unpersist is async (blocking=False) but the LEVEL flips immediately
    assert not _is_persisted(df)
    assert T.query_shared_persists(spark) == []


def test_concurrent_release_between_install_and_persist(spark, monkeypatch):
    """The ADVICE interleaving: a release lands after the registry
    install but before/while the persist() loop runs. The re-check must
    leave the DataFrame UNPERSISTED (no untracked cached blocks)."""
    df = _fresh_df(spark, 2)
    fired = []
    orig_persist = type(df).persist

    def racing_persist(self, *a, **k):
        out = orig_persist(self, *a, **k)
        if not fired:
            fired.append(True)
            # simulate the other thread: pops our just-installed entry
            T._release_prior_persists(spark)
        return out

    monkeypatch.setattr(type(df), "persist", racing_persist)
    T.reregister_persists(spark, [df])
    monkeypatch.undo()
    assert fired, "race hook did not fire"
    # the slot moved, so reregister must have undone its own persists
    assert not _is_persisted(df)
    # and the registry holds nothing for this session
    assert T.query_shared_persists(spark) == []


def test_reregister_same_dfs_keeps_cache(spark):
    """Re-registering the same snapshot (prepared-plan cache hit) must
    not unpersist-then-repersist the shared frames."""
    df = _fresh_df(spark, 3)
    T.reregister_persists(spark, [df])
    assert _is_persisted(df)
    T.reregister_persists(spark, [df])
    assert _is_persisted(df)
    assert T.query_shared_persists(spark) == [df]
    T._release_prior_persists(spark)
    assert not _is_persisted(df)
