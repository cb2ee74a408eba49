"""Split-union compatibility joins (SURVEY §7.3#3, VERDICT r2 item 4).

When a shared variable is statically nullable on one side (typically after an
OPTIONAL), the SPARQL compat join must not degrade to a nested loop: the
null-pattern decomposition in plans/join.py slices each side by which nullable
shared vars are bound and joins slice pairs on pure equality keys, so Catalyst
plans hash joins. These tests pin both the SEMANTICS (against hand-computed
compatible-mapping results) and the PLAN (no BroadcastNestedLoopJoin /
CartesianProduct when every slice pair keeps at least one key).
"""

import contextlib
import io

from rdf_fusion_spark.terms import Literal, term_to_python

EX = "http://example.org/"
PFX = """
  PREFIX foaf: <http://xmlns.com/foaf/0.1/>
  PREFIX rel: <http://www.perceive.net/schemas/relationship/>
"""


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def rows(res):
    return [{v: term_to_python(r[v]) for v in res.variables}
            for r in res.df.collect()]


def assert_no_nested_loop(df):
    plan = plan_of(df)
    for j in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert j not in plan, f"unexpected {j}:\n{plan}"


def test_inner_join_nullable_shared_var(spiderman):
    # left side: (?s, ?e, ?name?) with ?name nullable (only the @ru name
    # matches the OPTIONAL filter); joining { ?s foaf:name ?name } must treat
    # the unbound ?name as compatible with any right binding.
    res = spiderman.query(PFX + """
        SELECT ?s ?e ?name WHERE {
          { ?s rel:enemyOf ?e .
            OPTIONAL { ?s foaf:name ?name . FILTER(LANG(?name) = "ru") } }
          { ?s foaf:name ?name }
        }
    """)
    got = {(r["s"].iri, r["e"].iri, r["name"].lexical, r["name"].language)
           for r in rows(res)}
    assert got == {
        (EX + "spiderman", EX + "green-goblin", "Человек-паук", "ru"),
        (EX + "green-goblin", EX + "spiderman", "Green Goblin", None),
    }
    # every slice pair keys on ?s at least → hash joins only
    assert_no_nested_loop(res.df)


def test_optional_with_nullable_shared_var(spiderman):
    # OPTIONAL whose shared ?name is nullable on the left: unmatched left
    # rows must survive NULL-padded (anti-chain remainder part).
    res = spiderman.query(PFX + """
        SELECT ?s ?name ?other WHERE {
          { ?s rel:enemyOf ?e .
            OPTIONAL { ?s foaf:name ?name . FILTER(LANG(?name) = "ru") } }
          OPTIONAL { ?other foaf:name ?name . FILTER(?other != ?s) }
        }
    """)
    got = {(r["s"].iri,
            r["name"].lexical if r["name"] else None,
            r["other"].iri if r["other"] else None)
           for r in rows(res)}
    # sm row: name bound to @ru literal; no OTHER node shares that name.
    # gg row: name unbound → compatible with every name of a node != gg.
    assert got == {
        (EX + "spiderman", "Человек-паук", None),
        (EX + "green-goblin", "Spiderman", EX + "spiderman"),
        (EX + "green-goblin", "Человек-паук", EX + "spiderman"),
    }


def test_minus_nullable_shared_var(spiderman):
    # MINUS where ?name is nullable on the left: rows whose only shared vars
    # are unbound are NOT excluded (any-both-bound clause), and the
    # decomposition must plan hash anti joins.
    res = spiderman.query(PFX + """
        SELECT ?s ?name WHERE {
          ?s rel:enemyOf ?e .
          OPTIONAL { ?s foaf:name ?name . FILTER(LANG(?name) = "ru") }
          MINUS { ?s foaf:name ?name }
        }
    """)
    got = {(r["s"].iri, r["name"].lexical if r["name"] else None)
           for r in rows(res)}
    # sm: (s,name) matches its own foaf:name → excluded.
    # gg: name unbound; shared ?s bound both sides and gg has names → but
    # compat on ?name holds (unbound) and ?s matches → excluded too? ?s IS
    # bound on both sides, so (gg, NULL) vs (gg, "Green Goblin") is
    # compatible with a both-bound var (?s) → excluded.
    assert got == set()
    assert_no_nested_loop(res.df)


def test_not_exists_nullable_shared_var(spiderman):
    res = spiderman.query(PFX + """
        SELECT ?s ?name WHERE {
          ?s rel:enemyOf ?e .
          OPTIONAL { ?s foaf:name ?name . FILTER(LANG(?name) = "ru") }
          FILTER NOT EXISTS { ?s foaf:name ?name }
        }
    """)
    # both left rows are compatible with some right row (sm via its ru name;
    # gg with unbound ?name via its own names) → empty.
    assert rows(res) == []
    assert_no_nested_loop(res.df)


def test_exists_nullable_shared_var(spiderman):
    res = spiderman.query(PFX + """
        SELECT ?s WHERE {
          ?s rel:enemyOf ?e .
          OPTIONAL { ?s foaf:name ?nm . FILTER(LANG(?nm) = "xx") }
          FILTER EXISTS { ?s foaf:name ?nm }
        }
    """)
    got = sorted(r["s"].iri for r in rows(res))
    assert got == [EX + "green-goblin", EX + "spiderman"]
    assert_no_nested_loop(res.df)
