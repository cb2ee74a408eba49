"""SPARQL 1.1 Federated Query (SERVICE) — executed against this repo's
own SPARQL Protocol endpoint, so the whole loop (parser raw-text capture
→ HTTP client → results reader → compatibility join) is exercised
without any external network. The reference parses SERVICE but
#[ignore]s all federation tests; this engine executes it."""

import pytest

from rdf_fusion_spark import GraphStore, Literal, NamedNode
from rdf_fusion_spark.terms import term_to_python

EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"
REL = "http://www.perceive.net/schemas/relationship/"


@pytest.fixture(scope="module")
def remote(spark, spiderman):
    from rdf_fusion_spark.web import SparqlHttpServer
    server = SparqlHttpServer(spiderman, "127.0.0.1", 0)
    server.start_background()
    yield f"http://127.0.0.1:{server.port}/query"
    server.stop()


@pytest.fixture(scope="module")
def local_store(spark):
    """A *different* local store: per-hero home towns. The federated join
    combines remote names with local towns."""
    quads = [
        (None, NamedNode(EX + "spiderman"), NamedNode(EX + "home"),
         Literal("New York")),
        (None, NamedNode(EX + "green-goblin"), NamedNode(EX + "home"),
         Literal("Oscorp Tower")),
        (None, NamedNode(EX + "batman"), NamedNode(EX + "home"),
         Literal("Gotham")),
    ]
    return GraphStore.from_python_quads(spark, quads)


def rows(res):
    return [{v: term_to_python(r[v]) for v in res.variables
             if r[v] is not None} for r in res.df.collect()]


def test_service_join_remote_names_with_local_homes(local_store, remote):
    q = f"""
    PREFIX foaf: <{FOAF}>
    PREFIX ex: <{EX}>
    SELECT ?s ?name ?town WHERE {{
      ?s ex:home ?town .
      SERVICE <{remote}> {{ ?s foaf:name ?name }}
    }}
    """
    got = {(r["s"], r["name"], r["town"]) for r in rows(local_store.query(q))}
    # batman has no remote name; spiderman has two names (plain + ru)
    sm, gg = NamedNode(EX + "spiderman"), NamedNode(EX + "green-goblin")
    assert got == {
        (sm, Literal("Spiderman"), Literal("New York")),
        (sm, Literal("Человек-паук", language="ru"), Literal("New York")),
        (gg, Literal("Green Goblin"), Literal("Oscorp Tower")),
    }


def test_service_prefixes_travel_with_raw_group(local_store, remote):
    # the inner group uses ONLY prefixed names declared in the OUTER
    # prologue — the captured raw text must ship with that prologue
    q = f"""
    PREFIX rel: <{REL}>
    SELECT ?a ?b WHERE {{
      SERVICE <{remote}> {{ ?a rel:enemyOf ?b }}
    }}
    """
    got = rows(local_store.query(q))
    assert len(got) == 2
    assert {r["a"] for r in got} == {NamedNode(EX + "spiderman"),
                                     NamedNode(EX + "green-goblin")}


def test_service_silent_dead_endpoint_is_unit(local_store):
    q = """
    SELECT ?s ?town WHERE {
      ?s <http://example.org/home> ?town .
      SERVICE SILENT <http://127.0.0.1:9/query> { ?s ?p ?o }
    }
    """
    # SILENT failure → unit solution; the join keeps all 3 local rows
    # with ?p/?o unbound (spec §18.2.5.2)
    assert len(rows(local_store.query(q))) == 3


def test_service_dead_endpoint_raises_without_silent(local_store):
    from rdf_fusion_spark.sparql.service import ServiceError
    q = """
    SELECT * WHERE {
      SERVICE <http://127.0.0.1:9/query> { ?s ?p ?o }
    }
    """
    with pytest.raises(ServiceError):
        local_store.query(q)


def test_service_bound_variable_endpoint_raises(local_store, remote):
    # a var endpoint BOUND elsewhere must raise (per-binding remote calls
    # are unsupported), never silently evaluate as empty
    q = f"""
    SELECT ?s WHERE {{
      VALUES ?ep {{ <{remote}> }}
      SERVICE ?ep {{ ?s ?p ?o }}
    }}
    """
    with pytest.raises(NotImplementedError, match="bound variable endpoint"):
        local_store.query(q)


def test_service_variable_endpoint_is_empty_branch(local_store):
    # unbound variable endpoint = per-solution error → empty branch, the
    # query continues (oxigraph ask_{union,join}_error_* semantics)
    res = local_store.query(
        "SELECT * WHERE { SERVICE ?ep { ?s ?p ?o } }")
    assert res.df.count() == 0
    ask = local_store.query(
        "ASK { {} UNION { SERVICE ?ep { ?s ?p ?o } } }")
    assert ask.value is True


def test_service_only_query(local_store, remote):
    q = f"""
    SELECT ?name WHERE {{
      SERVICE <{remote}> {{
        <{EX}spiderman> <{FOAF}name> ?name
      }}
    }}
    """
    got = {r["name"] for r in rows(local_store.query(q))}
    assert got == {Literal("Spiderman"),
                   Literal("Человек-паук", language="ru")}
