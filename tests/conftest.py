import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("rdf_fusion_spark_tests")
        # one shared JVM serves the whole suite (~2500 stages); the 1g
        # default heap OOMs late in the run from accumulated codegen /
        # broadcast / persist state, so size it for the suite and let the
        # ContextCleaner GC aggressively between tests
        .config("spark.driver.memory", "4g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def spiderman(spark):
    """Tiny smoke graph (reference fixture: examples/data/spiderman.ttl,
    FIXTURES.md F2)."""
    from rdf_fusion_spark import GraphStore, NamedNode, Literal
    from rdf_fusion_spark.terms import RDF_TYPE

    EX = "http://example.org/"
    FOAF = "http://xmlns.com/foaf/0.1/"
    REL = "http://www.perceive.net/schemas/relationship/"
    sm = NamedNode(EX + "spiderman")
    gg = NamedNode(EX + "green-goblin")
    quads = [
        (None, sm, NamedNode(RDF_TYPE), NamedNode(FOAF + "Person")),
        (None, gg, NamedNode(RDF_TYPE), NamedNode(FOAF + "Person")),
        (None, sm, NamedNode(REL + "enemyOf"), gg),
        (None, gg, NamedNode(REL + "enemyOf"), sm),
        (None, sm, NamedNode(FOAF + "name"), Literal("Spiderman")),
        (None, sm, NamedNode(FOAF + "name"), Literal("Человек-паук", language="ru")),
        (None, gg, NamedNode(FOAF + "name"), Literal("Green Goblin")),
    ]
    return GraphStore.from_python_quads(spark, quads).cached()
