"""Service-side NL-query kernels (trustgraph_spark.nlservice): backend
routing, SPARQL optimization (verified through the real engine), result
cache, and question-language detection.

Parity model: query/ontology/backend_router.py, query_optimizer.py
(SPARQL arm), cache.py InMemoryCache, multi_language.py rule fallback."""

import pytest

from trustgraph_spark.constants import RDF_LABEL, RDF_TYPE
from trustgraph_spark.nlquery import analyze_question, generate_sparql
from trustgraph_spark.nlservice import (
    BackendRouter,
    BackendType,
    OptimizationHint,
    OptimizationStrategy,
    QueryOptimizer,
    QueryResultCache,
    detect_question_language,
)

NS = "http://example.org/"
TRIPLES_DDL = (
    "collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string"
)


# --- backend routing --------------------------------------------------------


def test_priority_routing_defaults_to_cassandra_sparql():
    r = BackendRouter({})
    route = r.route_query(analyze_question("find all Device"), [])
    assert route.backend_type == BackendType.CASSANDRA
    assert route.query_language == "sparql"
    assert route.confidence == 1.0
    assert "Priority" in route.reasoning


def test_priority_routing_prefers_primary_over_fallback():
    r = BackendRouter({"primary": "neo4j", "fallback": ["cassandra"]})
    route = r.route_query(analyze_question("find all Device"), [])
    assert route.backend_type == BackendType.NEO4J
    assert route.query_language == "cypher"
    # disabling the primary falls through to the fallback
    r.update_backend_status(BackendType.NEO4J, False)
    assert r.route_query(
        analyze_question("x"), []
    ).backend_type == BackendType.CASSANDRA


def test_adaptive_routing_heuristics():
    r = BackendRouter({
        "primary": "cassandra", "fallback": ["neo4j"],
        "routing_strategy": "adaptive",
    })
    # relationship question + extracted relationships favour cypher:
    # cassandra = 1.0 (priority) vs neo4j = 0.5 + 0.3 + 0.2 + 0.2(small) = 1.0
    # -> tie broken by insertion order (primary first), as the reference's
    # max() over dict keys does
    rel = analyze_question("how is Alice related to Bob")
    route = r.route_query(rel, [{}])
    assert route.backend_type == BackendType.CASSANDRA

    # with equal priorities the heuristics decide
    r2 = BackendRouter({
        "primary": "neo4j", "fallback": ["cassandra"],
        "routing_strategy": "adaptive",
    })
    agg = analyze_question("count the Devices")
    # neo4j: 1.0 + 0 + 0.2(small subset) + 0.2(agg) = capped 1.0
    # cassandra: 0.5 + 0.3(aggregation) + 0 + 0.1 = 0.9
    route2 = r2.route_query(agg, [{}])
    assert route2.backend_type == BackendType.NEO4J


def test_fallback_route_and_no_backends():
    r = BackendRouter({"primary": "cassandra", "fallback": ["memgraph"]})
    fb = r.get_fallback_route(BackendType.CASSANDRA)
    assert fb.backend_type == BackendType.MEMGRAPH
    assert fb.confidence == 0.7
    assert BackendRouter({"primary": "cassandra", "enable_fallback": False}
                         ).get_fallback_route(BackendType.CASSANDRA) is None
    r.update_backend_status(BackendType.CASSANDRA, False)
    r.update_backend_status(BackendType.MEMGRAPH, False)
    with pytest.raises(RuntimeError):
        r.route_query(analyze_question("x"), [])
    # unknown backend names are skipped, not fatal
    assert BackendRouter({"primary": "oracle"}).backends == {}


# --- SPARQL optimization ----------------------------------------------------


@pytest.fixture(scope="module")
def opt():
    return QueryOptimizer()


@pytest.fixture(scope="module")
def device_edges(spark):
    rows = []
    for i in range(3):
        rows.append(("default", "", f"{NS}dev{i}", RDF_TYPE, f"{NS}device",
                     "u", "", ""))
        if i < 2:  # one device without a label exercises OPTIONAL
            rows.append(("default", "", f"{NS}dev{i}", RDF_LABEL,
                         f"device {i}", "l", "", ""))
    df = spark.createDataFrame(rows, TRIPLES_DDL).cache()
    df.count()
    return df


def _retrieval_gen(subset):
    return generate_sparql(analyze_question("find all Device"), subset,
                           namespace=NS)


def test_optional_motion_keeps_results_and_validity(spark, opt, device_edges):
    from trustgraph_spark.sparql import sparql_select

    sub = {"classes": {"device": {}}}
    gen = _retrieval_gen(sub)
    hint = OptimizationHint(strategy=OptimizationStrategy.PERFORMANCE)
    out, plan = opt.optimize_sparql(gen, analyze_question("find all Device"),
                                    sub, hint)
    assert "Moved OPTIONAL clauses to end" in " ".join(plan.optimization_notes)
    assert "type_index" in plan.index_hints
    # the rewritten query still parses AND returns the same bindings —
    # the reference inserts the moved OPTIONAL outside the WHERE group,
    # which would fail right here
    before = {tuple(r) for r in sparql_select(device_edges, gen.query).collect()}
    after = {tuple(r) for r in sparql_select(device_edges, out.query).collect()}
    assert before == after and len(before) == 3


def test_limit_injection_and_execution(spark, opt, device_edges):
    from trustgraph_spark.sparql import sparql_select

    sub = {"classes": {"device": {}}}
    gen = _retrieval_gen(sub)
    hint = OptimizationHint(
        strategy=OptimizationStrategy.PERFORMANCE, max_results=2
    )
    out, plan = opt.optimize_sparql(gen, analyze_question("find all Device"),
                                    sub, hint)
    assert out.query.rstrip().endswith("LIMIT 2")
    assert sparql_select(device_edges, out.query).count() == 2
    # already-limited queries are left alone
    again, _ = opt.optimize_sparql(out, analyze_question("find all Device"),
                                   sub, hint)
    assert again.query.upper().count("LIMIT") == 1


def test_accuracy_distinct_and_type_constraint(spark, opt, device_edges):
    from trustgraph_spark.nlquery import GeneratedSPARQL
    from trustgraph_spark.sparql import sparql_select

    # a hand-written query with ?entity but no type constraint
    q = (
        f"PREFIX : <{NS}>\n"
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
        "SELECT ?entity WHERE {\n  ?entity ?p ?o .\n}"
    )
    gen = GeneratedSPARQL(q, ["entity"], "SELECT", "hand", 0.2)
    comp = analyze_question("find all Device")
    sub = {"classes": {"device": {}, "sensor": {}}}
    hint = OptimizationHint(strategy=OptimizationStrategy.ACCURACY)
    out, plan = opt.optimize_sparql(gen, comp, sub, hint)
    assert "?entity rdf:type :device ." in out.query
    assert "SELECT DISTINCT" in out.query
    # executes: only typed devices survive, deduped
    got = {r.entity for r in sparql_select(device_edges, out.query).collect()}
    assert got == {f"{NS}dev{i}" for i in range(3)}


def test_cost_model_monotonic(opt):
    simple = "SELECT ?s WHERE {\n ?s ?p ?o .\n}"
    complex_q = (
        "SELECT ?s WHERE {\n ?s ?p ?o .\n ?o ?q ?r .\n"
        " OPTIONAL { ?s ?x ?y }\n FILTER(?s > 1)\n}"
    )
    sub = {"classes": {}}
    assert opt.estimate_sparql_cost(complex_q, sub) > opt.estimate_sparql_cost(
        simple, sub
    )
    big_sub = {"classes": {f"c{i}": {} for i in range(50)}}
    assert opt.estimate_sparql_cost(simple, big_sub) > opt.estimate_sparql_cost(
        simple, sub
    )


def test_cache_policy_and_key(opt):
    hint = OptimizationHint(strategy=OptimizationStrategy.BALANCED)
    assert opt.should_use_cache("q", analyze_question("find all Device"), hint)
    assert opt.should_use_cache(
        "SELECT (COUNT(?x) AS ?c) ...", analyze_question("count the Devices"),
        hint,
    )
    assert not opt.should_use_cache(
        "q", analyze_question("compare A versus B better than C"), hint
    )
    assert not opt.should_use_cache(
        "q", analyze_question("find all Device"),
        OptimizationHint(strategy=OptimizationStrategy.BALANCED,
                         cache_results=False),
    )
    sub = {"classes": {"b": {}, "a": {}}, "object_properties": {"p": {}}}
    k1 = opt.get_cache_key("SELECT ?s WHERE { ?s ?p ?o }", sub)
    k2 = opt.get_cache_key("  SELECT ?s WHERE { ?s ?p ?o }  ", sub)
    assert k1 == k2 and len(k1) == 32  # strip-stable md5
    assert k1 != opt.get_cache_key("SELECT ?s WHERE { ?s ?p ?o }",
                                   {"classes": {"a": {}}})


# --- result cache -----------------------------------------------------------


def test_cache_ttl_eviction_stats():
    now = [0.0]
    c = QueryResultCache(max_size=2, default_ttl=10, clock=lambda: now[0])
    c.set("a", 1)
    c.set("b", 2)
    assert c.get("a") == 1  # touches 'a' -> 'b' becomes LRU
    c.set("c", 3)  # evicts 'b'
    assert c.get("b") is None
    assert c.get("c") == 3
    assert c.stats.evictions == 1
    now[0] = 11.0  # past TTL
    assert c.get("a") is None
    assert c.stats.hits == 2 and c.stats.misses == 2
    assert c.stats.hit_rate == 0.5
    c.set("d", 4, ttl_seconds=100)
    now[0] = 50.0
    assert c.get("d") == 4
    assert c.delete("d") and not c.delete("d")


# --- language detection -----------------------------------------------------


def test_language_detection_rules():
    assert detect_question_language("¿cuántos sensores hay y dónde están?")[0] == "es"
    lang, conf = detect_question_language("wann und wo war das, warum?")
    assert lang == "de" and conf == min(0.8, 3 / 3.0)
    assert detect_question_language("how many sensors are there") == ("en", 0.1)


def test_optimizer_wired_into_nl_graph_query(spark, device_edges):
    from trustgraph_spark.nlquery import nl_graph_query

    elements = spark.createDataFrame(
        [("kb", "class", "device", None, None, None, None, None, None)]
        + [("kb", "class", f"pad{i}", None, None, None, None, None, None)
           for i in range(4)],
        "ontology_id string, element_type string, element_id string, "
        "label string, comment string, subclass_of string, domain string, "
        "range string, inverse_of string",
    )
    out = nl_graph_query(
        device_edges, elements, "find all Device", namespace=NS,
        optimizer_hint=OptimizationHint(
            strategy=OptimizationStrategy.PERFORMANCE, max_results=2
        ),
    )
    plan = out["metadata"]["query_plan"]
    assert "Added LIMIT 2" in " ".join(plan.optimization_notes)
    assert out["result"].count() == 2


# --- query explanation ------------------------------------------------------


def _explain_inputs():
    from trustgraph_spark.nlquery import GeneratedSPARQL

    comp = analyze_question("find all Device")
    subsets = [{
        "ontology_id": "kb",
        "classes": {"device": {}, "sensor": {}},
        "object_properties": {"connects": {}},
        "datatype_properties": {},
    }]
    gen = GeneratedSPARQL("SELECT ?entity WHERE { ?entity ?p ?o }",
                          ["entity"], "SELECT", "tmpl", 0.3)
    rows = [{"entity": f"e{i}"} for i in range(7)]
    return comp, subsets, gen, rows


def test_explainer_detailed_steps_and_confidence():
    from trustgraph_spark.nlservice import QueryExplainer

    comp, subsets, gen, rows = _explain_inputs()
    exp = QueryExplainer().explain(
        "find all Device", comp, subsets, gen, rows,
        "The device are: ...", {"backend_used": "spark"},
    )
    assert len(exp.processing_steps) == 5
    assert [s.component for s in exp.processing_steps] == [
        "question_analyzer", "ontology_matcher", "query_generator",
        "query_executor", "answer_generator",
    ]
    assert "retrieval query about Device" in exp.processing_steps[0].explanation
    assert "found 3 relevant concepts" in exp.processing_steps[1].explanation
    assert "SELECT query using SPARQL" in exp.processing_steps[2].explanation
    # confidence: 0.8 base + 0.1 (results) + 0.05 (>5) + 0.05 (entities)
    # + 0.05 (success) capped at 1.0
    assert exp.confidence_score == 1.0
    assert exp.ontologies_used == ["kb"]
    # reasoning chain: entity + ontology + strategy + confidence
    assert any("'Device' as a key concept" in r for r in exp.reasoning_chain)
    assert any("'kb' ontology" in r for r in exp.reasoning_chain)
    assert any("retrieval query approach" in r for r in exp.reasoning_chain)
    assert exp.user_friendly_explanation.endswith("The answer is: The device are: ...")


def test_explainer_levels_and_formats():
    from trustgraph_spark.nlservice import QueryExplainer, format_explanation

    comp, subsets, gen, rows = _explain_inputs()
    basic = QueryExplainer({"explanation_level": "basic"}).explain(
        "find all Device", comp, subsets, gen, rows, "A", {}
    )
    assert basic.processing_steps[0].explanation == (
        "I analyzed your question to understand what you're asking."
    )
    tech = QueryExplainer({"explanation_level": "technical"}).explain(
        "find all Device", comp, subsets, gen, rows, "A", {}
    )
    assert "Type=retrieval" in tech.processing_steps[0].explanation
    assert "Selected 2 classes, 1 properties from kb" in (
        tech.processing_steps[1].explanation
    )

    md = format_explanation(basic, "markdown")
    assert md.startswith("## Query Explanation") and "### Reasoning:" in md
    txt = format_explanation(basic, "text")
    assert txt.startswith("Query Explanation:") and "Reasoning:" in txt
    html = format_explanation(basic, "html")
    assert html.startswith("<h2>") and "<ol>" in html and "</ul>" in html


def test_explainer_aggregation_boolean_summaries():
    from trustgraph_spark.nlquery import GeneratedSPARQL
    from trustgraph_spark.nlservice import QueryExplainer

    gen = GeneratedSPARQL("ASK { }", [], "ASK", "t", 0.2)
    agg = QueryExplainer().explain(
        "count the Devices", analyze_question("count the Devices"),
        [], gen, [], "There are 0 Devices.", {},
    )
    assert "counting or aggregation" in agg.user_friendly_explanation
    assert any("count or sum" in r for r in agg.reasoning_chain)
    bl = QueryExplainer().explain(
        "is Alice a Robot?", analyze_question("is Alice a Robot?"),
        [], gen, [], "No.", {},
    )
    assert "yes/no question" in bl.user_friendly_explanation
    assert any("boolean query approach" in r for r in bl.reasoning_chain)


def test_ask_query_exempt_from_limit_injection(spark, device_edges):
    """ASK takes no solution modifier; injecting LIMIT (as the reference
    does unconditionally) would make every boolean question unparseable —
    the optimizer must leave ASK untouched and the query must execute."""
    from trustgraph_spark.nlquery import analyze_question, generate_sparql
    from trustgraph_spark.sparql import sparql_select

    opt = QueryOptimizer()
    comp = analyze_question("is Widget a Gadget?")
    gen = generate_sparql(comp, {"classes": {}}, namespace=NS)
    assert gen.query_type == "ASK"
    out, plan = opt.optimize_sparql(
        gen, comp, {"classes": {}},
        OptimizationHint(strategy=OptimizationStrategy.PERFORMANCE,
                         max_results=5),
    )
    assert "LIMIT" not in out.query.upper()
    assert sparql_select(device_edges, out.query).collect()[0]["ask"] is False


# ---------------------------------------------------------------------------
# service composition: cache + monitor + orchestration (r4 verdict ask #8)
# ---------------------------------------------------------------------------


class TestCachedNlGraphQuery:
    @pytest.fixture()
    def kb(self, spark):
        from tests.test_nlquery import ELEMENTS_DDL, NS, TRIPLES_DDL

        rows = []
        for i in range(3):
            rows.append(("default", "", f"{NS}dev{i}", RDF_TYPE,
                         f"{NS}device", "u", "", ""))
            rows.append(("default", "", f"{NS}dev{i}", RDF_LABEL,
                         f"device {i}", "l", "", ""))
        edges = spark.createDataFrame(rows, TRIPLES_DDL)
        elements = spark.createDataFrame(
            [("kb", "class", "device", None, None, None, None, None, None)],
            ELEMENTS_DDL,
        )
        return edges, elements, NS

    def test_cache_hit_short_circuit_and_metrics(self, spark, kb):
        from trustgraph_spark.nlmonitor import (
            PerformanceMonitor,
            QueryPatternAnalyzer,
        )
        from trustgraph_spark.nlservice import (
            QueryResultCache,
            cached_nl_graph_query,
        )

        edges, elements, ns = kb
        monitor = PerformanceMonitor()
        analyzer = QueryPatternAnalyzer(monitor)
        cache = QueryResultCache(max_size=10)

        kwargs = dict(cache=cache, monitor=monitor,
                      pattern_analyzer=analyzer, namespace=ns)
        first = cached_nl_graph_query(
            edges, elements, "find all Device", **kwargs)
        assert first["result_count"] == 3

        # repeat: must short-circuit — same OBJECT back, no new execution
        second = cached_nl_graph_query(
            edges, elements, "find all Device", **kwargs)
        assert second is first

        # cache stats: one miss (first run) + one hit (repeat)
        assert cache.stats.hits == 1 and cache.stats.misses == 1
        mc = monitor.metrics_collector
        labels = {"cache_type": "query_results"}
        assert mc.get_counter("cache_hits_total", labels) == 1
        assert mc.get_counter("cache_misses_total", labels) == 1
        # exactly ONE request recorded (the miss) — the hit never reached
        # the engine
        req_labels = {"component": "nlquery", "operation": "nl_graph_query"}
        assert mc.get_counter("requests_total", req_labels) == 1
        assert mc.get_counter("requests_successful", req_labels) == 1
        # the pattern analyzer saw the one executed question
        assert len(analyzer.query_patterns["retrieval:1"]) == 1

    def test_distinct_questions_miss_separately(self, spark, kb):
        from trustgraph_spark.nlservice import (
            QueryResultCache,
            cached_nl_graph_query,
        )

        edges, elements, ns = kb
        cache = QueryResultCache(max_size=10)
        a = cached_nl_graph_query(edges, elements, "find all Device",
                                  cache=cache, namespace=ns)
        b = cached_nl_graph_query(edges, elements, "count Device entries",
                                  cache=cache, namespace=ns)
        assert a is not b
        assert cache.stats.misses == 2 and cache.stats.hits == 0

    def test_error_results_are_not_cached(self, spark, kb):
        from trustgraph_spark.nlservice import (
            QueryResultCache,
            cached_nl_graph_query,
        )

        edges, elements, ns = kb

        def broken(question, subset):
            raise RuntimeError("translator exploded")

        cache = QueryResultCache(max_size=10)
        # a question no template matches forces the translator seam, which
        # explodes -> nl_graph_query's shaped error result
        out = cached_nl_graph_query(
            edges, elements, "no template matches this sentence",
            cache=cache, namespace=ns, translator=broken)
        assert out["confidence"] == 0.0
        # shaped error was returned but NOT stored
        assert cache.stats.misses == 1
        assert len(cache._entries) == 0

    def test_differing_kwargs_do_not_share_cache_entries(self, spark, kb):
        # review fix: the key must cover value-typed kwargs, not just the
        # question — distinct namespaces/top_k must miss separately
        from trustgraph_spark.nlservice import (
            QueryResultCache,
            cached_nl_graph_query,
        )

        edges, elements, ns = kb
        cache = QueryResultCache(max_size=10)
        a = cached_nl_graph_query(edges, elements, "find all Device",
                                  cache=cache, namespace=ns)
        b = cached_nl_graph_query(edges, elements, "find all Device",
                                  cache=cache, namespace=ns,
                                  answer_rows_limit=7)
        assert a is not b
        assert cache.stats.misses == 2
        # same config repeats still hit
        c = cached_nl_graph_query(edges, elements, "find all Device",
                                  cache=cache, namespace=ns)
        assert c is a
