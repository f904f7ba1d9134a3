"""Well-known URIs and storage codes.

The output graph must reproduce these byte-for-byte
(reference: trustgraph-base/trustgraph/rdf.py:2-6,
trustgraph-base/trustgraph/provenance/namespaces.py:145-146,
trustgraph-flow/trustgraph/direct/cassandra_kg.py:22).
"""

# Entity URI namespace (reference: rdf.py TRUSTGRAPH_ENTITIES)
TRUSTGRAPH_ENTITIES = "http://trustgraph.ai/e/"

# Predicates
RDF_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
DEFINITION = "http://www.w3.org/2004/02/skos/core#definition"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# Named graphs (reference: provenance/namespaces.py:145-146)
GRAPH_SOURCE = "urn:graph:source"
GRAPH_RETRIEVAL = "urn:graph:retrieval"

# Default graph stored as "" (reference: direct/cassandra_kg.py:22)
DEFAULT_GRAPH = ""

# Object-type storage codes
# (reference: storage/triples/cassandra/write.py:73-92 get_term_otype)
OTYPE_URI = "u"       # IRI and blank nodes
OTYPE_LITERAL = "l"
OTYPE_TRIPLE = "t"    # RDF-star quoted triple, serialized to JSON

# PROV-O / trustgraph provenance vocabulary
# (reference: provenance/namespaces.py:8-16, :43-56, :88)
PROV = "http://www.w3.org/ns/prov#"
PROV_ENTITY = PROV + "Entity"
PROV_ACTIVITY = PROV + "Activity"
PROV_AGENT = PROV + "Agent"
PROV_WAS_DERIVED_FROM = PROV + "wasDerivedFrom"
PROV_WAS_GENERATED_BY = PROV + "wasGeneratedBy"
PROV_USED = PROV + "used"
PROV_WAS_ASSOCIATED_WITH = PROV + "wasAssociatedWith"
PROV_STARTED_AT_TIME = PROV + "startedAtTime"
TG = "https://trustgraph.ai/ns/"
TG_SUBGRAPH_TYPE = TG + "Subgraph"
TG_CONTAINS = TG + "contains"
TG_COMPONENT_VERSION = TG + "componentVersion"
TG_LLM_MODEL = TG + "llmModel"
TG_ONTOLOGY = TG + "ontology"
TRUSTGRAPH_BASE = "https://trustgraph.ai"

# Default tenant scope used throughout tests
DEFAULT_COLLECTION = "default"
