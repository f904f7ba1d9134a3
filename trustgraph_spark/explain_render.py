"""Explainability trace rendering — the deterministic kernel of the
``tg-show-explain-trace`` CLI (trustgraph-cli/cli/show_explain_trace.py).

String shaping over already-reconstructed traces (driver-side by
design, like the nlservice renderers): the text renderers mirror
print_graphrag_text (:167-250) and print_docrag_text (:252-300)
byte-for-byte including blank-line placement, numbering, the %.4f
score format and the '?' missing-score marker; ``trace_to_dict``
mirrors the JSON export (:408-532); ``format_provenance_chain`` and
``resolve_label`` mirror :159-164 and api/explainability.py:631-667.

Traces are plain dicts (the shape fetch_graphrag_trace returns, with
entities as dicts instead of dataclasses):
    {"question": {"uri", "query", "timestamp"},
     "grounding": {"uri", "concepts"} | None,
     "exploration": {"uri", "edge_count", "chunk_count"} | None,
     "focus": {"uri", "edge_selections": [
         {"edge": {"s","p","o"} | None, "concept", "score",
          "provenance": [ [ {"uri","label"}, ... ], ... ]}]} | None,
     "synthesis": {"uri", "document"} | None}
The store-query side (label resolution, edge->source chains) happens
set-oriented in operators/explain.py; content fetch stays a librarian
transport seam (the reference's fetch_document_content) — pass the
answer text via ``content``.
"""

from __future__ import annotations


def resolve_label(labels: dict, uri: str) -> str:
    """Label lookup with URI fallback; only http/https/urn subjects are
    resolvable (api/explainability.py:631-667)."""
    if not uri or not uri.startswith(("http://", "https://", "urn:")):
        return uri
    return labels.get(uri, uri)


def format_provenance_chain(chain: list[dict]) -> str:
    """' -> '-joined labels (show_explain_trace.py:159-164)."""
    if not chain:
        return ""
    return " -> ".join(
        item.get("label", item.get("uri", "?")) for item in chain)


def _answer_lines(out: list[str], synthesis: dict | None,
                  content: str | None) -> None:
    """The shared synthesis tail (:232-249 == :281-299)."""
    out.append("--- Synthesis ---")
    if synthesis:
        if content:
            out.append("Answer:")
            for line in content.split("\n"):
                out.append(f"  {line}")
        elif synthesis.get("document"):
            out.append(f"Document: {synthesis['document']}")
        else:
            out.append("No answer content found")
    else:
        out.append("No synthesis data found")


def render_graphrag_trace(
    trace: dict,
    labels: dict | None = None,
    content: str | None = None,
    show_provenance: bool = False,
) -> str:
    """print_graphrag_text (:167-250) as a returned string."""
    labels = labels or {}
    out: list[str] = []
    q = trace.get("question")
    out.append(
        f"=== GraphRAG Session: {q['uri'] if q else 'Unknown'} ===")
    out.append("")
    if q:
        out.append(f"Question: {q.get('query', '')}")
        if q.get("timestamp"):
            out.append(f"Time: {q['timestamp']}")
    out.append("")

    out.append("--- Exploration ---")
    exploration = trace.get("exploration")
    if exploration:
        out.append(
            f"Retrieved {exploration.get('edge_count', 0)} edges "
            "from knowledge graph")
    else:
        out.append("No exploration data found")
    out.append("")

    out.append("--- Focus (Edge Selection) ---")
    focus = trace.get("focus")
    if focus:
        edges = focus.get("edge_selections", [])
        out.append(f"Selected {len(edges)} edges:")
        out.append("")
        for i, sel in enumerate(edges, 1):
            edge = sel.get("edge")
            if edge:
                s_l = resolve_label(labels, edge.get("s", ""))
                p_l = resolve_label(labels, edge.get("p", ""))
                o_l = resolve_label(labels, edge.get("o", ""))
                out.append(f"  {i}. ({s_l}, {p_l}, {o_l})")
            score = sel.get("score")
            if sel.get("concept") or score is not None:
                score_str = f"{score:.4f}" if score is not None else "?"
                out.append(
                    f"     Concept: {sel.get('concept', '')}  "
                    f"Score: {score_str}")
            if show_provenance and edge:
                for chain in sel.get("provenance", []):
                    chain_str = format_provenance_chain(chain)
                    if chain_str:
                        out.append(f"     Source: {chain_str}")
                        for item in chain:
                            uri = item.get("uri", "")
                            if uri.startswith("urn:chunk:"):
                                out.append(f"     Content: {uri}")
                                break
            out.append("")
    else:
        out.append("No focus data found")
        out.append("")

    _answer_lines(out, trace.get("synthesis"), content)
    return "\n".join(out)


def render_docrag_trace(trace: dict, content: str | None = None) -> str:
    """print_docrag_text (:252-300) as a returned string."""
    out: list[str] = []
    q = trace.get("question")
    out.append(f"=== DocRAG Session: {q['uri'] if q else 'Unknown'} ===")
    out.append("")
    if q:
        out.append(f"Question: {q.get('query', '')}")
        if q.get("timestamp"):
            out.append(f"Time: {q['timestamp']}")
    out.append("")

    grounding = trace.get("grounding")
    if grounding:
        out.append("--- Grounding ---")
        out.append(f"Concepts: {', '.join(grounding.get('concepts', []))}")
        out.append("")

    out.append("--- Exploration ---")
    exploration = trace.get("exploration")
    if exploration:
        out.append(
            f"Retrieved {exploration.get('chunk_count', 0)} chunks "
            "from document store")
    else:
        out.append("No exploration data found")
    out.append("")

    _answer_lines(out, trace.get("synthesis"), content)
    return "\n".join(out)


_AGENT_STEP_FIELDS = {
    "decomposition": ("goals",),
    "finding": ("goal", "document"),
    "plan": ("steps",),
    "step-result": ("step", "document"),
    "observation": ("document",),
    "analysis": ("action", "arguments", "thought"),
    "synthesis": ("document",),
    "conclusion": ("document",),
}


def trace_to_dict(trace: dict, trace_type: str) -> dict:
    """JSON-serializable trace export (:408-532), dispatching on the
    entity-type strings the Spark reconstruction produces instead of
    the reference's dataclass isinstance checks."""
    q = trace.get("question")
    if trace_type == "agent":
        steps = []
        for step in trace.get("steps", []):
            et = step.get("entity_type", "")
            fields = _AGENT_STEP_FIELDS.get(et)
            d = {"type": et, "id": step.get("uri")}
            if fields:
                for f in fields:
                    d[f] = step.get(f)
            steps.append(d)
        return {
            "type": "agent",
            "session_id": q["uri"] if q else None,
            "question": q.get("query") if q else None,
            "time": q.get("timestamp") if q else None,
            "steps": steps,
        }
    if trace_type == "docrag":
        grounding = trace.get("grounding")
        exploration = trace.get("exploration")
        synthesis = trace.get("synthesis")
        return {
            "type": "docrag",
            "question_id": q["uri"] if q else None,
            "question": q.get("query") if q else None,
            "time": q.get("timestamp") if q else None,
            "grounding": {
                "id": grounding["uri"],
                "concepts": grounding.get("concepts", []),
            } if grounding else None,
            "exploration": {
                "id": exploration["uri"],
                "chunk_count": exploration.get("chunk_count", 0),
            } if exploration else None,
            "synthesis": {
                "id": synthesis["uri"],
                "document": synthesis.get("document", ""),
            } if synthesis else None,
        }
    exploration = trace.get("exploration")
    focus = trace.get("focus")
    synthesis = trace.get("synthesis")
    return {
        "type": "graphrag",
        "question_id": q["uri"] if q else None,
        "question": q.get("query") if q else None,
        "time": q.get("timestamp") if q else None,
        "exploration": {
            "id": exploration["uri"],
            "edge_count": exploration.get("edge_count", 0),
        } if exploration else None,
        "focus": {
            "id": focus["uri"],
            "selected_edges": [
                {
                    "edge": sel.get("edge"),
                    "concept": sel.get("concept", ""),
                    "score": sel.get("score"),
                }
                for sel in focus.get("edge_selections", [])
            ],
        } if focus else None,
        "synthesis": {
            "id": synthesis["uri"],
            "document": synthesis.get("document", ""),
        } if synthesis else None,
    }


def trace_row_to_dict(row, edge_selections: list | None = None) -> dict:
    """Adapter: one rag_traces() Row (+ its edge_selections rows) ->
    the trace-dict shape the renderers take."""
    r = row.asDict() if hasattr(row, "asDict") else dict(row)

    def ent(uri_key, **fields):
        if r.get(uri_key) is None:
            return None
        return {"uri": r[uri_key], **fields}

    sels = []
    for s in edge_selections or []:
        d = s.asDict() if hasattr(s, "asDict") else dict(s)
        edge = d.get("edge")
        if edge is not None and hasattr(edge, "asDict"):
            edge = edge.asDict()
        sels.append({"edge": edge, "concept": d.get("concept", ""),
                     "score": d.get("score"),
                     "provenance": d.get("provenance", [])})
    return {
        "question": {"uri": r["question_uri"],
                     "query": r.get("query", ""),
                     "timestamp": r.get("timestamp", "")},
        "grounding": ent("grounding_uri",
                         concepts=list(r.get("grounding_concepts") or [])),
        "exploration": ent(
            "exploration_uri",
            edge_count=r.get("exploration_edge_count") or 0,
            chunk_count=r.get("exploration_chunk_count") or 0),
        "focus": ent("focus_uri", edge_selections=sels),
        "synthesis": ent("synthesis_uri",
                         document=r.get("synthesis_document") or ""),
    }


# ---------------------------------------------------------------------------
# Extraction hierarchy display (cli/show_extraction_provenance.py:233-305)
# ---------------------------------------------------------------------------

def hierarchy_to_tree(rows: list[dict]) -> dict | None:
    """Reassemble ``extraction_hierarchy`` flat rows into the nested
    build_hierarchy node shape (show_extraction_provenance.py:187-230):
    {"uri", "type", "metadata": {"uri" [, "label"/"title"/"format"]},
    "children": [...], "edges": [...]}, children sorted by uri (:228).
    Edges keep the decoded ``<<s p o>>`` statement string the operator
    emits. Returns None when rows is empty (the CLI's no-data arm,
    :387-389). Bounded display pool — driver-side by design, like every
    renderer in this module."""
    nodes: dict[str, dict] = {}
    root = None
    for r in rows:
        if r["node_type"] == "edge":
            continue
        meta = {"uri": r["node_uri"]}
        for src_key, dst_key in (("label", "label"), ("title", "title"),
                                 ("fmt", "format")):
            if r.get(src_key) is not None:
                meta[dst_key] = r[src_key]
        node = {"uri": r["node_uri"], "type": r["node_type"],
                "metadata": meta, "children": [], "edges": []}
        nodes[r["node_uri"]] = node
        if r.get("parent_uri") is None:
            root = node
    for r in rows:
        parent = nodes.get(r.get("parent_uri") or "")
        if parent is None:
            continue
        if r["node_type"] == "edge":
            parent["edges"].append(r["node_uri"])
        else:
            parent["children"].append(nodes[r["node_uri"]])
    for node in nodes.values():
        node["children"].sort(key=lambda x: x["uri"])
        node["edges"].sort()
    return root


def render_extraction_tree(node: dict | None) -> str:
    """print_tree (show_extraction_provenance.py:249-300): the root
    prints ``{Type}: {uri}`` plus indented ``Title:`` / ``Type:``
    metadata lines; every descendant prints
    ``{prefix}{connector}{Type}: {label}`` with the
    label-title-then-URI-tail fallback (:259), box-drawing connectors
    and continuations, and each node's edges listed before its child
    subtrees sharing one last-item budget (:284-300). Divergence: edges
    display as the repo's standard decoded ``<<s p o>>`` statement
    rather than format_edge's lossy paren-short form (:233-246) — the
    flat contract carries the whole statement as one string."""
    if node is None:
        return "No data found"
    out: list[str] = []

    def label_of(n: dict) -> str:
        md = n["metadata"]
        return md.get("label") or md.get("title") or \
            n["uri"].split("/")[-1]

    def walk(n: dict, prefix: str, is_last: bool) -> None:
        if prefix:
            connector = "└── " if is_last \
                else "├── "
            out.append(f"{prefix}{connector}{n['type'].capitalize()}: "
                       f"{label_of(n)}")
            new_prefix = prefix + ("    " if is_last else "│   ")
        else:
            out.append(f"{n['type'].capitalize()}: {n['uri']}")
            md = n["metadata"]
            if md.get("title"):
                out.append(f"  Title: \"{md['title']}\"")
            if md.get("format"):
                out.append(f"  Type: {md['format']}")
            new_prefix = "  "
        total = len(n["edges"]) + len(n["children"])
        for i, edge in enumerate(n["edges"]):
            conn = "└── " if i + 1 == total \
                else "├── "
            out.append(f"{new_prefix}{conn}Edge: {edge}")
        for i, child in enumerate(n["children"]):
            walk(child, new_prefix, i == len(n["children"]) - 1)

    walk(node, "", True)
    return "\n".join(out)
