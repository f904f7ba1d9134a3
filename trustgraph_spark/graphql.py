"""GraphQL query surface over the structured rows store.

The reference (query/graphql/{schema,types,filters}.py + the resolver
embedded in query/rows/cassandra/service.py:execute_graphql_query) builds
a strawberry GraphQL schema dynamically from RowSchema definitions: every
schema becomes a root query field taking ``where`` (per-field filter
objects with eq/gt/gte/lt/lte/in/not/contains/startsWith/endsWith/not_in
operators), ``order_by``, ``direction`` and ``limit``, resolving through
the same rows-store query path.

This module reproduces that surface without the strawberry dependency
(not in this container): a hand-written tokenizer + recursive-descent
parser for the GraphQL query-document subset the dynamic schema exposes,
and a compiler from the parsed document to ``operators.rows.rows_query``
DataFrame plans.  The where-clause flattening follows
filters.py parse_where_clause exactly: ``{f: {eq: v}}`` -> ``{f: v}``,
``{f: {gt: v}}`` -> ``{f_gt: v}``, ``in``/``not`` -> ``f_in``/``f_not``,
etc.  Output columns are cast to the schema's declared GraphQL types
(integer -> long, float -> double, boolean -> boolean, everything else
string — schema.py _get_python_type).

Like the reference, one executed document can select several root
fields; the result is {field_alias: DataFrame}.  Variables ($x) are
substituted from the ``variables`` dict (service.py passes
variable_values through to strawberry's execute).

Fragment spreads and inline fragments are accepted inside a field's
selection set, as the strawberry layer accepts them: ``fragment F on
Product { sku }`` + ``{ product { ...F } }``, and ``... on Product {
sku }``.  Fragments may be defined anywhere in the document, nest into
other fragments, and expand with GraphQL field merging
(first-occurrence order, duplicates collapsed); type conditions must
match the enclosing root field's schema, unknown/unused/cyclic
fragments are errors (graphql-core validation behavior).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.rows import rows_query


class GraphQLError(ValueError):
    pass


# --- where-clause flattening (filters.py parse_where_clause) ---------------

#: operator key inside a filter object -> rows_query filter-key suffix
_OP_KEYS = {
    "eq": "",
    "gt": "_gt",
    "gte": "_gte",
    "lt": "_lt",
    "lte": "_lte",
    "in": "_in",
    "not": "_not",
    "not_in": "_not_in",
    "contains": "_contains",
    "startsWith": "_startsWith",
    "endsWith": "_endsWith",
}


def flatten_where(where: dict | None) -> dict:
    """{field: {op: value}} -> the rows_query flat filter dict
    (filters.py:47-106): eq maps to the bare field name, every other
    operator to ``field_op``."""
    if not where:
        return {}
    out = {}
    for fname, ops in where.items():
        if ops is None:
            continue
        if not isinstance(ops, dict):
            raise GraphQLError(
                f"where.{fname} must be a filter object, got {ops!r}"
            )
        for op, value in ops.items():
            if value is None:
                continue
            if op not in _OP_KEYS:
                raise GraphQLError(f"unknown filter operator {op!r}")
            out[f"{fname}{_OP_KEYS[op]}"] = value
    return out


# --- tokenizer --------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[\s,]+|\#[^\n]*)
  | (?P<str>"(?:\\.|[^"\\])*")
  | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
  | (?P<var>\$[_A-Za-z][_0-9A-Za-z]*)
  | (?P<spread>\.\.\.)
  | (?P<punct>[{}()\[\]:!=])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise GraphQLError(f"lex error at {src[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    toks.append(("eof", ""))
    return toks


# --- parser -----------------------------------------------------------------


@dataclass
class Selection:
    """One root field: product(where: {...}, limit: 10) { sku name }"""

    name: str
    alias: str
    args: dict = field(default_factory=dict)
    fields: list = field(default_factory=list)


@dataclass
class _FragmentSpread:
    """...name inside a field selection set (resolved after parsing so
    fragments may be defined anywhere in the document)."""

    name: str


@dataclass
class _InlineFragment:
    """... on Type { fields } — items may nest further spreads."""

    on_type: str | None
    items: list


@dataclass
class GqlQuery:
    selections: list


class _Parser:
    def __init__(self, src: str, variables: dict | None = None):
        self.toks = _tokenize(src)
        self.pos = 0
        self.vars = variables or {}

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, text: str):
        kind, val = self.next()
        if val != text:
            raise GraphQLError(f"expected {text!r}, got {val!r}")

    def parse(self) -> GqlQuery:
        # executable document: one query operation + any number of
        # fragment definitions, in any order (the strawberry layer accepts
        # fragment spreads — graphql-core ExecutableDefinitions)
        self.fragments: dict[str, tuple[str | None, list]] = {}
        sels = None
        while self.peek()[0] != "eof":
            kind, val = self.peek()
            if kind == "name" and val == "fragment":
                self._fragment_definition()
            elif (kind == "name" and val in ("query", "mutation", "subscription")) or val == "{":
                if sels is not None:
                    raise GraphQLError("multiple operations not supported")
                sels = self._operation()
            else:
                raise GraphQLError(f"unexpected token {val!r} at top level")
        if sels is None:
            raise GraphQLError("document contains no query operation")
        used: set[str] = set()
        for sel in sels:
            sel.fields = self._expand_fields(sel.fields, sel.name, used, ())
        # graphql-core validation: defined-but-unused fragments are errors
        unused = sorted(set(self.fragments) - used)
        if unused:
            raise GraphQLError(f"fragment(s) never used: {unused}")
        return GqlQuery(sels)

    def _operation(self) -> list:
        kind, val = self.peek()
        # optional 'query [Name] [(vardefs)]' header
        if kind == "name" and val in ("query", "mutation", "subscription"):
            if val != "query":
                raise GraphQLError(f"{val} operations are not supported")
            self.next()
            if self.peek()[0] == "name":
                self.next()  # operation name
            if self.peek()[1] == "(":
                # variable definitions: ($x: Int, ...) — types are ignored,
                # values come from the variables dict
                self.next()
                while self.peek()[1] != ")":
                    self.next()
                self.next()
        return self._selection_set()

    def _fragment_definition(self):
        """fragment Name on Type { field selections }"""
        self.next()  # 'fragment'
        kind, name = self.next()
        if kind != "name" or name == "on":
            raise GraphQLError(f"bad fragment name {name!r}")
        if name in self.fragments:
            raise GraphQLError(f"duplicate fragment {name!r}")
        self.expect("on")
        kind2, on_type = self.next()
        if kind2 != "name":
            raise GraphQLError(f"bad fragment type condition {on_type!r}")
        items = self._field_items()
        self.fragments[name] = (on_type, items)

    def _selection_set(self) -> list:
        """The ROOT selection set: each field names a row schema and must
        carry its own (flat) selection set.  Deeper sets parse through
        _field_items — one nesting level is the dynamic row schema's
        whole shape."""
        self.expect("{")
        sels = []
        while self.peek()[1] != "}":
            kind, val = self.next()
            if kind == "spread":
                # root-level spreads would select whole root fields;
                # the dynamic row schema has no use for them
                raise GraphQLError(
                    "fragment spreads are not supported at the root; "
                    "spread them inside a field's selection set"
                )
            if kind != "name":
                raise GraphQLError(f"expected field name, got {val!r}")
            alias = name = val
            if self.peek()[1] == ":":
                self.next()
                kind2, val2 = self.next()
                if kind2 != "name":
                    raise GraphQLError(f"expected field after alias {val!r}")
                name = val2
            args = {}
            if self.peek()[1] == "(":
                args = self._arguments()
            if self.peek()[1] != "{":
                raise GraphQLError(f"root field {name!r} needs a selection set")
            fields = self._field_items()
            sels.append(Selection(name=name, alias=alias, args=args, fields=fields))
        self.next()  # consume }
        return sels

    def _field_items(self) -> list:
        """A field-level selection set: column names, ...spreads, and
        inline fragments (... on Type { ... })."""
        self.expect("{")
        items: list = []
        while self.peek()[1] != "}":
            kind, val = self.next()
            if kind == "spread":
                k2, v2 = self.next()
                if k2 == "name" and v2 == "on":
                    k3, on_type = self.next()
                    if k3 != "name":
                        raise GraphQLError(
                            f"bad inline-fragment type {on_type!r}"
                        )
                    items.append(_InlineFragment(on_type, self._field_items()))
                elif k2 == "name":
                    items.append(_FragmentSpread(v2))
                else:
                    raise GraphQLError(f"expected fragment name, got {v2!r}")
            elif kind == "name":
                items.append(val)
            else:
                raise GraphQLError(f"expected field name, got {val!r}")
        self.next()  # consume }
        return items

    def _expand_fields(
        self, items: list, schema_name: str, used: set, stack: tuple
    ) -> list:
        """Resolve spreads/inline fragments to a flat field-name list —
        first-occurrence order with duplicate merge (GraphQL field
        merging).  Type conditions must match the root field's schema
        (case-insensitive — the dynamic schema derives its type names
        from the RowSchema name), as strawberry's validation enforces."""
        out: list[str] = []

        def add(name: str):
            if name not in out:
                out.append(name)

        def check_type(on_type: str | None, what: str):
            if on_type is not None and on_type.lower() != schema_name.lower():
                raise GraphQLError(
                    f"{what} on type {on_type!r} cannot be spread in the "
                    f"{schema_name!r} selection"
                )

        def walk(its: list, stack: tuple):
            for it in its:
                if isinstance(it, str):
                    add(it)
                elif isinstance(it, _InlineFragment):
                    check_type(it.on_type, "inline fragment")
                    walk(it.items, stack)
                elif isinstance(it, _FragmentSpread):
                    if it.name not in self.fragments:
                        raise GraphQLError(f"unknown fragment {it.name!r}")
                    if it.name in stack:
                        raise GraphQLError(
                            f"fragment cycle: {' -> '.join(stack + (it.name,))}"
                        )
                    used.add(it.name)
                    on_type, body = self.fragments[it.name]
                    check_type(on_type, f"fragment {it.name!r}")
                    walk(body, stack + (it.name,))
                else:  # pragma: no cover - parser emits only the above
                    raise GraphQLError(f"bad selection item {it!r}")

        walk(items, stack)
        return out

    def _arguments(self) -> dict:
        self.expect("(")
        args = {}
        while self.peek()[1] != ")":
            kind, key = self.next()
            if kind != "name":
                raise GraphQLError(f"expected argument name, got {key!r}")
            self.expect(":")
            args[key] = self._value()
        self.next()
        return args

    def _value(self):
        kind, val = self.next()
        if kind == "str":
            body = val[1:-1]

            def _unescape(m):
                # GraphQL spec EscapedUnicode (\uXXXX) + EscapedCharacter
                if m.group(1) is not None:
                    return chr(int(m.group(1), 16))
                c = m.group(2)
                return {"n": "\n", "t": "\t", "r": "\r", "b": "\b",
                        "f": "\f", "/": "/", '"': '"', "\\": "\\"}.get(
                    c, "\\" + c
                )

            out = re.sub(r"\\u([0-9A-Fa-f]{4})|\\(.)", _unescape, body)
            if any("\ud800" <= ch <= "\udfff" for ch in out):
                # \uXXXX surrogate-pair escapes decode to lone surrogate
                # code points; recombine them into supplementary chars
                # (GraphQL spec: a pair of EscapedUnicode surrogates)
                out = out.encode("utf-16", "surrogatepass").decode("utf-16")
            return out
        if kind == "num":
            return float(val) if ("." in val or "e" in val.lower()) else int(val)
        if kind == "var":
            name = val[1:]
            if name not in self.vars:
                raise GraphQLError(f"undefined variable ${name}")
            return self.vars[name]
        if kind == "name":
            if val == "true":
                return True
            if val == "false":
                return False
            if val == "null":
                return None
            return val  # enum value (ASC / DESC)
        if val == "{":
            obj = {}
            while self.peek()[1] != "}":
                k_kind, k = self.next()
                if k_kind != "name":
                    raise GraphQLError(f"expected object key, got {k!r}")
                self.expect(":")
                obj[k] = self._value()
            self.next()
            return obj
        if val == "[":
            arr = []
            while self.peek()[1] != "]":
                arr.append(self._value())
            self.next()
            return arr
        raise GraphQLError(f"unexpected value token {val!r}")


def parse_graphql(src: str, variables: dict | None = None) -> GqlQuery:
    """Parse a GraphQL query document (the dynamic-row-schema subset:
    root fields with where/order_by/direction/limit arguments and flat
    selection sets).  Variables are substituted at parse time."""
    return _Parser(src, variables).parse()


# --- compiler ---------------------------------------------------------------

_CAST = {"integer": "long", "float": "double", "boolean": "boolean"}


def graphql_rows_query(
    store: DataFrame,
    schemas: dict[str, list[dict]],
    query: str,
    variables: dict | None = None,
    collection: str = "default",
) -> dict[str, DataFrame]:
    """Execute a GraphQL query document against the rows store: each root
    field must name a registered RowSchema (schema.py registers one query
    field per schema); its arguments compile to a rows_query plan and the
    selection set prunes the output columns, cast to the schema's declared
    types.  Returns {field alias: DataFrame} — the GraphQL ``data``
    object with DataFrames as the list values."""
    doc = parse_graphql(query, variables)
    out: dict[str, DataFrame] = {}
    for sel in doc.selections:
        if sel.name not in schemas:
            raise GraphQLError(
                f"unknown query field {sel.name!r}; known: {sorted(schemas)}"
            )
        fields = schemas[sel.name]
        known = {f["name"] for f in fields}
        unknown = [f for f in sel.fields if f not in known]
        if unknown:
            raise GraphQLError(
                f"unknown fields on {sel.name}: {unknown}; known: {sorted(known)}"
            )
        where = sel.args.get("where")
        if where is not None and not isinstance(where, dict):
            raise GraphQLError("where must be an object")
        direction = sel.args.get("direction", "ASC")
        if isinstance(direction, str):
            direction = direction.lower()
        if direction not in ("asc", "desc"):
            raise GraphQLError(f"bad direction {direction!r}")
        order_by = sel.args.get("order_by")
        if order_by is not None and order_by not in known:
            raise GraphQLError(f"order_by names unknown field {order_by!r}")
        limit = sel.args.get("limit", 100)
        if limit is not None:
            # variables arrive stringified through the transport
            # (structured_query / the reference's Map(String) schema);
            # strawberry coerces Int variables — coerce here too, but
            # REJECT non-integral values per GraphQL Int coercion
            # (strawberry errors on limit: 2.9 / true, never truncates)
            if isinstance(limit, bool) or (
                isinstance(limit, float) and not limit.is_integer()
            ):
                raise GraphQLError(f"limit must be an integer, got {limit!r}")
            try:
                limit = int(limit)
            except (TypeError, ValueError):
                raise GraphQLError(f"limit must be an integer, got {limit!r}")

        rq = rows_query(
            store,
            fields,
            sel.name,
            flatten_where(where),
            collection=collection,
            limit=limit,
            order_by=order_by,
            direction=direction,
        )
        types = {f["name"]: f.get("type", "string") for f in fields}
        cols = []
        for fname in sel.fields:
            c = F.col(fname)
            t = _CAST.get(types.get(fname, "string"))
            if t:
                c = c.try_cast(t)
            cols.append(c.alias(fname))
        out[sel.alias] = rq.select(*cols)
    return out


def structured_query(
    store: DataFrame,
    schemas: dict[str, list[dict]],
    question: str,
    translator,
    collection: str = "default",
) -> dict:
    """The structured-query orchestration (retrieval/structured_query/
    service.py:72-141): natural-language question -> GraphQL via a
    pluggable question-to-GraphQL ``translator`` (the nlp_query LLM
    boundary — retrieval/nlp_query's two-pass prompts; the translator
    returns (graphql_query, variables)) -> execution against the rows
    store -> {"data": {field: DataFrame}, "errors": [...]}.

    Mirrors the reference's error shaping: an empty translated query
    raises (service.py:95-96); GraphQL execution errors are collected
    into the errors list with data=None (service.py:128-141); variables
    are stringified as the transport does (service.py:105-111)."""
    gql, variables = translator(question)
    if not gql:
        raise ValueError("NLP query service returned empty GraphQL query")
    vars_str = {
        k: v if isinstance(v, str) else str(v)
        for k, v in (variables or {}).items()
    }
    try:
        data = graphql_rows_query(
            store, schemas, gql, vars_str, collection=collection
        )
        return {"data": data, "errors": []}
    except GraphQLError as e:
        return {"data": None, "errors": [str(e)]}
