"""Prompt templating — the reference's template service kernel
(trustgraph-flow/trustgraph/template/prompt_manager.py:1-215: ibis
templates + config-dict prompt registry + fenced-JSON/JSONL response
parsing + jsonschema validation; strict-mode schema gate from
trustgraph-base/trustgraph/base/schema_compatibility.py:7-90).

The reference renders with the public `ibis` template engine (Django
/ Jinja-style ``{{ expr }}`` / ``{% tag %}`` syntax).  That package is
not in this image, so the practical subset its stock prompts and unit
tests exercise is implemented here from the published syntax: print
tags with dotted lookups, ``{% if / elif / else %}`` with truthiness,
``not``, comparisons and ``and`` / ``or``, ``{% for x in seq %}`` with
an optional ``{% empty %}`` clause, and ``{# comments #}``.  Undefined
variables are falsey and print as the empty string; rendering is a
single pass (a term whose value contains ``{{ ... }}`` stays literal —
the reference's infinite-loop-protection test shape).

Spark-first twist: :func:`compile_template` lowers the same AST to a
native Catalyst ``Column`` — prints become ``CAST``/``coalesce``,
loops become ``transform`` + ``array_join``, conditionals become
``CASE WHEN`` — so assembling a prompt for every chunk of a 100 TB
corpus is one codegen'd projection with zero Python in the hot path.
The driver-side :class:`PromptManager` (per-request, like the
reference service) and the corpus-scale column renderer share one
parser, so they cannot drift.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TemplateError(ValueError):
    """Raised for template syntax errors (parse time)."""


class TemplateCompileError(ValueError):
    """Raised when a template uses a construct the native column
    compiler cannot express (caller falls back to the Python engine)."""


# ---------------------------------------------------------------------------
# Parsing: template source -> AST
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"(\{\{.*?\}\}|\{%.*?%\}|\{#.*?#\})", re.DOTALL)

# expression grammar: or_expr ( 'or' ... ); and_expr; not_expr; cmp; atom
_CMP_OPS = ("==", "!=", "<=", ">=", "<", ">", "in")

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)*$")
_NUM_RE = re.compile(r"^-?[0-9]+(?:\.[0-9]+)?$")


@dataclass
class Path:
    parts: tuple


@dataclass
class Lit:
    value: object


@dataclass
class Not:
    operand: object


@dataclass
class Cmp:
    op: str
    left: object
    right: object


@dataclass
class BoolOp:
    op: str          # "and" | "or"
    operands: list


@dataclass
class Text:
    text: str


@dataclass
class Print:
    expr: object


@dataclass
class For:
    var: str
    seq: object
    body: list
    empty: list = field(default_factory=list)


@dataclass
class If:
    branches: list               # [(cond, body), ...]
    orelse: list = field(default_factory=list)


def _parse_atom(tok: str):
    if tok.startswith(("'", '"')) and tok.endswith(tok[0]) and len(tok) >= 2:
        return Lit(tok[1:-1])
    if tok in ("true", "True"):
        return Lit(True)
    if tok in ("false", "False"):
        return Lit(False)
    if _NUM_RE.match(tok):
        return Lit(float(tok) if "." in tok else int(tok))
    if _NAME_RE.match(tok):
        return Path(tuple(tok.split(".")))
    raise TemplateError(f"bad expression token {tok!r}")


def _split_quoted(expr: str) -> list[str]:
    """Whitespace-split that keeps quoted strings intact."""
    toks, i, n = [], 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
            continue
        if c in "'\"":
            j = expr.find(c, i + 1)
            if j < 0:
                raise TemplateError(f"unterminated string in {expr!r}")
            toks.append(expr[i:j + 1])
            i = j + 1
            continue
        j = i
        while j < n and not expr[j].isspace():
            j += 1
        word = expr[i:j]
        # split comparison operators glued to operands: a==b
        for op in ("==", "!=", "<=", ">="):
            if op in word and word not in _CMP_OPS:
                a, _, b = word.partition(op)
                for piece in (a, op, b):
                    if piece:
                        toks.append(piece)
                break
        else:
            toks.append(word)
        i = j
    return toks


def _parse_expr(expr: str):
    toks = _split_quoted(expr.strip())
    if not toks:
        raise TemplateError("empty expression")
    if "|" in expr:
        raise TemplateError("filters are outside the supported subset")

    def parse_or(pos):
        node, pos = parse_and(pos)
        ops = [node]
        while pos < len(toks) and toks[pos] == "or":
            nxt, pos = parse_and(pos + 1)
            ops.append(nxt)
        return (BoolOp("or", ops) if len(ops) > 1 else node), pos

    def parse_and(pos):
        node, pos = parse_not(pos)
        ops = [node]
        while pos < len(toks) and toks[pos] == "and":
            nxt, pos = parse_not(pos + 1)
            ops.append(nxt)
        return (BoolOp("and", ops) if len(ops) > 1 else node), pos

    def parse_not(pos):
        if pos < len(toks) and toks[pos] == "not":
            node, pos = parse_not(pos + 1)
            return Not(node), pos
        return parse_cmp(pos)

    def parse_cmp(pos):
        if pos >= len(toks):
            raise TemplateError(f"truncated expression {expr!r}")
        left = _parse_atom(toks[pos])
        pos += 1
        if pos < len(toks) and toks[pos] in _CMP_OPS:
            op = toks[pos]
            if pos + 1 >= len(toks):
                raise TemplateError(f"truncated comparison {expr!r}")
            right = _parse_atom(toks[pos + 1])
            return Cmp(op, left, right), pos + 2
        return left, pos

    node, pos = parse_or(0)
    if pos != len(toks):
        raise TemplateError(f"trailing tokens in expression {expr!r}")
    return node


def parse_template(src: str) -> list:
    """Template source -> AST node list.  Raises TemplateError."""
    chunks = _TAG_RE.split(src or "")
    # token stream of (kind, payload)
    stream = []
    for chunk in chunks:
        if not chunk:
            continue
        if chunk.startswith("{{"):
            stream.append(("print", chunk[2:-2].strip()))
        elif chunk.startswith("{%"):
            stream.append(("tag", chunk[2:-2].strip()))
        elif chunk.startswith("{#"):
            continue
        else:
            stream.append(("text", chunk))

    pos = 0

    def parse_block(terminators: tuple) -> tuple[list, str]:
        nonlocal pos
        body = []
        while pos < len(stream):
            kind, payload = stream[pos]
            if kind == "text":
                body.append(Text(payload))
                pos += 1
            elif kind == "print":
                body.append(Print(_parse_expr(payload)))
                pos += 1
            else:
                word = payload.split(None, 1)[0] if payload else ""
                if word in terminators:
                    return body, payload
                pos += 1
                if word == "for":
                    m = re.match(r"for\s+([A-Za-z_][A-Za-z0-9_]*)\s+in\s+(.+)$",
                                 payload)
                    if not m:
                        raise TemplateError(f"bad for tag {payload!r}")
                    inner, term = parse_block(("endfor", "empty"))
                    empty_body = []
                    if term.startswith("empty"):
                        pos += 1
                        empty_body, term = parse_block(("endfor",))
                    pos += 1  # consume endfor
                    body.append(For(m.group(1), _parse_expr(m.group(2)),
                                    inner, empty_body))
                elif word == "if":
                    cond = _parse_expr(payload[2:].strip())
                    branches = []
                    inner, term = parse_block(("elif", "else", "endif"))
                    branches.append((cond, inner))
                    while term.startswith("elif"):
                        pos += 1
                        cond = _parse_expr(term[4:].strip())
                        inner, term = parse_block(("elif", "else", "endif"))
                        branches.append((cond, inner))
                    orelse = []
                    if term.startswith("else"):
                        pos += 1
                        orelse, term = parse_block(("endif",))
                    pos += 1  # consume endif
                    body.append(If(branches, orelse))
                else:
                    raise TemplateError(f"unknown tag {word!r}")
        if terminators:
            raise TemplateError(f"missing {' / '.join(terminators)}")
        return body, ""

    body, _ = parse_block(())
    return body


# ---------------------------------------------------------------------------
# Python evaluation (driver-side, per-request — the reference service shape)
# ---------------------------------------------------------------------------

class _Undefined:
    def __bool__(self):
        return False

    def __str__(self):
        return ""


UNDEFINED = _Undefined()


def _lookup(path: Path, env: dict):
    cur = env
    for i, part in enumerate(path.parts):
        if isinstance(cur, dict):
            if part not in cur:
                return UNDEFINED
            cur = cur[part]
        elif isinstance(cur, (list, tuple)) and part.isdigit():
            idx = int(part)
            if idx >= len(cur):
                return UNDEFINED
            cur = cur[idx]
        elif hasattr(cur, part):
            cur = getattr(cur, part)
        else:
            return UNDEFINED
        if cur is None and i + 1 < len(path.parts):
            return UNDEFINED
    return cur


def _eval(node, env: dict):
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, Path):
        return _lookup(node, env)
    if isinstance(node, Not):
        return not _eval(node.operand, env)
    if isinstance(node, BoolOp):
        if node.op == "and":
            out = True
            for op in node.operands:
                out = _eval(op, env)
                if not out:
                    return out
            return out
        out = False
        for op in node.operands:
            out = _eval(op, env)
            if out:
                return out
        return out
    if isinstance(node, Cmp):
        left = _eval(node.left, env)
        right = _eval(node.right, env)
        try:
            if node.op == "==":
                return left == right
            if node.op == "!=":
                return left != right
            if node.op == "in":
                return left in right
            if node.op == "<":
                return left < right
            if node.op == "<=":
                return left <= right
            if node.op == ">":
                return left > right
            if node.op == ">=":
                return left >= right
        except TypeError:
            return False
    raise TemplateError(f"cannot evaluate {node!r}")


def _to_text(value) -> str:
    """Print formatting.  Booleans render lowercase so the Python engine
    and the native column path (CAST(bool AS STRING) -> 'true'/'false')
    agree byte-for-byte; no reference template prints a boolean, so the
    casing is this repo's cross-engine-equality choice."""
    if value is None or isinstance(value, _Undefined):
        return ""
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, float) and value == int(value):
        # match Spark's CAST(DOUBLE AS STRING) for whole values: 2.0 -> "2.0"
        return f"{value:.1f}"
    return str(value)


def render_ast(ast: list, env: dict) -> str:
    out = []
    for node in ast:
        if isinstance(node, Text):
            out.append(node.text)
        elif isinstance(node, Print):
            out.append(_to_text(_eval(node.expr, env)))
        elif isinstance(node, If):
            for cond, body in node.branches:
                if _eval(cond, env):
                    out.append(render_ast(body, env))
                    break
            else:
                out.append(render_ast(node.orelse, env))
        elif isinstance(node, For):
            seq = _eval(node.seq, env)
            if isinstance(seq, _Undefined) or seq is None:
                seq = []
            if not isinstance(seq, (list, tuple)):
                raise TemplateError("for over a non-sequence")
            if seq:
                for item in seq:
                    out.append(render_ast(node.body, {**env, node.var: item}))
            else:
                out.append(render_ast(node.empty, env))
        else:
            raise TemplateError(f"unknown node {node!r}")
    return "".join(out)


def render(src: str, terms: dict) -> str:
    """Single-pass render of a template string (the PromptManager path)."""
    return render_ast(parse_template(src), terms)


# ---------------------------------------------------------------------------
# Native column compilation (corpus-scale — one codegen'd projection)
# ---------------------------------------------------------------------------


def _field_type(dtype: T.DataType, name: str) -> T.DataType:
    if isinstance(dtype, T.StructType):
        for f_ in dtype.fields:
            if f_.name == name:
                return f_.dataType
    raise TemplateCompileError(f"no field {name!r} on {dtype.simpleString()}")


def _resolve_col(path: Path, env: dict) -> tuple[Column, T.DataType]:
    head, *rest = path.parts
    if head not in env:
        raise TemplateCompileError(f"unknown name {head!r}")
    col, dtype = env[head]
    for part in rest:
        dtype = _field_type(dtype, part)
        col = col.getField(part)
    return col, dtype


def _compile_print(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, (T.ArrayType, T.StructType, T.MapType)):
        raise TemplateCompileError(
            f"printing composite type {dtype.simpleString()} natively is "
            "format-ambiguous; restructure the template or use render()")
    return F.coalesce(col.cast("string"), F.lit(""))


def _compile_truthy(node, env: dict) -> Column:
    if isinstance(node, Lit):
        return F.lit(bool(node.value))
    if isinstance(node, Not):
        return ~_compile_truthy(node.operand, env)
    if isinstance(node, BoolOp):
        out = _compile_truthy(node.operands[0], env)
        for op in node.operands[1:]:
            nxt = _compile_truthy(op, env)
            out = (out & nxt) if node.op == "and" else (out | nxt)
        return out
    if isinstance(node, Cmp):
        lc = _compile_value(node.left, env)
        rc = _compile_value(node.right, env)
        ops = {"==": lc == rc, "!=": lc != rc, "<": lc < rc,
               "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc}
        if node.op == "in":
            raise TemplateCompileError("'in' not supported natively")
        return F.coalesce(ops[node.op], F.lit(False))
    if isinstance(node, Path):
        col, dtype = _resolve_col(node, env)
        if isinstance(dtype, T.BooleanType):
            return F.coalesce(col, F.lit(False))
        if isinstance(dtype, T.StringType):
            return F.coalesce(F.length(col) > 0, F.lit(False))
        if isinstance(dtype, T.ArrayType):
            return F.coalesce(F.size(col) > 0, F.lit(False))
        if isinstance(dtype, T.NumericType):
            return F.coalesce(col != F.lit(0), F.lit(False))
        return col.isNotNull()
    raise TemplateCompileError(f"cannot compile condition {node!r}")


def _compile_value(node, env: dict) -> Column:
    if isinstance(node, Lit):
        return F.lit(node.value)
    if isinstance(node, Path):
        return _resolve_col(node, env)[0]
    raise TemplateCompileError(f"cannot compile operand {node!r}")


def _compile_body(ast: list, env: dict) -> Column:
    pieces = []
    for node in ast:
        if isinstance(node, Text):
            pieces.append(F.lit(node.text))
        elif isinstance(node, Print):
            if not isinstance(node.expr, Path):
                raise TemplateCompileError("only variable prints compile")
            pieces.append(_compile_print(*_resolve_col(node.expr, env)))
        elif isinstance(node, If):
            expr = None
            for cond, body in node.branches:
                c = _compile_truthy(cond, env)
                b = _compile_body(body, env)
                expr = F.when(c, b) if expr is None else expr.when(c, b)
            expr = expr.otherwise(_compile_body(node.orelse, env))
            pieces.append(expr)
        elif isinstance(node, For):
            if not isinstance(node.seq, Path):
                raise TemplateCompileError("for-sequence must be a variable")
            seq_col, seq_type = _resolve_col(node.seq, env)
            if not isinstance(seq_type, T.ArrayType):
                raise TemplateCompileError(
                    f"for over non-array {seq_type.simpleString()}")
            elem_t = seq_type.elementType

            def make_body_fn(ast_, env_, var_, t_):
                def body_fn(x):
                    return _compile_body(ast_, {**env_, var_: (x, t_)})
                return body_fn

            joined = F.array_join(
                F.transform(seq_col,
                            make_body_fn(node.body, env, node.var, elem_t)),
                "")
            if node.empty:
                joined = F.when(
                    F.coalesce(F.size(seq_col), F.lit(0)) > 0, joined
                ).otherwise(_compile_body(node.empty, env))
            else:
                joined = F.coalesce(joined, F.lit(""))
            pieces.append(joined)
        else:
            raise TemplateCompileError(f"unknown node {node!r}")
    if not pieces:
        return F.lit("")
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)


def compile_template(src: str, df: DataFrame,
                     extra: dict[str, tuple[Column, T.DataType]] | None = None,
                     ) -> Column:
    """Compile a template to ONE native Column over ``df``'s rows: each
    top-level template name resolves to the same-named column (dotted
    parts walk struct fields), loops lower to ``transform`` +
    ``array_join``, conditionals to ``CASE WHEN``.  Raises
    TemplateCompileError for constructs outside the native subset
    (composite-type prints, non-variable loop sequences, ``in``) — the
    caller then falls back to :func:`render` at the prompt boundary."""
    env = {f_.name: (F.col(f_.name), f_.dataType) for f_ in df.schema.fields}
    if extra:
        env.update(extra)
    return _compile_body(parse_template(src), env)


# ---------------------------------------------------------------------------
# Strict-mode schema gate (schema_compatibility.py:7-90 replica)
# ---------------------------------------------------------------------------

_UNSUPPORTED_KEYWORDS = {
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
    "minLength", "maxLength", "pattern",
    "minItems", "maxItems",
    "minProperties", "maxProperties",
}


class _IncompatibleSchema(Exception):
    pass


def _check_node(node) -> None:
    if not isinstance(node, dict):
        return
    node_type = node.get("type")
    if node_type == "object" or (node_type is None and "properties" in node):
        props = node.get("properties")
        if props is None:
            raise _IncompatibleSchema("object without properties")
        if node.get("additionalProperties") is not False:
            raise _IncompatibleSchema("missing additionalProperties: false")
        required = set(node.get("required", []))
        for key in props:
            if key not in required:
                raise _IncompatibleSchema(f"property {key!r} not required")
        for value in props.values():
            _check_node(value)
    if node_type == "array":
        items = node.get("items")
        if items:
            _check_node(items)
    for keyword in ("oneOf", "anyOf", "allOf"):
        for child in node.get(keyword, []):
            _check_node(child)
    found = _UNSUPPORTED_KEYWORDS & node.keys()
    if found:
        raise _IncompatibleSchema(f"unsupported: {sorted(found)}")


def is_strict_mode_compatible(schema) -> bool:
    """True when a JSON schema can ride LLM structured-output strict
    mode: closed objects with every property required, no value
    constraints (schema_compatibility.py:7-90)."""
    if schema is None:
        return False
    try:
        _check_node(schema)
        return True
    except _IncompatibleSchema:
        return False


# ---------------------------------------------------------------------------
# PromptManager (prompt_manager.py:12-215 behavior parity, sync)
# ---------------------------------------------------------------------------

_JSON_FENCE_RE = re.compile(r"```(?:json)?(.*?)```", re.DOTALL)


class PromptConfiguration:
    def __init__(self, system_template, global_terms=None, prompts=None):
        self.system_template = system_template
        self.global_terms = global_terms or {}
        self.prompts = prompts or {}


class Prompt:
    def __init__(self, template, response_type="text", terms=None,
                 schema=None):
        self.template = template
        self.response_type = response_type
        self.terms = terms
        self.schema = schema


class PromptManager:
    """Config-dict-driven prompt registry + renderer.  Same config wire
    shape as the reference (``system`` / ``template-index`` /
    ``template.{id}`` JSON strings, set by tg-set-prompt —
    cli/set_prompt.py:16-61), same term-merge priority (global < prompt
    < input), same response-type dispatch; ``invoke`` is synchronous
    and takes the LLM as the repo's established pluggable seam."""

    def __init__(self):
        self.load_config({})

    def load_config(self, config: dict) -> None:
        try:
            system = json.loads(config["system"])
        except (KeyError, TypeError, json.JSONDecodeError):
            system = "Be helpful."
        try:
            ix = json.loads(config["template-index"])
        except (KeyError, TypeError, json.JSONDecodeError):
            ix = []

        prompts = {}
        for k in ix:
            data = json.loads(config[f"template.{k}"])
            prompts[k] = Prompt(
                template=data.get("prompt"),
                response_type=data.get("response-type", "text"),
                schema=data.get("schema", None),
                terms={},
            )

        self.config = PromptConfiguration(system, {}, prompts)
        self.terms = self.config.global_terms
        self.prompts = self.config.prompts

        try:
            self.system_ast = parse_template(self.config.system_template)
        except Exception as e:
            raise RuntimeError(f"Error in system template: {e}")

        self.templates = {}
        for k, v in self.prompts.items():
            try:
                self.templates[k] = parse_template(v.template)
            except Exception as e:
                raise RuntimeError(f"Error in template: {k}: {e}")
            if v.terms is None:
                v.terms = {}

    # -- response parsing (prompt_manager.py:85-132) --

    def parse_json(self, text):
        m = _JSON_FENCE_RE.search(text)
        json_str = m.group(1).strip() if m else text.strip()
        return json.loads(json_str)

    def parse_jsonl(self, text):
        results = []
        text = (text or "").strip()
        if text.startswith("```"):
            text = re.sub(r"^```(?:json|jsonl)?\s*\n?", "", text)
        if text.endswith("```"):
            text = text[:-3]
        for line in text.strip().split("\n"):
            line = line.strip()
            if not line or line.startswith("```"):
                continue
            try:
                results.append(json.loads(line))
            except json.JSONDecodeError:
                continue
        return results

    # -- rendering --

    def render(self, id, input):
        if id not in self.prompts:
            raise RuntimeError("ID invalid")
        terms = self.terms | self.prompts[id].terms | input
        return render_ast(self.templates[id], terms)

    def render_system(self, input):
        return render_ast(self.system_ast, self.terms | input)

    # -- invocation through the LLM seam --

    def invoke(self, id, input, llm):
        if id not in self.prompts:
            raise RuntimeError("ID invalid")
        terms = self.terms | self.prompts[id].terms | input
        resp_type = self.prompts[id].response_type
        schema = self.prompts[id].schema

        prompt = {
            "system": render_ast(self.system_ast, terms),
            "prompt": self.render(id, input),
        }
        if resp_type == "json" and schema is not None \
                and is_strict_mode_compatible(schema):
            prompt["response_format"] = "json"
            prompt["schema"] = schema

        resp = llm(**prompt)
        if resp is None:
            raise RuntimeError("LLM returned no response")

        if resp_type == "text":
            return resp

        if resp_type == "json":
            try:
                obj = self.parse_json(resp)
            except (json.JSONDecodeError, TypeError):
                raise RuntimeError("JSON parse fail")
            if schema:
                try:
                    self._validate(obj, schema)
                except _ValidationFailure as e:
                    raise RuntimeError(f"Schema validation fail: {e}")
            return obj

        if resp_type == "jsonl":
            objects = self.parse_jsonl(resp)
            if not objects:
                return []
            if schema:
                validated = []
                for obj in objects:
                    try:
                        self._validate(obj, schema)
                        validated.append(obj)
                    except _ValidationFailure:
                        continue
                return validated
            return objects

        raise RuntimeError(f"Response type {resp_type} not known")

    @staticmethod
    def _validate(obj, schema) -> None:
        try:
            import jsonschema
        except ImportError:  # pragma: no cover - jsonschema in this image
            _validate_minimal(obj, schema)
            return
        try:
            jsonschema.validate(instance=obj, schema=schema)
        except jsonschema.ValidationError as e:
            raise _ValidationFailure(str(e))


class _ValidationFailure(Exception):
    pass


_TYPE_MAP = {
    "object": dict, "array": list, "string": str,
    "number": (int, float), "integer": int, "boolean": bool,
}


def _validate_minimal(obj, schema) -> None:
    """Fallback validator (type / required / properties / items / enum)
    for images without jsonschema; the real library wins when present."""
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t and t in _TYPE_MAP:
        expected = _TYPE_MAP[t]
        if t == "number" and isinstance(obj, bool):
            raise _ValidationFailure("bool is not number")
        if not isinstance(obj, expected) or (
                t == "integer" and isinstance(obj, bool)):
            raise _ValidationFailure(f"{obj!r} is not {t}")
    if "enum" in schema and obj not in schema["enum"]:
        raise _ValidationFailure(f"{obj!r} not in enum")
    if isinstance(obj, dict):
        for key in schema.get("required", []):
            if key not in obj:
                raise _ValidationFailure(f"missing required {key!r}")
        for key, sub in (schema.get("properties") or {}).items():
            if key in obj:
                _validate_minimal(obj[key], sub)
        if schema.get("additionalProperties") is False:
            extra = set(obj) - set(schema.get("properties") or {})
            if extra:
                raise _ValidationFailure(f"additional {sorted(extra)}")
    if isinstance(obj, list) and "items" in schema:
        for item in obj:
            _validate_minimal(item, schema["items"])
