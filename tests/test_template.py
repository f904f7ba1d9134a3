"""Prompt templating kernel tests — mirrors the reference's
tests/unit/test_prompt_manager.py + test_prompt_manager_edge_cases.py
matrices (term priority, fence parsing, JSONL resilience, schema
validation, loop/else, single-pass recursion) and adds the native
column compiler's equivalence + plan gates."""

import json

import pytest

from trustgraph_spark.template import (
    PromptManager, TemplateCompileError, TemplateError, compile_template,
    is_strict_mode_compatible, render,
)


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class TestEngine:

    def test_simple_substitution(self):
        assert render("Hello {{ name }}!", {"name": "Alice"}) == "Hello Alice!"

    def test_dotted_lookup_dict_attr_index(self):
        class Obj:
            x = "attr"
        env = {"d": {"k": "dict"}, "o": Obj(), "l": ["zero", "one"]}
        assert render("{{ d.k }}/{{ o.x }}/{{ l.1 }}", env) == "dict/attr/one"

    def test_undefined_prints_empty_and_is_falsey(self):
        assert render("[{{ nope }}]", {}) == "[]"
        assert render("{% if nope %}y{% else %}n{% endif %}", {}) == "n"

    def test_for_loop_with_structs(self):
        src = "{% for s in schemas %}{{ s.name }}:{{ s.desc }};{% endfor %}"
        env = {"schemas": [{"name": "a", "desc": "A"},
                           {"name": "b", "desc": "B"}]}
        assert render(src, env) == "a:A;b:B;"

    def test_for_empty_clause(self):
        src = "{% for x in xs %}{{ x }}{% empty %}none{% endfor %}"
        assert render(src, {"xs": []}) == "none"
        assert render(src, {}) == "none"
        assert render(src, {"xs": ["a"]}) == "a"

    def test_if_elif_else(self):
        src = ("{% if n == 1 %}one{% elif n == 2 %}two"
               "{% else %}many{% endif %}")
        assert render(src, {"n": 1}) == "one"
        assert render(src, {"n": 2}) == "two"
        assert render(src, {"n": 9}) == "many"

    def test_truthiness_and_not_and_bool_ops(self):
        src = "{% if not xs and (1) %}empty{% endif %}"
        # parenthesised atoms are outside the subset -> keep it simple
        src = "{% if not xs %}empty{% endif %}"
        assert render(src, {"xs": []}) == "empty"
        assert render("{% if a or b %}y{% endif %}",
                      {"a": "", "b": "x"}) == "y"
        assert render("{% if a and b %}y{% else %}n{% endif %}",
                      {"a": "x", "b": ""}) == "n"

    def test_comparisons(self):
        assert render("{% if x > 3 %}big{% endif %}", {"x": 5}) == "big"
        assert render("{% if s == 'hi' %}m{% endif %}", {"s": "hi"}) == "m"
        assert render("{% if k in ks %}in{% endif %}",
                      {"k": "a", "ks": ["a", "b"]}) == "in"

    def test_comment_stripped(self):
        assert render("a{# hidden #}b", {}) == "ab"

    def test_single_pass_no_recursion(self):
        out = render("{{ v }}", {"v": "includes {{ v }}"})
        assert out == "includes {{ v }}"

    def test_unterminated_block_raises(self):
        with pytest.raises(TemplateError):
            render("{% if x %}oops", {"x": 1})
        with pytest.raises(TemplateError):
            render("{% for x in xs %}oops", {"xs": []})

    def test_unknown_tag_and_filter_raise(self):
        with pytest.raises(TemplateError):
            render("{% include 'x' %}", {})
        with pytest.raises(TemplateError):
            render("{{ x|upper }}", {"x": "a"})

    def test_whitespace_preserved(self):
        src = "  {{ a }}\n\t{{ b }}  "
        assert render(src, {"a": "1", "b": "2"}) == "  1\n\t2  "

    def test_bool_prints_lowercase(self):
        assert render("{{ t }}/{{ f }}", {"t": True, "f": False}) == \
            "true/false"


# ---------------------------------------------------------------------------
# PromptManager (reference test parity)
# ---------------------------------------------------------------------------

def sample_config():
    return {
        "system": json.dumps("You are a helpful assistant."),
        "template-index": json.dumps(
            ["simple_text", "json_response", "complex_template"]),
        "template.simple_text": json.dumps({
            "prompt": "Hello {{ name }}, welcome to {{ system_name }}!",
            "response-type": "text",
        }),
        "template.json_response": json.dumps({
            "prompt": "Generate a user profile for {{ username }}",
            "response-type": "json",
            "schema": {
                "type": "object",
                "properties": {"name": {"type": "string"},
                               "age": {"type": "number"}},
                "required": ["name", "age"],
            },
        }),
        "template.complex_template": json.dumps({
            "prompt": "{% for item in items %}"
                      "- {{ item.name }}: {{ item.value }}\n{% endfor %}",
            "response-type": "text",
        }),
    }


def manager():
    pm = PromptManager()
    pm.load_config(sample_config())
    pm.terms["system_name"] = "TrustGraph"
    return pm


class TestPromptManager:

    def test_load_and_render(self):
        pm = manager()
        assert pm.config.system_template == "You are a helpful assistant."
        assert len(pm.prompts) == 3
        assert pm.render("simple_text", {"name": "Alice"}) == \
            "Hello Alice, welcome to TrustGraph!"

    def test_default_config(self):
        pm = PromptManager()
        assert pm.config.system_template == "Be helpful."
        assert pm.prompts == {}

    def test_term_priority_input_over_prompt_over_global(self):
        pm = PromptManager()
        pm.load_config({
            "system": json.dumps("Test"),
            "template-index": json.dumps(["t"]),
            "template.t": json.dumps({"prompt": "Value is: {{ value }}"}),
        })
        pm.terms["value"] = "global"
        assert pm.render("t", {}) == "Value is: global"
        pm.prompts["t"].terms = {"value": "prompt"}
        assert pm.render("t", {}) == "Value is: prompt"
        assert pm.render("t", {"value": "input"}) == "Value is: input"

    def test_unknown_id_raises(self):
        with pytest.raises(RuntimeError, match="ID invalid"):
            manager().render("nope", {})

    def test_bad_template_raises_with_id(self):
        pm = PromptManager()
        with pytest.raises(RuntimeError, match="Error in template: bad"):
            pm.load_config({
                "system": json.dumps("Test"),
                "template-index": json.dumps(["bad"]),
                "template.bad": json.dumps(
                    {"prompt": "{% for x in %}broken{% endfor %}"}),
            })

    def test_complex_template_loop(self):
        pm = manager()
        out = pm.render("complex_template", {"items": [
            {"name": "a", "value": 1}, {"name": "b", "value": 2}]})
        assert out == "- a: 1\n- b: 2\n"

    def test_parse_json_fenced_and_bare(self):
        pm = manager()
        assert pm.parse_json('```json\n{"a": 1}\n```') == {"a": 1}
        assert pm.parse_json('```\n{"a": 2}\n```') == {"a": 2}
        assert pm.parse_json(' {"a": 3} ') == {"a": 3}
        # first fenced block wins over trailing text
        assert pm.parse_json(
            'x ```json {"first": true} ``` then ```json {"b":1} ```'
        ) == {"first": True}
        with pytest.raises(json.JSONDecodeError):
            pm.parse_json("{not json")

    def test_parse_jsonl_resilience(self):
        pm = manager()
        text = ('```jsonl\n{"a": 1}\nnot json\n\n{"b": 2}\n```')
        assert pm.parse_jsonl(text) == [{"a": 1}, {"b": 2}]
        assert pm.parse_jsonl("") == []

    def test_invoke_text(self):
        pm = manager()
        calls = {}

        def llm(**kw):
            calls.update(kw)
            return "hi there"

        out = pm.invoke("simple_text", {"name": "Bob"}, llm)
        assert out == "hi there"
        assert calls["system"] == "You are a helpful assistant."
        assert calls["prompt"] == "Hello Bob, welcome to TrustGraph!"
        assert "response_format" not in calls

    def test_invoke_json_with_schema_validation(self):
        pm = manager()
        out = pm.invoke("json_response", {"username": "u"},
                        lambda **kw: '```json\n{"name": "n", "age": 3}\n```')
        assert out == {"name": "n", "age": 3}
        with pytest.raises(RuntimeError, match="Schema validation fail"):
            pm.invoke("json_response", {"username": "u"},
                      lambda **kw: '{"name": "n"}')
        with pytest.raises(RuntimeError, match="JSON parse fail"):
            pm.invoke("json_response", {"username": "u"},
                      lambda **kw: "{nope")

    def test_invoke_none_response_raises(self):
        pm = manager()
        with pytest.raises(RuntimeError, match="no response"):
            pm.invoke("simple_text", {"name": "x"}, lambda **kw: None)

    def test_invoke_jsonl_schema_filters_invalid(self):
        pm = PromptManager()
        pm.load_config({
            "system": json.dumps("S"),
            "template-index": json.dumps(["j"]),
            "template.j": json.dumps({
                "prompt": "{{ q }}", "response-type": "jsonl",
                "schema": {"type": "object",
                           "properties": {"k": {"type": "string"}},
                           "required": ["k"]},
            }),
        })
        out = pm.invoke("j", {"q": "x"},
                        lambda **kw: '{"k": "a"}\n{"wrong": 1}\n{"k": "b"}')
        assert out == [{"k": "a"}, {"k": "b"}]

    def test_invoke_unknown_response_type(self):
        pm = PromptManager()
        pm.load_config({
            "system": json.dumps("S"),
            "template-index": json.dumps(["w"]),
            "template.w": json.dumps(
                {"prompt": "x", "response-type": "yaml"}),
        })
        with pytest.raises(RuntimeError, match="not known"):
            pm.invoke("w", {}, lambda **kw: "y")

    def test_structured_output_flag_gated_on_strict_schema(self):
        strict_schema = {
            "type": "object",
            "properties": {"name": {"type": "string"}},
            "required": ["name"],
            "additionalProperties": False,
        }
        pm = PromptManager()
        pm.load_config({
            "system": json.dumps("S"),
            "template-index": json.dumps(["s"]),
            "template.s": json.dumps({
                "prompt": "{{ q }}", "response-type": "json",
                "schema": strict_schema,
            }),
        })
        seen = {}

        def llm(**kw):
            seen.update(kw)
            return '{"name": "x"}'

        pm.invoke("s", {"q": "?"}, llm)
        assert seen["response_format"] == "json"
        assert seen["schema"] == strict_schema


class TestStrictMode:

    def test_none_incompatible(self):
        assert not is_strict_mode_compatible(None)

    def test_closed_all_required_compatible(self):
        assert is_strict_mode_compatible({
            "type": "object",
            "properties": {"a": {"type": "string"}},
            "required": ["a"],
            "additionalProperties": False,
        })

    def test_open_object_incompatible(self):
        assert not is_strict_mode_compatible({
            "type": "object",
            "properties": {"a": {"type": "string"}},
            "required": ["a"],
        })
        assert not is_strict_mode_compatible({"type": "object"})

    def test_optional_property_incompatible(self):
        assert not is_strict_mode_compatible({
            "type": "object",
            "properties": {"a": {"type": "string"},
                           "b": {"type": "number"}},
            "required": ["a"],
            "additionalProperties": False,
        })

    def test_constraint_keywords_incompatible(self):
        assert not is_strict_mode_compatible({
            "type": "string", "maxLength": 5})

    def test_nested_and_combinators(self):
        nested_bad = {
            "type": "object",
            "properties": {"inner": {
                "type": "object",
                "properties": {"x": {"type": "string"}},
                "required": [],
                "additionalProperties": False,
            }},
            "required": ["inner"],
            "additionalProperties": False,
        }
        assert not is_strict_mode_compatible(nested_bad)
        assert not is_strict_mode_compatible(
            {"anyOf": [{"type": "string", "pattern": "x"}]})
        assert is_strict_mode_compatible({"type": "array",
                                          "items": {"type": "string"}})


# ---------------------------------------------------------------------------
# Native column compilation
# ---------------------------------------------------------------------------

TEMPLATE = (
    "Doc {{ doc_id }}: {{ title }}\n"
    "{% if items %}Items:\n"
    "{% for item in items %}- {{ item.name }} x{{ item.qty }}\n{% endfor %}"
    "{% else %}No items\n{% endif %}"
    "{% if flag %}FLAGGED{% endif %}"
)


@pytest.fixture(scope="module")
def terms_df(spark):
    from pyspark.sql import functions as F
    n = F.col("doc_id")
    items = F.when(
        n % 4 >= 1,
        F.transform(
            F.sequence(F.lit(1), (n % 4).cast("int")),
            lambda i: F.struct(
                F.concat(F.lit("it"), i.cast("string")).alias("name"),
                (i * 2).alias("qty")),
        ),
    ).otherwise(F.array().cast("array<struct<name:string,qty:int>>"))
    return (spark.range(40).withColumnRenamed("id", "doc_id")
            .select("doc_id",
                    F.concat(F.lit("T"), n.cast("string")).alias("title"),
                    items.alias("items"),
                    (n % 5 == 0).alias("flag")))


class TestCompile:

    def test_native_equals_python(self, terms_df):
        out = terms_df.select(
            "doc_id",
            compile_template(TEMPLATE, terms_df).alias("rendered"),
        ).collect()
        rows = terms_df.collect()
        for got, row in zip(out, rows):
            env = {"doc_id": row.doc_id, "title": row.title,
                   "items": [{"name": it.name, "qty": it.qty}
                             for it in row["items"]],
                   "flag": row.flag}
            assert got.rendered == render(TEMPLATE, env), row.doc_id

    def test_plan_is_native(self, terms_df):
        df = terms_df.select(compile_template(TEMPLATE, terms_df))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_null_semantics(self, spark):
        from pyspark.sql import functions as F
        df = spark.range(1).select(
            F.lit(None).cast("string").alias("s"),
            F.lit(None).cast("array<string>").alias("xs"))
        out = df.select(compile_template(
            "[{{ s }}]{% if xs %}y{% else %}n{% endif %}"
            "{% for x in xs %}{{ x }}{% endfor %}", df).alias("r")
        ).collect()[0].r
        assert out == "[]n"
        assert render("[{{ s }}]{% if xs %}y{% else %}n{% endif %}"
                      "{% for x in xs %}{{ x }}{% endfor %}",
                      {"s": None, "xs": None}) == "[]n"

    def test_unsupported_constructs_raise(self, terms_df):
        with pytest.raises(TemplateCompileError):
            compile_template("{{ items }}", terms_df)       # composite print
        with pytest.raises(TemplateCompileError):
            compile_template("{{ nope }}", terms_df)        # unknown name
        with pytest.raises(TemplateCompileError):
            compile_template("{% if x in items %}y{% endif %}", terms_df)

    def test_nested_loop(self, spark):
        from pyspark.sql import functions as F
        df = spark.range(1).select(F.expr(
            "array(array('a','b'), array('c')) "
        ).alias("rows"))
        src = ("{% for r in rows %}[{% for c in r %}{{ c }}.{% endfor %}]"
               "{% endfor %}")
        got = df.select(compile_template(src, df).alias("r")).collect()[0].r
        assert got == "[a.b.][c.]"
        assert render(src, {"rows": [["a", "b"], ["c"]]}) == got
