"""Codec tests for trustgraph_spark.mpack — byte vectors hand-derived
from the public MessagePack spec (spec.md formats table) plus a
hypothesis roundtrip over the object shapes the knowledge-core format
uses (get_kg_core.py record structure)."""

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trustgraph_spark.mpack import (
    MpackError,
    packb,
    unpack_stream,
    unpackb,
)


# --- spec byte vectors -----------------------------------------------------


def test_spec_example():
    # the front-page example from msgpack.org
    assert packb({"compact": True, "schema": 0}) == bytes.fromhex(
        "82a7636f6d70616374c3a6736368656d6100"
    )


@pytest.mark.parametrize("value,expect", [
    (None, "c0"),
    (False, "c2"),
    (True, "c3"),
    (0, "00"),
    (127, "7f"),
    (128, "cc80"),
    (255, "ccff"),
    (256, "cd0100"),
    (65535, "cdffff"),
    (65536, "ce00010000"),
    (2**32 - 1, "ceffffffff"),
    (2**32, "cf0000000100000000"),
    (2**64 - 1, "cfffffffffffffffff"),
    (-1, "ff"),
    (-32, "e0"),
    (-33, "d0df"),
    (-128, "d080"),
    (-129, "d1ff7f"),
    (-32768, "d18000"),
    (-32769, "d2ffff7fff"),
    (-2**31, "d280000000"),
    (-2**31 - 1, "d3ffffffff7fffffff"),
    (-2**63, "d38000000000000000"),
    (1.5, "cb3ff8000000000000"),
    ("", "a0"),
    ("a", "a161"),
    ("x" * 31, "bf" + "78" * 31),
    ("x" * 32, "d920" + "78" * 32),
    (b"", "c400"),
    (b"\x00\xff", "c4 02 00 ff".replace(" ", "")),
    ([], "90"),
    ([1, 2], "920102"),
    ({}, "80"),
])
def test_spec_vectors(value, expect):
    assert packb(value) == bytes.fromhex(expect)
    assert unpackb(bytes.fromhex(expect)) == value


def test_width_boundaries_roundtrip():
    for n in (15, 16, 255, 256, 65535, 65536):
        assert unpackb(packb("y" * n)) == "y" * n
        assert unpackb(packb(b"z" * n)) == b"z" * n
    for n in (15, 16, 70000):
        assert unpackb(packb(list(range(n)))) == list(range(n))
    big_map = {str(i): i for i in range(70000)}
    assert unpackb(packb(big_map)) == big_map


def test_float32_decodes():
    # the reference never writes float32, but a foreign core might
    data = b"\xca" + struct.pack(">f", 0.25)
    assert unpackb(data) == 0.25


def test_tuple_packs_as_array():
    assert packb(("t", {"m": 1})) == packb(["t", {"m": 1}])


def test_errors():
    with pytest.raises(MpackError):
        packb(object())
    with pytest.raises(MpackError):
        unpackb(packb(1) + b"\x00")       # trailing bytes
    with pytest.raises(MpackError):
        unpackb(b"\xd9")                  # truncated
    with pytest.raises(MpackError):
        unpackb(b"\xc1")                  # never-used type byte
    with pytest.raises(MpackError):
        unpackb(b"\xd4\x01\x00")          # ext types unsupported


def test_stream():
    blob = packb(1) + packb("two") + packb([3.0, None, True])
    assert list(unpack_stream(blob)) == [1, "two", [3.0, None, True]]
    assert list(unpack_stream(b"")) == []


# --- property roundtrip ----------------------------------------------------

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-2**63, max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_obj = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=6),
        st.dictionaries(st.text(max_size=8), inner, max_size=6),
    ),
    max_leaves=25,
)


@settings(max_examples=300, deadline=None)
@given(_obj)
def test_roundtrip_property(obj):
    assert unpackb(packb(obj)) == obj


@settings(max_examples=100, deadline=None)
@given(st.floats(allow_nan=True, allow_infinity=True))
def test_float_bitexact(x):
    y = unpackb(packb(x))
    assert struct.pack(">d", x) == struct.pack(">d", y)
