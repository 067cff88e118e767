"""Property-based round-trip for the pure-Python Avro OCF codec
(sources/avro_py.py): ANY record batch within the supported schema
surface must survive write->read bit-for-bit, under both codecs, for
either union order, at any block size. Spark-free (the codec is plain
Python), so Hypothesis can afford many examples."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from streams_prototyping_spark.sources import avro_py

# doubles: exclude NaN (NaN != NaN breaks equality checks; the parquet
# testdata contains none) but keep infinities and signed zeros
_doubles = st.floats(allow_nan=False, width=64)
_floats = st.floats(allow_nan=False, width=32)
_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_text = st.text(max_size=40)
_blobs = st.binary(max_size=40)


def _record_strategy():
    return st.fixed_dictionaries(
        {
            "id": _longs,
            "small": _ints,
            "name": _text,
            "payload": _blobs,
            "score": _doubles,
            "ratio": _floats,
            "ok": st.booleans(),
            "tag": st.one_of(st.none(), _text),
            "emb": st.lists(_doubles, max_size=8),
        }
    )


SCHEMA_NULL_FIRST = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "small", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "payload", "type": "bytes"},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "ok", "type": "boolean"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "emb", "type": {"type": "array", "items": "double"}},
    ],
}
# foreign writers may order the union the other way; decode must honor it
SCHEMA_NULL_SECOND = {
    **SCHEMA_NULL_FIRST,
    "fields": [
        {**f, "type": ["string", "null"]} if f["name"] == "tag" else f
        for f in SCHEMA_NULL_FIRST["fields"]
    ],
}


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a == b and math.copysign(1, a) == math.copysign(1, b)) or (
            math.isnan(a) and math.isnan(b)
        )
    if isinstance(a, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@settings(max_examples=60, deadline=None)
@given(
    recs=st.lists(_record_strategy(), max_size=25),
    codec=st.sampled_from(["null", "deflate"]),
    null_second=st.booleans(),
    block=st.sampled_from([1, 3, 4096]),
)
def test_roundtrip_any_records(tmp_path_factory, recs, codec, null_second, block):
    path = str(tmp_path_factory.mktemp("avro") / "p.avro")
    schema = SCHEMA_NULL_SECOND if null_second else SCHEMA_NULL_FIRST
    # ratio is a float32 field: quantize the expectation through float32
    import struct as _s

    expected = [
        {**r, "ratio": _s.unpack("<f", _s.pack("<f", r["ratio"]))[0]} for r in recs
    ]
    avro_py.write_avro_file(path, schema, recs, codec=codec, block_records=block)
    schema2, got = avro_py.read_avro_file(path)
    assert schema2 == schema
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        for k in e:
            assert _eq(g[k], e[k]), (k, g[k], e[k])


def test_deterministic_bytes():
    """Same records + same file name => byte-identical output (the
    sync marker is derived from the name, deflate is level-pinned)."""
    import hashlib

    recs = [{"id": i, "small": i, "name": f"n{i}", "payload": b"\x00",
             "score": i / 7.0, "ratio": float(i), "ok": bool(i % 2),
             "tag": None if i % 3 else "t", "emb": [i * 1.5]} for i in range(50)]
    digests = set()
    for _ in range(2):
        import tempfile, os  # noqa: E401

        d = tempfile.mkdtemp()
        p = os.path.join(d, "same-name.avro")
        avro_py.write_avro_file(p, SCHEMA_NULL_FIRST, recs)
        digests.add(hashlib.md5(open(p, "rb").read()).hexdigest())
    assert len(digests) == 1


def test_wide_schema_header_exceeds_probe_window(tmp_path_factory):
    """ADVICE r4: a valid container whose header (schema JSON) exceeds
    the 4 KB probe window must still parse via read_avro_header's
    widen-and-retry, not die with a bare EOFError."""
    import os

    fields = [{"name": f"really_long_field_name_number_{i:04d}", "type": "long"}
              for i in range(150)]
    schema = {"type": "record", "name": "wide", "fields": fields}
    import json as _json

    assert len(_json.dumps(schema)) > 4096  # the header is over the window
    recs = [{f["name"]: i for f in fields} for i in range(3)]
    d = tmp_path_factory.mktemp("wide_avro")
    p = os.path.join(str(d), "wide.avro")
    avro_py.write_avro_file(p, schema, recs)
    got_schema = avro_py.read_avro_header(p)
    assert got_schema == schema
    rs, got = avro_py.read_avro_file(p)
    assert rs == schema and len(got) == 3


def test_single_branch_union_rejected():
    """ADVICE r4: ["string"] unions need a branch index per the spec;
    decoding them as bare string silently misaligns — must refuse."""
    import pytest

    for bad in (["string"], ["long", "string"], ["null", "long", "string"]):
        with pytest.raises(NotImplementedError):
            avro_py._field_kind(bad)
    # the supported forms still pass, either order
    assert avro_py._field_kind(["null", "string"])[0] == "string"
    assert avro_py._field_kind(["string", "null"])[2] == 1


def test_truncated_header_still_fails_loudly(tmp_path_factory):
    """A file that genuinely ends mid-header raises EOFError naming the
    condition (not an infinite widen loop)."""
    import os

    import pytest

    d = tmp_path_factory.mktemp("trunc_avro")
    p = os.path.join(str(d), "trunc.avro")
    recs = [{"id": 1, "small": 1, "name": "x", "payload": b"", "score": 0.0,
             "ratio": 0.0, "ok": True, "tag": None, "emb": []}]
    avro_py.write_avro_file(p, SCHEMA_NULL_FIRST, recs)
    data = open(p, "rb").read()
    open(p, "wb").write(data[:20])  # cut inside the metadata map
    with pytest.raises(EOFError, match="truncated Avro header"):
        avro_py.read_avro_header(p)
