"""Property-based Avro codec tests (hypothesis): round-trip over the full
value domains, including edge integers, unicode strings, and subnormals."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_avro_pipeline_java_spark.streaming import avro_codec as C

FT = [
    ("s", "string"),
    ("i", "int"),
    ("l", "long"),
    ("d", "double"),
    ("f", "float"),
    ("b", "boolean"),
]

records = st.tuples(
    st.text(max_size=200),                                   # any unicode
    st.integers(min_value=-(2**31), max_value=2**31 - 1),    # int32 domain
    st.integers(min_value=-(2**63), max_value=2**63 - 1),    # int64 domain
    st.floats(allow_nan=False, width=64),
    st.floats(allow_nan=False, width=32),
    st.booleans(),
)


@settings(max_examples=300, deadline=None)
@given(records)
def test_roundtrip_any_record(vals):
    body = C.encode_record(FT, list(vals))
    out = C.decode_record(FT, body)
    assert out[0] == vals[0]
    assert out[1] == vals[1]
    assert out[2] == vals[2]
    assert out[3] == vals[3]
    assert math.isclose(out[4], vals[4], rel_tol=0, abs_tol=0) or out[4] == vals[4]
    assert out[5] is vals[5]


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_roundtrip_full_long_domain(n):
    import io

    assert C._zigzag_decode(io.BytesIO(C._zigzag_encode(n))) == n


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=500), st.integers(min_value=0, max_value=2**32 - 1))
def test_framing_roundtrip(body, schema_id):
    sid, out = C.unframe_confluent(C.frame_confluent(body, schema_id))
    assert sid == schema_id and out == body
