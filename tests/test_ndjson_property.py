"""Property-based parser tests (hypothesis): chunking invariance.

The reference pins 10 hand-picked chunkings (spec/lib/ndjson_spec.rb);
the actual contract is stronger — for ANY partition of the byte stream
into chunks, the parsed document sequence is identical.  Hypothesis
explores that space directly.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from nomad_event_streamer_spark.sources.ndjson import NDJSONBuffer

# A deterministic NDJSON stream: envelopes of varying shape + heartbeats
# + a corrupt line (dropped) + a trailing unterminated fragment.
DOCS = [
    {"Index": 1, "Events": [{"Topic": "Allocation", "Type": "A"}]},
    {},
    {"Index": 2, "Events": []},
    {"Index": 3, "Events": [{"Topic": "Node", "Payload": {"k": [1, 2, 3]}}]},
    {},
    {"Index": 4, "Events": [{"Details": {"exit_code": "0"}}]},
]
STREAM = (
    "\n".join(json.dumps(d) for d in DOCS[:3])
    + "\n{not json}\n"
    + "\n".join(json.dumps(d) for d in DOCS[3:])
    + "\n"
    + '{"Index": 5, "unterminated'
)
EXPECTED = DOCS  # corrupt line dropped, unterminated tail never emitted


def parse_with_cuts(cuts: list[int]) -> list:
    bounds = sorted({0, len(STREAM), *cuts})
    buf = NDJSONBuffer()
    out = []
    for lo, hi in zip(bounds, bounds[1:]):
        out.extend(buf.feed(STREAM[lo:hi]))
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=len(STREAM)), min_size=0, max_size=12
    )
)
def test_any_chunking_yields_same_documents(cuts):
    assert parse_with_cuts(cuts) == EXPECTED


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=len(STREAM)))
def test_fixed_size_chunking(size):
    buf = NDJSONBuffer()
    out = []
    for i in range(0, len(STREAM), size):
        out.extend(buf.feed(STREAM[i : i + size]))
    assert out == EXPECTED
    assert buf.pending == '{"Index": 5, "unterminated'
