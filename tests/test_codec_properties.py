"""Property-based guards for the from-scratch codecs: any bytes the
encoders produce must decode back exactly, and mangled streams must
either raise the codec's typed error or return provably-different
bytes — never crash with a foreign exception type.

Strategies lean on compressible structure (repeated chunks) as well
as raw randomness so the match/copy paths get real work, not just
literal passthrough."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vrl_spark.functions.lzcodecs import (
    lz4_compress,
    lz4_compress_prepend_size,
    lz4_decompress,
    lz4_decompress_size_prepended,
    snappy_compress,
    snappy_decompress,
)
from vrl_spark.functions.zstdcodec import (
    ZstdError,
    zstd_compress,
    zstd_decompress,
)

# raw bytes, or structured repetition (forces matches/overlaps)
_payload = st.one_of(
    st.binary(max_size=4096),
    st.builds(
        lambda chunk, n, tail: chunk * n + tail,
        st.binary(min_size=1, max_size=64),
        st.integers(min_value=1, max_value=200),
        st.binary(max_size=32),
    ),
    st.builds(
        lambda alphabet, draws: bytes(
            alphabet[i % len(alphabet)] for i in draws
        ),
        st.binary(min_size=1, max_size=4),
        st.lists(st.integers(0, 3), max_size=2048),
    ),
)


@settings(max_examples=60, deadline=None)
@given(_payload)
def test_snappy_roundtrip_property(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=60, deadline=None)
@given(_payload)
def test_lz4_roundtrip_property(data):
    assert lz4_decompress(lz4_compress(data)) == data
    assert lz4_decompress_size_prepended(
        lz4_compress_prepend_size(data)) == data


@settings(max_examples=40, deadline=None)
@given(_payload)
def test_zstd_roundtrip_property(data):
    assert zstd_decompress(zstd_compress(data)) == data


@settings(max_examples=60, deadline=None)
@given(_payload, st.data())
def test_zstd_mangled_never_escapes_typed_error(data, draw):
    comp = bytearray(zstd_compress(data))
    n_flips = draw.draw(st.integers(1, 4))
    for _ in range(n_flips):
        i = draw.draw(st.integers(0, len(comp) - 1))
        comp[i] ^= draw.draw(st.integers(1, 255))
    try:
        zstd_decompress(bytes(comp))
    except ZstdError:
        pass  # the only acceptable exception type


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_lz_decoders_never_escape_valueerror(garbage):
    for fn in (snappy_decompress, lz4_decompress,
               lz4_decompress_size_prepended):
        try:
            fn(garbage)
        except ValueError:
            pass  # typed error; anything else would fail the test
