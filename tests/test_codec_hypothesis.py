"""Hypothesis roundtrip properties for the continuation-wave byte
codecs: QOI, LZ4 block, SBWT block-sorting, DVI varint, Rice audio.

Each codec's strict decoder must invert its encoder on ARBITRARY valid
inputs — the deterministic unit pins cover known shapes; these sweep
the input space (adversarial sizes, extreme values, degenerate runs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_qoi_roundtrip_property(w, h, data):
    from sparkroach.functions.qoi import qoi_decode, qoi_encode

    # mixed palette: small alphabet (runs/index) + full-range channels
    px = data.draw(
        st.lists(
            st.one_of(
                st.sampled_from([(0, 0, 0), (255, 255, 255), (7, 7, 7)]),
                st.tuples(
                    st.integers(0, 255),
                    st.integers(0, 255),
                    st.integers(0, 255),
                ),
            ),
            min_size=w * h,
            max_size=w * h,
        )
    )
    assert qoi_decode(qoi_encode(w, h, px)) == (w, h, px)


@settings(max_examples=60, deadline=None)
@given(
    raw=st.one_of(
        st.binary(max_size=600),
        st.builds(
            lambda b, n: b * n,
            st.binary(min_size=1, max_size=8),
            st.integers(1, 120),
        ),
    )
)
def test_lz4_roundtrip_property(raw):
    from sparkroach.functions.lz4block import lz4_compress, lz4_decompress

    assert lz4_decompress(lz4_compress(raw), len(raw)) == raw


@settings(max_examples=40, deadline=None)
@given(
    raw=st.one_of(
        st.binary(max_size=300),
        st.builds(
            lambda b, n: b * n,
            st.binary(min_size=1, max_size=6),
            st.integers(1, 80),
        ),
    )
)
def test_sbwt_roundtrip_property(raw):
    from sparkroach.functions.bwt import sbwt_compress, sbwt_decompress

    assert sbwt_decompress(sbwt_compress(raw)) == raw


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=-10, max_value=10),
        ),
        max_size=300,
    )
)
def test_dvi_roundtrip_property(vals):
    from sparkroach.functions.varint import dvi_decode, dvi_encode

    assert dvi_decode(dvi_encode(vals)) == vals


@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(
        st.one_of(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=-3, max_value=3),  # tiny-residual regime
        ),
        max_size=250,
    )
)
def test_rice_roundtrip_property(samples):
    from sparkroach.functions.rice import rice_compress, rice_decompress

    assert rice_decompress(rice_compress(samples)) == samples


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.one_of(
            st.binary(max_size=60),
            st.builds(
                lambda b, n: b * n,
                st.binary(min_size=1, max_size=3),
                st.integers(1, 60),
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_tiff_packbits_roundtrip_property(rows):
    from sparkroach.functions.tiff import packbits_decode, packbits_encode

    for row in rows:
        assert packbits_decode(packbits_encode(row), len(row)) == row
