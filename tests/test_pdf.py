"""functions/pdf.py: roundtrip properties and the strict-failure matrix.

The gate (documents_pdf_text_ingest) proves the Spark lane end-to-end;
these tests pin the codec itself — including every malformation class
the parser's clean-failure contract promises to raise on."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkroach.functions.pdf import PdfError, build_pdf, parse_pdf_text


def _roundtrip(docs):
    return parse_pdf_text(build_pdf(docs))


def test_roundtrip_basic_and_order():
    docs = [(7, "hello world"), (3, "second page"), (11, "third")]
    got = _roundtrip(docs)
    assert got == [{"doc_id": i, "text": t} for i, t in docs]


def test_roundtrip_escapes_and_unicode():
    texts = [
        "parens (nested (deep)) and \\ backslash",
        ")( unbalanced )(",
        "newline\nand tab\t survive as bytes",
        "unicode: naïve café — 日本語 ✓",
        "",
    ]
    got = _roundtrip(list(enumerate(texts)))
    assert [g["text"] for g in got] == texts


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_roundtrip_property(texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    assert _roundtrip(docs) == [
        {"doc_id": i, "text": t} for i, t in docs
    ]


def test_xref_offsets_land_on_object_headers():
    data = build_pdf([(0, "abc"), (1, "def")])
    sx = data.rfind(b"startxref")
    xref_at = int(data[sx + 9:].split()[0])
    lines = data[xref_at:].split(b"\n")
    count = int(lines[1].split()[1])
    for k in range(1, count):
        off = int(lines[2 + k][:10])
        assert data[off:].startswith(b"%d 0 obj" % k)


# ---------------------------------------------------------------------------
# strict-failure matrix: every malformation class raises PdfError
# ---------------------------------------------------------------------------

GOOD = build_pdf([(0, "alpha beta"), (1, "gamma (x) d")])


def test_rejects_missing_header():
    with pytest.raises(PdfError, match="PDF header"):
        parse_pdf_text(GOOD[5:])


def test_rejects_truncated_eof():
    with pytest.raises(PdfError, match="EOF"):
        parse_pdf_text(GOOD[:-7])


def test_rejects_corrupt_startxref_pointer():
    bad = re.sub(
        rb"startxref\n(\d+)", b"startxref\n1", GOOD, count=1
    )
    with pytest.raises(PdfError, match="startxref"):
        parse_pdf_text(bad)


def test_rejects_shifted_xref_offset():
    # corrupt ONE xref entry so it no longer lands on its object header
    m = re.search(rb"\n(\d{10}) 00000 n \n", GOOD)
    assert m
    off = int(m.group(1))
    bad = GOOD.replace(
        b"%010d 00000 n " % off, b"%010d 00000 n " % (off + 1), 1
    )
    with pytest.raises(PdfError, match="does not land on its header"):
        parse_pdf_text(bad)


def test_rejects_length_endstream_disagreement():
    # shrink a declared /Length by one: endstream no longer lines up
    m = re.search(rb"/Length (\d+) >>", GOOD)
    assert m
    n = int(m.group(1))
    bad = GOOD.replace(
        b"/Length %d >>" % n, b"/Length %d >>" % (n - 1), 1
    )
    with pytest.raises(PdfError, match="endstream"):
        parse_pdf_text(bad)


def test_rejects_kids_count_disagreement():
    bad = GOOD.replace(b"/Count 2", b"/Count 3", 1)
    with pytest.raises(PdfError, match="Count"):
        parse_pdf_text(bad)


def test_rejects_unknown_escape():
    # \q is not a legal escape in the writer's set
    bad = GOOD.replace(b"alpha beta", b"alpha\\q be", 1)
    assert len(bad) == len(GOOD)  # same /Length stays valid
    with pytest.raises(PdfError, match="escape"):
        parse_pdf_text(bad)


def test_rejects_non_tj_content():
    bad = GOOD.replace(b" Tj ET", b" TJ ET", 1)
    with pytest.raises(PdfError, match="Tj"):
        parse_pdf_text(bad)
