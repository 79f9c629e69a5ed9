"""From-scratch minimal PDF writer + strict text extractor (stdlib only).

The lane mirrors the repo's other engine-native format codecs (WARC
``functions/warc.py``, Avro OCF ``sources/avro_ocf.py``, WebDataset
``functions/wds.py``): a 100 TB document pipeline meets PDF as an INPUT
format, and the part of PDF that matters for text extraction is the
FILE STRUCTURE — objects, cross-reference table, page tree, content
streams — not rendering.  This module implements exactly that subset of
ISO 32000-1 (PDF 1.4 profile):

Writer (:func:`build_pdf`):
  - one page per document; the text is a single uncompressed content
    stream ``BT /F1 12 Tf 72 720 Td (...) Tj ET`` with the three
    string escapes the spec requires (``\\``, ``(``, ``)``);
  - a correct classic cross-reference table (20-byte entries, byte
    offsets) and trailer — the structural core of the format;
  - each page carries the originating ``doc_id`` in a private
    ``/SparkroachDocId`` entry (private keys are spec-legal; second
    consumers must ignore them), so ingest can verify page-order vs
    metadata agreement exactly like the WebDataset lane does.

Parser (:func:`parse_pdf_text`) — STRICT, every malformation raises
``ValueError``:
  - header magic, ``startxref`` pointer, xref subsection arithmetic,
    per-object offset validation (the offset must land on the exact
    ``N 0 obj`` header it claims);
  - page tree walked from the trailer's ``/Root`` through ``/Pages``
    ``/Kids``; ``/Contents`` streams length-checked against their
    ``/Length`` and terminator-checked (``endstream``/``endobj``);
  - ``Tj`` string operands un-escaped with the writer's escape set;
    an unknown backslash escape, an unterminated string, or a stream
    whose declared length crosses ``endstream`` all raise.

What is deliberately OUT of scope (a text pipeline triages these to a
rendering service, the posture the MP4 'avc1' probe documents):
compressed object streams, xref streams (PDF 1.5+), encryption, fonts
beyond the one standard Helvetica reference, and layout reconstruction.
"""

from __future__ import annotations

__all__ = ["build_pdf", "parse_pdf_text", "PdfError"]


class PdfError(ValueError):
    """Malformed PDF input (strict-parse contract)."""


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _esc(text: str) -> bytes:
    # PDF strings are byte strings; UTF-8 payload keeps the roundtrip
    # lossless for any text (the spec leaves the encoding of non-text
    # string objects to the producer)
    out = text.encode("utf-8")
    return (
        out.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
    )


def build_pdf(docs) -> bytes:
    """``docs``: iterable of (doc_id, text) → one single-page-per-doc PDF.

    Object layout: 1 = catalog, 2 = pages root, 3 = font, then for the
    i-th document objects ``4+2i`` (page) and ``5+2i`` (content stream).
    """
    docs = list(docs)
    objs: list[bytes] = []  # bodies, object number = index + 1

    n_pages = len(docs)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [ {kids} ] /Count {n_pages} >>".encode()
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, (doc_id, text) in enumerate(docs):
        stream = b"BT /F1 12 Tf 72 720 Td (" + _esc(text) + b") Tj ET"
        page = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/SparkroachDocId {int(doc_id)} "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>"
        ).encode()
        objs.append(page)
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )

    buf = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % num
        buf += body
        buf += b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)


# ---------------------------------------------------------------------------
# strict parser
# ---------------------------------------------------------------------------


def _unesc(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C:  # backslash
            if i + 1 >= len(raw):
                raise PdfError("dangling backslash in string")
            nxt = raw[i + 1]
            if nxt in (0x5C, 0x28, 0x29):
                out.append(nxt)
                i += 2
                continue
            raise PdfError(f"unsupported escape \\{chr(nxt)!r}")
        out.append(b)
        i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise PdfError("string payload is not valid UTF-8") from exc


def _read_xref(data: bytes) -> tuple[list[int], int]:
    """Return (object byte offsets indexed by objnum-1, root objnum)."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("missing %PDF header")
    tail = data.rstrip()
    if not tail.endswith(b"%%EOF"):
        raise PdfError("missing %%EOF")
    sx = data.rfind(b"startxref")
    if sx < 0:
        raise PdfError("missing startxref")
    try:
        xref_at = int(data[sx + len(b"startxref"):].split()[0])
    except (ValueError, IndexError) as exc:
        raise PdfError("bad startxref pointer") from exc
    if not (0 <= xref_at < len(data)) or not data[xref_at:].startswith(
        b"xref"
    ):
        raise PdfError("startxref does not point at an xref table")
    lines = data[xref_at:].split(b"\n")
    if lines[0].strip() != b"xref":
        raise PdfError("xref keyword missing")
    try:
        first, count = (int(x) for x in lines[1].split())
    except ValueError as exc:
        raise PdfError("bad xref subsection header") from exc
    if first != 0:
        raise PdfError("xref subsection must start at object 0")
    offsets: list[int] = []
    for k in range(1, count):  # skip the object-0 free entry
        ent = lines[2 + k]
        if len(ent.rstrip()) < 18:
            raise PdfError(f"short xref entry for object {k}")
        off = int(ent[:10])
        if ent[17:18] != b"n":
            raise PdfError(f"object {k}: expected in-use xref entry")
        header = b"%d 0 obj" % k
        if not data[off:].startswith(header):
            raise PdfError(
                f"xref offset for object {k} does not land on its header"
            )
        offsets.append(off)
    tr = data.rfind(b"trailer")
    if tr < 0 or tr > sx:
        raise PdfError("missing trailer")
    import re

    m = re.search(rb"/Root\s+(\d+)\s+0\s+R", data[tr:sx])
    if not m:
        raise PdfError("trailer has no /Root")
    return offsets, int(m.group(1))


def _obj_body(data: bytes, offsets: list[int], num: int) -> bytes:
    if not (1 <= num <= len(offsets)):
        raise PdfError(f"reference to unknown object {num}")
    start = offsets[num - 1]
    end = data.find(b"endobj", start)
    if end < 0:
        raise PdfError(f"object {num}: missing endobj")
    body = data[start:end]
    return body[body.index(b"obj") + 3:]


def parse_pdf_text(data: bytes) -> list[dict]:
    """Extract per-page text: [{'doc_id': int, 'text': str}, ...] in
    page-tree order.  Raises :class:`PdfError` on any malformation."""
    import re

    offsets, root = _read_xref(data)
    cat = _obj_body(data, offsets, root)
    m = re.search(rb"/Pages\s+(\d+)\s+0\s+R", cat)
    if not m:
        raise PdfError("catalog has no /Pages")
    pages = _obj_body(data, offsets, int(m.group(1)))
    kids = re.search(rb"/Kids\s*\[(.*?)\]", pages, re.S)
    cnt = re.search(rb"/Count\s+(\d+)", pages)
    if not kids or not cnt:
        raise PdfError("pages node missing /Kids or /Count")
    kid_nums = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", kids.group(1))]
    if len(kid_nums) != int(cnt.group(1)):
        raise PdfError("/Count disagrees with /Kids length")
    out: list[dict] = []
    for pn in kid_nums:
        page = _obj_body(data, offsets, pn)
        if b"/Type /Page" not in page:
            raise PdfError(f"object {pn} is not a /Page")
        did = re.search(rb"/SparkroachDocId\s+(\d+)", page)
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", page)
        if not did or not cm:
            raise PdfError(f"page {pn} missing /SparkroachDocId or /Contents")
        cobj = _obj_body(data, offsets, int(cm.group(1)))
        lm = re.search(rb"/Length\s+(\d+)", cobj)
        if not lm:
            raise PdfError("content stream without /Length")
        length = int(lm.group(1))
        sk = cobj.find(b"stream")
        if sk < 0 or cobj[sk + 6:sk + 7] != b"\n":
            raise PdfError("malformed stream keyword")
        payload = cobj[sk + 7:sk + 7 + length]
        if len(payload) != length:
            raise PdfError("stream shorter than declared /Length")
        if cobj[sk + 7 + length:sk + 7 + length + 10] != b"\nendstream":
            raise PdfError("declared /Length does not end at endstream")
        sm = re.match(
            rb"BT /F1 12 Tf 72 720 Td \((.*)\) Tj ET\Z", payload, re.S
        )
        if not sm:
            raise PdfError("content stream is not a single Tj text op")
        out.append(
            {"doc_id": int(did.group(1)), "text": _unesc(sm.group(1))}
        )
    return out
