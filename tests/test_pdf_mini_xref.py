"""Cross-reference-chain tests for pdf_mini (ADVICE r2 items).

The decoder must honour the xref/startxref chain when present —
in particular for incrementally-updated PDFs whose newest object
versions live inside object streams (signed/annotated files), where
the round-2 brute-scan-only resolution silently returned stale
objects. Also pins the adversarial-input guards: bfrange span clamp
and page-tree cycle/duplication containment.
"""

import zlib

from parsee_pdf_reader_spark.sources.pdf_mini import (
    MiniPdf,
    _parse_tounicode,
    parse_pdf_mini,
)


def _page_text(pdf_bytes: bytes) -> str:
    pages = parse_pdf_mini(pdf_bytes)
    out = []
    for pg in pages:
        for box in pg.boxes:
            for line in box.lines:
                out.append("".join(c.text for c in line))
    return "".join(out)


def _content_obj(text: str) -> bytes:
    stream = (f"BT /F1 10 Tf 1 0 0 1 50 700 Tm ({text}) Tj ET"
              ).encode()
    return (f"<</Length {len(stream)}>>\nstream\n".encode()
            + stream + b"\nendstream")


def _classic_xref(offsets_by_num: dict, root=1, prev=None) -> bytes:
    """One-entry-per-subsection classic xref table + trailer."""
    out = b"xref\n"
    for num in sorted(offsets_by_num):
        out += f"{num} 1\n{offsets_by_num[num]:010d} 00000 n \n".encode()
    trailer = f"<</Size {max(offsets_by_num) + 1}/Root {root} 0 R"
    if prev is not None:
        trailer += f"/Prev {prev}"
    trailer += ">>"
    return out + b"trailer\n" + trailer.encode() + b"\n"


def _xref_stream_obj(num: int, entries: dict, size: int,
                     prev=None) -> bytes:
    """/XRef stream object: entries = {obj_num: (type, f2, f3)}."""
    rows = b""
    index = []
    for onum in sorted(entries):
        t, f2, f3 = entries[onum]
        rows += bytes([t]) + f2.to_bytes(3, "big") + bytes([f3])
        index.append(f"{onum} 1")
    data = zlib.compress(rows)
    d = (f"<</Type/XRef/W[1 3 1]/Index[{' '.join(index)}]"
         f"/Size {size}/Root 1 0 R"
         + (f"/Prev {prev}" if prev is not None else "")
         + f"/Filter/FlateDecode/Length {len(data)}>>")
    return d.encode() + b"\nstream\n" + data + b"\nendstream"


def _objstm_obj(members: dict) -> bytes:
    """/ObjStm holding {obj_num: serialized_dict_bytes}."""
    offs = []
    body = b""
    for onum in sorted(members):
        offs.append(f"{onum} {len(body)}")
        body += members[onum] + b" "
    header = (" ".join(offs) + " ").encode()
    payload = header + body
    data = zlib.compress(payload)
    return (f"<</Type/ObjStm/N {len(members)}/First {len(header)}"
            f"/Filter/FlateDecode/Length {len(data)}>>"
            ).encode() + b"\nstream\n" + data + b"\nendstream"


def _assemble(objs: dict, tail_builder) -> bytes:
    """objs = {num: body}; tail_builder(offsets) -> bytes appended."""
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    out += tail_builder(dict(offsets), len(out))
    return bytes(out)


_BASE_OBJS = {
    1: b"<</Type/Catalog/Pages 2 0 R>>",
    2: b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
    3: (b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</Font<</F1 7 0 R>>>>/Contents 4 0 R>>"),
    4: _content_obj("OLD"),
    7: b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
}


def _base_pdf() -> bytes:
    def tail(offsets, here):
        return (_classic_xref(offsets)
                + f"startxref\n{here}\n%%EOF\n".encode())

    return _assemble(_BASE_OBJS, tail)


def test_incremental_update_objstm_overrides_direct():
    """Newest version of the Page object lives in an /ObjStm named by
    the newest xref section -> its /Contents must win over the stale
    direct object (ADVICE r2 medium: stale silent resolution)."""
    base = _base_pdf()
    base_xref_at = base.rfind(b"xref\n")

    # update: new content (5), ObjStm (6) with Page v2 -> Contents 5,
    # xref stream (8) marking obj 3 as type-2 member 0 of stream 6
    page_v2 = (b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
               b"/Resources<</Font<</F1 7 0 R>>>>/Contents 5 0 R>>")
    upd = bytearray(base)
    offs = {}
    for num, body in [(5, _content_obj("NEW")),
                      (6, _objstm_obj({3: page_v2}))]:
        offs[num] = len(upd)
        upd += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref2_at = len(upd)
    entries = {3: (2, 6, 0), 5: (1, offs[5], 0), 6: (1, offs[6], 0),
               8: (1, xref2_at, 0)}
    upd += (b"8 0 obj\n"
            + _xref_stream_obj(8, entries, size=9, prev=base_xref_at)
            + b"\nendobj\n")
    upd += f"startxref\n{xref2_at}\n%%EOF\n".encode()

    assert _page_text(bytes(upd)) == "NEW"
    # and the un-updated base still reads OLD
    assert _page_text(base) == "OLD"


def test_xref_direct_beats_later_objstm():
    """When the newest xref names a DIRECT object as live, a
    later-in-file ObjStm holding a stale version must NOT win (guards
    the later-wins heuristic behind xref authority)."""
    objs = dict(_BASE_OBJS)
    objs[4] = _content_obj("NEW")
    page_v_old = (b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
                  b"/Resources<</Font<</F1 7 0 R>>>>/Contents 9 0 R>>")
    objs[9] = _content_obj("STALE")
    objs[10] = _objstm_obj({3: page_v_old})  # later in file than 3

    def tail(offsets, here):
        entries = {n: (1, offsets[n], 0) for n in offsets}
        entries[11] = (1, here, 0)
        return (b"11 0 obj\n"
                + _xref_stream_obj(11, entries, size=12)
                + b"\nendobj\n"
                + f"startxref\n{here}\n%%EOF\n".encode())

    assert _page_text(_assemble(objs, tail)) == "NEW"


def test_no_xref_later_objstm_wins():
    """Broken/absent xref chain: the brute scan applies 'later
    definitions win' — an ObjStm later in the file supersedes an
    earlier direct definition (incremental-update heuristic)."""
    objs = dict(_BASE_OBJS)
    page_v2 = (b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
               b"/Resources<</Font<</F1 7 0 R>>>>/Contents 5 0 R>>")
    objs[5] = _content_obj("NEW")
    objs[10] = _objstm_obj({3: page_v2})

    def tail(offsets, here):
        return b"%%EOF\n"  # no xref at all

    assert _page_text(_assemble(objs, tail)) == "NEW"


def test_classic_xref_chain_prev():
    """Classic-table /Prev chain: the newest section's direct entry
    wins over the base revision's."""
    base = _base_pdf()
    base_xref_at = base.rfind(b"xref\n")
    upd = bytearray(base)
    off4 = len(upd)
    upd += b"4 0 obj\n" + _content_obj("NEW") + b"\nendobj\n"
    xref2_at = len(upd)
    upd += _classic_xref({4: off4}, prev=base_xref_at)
    upd += f"startxref\n{xref2_at}\n%%EOF\n".encode()
    assert _page_text(bytes(upd)) == "NEW"


def test_bfrange_span_clamped():
    """A corrupt <0000> <FFFFFFFF> bfrange must not hang/OOM: span is
    clamped to 65536 entries (ADVICE r2 medium)."""
    cmap = (b"beginbfrange\n<00000000> <FFFFFFFF> <0041>\nendbfrange\n")
    m = _parse_tounicode(cmap)
    assert len(m) == 65536
    assert m[0] == "A"


def test_page_tree_duplicate_kids_no_blowup():
    """Kids=[X,X] nested (ADVICE r2 low): each node walks once — no
    exponential expansion, page emitted a bounded number of times."""
    objs = {
        1: b"<</Type/Catalog/Pages 2 0 R>>",
        2: b"<</Type/Pages/Kids[3 0 R 3 0 R]/Count 2>>",
        3: b"<</Type/Pages/Kids[4 0 R 4 0 R]/Count 2>>",
        4: b"<</Type/Pages/Kids[5 0 R 5 0 R]/Count 2>>",
        5: (b"<</Type/Page/Parent 4 0 R/MediaBox[0 0 612 792]"
            b"/Contents 6 0 R>>"),
        6: _content_obj("P"),
        7: b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    }

    def tail(offsets, here):
        return (_classic_xref(offsets)
                + f"startxref\n{here}\n%%EOF\n".encode())

    doc = MiniPdf(_assemble(objs, tail))
    pages = doc.pages()
    assert len(pages) == 1  # visited-set: each node once


def test_page_tree_cycle_terminates():
    """A Kids cycle (2 -> 3 -> 2) terminates and yields no phantom
    pages."""
    objs = {
        1: b"<</Type/Catalog/Pages 2 0 R>>",
        2: b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        3: b"<</Type/Pages/Kids[2 0 R 5 0 R]/Count 1>>",
        5: (b"<</Type/Page/Parent 3 0 R/MediaBox[0 0 612 792]"
            b"/Contents 6 0 R>>"),
        6: _content_obj("P"),
    }

    def tail(offsets, here):
        return (_classic_xref(offsets)
                + f"startxref\n{here}\n%%EOF\n".encode())

    doc = MiniPdf(_assemble(objs, tail))
    assert len(doc.pages()) == 1
