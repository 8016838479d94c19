"""Pin golden extraction dumps for the driver-gate oracles.

Produces parquet fixtures under ``fixtures/`` by running the ACTUAL
reference engine (imported via tests/refshim) over the exact corpus the
Spark queries synthesize at sf0.01:

- ``golden_flagship_sf0.01.parquet`` — per-page reference output in the
  ``extract_pages_flagship`` shape (url, page_index, extracted_text,
  n_tables, n_paragraphs, n_elements, error);
- ``golden_tables_sf0.01.parquet`` — per-CELL reference table output in
  the (scalar) ``tables_df_format`` shape;
- ``golden_web_sf0.01.parquet`` — generator-known truth for the HTML
  main-content extractor (title/main_text/n_kept are derived from the
  corpus generator, NOT from the extractor — an independent oracle);
- ``golden_media_sf0.01.parquet`` — generator-known truth for the
  media decode stub: every field is RE-DERIVED here from the PIMG1/
  PAUD1/PVID1 container spec (seed math duplicated on purpose), not
  read back through ``decode_media``;
- ``golden_pdf_sf0.01.parquet`` — the REAL-%PDF flagship oracle: the
  reference engine (refshim) run over the pages pdf_mini decodes from
  synth-written PDFs, in the flagship row shape. This pins the kernel
  byte-identically on the %PDF path; the decode stage itself is pinned
  by the real-fixture golden counts in tests/test_real_pdf.py.

These fixtures turn the byte-identity pytest gate into driver-visible
``hash_match`` green rows: the DuckDB twin is a plain SELECT over the
fixture, compared against the live Spark extraction.

Usage: python tools/make_goldens.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "fixtures"
    os.makedirs(out_dir, exist_ok=True)
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace("sf", "sf")

    import pyarrow as pa
    import pyarrow.parquet as pq

    from refadapter import reference_extract_document

    from parsee_pdf_reader_spark.sources import layout_codec as codec
    from parsee_pdf_reader_spark.sources.pdf_mini import parse_pdf_mini
    from parsee_pdf_reader_spark.sources.synth import (
        build_document,
        build_html_document,
        build_pdf_document,
    )

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pylist()
    print(f"{len(docs)} documents from {sf_dir}")

    import hashlib

    def media_truth(doc_id: int) -> dict:
        """Expected decode_media output, derived from the container
        SPEC (operators/multimodal.py build_media_blob docs), not from
        the decoder: seed -> dims -> header length -> payload sha."""
        kind = ["image", "audio", "video"][doc_id % 3]
        seed = hashlib.blake2b(f"media:{doc_id}".encode(),
                               digest_size=8).digest()
        w = 16 + (seed[0] % 64) * 4
        h = 16 + (seed[1] % 64) * 4
        ch = 1 + (seed[2] % 3)
        payload = (seed * ((w * h // 16) + 1))[: w * h // 4]
        if kind == "image":
            head_len, width, height, channels, frames = 10, w, h, ch, 1
        elif kind == "audio":
            nch = 1 + seed[4] % 2
            head_len, width, height, channels, frames = \
                12, w * h, 16, nch, 1
        else:
            fr = 1 + seed[3] % 24
            head_len, width, height, channels, frames = 11, w, h, ch, fr
        return {"doc_id": doc_id, "kind": kind,
                "n_bytes": head_len + len(payload),
                "width": width, "height": height, "channels": channels,
                "n_frames": frames,
                "payload_sha": hashlib.sha256(payload).hexdigest(),
                "error": None}

    flag_rows, cell_rows, web_rows, pdf_rows = [], [], [], []
    media_rows = [media_truth(int(d["doc_id"])) for d in docs]

    from __spark_entry__ import _PDF_DOCS  # single source of truth
    for d in docs:
        doc_id = int(d["doc_id"])
        if doc_id >= _PDF_DOCS:
            continue
        url = f"https://pdf.example/doc{doc_id}.pdf"
        blob = build_pdf_document(f"doc{doc_id}", 42, d["text"])
        err = None
        try:
            pages = parse_pdf_mini(blob)
            enc = codec.encode_document(pages)
            prows = reference_extract_document(enc) if pages else []
        except Exception as e:
            prows, err = [], f"{type(e).__name__}: {e}"
        if prows:
            for pg in prows:
                pdf_rows.append({
                    "url": url, "page_index": pg["page_index"],
                    "extracted_text": pg["extracted_text"],
                    "n_tables": len(pg["tables"]),
                    "n_paragraphs": len(pg["paragraphs"]),
                    "n_elements": pg["n_elements"], "error": None})
        else:
            pdf_rows.append({"url": url, "page_index": -1,
                             "extracted_text": None, "n_tables": None,
                             "n_paragraphs": None, "n_elements": None,
                             "error": err or "EmptyDocument: 0 pages"})
    for d in docs:
        doc_id = int(d["doc_id"])
        key = f"doc{doc_id}"
        url = f"https://host{doc_id % 97}.example/{key}.pdf"
        blob, _ = build_document(key, 42, d["text"])
        err = None
        try:
            pages = reference_extract_document(blob)
        except Exception as e:  # mirror pipeline._doc_to_rows error rows
            pages, err = [], f"{type(e).__name__}: {e}"
        if pages:
            for pg in pages:
                flag_rows.append({
                    "url": url, "page_index": pg["page_index"],
                    "extracted_text": pg["extracted_text"],
                    "n_tables": len(pg["tables"]),
                    "n_paragraphs": len(pg["paragraphs"]),
                    "n_elements": pg["n_elements"], "error": None})
                for t_pos, t in enumerate(pg["tables"]):
                    for row_idx, li in enumerate(t["items"]):
                        for col_idx, cell in enumerate(li["values"]):
                            cell_rows.append({
                                "url": url,
                                "page_index": pg["page_index"],
                                "table_pos": t_pos,
                                "g_index": t["g_index"],
                                "row_idx": row_idx,
                                "item": li["caption"],
                                "col_idx": col_idx,
                                "cell_v": cell["v"],
                                "cell_n": cell["n"]})
        else:
            flag_rows.append({"url": url, "page_index": -1,
                              "extracted_text": None, "n_tables": None,
                              "n_paragraphs": None, "n_elements": None,
                              "error": err or "EmptyDocument: 0 pages"})

        # web golden: truth comes from the GENERATOR (build_html_document
        # returns the expected main text; title is embedded verbatim)
        html, golden_main = build_html_document(key, 42, d["text"])
        m = re.search(rb"<title>(.*?)</title>", html, re.S)
        title = " ".join(m.group(1).decode("utf-8").split()) if m else ""
        web_rows.append({
            "url": f"https://h.example/{doc_id}",
            "title": title,
            "main_text": golden_main,
            "n_kept": len(golden_main.split("\n\n")) if golden_main else 0,
        })

    flag_schema = pa.schema([
        ("url", pa.string()), ("page_index", pa.int32()),
        ("extracted_text", pa.string()), ("n_tables", pa.int32()),
        ("n_paragraphs", pa.int32()), ("n_elements", pa.int32()),
        ("error", pa.string())])
    cell_schema = pa.schema([
        ("url", pa.string()), ("page_index", pa.int32()),
        ("table_pos", pa.int32()), ("g_index", pa.int32()),
        ("row_idx", pa.int32()), ("item", pa.string()),
        ("col_idx", pa.int32()), ("cell_v", pa.string()),
        ("cell_n", pa.string())])
    web_schema = pa.schema([
        ("url", pa.string()), ("title", pa.string()),
        ("main_text", pa.string()), ("n_kept", pa.int32())])
    media_schema = pa.schema([
        ("doc_id", pa.int64()), ("kind", pa.string()),
        ("n_bytes", pa.int32()), ("width", pa.int32()),
        ("height", pa.int32()), ("channels", pa.int32()),
        ("n_frames", pa.int32()), ("payload_sha", pa.string()),
        ("error", pa.string())])

    for name, rows, schema in (
            (f"golden_flagship_{sf_tag}.parquet", flag_rows, flag_schema),
            (f"golden_tables_{sf_tag}.parquet", cell_rows, cell_schema),
            (f"golden_web_{sf_tag}.parquet", web_rows, web_schema),
            (f"golden_media_{sf_tag}.parquet", media_rows, media_schema),
            (f"golden_pdf_{sf_tag}.parquet", pdf_rows, flag_schema)):
        path = os.path.join(out_dir, name)
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), path,
                       compression="zstd")
        print(f"wrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
