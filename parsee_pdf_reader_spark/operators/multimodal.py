"""Multimodal column plumbing: opaque binary media + typed metadata.

Real image/audio decode libraries are not in this container, so the
decode step is STUBBED: ``decode_media`` parses the deterministic
PIMG1/PAUD1 synthetic headers (schema, partitioning, Arrow batch shape
and UDF signatures are all real); ``use_real_decoder=True`` raises
``NotImplementedError`` exactly where PIL/ffmpeg would plug in.

Scale notes: media rows are large and heavy-tailed — the same
``rebalance_by_size`` used for documents applies; decode is a pure
``mapInPandas`` stage (no shuffle), and metadata-only queries never
touch the payload column thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from parsee_pdf_reader_spark.plans.queries import _t, register

MEDIA_SCHEMA = ("doc_id long, kind string, media binary, "
                "meta struct<declared_w int, declared_h int, channels int>")

DECODED_SCHEMA = ("doc_id long, kind string, n_bytes int, width int, "
                  "height int, channels int, n_frames int, "
                  "payload_sha string, error string")


def build_media_blob(doc_id: int) -> tuple:
    """Deterministic fake media bytes: header + pseudo-payload."""
    kind = ["image", "audio", "video"][doc_id % 3]
    seed = hashlib.blake2b(f"media:{doc_id}".encode(),
                           digest_size=8).digest()
    w = 16 + (seed[0] % 64) * 4
    h = 16 + (seed[1] % 64) * 4
    ch = 1 + (seed[2] % 3)
    frames = 1 if kind == "image" else 1 + seed[3] % 24
    payload = (seed * ((w * h // 16) + 1))[: w * h // 4]
    if kind == "image":
        head = b"PIMG1" + struct.pack("<HHB", w, h, ch)
    elif kind == "audio":
        head = b"PAUD1" + struct.pack("<IHB", w * h, 1 + seed[4] % 2, 16)
    else:
        head = b"PVID1" + struct.pack("<HHBB", w, h, ch, frames)
    return kind, w, h, ch, frames, head + payload


def make_media_df(spark, docs_df: DataFrame) -> DataFrame:
    """documents -> media table (executor-side generation, pure map)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                kind, w, h, ch, _fr, blob = build_media_blob(int(doc_id))
                rows.append({"doc_id": int(doc_id), "kind": kind,
                             "media": blob,
                             "meta": {"declared_w": w, "declared_h": h,
                                      "channels": ch}})
            if rows:
                yield pd.DataFrame(rows)

    return docs_df.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_media(media_df: DataFrame,
                 use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract stage. The stub parses the
    deterministic headers; a real decoder plugs in at the marked point
    with identical schema/batching."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for doc_id, kind, blob in zip(pdf["doc_id"], pdf["kind"],
                                          pdf["media"]):
                b = bytes(blob)
                rec = {"doc_id": int(doc_id), "kind": kind,
                       "n_bytes": len(b), "width": None, "height": None,
                       "channels": None, "n_frames": None,
                       "payload_sha": None, "error": None}
                try:
                    if use_real_decoder:
                        raise NotImplementedError(
                            "real decoder (PIL/ffmpeg) not available in "
                            "this container")
                    if b[:5] == b"PIMG1":
                        w, h, ch = struct.unpack_from("<HHB", b, 5)
                        rec.update(width=w, height=h, channels=ch,
                                   n_frames=1)
                        payload = b[10:]
                    elif b[:5] == b"PAUD1":
                        n, nch, bits = struct.unpack_from("<IHB", b, 5)
                        rec.update(width=n, height=bits, channels=nch,
                                   n_frames=1)
                        payload = b[12:]
                    elif b[:5] == b"PVID1":
                        w, h, ch, fr = struct.unpack_from("<HHBB", b, 5)
                        rec.update(width=w, height=h, channels=ch,
                                   n_frames=fr)
                        payload = b[11:]
                    else:
                        raise ValueError("unknown media container")
                    rec["payload_sha"] = hashlib.sha256(payload).hexdigest()
                except Exception as e:
                    rec["error"] = f"{type(e).__name__}: {e}"
                rows.append(rec)
            if rows:
                yield pd.DataFrame(rows)

    return media_df.select("doc_id", "kind", "media").mapInPandas(
        run, schema=DECODED_SCHEMA)


def frame_sample(media_df: DataFrame, every_n: int = 4) -> DataFrame:
    """Deterministic frame sampling for video rows: one output row per
    sampled frame index (explode is the correct shape: frames are
    downstream units of work)."""
    decoded = decode_media(media_df)
    vids = decoded.where(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return vids.select(
        "doc_id", F.explode(idx).alias("frame_idx"),
        "width", "height", "channels")


# --- oracle-checkable binary-column surface ---

@register(
    "media_binary_stats",
    """
    select doc_id,
           octet_length(encode(text)) as n_bytes,
           lower(substr(hex(encode(text)), 1, 16)) as hex_prefix,
           md5(text) as content_hash
    from documents
    """,
)
def q_media_binary_stats(spark, sf_dir):
    """Binary-column handling checkable in SQL: utf-8 payload bytes,
    hex prefix, content hash (the metadata-only access pattern that
    never reads a payload at scale)."""
    docs = _t(spark, sf_dir, "documents")
    blob = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.lower(F.substring(F.hex(blob), 1, 16)).alias("hex_prefix"),
        F.md5(F.encode("text", "utf-8")).alias("content_hash"),
    )


def media_decode_query(spark, sf_dir):
    """rows-only check: synthesize media + decode stub end to end."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return decode_media(make_media_df(spark, docs))
