"""From-spec Avro Object Container File codec (Apache Avro 1.11.1
specification, "Object Container Files" + "Binary Encoding" sections —
public). The sandbox has no spark-avro jar, so the container format is
implemented directly: zigzag-varint longs, length-prefixed UTF-8
strings, file-metadata map, 16-byte sync markers between data blocks,
and the ``deflate`` codec (RFC 1951 raw deflate via stdlib zlib).

This module is a WORKER LEAF: its functions ship to Python workers
inside ``mapInPandas`` bodies, so module scope imports only stdlib +
pandas (the repo's worker-import rule — see the verify recipe).

Reference parity note: the reference engine reads only whole-file CSV
(SURVEY.md §2.1 O2); Avro extends the sources row the same honest way
the from-spec JPEG/PNG/GIF decoders extended multimodal — no external
jars, everything from the public spec.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import pandas as pd

MAGIC = b"Obj\x01"
SYNC_LEN = 16
BLOCK_RECORDS = 500  # flush a data block every N records

DOC_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "source", "type": "string"},
        {"name": "n_chars", "type": "long"},
    ],
}


# ---------------------------------------------------------------- encode

def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return zigzag_encode(len(raw)) + raw


def _enc_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


def _enc_record(row: tuple, field_types: list[str]) -> bytes:
    out = bytearray()
    for v, t in zip(row, field_types):
        if t == "long":
            out += zigzag_encode(int(v))
        elif t == "string":
            out += _enc_str(str(v))
        else:  # pragma: no cover - encoder only emits long/string
            raise ValueError(f"unsupported avro type {t!r}")
    return bytes(out)


def write_container(
    path: str,
    rows,
    schema: dict = DOC_SCHEMA,
    sync: bytes | None = None,
    codec: str = "deflate",
) -> int:
    """Write an Avro Object Container File; returns the record count.

    Layout per spec: magic, file-metadata map (avro.schema JSON +
    avro.codec), sync marker, then data blocks of
    (record-count, byte-size, payload, sync marker). ``deflate``
    payloads are RFC 1951 raw deflate (no zlib header), per the spec's
    codec table.
    """
    if sync is None:
        import hashlib

        sync = hashlib.md5(path.encode()).digest()  # deterministic
    assert len(sync) == SYNC_LEN
    field_types = [f["type"] for f in schema["fields"]]
    n_total = 0
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        fh.write(zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            fh.write(_enc_str(k))
            fh.write(_enc_bytes(v))
        fh.write(zigzag_encode(0))  # end of metadata map
        fh.write(sync)

        block = bytearray()
        in_block = 0

        def _flush() -> None:
            nonlocal block, in_block
            if not in_block:
                return
            payload = bytes(block)
            if codec == "deflate":
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            fh.write(zigzag_encode(in_block))
            fh.write(zigzag_encode(len(payload)))
            fh.write(payload)
            fh.write(sync)
            block = bytearray()
            in_block = 0

        for row in rows:
            block += _enc_record(row, field_types)
            in_block += 1
            n_total += 1
            if in_block >= BLOCK_RECORDS:
                _flush()
        _flush()
    return n_total


# ---------------------------------------------------------------- decode

def zigzag_decode(buf, pos: int) -> tuple[int, int]:
    """Decode one Avro long at ``pos``; returns (value, new_pos)."""
    u = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _dec_str(buf, pos: int) -> tuple[str, int]:
    n, pos = zigzag_decode(buf, pos)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _dec_bytes(buf, pos: int) -> tuple[bytes, int]:
    n, pos = zigzag_decode(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


def read_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse a whole container file; returns (schema, record tuples).

    Validates the magic, walks the metadata map to find avro.schema /
    avro.codec, then decodes every data block, checking the 16-byte
    sync marker after each (a mismatched marker means a torn or
    mis-framed block — fail loudly, never resync silently here)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            _, pos = zigzag_decode(data, pos)
        for _ in range(n):
            k, pos = _dec_str(data, pos)
            v, pos = _dec_bytes(data, pos)
            meta[k] = v
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = data[pos : pos + SYNC_LEN]
    pos += SYNC_LEN
    field_types = [f["type"] for f in schema["fields"]]

    records: list[tuple] = []
    size = len(data)
    while pos < size:
        n_rec, pos = zigzag_decode(data, pos)
        n_bytes, pos = zigzag_decode(data, pos)
        payload = data[pos : pos + n_bytes]
        pos += n_bytes
        if data[pos : pos + SYNC_LEN] != sync:
            raise ValueError("sync marker mismatch (torn block)")
        pos += SYNC_LEN
        if codec == "deflate":
            payload = zlib.decompressobj(-15).decompress(payload)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        p = 0
        for _ in range(n_rec):
            vals = []
            for t in field_types:
                if t == "long":
                    v, p = zigzag_decode(payload, p)
                elif t == "string":
                    v, p = _dec_str(payload, p)
                else:
                    raise ValueError(f"unsupported avro type {t!r}")
                vals.append(v)
            records.append(tuple(vals))
        if p != len(payload):
            raise ValueError("trailing bytes inside data block")
    return schema, records


# ------------------------------------------------- mapInPandas adapters

def avro_write_partition(batches, out_dir: str):
    """mapInPandas body: serialize one whole input partition into one
    container file under ``out_dir``; emits (path, n_records)."""
    import os
    import uuid

    rows = []
    for pdf in batches:
        rows.extend(
            (int(d), str(lg), str(s), int(nc))
            for d, lg, s, nc in zip(
                pdf["doc_id"], pdf["lang"], pdf["source"], pdf["n_chars"]
            )
        )
    if rows:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")
        n = write_container(path, rows)
        yield pd.DataFrame({"path": [path], "n_records": [n]})


def avro_decode_files(batches):
    """mapInPandas body over binaryFile rows: decode each container
    back to (doc_id, lang, source, n_chars) rows."""
    for pdf in batches:
        out = {"doc_id": [], "lang": [], "source": [], "n_chars": []}
        for blob in pdf["content"]:
            _, records = read_container(bytes(blob))
            for doc_id, lang, source, n_chars in records:
                out["doc_id"].append(doc_id)
                out["lang"].append(lang)
                out["source"].append(source)
                out["n_chars"].append(n_chars)
        yield pd.DataFrame(out)
