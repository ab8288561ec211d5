"""Multimodal decode-hook tests.

Covers the two contracts VERDICT r3 flagged:
- the ASCII-testdata assumption behind the byte-vs-character oracle
  equivalence (attach_payload docstring) is pinned so a fixture change
  fails HERE instead of silently drifting the DuckDB oracles;
- decode_real's dispatch path (modality → codec module → ndarray) is
  exercised with a monkeypatched fake codec, so the only untestable
  line in this environment is the import itself.
"""

from __future__ import annotations

import sys
import types

import duckdb
import numpy as np
import pandas as pd
import pytest

from mini_sql_engine_spark.operators import multimodal


def test_fixture_text_is_ascii(sf_dir):
    """Spark multimodal ops measure payload BYTES; the DuckDB oracles
    measure text CHARACTERS. Equivalent only for pure-ASCII text."""
    (n,) = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE len(text) != octet_length(encode(text))"
    ).fetchone()
    assert n == 0, (
        f"{n} non-ASCII document texts in {sf_dir}: the byte-based Spark "
        "multimodal operators no longer match the character-based DuckDB "
        "oracles — rewrite the oracles (see attach_payload docstring)"
    )


def test_decode_real_unknown_media_type():
    with pytest.raises(ValueError, match="unknown media_type"):
        multimodal.decode_real(b"xx", "hologram")


@pytest.mark.parametrize("media_type", ["image", "audio", "video"])
def test_decode_real_missing_codec_raises(media_type):
    with pytest.raises(NotImplementedError, match="not\\s+present"):
        multimodal.decode_real(b"xx", media_type)


def _install_fake(monkeypatch, name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    parent = name.split(".")[0]
    if parent != name and parent not in sys.modules:
        pmod = types.ModuleType(parent)
        setattr(pmod, name.split(".")[1], mod)
        monkeypatch.setitem(sys.modules, parent, pmod)
    monkeypatch.setitem(sys.modules, name, mod)
    return mod


def test_decode_real_image_dispatch(monkeypatch):
    seen = {}

    def fake_open(buf):
        seen["payload"] = buf.read()
        return [[1, 2], [3, 4]]  # np.asarray-able "image"

    _install_fake(monkeypatch, "PIL.Image", open=fake_open)
    out = multimodal.decode_real(b"imgbytes", "image")
    assert seen["payload"] == b"imgbytes"
    assert out.shape == (2, 2) and out[1][1] == 4


def test_decode_real_audio_dispatch(monkeypatch):
    def fake_load(buf):
        return [0.1, -0.2, 0.3], 16000

    _install_fake(monkeypatch, "librosa", load=fake_load)
    out = multimodal.decode_real(b"wavbytes", "audio")
    assert out.shape == (3,)
    assert abs(out[1] + 0.2) < 1e-9


def test_decode_real_video_dispatch(monkeypatch):
    frame_px = np.arange(12, dtype=np.uint8).reshape(3, 4)

    class FakeFrame:
        def to_ndarray(self):
            return frame_px

    class FakeContainer:
        def decode(self, video):
            assert video == 0
            yield FakeFrame()
            raise AssertionError("decode hook must stop after first frame")

    _install_fake(monkeypatch, "av", open=lambda buf: FakeContainer())
    out = multimodal.decode_real(b"vidbytes", "video")
    assert out.shape == (3, 4)
    assert out[2][3] == 11


def test_decode_real_video_empty_container(monkeypatch):
    class FakeContainer:
        def decode(self, video):
            return iter(())

    _install_fake(monkeypatch, "av", open=lambda buf: FakeContainer())
    out = multimodal.decode_real(b"", "video")
    assert out.size == 0


def test_wav_container_is_valid_and_decoder_is_header_driven():
    """The synth emits a REAL RIFF/WAVE container; the decoder reads
    rate and samples from the HEADER, not from the synth formulas —
    shown by decoding a hand-built wave file the synth never made."""
    import io
    import wave

    payload = multimodal._wav_bytes(37)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 8000 + (37 % 4) * 4000
        assert w.getnframes() == 64 + 37 % 64

    # foreign file: different rate/content than any synth output
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(np.array([5, -7, 3], dtype="<i2").tobytes())
    [decoded] = list(
        multimodal._wav_decode_batches(
            iter([pd.DataFrame({"doc_id": [0], "payload": [buf.getvalue()]})])
        )
    )
    assert decoded["sample_rate"].iat[0] == 44100
    assert decoded["n_samples"].iat[0] == 3
    assert decoded["sum_abs"].iat[0] == 15
    assert decoded["max_amp"].iat[0] == 5


def test_bmp_decoder_handles_padding_bottom_up_and_bgr():
    """Real BMP quirks, each load-bearing: rows pad to 4 bytes (w=5 →
    15-byte rows pad to 16), rows are stored bottom-up, channels are
    BGR — the decoder must undo all three to recover logical RGB."""
    import struct

    # doc_id=1 → w = 4 + 1 = 5 (3*5=15 → 1 pad byte), h = 3 + 1 = 4
    payload = multimodal._bmp_bytes(1)
    assert payload[:2] == b"BM"
    (w, h) = struct.unpack_from("<ii", payload, 18)
    assert (w, h) == (5, 4)
    stride = (w * 3 + 3) // 4 * 4
    assert stride == 16 and len(payload) == 54 + stride * h

    [decoded] = list(
        multimodal._bmp_decode_batches(
            iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
        )
    )
    # logical channel sums: v = (1 + 3p + c) % 256 over p in [0, 20)
    exp = [sum((1 + 3 * p + c) % 256 for p in range(20)) for c in range(3)]
    assert decoded["sum_r"].iat[0] == exp[0]
    assert decoded["sum_g"].iat[0] == exp[1]
    assert decoded["sum_b"].iat[0] == exp[2]

    # BGR + bottom-up really exercised: byte 0 of the pixel data is the
    # BLUE channel of the logical BOTTOM-LEFT pixel (y = h-1, x = 0)
    off = struct.unpack_from("<I", payload, 10)[0]
    p_bottom_left = (h - 1) * w
    assert payload[off] == (1 + 3 * p_bottom_left + 2) % 256


def test_wav_bmp_decode_pipeline(spark, sf_dir):
    """End-to-end: synth → real decode over mapInPandas matches the
    closed-form expectations for a couple of spot docs."""
    rows = {
        r.doc_id: r
        for r in multimodal.wav_decode(spark, sf_dir).limit(2000).collect()
    }
    d = min(rows)
    assert rows[d].sample_rate == 8000 + (d % 4) * 4000
    assert rows[d].n_samples == 64 + d % 64

    brows = {
        r.doc_id: r
        for r in multimodal.bmp_decode(spark, sf_dir).limit(2000).collect()
    }
    b = min(brows)
    assert (brows[b].width, brows[b].height) == (4 + b % 13, 3 + b % 7)


def test_png_container_is_spec_valid_and_all_filters_round_trip():
    """The synth emits a spec-valid PNG (signature, CRC-checked
    chunks, zlib IDAT) and the decoder reconstructs every one of the
    five scanline filter types exactly. Filter coverage is structural:
    row y of doc d uses (d + y) % 5, so any doc with h >= 5 carries
    all five types in ONE image."""
    import struct
    import zlib

    # doc_id=2 → h = 3 + 2 % 5 = 5 → all five filters in one payload
    payload = multimodal._png_bytes(2)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    (ln,) = struct.unpack_from(">I", payload, 8)
    assert payload[12:16] == b"IHDR" and ln == 13
    w, h, nf, rgb = multimodal._png_decode_one(payload)
    assert (w, h, nf) == (4 + 2 % 11, 3 + 2 % 5, 5)
    exp = np.array(
        [
            [(2 * 5 + 7 * (y * w + x) + 11 * c) % 256 for c in range(3)]
            for y in range(h)
            for x in range(w)
        ]
    ).reshape(h, w, 3)
    assert (rgb == exp).all()

    # the decoder is header/content driven, not formula driven: decode
    # a foreign PNG the synth never made (solid color, filter 0 only)
    fw, fh = 3, 2
    scan = b"".join(b"\x00" + bytes([9, 8, 7]) * fw for _ in range(fh))
    ihdr = struct.pack(">IIBBBBB", fw, fh, 8, 2, 0, 0, 0)
    foreign = (
        b"\x89PNG\r\n\x1a\n"
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(scan))
        + multimodal._png_chunk(b"IEND", b"")
    )
    w2, h2, nf2, rgb2 = multimodal._png_decode_one(foreign)
    assert (w2, h2, nf2) == (fw, fh, 1)
    assert (rgb2 == np.array([9, 8, 7])).all()

    # CRC verification is real: one flipped IDAT byte must be caught
    import pytest as _pytest

    tampered = bytearray(payload)
    tampered[40] ^= 0xFF
    with _pytest.raises(AssertionError, match="CRC mismatch"):
        multimodal._png_decode_one(bytes(tampered))


def test_png_decode_pipeline(spark, sf_dir):
    """End-to-end: synth → CRC-checked zlib decode over mapInPandas
    matches the closed-form channel sums for a spot doc."""
    rows = {
        r.doc_id: r
        for r in multimodal.png_decode(spark, sf_dir).limit(2000).collect()
    }
    d = min(rows)
    r = rows[d]
    w, h = 4 + d % 11, 3 + d % 5
    assert (r.width, r.height, r.n_filters) == (w, h, min(h, 5))
    exp = [
        sum((d * 5 + 7 * p + 11 * c) % 256 for p in range(w * h))
        for c in range(3)
    ]
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(exp)


def test_decode_real_stdlib_png_and_wav_need_no_codec_library():
    """decode_real sniffs container signatures first: PNG and RIFF/WAVE
    decode with the standard library even though PIL/librosa are
    absent — only codec-library formats (JPEG/MP3/MP4) stay blocked."""
    d = 2  # h = 5 → all five PNG filter types in the payload
    rgb = multimodal.decode_real(multimodal._png_bytes(d), "image")
    w, h = 4 + d % 11, 3 + d % 5
    assert rgb.shape == (h, w, 3) and rgb.dtype == np.uint8
    assert rgb[0, 0, 0] == (d * 5) % 256

    samples = multimodal.decode_real(multimodal._wav_bytes(d), "audio")
    assert len(samples) == 64 + d % 64
    assert samples[0] == (d * 7919) % 65536 - 32768


def test_gif_container_is_spec_valid_and_lzw_is_real():
    """The synth emits spec-valid GIF87a (screen descriptor, 16-entry
    global color table, sub-blocked LZW image data, trailer) and the
    decoder genuinely LZW-decompresses: variable code width, clear-code
    reset, and the cScSc case are exercised by stress sequences."""
    import struct

    payload = multimodal._gif_bytes(5)
    assert payload[:6] == b"GIF87a" and payload[-1:] == b"\x3b"
    w, h, packed = struct.unpack_from("<HHB", payload, 6)
    assert (w, h) == (4 + 5 % 9, 3 + 5 % 6)
    assert packed & 0x80 and (2 << (packed & 7)) == 16

    gw, gh, nc, rgb = multimodal._gif_decode_one(payload)
    assert (gw, gh, nc) == (w, h, 16)
    pal = multimodal._gif_palette(5)
    exp = np.array(
        [pal[(5 + 3 * p) % 16] for p in range(w * h)]
    ).reshape(h, w, 3)
    assert (rgb == exp).all()

    # LZW edge cases: code-width growth, 4096-entry reset, cScSc
    for seq in ([0] * 5000, [1, 1, 2, 2] * 600, list(range(16)) * 400):
        packed_lzw = multimodal._lzw_compress(seq, 4)
        assert multimodal._lzw_decompress(packed_lzw, 4) == seq

    # a foreign decoder-driven file: 2x2 solid-color GIF the synth
    # never produces (all indices 7) decodes by content, not formula
    idx = [7, 7, 7, 7]
    pal_bytes = b"".join(bytes(((i, i, i))) for i in range(16))
    screen = struct.pack("<6sHHBBB", b"GIF87a", 2, 2, 0b10110011, 0, 0)
    desc = struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    lzw = multimodal._lzw_compress(idx, 4)
    foreign = (
        screen + pal_bytes + desc + bytes([4, len(lzw)]) + lzw
        + b"\x00\x3b"
    )
    fw, fh, fnc, frgb = multimodal._gif_decode_one(foreign)
    assert (fw, fh, fnc) == (2, 2, 16)
    assert (frgb == 7).all()


def test_gif_decode_pipeline(spark, sf_dir):
    """End-to-end: synth → LZW decode over mapInPandas matches the
    closed-form palette/index sums for a spot doc."""
    rows = {
        r.doc_id: r
        for r in multimodal.gif_decode(spark, sf_dir).limit(2000).collect()
    }
    d = min(rows)
    r = rows[d]
    w, h = 4 + d % 9, 3 + d % 6
    assert (r.width, r.height, r.n_colors) == (w, h, 16)
    pal = multimodal._gif_palette(d)
    exp = [
        sum(pal[(d + 3 * p) % 16][c] for p in range(w * h))
        for c in range(3)
    ]
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(exp)


def test_jpeg_container_is_spec_valid_and_decode_is_real():
    """The synth emits spec-valid baseline grayscale JPEG (SOI, DQT,
    SOF0, two DHTs, SOS, stuffed entropy scan, EOI) and the decoder
    genuinely entropy-decodes: canonical Huffman from DHT, EXTEND,
    ZRL, EOB, dezigzag, dequant, IDCT."""
    import struct

    payload = multimodal._jpeg_bytes(7)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    # SOF0 present with the plan's geometry
    sof = payload.index(b"\xff\xc0")
    _, prec, h, w, ncomp = struct.unpack_from(">HBHHB", payload, sof + 2)
    assert (prec, ncomp) == (8, 1)
    assert (w, h) == (8 * (1 + 7 % 3), 8 * (1 + 7 % 2))

    dw, dh, blocks, img = multimodal._jpeg_decode_one(payload)
    assert (dw, dh) == (w, h)
    assert img.shape == (h, w)

    # a foreign decoder-driven file the synth never produces: different
    # quant table (all 2s), different Huffman shape (DC cats 0..3 at
    # lengths 1,2,3,3 — mixed-length canonical), two ACs in one block.
    dc_bits = [1, 1, 2] + [0] * 13
    dc_vals = [0, 1, 2, 3]
    ac_bits = [0, 1, 2, 1] + [0] * 12
    ac_vals = [0x00, 0x11, 0x01, 0xF0]  # EOB, (1,1), (0,1), ZRL
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([2] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    for tc, bits, vals in ((0x00, dc_bits, dc_vals), (0x10, ac_bits, ac_vals)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HBBBBBB", 8, 1, 1, 0x00, 0, 63, 0)
    wtr = multimodal._JpegBitWriter()
    dc_codes = multimodal._jpeg_canonical(dc_bits, dc_vals)
    ac_codes = multimodal._jpeg_canonical(ac_bits, ac_vals)
    # one block: DC diff +3 (cat 2), AC +1 at zigzag 1 via (0,1), AC
    # -1 at zigzag 3 via (1,1) (run of 1 zero), EOB
    wtr.put(*dc_codes[2]); wtr.put(3, 2)
    wtr.put(*ac_codes[0x01]); wtr.put(1, 1)
    wtr.put(*ac_codes[0x11]); wtr.put(0, 1)  # -1 encodes as 0
    wtr.put(*ac_codes[0x00])
    wtr.flush()
    foreign = bytes(out) + bytes(wtr.out) + b"\xff\xd9"
    fw, fh, fblocks, fimg = multimodal._jpeg_decode_one(foreign)
    assert (fw, fh) == (8, 8) and len(fblocks) == 1
    blk = fblocks[0]
    assert blk[0, 0] == 3 * 2  # dequant by the foreign table's 2
    zz = multimodal._jpeg_zigzag()
    assert blk[zz[1]] == 1 * 2 and blk[zz[3]] == -1 * 2
    assert np.count_nonzero(blk) == 3

    # non-baseline frames are rejected, not mis-decoded
    prog = bytearray(payload)
    prog[sof + 1] = 0xC2  # SOF2 progressive
    with pytest.raises(ValueError):
        multimodal._jpeg_decode_one(bytes(prog))


def test_jpeg_byte_stuffing_is_exercised_and_undone():
    """Part of the corpus genuinely contains stuffed 0xFF 0x00 bytes in
    the entropy scan (the (0,4)=11110 code next to all-ones magnitude
    bits); decode of those docs is still coefficient-exact."""
    stuffed_docs = [
        d for d in range(600) if b"\xff\x00" in multimodal._jpeg_bytes(d)
    ]
    assert len(stuffed_docs) >= 10  # data exercises unstuffing
    for d in stuffed_docs[:5]:
        _, _, blocks, _ = multimodal._jpeg_decode_one(
            multimodal._jpeg_bytes(d)
        )
        _, _, plan = multimodal._jpeg_plan(d)
        for b, (dcq, acs) in enumerate(plan):
            assert int(blocks[b][0, 0]) == dcq
            ac = blocks[b].copy()
            ac[0, 0] = 0
            assert int(ac.sum()) == sum(a * (1 + (k % 3)) for k, a in acs)


def test_jpeg_flat_blocks_are_pixel_exact(spark, sf_dir):
    """End-to-end: synth → baseline decode over mapInPandas; flat
    (DC-only) blocks reconstruct to exactly DC/8 + 128 per pixel."""
    rows = {
        r.doc_id: r
        for r in multimodal.jpeg_decode(spark, sf_dir).limit(2000).collect()
    }
    d = min(rows)
    r = rows[d]
    bx, by, plan = multimodal._jpeg_plan(d)
    assert (r.width, r.height, r.n_blocks) == (8 * bx, 8 * by, bx * by)
    assert r.dc_sum == sum(dcq for dcq, _ in plan)
    assert r.ac_nonzero == sum(len(acs) for _, acs in plan)
    assert r.flat_pixel_sum == sum(
        64 * (dcq // 8 + 128) for dcq, acs in plan if not acs
    )
