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
