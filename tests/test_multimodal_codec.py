"""Runtime codec detection for the multimodal decoders (VERDICT r4
task #7): when PIL / soundfile import, ``decode_*`` extracts REAL
features; otherwise the deterministic md5 stub runs and strict mode
raises. Three tiers here:

* fake-module tests (always run): drive the real-decode code paths
  with minimal in-process stand-ins for PIL/soundfile, so the
  non-stub branches are exercised even in this codec-less container;
* equipped-cluster parity tests (importorskip-gated): synthesize a
  real PNG (zlib, stdlib) / WAV (wave, stdlib) and check the decoded
  features against ground truth — these run wherever the libs exist;
* container-behavior tests: without the libs the stub still answers
  and ``strict=True`` raises.
"""
from __future__ import annotations

import io
import struct
import sys
import zlib

import numpy as np
import pytest

from neosync_spark.operators.multimodal import (
    _fake_audio_features,
    _fake_image_features,
    _pil_image_features,
    _sf_audio_features,
)


def _png_bytes(w: int, h: int, value: int) -> bytes:
    """Minimal valid grayscale PNG (stdlib only)."""
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + bytes([value]) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(n: int, sr: int, amp: int) -> bytes:
    """Minimal PCM16 mono WAV (stdlib only)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(struct.pack(f"<{n}h", *([amp] * n)))
    return buf.getvalue()


class _FakeImage:
    """PIL.Image stand-in: constant-intensity w×h grayscale."""

    def __init__(self, w, h, value):
        self.size = (w, h)
        self._v = value

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, wh):
        return _FakeImage(wh[0], wh[1], self._v)

    def __array__(self, dtype=None, copy=None):
        w, h = self.size
        return np.full((h, w), self._v, dtype=dtype or np.float32)


class TestFakeModuleDispatch:
    def test_pil_path_with_injected_module(self, monkeypatch):
        import types

        pil = types.ModuleType("PIL")
        img_mod = types.ModuleType("PIL.Image")
        img_mod.open = lambda fp: _FakeImage(6, 4, 100)
        pil.Image = img_mod
        monkeypatch.setitem(sys.modules, "PIL", pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
        w, h, luma, feats = _pil_image_features(b"ignored", feat_dim=16)
        assert (w, h) == (6, 4)
        assert luma == pytest.approx(100.0)
        assert feats.shape == (16,) and feats.dtype == np.float32
        assert np.all(feats == 100.0)

    def test_soundfile_path_with_injected_module(self, monkeypatch):
        import types

        sf = types.ModuleType("soundfile")
        sf.read = lambda fp, dtype=None: (
            np.full(8000, 0.5, dtype=np.float32), 16000
        )
        monkeypatch.setitem(sys.modules, "soundfile", sf)
        n, sr, dur, rms = _sf_audio_features(b"ignored")
        assert (n, sr) == (8000, 16000)
        assert dur == pytest.approx(0.5)
        assert rms == pytest.approx(0.5)


class TestEquippedClusterParity:
    def test_real_png_decode(self):
        pytest.importorskip("PIL")
        w, h, luma, feats = _pil_image_features(
            _png_bytes(8, 5, 200), feat_dim=9
        )
        assert (w, h) == (8, 5)
        assert luma == pytest.approx(200.0)
        assert np.all(feats == 200.0)

    def test_real_wav_decode(self):
        pytest.importorskip("soundfile")
        amp = 16384  # 0.5 in float32 PCM
        n, sr, dur, rms = _sf_audio_features(_wav_bytes(22050, 22050, amp))
        assert (n, sr) == (22050, 22050)
        assert dur == pytest.approx(1.0)
        assert rms == pytest.approx(0.5, abs=1e-3)


class TestContainerBehavior:
    """This container has neither codec: stub answers, strict raises,
    and the md5 derivation stays byte-stable (the gate oracle replays
    it)."""

    def test_stub_is_md5_stable(self):
        w, h, luma, feats = _fake_image_features(b"blob", 4)
        w2, h2, luma2, feats2 = _fake_image_features(b"blob", 4)
        assert (w, h, luma) == (w2, h2, luma2)
        assert np.array_equal(feats, feats2)
        n, sr, dur, rms = _fake_audio_features(b"blob")
        assert _fake_audio_features(b"blob") == (n, sr, dur, rms)

    def test_strict_raises_without_codecs(self, spark):
        if "PIL" in sys.modules or "soundfile" in sys.modules:
            pytest.skip("codec present: strict path decodes for real")
        try:
            import PIL  # noqa: F401

            pytest.skip("PIL installed")
        except ImportError:
            pass
        from pyspark.sql import functions as F

        from neosync_spark.operators.multimodal import (
            decode_audio_features,
            decode_image_features,
        )

        df = spark.range(3).select(
            F.col("id").alias("doc_id"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("blob"),
        )
        with pytest.raises(NotImplementedError):
            decode_image_features(df, "blob", "doc_id", strict=True)
        with pytest.raises(NotImplementedError):
            decode_audio_features(df, "blob", "doc_id", strict=True)
        # non-strict: stub answers with the documented shape
        out = decode_image_features(df, "blob", "doc_id").toPandas()
        assert len(out) == 3 and list(out.columns) == [
            "id", "width", "height", "mean_luma", "feature",
        ]
