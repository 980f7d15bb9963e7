"""Property tests for the dependency-free media codecs (round 7):
the builtin PNG encoder/decoder and the stdlib-wave audio tier are
REAL decode paths on production data, so they get generative
coverage, not just the fixture cases."""

from __future__ import annotations

import io
import wave as wavemod

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


class TestPngCodecProperties:
    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_roundtrip_pixel_exact(self, w, h, seed):
        from easy_alterator_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        dw, dh, ch, px = decode_png(encode_png(w, h, rgb))
        assert (dw, dh, ch) == (w, h, 3)
        assert px.tobytes() == rgb

    @settings(max_examples=30, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=200))
    def test_garbage_never_raises(self, junk):
        from easy_alterator_spark.operators.multimodal import (
            _decode_image_builtin,
            _resize_image_builtin,
            decode_png,
        )

        # includes truncated PNGs: a valid signature with a mangled body
        for blob in (junk, b"\x89PNG\r\n\x1a\n" + junk):
            assert decode_png(blob) is None or len(decode_png(blob)) == 4
            w, h, feats = _decode_image_builtin(blob)
            assert (w == 0) == (feats == [])
            _resize_image_builtin(blob, 16)  # must not raise

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=64),
        h=st.integers(min_value=1, max_value=64),
        max_side=st.integers(min_value=1, max_value=80),
    )
    def test_resize_respects_box_and_reencodes(self, w, h, max_side):
        from easy_alterator_spark.operators.multimodal import (
            _resize_image_builtin,
            decode_png,
            encode_png,
        )

        png = encode_png(w, h, bytes([7, 99, 201]) * (w * h))
        nw, nh, out = _resize_image_builtin(png, max_side)
        assert 1 <= nw <= max(w, max_side) and 1 <= nh <= max(h, max_side)
        assert max(nw, nh) <= max(max_side, 1)
        if max(w, h) <= max_side:  # shrink-only: small images untouched
            assert (nw, nh) == (w, h)
        dw, dh, _ch, px = decode_png(out)
        assert (dw, dh) == (nw, nh)
        assert tuple(px[0, 0]) == (7, 99, 201)  # solid color survives

    def test_decoder_handles_all_filter_types(self):
        """Cross-check against a third encoder style: rows written
        with explicit sub/up/average/paeth filters must unfilter back
        to the same pixels filter-0 rows give."""
        import struct
        import zlib

        from easy_alterator_spark.operators.multimodal import decode_png

        w, h = 5, 4
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        raw = bytearray()
        prev = np.zeros(w * 3, dtype=np.uint8)
        for y, ftype in zip(range(h), (1, 2, 3, 4)):
            line = px[y]
            raw.append(ftype)
            for x in range(w * 3):
                left = int(line[x - 3]) if x >= 3 else 0
                up = int(prev[x])
                ul = int(prev[x - 3]) if x >= 3 else 0
                if ftype == 1:
                    raw.append((int(line[x]) - left) & 0xFF)
                elif ftype == 2:
                    raw.append((int(line[x]) - up) & 0xFF)
                elif ftype == 3:
                    raw.append((int(line[x]) - ((left + up) >> 1)) & 0xFF)
                else:
                    raw.append((int(line[x]) - paeth(left, up, ul)) & 0xFF)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        dw, dh, ch, got = decode_png(png)
        assert (dw, dh, ch) == (w, h, 3)
        assert got.reshape(h, w * 3).tolist() == px.tolist()


class TestWaveTierProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=4000),
        nch=st.sampled_from([1, 2]),
        width=st.sampled_from([1, 2, 4]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_pcm_roundtrip_bounds_and_length(self, n, nch, width, seed):
        from easy_alterator_spark.operators.multimodal import _audio_samples_wave

        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, size=n * nch * width, dtype=np.uint8).tobytes()
        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as wf:
            wf.setnchannels(nch)
            wf.setsampwidth(width)
            wf.setframerate(16000)
            wf.writeframes(frames)
        a = _audio_samples_wave(buf.getvalue())
        assert a is not None and len(a) == n
        assert np.all(a >= -1.0) and np.all(a <= 1.0)

    @settings(max_examples=30, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=100))
    def test_non_riff_returns_none(self, junk):
        from easy_alterator_spark.operators.multimodal import _audio_samples_wave

        assert _audio_samples_wave(junk) is None or junk[:4] == b"RIFF"
        assert _audio_samples_wave(b"RIFF" + junk) is None  # malformed RIFF
