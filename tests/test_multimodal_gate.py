"""Feature-gated multimodal decode + Hadoop-FS discovery + Glue
profile: components whose full behavior needs libs/services this
container lacks — each tests the real wiring and skips (or falls back)
cleanly where the dependency is absent."""

from __future__ import annotations

import pytest


def _pil_present() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class TestDecodeGate:
    def test_stub_path_always_works(self, spark):
        from easy_alterator_spark.operators.multimodal import (
            decode_images,
            synthesize_media,
        )

        media = synthesize_media(spark, n=30)
        rows = decode_images(media, use_pil=False).collect()
        assert len(rows) == 10  # every third synthetic row is an image
        assert all(r["width"] >= 64 and len(r["features"]) == 8 for r in rows)

    def test_autodetect_matches_environment(self, spark):
        from easy_alterator_spark.operators import multimodal as mm

        assert mm._pil_available() == _pil_present()
        # auto mode must run whatever the environment is
        out = mm.decode_images(mm.synthesize_media(spark, n=9))
        assert out.count() == 3

    @pytest.mark.skipif(not _pil_present(), reason="PIL not installed")
    def test_real_decode_with_pil(self, spark):
        """With PIL present, a real PNG decodes to its true dimensions
        and a normalized 8-bin luminance histogram."""
        import io

        from PIL import Image

        from easy_alterator_spark.operators.multimodal import decode_images

        buf = io.BytesIO()
        Image.new("RGB", (20, 10), (255, 0, 0)).save(buf, format="PNG")
        media = spark.createDataFrame(
            [(1, "image", "image/png", buf.getvalue(), len(buf.getvalue()))],
            "media_id long, kind string, mime string, content binary, n_bytes long",
        )
        r = decode_images(media, use_pil=True).collect()[0]
        assert (r["width"], r["height"]) == (20, 10)
        assert abs(sum(r["features"]) - 1.0) < 1e-6

    def test_resize_stub_shrinks(self, spark):
        from easy_alterator_spark.operators.multimodal import (
            resize_images,
            synthesize_media,
        )

        media = synthesize_media(spark, n=30)
        rows = resize_images(media, max_side=128, use_pil=False).collect()
        assert len(rows) == 10
        assert all(max(r["width"], r["height"]) <= 128 for r in rows)
        assert all(r["content"] is not None for r in rows)

    @pytest.mark.skipif(not _pil_present(), reason="PIL not installed")
    def test_real_resize_with_pil(self, spark):
        import io

        from PIL import Image

        from easy_alterator_spark.operators.multimodal import resize_images

        buf = io.BytesIO()
        Image.new("RGB", (400, 100), (0, 255, 0)).save(buf, format="PNG")
        media = spark.createDataFrame(
            [(1, "image", "image/png", buf.getvalue(), len(buf.getvalue()))],
            "media_id long, kind string, mime string, content binary, n_bytes long",
        )
        r = resize_images(media, max_side=200, use_pil=True).collect()[0]
        assert (r["width"], r["height"]) == (200, 50)  # aspect preserved
        assert Image.open(io.BytesIO(bytes(r["content"]))).size == (200, 50)

    def test_audio_energy_real_windows(self, spark):
        """Known byte patterns give known RMS: silence (128s) -> 0,
        full-swing square wave (0/255) -> ~1."""
        from easy_alterator_spark.operators.multimodal import audio_features

        silence = bytes([128] * 512)
        square = bytes([0, 255] * 256)
        media = spark.createDataFrame(
            [
                (1, "audio", "audio/raw", silence, len(silence)),
                (2, "audio", "audio/raw", square, len(square)),
            ],
            "media_id long, kind string, mime string, content binary, n_bytes long",
        )
        got = {r["media_id"]: r for r in audio_features(media, window_bytes=256).collect()}
        assert got[1]["n_windows"] == 2 and got[1]["peak_energy"] == 0.0
        assert got[2]["n_windows"] == 2 and abs(got[2]["mean_energy"] - 1.0) < 0.01

    def test_frame_sample_stub_and_autodetect(self, spark):
        from easy_alterator_spark.operators import multimodal as mm

        media = mm.synthesize_media(spark, n=30)
        rows = mm.sample_frames(media, every_n=1, use_ffmpeg=False).collect()
        assert rows and all(r["frame"] is not None for r in rows)
        # autodetect matches the environment and runs either way
        import shutil

        assert mm._ffmpeg_available() == (shutil.which("ffmpeg") is not None)
        auto = mm.sample_frames(media, every_n=1)
        assert auto.count() >= 0  # real path may yield 0 (garbage blobs)

    @pytest.mark.skipif(
        not __import__("shutil").which("ffmpeg"), reason="ffmpeg not installed"
    )
    def test_real_frames_with_ffmpeg(self, spark):  # pragma: no cover - needs ffmpeg
        """With ffmpeg present, garbage blobs yield no frames (graceful)
        and the output stays within the FRAME_SCHEMA contract."""
        from easy_alterator_spark.operators.multimodal import sample_frames, synthesize_media

        out = sample_frames(synthesize_media(spark, n=9), every_n=2, use_ffmpeg=True)
        assert out.count() == 0  # synthetic bytes are not valid video

    def test_audio_soundfile_gate_and_autodetect(self, spark):
        from easy_alterator_spark.operators import multimodal as mm

        try:
            import soundfile  # noqa: F401

            present = True
        except ImportError:
            present = False
        assert mm._soundfile_available() == present
        # forcing the raw path works everywhere; autodetect must run too
        media = mm.synthesize_media(spark, n=9)
        raw = mm.audio_features(media, use_soundfile=False)
        auto = mm.audio_features(media)
        assert raw.count() == auto.count() == 3

    def test_soundfile_real_decode_if_present(self, spark):
        """With soundfile present, a real WAV decodes: pure silence ->
        zero energy (raw-byte interpretation of a WAV would see the
        non-zero header instead)."""
        try:
            import soundfile as sf
        except ImportError:
            pytest.skip("soundfile not installed")
        import io

        import numpy as np

        from easy_alterator_spark.operators.multimodal import audio_features

        buf = io.BytesIO()
        sf.write(buf, np.zeros(2048), 16000, format="WAV")
        wav = buf.getvalue()
        media = spark.createDataFrame(
            [(1, "audio", "audio/wav", wav, len(wav))],
            "media_id long, kind string, mime string, content binary, n_bytes long",
        )
        r = audio_features(media, window_bytes=1024, use_soundfile=True).collect()[0]
        assert r["peak_energy"] == 0.0 and r["n_windows"] == 2

    def test_pil_decoder_rejects_garbage_bytes(self):
        # unit-level: the PIL path must not throw on non-image bytes
        if not _pil_present():
            pytest.skip("PIL not installed")
        from easy_alterator_spark.operators.multimodal import _decode_image_pil

        assert _decode_image_pil(b"not an image") == (0, 0, [])


class TestHadoopFsDiscovery:
    def test_file_scheme_directory_expansion(self, spark, tmp_path):
        """file:// exercises the exact Hadoop FS code path s3:// takes."""
        from easy_alterator_spark.files import filter_ddl_files

        (tmp_path / "a_t1.hql").write_text("x")
        (tmp_path / "a_t2.hql").write_text("x")
        (tmp_path / "b_t3.hql").write_text("x")
        (tmp_path / "a_t4.txt").write_text("x")
        got = filter_ddl_files(
            [f"file://{tmp_path}"], prefix="a_", suffix="hql", spark=spark
        )
        assert [g.rsplit("/", 1)[-1] for g in got] == ["a_t1.hql", "a_t2.hql"]
        assert all(g.startswith("file:") for g in got)

    def test_scheme_file_passthrough_and_allowlist(self, spark, tmp_path):
        from easy_alterator_spark.files import filter_ddl_files

        (tmp_path / "t1.hql").write_text("x")
        (tmp_path / "t2.hql").write_text("x")
        got = filter_ddl_files(
            [f"file://{tmp_path}"], suffix="hql", table_names=["t2"], spark=spark
        )
        assert [g.rsplit("/", 1)[-1] for g in got] == ["t2.hql"]
        # explicit file path passes through untouched
        one = filter_ddl_files([f"file://{tmp_path}/t1.hql"], spark=spark)
        assert one == [f"file://{tmp_path}/t1.hql"]

    def test_scheme_requires_spark(self):
        from easy_alterator_spark.files import filter_ddl_files

        with pytest.raises(ValueError, match="scheme"):
            filter_ddl_files(["s3://bucket/ddl/"])


class TestGlueProfile:
    def test_glue_confs_shape(self):
        from easy_alterator_spark.session import GLUE_CONFS

        assert GLUE_CONFS["spark.sql.catalog.glue_catalog.catalog-impl"].endswith(
            "GlueCatalog"
        )
        assert "hive.metastore.client.factory.class" in " ".join(GLUE_CONFS)

    @pytest.mark.skipif(
        "EA_GLUE_TEST" not in __import__("os").environ,
        reason="needs AWS credentials + Glue jars (set EA_GLUE_TEST=1)",
    )
    def test_glue_catalog_roundtrip(self):  # pragma: no cover - needs AWS
        from easy_alterator_spark.diff.catalog import snapshot_catalog
        from easy_alterator_spark.session import get_spark

        spark = get_spark("ea-glue-it", glue=True)
        cols, tabs = snapshot_catalog(spark, ["glue_catalog.default.some_table"])
        assert tabs.count() >= 0
