"""Multimodal opaque-binary column stages (audio / video / resize)."""

import numpy as np
import pyarrow as pa
import pytest

from geo_polygonize_ray.pipelines.multimodal import (
    AudioFeatures,
    VideoFrameSampler,
    audio_features_pipeline,
    decode_audio,
    decode_video_frames,
    make_audio_table,
    make_video_table,
    resize_images_stage,
    video_frame_pipeline,
)


class TestLocalStages:
    def test_pcm16_roundtrip_decode(self):
        pcm = (np.sin(np.linspace(0, 20, 1000)) * 30000).astype("<i2")
        x = decode_audio(pcm.tobytes(), "pcm16-raw", 1)
        assert x.shape == (1000, 1)
        assert np.max(np.abs(x)) <= 1.0

    def test_compressed_audio_is_stubbed(self):
        with pytest.raises(NotImplementedError, match="mp3"):
            decode_audio(b"\x00" * 16, "mp3", 1)

    def test_compressed_video_is_stubbed(self):
        with pytest.raises(NotImplementedError, match="h264"):
            decode_video_frames(b"\x00" * 16, 4, 4, 1, "h264")

    def test_audio_features_batch(self):
        t = make_audio_table(8)
        out = AudioFeatures()(t)
        assert out.num_rows == 8
        assert all(0 < v < 1 for v in out["rms"].to_pylist())
        assert all(abs(v - 0.5) < 1e-6 for v in out["duration_s"].to_pylist())

    def test_video_sampler_batch(self):
        t = make_video_table(3, n_frames=8)
        out = VideoFrameSampler(n_sample=4)(t)
        assert out.num_rows == 12  # 3 videos x 4 sampled frames
        assert sorted(set(out["frame_idx"].to_pylist())) == [0, 2, 4, 7]

    def test_resize_stage(self):
        from geo_polygonize_ray.sources.fixtures import generate_image_table
        import pyarrow.parquet as pq

        p = generate_image_table(4, "/tmp/gpr_cache/resize_test.parquet")
        t = pq.read_table(p)
        out = resize_images_stage(t, 16, 16)
        assert out.num_rows == 4
        from geo_polygonize_ray.raster.codec import decode_image

        img = decode_image(out["bytes"][0].as_py(), 16, 16, "rgb8-raw")
        assert img.shape == (16, 16, 3)
        # captions pass through
        assert out["caption"].to_pylist() == t["caption"].to_pylist()


@pytest.mark.usefixtures("ray_session")
class TestRayPlumbing:
    def test_audio_pipeline(self):
        df = audio_features_pipeline(make_audio_table(32)).to_pandas()
        assert len(df) == 32
        assert df["caption"].str.contains("Hz tone").all()

    def test_video_pipeline(self):
        df = video_frame_pipeline(make_video_table(6, n_frames=6), n_sample=3).to_pandas()
        assert len(df) == 18
        assert (df.groupby("video_id").size() == 3).all()
