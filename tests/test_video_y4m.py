"""Real YUV4MPEG2 video codec + frame-sample stage.

The decode path is a real container parser (header tokens, FRAME markers,
planar 4:2:0 layout) — these tests pin the wire format byte-for-byte and the
stage's flat_map shape through an actual Ray actor pool.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data

from cassandra_data_migrator_ray.functions.multimodal import (
    VideoFrameSample,
    decode_y4m,
    encode_y4m,
    sniff_media,
)


def clip(n=5, h=4, w=6, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)


class TestY4mCodec:
    def test_roundtrip(self):
        frames = clip()
        out = decode_y4m(encode_y4m(frames))
        np.testing.assert_array_equal(out, frames)

    def test_wire_format_is_standard_y4m(self):
        """Header + FRAME markers + plane sizes match yuv4mpeg(5) exactly."""
        frames = clip(n=2, h=4, w=6)
        payload = encode_y4m(frames, fps=30)
        header, rest = payload.split(b"\n", 1)
        assert header == b"YUV4MPEG2 W6 H4 F30:1 Ip A1:1 C420jpeg"
        frame_sz = 4 * 6 + 2 * (2 * 3)  # luma + two quarter chroma planes
        assert len(rest) == 2 * (len(b"FRAME\n") + frame_sz)
        assert rest[:6] == b"FRAME\n"
        assert rest[6 : 6 + 24] == frames[0].tobytes()
        # chroma neutral 128 (grayscale)
        assert set(rest[6 + 24 : 6 + frame_sz]) == {128}

    def test_sniff(self):
        assert sniff_media(encode_y4m(clip(n=1))) == "y4m"

    def test_zero_frames_and_mono(self):
        payload = b"YUV4MPEG2 W4 H2 C420jpeg\n"
        assert decode_y4m(payload).shape == (0, 2, 4)
        mono = b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n" + bytes([9, 8, 7, 6])
        np.testing.assert_array_equal(
            decode_y4m(mono), np.array([[[9, 8], [7, 6]]], np.uint8)
        )

    def test_errors(self):
        with pytest.raises(ValueError, match="not a YUV4MPEG2"):
            decode_y4m(b"RIFFxxxx")
        with pytest.raises(ValueError, match="even dimensions"):
            encode_y4m(np.zeros((1, 3, 4), np.uint8))
        with pytest.raises(ValueError, match="colorspace"):
            decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(12))
        good = encode_y4m(clip(n=2))
        with pytest.raises(ValueError, match="truncated"):
            decode_y4m(good[:-3])
        with pytest.raises(ValueError, match="FRAME marker"):
            decode_y4m(good[:-1] + b"\x00\x00")  # shifts the 2nd marker


@pytest.mark.usefixtures("ray_session")
class TestVideoFrameSampleStage:
    def test_stride_sample_actor_pool(self):
        """One output row per sampled frame, exact means, through a real
        actor-pool map_batches."""
        n_videos, n_frames, h, w = 6, 5, 4, 4
        rows = []
        truth = {}
        for vid in range(n_videos):
            frames = clip(n=n_frames, h=h, w=w, seed=vid)
            rows.append({"media_id": vid, "payload": encode_y4m(frames)})
            for fi in range(0, n_frames, 2):
                truth[(vid, fi)] = frames[fi].astype(np.float64).mean()
        out = (
            ray.data.from_pandas(pd.DataFrame(rows))
            .map_batches(
                VideoFrameSample(stride=2),
                batch_format="pandas",
                batch_size=2,
                concurrency=2,
            )
            .to_pandas()
        )
        assert len(out) == n_videos * 3  # frames 0, 2, 4
        assert set(out.columns) == {
            "media_id",
            "frame_idx",
            "n_frames",
            "mean_luma",
            "std_luma",
        }
        assert (out["n_frames"] == n_frames).all()
        for _, r in out.iterrows():
            assert truth[(r["media_id"], r["frame_idx"])] == pytest.approx(
                r["mean_luma"]
            )

    def test_stride_one_keeps_every_frame(self):
        frames = clip(n=4)
        out = VideoFrameSample(stride=1)(
            pd.DataFrame([{"media_id": 1, "payload": encode_y4m(frames)}])
        )
        assert list(out["frame_idx"]) == [0, 1, 2, 3]
        np.testing.assert_allclose(
            out["std_luma"].to_numpy(),
            frames.astype(np.float64).std(axis=(1, 2)),
        )

    def test_empty_batch(self):
        out = VideoFrameSample()(pd.DataFrame({"media_id": [], "payload": []}))
        assert len(out) == 0
        assert list(out.columns) == [
            "media_id",
            "frame_idx",
            "n_frames",
            "mean_luma",
            "std_luma",
        ]
