"""Multimodal (image/audio/video) column stages — actor-pool plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…).  The Ray-side shape is
real and tested: small batches (large rows), callable-class stages for
``map_batches(Cls, concurrency=N, batch_size=small)`` with one-time setup in
``__init__``, Arrow binary in / binary + features out.

The actual codecs are STUBBED — this container ships no image/audio libraries —
behind ``decoder="fake"`` (deterministic, seed-free fake pixels derived from the
payload bytes) or ``decoder="pil"``-style real imports that raise
``NotImplementedError`` with a clear message when the library is absent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", "video/mp4"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: pixels derived from a hash of the bytes."""
    seed = int.from_bytes(hashlib.blake2s(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool stage: binary payload → decoded ndarray column.

    Use ``map_batches(DecodeImage(...), batch_format="pandas", batch_size=64,
    concurrency=N, num_cpus=1)`` — small batches because decoded rows are
    large; the decoder backend is loaded ONCE per actor here.
    """

    def __init__(self, decoder: str = "fake", target_hw: tuple[int, int] = (32, 32)):
        self.target_hw = target_hw
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "PIL is not available in this environment; use decoder='fake' "
                    "for the deterministic stub"
                ) from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        h, w = self.target_hw
        pixels = [
            _fake_pixels(p if p is not None else b"", h, w)
            if self.decoder == "fake"
            else self._decode_real(p)
            for p in batch["payload"]
        ]
        batch["pixels"] = pixels
        return batch

    def _decode_real(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError("real decode requires an image library")


class ImageFeatures:
    """Actor-pool stage: decoded pixels → small feature vector (mean RGB,
    luma histogram) — the shape of a batched model-inference stage."""

    def __init__(self, hist_bins: int = 8):
        self.hist_bins = hist_bins

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for px in batch["pixels"]:
            mean_rgb = px.reshape(-1, 3).mean(axis=0)
            luma = px.mean(axis=2).ravel()
            hist, _ = np.histogram(luma, bins=self.hist_bins, range=(0, 255))
            feats.append(
                np.concatenate([mean_rgb / 255.0, hist / max(1, luma.size)]).astype(
                    np.float32
                )
            )
        out = batch.drop(columns=["pixels"])
        out["features"] = feats
        return out


class FrameSampler:
    """Actor-pool stage: video payload → N deterministic pseudo-frames
    (binary slices), one output row per frame — the flat_map shape for video."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # columnar row-multiplication (repeat/tile) instead of iterrows; the
        # only per-item work left is the bytes slicing itself
        nf = self.n_frames
        payloads = [p or b"" for p in batch["payload"]]
        steps = np.maximum(1, np.fromiter(map(len, payloads), dtype=np.int64) // nf)
        frame_idx = np.tile(np.arange(nf, dtype=np.int32), len(batch))
        frames = [
            p[f * st : (f + 1) * st]
            for p, st in zip(payloads, steps)
            for f in range(nf)
        ]
        return pd.DataFrame(
            {
                "media_id": np.repeat(batch["media_id"].to_numpy(), nf),
                "frame_idx": frame_idx,
                "frame_bytes": frames,
            },
            columns=["media_id", "frame_idx", "frame_bytes"],
        )
