"""Multimodal (image/audio/video) column stages — actor-pool plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…).  The Ray-side shape is
real and tested: small batches (large rows), callable-class stages for
``map_batches(Cls, concurrency=N, batch_size=small)`` with one-time setup in
``__init__``, Arrow binary in / binary + features out.

The decode path is REAL for formats decodable without third-party libraries:
24-bit uncompressed BMP and binary PPM (P6) images (pure numpy + struct),
PCM WAV audio (stdlib ``wave``) and YUV4MPEG2 (.y4m) raw video (pure numpy —
real container parsing, real frame boundaries).  ``decoder="auto"`` sniffs the
payload magic
and decodes those; ``decoder="fake"`` remains as the deterministic stub for
formats this container cannot decode (PNG/JPEG/MP4 — no PIL/ffmpeg here), and
``decoder="pil"`` raises ``NotImplementedError`` when PIL is absent.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

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


# ---- real image codecs (no third-party libraries) ----------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → 24-bit uncompressed BI_RGB BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → RGB uint8 (h, w, 3).

    Handles bottom-up (positive height) and top-down (negative height) rows
    and the 4-byte row padding; rejects compressed or non-24-bit files.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → binary PPM (P6, maxval 255) bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → RGB uint8 (h, w, 3); skips `#` comments."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def resize_nearest(pixels: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize (h, w, 3) → (th, tw, 3) — pure numpy indexing."""
    th, tw = target_hw
    h, w = pixels.shape[:2]
    if (h, w) == (th, tw):
        return pixels
    ri = np.minimum((np.arange(th) * h) // th, h - 1)
    ci = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return pixels[ri[:, None], ci[None, :]]


# ---- real audio codec (stdlib wave) ------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 PCM samples (n,) or (n, channels) → WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    n_channels = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples (n,) or (n, channels), sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {wf.getsampwidth()}")
        rate = wf.getframerate()
        n_channels = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    s = np.frombuffer(raw, dtype=np.int16)
    if n_channels > 1:
        s = s.reshape(-1, n_channels)
    return s, rate


def sniff_media(payload: bytes) -> str:
    """Magic-byte format sniff: 'bmp' | 'ppm' | 'wav' | 'y4m' | 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


# ---- real video codec (YUV4MPEG2 / .y4m, no third-party libraries) -----------
#
# Y4M is the mjpegtools raw-video interchange format (yuv4mpeg(5)): an ASCII
# stream header, then per-frame an ASCII "FRAME" marker line followed by the
# planar YUV payload.  It is the one genuinely public video container that is
# fully decodable with stdlib + numpy, so the video decode path here is REAL —
# frame boundaries come from the container structure, not byte arithmetic.


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Luma frames (n, h, w) uint8 → grayscale YUV4MPEG2 (C420jpeg) bytes.

    Chroma planes are written neutral (128) so the clip is grayscale; the
    container layout — stream header, FRAME markers, planar 4:2:0 payload —
    is the standard format any y4m consumer reads."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError(f"expected (n, h, w) luma frames, got shape {f.shape}")
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError(f"C420 needs even dimensions, got {h}x{w}")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode("ascii")
    chroma = bytes([128]) * ((h // 2) * (w // 2))
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(f[i].tobytes())
        parts.append(chroma)
        parts.append(chroma)
    return b"".join(parts)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 (C420 family or Cmono) bytes → luma frames (n, h, w) uint8.

    Chroma planes are skipped without being touched (each luma plane is read
    as a ``np.frombuffer`` view; the final ``np.stack`` is the one copy).
    Raises ``ValueError`` on a malformed header, an unsupported colorspace,
    or a truncated frame."""
    nl = payload.find(b"\n")
    if nl < 0 or payload[:9] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = "C420jpeg"  # the yuv4mpeg(5) default when no C tag is present
    for tok in payload[10:nl].decode("ascii", "replace").split(" "):
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            colorspace = tok
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if colorspace.startswith("C420"):
        chroma_sz = 2 * (h // 2) * (w // 2)
    elif colorspace == "Cmono":
        chroma_sz = 0
    else:
        raise ValueError(f"unsupported y4m colorspace {colorspace}")
    luma_sz = h * w
    frames: list[np.ndarray] = []
    pos = nl + 1
    total = len(payload)
    while pos < total:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        pos = fnl + 1
        if pos + luma_sz + chroma_sz > total:
            raise ValueError("truncated y4m frame payload")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=luma_sz, offset=pos).reshape(
                h, w
            )
        )
        pos += luma_sz + chroma_sz
    if not frames:
        return np.zeros((0, h, w), dtype=np.uint8)
    return np.stack(frames)


class VideoFrameSample:
    """Actor-pool stage: y4m video payload → per-sampled-frame luma statistics,
    one output row per frame (the flat_map shape for video, like ExplodeMap /
    M4 in the reference's transform family, `SURVEY.md §2.2`).

    The decode is the real YUV4MPEG2 parser above — a frame-boundary or
    plane-layout bug shows up as a wrong mean in the oracle compare, not a
    silent shift.  Per-row work is numpy over the whole frame stack; the
    Python loop is per *video*, matching the large-binary-row posture of
    ``AudioFeatures``."""

    def __init__(
        self,
        stride: int = 2,
        id_col: str = "media_id",
        payload_col: str = "payload",
    ):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.stride = stride
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[np.ndarray] = []
        fidx: list[np.ndarray] = []
        means: list[np.ndarray] = []
        stds: list[np.ndarray] = []
        n_frames: list[np.ndarray] = []
        for mid, p in zip(
            batch[self.id_col].to_numpy(), batch[self.payload_col]
        ):
            frames = decode_y4m(bytes(p))
            sel = np.arange(0, frames.shape[0], self.stride)
            f = frames[sel].astype(np.float64)
            ids.append(np.full(len(sel), mid, dtype=np.int64))
            fidx.append(sel.astype(np.int32))
            n_frames.append(np.full(len(sel), frames.shape[0], dtype=np.int32))
            if len(sel):
                means.append(f.mean(axis=(1, 2)))
                stds.append(f.std(axis=(1, 2)))
            else:
                means.append(np.zeros(0))
                stds.append(np.zeros(0))
        empty = np.zeros(0)
        return pd.DataFrame(
            {
                self.id_col: np.concatenate(ids) if ids else empty.astype(np.int64),
                "frame_idx": np.concatenate(fidx) if fidx else empty.astype(np.int32),
                "n_frames": (
                    np.concatenate(n_frames) if n_frames else empty.astype(np.int32)
                ),
                "mean_luma": np.concatenate(means) if means else empty,
                "std_luma": np.concatenate(stds) if stds else empty,
            }
        )


class DecodeImage:
    """Actor-pool stage: binary payload → decoded ndarray column.

    Use ``map_batches(DecodeImage(...), batch_format="pandas", batch_size=64,
    concurrency=N, num_cpus=1)`` — small batches because decoded rows are
    large; the decoder backend is loaded ONCE per actor here.
    """

    def __init__(self, decoder: str = "auto", target_hw: tuple[int, int] = (32, 32)):
        self.target_hw = target_hw
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "PIL is not available in this environment; use decoder='auto' "
                    "(real BMP/PPM decode) or decoder='fake'"
                ) from e
        elif decoder not in ("auto", "fake"):
            raise ValueError(f"unknown decoder {decoder!r}")

    def _decode_one(self, payload: bytes | None) -> np.ndarray:
        p = payload if payload is not None else b""
        h, w = self.target_hw
        if self.decoder == "fake":
            return _fake_pixels(p, h, w)
        fmt = sniff_media(p)
        try:
            if fmt == "bmp":
                return resize_nearest(decode_bmp(p), self.target_hw)
            if fmt == "ppm":
                return resize_nearest(decode_ppm(p), self.target_hw)
        except (ValueError, struct.error, IndexError):
            # truncated/corrupt payload whose magic happened to match — fall
            # through to the stub rather than killing the whole batch task
            pass
        # unknown container format (PNG/JPEG need external libs) → stub
        return _fake_pixels(p, h, w)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["pixels"] = [self._decode_one(p) for p in batch["payload"]]
        return batch


class ImageFeatures:
    """Actor-pool stage: decoded pixels → small feature vector (mean RGB,
    luma histogram) — the shape of a batched model-inference stage."""

    def __init__(self, hist_bins: int = 8):
        self.hist_bins = hist_bins

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = batch.drop(columns=["pixels"])
            out["features"] = []
            return out
        # decoded pixels share target_hw → stack once, all-batch numpy kernels
        px = np.stack(batch["pixels"].to_list())  # (n, h, w, 3)
        n = px.shape[0]
        mean_rgb = px.reshape(n, -1, 3).mean(axis=1) / 255.0  # (n, 3)
        luma = px.mean(axis=3).reshape(n, -1)  # (n, h*w)
        bins = np.linspace(0, 255, self.hist_bins + 1)
        idx = np.clip(np.digitize(luma, bins[1:-1]), 0, self.hist_bins - 1)
        hist = np.zeros((n, self.hist_bins), dtype=np.int64)
        np.add.at(hist, (np.repeat(np.arange(n), luma.shape[1]), idx.ravel()), 1)
        feats = np.concatenate(
            [mean_rgb, hist / max(1, luma.shape[1])], axis=1
        ).astype(np.float32)
        out = batch.drop(columns=["pixels"])
        out["features"] = list(feats)
        return out


class AudioFeatures:
    """Actor-pool stage: WAV payload → real decoded features (duration,
    RMS level, zero-crossing rate, dominant frequency via numpy rFFT)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dur, rms, zcr, domf = [], [], [], []
        import wave as _wave

        for p in batch[self.payload_col]:
            try:
                samples, rate = decode_wav(p)
            except (ValueError, EOFError, AttributeError, _wave.Error, TypeError):
                # null/truncated/corrupt payload: emit a zero row rather than
                # killing the whole batch task (same contract as DecodeImage)
                dur.append(0)
                rms.append(0.0)
                zcr.append(0.0)
                domf.append(0.0)
                continue
            mono = samples.mean(axis=1) if samples.ndim > 1 else samples.astype(np.float64)
            n = len(mono)
            dur.append(int(round(n * 1000.0 / rate)))
            if n == 0:  # zero-frame WAV: a flushed-empty segment is valid
                rms.append(0.0)
                zcr.append(0.0)
                domf.append(0.0)
                continue
            rms.append(float(np.sqrt(np.mean(mono.astype(np.float64) ** 2))))
            zcr.append(float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0)
            spec = np.abs(np.fft.rfft(mono))
            freqs = np.fft.rfftfreq(n, d=1.0 / rate)
            domf.append(float(freqs[int(np.argmax(spec))]) if len(spec) else 0.0)
        batch["duration_ms"] = np.asarray(dur, dtype=np.int32)
        batch["rms"] = np.asarray(rms, dtype=np.float64)
        batch["zero_crossing_rate"] = np.asarray(zcr, dtype=np.float64)
        batch["dominant_hz"] = np.asarray(domf, dtype=np.float64)
        return batch


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
