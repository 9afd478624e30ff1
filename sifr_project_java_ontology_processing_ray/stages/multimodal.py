"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool map_batches stages.

The image/audio decode libraries are NOT in this container, so the decode
kernel is stubbed two ways (prompt requirement):
- ``RealImageDecoder`` raises NotImplementedError unless PIL is importable
  (import-try gated) — the Ray-side plumbing (schema, batch size, actor
  signature, output layout) is real;
- ``FakeImageDecoder`` parses this repo's deterministic fake payload format
  and is fully tested, standing in for the real decoder in pipelines.

Fake payload format (testable end-to-end):
    b"FAKEIMG" + width:uint16 + height:uint16 + channels:uint8 + seed bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def encode_fake_image(media_id: int, width: int, height: int, channels: int = 3) -> bytes:
    return MAGIC + struct.pack("<HHB", width, height, channels) + media_id.to_bytes(8, "little")


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media fixture: n fake images with varying dims."""
    rng = np.random.RandomState(seed)
    ids, payloads, widths, heights = [], [], [], []
    for i in range(n):
        w, h = int(rng.randint(16, 256)), int(rng.randint(16, 256))
        ids.append(i)
        payloads.append(encode_fake_image(i, w, h))
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-fake"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class FakeImageDecoder:
    """Actor stage: payload → decoded dims + deterministic feature vector.

    Mirrors the real decoder's shape: heavy init in __init__ (here: the
    feature projection matrix), small batches (binary payloads are wide —
    size batch_size so batch × concurrency fits worker heap)."""

    def __init__(self, feature_dim: int = 8, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(3, feature_dim)

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        if not payload.startswith(MAGIC):
            raise ValueError("not a fake image payload")
        w, h, c = struct.unpack("<HHB", payload[len(MAGIC) : len(MAGIC) + 5])
        return w, h, c

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims, feats = [], []
        for payload in batch["payload"].to_pylist():
            w, h, c = self.decode(payload)
            dims.append((w, h, c))
            feats.append((np.array([w, h, c], dtype=np.float64) @ self.proj).tolist())
        out = batch.drop_columns(["payload"])  # drop wide binary early
        out = out.append_column("decoded_w", pa.array([d[0] for d in dims], pa.int32()))
        out = out.append_column("decoded_h", pa.array([d[1] for d in dims], pa.int32()))
        out = out.append_column("channels", pa.array([d[2] for d in dims], pa.int32()))
        out = out.append_column("features", pa.array(feats, pa.list_(pa.float64())))
        return out


class RealImageDecoder:
    """The real thing, gated behind an import-try: raises at construction
    when PIL is unavailable (this container). Signature identical to
    FakeImageDecoder so pipelines swap freely."""

    def __init__(self, feature_dim: int = 8):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decoding requires PIL, not present in this environment; "
                "use FakeImageDecoder for the plumbing-tested path"
            ) from e
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


def resize_metadata(batch: pa.Table, max_side: int = 64) -> pa.Table:
    """Resize planning stage (pure metadata math — the pixel work happens in
    the decoder actor when a real codec exists): scale dims to fit
    max_side, preserving aspect ratio."""
    w = batch["decoded_w"].to_numpy().astype(np.float64)
    h = batch["decoded_h"].to_numpy().astype(np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    return batch.append_column(
        "resized_w", pa.array((w * scale).astype(np.int32))
    ).append_column("resized_h", pa.array((h * scale).astype(np.int32)))


# --------------------------------------------------------------------------
# video frame sampling (the fourth multimodal family member: decode /
# feature-extract / resize / FRAME-SAMPLE). Same stubbing contract as the
# image decoder: the codec is absent from this container, so the payload
# parser is a deterministic fake and the Ray-side plumbing (schema, actor
# signature, per-frame explode, batch sizing) is real and tested.
# --------------------------------------------------------------------------

VIDEO_MAGIC = b"FAKEVID"

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("n_frames", pa.int32()),
        ("fps", pa.int32()),
    ]
)

FRAMES_PER_VIDEO = 8


def encode_fake_video(media_id: int, n_frames: int, fps: int) -> bytes:
    return VIDEO_MAGIC + struct.pack("<IH", n_frames, fps) + media_id.to_bytes(8, "little")


def make_video_table(n: int, seed: int = 43) -> pa.Table:
    """Deterministic video fixture: n fake clips with varying length/fps."""
    rng = np.random.RandomState(seed)
    ids, payloads, frames, fps_out = [], [], [], []
    for i in range(n):
        nf = int(rng.randint(1, 600))
        fps = int(rng.choice([24, 25, 30]))
        ids.append(i)
        payloads.append(encode_fake_video(i, nf, fps))
        frames.append(nf)
        fps_out.append(fps)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-fake"] * n, pa.string()),
            "n_frames": pa.array(frames, pa.int32()),
            "fps": pa.array(fps_out, pa.int32()),
        },
        schema=VIDEO_SCHEMA,
    )


class FakeFrameSampler:
    """Actor stage: video payload → ≤ ``frames_per_video`` uniformly-strided
    frame rows (media_id, frame_idx, ts_s) — a per-row EXPLODE inside
    map_batches, the shape a real av/cv2 sampler shares. Sampling rule
    (chosen to be driver-restatable): stride = max(1, n_frames //
    frames_per_video); indices 0, stride, 2·stride, … capped at
    frames_per_video; ts_s = round(idx / fps, 3).

    Real-codec note: swap in a sampler whose __init__ opens the codec once
    per actor; payloads being wide binary, keep batch_size small so
    batch × concurrency fits the worker heap."""

    def __init__(self, frames_per_video: int = FRAMES_PER_VIDEO):
        self.k = frames_per_video

    def parse(self, payload: bytes) -> tuple[int, int]:
        if not payload.startswith(VIDEO_MAGIC):
            raise ValueError("not a fake video payload")
        nf, fps = struct.unpack("<IH", payload[len(VIDEO_MAGIC) : len(VIDEO_MAGIC) + 6])
        return nf, fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, tss = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            nf, fps = self.parse(payload)
            stride = max(1, nf // self.k)
            for i in list(range(0, nf, stride))[: self.k]:
                ids.append(mid)
                idxs.append(i)
                tss.append(round(i / fps, 3))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_s": pa.array(tss, pa.float64()),
            }
        )


def sql_frame_sample(fixture_root: str) -> str:
    """DuckDB restatement of the sampling rule over the videos fixture:
    idx = k·stride for k in 0..frames_per_video-1, kept while idx <
    n_frames — equivalent to range(0, n_frames, stride)[:k] because
    stride·k ≥ n_frames ⟺ the python slice cap binds. The decoder must
    round-trip (n_frames, fps) from the payload to match."""
    ks = ", ".join(f"({k})" for k in range(FRAMES_PER_VIDEO))
    return f"""
SELECT media_id, CAST(k.k * greatest(1, n_frames // {FRAMES_PER_VIDEO}) AS INTEGER) AS frame_idx,
       round(CAST(k.k * greatest(1, n_frames // {FRAMES_PER_VIDEO}) AS DOUBLE) / fps, 3) AS ts_s
FROM '{fixture_root}/videos.parquet' CROSS JOIN (VALUES {ks}) AS k(k)
WHERE k.k * greatest(1, n_frames // {FRAMES_PER_VIDEO}) < n_frames
"""


# --------------------------------------------------------------------------
# audio decode + resample planning (the third payload modality). Same
# contract: deterministic fake payload, real Ray plumbing; a real codec
# (soundfile/librosa, absent here) would slot into the same actor shape.
# --------------------------------------------------------------------------

AUDIO_MAGIC = b"FAKEAUD"

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("n_samples", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

TARGET_RATE = 16000


def encode_fake_audio(media_id: int, n_samples: int, sample_rate: int) -> bytes:
    return AUDIO_MAGIC + struct.pack("<II", n_samples, sample_rate) + media_id.to_bytes(8, "little")


def make_audio_table(n: int, seed: int = 44) -> pa.Table:
    rng = np.random.RandomState(seed)
    ids, payloads, samples, rates = [], [], [], []
    for i in range(n):
        sr = int(rng.choice([8000, 16000, 22050, 44100]))
        ns = int(rng.randint(sr // 2, sr * 30))  # 0.5 s – 30 s clips
        ids.append(i)
        payloads.append(encode_fake_audio(i, ns, sr))
        samples.append(ns)
        rates.append(sr)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/x-fake"] * n, pa.string()),
            "n_samples": pa.array(samples, pa.int32()),
            "sample_rate": pa.array(rates, pa.int32()),
        },
        schema=AUDIO_SCHEMA,
    )


class FakeAudioDecoder:
    """Actor stage: audio payload → (duration_s, resampled length at the
    16 kHz training rate). Drops the wide binary immediately after the
    parse — the payload never rides past this stage."""

    def __init__(self, target_rate: int = TARGET_RATE):
        self.target_rate = target_rate

    def parse(self, payload: bytes) -> tuple[int, int]:
        if not payload.startswith(AUDIO_MAGIC):
            raise ValueError("not a fake audio payload")
        ns, sr = struct.unpack("<II", payload[len(AUDIO_MAGIC) : len(AUDIO_MAGIC) + 8])
        return ns, sr

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, resampled = [], []
        for payload in batch["payload"].to_pylist():
            ns, sr = self.parse(payload)
            # integer milliseconds: float round() ties differ between
            # python (banker's) and SQL (half-away) on exact dyadic values,
            # so the contract stays in integer arithmetic
            durs.append(1000 * ns // sr)
            resampled.append(ns * self.target_rate // sr)
        out = batch.drop_columns(["payload"])
        out = out.append_column("duration_ms", pa.array(durs, pa.int64()))
        out = out.append_column("resampled_n", pa.array(resampled, pa.int64()))
        return out


def sql_audio_decode(fixture_root: str) -> str:
    """DuckDB restatement over the audio fixture: the decoder must
    round-trip (n_samples, sample_rate) from the payload; duration-ms and
    the 16 kHz resample length are pure integer arithmetic on those."""
    return f"""
SELECT media_id, mime, n_samples, sample_rate,
       1000 * CAST(n_samples AS BIGINT) // sample_rate AS duration_ms,
       CAST(n_samples AS BIGINT) * {TARGET_RATE} // sample_rate AS resampled_n
FROM '{fixture_root}/audio.parquet'
"""


def sql_multimodal_decode(fixture_root: str) -> str:
    """DuckDB restatement of the multimodal plumbing query over the media
    fixture parquet. The fake payload encodes (width, height, channels=3)
    and the decoder must round-trip them — so the oracle derives decoded
    dims from the metadata columns and independently restates the resize
    math (scale = min(1, 64/max(w,h)), truncating like numpy's
    astype(int32)). A decoder that misparsed the payload layout, dropped
    rows, or mis-scaled would diverge."""
    return f"""
SELECT media_id, mime, width, height,
       width AS decoded_w, height AS decoded_h, 3 AS channels,
       CAST(trunc(width  * least(1.0, 64.0 / greatest(width, height))) AS INTEGER) AS resized_w,
       CAST(trunc(height * least(1.0, 64.0 / greatest(width, height))) AS INTEGER) AS resized_h
FROM '{fixture_root}/media.parquet'
"""
