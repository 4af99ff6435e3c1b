"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The sealed container has no image/audio codecs, so the *decode kernels* are
stubbed two ways (per the build brief):

- ``decoder="real"`` raises ``NotImplementedError`` — the marked slot where
  Pillow / torchaudio / PyAV decode goes on a real cluster;
- ``decoder="fake"`` (default in tests) parses this module's deterministic
  synthetic payload header and derives features from the payload bytes —
  so the *Ray-side plumbing* (schema, actor-pool signature, batch sizing,
  output layout) is fully real and tested.

Stages follow the stateful actor-pool pattern (decoder state constructed
once per actor) and run with small batch sizes because each row carries a
large binary payload (memory-aware batching; ray_guide "large binary
payloads need small batches").
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_MAGIC = b"SYNB"


def synth_media_table(n: int, kind: str = "image", seed: int = 5, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table: (media_id, kind, payload: binary,
    width, height, duration_ms metadata columns).  Metadata is closed-form
    arithmetic in media_id (not RNG) so a SQL oracle can regenerate it;
    only the opaque payload body uses the seeded RNG."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    widths = (64 + (ids * 211) % 1856).astype(np.int32)
    heights = (64 + (ids * 131) % 1016).astype(np.int32)
    durations = (500 + (ids * 977) % 59_500).astype(np.int32)
    payloads = []
    for i in range(n):
        header = _MAGIC + struct.pack("<iii", int(widths[i]), int(heights[i]), int(durations[i]))
        body = rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
        payloads.append(header + body)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array([kind] * n, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def _parse_header(payload: bytes) -> tuple[int, int, int]:
    if payload[:4] != _MAGIC:
        raise ValueError("unknown payload format")
    return struct.unpack("<iii", payload[4:16])


class MediaDecodeStage:
    """map_batches(pyarrow) actor: (media_id, payload) → decoded metadata +
    a fixed-dim feature vector.  ``feature_dim`` floats per row."""

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real":
            # slot for a real codec (PIL.Image.open / av.open / soundfile):
            raise NotImplementedError(
                "real media decoding requires codec libraries not present in "
                "this container; use decoder='fake' for plumbing tests"
            )
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, durs, feats = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, d = _parse_header(payload)
            widths.append(w)
            heights.append(h)
            durs.append(d)
            body = np.frombuffer(payload[16:], dtype=np.uint8)
            # deterministic "features": per-chunk means of the payload bytes
            chunks = np.array_split(body.astype(np.float64), self.feature_dim)
            feats.append(np.asarray([c.mean() if c.size else 0.0 for c in chunks]))
        offs = np.arange(0, (len(feats) + 1) * self.feature_dim, self.feature_dim, dtype=np.int32)
        flat = np.concatenate(feats) if feats else np.zeros(0)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "duration_ms": pa.array(durs, type=pa.int32()),
                "features": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
            }
        )


class FrameSampleStage:
    """Video frame sampling plumbing: (media_id, payload, duration) → one
    row per sampled frame timestamp (flat_map-shaped output)."""

    def __init__(self, fps: float = 1.0, max_frames: int = 8, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError("real frame decode needs PyAV; use decoder='fake'")
        self.fps = fps
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ts_ms, fidx = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()):
            _, _, dur = _parse_header(payload)
            n = min(self.max_frames, max(1, int(dur / 1000.0 * self.fps)))
            stamps = np.linspace(0, dur, n, endpoint=False).astype(np.int64)
            ids.extend([mid] * n)
            ts_ms.extend(stamps.tolist())
            fidx.extend(range(n))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "ts_ms": pa.array(ts_ms, type=pa.int64()),
            }
        )


def decode_media(ds: Dataset, concurrency: int = 2, batch_size: int = 64) -> Dataset:
    """Small batches + modest pool: binary payload rows are wide, so batch
    bytes (not row count) set the memory envelope."""
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds: Dataset, fps: float = 1.0, concurrency: int = 2, batch_size: int = 64) -> Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"fps": fps},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
