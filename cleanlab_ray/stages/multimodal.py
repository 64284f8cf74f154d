"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as Arrow ``binary`` columns
with sidecar metadata columns (mime type, width/height or duration).
Decode / feature-extract stages are actor-pool ``map_batches`` classes —
the real Ray plumbing (schema contract, batch sizing by BYTES, actor
signature, output layout) — with the codec itself stubbed: the sandbox
ships no image/audio libraries, so ``decoder="stub"`` raises
NotImplementedError and ``decoder="fake"`` produces a deterministic
fake decode (seeded from the payload bytes) that downstream stages and
tests exercise end-to-end.

Batch sizing: payload rows are wide — callers should size
``batch_size`` so ``batch_size × avg_payload_bytes × concurrency`` fits
the worker heap (SURVEY.md §4.2 memory row), e.g. 64 rows for ~4 MB
images at concurrency 8.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA_FIELDS = {
    "media_id": pa.int64(),
    "payload": pa.large_binary(),
    "mime_type": pa.string(),
    "width": pa.int32(),
    "height": pa.int32(),
}


def make_fake_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic opaque payload fixture (no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    w = rng.integers(32, 256, size=n).astype(np.int32)
    h = rng.integers(32, 256, size=n).astype(np.int32)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime_type": pa.array(["image/fake"] * n, type=pa.string()),
            "width": pa.array(w, type=pa.int32()),
            "height": pa.array(h, type=pa.int32()),
        }
    )


class MediaDecoder:
    """Actor-pool decode stage: payload -> fixed-size feature vector.

    ``decoder="stub"``: raises NotImplementedError at first batch (the
    marked integration point for a real codec: put the cv2/PIL/ffmpeg
    call in ``_decode_one`` and everything else — schema, batching,
    actor lifecycle, output layout — is already production-shaped).

    ``decoder="fake"``: deterministic feature extraction from the raw
    bytes (histogram of 16 byte-value buckets, L1-normalized) so the
    distributed path is testable without codecs.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake", payload_col: str = "payload"):
        if decoder not in ("stub", "fake"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.payload_col = payload_col

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.decoder == "stub":
            raise NotImplementedError(
                "real image/audio decoding requires codec libraries not present "
                "in this environment; plug the codec call in MediaDecoder._decode_one"
            )
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=self.FEATURE_DIM).astype(np.float32)
        total = hist.sum()
        return hist / total if total else hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        feats = np.stack([self._decode_one(v.as_py() or b"") for v in col])
        return batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1).astype(np.float32)), self.FEATURE_DIM
            ),
        )


class FrameSampler:
    """Actor-pool frame-sample stage for video-shaped payloads: emits
    ``num_frames`` byte-slices per row as a list<binary> column (the
    real implementation would seek keyframes; the slicing layout and
    flat_map-style output contract are what downstream code relies on)."""

    def __init__(self, num_frames: int = 4, payload_col: str = "payload"):
        self.num_frames = num_frames
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        frames = []
        for v in col:
            data = v.as_py() or b""
            step = max(1, len(data) // self.num_frames)
            frames.append([data[i * step : (i + 1) * step] for i in range(self.num_frames)])
        return batch.append_column(
            "frames", pa.array(frames, type=pa.list_(pa.large_binary()))
        )


def decode_media(ds, decoder: str = "fake", concurrency: int = 2, batch_size: int = 64):
    """The decode pipeline stage: small batches (payloads are wide)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
