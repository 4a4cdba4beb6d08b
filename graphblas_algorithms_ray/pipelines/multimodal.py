"""Multimodal (image/audio/video) column stages — REAL Ray plumbing,
STUBBED codecs.

Media travels as opaque ``binary`` columns with typed metadata columns
(mime, width/height or sample_rate/duration). The decode / resize /
feature-extract / frame-sample kernels are actor-pool ``map_batches``
stages whose __init__ would load the codec/model ONCE per actor; in this
container the image/audio libraries are absent, so the decode body is a
clearly-marked deterministic fake (or raises NotImplementedError when
``strict=True``). Schema, batch sizing, actor signatures and output layout
are real and tested — swapping in a real codec is a one-function change.

Batch sizing: media rows are wide — callers should pass small
``batch_size`` (default 64 here vs 4096 for text) and let blocks stay
small via DataContext.target_max_block_size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("data", pa.binary()),
    ]
)


def synthetic_media_dataset(n: int, kind: str = "image") -> ray.data.Dataset:
    """Deterministic fake media table (payload = seeded bytes)."""

    def _gen(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        rng_bytes = [
            hashlib.sha256(f"{kind}:{i}".encode()).digest() * 8 for i in ids
        ]
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64)),
                "mime": pa.array(
                    ["image/png" if kind == "image" else "audio/wav"] * len(ids)
                ),
                "width": pa.array(np.full(len(ids), 64, np.int32)),
                "height": pa.array(np.full(len(ids), 48, np.int32)),
                "data": pa.array(rng_bytes, pa.binary()),
            }
        )

    return ray.data.range(n).map_batches(_gen, batch_format="pyarrow", batch_size=256)


class DecodeImage:
    """Actor-pool stage: binary → HWC uint8 tensor column.

    STUB: real impl would do ``self.codec = PIL/cv2`` in __init__ (once per
    actor) and decode per row; here we emit a deterministic fake tensor
    derived from the payload bytes so downstream stages are exercised
    end-to-end. strict=True raises instead (the honest production marker).
    """

    def __init__(self, strict: bool = False):
        self.strict = strict  # once-per-actor setup point (codec load)

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image codec not available in this container (PIL/cv2)"
            )
        w = t["width"].to_numpy(zero_copy_only=False)
        h = t["height"].to_numpy(zero_copy_only=False)
        out = []
        for i, buf in enumerate(t["data"]):
            raw = np.frombuffer(buf.as_py(), dtype=np.uint8)
            need = int(w[i]) * int(h[i]) * 3
            reps = -(-need // raw.size)
            out.append(np.tile(raw, reps)[:need])  # fake "pixels"
        return pa.table(
            {
                "media_id": t["media_id"],
                "height": t["height"],
                "width": t["width"],
                "pixels": pa.array([o.tolist() for o in out], pa.list_(pa.uint8())),
            }
        )


class ResizeImage:
    """Actor-pool stage: nearest-neighbor resize on the tensor column —
    REAL vectorized math (no codec needed)."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        ow, oh = self.out_w, self.out_h
        out = []
        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        for i, px in enumerate(t["pixels"]):
            w, h = int(ws[i]), int(hs[i])
            img = np.asarray(px.as_py(), dtype=np.uint8).reshape(h, w, 3)
            yi = (np.arange(oh) * h // oh).astype(np.int64)
            xi = (np.arange(ow) * w // ow).astype(np.int64)
            out.append(img[yi][:, xi].reshape(-1))
        return pa.table(
            {
                "media_id": t["media_id"],
                "height": pa.array(np.full(t.num_rows, oh, np.int32)),
                "width": pa.array(np.full(t.num_rows, ow, np.int32)),
                "pixels": pa.array([o.tolist() for o in out], pa.list_(pa.uint8())),
            }
        )


class ImageFeatures:
    """Actor-pool stage: tensor → feature vector (model inference slot).

    STUB model = channel-wise histogram (deterministic, vectorizable);
    real impl loads weights once per actor in __init__."""

    def __init__(self, bins: int = 16):
        self.bins = bins  # model load would happen here

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for px in t["pixels"]:
            arr = np.asarray(px.as_py(), dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.bins, range=(0, 256))
            feats.append((hist / max(arr.size, 1)).astype(np.float64))
        return pa.table(
            {
                "media_id": t["media_id"],
                "embedding": pa.array([f.tolist() for f in feats]),
            }
        )


class FrameSample:
    """Video stage shape: binary → k evenly-spaced 'frames' (stub slices)."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        mid, fid, data = [], [], []
        for i, buf in enumerate(t["data"]):
            raw = buf.as_py()
            step = max(1, len(raw) // self.k)
            for j in range(self.k):
                mid.append(int(t["media_id"][i].as_py()))
                fid.append(j)
                data.append(raw[j * step : (j + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(mid, pa.int64()),
                "frame": pa.array(fid, pa.int32()),
                "data": pa.array(data, pa.binary()),
            }
        )


def image_pipeline(media: ray.data.Dataset, out_w=32, out_h=24, concurrency=(1, 4)):
    """decode → resize → features, each an actor-pool stage with media-sized
    batches."""
    return (
        media.map_batches(DecodeImage, batch_format="pyarrow", batch_size=64, concurrency=concurrency)
        .map_batches(ResizeImage, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h}, batch_format="pyarrow", batch_size=64, concurrency=concurrency)
        .map_batches(ImageFeatures, batch_format="pyarrow", batch_size=64, concurrency=concurrency)
    )
