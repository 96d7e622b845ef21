"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED (the container ships no
image/audio libraries): ``DecodeImage`` uses a deterministic fake decoder
over the binary payload so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested. Swapping
``_fake_decode`` for PIL/ffmpeg is the only change needed on a real
cluster (clearly marked below).

Payloads here are the ``html:binary`` column of the synthetic pages
corpus (the only binary column available) standing in for image bytes.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

import numpy as np
import pyarrow as pa


def _fake_decode(payload: bytes, target: int = 8) -> np.ndarray:
    """STUB decoder: deterministic ``target×target`` uint8 'thumbnail'
    derived from the payload digest. Replace with a real decoder
    (``PIL.Image.open`` / ``torchvision``) on a cluster with the libs:

        raise NotImplementedError("real image decode requires PIL")
    """
    h = hashlib.blake2b(payload, digest_size=target * target).digest()
    return np.frombuffer(h, dtype=np.uint8).reshape(target, target)


class DecodeImage:
    """Actor-pool stage: binary payload column → fixed-size feature grid +
    metadata. Heavy setup (model load, codec init) belongs in __init__;
    per-batch work stays vectorized over the batch."""

    def __init__(self, payload_col: str = "payload", target: int = 8):
        self.payload_col = payload_col
        self.target = target
        # real version: self.model = load_model(...)  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        grids = []
        means = []
        sizes = []
        for p in payloads:
            p = p or b""
            g = _fake_decode(p, self.target)
            grids.append(g.ravel().tolist())
            means.append(float(g.mean()))
            sizes.append(len(p))
        out_cols: Dict[str, pa.Array] = {}
        for name in batch.column_names:
            if name != self.payload_col:
                out_cols[name] = batch.column(name)
        out_cols["thumb"] = pa.array(grids, pa.list_(pa.uint8()))
        out_cols["thumb_mean"] = pa.array(means, pa.float64())
        out_cols["payload_bytes"] = pa.array(sizes, pa.int64())
        return pa.table(out_cols)


def image_features(pages_paths, concurrency: int = 4, batch_size: int = 256):
    """Binary-payload feature extraction pipeline: small batches (binary
    rows are fat), actor pool, payload column dropped on output so the
    heavy bytes never travel past this stage."""
    import ray.data

    ds = ray.data.read_parquet(pages_paths, columns=["url", "html"])
    ds = ds.map_batches(
        lambda b: pa.table({"url": b.column("url"), "payload": b.column("html")}),
        batch_format="pyarrow",
    )
    return ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SampleFrames:
    """Video-style frame sampling stub: emits every k-th 'frame' (fixed
    chunk of the payload) as its own row — the flat_map-shaped stage of a
    real video pipeline, with deterministic fake frames."""

    def __init__(self, payload_col: str = "payload", every: int = 4, frame_bytes: int = 64):
        self.payload_col = payload_col
        self.every = every
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, idxs, frames = [], [], []
        for url, p in zip(
            batch.column("url").to_pylist(), batch.column(self.payload_col).to_pylist()
        ):
            p = p or b""
            n_frames = max(1, len(p) // self.frame_bytes)
            for fi in range(0, n_frames, self.every):
                chunk = p[fi * self.frame_bytes : (fi + 1) * self.frame_bytes]
                urls.append(url)
                idxs.append(fi)
                frames.append(hashlib.blake2b(chunk, digest_size=16).digest())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_sig": pa.array(frames, pa.binary()),
            }
        )
