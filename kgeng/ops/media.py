"""Multimodal column operators — image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — see README): ``decode_real`` raises
``NotImplementedError`` naming the missing dependency, and the default
path substitutes a deterministic fake (content-hash features), so the
Ray-side plumbing — schema, actor-pool signature, batch sizing, output
layout — is real and tested end-to-end.

Scale notes: binary payloads make rows wide, so these stages run with small
``batch_size`` and the blobs never enter a shuffle — only (media_ref,
features) rows move downstream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("kind", pa.string()),        # image | audio | video
    ("blob", pa.binary()),
    ("width", pa.int32()),        # metadata, -1 if unknown
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def decode_real(blob: bytes, kind: str):  # pragma: no cover - env-gated
    """The real decode seam. Raises in this sandbox."""
    raise NotImplementedError(
        "media decode requires an image/audio library (e.g. Pillow, "
        "soundfile) which is not installed in this container; the "
        "deterministic fake path exercises the same dataflow.")


def _fake_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature vector: seeded from the content hash,
    so output is stable across runs/parallelism — the dataflow contract a
    real model would satisfy."""
    h = hashlib.sha256(blob).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: binary media batch -> feature rows.

    Real deployments load the model in ``__init__`` (once per actor);
    here the 'model' is the fake-feature RNG config.
    """

    def __init__(self, dim: int = 32, use_real_decode: bool = False):
        self.dim = dim
        self.use_real = use_real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        kinds = batch["kind"].to_pylist()
        blobs = batch["blob"].to_pylist()
        feats = []
        for blob, kind in zip(blobs, kinds):
            if self.use_real:
                feats.append(decode_real(blob, kind))
            else:
                feats.append(_fake_features(blob, self.dim))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
            "n_bytes": pa.array([len(b) for b in blobs], pa.int64()),
        })


class ImageResizer:
    """Stub resize stage — emits target geometry metadata; the pixel kernel
    is the env-gated seam."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 use_real_decode: bool = False):
        self.tw, self.th = target_w, target_h
        self.use_real = use_real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_real:  # pragma: no cover
            decode_real(b"", "image")
        n = len(batch)
        return (batch.drop_columns(["blob"])
                .append_column("resized_w",
                               pa.array([self.tw] * n, pa.int32()))
                .append_column("resized_h",
                               pa.array([self.th] * n, pa.int32())))


class FrameSampler:
    """Stub video frame-sampling stage: emits one row per sampled frame
    timestamp (every ``stride_ms``), real frame extraction env-gated."""

    def __init__(self, stride_ms: int = 1000):
        self.stride = stride_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, ts = [], []
        for ref, dur in zip(batch["media_ref"].to_pylist(),
                            batch["duration_ms"].to_pylist()):
            dur = max(int(dur), 0)
            stamps = list(range(0, dur, self.stride)) or [0]
            refs.extend([ref] * len(stamps))
            ts.extend(stamps)
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "frame_ms": pa.array(ts, pa.int32())})


def featurize_media(ds: ray.data.Dataset, dim: int = 32,
                    batch_size: int = 64,
                    concurrency=(1, 4)) -> ray.data.Dataset:
    """Media table -> features. Small batch_size: blobs are wide rows."""
    return ds.map_batches(MediaFeaturizer,
                          fn_constructor_kwargs={"dim": dim},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def synth_media_table(media_refs: list[str], seed: int = 1) -> pa.Table:
    """Deterministic fake media blobs for the corpus' media_ref values —
    test fixture for the multimodal path (no external data)."""
    rows = {n: [] for n in MEDIA_SCHEMA.names}
    for ref in media_refs:
        h = hashlib.sha256(f"{seed}|{ref}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        kind = ["image", "audio", "video"][rng.integers(0, 3)]
        blob = rng.bytes(int(rng.integers(256, 2048)))
        rows["media_ref"].append(ref)
        rows["kind"].append(kind)
        rows["blob"].append(blob)
        rows["width"].append(int(rng.integers(64, 1024))
                             if kind == "image" else -1)
        rows["height"].append(int(rng.integers(64, 1024))
                              if kind == "image" else -1)
        rows["duration_ms"].append(int(rng.integers(500, 30000))
                                   if kind != "image" else -1)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
