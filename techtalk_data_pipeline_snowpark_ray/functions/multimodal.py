"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool map_batches stages.

The container has no image/audio codecs (PIL/cv2/torchaudio are
unavailable), so the DECODE step is stubbed exactly as mandated: a
clearly-marked real-decoder path raising NotImplementedError plus a
deterministic fake decoder. Everything Ray-side is real and tested:
the media schema, binary-column batching (kept in `pyarrow` batch
format -- binary round-trips poorly through pandas), per-actor decoder
initialization, feature-extract output layout, and frame sampling.

Schema:  media(media_id:int64, kind:string{image,audio,video},
               payload:binary, width:int32, height:int32, n_frames:int32)

Scale notes: binary payloads dominate bytes, so stages run with SMALL
batch_size (payload bytes, not row count, size the batch) and the
decode pool is an actor pool (model/codec init once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

KINDS = ("image", "audio", "video")
MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),
    pa.field("payload", pa.binary()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("n_frames", pa.int32()),
])


def synth_media_batch(t: pa.Table) -> pa.Table:
    """Deterministic media rows derived from documents (doc text bytes
    stand in for encoded payloads)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text = t["text"].to_pylist()
    kind = [KINDS[int(i) % 3] for i in ids]
    payload = [s.encode("utf-8") if s else b"" for s in text]
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kind, pa.string()),
        "payload": pa.array(payload, pa.binary()),
        "width": pa.array((ids % 64 + 8).astype(np.int32)),
        "height": pa.array((ids % 48 + 8).astype(np.int32)),
        "n_frames": pa.array((ids % 30 + 1).astype(np.int32)),
    })


def media_dataset(sf_dir: str) -> ray.data.Dataset:
    import os
    from ..sources.tables import read_table
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(synth_media_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    __init__ (once per actor) probes for a real codec; absent one, the
    deterministic fake decoder is used so the Ray-side plumbing stays
    real and testable. `self.decoded_batches` proves per-actor reuse.
    """

    def __init__(self, use_real_codec: bool = False):
        self.use_real_codec = use_real_codec
        if use_real_codec:
            try:
                import PIL.Image  # noqa: F401
                self._codec = "pillow"
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode requires a codec library (PIL/cv2), "
                    "not available in this environment") from e
        self.decoded_batches = 0

    @staticmethod
    def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
        """Deterministic stand-in for decode: payload bytes -> pseudo
        pixel grid seeded by the payload digest."""
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        seed = int.from_bytes(digest, "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(height, width), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_real_codec:
            # the codec LIBRARY may exist, but the real decode kernel is
            # the deliberately-stubbed boundary -- fail loudly rather
            # than silently returning fake features as real ones
            raise NotImplementedError(
                "real codec decode is the stubbed boundary; only the "
                "deterministic fake decoder is implemented")
        self.decoded_batches += 1
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        means = np.empty(len(ids), dtype=np.float64)
        stds = np.empty(len(ids), dtype=np.float64)
        n_bytes = np.empty(len(ids), dtype=np.int64)
        for i, p in enumerate(payloads):   # per-item decode is inherent;
            img = self._fake_decode(p, int(widths[i]), int(heights[i]))
            means[i] = float(img.mean())   # the kernel itself is numpy
            stds[i] = float(img.std())
            n_bytes[i] = len(p)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array(n_bytes),
            "feat_mean": pa.array(np.round(means, 6)),
            "feat_std": pa.array(np.round(stds, 6)),
        })


class MediaResizer(MediaDecoder):
    """Actor-pool resize stage: decode -> nearest-neighbor resample to
    a fixed target grid -> re-emit as a binary column (the standard
    normalize-dimensions step before batched model inference). Reuses
    the decoder lifecycle (codec probe once per actor); the resample
    itself is one vectorized fancy-index per item, no Python pixel
    loops. Output payloads are target_w*target_h bytes, so downstream
    batches are uniformly sized -- the property batched inference
    needs."""

    def __init__(self, target_w: int = 16, target_h: int = 12,
                 use_real_codec: bool = False):
        super().__init__(use_real_codec=use_real_codec)
        self.tw, self.th = int(target_w), int(target_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.decoded_batches += 1
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        out = []
        checks = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            img = self._fake_decode(p, int(widths[i]), int(heights[i]))
            # nearest-neighbor index grids (vectorized resample)
            yi = (np.arange(self.th) * img.shape[0]) // self.th
            xi = (np.arange(self.tw) * img.shape[1]) // self.tw
            r = img[np.ix_(yi, xi)]
            out.append(r.tobytes())
            checks[i] = int(r.sum())
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out, pa.binary()),
            "width": pa.array(np.full(len(out), self.tw, dtype=np.int32)),
            "height": pa.array(np.full(len(out), self.th, dtype=np.int32)),
            "pixel_sum": pa.array(checks),
        })


def media_resized(sf_dir: str, target_w: int = 16,
                  target_h: int = 12) -> ray.data.Dataset:
    """End-to-end resize pipeline: synth media -> actor-pool decode +
    nearest-neighbor resize to (target_w x target_h). Deterministic
    (payload-digest-seeded fake decode); rows-only oracle, exactness
    pinned by pytest."""
    media = media_dataset(sf_dir)
    return media.map_batches(
        MediaResizer, batch_format="pyarrow", batch_size=512,
        concurrency=2, zero_copy_batch=True,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h,
                                   use_real_codec=False)).sort("media_id")


def frame_sample_batch(t: pa.Table, every_k: int = 5) -> pa.Table:
    """Video frame sampling: one output row per sampled frame index
    (flat_map shape, vectorized via repeat/arange)."""
    vids = t.filter(pa.compute.equal(t["kind"], "video"))
    ids = vids["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nf = vids["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = (nf + every_k - 1) // every_k
    rep_ids = np.repeat(ids, counts)
    frame_idx = (np.concatenate([np.arange(c) for c in counts]) * every_k
                 if len(counts) else np.array([], dtype=np.int64))
    return pa.table({"media_id": pa.array(rep_ids, pa.int64()),
                     "frame_idx": pa.array(frame_idx.astype(np.int64))})


def multimodal_features(sf_dir: str) -> ray.data.Dataset:
    """End-to-end media pipeline: synth media table -> actor-pool decode
    + feature extraction. Deterministic; rows-only oracle."""
    media = media_dataset(sf_dir)
    return media.map_batches(MediaDecoder, batch_format="pyarrow",
                             batch_size=512,      # payload-sized batches
                             concurrency=2, zero_copy_batch=True,
                             fn_constructor_kwargs=dict(use_real_codec=False)
                             ).sort("media_id")


def video_frame_samples(sf_dir: str) -> ray.data.Dataset:
    media = media_dataset(sf_dir)
    return media.map_batches(frame_sample_batch, batch_format="pyarrow",
                             zero_copy_batch=True).sort(["media_id", "frame_idx"])
