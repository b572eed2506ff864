"""Multimodal columns: decode / feature-extract stages for opaque binary
payloads (image / audio / video) as stateful actor-pool ``map_batches``
stages.

The Ray-side plumbing is real and tested — typed schemas, actor-pool
construction (model "loaded" once per actor in ``__init__``), small batch
sizes for large payloads — while the codec itself is STUBBED: the actual
image/audio libraries are not in this environment, so ``_decode_*`` raise
``NotImplementedError`` unless ``fake=True`` selects the deterministic fake
decoder (a seeded hash of the payload), which keeps every downstream shape
and dtype identical to a real decode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def _payload_hash(b: bytes) -> np.ndarray:
    return np.frombuffer(hashlib.sha256(b).digest(), np.uint8)


class ImageDecodeFeatures:
    """(doc_id, payload:binary) -> (doc_id, width, height, channels,
    embedding:list<float32>[dim]).

    Real path would open the payload with PIL/opencv and run a vision model
    loaded once per actor; the stub derives deterministic dims + features
    from the payload hash.
    """

    def __init__(self, dim: int = 32, fake: bool = True):
        self.dim = dim
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "real image decoding requires PIL/opencv, not available here; "
                "use fake=True for the deterministic stub"
            )

    def _decode(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        h = _payload_hash(payload)
        w = 64 + int(h[0]) * 8
        ht = 64 + int(h[1]) * 8
        rng = np.random.default_rng(int.from_bytes(h[:8].tobytes(), "big"))
        feat = rng.standard_normal(self.dim).astype(np.float32)
        return w, ht, 3, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        widths, heights, chans, feats = [], [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, c, f = self._decode(payload)
            widths.append(w)
            heights.append(h)
            chans.append(c)
            feats.append(f.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "channels": pa.array(chans, pa.int8()),
                "embedding": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioFeatures:
    """(doc_id, payload:binary) -> (doc_id, duration_s, mfcc:list<float32>)."""

    def __init__(self, n_mfcc: int = 13, fake: bool = True):
        self.n_mfcc = n_mfcc
        if not fake:
            raise NotImplementedError("real audio decode needs librosa/ffmpeg")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        durs, mfccs = [], []
        for payload in batch["payload"].to_pylist():
            h = _payload_hash(payload)
            durs.append(round(len(payload) / 16000.0, 4))
            rng = np.random.default_rng(int.from_bytes(h[8:16].tobytes(), "big"))
            mfccs.append(rng.standard_normal(self.n_mfcc).astype(np.float32).tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "duration_s": pa.array(durs, pa.float64()),
                "mfcc": pa.array(mfccs, pa.list_(pa.float32())),
            }
        )


class VideoFrameSampler:
    """(doc_id, payload:binary) -> one row PER SAMPLED FRAME
    (doc_id, frame_idx, frame_hash) — the explode-shaped stage."""

    def __init__(self, frames_per_doc: int = 4, fake: bool = True):
        self.k = frames_per_doc
        if not fake:
            raise NotImplementedError("real frame sampling needs ffmpeg")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, fhash = [], [], []
        for did, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n = max(1, len(payload))
            for j in range(self.k):
                off = (j * n) // self.k
                chunk = payload[off : off + 256]
                ids.append(did)
                fidx.append(j)
                fhash.append(hashlib.md5(chunk).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame_hash": pa.array(fhash, pa.string()),
            }
        )


def image_features(
    ds: "ray.data.Dataset",
    dim: int = 32,
    concurrency: int = 2,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Actor-pool image decode stage. Small ``batch_size``: binary payloads
    are large, so batch x concurrency must fit worker heaps."""
    return ds.map_batches(
        ImageDecodeFeatures,
        fn_constructor_kwargs={"dim": dim, "fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def audio_features(
    ds: "ray.data.Dataset", concurrency: int = 2, batch_size: int = 64
) -> "ray.data.Dataset":
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def video_frames(
    ds: "ray.data.Dataset",
    frames_per_doc: int = 4,
    concurrency: int = 2,
    batch_size: int = 16,
) -> "ray.data.Dataset":
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"frames_per_doc": frames_per_doc, "fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
