"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns with typed metadata, processed by
actor-pool ``map_batches`` stages. The actual codec work (image decode,
resampling, frame sampling) requires libraries not present in this container,
so the DECODE KERNEL IS STUBBED: ``fake=True`` (default) produces a
deterministic feature vector from the payload bytes so the Ray-side plumbing
— schema, batch sizing, actor lifecycle, output layout — is real and tested;
``fake=False`` raises NotImplementedError at the decode call site.

Scale notes: large binary payloads dominate block size — run these stages
with a small ``batch_size`` (e.g. 16-64) and ``concurrency=(n, m)`` actor
pools; model/codec state loads once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.functions.farmhash import farmhash64_bytes


class _DecodeActor:
    """Actor-pool callable: heavy setup once per actor, decode per batch."""

    def __init__(self, input_col: str, output_col: str, feature_dim: int, fake: bool):
        self.input_col = input_col
        self.output_col = output_col
        self.feature_dim = feature_dim
        self.fake = fake
        # real impl would load the codec / model here, once per actor

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "binary decode requires image/audio codecs not present in this "
                "container; run with fake=True for the deterministic stub"
            )
        # deterministic fake: seed a feature vector from the payload hash
        h = farmhash64_bytes(payload or b"")
        rng = np.random.RandomState(h % (2**32))
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        feats = np.stack(
            [self._decode_one(p if p is not None else b"") for p in payloads]
        ) if payloads else np.zeros((0, self.feature_dim), np.float32)
        n = len(payloads)
        out = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1) * self.feature_dim, pa.int32()),
            pa.array(feats.reshape(-1), pa.float32()),
        )
        return _append_or_replace(batch, self.output_col, out)


class BinaryFeatureExtractTransformer(Transformer):
    """binary payload -> list<float32>[feature_dim] feature vector via an
    actor pool (setup once per actor; batches sized for large payloads)."""

    compatible_dtypes = None
    fusible = False

    def __init__(
        self,
        *args,
        feature_dim: int = 64,
        fake: bool = True,
        batch_size: int = 64,
        concurrency: tuple[int, int] = (1, 4),
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.feature_dim = int(feature_dim)
        self.fake = fake
        self.batch_size = int(batch_size)
        self.concurrency = tuple(concurrency)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        actor = _DecodeActor(self.input_col, self.output_col, self.feature_dim, self.fake)
        return actor(batch)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            _DecodeActor,
            fn_constructor_args=(self.input_col, self.output_col, self.feature_dim, self.fake),
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


class FrameSampleTransformer(Transformer):
    """Video-style payload -> sampled frame payloads (every ``stride``-th
    chunk of ``frame_bytes``). Deterministic byte-slicing stands in for real
    frame extraction; output is list<binary>."""

    compatible_dtypes = None
    fusible = False

    def __init__(self, *args, frame_bytes: int = 1024, stride: int = 4, max_frames: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.frame_bytes = int(frame_bytes)
        self.stride = int(stride)
        self.max_frames = int(max_frames)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        out = []
        for p in payloads:
            if p is None:
                out.append(None)
                continue
            frames = [
                p[i : i + self.frame_bytes]
                for i in range(0, len(p), self.frame_bytes * self.stride)
            ][: self.max_frames]
            out.append(frames)
        arr = pa.array(out, pa.list_(pa.binary()))
        return _append_or_replace(batch, self.output_col, arr)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            self.transform_batch, batch_format="pyarrow", batch_size=64
        )
