"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns with typed metadata, processed by
actor-pool ``map_batches`` stages.

REAL pure-Python decoders (no external codec libraries needed):
- ``PgmDecodeTransformer``: netpbm P5/P2 grayscale images (binary/ASCII) ->
  width/height/maxval + mean/std pixel statistics. The PGM format is fully
  specified in the public netpbm docs; raw pixel math is numpy.
- ``WavDecodeTransformer``: RIFF/WAVE PCM (8/16/32-bit) -> sample_rate /
  channels / n_samples / RMS energy. RIFF chunk layout per the public
  WAVE spec; sample math is numpy.

The generic ``BinaryFeatureExtractTransformer`` remains for formats that DO
need external codecs (JPEG/MP3/video): its ``fake=True`` stub produces a
deterministic feature vector so the Ray-side plumbing — schema, batch
sizing, actor lifecycle, output layout — stays real and tested;
``fake=False`` raises NotImplementedError at the decode call site.

Scale notes: large binary payloads dominate block size — run these stages
with a small ``batch_size`` (e.g. 16-64) and ``concurrency=(n, m)`` actor
pools; model/codec state loads once per actor in ``__init__``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.functions.farmhash import farmhash64_bytes


# ---------------------------------------------------------------------------
# real decoders: netpbm PGM (P5/P2) and RIFF/WAVE PCM
# ---------------------------------------------------------------------------


def decode_pgm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a netpbm grayscale image (P5 binary or P2 ASCII) ->
    (width, height, maxval, pixels float64 array). Raises ValueError on
    malformed input. Format: magic, whitespace/comment-separated width,
    height, maxval tokens, then raster (binary bytes for P5, ASCII ints
    for P2)."""
    if payload[:2] not in (b"P5", b"P2"):
        raise ValueError(f"not a PGM payload (magic {payload[:2]!r})")
    binary = payload[:2] == b"P5"
    # tokenize header: fields separated by whitespace, '#' comments to EOL
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if binary:
        pos += 1  # exactly one whitespace byte after maxval
        per = 2 if maxval > 255 else 1
        need = w * h * per
        raster = payload[pos : pos + need]
        if len(raster) < need:
            raise ValueError(f"PGM raster truncated: {len(raster)} < {need} bytes")
        dt = ">u2" if per == 2 else np.uint8
        px = np.frombuffer(raster, dtype=dt, count=w * h).astype(np.float64)
    else:
        px = np.array(payload[pos:].split()[: w * h], dtype=np.float64)
        if len(px) < w * h:
            raise ValueError("PGM ASCII raster truncated")
    return w, h, maxval, px


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM payload -> (sample_rate, channels, n_samples,
    samples float64 normalized to [-1, 1)). Supports 8/16/32-bit integer PCM
    (format tag 1). Raises ValueError on malformed input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only integer PCM supported (format tag {audio_format})")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_samples = len(samples) // max(channels, 1)
    return sample_rate, channels, n_samples, samples


class _PgmDecodeActor:
    """Actor-pool callable: per-batch PGM header+raster parse -> stats."""

    def __init__(self, input_col: str, prefix: str):
        self.input_col = input_col
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        n = len(payloads)
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        mv = np.zeros(n, np.int64)
        mean = np.full(n, np.nan)
        std = np.full(n, np.nan)
        for i, p in enumerate(payloads):
            if not p:
                continue
            wi, hi, mvi, px = decode_pgm(p)
            w[i], h[i], mv[i] = wi, hi, mvi
            mean[i] = px.mean()
            std[i] = px.std()  # population std
        pre = self.prefix
        batch = _append_or_replace(batch, f"{pre}_width", pa.array(w))
        batch = _append_or_replace(batch, f"{pre}_height", pa.array(h))
        batch = _append_or_replace(batch, f"{pre}_maxval", pa.array(mv))
        batch = _append_or_replace(batch, f"{pre}_mean", pa.array(mean, pa.float64(), from_pandas=True))
        return _append_or_replace(batch, f"{pre}_std", pa.array(std, pa.float64(), from_pandas=True))


class PgmDecodeTransformer(Transformer):
    """Real netpbm PGM decode (P5 binary / P2 ASCII) via an actor pool:
    emits ``<out>_width/_height/_maxval`` (int64) and ``<out>_mean/_std``
    (float64, population std) per image."""

    compatible_dtypes = None
    fusible = False

    def __init__(self, *args, batch_size: int = 64, concurrency: tuple[int, int] = (1, 4), **kwargs):
        super().__init__(*args, **kwargs)
        self.batch_size = int(batch_size)
        self.concurrency = tuple(concurrency)

    @property
    def outputs(self):
        pre = self.output_col
        return [f"{pre}_width", f"{pre}_height", f"{pre}_maxval", f"{pre}_mean", f"{pre}_std"]

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return _PgmDecodeActor(self.input_col, self.output_col)(batch)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            _PgmDecodeActor,
            fn_constructor_args=(self.input_col, self.output_col),
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


class _WavDecodeActor:
    def __init__(self, input_col: str, prefix: str):
        self.input_col = input_col
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        n = len(payloads)
        sr = np.zeros(n, np.int64)
        ch = np.zeros(n, np.int64)
        ns = np.zeros(n, np.int64)
        rms = np.full(n, np.nan)
        for i, p in enumerate(payloads):
            if not p:
                continue
            sri, chi, nsi, samples = decode_wav(p)
            sr[i], ch[i], ns[i] = sri, chi, nsi
            rms[i] = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
        pre = self.prefix
        batch = _append_or_replace(batch, f"{pre}_sample_rate", pa.array(sr))
        batch = _append_or_replace(batch, f"{pre}_channels", pa.array(ch))
        batch = _append_or_replace(batch, f"{pre}_n_samples", pa.array(ns))
        return _append_or_replace(batch, f"{pre}_rms", pa.array(rms, pa.float64(), from_pandas=True))


class WavDecodeTransformer(Transformer):
    """Real RIFF/WAVE PCM decode via an actor pool: emits
    ``<out>_sample_rate/_channels/_n_samples`` (int64) and ``<out>_rms``
    (float64 of normalized samples)."""

    compatible_dtypes = None
    fusible = False

    def __init__(self, *args, batch_size: int = 64, concurrency: tuple[int, int] = (1, 4), **kwargs):
        super().__init__(*args, **kwargs)
        self.batch_size = int(batch_size)
        self.concurrency = tuple(concurrency)

    @property
    def outputs(self):
        pre = self.output_col
        return [f"{pre}_sample_rate", f"{pre}_channels", f"{pre}_n_samples", f"{pre}_rms"]

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return _WavDecodeActor(self.input_col, self.output_col)(batch)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            _WavDecodeActor,
            fn_constructor_args=(self.input_col, self.output_col),
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


def encode_pgm(width: int, height: int, maxval: int, pixels: np.ndarray) -> bytes:
    """Build a P5 PGM payload (test/synthesis helper — the decoder's inverse)."""
    header = f"P5\n{width} {height}\n{maxval}\n".encode()
    if maxval > 255:
        return header + pixels.astype(">u2").tobytes()
    return header + pixels.astype(np.uint8).tobytes()


def encode_wav(sample_rate: int, channels: int, samples_i16: np.ndarray) -> bytes:
    """Build a 16-bit PCM WAV payload (test/synthesis helper)."""
    data = samples_i16.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


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


class _PgmResizeActor:
    """Actor-pool callable: PGM payload -> nearest-neighbor resized P5 payload."""

    def __init__(self, input_col: str, out_col: str, width: int, height: int):
        self.input_col = input_col
        self.out_col = out_col
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        out = []
        W, H = self.width, self.height
        xs_cache = {}
        for p in payloads:
            if not p:
                out.append(None)
                continue
            w, h, maxval, px = decode_pgm(p)
            key = (w, h)
            if key not in xs_cache:
                # nearest-neighbor source index grid (floor mapping)
                sx = (np.arange(W, dtype=np.int64) * w) // W
                sy = (np.arange(H, dtype=np.int64) * h) // H
                xs_cache[key] = (sy[:, None] * w + sx[None, :]).reshape(-1)
            resized = px[xs_cache[key]]
            mv = min(int(maxval), 255)
            scale = 255.0 / maxval if maxval > 255 else 1.0
            body = np.clip(resized * scale, 0, 255).astype(np.uint8).tobytes()
            out.append(b"P5\n%d %d\n%d\n" % (W, H, mv) + body)
        return _append_or_replace(batch, self.out_col, pa.array(out, pa.binary()))


class PgmResizeTransformer(Transformer):
    """Nearest-neighbor resize of PGM image payloads via an actor pool;
    emits a new P5 binary payload column (composable with
    PgmDecodeTransformer). 16-bit inputs are rescaled to 8-bit."""

    compatible_dtypes = None
    fusible = False

    def __init__(self, *args, width: int = 8, height: int = 8, batch_size: int = 64, concurrency: tuple[int, int] = (1, 4), **kwargs):
        super().__init__(*args, **kwargs)
        self.width = int(width)
        self.height = int(height)
        self.batch_size = int(batch_size)
        self.concurrency = tuple(concurrency)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return _PgmResizeActor(self.input_col, self.output_col, self.width, self.height)(batch)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            _PgmResizeActor,
            fn_constructor_args=(self.input_col, self.output_col, self.width, self.height),
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


class _SpectrogramActor:
    """Frame -> Hann window -> rfft magnitude -> log-mel-free band energies.

    The Hann window and band-edge index table are built ONCE per actor in
    ``__init__`` (the actor-pool contract: per-batch work is the ffts only)."""

    def __init__(self, input_col: str, prefix: str, n_fft: int, hop: int, n_bands: int):
        self.input_col = input_col
        self.prefix = prefix
        self.n_fft = int(n_fft)
        self.hop = int(hop)
        self.n_bands = int(n_bands)
        self.window = np.hanning(self.n_fft)
        n_bins = self.n_fft // 2 + 1
        self.band_edges = np.linspace(0, n_bins, self.n_bands + 1).astype(np.int64)

    def _one(self, samples: np.ndarray) -> tuple[int, np.ndarray]:
        n = len(samples)
        if n < self.n_fft:
            return 0, np.zeros(self.n_bands)
        n_frames = 1 + (n - self.n_fft) // self.hop
        idx = (np.arange(self.n_fft)[None, :]
               + self.hop * np.arange(n_frames)[:, None])
        frames = samples[idx] * self.window[None, :]
        mag = np.abs(np.fft.rfft(frames, axis=1))  # (frames, bins)
        power = mag * mag
        bands = np.add.reduceat(power, self.band_edges[:-1], axis=1)
        return n_frames, np.log1p(bands.mean(axis=0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        n = len(payloads)
        n_frames = np.zeros(n, np.int64)
        feats = np.zeros((n, self.n_bands))
        ok = np.zeros(n, dtype=bool)
        for i, p in enumerate(payloads):
            if not p:
                continue
            _, _, _, samples = decode_wav(p)
            nf, band = self._one(samples)
            n_frames[i], feats[i], ok[i] = nf, band, True
        pre = self.prefix
        batch = _append_or_replace(batch, f"{pre}_n_frames", pa.array(n_frames))
        flat = pa.array(feats.reshape(-1), pa.float32())
        lists = pa.FixedSizeListArray.from_arrays(flat, self.n_bands)
        if not ok.all():
            import pyarrow.compute as pc

            lists = pc.if_else(pa.array(ok), lists, pa.nulls(n, lists.type))
        return _append_or_replace(batch, f"{pre}_bands", lists)


class SpectrogramTransformer(Transformer):
    """Audio spectrogram band energies via an actor pool: WAV payload ->
    framed Hann-windowed rfft power -> ``n_bands`` averaged log band
    energies (``<out>_bands`` fixed_size_list<float32> + ``<out>_n_frames``).
    Window/band tables build once per actor; per-batch work is numpy ffts.
    Small ``batch_size`` by default — audio payloads are large."""

    compatible_dtypes = None
    fusible = False

    def __init__(self, *args, n_fft: int = 256, hop: int = 128, n_bands: int = 8,
                 batch_size: int = 64, concurrency: tuple[int, int] = (1, 4), **kwargs):
        super().__init__(*args, **kwargs)
        self.n_fft, self.hop, self.n_bands = int(n_fft), int(hop), int(n_bands)
        self.batch_size = int(batch_size)
        self.concurrency = tuple(concurrency)

    @property
    def outputs(self):
        return [f"{self.output_col}_n_frames", f"{self.output_col}_bands"]

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return _SpectrogramActor(self.input_col, self.output_col,
                                 self.n_fft, self.hop, self.n_bands)(batch)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            _SpectrogramActor,
            fn_constructor_args=(self.input_col, self.output_col,
                                 self.n_fft, self.hop, self.n_bands),
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


class _PgmAHashActor:
    """Actor-pool callable: PGM decode -> nearest-neighbor thumbnail ->
    average hash (integer-exact: bit_j = px_j * n > sum(px))."""

    def __init__(self, input_col: str, out: str, hw: int, hh: int):
        self.input_col = input_col
        self.out = out
        self.hw, self.hh = hw, hh

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        n = len(payloads)
        hw, hh = self.hw, self.hh
        nb = hw * hh
        j = np.arange(nb, dtype=np.int64)
        weights = np.int64(1) << j
        out = np.zeros(n, np.int64)
        valid = np.zeros(n, bool)
        for i, p in enumerate(payloads):
            if not p:
                continue
            w, h, _mv, px = decode_pgm(p)
            pxi = px.astype(np.int64)
            src = ((j // hw) * h // hh) * w + ((j % hw) * w) // hw
            t = pxi[src]
            bits = (t * np.int64(nb)) > t.sum()
            out[i] = int((weights[bits]).sum())
            valid[i] = True
        arr = pa.array(np.where(valid, out, 0), pa.int64(),
                       mask=~valid)  # null for empty payloads
        return _append_or_replace(batch, self.out, arr)


class PgmAverageHashTransformer(Transformer):
    """Image perceptual hash (aHash) via an actor pool — the near-dup
    primitive for image corpora: decode the PGM payload, take the
    ``hash_width x hash_height`` nearest-neighbor thumbnail (the
    PgmResizeTransformer mapping), and set ``bit_j = 1`` iff
    ``px_j * n > sum(px)`` — an INTEGER-EXACT brightness comparison (no
    float mean), so the hash is bit-identical to the closed-form SQL over
    the synthesized pixels. Emits ``output_col`` int64 (null for null/empty
    payloads). Visually-similar images (rescales, brightness-preserving
    noise) collide; bucket the hash (exact_dedup / groupby) to dedup, or
    band it for Hamming-distance candidates."""

    compatible_dtypes = None
    fusible = False

    def __init__(self, *args, hash_width: int = 4, hash_height: int = 4,
                 batch_size: int = 64, concurrency: tuple[int, int] = (1, 4),
                 **kwargs):
        super().__init__(*args, **kwargs)
        if hash_width * hash_height > 63:
            raise ValueError("hash_width * hash_height must be <= 63 (int64 bits)")
        self.hash_width = int(hash_width)
        self.hash_height = int(hash_height)
        self.batch_size = int(batch_size)
        self.concurrency = tuple(concurrency)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return _PgmAHashActor(self.input_col, self.output_col,
                              self.hash_width, self.hash_height)(batch)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            _PgmAHashActor,
            fn_constructor_args=(self.input_col, self.output_col,
                                 self.hash_width, self.hash_height),
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a netpbm COLOR image (P6 binary or P3 ASCII) ->
    (width, height, maxval, pixels (w*h, 3) float64 RGB). Same header
    grammar as :func:`decode_pgm`; raster is interleaved RGB triplets."""
    if payload[:2] not in (b"P6", b"P3"):
        raise ValueError(f"not a PPM payload (magic {payload[:2]!r})")
    binary = payload[:2] == b"P6"
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    n = w * h * 3
    if binary:
        pos += 1  # exactly one whitespace byte after maxval
        per = 2 if maxval > 255 else 1
        raster = payload[pos : pos + n * per]
        if len(raster) < n * per:
            raise ValueError(f"PPM raster truncated: {len(raster)} < {n * per}")
        dt = ">u2" if per == 2 else np.uint8
        px = np.frombuffer(raster, dtype=dt, count=n).astype(np.float64)
    else:
        px = np.array(payload[pos:].split()[:n], dtype=np.float64)
        if len(px) < n:
            raise ValueError("PPM ASCII raster truncated")
    return w, h, maxval, px.reshape(-1, 3)


def encode_ppm(width: int, height: int, maxval: int, rgb: np.ndarray) -> bytes:
    """Serialize an (w*h, 3) integer RGB array as binary P6 (test/synth
    twin of :func:`decode_ppm`; 8-bit only)."""
    assert maxval <= 255
    head = f"P6\n{width} {height}\n{maxval}\n".encode()
    return head + np.asarray(rgb, dtype=np.uint8).reshape(-1).tobytes()


class _PpmDecodeActor:
    """Actor-pool callable: per-batch PPM parse -> exact per-channel sums
    (int64 — the closed-form-oracle-friendly form) + the overall mean."""

    def __init__(self, input_col: str, prefix: str):
        self.input_col = input_col
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = A.as_array(batch.column(self.input_col))
        payloads = col.to_pylist()
        n = len(payloads)
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        mv = np.zeros(n, np.int64)
        sums = np.zeros((n, 3), np.int64)
        mean = np.full(n, np.nan)
        for i, p in enumerate(payloads):
            if not p:
                continue
            wi, hi, mvi, px = decode_ppm(p)
            w[i], h[i], mv[i] = wi, hi, mvi
            s = px.sum(axis=0).astype(np.int64)  # exact: pixel ints
            sums[i] = s
            mean[i] = float(int(s.sum())) / float(3 * wi * hi)
        pre = self.prefix
        batch = _append_or_replace(batch, f"{pre}_width", pa.array(w))
        batch = _append_or_replace(batch, f"{pre}_height", pa.array(h))
        batch = _append_or_replace(batch, f"{pre}_maxval", pa.array(mv))
        batch = _append_or_replace(batch, f"{pre}_r_sum", pa.array(sums[:, 0]))
        batch = _append_or_replace(batch, f"{pre}_g_sum", pa.array(sums[:, 1]))
        batch = _append_or_replace(batch, f"{pre}_b_sum", pa.array(sums[:, 2]))
        return _append_or_replace(batch, f"{pre}_mean",
                                  pa.array(mean, pa.float64(), from_pandas=True))


class PpmDecodeTransformer(Transformer):
    """Real netpbm COLOR decode (P6 binary / P3 ASCII) via an actor pool —
    the RGB sibling of :class:`PgmDecodeTransformer`: emits
    ``<out>_width/_height/_maxval`` + EXACT int64 per-channel pixel sums
    (``_r_sum/_g_sum/_b_sum`` — closed-form-oracle friendly) and the
    overall mean (ONE division of exact ints)."""

    compatible_dtypes = None
    fusible = False

    def __init__(self, *args, batch_size: int = 64,
                 concurrency: tuple[int, int] = (1, 4), **kwargs):
        super().__init__(*args, **kwargs)
        self.batch_size = int(batch_size)
        self.concurrency = tuple(concurrency)

    @property
    def outputs(self):
        pre = self.output_col
        return [f"{pre}_width", f"{pre}_height", f"{pre}_maxval",
                f"{pre}_r_sum", f"{pre}_g_sum", f"{pre}_b_sum", f"{pre}_mean"]

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return _PpmDecodeActor(self.input_col, self.output_col)(batch)

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        return ds.map_batches(
            _PpmDecodeActor,
            fn_constructor_args=(self.input_col, self.output_col),
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )
