"""Deduplication pipelines for training-data corpora.

First-class additions beyond the reference (which has no set ops / dedup —
SURVEY.md §2.14): exact, MinHash+LSH, SimHash, n-gram Jaccard verification,
and embedding-cosine near-dup.

Ray design notes (100 TB shape):
- Exact dedup: hash the dedup key inside ``map_batches`` (cheap, vectorized),
  then ONE hash shuffle ``groupby(key).map_groups(keep-first)``; the winner
  within a group is the min of ``order_col`` — deterministic under any
  partitioning.
- MinHash LSH: signatures are computed batch-locally (universal hashing over
  shingle hashes — numpy (a*x+b) mod p, no per-permutation string hashing);
  docs are exploded to (band_id, band_hash) keys and grouped — only bucket
  keys shuffle, candidate verification (exact Jaccard) happens per bucket.
- The candidate-pair set is assumed driver-small relative to the corpus
  (pairs are duplicates by construction); connected components for cluster
  ids run on the driver with union-find.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A
from kamae_ray.functions.farmhash import farmhash64_bytes

_MERSENNE = (1 << 61) - 1


def _text_hash_batch(batch: pa.Table, text_col: str, out: str) -> pa.Table:
    flat = A.as_array(batch.column(text_col))
    d = flat.dictionary_encode()
    dict_vals = d.dictionary.to_pylist()
    mapped = np.array(
        [farmhash64_bytes((v or "").encode("utf-8")) & ((1 << 63) - 1) for v in dict_vals],
        dtype=np.int64,
    ) if dict_vals else np.array([], np.int64)
    idx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    vals = mapped[idx] if len(mapped) else np.zeros(len(flat), np.int64)
    return batch.append_column(out, pa.array(vals, pa.int64()))


def exact_dedup(ds, text_col: str, order_col: str, keep: str = "first"):
    """Keep one row per distinct ``text_col`` value — the min (keep='first')
    or max (keep='last') of ``order_col``. Hash-partition + per-group winner:
    one shuffle, deterministic under any block layout."""

    def keyfn(batch: pa.Table) -> pa.Table:
        return _text_hash_batch(batch, text_col, "__kr_key")

    def pick(group: pa.Table) -> pa.Table:
        order = A.as_array(group.column(order_col)).to_numpy(zero_copy_only=False)
        i = int(np.argmin(order)) if keep == "first" else int(np.argmax(order))
        return group.slice(i, 1).drop_columns(["__kr_key"])

    if isinstance(ds, pa.Table):
        keyed = keyfn(ds)
        keys = keyed.column("__kr_key").to_numpy(zero_copy_only=False)
        out_rows = []
        for k in np.unique(keys):
            idx = np.nonzero(keys == k)[0]
            out_rows.append(pick(keyed.take(pa.array(idx))))
        return pa.concat_tables(out_rows) if out_rows else ds.slice(0, 0)
    keyed = ds.map_batches(keyfn, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("__kr_key").map_groups(pick, batch_format="pyarrow")


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of word k-grams (shingles)."""
    words = text.split() if text else []
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.array(
        [farmhash64_bytes(s.encode("utf-8")) & _MERSENNE for s in set(shingles)],
        dtype=np.uint64,
    )


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int, shingle_k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = _shingle_hashes(text, shingle_k)
    if len(h) == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    # universal hashing (a*x + b) mod p, vectorized over (perm, shingle)
    vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class _MinHashBands:
    """Batch kernel: text -> exploded (id, band, band_hash) rows."""

    def __init__(self, text_col, id_col, num_perm, bands, shingle_k, seed):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)
        self.__name__ = "minhash_bands"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = A.as_array(batch.column(self.text_col)).to_pylist()
        ids = A.as_array(batch.column(self.id_col)).to_pylist()
        n = len(texts)
        B, R = self.bands, self.rows_per_band
        out_ids, out_band, out_hash = [], [], []
        for i in range(n):
            sig = minhash_signature(texts[i], self.num_perm, self.shingle_k, self.a, self.b)
            for bnd in range(B):
                chunk = sig[bnd * R : (bnd + 1) * R]
                bh = farmhash64_bytes(chunk.tobytes()) & ((1 << 63) - 1)
                out_ids.append(ids[i])
                out_band.append(bnd)
                out_hash.append(bh)
        return pa.table(
            {
                "id": pa.array(out_ids),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def minhash_lsh_candidates(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
):
    """MinHash+LSH near-duplicate candidate pairs: shingle -> minhash ->
    band -> bucket groupby. Returns a Dataset/Table of (id_a, id_b) pairs
    (id_a < id_b) that collide in at least one band."""
    fn = _MinHashBands(text_col, id_col, num_perm, bands, shingle_k, seed)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("id").to_pylist()))
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        pa_, pb_ = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pa_.append(ids[i])
                pb_.append(ids[j])
        return pa.table({"id_a": pa.array(pa_, pa.int64()), "id_b": pa.array(pb_, pa.int64())})

    if isinstance(ds, pa.Table):
        exploded = fn(ds)
        keys = [
            (exploded.column("band")[i].as_py(), exploded.column("band_hash")[i].as_py())
            for i in range(exploded.num_rows)
        ]
        buckets: dict = {}
        for i, k in enumerate(keys):
            buckets.setdefault(k, []).append(i)
        parts = [
            bucket_pairs(exploded.take(pa.array(idx)))
            for idx in buckets.values()
        ]
        pairs = pa.concat_tables(parts) if parts else None
        if pairs is None or pairs.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        # dedup pairs found in multiple bands
        return pairs.group_by(["id_a", "id_b"]).aggregate([]).sort_by([("id_a", "ascending"), ("id_b", "ascending")])
    exploded = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    pairs = exploded.groupby(["band", "band_hash"]).map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).count().drop_columns(["count()"])


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (verification for LSH candidates)."""
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find: pair list -> {id: cluster_representative}."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def near_dedup(
    ds,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
):
    """End-to-end near-duplicate removal:
    MinHash+LSH candidates -> exact n-gram Jaccard verification -> driver
    union-find clusters -> keep the min-id representative of each cluster.

    Returns (deduped_dataset_or_table, clusters: {id: representative}).
    Verification reads only the candidate docs (bounded by the duplicate
    count, not corpus size)."""
    pairs = minhash_lsh_candidates(ds, text_col, id_col, num_perm, bands, shingle_k, seed)
    if isinstance(pairs, pa.Table):
        pair_rows = list(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
    else:
        pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.take_all()]
    cand_ids = sorted({i for p in pair_rows for i in p})
    # fetch candidate texts (small side)
    if isinstance(ds, pa.Table):
        sel = ds.filter(pc.is_in(ds.column(id_col), value_set=pa.array(cand_ids)))
        texts = dict(zip(sel.column(id_col).to_pylist(), sel.column(text_col).to_pylist()))
    else:
        id_set = set(cand_ids)
        rows = ds.filter(lambda r: r[id_col] in id_set).take_all()
        texts = {r[id_col]: r[text_col] for r in rows}
    verified = [
        (a, b)
        for a, b in pair_rows
        if ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k) >= jaccard_threshold
    ]
    clusters = connected_components(verified)
    drop = {i for i, rep in clusters.items() if rep != i}
    if isinstance(ds, pa.Table):
        keep_mask = pc.invert(pc.is_in(ds.column(id_col), value_set=pa.array(sorted(drop), pa.int64())))
        return ds.filter(keep_mask), clusters
    deduped = ds.filter(lambda r: r[id_col] not in drop)
    return deduped, clusters


def simhash_buckets(ds, text_col: str, id_col: str, hamming_tables: int = 4):
    """SimHash near-dup candidates: 64-bit simhash split into
    ``hamming_tables`` segments; docs sharing any segment value are
    candidates (detects hamming distance < hamming_tables). Returns
    (id_a, id_b) pairs."""
    from kamae_ray.stages.text import FingerprintTransformer

    fp = FingerprintTransformer(input_col=text_col, method="simhash", output_col="__kr_sim")
    seg_bits = 64 // hamming_tables

    def explode(batch: pa.Table) -> pa.Table:
        sims = batch.column("__kr_sim").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = A.as_array(batch.column(id_col)).to_pylist()
        out_ids, out_seg, out_val = [], [], []
        for i, s in enumerate(sims):
            for t in range(hamming_tables):
                seg = int((s >> np.uint64(t * seg_bits)) & np.uint64((1 << seg_bits) - 1))
                out_ids.append(ids[i])
                out_seg.append(t)
                out_val.append(seg)
        return pa.table(
            {"id": pa.array(out_ids), "seg": pa.array(out_seg, pa.int32()), "val": pa.array(out_val, pa.int64())}
        )

    explode.__name__ = "simhash_explode"

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("id").to_pylist()))
        pa_, pb_ = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pa_.append(ids[i])
                pb_.append(ids[j])
        return pa.table({"id_a": pa.array(pa_, pa.int64()), "id_b": pa.array(pb_, pa.int64())})

    if isinstance(ds, pa.Table):
        t = fp.transform_batch(ds)
        ex = explode(t)
        buckets: dict = {}
        for i in range(ex.num_rows):
            k = (ex.column("seg")[i].as_py(), ex.column("val")[i].as_py())
            buckets.setdefault(k, []).append(i)
        parts = [bucket_pairs(ex.take(pa.array(idx))) for idx in buckets.values()]
        pairs = pa.concat_tables(parts)
        if pairs.num_rows == 0:
            return pairs
        return pairs.group_by(["id_a", "id_b"]).aggregate([]).sort_by([("id_a", "ascending"), ("id_b", "ascending")])
    t = fp.transform(ds)
    ex = t.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    pairs = ex.groupby(["seg", "val"]).map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).count().drop_columns(["count()"])


def embedding_neardup_pairs(ds, emb_col: str, id_col: str, threshold: float = 0.95, planes: int = 16, seed: int = 42):
    """Embedding-cosine near-dup: random-hyperplane LSH bucketing, then exact
    cosine verification inside each bucket. Returns (id_a, id_b, cosine)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        m, d = A.matrix_view(batch.column(emb_col))
        rng = np.random.RandomState(seed)
        H = rng.standard_normal((d, planes))
        signs = (m.astype(np.float64) @ H) > 0
        sig = np.zeros(len(m), dtype=np.int64)
        for b in range(planes):
            sig |= signs[:, b].astype(np.int64) << b
        out = batch.select([id_col, emb_col])
        return out.append_column("__kr_bucket", pa.array(sig, pa.int64()))

    bucketize.__name__ = "embed_bucketize"

    def verify(group: pa.Table) -> pa.Table:
        m, d = A.matrix_view(group.column(emb_col))
        ids = A.as_array(group.column(id_col)).to_pylist()
        x = m.astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        safe = np.where(norms == 0, 1, norms)
        xn = x / safe[:, None]
        sims = xn @ xn.T
        ia, ib, cs = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold and ids[i] != ids[j]:
                    a_, b_ = sorted((ids[i], ids[j]))
                    ia.append(a_)
                    ib.append(b_)
                    cs.append(float(sims[i, j]))
        return pa.table({"id_a": pa.array(ia, pa.int64()), "id_b": pa.array(ib, pa.int64()), "cosine": pa.array(cs, pa.float64())})

    if isinstance(ds, pa.Table):
        b = bucketize(ds)
        keys = b.column("__kr_bucket").to_numpy(zero_copy_only=False)
        parts = []
        for k in np.unique(keys):
            idx = np.nonzero(keys == k)[0]
            parts.append(verify(b.take(pa.array(idx))))
        pairs = pa.concat_tables(parts)
        if pairs.num_rows == 0:
            return pairs
        return pairs.group_by(["id_a", "id_b"]).aggregate([("cosine", "max")]).rename_columns(["id_a", "id_b", "cosine"]).sort_by([("id_a", "ascending"), ("id_b", "ascending")])
    b = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = b.groupby("__kr_bucket").map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).max("cosine")
