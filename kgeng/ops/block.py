"""MinHash-LSH blocking over mention surfaces.

shingle(char k-grams) -> minhash (vectorized numpy permutations) ->
band keys -> ``groupby(band)`` -> candidate pairs -> Jaccard verify.

Only *unique surfaces* (∪ gazetteer surfaces) enter this stage — orders of
magnitude smaller than the corpus — so the band ``groupby`` shuffle is cheap
by construction even at 10^12-doc scale; the heavy corpus never shuffles.

All hashing is content-keyed (crc32 + fixed odd multipliers), never Python's
randomized ``hash()``, so bands are identical across processes and runs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from kgeng.config import BlockConfig
from kgeng.ops.hashing import MERSENNE61, mask63, minhash_signatures

_MERSENNE = int(MERSENNE61)  # single home: kgeng/ops/hashing.py


def _perm_tables(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def shingle_hashes(surface: str, k: int) -> np.ndarray:
    """Distinct crc32 hashes of the char k-grams of the lowercased surface."""
    s = surface.lower()
    if len(s) < k:
        grams = {s}
    else:
        grams = {s[i:i + k] for i in range(len(s) - k + 1)}
    return np.fromiter((zlib.crc32(g.encode()) for g in grams),
                       dtype=np.int64, count=len(grams))


def minhash_batch(surfaces: list[str], cfg: BlockConfig) -> np.ndarray:
    """(n, num_perm) uint64 minhash signatures, vectorized via reduceat."""
    a, b = _perm_tables(cfg.num_perm)
    hashes, bounds = [], [0]
    for s in surfaces:
        h = shingle_hashes(s, cfg.shingle_k)
        hashes.append(h)
        bounds.append(bounds[-1] + len(h))
    if not surfaces:
        return np.zeros((0, cfg.num_perm), dtype=np.uint64)
    x = np.concatenate(hashes)  # (M,)
    # EXACT mod-mersenne arithmetic (a plain x*a+b would wrap mod 2^64
    # and leave the claimed universal family), chunked for cache locality
    return minhash_signatures(x, bounds, a, b)


def band_keys(sig: np.ndarray, cfg: BlockConfig) -> tuple[np.ndarray, np.ndarray]:
    """Collapse each band's rows into one 63-bit int64 key (63 bits, not
    64: Ray's block boundaries round-trip key values through Python ints
    and int64 — uint64 values above 2^63-1 crash the Arrow conversion).
    Returns (band_idx[n*B], band_hash[n*B]) row-major per surface."""
    n, p = sig.shape
    rows = p // cfg.num_bands
    sig3 = sig.reshape(n, cfg.num_bands, rows)
    mult = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros((n, cfg.num_bands), dtype=np.uint64)
    for r in range(rows):
        acc = (acc * mult) ^ sig3[:, :, r]
    band_idx = np.tile(np.arange(cfg.num_bands, dtype=np.int32), n)
    return band_idx, mask63(acc.reshape(-1))


class BandEmitter:
    """surfaces batch -> (surface, is_gaz, band_idx, band_hash) rows."""

    def __init__(self, cfg: BlockConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        # is_gaz is NOT emitted: emit_pairs never reads it, and
        # replicating it num_bands times would pad the stage's only
        # shuffle with dead weight
        surfaces = batch["surface"].to_pylist()
        sig = minhash_batch(surfaces, self.cfg)
        band_idx, band_hash = band_keys(sig, self.cfg)
        B = self.cfg.num_bands
        return pa.table({
            "surface": pa.array(np.repeat(surfaces, B), pa.string()),
            "band_idx": pa.array(band_idx, pa.int32()),
            "band_hash": pa.array(band_hash, pa.int64()),
        })


def jaccard(a: str, b: str, k: int) -> float:
    ha = set(shingle_hashes(a, k).tolist())
    hb = set(shingle_hashes(b, k).tolist())
    inter = len(ha & hb)
    return inter / (len(ha) + len(hb) - inter) if (ha or hb) else 0.0


def candidate_pairs(surfaces: ray.data.Dataset,
                    cfg: BlockConfig) -> ray.data.Dataset:
    """surfaces(surface, is_gaz) -> verified pairs (a, b, jac) with a < b.

    Band groups larger than ``cfg.max_band_group`` are dropped (a hot/garbage
    band) — logged via a counter column, never silently at scale: the group
    emits a sentinel row with a="", b="", jac=-size.
    """
    banded = surfaces.map_batches(
        BandEmitter(cfg), batch_format="pyarrow", batch_size=4096)

    k = cfg.shingle_k
    thresh = cfg.jaccard_threshold
    cap = cfg.max_band_group

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # UNVERIFIED candidates: the same pair collides in up to
        # num_bands groups, so Jaccard runs AFTER the (a, b) dedup —
        # once per unique pair, not once per colliding band (the same
        # fix dedup._verify_distributed documents for doc-level LSH)
        if len(g) > cap:
            # sentinel key unique PER HOT BAND (a="" + the band id in
            # b): the pair dedup must aggregate drop counts, not
            # collapse every hot band into one row
            bi = int(g["band_idx"].iloc[0])
            bh = int(g["band_hash"].iloc[0])
            return pd.DataFrame({"a": [""], "b": [f"band:{bi}:{bh}"],
                                 "jac": [-float(len(g))]})
        surfs = sorted(set(g["surface"]))
        out_a, out_b = [], []
        for i in range(len(surfs)):
            for j in range(i + 1, len(surfs)):
                out_a.append(surfs[i])
                out_b.append(surfs[j])
        return pd.DataFrame({"a": out_a, "b": out_b,
                             "jac": [0.0] * len(out_a)})

    pairs = banded.groupby(["band_idx", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas")
    # min keeps the sentinels' -size; real pairs are all 0.0
    deduped = pairs.groupby(["a", "b"]).min("jac")

    def verify(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        j = t["min(jac)"].to_pylist()
        out_a, out_b, out_j = [], [], []
        for ai, bi, ji in zip(a, b, j):
            if ai == "":  # hot-band sentinel: pass through unchanged
                out_a.append(ai), out_b.append(bi), out_j.append(ji)
                continue
            jc = jaccard(ai, bi, k)
            if jc >= thresh:
                out_a.append(ai), out_b.append(bi), out_j.append(jc)
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string()),
                         "jac": pa.array(out_j, pa.float64())})

    return deduped.map_batches(verify, batch_format="pyarrow")


def candidate_pairs_driver(surfaces: list[tuple[str, bool]],
                           cfg: BlockConfig) -> list[tuple[str, str, float]]:
    """Driver-side LSH banding + verify over an already-distinct surface
    list — the default plan when the unique-surface set fits the driver
    (SURVEY.md §7.5 plan A; the distributed ``candidate_pairs`` is the
    fallback for extreme cardinalities). Same kernels, zero Ray stages.
    """
    surfs = [s for s, _g in surfaces]
    sig = minhash_batch(surfs, cfg)
    band_idx, band_hash = band_keys(sig, cfg)
    B = cfg.num_bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for row in range(len(surfs)):
        for b in range(B):
            key = (b, int(band_hash[row * B + b]))
            buckets.setdefault(key, []).append(row)
    seen: set[tuple[int, int]] = set()
    out = []
    for key, members in buckets.items():
        if len(members) > cfg.max_band_group:
            out.append(("", "", -float(len(members))))
            continue
        for ii in range(len(members)):
            for jj in range(ii + 1, len(members)):
                a, b = sorted((members[ii], members[jj]))
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                jc = jaccard(surfs[a], surfs[b], cfg.shingle_k)
                if jc >= cfg.jaccard_threshold:
                    # lexicographic pair order — same canonical form as
                    # the distributed candidate_pairs path
                    sa, sb = sorted((surfs[a], surfs[b]))
                    out.append((sa, sb, jc))
    return out
