"""Shared hash arithmetic for shuffle-key columns.

Two invariants every hash column that enters a Ray Data shuffle must hold:

1. **Exact field arithmetic.** The minhash permutation family
   ``h(x) = (a*x + b) mod p`` (p = 2^61-1) is only universal if the
   multiply does not silently wrap modulo 2^64. ``mulmod_mersenne61``
   computes it exactly for crc32-sized inputs (x < 2^32) by splitting the
   multiplier and rotating within the 61-bit field — all in vectorized
   uint64 numpy, no Python bigints.

2. **int64-safe values.** Ray's block/boundary handling round-trips some
   key values through Python ints and re-infers int64; uint64 values above
   2^63-1 raise ``OverflowError``/``ArrowConversionError`` inside workers
   (observed in BENCH_r01: band hashes ~9.2e18 crashed the minhash stage).
   Every hash emitted into a Dataset column is therefore either masked to
   63 bits (``mask63``) or reinterpreted as two's-complement int64
   (``as_int64`` — preserves all 64 bits when the bit pattern itself
   matters, e.g. simhash Hamming distance).
"""

from __future__ import annotations

import numpy as np

MERSENNE61 = np.uint64((1 << 61) - 1)
MASK63 = np.uint64((1 << 63) - 1)
U64_MASK = (1 << 64) - 1


def mulmod_mersenne61(x: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """Exact ``(a*x + b) mod (2^61-1)`` for ``x < 2^32`` (crc32 range).

    Broadcasts like ``x * a + b`` (e.g. x ``(M, 1)`` against a/b ``(P,)``).
    ``a``/``b`` must be < 2^61. Returns canonical residues (< p) as uint64.

    Method: split ``a = a_hi*2^32 + a_lo``; both partial products fit in
    uint64 exactly (x < 2^32, a_lo < 2^32, a_hi < 2^29). The high product's
    ``* 2^32 mod p`` is a left-rotation by 32 within the 61-bit field.
    """
    p = MERSENNE61
    x = x.astype(np.uint64)
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a_hi = a >> np.uint64(32)               # < 2^29
    a_lo = a & np.uint64(0xFFFFFFFF)        # < 2^32
    t1 = x * a_lo                           # < 2^64, exact
    t1 = (t1 >> np.uint64(61)) + (t1 & p)   # < 2^61 + 8
    t2 = x * a_hi                           # < 2^61, exact
    # (t2 * 2^32) mod p == rotate-left-32 of the 61-bit value
    r = ((t2 << np.uint64(32)) & p) + (t2 >> np.uint64(29))
    total = t1 + r + b                      # < 3 * 2^61, fits uint64
    total = (total >> np.uint64(61)) + (total & p)
    return np.where(total >= p, total - p, total)


def minhash_signatures(x: np.ndarray, bounds: list[int] | np.ndarray,
                       a: np.ndarray, b: np.ndarray,
                       chunk_elems: int = 4096) -> np.ndarray:
    """Per-document minhash signatures: ``sig[d, p] = min over the doc's
    shingle hashes of (a_p * x + b_p) mod (2^61-1)``.

    ``bounds`` are cumulative shingle offsets per doc (len = n_docs + 1).
    Processes documents in chunks of ~``chunk_elems`` shingles so the
    (chunk, P) intermediates stay cache-resident — the one-shot (M, P)
    matrix is memory-bandwidth-bound at corpus scale (measured 30x
    slower than 4096-element chunks on 260k x 128)."""
    bounds = np.asarray(bounds, dtype=np.int64)
    n_docs = len(bounds) - 1
    P = len(a)
    sig = np.empty((n_docs, P), dtype=np.uint64)
    d0 = 0
    while d0 < n_docs:
        # extend the doc range until ~chunk_elems shingles are covered
        d1 = int(np.searchsorted(bounds, bounds[d0] + chunk_elems,
                                 side="left"))
        d1 = max(d1, d0 + 1)
        d1 = min(d1, n_docs)
        lo, hi = bounds[d0], bounds[d1]
        pm = mulmod_mersenne61(x[lo:hi, None], a, b)
        local = bounds[d0:d1] - lo
        sig[d0:d1] = np.minimum.reduceat(pm, local, axis=0)
        d0 = d1
    return sig


def mask63(arr: np.ndarray) -> np.ndarray:
    """Clear bit 63 and return int64 — safe for any Arrow/Ray boundary."""
    return (arr.astype(np.uint64) & MASK63).astype(np.int64)


def as_int64(arr: np.ndarray) -> np.ndarray:
    """Two's-complement reinterpretation (all 64 bits preserved)."""
    return arr.astype(np.uint64).view(np.int64)


def as_uint64(arr: np.ndarray) -> np.ndarray:
    """Inverse of ``as_int64``."""
    return np.asarray(arr, dtype=np.int64).view(np.uint64)


def xor64(a: int, b: int) -> int:
    """XOR of two (possibly negative, int64-born) Python ints as uint64."""
    return (int(a) ^ int(b)) & U64_MASK
