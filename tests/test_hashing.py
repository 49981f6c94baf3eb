"""Hash-arithmetic invariants: exact Mersenne-61 field math and
int64-safety of every shuffle-key hash column (the BENCH_r01 uint64
OverflowError regression)."""

import numpy as np
import pyarrow as pa
from kgeng.config import BlockConfig
from kgeng.ops.hashing import (MERSENNE61, as_int64, as_uint64, mask63,
                               mulmod_mersenne61, xor64)


def test_mulmod_matches_bigint_reference():
    p = (1 << 61) - 1
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 32, size=200, dtype=np.uint64)
    a = rng.integers(1, p, size=16, dtype=np.uint64)
    b = rng.integers(0, p, size=16, dtype=np.uint64)
    got = mulmod_mersenne61(x[:, None], a, b)
    for i in range(len(x)):
        for j in range(len(a)):
            want = (int(x[i]) * int(a[j]) + int(b[j])) % p
            assert int(got[i, j]) == want
    assert got.max() < p


def test_mulmod_edge_cases():
    p = (1 << 61) - 1
    x = np.array([0, 1, (1 << 32) - 1], dtype=np.uint64)
    a = np.array([1, p - 1, (1 << 61) - 2], dtype=np.uint64)
    b = np.array([0, p - 1, 1], dtype=np.uint64)
    got = mulmod_mersenne61(x[:, None], a, b)
    for i in range(3):
        for j in range(3):
            assert int(got[i, j]) == (int(x[i]) * int(a[j]) + int(b[j])) % p


def test_mask63_and_int64_roundtrip():
    vals = np.array([0, 1, (1 << 63) - 1, 1 << 63, (1 << 64) - 1,
                     9276325721179589358],  # the BENCH_r01 crash value
                    dtype=np.uint64)
    m = mask63(vals)
    assert m.dtype == np.int64 and (m >= 0).all()
    i = as_int64(vals)
    assert i.dtype == np.int64
    assert (as_uint64(i) == vals).all()
    assert xor64(i[3], i[4]) == int(vals[3] ^ vals[4])


def _arrow_roundtrip_ok(arr: pa.Array):
    """The failure mode in BENCH_r01 was Python-int -> int64 re-inference;
    emulate it: every value must survive a Python-int -> int64 round trip."""
    vals = arr.to_pylist()
    return pa.array(vals, pa.int64())


def test_band_keys_are_int64_safe():
    from kgeng.ops.block import band_keys, minhash_batch

    cfg = BlockConfig()
    # many surfaces to make >2^62 band hashes near-certain pre-fix
    surfaces = [f"Entity Number {i} Corporation" for i in range(500)]
    sig = minhash_batch(surfaces, cfg)
    assert sig.max() < (1 << 61)  # canonical mersenne residues
    _idx, bh = band_keys(sig, cfg)
    assert bh.dtype == np.int64 and (bh >= 0).all()
    _arrow_roundtrip_ok(pa.array(bh))


def test_minhash_band_column_int64():
    import ray

    from kgeng.ops.dedup import minhash_lsh_candidates

    t = pa.table({
        "doc_id": [str(i) for i in range(64)],
        "text": [" ".join(f"tok{j}" for j in range(i, i + 30))
                 for i in range(64)],
    })
    ds = ray.data.from_arrow(t)
    # reach into the banding stage: schema of the first map output
    cand = minhash_lsh_candidates(ds)
    cand.count()  # executes end-to-end without ArrowConversionError


def test_simhash_column_int64():
    import ray

    from kgeng.ops.dedup import add_simhash, simhash_batch

    texts = ["alpha beta gamma delta " * 5, "zzz " * 40]
    sigs = simhash_batch(texts)
    assert sigs.dtype == np.uint64
    t = pa.table({"doc_id": ["a", "b"], "text": texts})
    out = add_simhash(ray.data.from_arrow(t)).take_all()
    # stored value is the two's-complement int64 of the uint64 signature
    for row, s in zip(out, sigs):
        assert row["simhash"] == int(np.uint64(s).view(np.int64))


def test_exact_dedup_hash_is_63_bit():
    import ray

    from kgeng.ops.dedup import exact_dedup

    t = pa.table({"doc_id": ["a", "b", "c"],
                  "text": ["same", "same", "other"]})
    out = sorted(exact_dedup(ray.data.from_arrow(t)).take_all(),
                 key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["n_dups"]) for r in out] == [("a", 2),
                                                         ("c", 1)]


def test_fingerprint_63_bit():
    from kgeng.ops.text import _doc_fingerprint

    for text in ["a b c d e f g " * 10, "hello world " * 50, "x"]:
        fp = _doc_fingerprint(text)
        assert 0 <= fp < (1 << 63)
