"""Direct unit tests: vectorized key formatting and the distributed
LSH blocking path."""

import pyarrow as pa
import ray.data

from kgeng.config import BlockConfig
from kgeng.ops import keys
from kgeng.ops.block import (candidate_pairs, candidate_pairs_driver,
                             jaccard, minhash_batch)
from tests import oracle


def test_key_formatters_match_reference_oracle():
    ids = pa.array([123, 7, 0])
    got_plain = keys.idx_to_vertex("v", ids).to_pylist()
    assert got_plain == [oracle.idx_to_vertex("v", i) for i in (123, 7, 0)]
    got_smart = keys.idx_to_smart_vertex("v", ids).to_pylist()
    assert got_smart == [oracle.idx_to_smart_vertex("v", i)
                         for i in (123, 7, 0)]
    got_sv = keys.idx_to_smart_vertex(
        "v", ids, smart_value=pa.array(["a", "b", "c"])).to_pylist()
    assert got_sv == ["v/a:123", "v/b:7", "v/c:0"]
    assert keys.smart_key(pa.array(["9"])).to_pylist() == ["9:9"]
    assert keys.smart_key(pa.array(["9"]),
                          pa.array(["p"])).to_pylist() == ["p:9"]


def test_distributed_candidate_pairs_matches_driver_path():
    surfaces = [("Acme Systems", True), ("Acme Sstems", False),
                ("Borealis Labs", True), ("Borealis Lbs", False),
                ("Quantum Mesa", False)]
    cfg = BlockConfig()
    driver_pairs = {(a, b) for a, b, j in
                    candidate_pairs_driver(surfaces, cfg) if a}
    tbl = pa.table({"surface": [s for s, _ in surfaces],
                    "is_gaz": [g for _, g in surfaces]})
    dist = candidate_pairs(ray.data.from_arrow(tbl), cfg).take_all()
    dist_pairs = {(r["a"], r["b"]) for r in dist if r["a"]}
    assert driver_pairs == dist_pairs
    assert ("Acme Sstems", "Acme Systems") in driver_pairs
    assert not any("Quantum Mesa" in p for p in driver_pairs)


def test_minhash_identical_surfaces_identical_signatures():
    cfg = BlockConfig()
    sig = minhash_batch(["Acme Systems", "Acme Systems", "Other Words"],
                        cfg)
    assert (sig[0] == sig[1]).all()
    assert not (sig[0] == sig[2]).all()
    assert jaccard("Acme Systems", "Acme Systems", cfg.shingle_k) == 1.0


def test_union_find_long_chain_no_recursion():
    """A >1000-deep parent chain (unions in decreasing chain order) must
    not blow Python's recursion limit."""
    from kgeng.ops.canonicalize import UnionFind

    uf = UnionFind()
    n = 3000
    for i in range(n - 1, 0, -1):
        uf.union(f"s{i:05d}", f"s{i + 1:05d}")
    root = uf.find(f"s{n:05d}")
    assert root == "s00001"
    assert all(uf.find(f"s{i:05d}") == root for i in (1, 2, n // 2, n))


def test_candidate_pairs_hot_band_sentinels_not_collapsed():
    """Each oversized band must emit its OWN counted sentinel; the pair
    dedup must not merge different hot bands into one row."""
    import ray.data

    from kgeng.config import BlockConfig
    from kgeng.ops.block import candidate_pairs

    cfg = BlockConfig(max_band_group=1)
    surfaces = ray.data.from_items(
        [{"surface": "zzz identical zzz", "is_gaz": False}
         for _ in range(4)])
    out = candidate_pairs(surfaces, cfg).to_pandas()
    sent = out[out["a"] == ""]
    # 4 identical surfaces collide in EVERY band -> one sentinel per band
    assert len(sent) == cfg.num_bands
    assert sent["b"].nunique() == cfg.num_bands
    assert (sent["jac"] == -4.0).all()
    assert (out["a"] != "").sum() == 0  # all groups were oversized
