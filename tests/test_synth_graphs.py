"""Graph-synthesis pipelines vs the oracle + determinism under parallelism."""

import numpy as np

from kgeng.io.graph_files import CompatGraphConfig
from kgeng.synth import graphs
from tests import oracle

SMART = CompatGraphConfig(vertex_coll="v", edge_coll="e",
                          smart_attribute="smartProp", is_smart=True)
PLAIN = CompatGraphConfig(vertex_coll="v", edge_coll="e",
                          smart_attribute="smartProp", is_smart=False)


def _set(ds):
    return {tuple(sorted(r.items())) for r in ds.take_all()}


def test_clique_edges_exact_plain():
    got = _set(graphs.clique_edges(10, PLAIN))
    want = {tuple(sorted(r.items()))
            for r in oracle.clique_edges(10, "v", smart=False)}
    assert got == want
    assert len(got) == 45


def test_clique_edges_exact_smart():
    got = _set(graphs.clique_edges(6, SMART))
    want = {tuple(sorted(r.items()))
            for r in oracle.clique_edges(6, "v", smart=True)}
    assert got == want


def test_clique_vertices_layouts():
    # smart, attr != part (vertices_generator.py:26-28)
    v = graphs.make_vertices(3, SMART, part_label="0").take_all()
    assert {r["_key"] for r in v} == {"0:0", "1:1", "2:2"}
    assert all(r["smartProp"] == r["_key"].split(":")[0] for r in v)
    assert all(r["part"] == "0" for r in v)
    # smart, attr == part (vertices_generator.py:29-30)
    cfg = CompatGraphConfig(vertex_coll="v", smart_attribute="part",
                            is_smart=True)
    v = graphs.make_vertices(2, cfg, part_label="7").take_all()
    assert {r["_key"] for r in v} == {"7:0", "7:1"}
    assert all(r["part"] == "7" for r in v)
    # non-smart (vertices_generator.py:35-37)
    v = graphs.make_vertices(2, PLAIN).take_all()
    assert {tuple(r.items()) for r in v} == {(("_key", "0"),), (("_key", "1"),)}


def test_bernoulli_deterministic_and_parallelism_invariant():
    e1 = _set(graphs.clique_edges(40, PLAIN, prob_missing=0.3, seed=11))
    e2 = _set(graphs.clique_edges(40, PLAIN, prob_missing=0.3, seed=11))
    assert e1 == e2
    full = 40 * 39 // 2
    assert 0.5 * full < len(e1) < 0.9 * full  # ~0.7 of pairs kept
    # different seed -> different set
    e3 = _set(graphs.clique_edges(40, PLAIN, prob_missing=0.3, seed=12))
    assert e1 != e3


def test_k_partite_exact():
    cfg = PLAIN
    # fixed sizes: use the deterministic size helper, then check vs oracle
    sizes = graphs.cliques_graph_sizes(3, 2, 4, seed=5)
    v, e = graphs.create_k_partite_graph(3, 2, 4, cfg, seed=5)
    want = {tuple(sorted(r.items()))
            for r in oracle.k_partite_edges(sizes, "v", smart=False)}
    assert _set(e) == want
    assert v.count() == sum(sizes)


def test_cliques_graph_counts():
    v, e = graphs.create_cliques_graph(3, 3, 3, PLAIN, seed=2)
    assert v.count() == 9
    intra = 3 * 3  # 3 cliques of size 3 -> 3 edges each
    inter = 3 * (3 * 3)  # 3 part-pairs x 9 vertex pairs
    assert e.count() == intra + inter


def test_cliques_graph_smart_part_labels():
    v, _e = graphs.create_cliques_graph(2, 2, 2, SMART, seed=3)
    rows = v.take_all()
    # part label = str(first id of clique) (vertices_generator.py:62-64)
    assert {r["part"] for r in rows} == {"0", "2"}


def test_smart_edge_ids_consistent_with_vertex_keys():
    """Edge endpoints must reference existing vertex _keys: smart value is
    the vertex id itself (clique_generator.py:36 smart_val_i=str(i)), so
    edges say v/<i>:<i> and vertices have _key <i>:<i>."""
    v, e = graphs.create_clique_graph(5, SMART)
    vkeys = {"v/" + r["_key"] for r in v.take_all()}
    for r in e.take_all():
        assert r["_from"] in vkeys and r["_to"] in vkeys
    # and in 'part' smart-attribute mode the part label is the smart value
    cfg = CompatGraphConfig(vertex_coll="v", smart_attribute="part",
                            is_smart=True)
    v2, e2 = graphs.create_clique_graph(4, cfg)
    vkeys2 = {"v/" + r["_key"] for r in v2.take_all()}
    for r in e2.take_all():
        assert r["_from"] in vkeys2 and r["_to"] in vkeys2


def test_cliques_graph_edge_endpoints_exist():
    v, e = graphs.create_cliques_graph(3, 2, 4, SMART, seed=9)
    vkeys = {"v/" + r["_key"] for r in v.take_all()}
    for r in e.take_all():
        assert r["_from"] in vkeys and r["_to"] in vkeys, r
