"""Union-find canonicalization of mention surfaces.

Verified LSH pairs form a *candidate graph over unique surfaces* — by
construction orders of magnitude smaller than the corpus (SURVEY.md §7.5
plan A). Per-partition union-find forests are built inside ``map_batches``
(each task pre-unions its block of pairs and emits only its forest edges,
root -> member), then the driver performs the final union over the reduced
edge list. Plan B (iterative min-label propagation via groupby) is provided
as ``label_propagation_components`` for the case where the candidate graph
itself is huge.

Resolution rule: every component inherits the entity of its gazetteer
member; components holding >1 distinct entity are split deterministically by
best-Jaccard (tie: lexicographic) against the in-component gazetteer
surfaces. Components with no gazetteer member stay unresolved (noise
candidates are dropped downstream).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from kgeng.config import BlockConfig
from kgeng.ops.block import jaccard
from kgeng.ops.mat import mat


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        # ITERATIVE two-pass path compression: a recursive find would
        # blow Python's frame limit on a >1000-deep parent chain (pairs
        # arriving in decreasing chain order build exactly that)
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller string becomes the root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def _forest_edges(batch: pa.Table) -> pa.Table:
    """Pre-union one block of pairs; emit (root, member) forest edges."""
    uf = UnionFind()
    for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
        if a and b:
            uf.union(a, b)
    roots = [uf.find(x) for x in uf.parent]
    return pa.table({"a": pa.array(roots, pa.string()),
                     "b": pa.array(list(uf.parent.keys()), pa.string())})


def connected_components(pairs: ray.data.Dataset) -> dict[str, str]:
    """surface -> component root, via per-partition forests + driver union.

    ``pairs`` has columns (a, b, jac); sentinel rows (a == "") are skipped.
    The materialized forest-edge list is <= the number of *unique surfaces*,
    which is small by construction — this is the documented partitioning
    assumption (SURVEY.md §7.4/§7.5).
    """
    reduced = pairs.map_batches(_forest_edges, batch_format="pyarrow")
    uf = UnionFind()
    for batch in reduced.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            uf.union(a, b)
    return {x: uf.find(x) for x in list(uf.parent)}


def label_propagation_components(pairs: ray.data.Dataset,
                                 max_iter: int = 10) -> ray.data.Dataset:
    """Plan B: distributed min-label propagation (for huge candidate graphs).

    Returns a Dataset (surface, label) at fixpoint or after ``max_iter``
    rounds. Fully distributed: each round joins the adjacency list to the
    current labels on the neighbour key (hash-partitioned join) and takes
    a groupby-min — the driver never materializes the label table, it only
    sees a per-round convergence fingerprint (a commutative int64 sum of
    per-row crc32s, so it is partition-order independent).
    """
    import zlib

    import numpy as np
    import pyarrow.compute as pc

    from kgeng.ops.join import hash_join

    def explode(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch["a"], pa.scalar(""))
        batch = batch.filter(mask)
        return pa.table({
            "node": pa.concat_arrays([batch["a"].combine_chunks(),
                                      batch["b"].combine_chunks()]),
            "nbr": pa.concat_arrays([batch["b"].combine_chunks(),
                                     batch["a"].combine_chunks()]),
        })

    # adjacency is reused every round — pin its blocks once
    adj = pairs.map_batches(explode, batch_format="pyarrow").materialize()

    def _rename(ds):
        return ds.map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow")

    def fingerprint(ds) -> int:
        """Order-independent digest of the (node, label) assignment."""

        def f(t: pa.Table) -> pa.Table:
            v = np.fromiter(
                (zlib.crc32(f"{n}\x00{lb}".encode())
                 for n, lb in zip(t["node"].to_pylist(),
                                  t["label"].to_pylist())),
                dtype=np.int64, count=len(t))
            return pa.table({"s": pa.array([int(v.sum())], pa.int64())})

        return sum(r["s"] for r in
                   ds.map_batches(f, batch_format="pyarrow").take_all())

    # per-round block budget: union + groupby otherwise DOUBLE the block
    # count every round (1 -> 3 -> 7 -> ... -> 2^r), drowning the cluster
    # in empty blocks; a cheap split/coalesce repartition caps it
    n_blocks = max(4, int(ray.cluster_resources().get("CPU", 4)))

    # label(node) starts as min(node, min over neighbours)
    labels = _rename(adj.groupby("node").min("nbr"))
    labels = labels.map_batches(
        lambda t: t.set_column(1, "label",
                               pc.min_element_wise(t["label"], t["node"])),
        batch_format="pyarrow").repartition(n_blocks).materialize()
    prev = fingerprint(labels)
    for _ in range(max_iter - 1):
        # each round: label <- min(label, min over neighbours' labels)
        lab_as_nbr = labels.map_batches(
            lambda t: pa.table({"nbr": t["node"], "lab": t["label"]}),
            batch_format="pyarrow")
        nbr_lab = hash_join(adj, lab_as_nbr, "nbr").map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["lab"]}),
            batch_format="pyarrow")
        labels = mat(_rename(nbr_lab.union(labels)
                             .groupby("node").min("label"))
                     .repartition(n_blocks))
        cur = fingerprint(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def build_resolution_from_pairs(pairs: list[tuple[str, str, float]],
                                gazetteer: dict[str, tuple[str, str]],
                                cfg: BlockConfig) -> dict[str, tuple[str, bool]]:
    """Driver-side variant: union-find directly over an in-memory verified
    pair list (the default path — the candidate graph is small by
    construction; see candidate_pairs_driver)."""
    uf = UnionFind()
    for a, b, _j in pairs:
        if a and b:
            uf.union(a, b)
    comp = {x: uf.find(x) for x in list(uf.parent)}
    return _resolve_components(comp, gazetteer, cfg)


def build_resolution(pairs: ray.data.Dataset,
                     gazetteer: dict[str, tuple[str, str]],
                     cfg: BlockConfig) -> dict[str, tuple[str, bool]]:
    """surface -> (entity_id, via_alias).

    Gazetteer surfaces resolve to themselves (via_alias=False); NER surfaces
    resolve through their union-find component (via_alias=True); ambiguous
    components split by best Jaccard against in-component gazetteer surfaces.
    """
    comp = connected_components(pairs)
    return _resolve_components(comp, gazetteer, cfg)


def _resolve_components(comp: dict[str, str],
                        gazetteer: dict[str, tuple[str, str]],
                        cfg: BlockConfig) -> dict[str, tuple[str, bool]]:
    members: dict[str, list[str]] = {}
    for surf, root in comp.items():
        members.setdefault(root, []).append(surf)

    res: dict[str, tuple[str, bool]] = {
        s: (eid, False) for s, (eid, _t) in gazetteer.items()}
    for root, surfs in members.items():
        gaz_in = [s for s in surfs if s in gazetteer]
        ents = sorted({gazetteer[s][0] for s in gaz_in})
        ner_in = [s for s in surfs if s not in gazetteer]
        if not ents:
            continue  # noise component — stays unresolved
        if len(ents) == 1:
            for s in ner_in:
                res[s] = (ents[0], True)
        else:
            # over-merged component: deterministic best-Jaccard split
            for s in ner_in:
                best = max(gaz_in,
                           key=lambda g: (jaccard(s, g, cfg.shingle_k), g))
                res[s] = (gazetteer[best][0], True)
    return res
