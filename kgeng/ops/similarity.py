"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: the exact baseline — per-batch numpy matmul of the
  (broadcast) query matrix against each embedding block, local top-k per
  block, then a tiny global top-k reduction. The corpus streams; only
  (query_id, vec_id, sim) survivors shuffle.
- ``lsh_topk``: the scale path — random-hyperplane signatures bucket the
  corpus; only matching buckets are scored. Recall < 1 by construction;
  bucket width trades recall for cost.
- ``embedding_near_dup``: all pairs with cosine >= threshold, via the same
  hyperplane bucketing.

All scoring is float64 so results are reproducible and comparable to a
DuckDB oracle (``list_cosine_similarity``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds: ray.data.Dataset, queries: np.ndarray,
                     query_ids: list, k: int = 10,
                     emb_col: str = "embedding",
                     id_col: str = "vec_id",
                     round_to: int = 6) -> ray.data.Dataset:
    """Exact cosine top-k for each query row. Ties broken by ascending
    vec_id (deterministic). Returns (query_id, vec_id, sim)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qn, list(query_ids)))

    def local_topk(t: pa.Table) -> pa.Table:
        q, qids = ray.get(q_ref)
        m = _normalize(_stack(t[emb_col]))
        sims = m @ q.T  # (n, Q)
        ids = np.asarray(t[id_col].to_pylist())
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            s = np.round(sims[:, qi], round_to)
            # top-k with deterministic tie-break: sort by (-sim, vec_id)
            order = np.lexsort((ids, -s))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "vec_id": pa.array(out_v),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=8192)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"],
                          ascending=[False, True]).head(k)
        return g

    return local.groupby("query_id").map_groups(
        global_topk, batch_format="pandas")


def hyperplane_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket ids (uint64) for rows of m."""
    bits = (m @ planes.T) > 0  # (n, P)
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1,
                                                           dtype=np.uint64)


def lsh_topk(ds: ray.data.Dataset, queries: np.ndarray, query_ids: list,
             k: int = 10, emb_col: str = "embedding", id_col: str = "vec_id",
             num_planes: int = 8, num_tables: int = 4,
             dim: int | None = None, seed: int = 99,
             round_to: int = 6) -> ray.data.Dataset:
    """Approximate top-k: score only vectors sharing a hyperplane bucket
    with the query in at least one of ``num_tables`` tables. Recall is
    approximate by construction (documented); raise num_tables or lower
    num_planes to trade cost for recall."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    d = dim or qn.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, d))
    q_sigs = np.stack([hyperplane_signatures(qn, planes[t])
                       for t in range(num_tables)], axis=1)  # (Q, T)
    q_ref = ray.put((qn, list(query_ids), planes, q_sigs))

    def local(t: pa.Table) -> pa.Table:
        q, qids, pl, qs = ray.get(q_ref)
        m = _normalize(_stack(t[emb_col]))
        ids = np.asarray(t[id_col].to_pylist())
        sigs = np.stack([hyperplane_signatures(m, pl[tb])
                         for tb in range(pl.shape[0])], axis=1)  # (n, T)
        out_q, out_v, out_s = [], [], []
        for qi in range(q.shape[0]):
            cand = (sigs == qs[qi][None, :]).any(axis=1)
            if not cand.any():
                continue
            sims = np.round(m[cand] @ q[qi], round_to)
            cids = ids[cand]
            kk = min(k, len(cids))
            order = np.lexsort((cids, -sims))[:kk]
            out_q.extend([qids[qi]] * kk)
            out_v.extend(cids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "vec_id": pa.array(out_v),
                         "sim": pa.array(out_s, pa.float64())})

    local_ds = ds.map_batches(local, batch_format="pyarrow", batch_size=8192)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "vec_id"],
                             ascending=[False, True]).head(k)

    return local_ds.groupby("query_id").map_groups(
        global_topk, batch_format="pandas")


def embedding_near_dup(ds: ray.data.Dataset, threshold: float = 0.95,
                       emb_col: str = "embedding", id_col: str = "vec_id",
                       num_planes: int = 10, seed: int = 7,
                       round_to: int = 6) -> ray.data.Dataset:
    """Pairs (a, b, sim) with cosine >= threshold, via one hyperplane
    bucketing + in-bucket exact scoring. High-threshold near-dups almost
    always share a bucket; for guaranteed recall run with num_planes=0
    (single bucket = exact quadratic, small inputs only)."""
    first = ds.take(1)
    d = len(first[0][emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((max(num_planes, 0), d))

    def bucketize(t: pa.Table) -> pa.Table:
        m = _normalize(_stack(t[emb_col]))
        if planes.shape[0]:
            sig = hyperplane_signatures(m, planes)
        else:
            sig = np.zeros(len(m), dtype=np.uint64)
        # 63-bit int64 shuffle key (uint64 > 2^63-1 breaks Ray's
        # block-boundary Arrow conversion; relevant at num_planes >= 63)
        sig = (sig & np.uint64((1 << 63) - 1)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(sig),
            "vec_id": pa.array([str(i) for i in t[id_col].to_pylist()]),
            "emb": pa.array(m.tolist(),
                            pa.list_(pa.float64())),
        })

    buck = ds.map_batches(bucketize, batch_format="pyarrow")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(e) for e in g["emb"]])
        ids = np.asarray(g["vec_id"])
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        sims = np.round(m @ m.T, round_to)
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({"a": ids[ii], "b": ids[jj],
                             "sim": sims[ii, jj]})

    pairs = buck.groupby("bucket").map_groups(emit, batch_format="pandas")
    dedup = pairs.groupby(["a", "b"]).max("sim")
    return dedup.map_batches(
        lambda t: t.rename_columns(["a", "b", "sim"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------- IVF ANN

def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 5) -> np.ndarray:
    """Small numpy k-means for IVF coarse centroids (driver-side, on a
    sample). Deterministic: seeded init, fixed iteration count."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    cents = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray, query_ids: list,
             k: int = 10, emb_col: str = "embedding", id_col: str = "vec_id",
             num_cells: int = 16, nprobe: int = 4,
             sample_size: int = 2048, seed: int = 5,
             round_to: int = 6) -> ray.data.Dataset:
    """IVF (inverted-file) approximate top-k — the other scale path next to
    ``lsh_topk``: coarse k-means cells built once from a driver-side sample
    and broadcast; each block scores a query only against its vectors in
    the query's ``nprobe`` nearest cells. Recall < 1 by construction."""
    sample_rows = ds.limit(sample_size).take_all()
    sample = _normalize(np.asarray(
        [r[emb_col] for r in sample_rows], dtype=np.float64))
    cents = _kmeans(sample, num_cells, seed=seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    state_ref = ray.put((qn, list(query_ids), cents, q_cells))

    def local(t: pa.Table) -> pa.Table:
        q, qids, c, qc = ray.get(state_ref)
        m = _normalize(_stack(t[emb_col]))
        ids = np.asarray(t[id_col].to_pylist())
        cell = (m @ c.T).argmax(axis=1)  # nearest centroid per vector
        out_q, out_v, out_s = [], [], []
        for qi in range(q.shape[0]):
            cand = np.isin(cell, qc[qi])
            if not cand.any():
                continue
            sims = np.round(m[cand] @ q[qi], round_to)
            cids = ids[cand]
            kk = min(k, len(cids))
            order = np.lexsort((cids, -sims))[:kk]
            out_q.extend([qids[qi]] * kk)
            out_v.extend(cids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "vec_id": pa.array(out_v),
                         "sim": pa.array(out_s, pa.float64())})

    local_ds = ds.map_batches(local, batch_format="pyarrow",
                              batch_size=8192)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "vec_id"],
                             ascending=[False, True]).head(k)

    return local_ds.groupby("query_id").map_groups(
        global_topk, batch_format="pandas")
