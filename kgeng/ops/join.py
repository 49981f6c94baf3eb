"""Joins beyond broadcast: the explicit hash-partitioned join for
large x large inputs.

Pattern (Ray Data has no always-available Dataset.join across versions):
add ``bucket = hash(key) % B`` to both sides, tag each side, union,
``groupby(bucket)`` (ONE shuffle moves both sides), and merge the two
sides pairwise inside each bucket with a C-level pandas merge.

Skew handling: with ``salt > 1`` each LEFT row is assigned a sub-bucket
(row-position mod salt — any deterministic spread works, the join result
is assignment-invariant) and the RIGHT side is replicated into every
sub-bucket, so a hot key's probe rows split across ``salt`` groups
instead of landing in one. ``max_bucket_rows`` derives the salt from the
left row count (one extra counting pass over the left lineage).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def broadcast_join(left: ray.data.Dataset, right_table: pa.Table,
                   key: str, how: str = "left",
                   fill: dict | None = None) -> ray.data.Dataset:
    """Small-side join without any shuffle: ``right_table`` (a driver-side
    Arrow table; must fit in worker memory) ships ONCE via ``ray.put``
    and every batch resolves its keys with vectorized ``pc.index_in`` +
    ``take``. ``how``: 'left' keeps unmatched left rows (their right
    columns null, or ``fill[col]`` when provided); 'inner' drops them.
    The right side's key values must be unique (lookup semantics)."""
    import pyarrow.compute as pc
    import ray as _ray

    rcols = [c for c in right_table.column_names if c != key]
    ref = _ray.put((right_table[key].combine_chunks(),
                    {c: right_table[c].combine_chunks() for c in rcols}))

    def join(t: pa.Table) -> pa.Table:
        keys_arr, cols = _ray.get(ref)
        idx = pc.index_in(t[key], value_set=keys_arr)
        if how == "inner":
            mask = pc.is_valid(idx)
            t = t.filter(mask)
            idx = idx.filter(mask)
        for c in rcols:
            v = pc.take(cols[c], idx)
            if fill and c in fill:
                v = pc.fill_null(v, fill[c])
            t = t.append_column(c, v)
        return t

    return left.map_batches(join, batch_format="pyarrow")


def _bucket_ids(t: pa.Table, key: str, B: int) -> np.ndarray:
    """Deterministic bucket id per row (exposed for tests).

    Integer keys: one splitmix-style multiply+shift over the numpy view.
    Everything else: cast to Arrow string (vectorized), then ONE
    ``pd.util.hash_array`` pass (C-level siphash, process-deterministic —
    the same kernel dedup.exact_dedup trusts). No per-row Python on
    either path. Equal key values always land in the same bucket; the
    in-bucket pandas merge compares real values, so correctness needs
    only that co-location."""
    col = t[key]
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False)
        h = (vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        b = (h >> np.uint64(33)) % np.uint64(B)
    else:
        import pyarrow.compute as pc

        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        if not (pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        col = pc.fill_null(col, "\x00__kgeng_null__")
        s = col.to_numpy(zero_copy_only=False)     # object ndarray of str
        b = pd.util.hash_array(s) % np.uint64(B)
    return b.astype(np.int64)


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
              num_buckets: int = 32, how: str = "inner",
              suffix: str = "_r", salt: int = 1,
              max_bucket_rows: int | None = None,
              left_cols: list[str] | None = None,
              right_cols: list[str] | None = None,
              left_types: dict | None = None,
              right_types: dict | None = None) -> ray.data.Dataset:
    """Hash-partitioned equi-join of two Datasets on ``key``.

    Column collisions on the right side get ``suffix``. ``how`` is any
    pandas merge mode whose semantics survive per-bucket decomposition
    ('inner', 'left', 'outer' — FULL OUTER; every key pair co-locates
    in exactly one bucket, so unmatched rows of BOTH sides surface
    exactly once), plus 'semi' (left rows WITH a key match; left
    columns only, no duplication) and 'anti' (left rows WITHOUT a
    match — the NOT EXISTS pattern). 'outer' rejects ``salt`` > 1
    (right-side replication would duplicate right-only rows); under
    'outer' unmatched rows null the OTHER side's columns, so int
    columns of both sides surface as float64. ``salt`` > 1 splits each
    bucket's left rows into
    sub-buckets and replicates the (small) right side into each — use
    when the left side has hot keys. ``max_bucket_rows`` computes the
    salt as ceil(left_count / max_bucket_rows) (counts the left side
    first), guaranteeing no merge group holds more than ~max_bucket_rows
    left rows even if every row shares one key.

    ``left_types``/``right_types`` (col -> 'int64'|'float64') skip the
    dtype-stabilizing schema fetch — on a LAZY input, ``.schema()``
    EXECUTES the plan up to a limit (a full run for any plan containing
    a sort/aggregate barrier), so iterative callers that join every
    round must pass them (with ``left_cols``/``right_cols``, which skip
    the name fetch the same way) or pay each join's cost twice.
    """
    if max_bucket_rows is not None:
        n_left = left.count()
        salt = max(salt, math.ceil(max(n_left, 1) / max_bucket_rows))
    salt = max(1, salt)
    if how == "outer" and salt > 1:
        raise ValueError("how='outer' requires salt=1: sub-bucket "
                         "replication would emit right-only rows once "
                         "per sub-bucket")
    # schema(fetch_if_missing=True) executes one block for lazy plans;
    # it can still be None when a post-groupby dataset carries
    # zero-column empty partitions — pass left_cols/right_cols then
    lcols = left_cols or [c for c in
                          left.schema(fetch_if_missing=True).names]
    rcols = right_cols or [c for c in
                           right.schema(fetch_if_missing=True).names]

    def tag_left(t: pa.Table) -> pa.Table:
        b = _bucket_ids(t, key, num_buckets)
        if salt > 1:
            b = b * salt + (np.arange(len(t), dtype=np.int64) % salt)
        t = t.append_column("__bucket", pa.array(b.astype(np.int32)))
        return t.append_column("__side", pa.array(["l"] * len(t)))

    def tag_right(t: pa.Table) -> pa.Table:
        b = _bucket_ids(t, key, num_buckets)
        t = t.append_column("__side", pa.array(["r"] * len(t)))
        if salt == 1:
            return t.append_column("__bucket",
                                   pa.array(b.astype(np.int32)))
        reps = []
        for s in range(salt):
            reps.append(t.append_column(
                "__bucket", pa.array((b * salt + s).astype(np.int32))))
        return pa.concat_tables(reps)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    # stable output column set: a bucket whose group holds only one
    # side must still emit the FULL schema (reindex fills the absent
    # side's columns), or downstream consumers see diverging blocks
    out_cols = lcols + [(c + suffix if c in lcols else c)
                        for c in rcols if c != key]

    # stable dtypes too (same fix as asof_join/range_join): the union
    # pads each side's missing columns with nulls, floating integer
    # columns NON-UNIFORMLY across reduce batches. Restore each side's
    # true numeric dtypes before merging; right int columns surface as
    # float64 in the OUTPUT (NaN = unmatched under how='left'), the
    # nullable-int convention, so every block agrees.
    def _numeric_dtypes(ds: ray.data.Dataset) -> dict:
        s = ds.schema(fetch_if_missing=True)
        if s is None:
            return {}
        base = getattr(s, "base_schema", None)
        out = {}
        if isinstance(base, pa.Schema):
            for f in base:
                if pa.types.is_integer(f.type):
                    out[f.name] = "int64"
                elif pa.types.is_floating(f.type):
                    out[f.name] = "float64"
        else:  # PandasBlockSchema: names + numpy dtypes
            for name, typ in zip(s.names, getattr(base, "types", [])):
                kind = getattr(typ, "kind", "")
                if kind in "iu":
                    out[name] = "int64"
                elif kind == "f":
                    out[name] = "float64"
        return out

    # intersect with the projected column lists: a lazy plan's
    # base_schema can report PRE-projection columns, and reindex would
    # then manufacture an all-NaN column that astype(int64) rejects
    ltypes = dict(left_types) if left_types is not None else \
        {c: t for c, t in _numeric_dtypes(left).items() if c in lcols}
    rtypes = dict(right_types) if right_types is not None else \
        {c: t for c, t in _numeric_dtypes(right).items() if c in rcols}
    int_right = [c for c, t in rtypes.items()
                 if t == "int64" and c != key]
    # full outer: unmatched right rows null the LEFT side too, so left
    # ints also surface float64 (uniform nullable-int convention)
    int_left = ([c for c, t in ltypes.items()
                 if t == "int64" and c != key] if how == "outer" else [])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].reindex(columns=lcols).astype(ltypes)
        rg = g[g["__side"] == "r"].reindex(columns=rcols).astype(rtypes)
        if how == "semi":
            return lg[lg[key].isin(rg[key].unique())]
        if how == "anti":
            return lg[~lg[key].isin(rg[key].unique())]
        out = lg.merge(rg, on=key, how=how, suffixes=("", suffix))
        out = out.reindex(columns=out_cols)
        for c in int_right:
            cc = c + suffix if c in lcols else c
            out[cc] = out[cc].astype("float64")
        for c in int_left:
            out[c] = out[c].astype("float64")
        return out

    return both.groupby("__bucket").map_groups(merge, batch_format="pandas")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              left_key: str, right_key: str,
              left_ts: str, right_ts: str,
              tiebreak: str | None = None,
              num_buckets: int = 32,
              direction: str = "backward") -> ray.data.Dataset:
    """Distributed as-of join — for each left row, the single right row
    of the same key with the greatest ``right_ts`` at or before
    ``left_ts`` (``direction='backward'``; 'forward' mirrors it). Ray
    Data has no native as-of join; this composes one from the same
    primitives as :func:`hash_join`: hash-bucket BOTH sides by join key
    (one shuffle co-locates every key's full history with its probes),
    then one C-level ``pandas.merge_asof`` per bucket. Rows never leave
    their key's bucket, so the per-bucket decomposition is exact.

    Right-side timestamp ties are broken deterministically: the right
    side is sorted by ``(right_ts, tiebreak)`` and ``merge_asof`` takes
    the last sorted occurrence, i.e. the highest ``tiebreak`` value.

    Partitioning assumption (100 TB note): a bucket holds
    ~n_rows/num_buckets of both sides and is merged in one pandas pass —
    size ``num_buckets`` so a bucket fits a worker's heap. Unmatched
    left rows keep null right columns (left-join semantics)."""
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision across sides: {overlap}")

    def tag(which: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            b = _bucket_ids(t, key, num_buckets)
            t = t.append_column("__bucket", pa.array(b.astype(np.int32)))
            return t.append_column("__side",
                                   pa.array([which] * len(t)))
        return fn

    both = (left.map_batches(tag("l", left_key), batch_format="pyarrow")
            .union(right.map_batches(tag("r", right_key),
                                     batch_format="pyarrow")))
    # original integer dtypes: the union pads each side's missing columns
    # with nulls, which floats integer columns NON-UNIFORMLY across reduce
    # batches (a batch holding only one side keeps its ints). Restore each
    # side's true dtypes from its Arrow schema before merging so the
    # by/on keys always agree, and so output dtypes are deterministic.
    def _dtypes(schema: "pa.Schema") -> dict:
        out = {}
        for f in schema:
            if pa.types.is_integer(f.type):
                out[f.name] = "int64"
            elif pa.types.is_floating(f.type):
                out[f.name] = "float64"
        return out

    ltypes = _dtypes(left.schema().base_schema)
    rtypes = _dtypes(right.schema().base_schema)
    int_right = [c for c, t in rtypes.items() if t == "int64"]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # reindex: a reduce batch holding only one side's rows lacks the
        # other side's columns entirely; reindex adds them (empty frame)
        lg = g[g["__side"] == "l"].reindex(columns=lcols).astype(ltypes)
        rg = g[g["__side"] == "r"].reindex(columns=rcols).astype(rtypes)
        # normalize both ON keys to one temporal dtype: the sides may
        # differ at the source (date32 vs timestamp[us]) and a one-sided
        # reindex leaves float64 NaN
        lg[left_ts] = pd.to_datetime(lg[left_ts]).astype("datetime64[us]")
        rg[right_ts] = pd.to_datetime(rg[right_ts]).astype("datetime64[us]")
        lg = lg.sort_values(left_ts, kind="mergesort")
        rg = rg.sort_values([right_ts, tiebreak] if tiebreak
                            else [right_ts], kind="mergesort")
        out = pd.merge_asof(lg, rg, left_on=left_ts, right_on=right_ts,
                            left_by=left_key, right_by=right_key,
                            direction=direction)
        # unmatched left rows null the right side; right int columns
        # surface as float64 (NaN for no-match) so every output block has
        # the same schema regardless of that batch's match pattern —
        # the same convention SQL clients use for nullable ints
        for c in int_right:
            out[c] = out[c].astype("float64")
        return out

    return both.groupby("__bucket").map_groups(merge,
                                               batch_format="pandas")


def range_join(left: ray.data.Dataset, right: ray.data.Dataset,
               left_key: str, right_key: str,
               left_ts: str, right_lo: str, right_hi: str,
               num_buckets: int = 32,
               hi_inclusive: bool = False) -> ray.data.Dataset:
    """Distributed range (interval) join — every (left, right) pair of
    the same key where ``right_lo <= left_ts < right_hi`` (``<=`` when
    ``hi_inclusive``). Ray Data has no native interval join; like
    :func:`hash_join` / :func:`asof_join`, both sides hash-bucket by
    join key (one shuffle), then each bucket runs one vectorized pass:
    right intervals sort by ``right_lo`` and two ``np.searchsorted``
    calls bound each left row's candidate window, so the scan is
    O((n+m) log m + matches) per bucket, not an n x m product.

    Inner-join semantics: left rows matching no interval are dropped;
    a row matching k intervals emits k output rows.

    Per bucket the plan is one C-level equi-merge on the key (producing
    each key's probe x interval candidates) followed by one vectorized
    range filter — no per-row or per-key Python.

    Partitioning assumption (100 TB note): one key's probes + intervals
    must fit a worker (same contract as hash_join's unsalted path), and
    the candidate set is the PER-KEY PRODUCT before filtering — fine
    when intervals per key are bounded (the common case: a customer's
    orders, a device's sessions); a key with millions of both sides
    needs a coarser pre-filter (e.g. bucket time into the key) first."""
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision across sides: {overlap}")

    import pyarrow.compute as pc

    def tag(which: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            b = _bucket_ids(t, key, num_buckets)
            t = t.append_column("__bucket", pa.array(b.astype(np.int32)))
            return t.append_column(
                "__side", pc.take(pa.array([which], pa.string()),
                                  pa.array(np.zeros(len(t), np.int32))))
        return fn

    both = (left.map_batches(tag("l", left_key), batch_format="pyarrow")
            .union(right.map_batches(tag("r", right_key),
                                     batch_format="pyarrow")))

    def _dtypes(schema) -> dict:
        out = {}
        for f in schema:
            if pa.types.is_integer(f.type):
                out[f.name] = "int64"
            elif pa.types.is_floating(f.type):
                out[f.name] = "float64"
        return out

    ltypes = _dtypes(left.schema().base_schema)
    rtypes = _dtypes(right.schema().base_schema)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].reindex(columns=lcols).astype(ltypes)
        rg = g[g["__side"] == "r"].reindex(columns=rcols).astype(rtypes)
        out_cols = lcols + rcols
        for frame, c in ((lg, left_ts), (rg, right_lo), (rg, right_hi)):
            frame[c] = pd.to_datetime(frame[c]).astype("datetime64[us]")
        out = lg.merge(rg, left_on=left_key, right_on=right_key,
                       how="inner")
        keep = (out[right_lo] <= out[left_ts]) & (
            (out[left_ts] <= out[right_hi]) if hi_inclusive
            else (out[left_ts] < out[right_hi]))
        return out[keep][out_cols]

    return both.groupby("__bucket").map_groups(merge,
                                               batch_format="pandas")


# ---------------------------------------------------------------- bloom

def build_bloom(ds: ray.data.Dataset, key: str, num_bits: int = 1 << 20,
                k: int = 4) -> bytes:
    """Build a Bloom filter over an integer key column: each batch
    emits its own bitmap (one num_bits/8-byte blob per block), the
    driver ORs them — a bounded, associative reduce. num_bits must be a
    power of two. With m=2^20, k=4 the filter holds ~100k keys at <1%
    false positives in 128 KB — the broadcast-cheap summary of a join's
    build side.

    Double hashing (Kirsch-Mitzenmacher): the k probe positions are
    h1 + i*h2 from one splitmix64 pass, all vectorized."""
    from kgeng.ops.agg import _splitmix64

    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of 2"
    mask = np.uint64(num_bits - 1)

    def partial(t: pa.Table) -> pa.Table:
        v = t[key].to_numpy(zero_copy_only=False)
        h = _splitmix64(v.astype(np.uint64))
        h1 = h & mask
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd => full cycle
        bm = np.zeros(num_bits >> 3, np.uint8)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1),
                                           (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"__bm": pa.array([bm.tobytes()], pa.binary())})

    blobs = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = np.zeros(num_bits >> 3, np.uint8)
    for row in blobs:
        out |= np.frombuffer(row["__bm"], np.uint8)
    return out.tobytes()


def bloom_prefilter(ds: ray.data.Dataset, key: str, bloom: bytes,
                    num_bits: int = 1 << 20,
                    k: int = 4) -> ray.data.Dataset:
    """Drop rows whose ``key`` is definitely absent from the filter
    (no false negatives; false positives pass through, so compose with
    an exact join AFTER). The bitmap ships once via ``ray.put`` and
    each task reads it zero-copy from the local object store — at
    cluster scale this replaces shuffling every non-matching probe row
    with broadcasting ~128 KB."""
    import ray

    from kgeng.ops.agg import _splitmix64

    mask = np.uint64(num_bits - 1)
    ref = ray.put(np.frombuffer(bloom, np.uint8))

    def keep(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        v = t[key].to_numpy(zero_copy_only=False)
        h = _splitmix64(v.astype(np.uint64))
        h1 = h & mask
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        ok = np.ones(len(v), bool)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) & mask
            bits = bm[(pos >> np.uint64(3)).astype(np.int64)]
            ok &= (bits >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return t.filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow")


def fuzzy_lookup(probes: ray.data.Dataset, catalog: ray.data.Dataset,
                 col: str, probe_id: str, max_dist: int = 3,
                 out_match: str = "match", out_dist: str = "dist",
                 max_catalog: int = 2_000_000) -> ray.data.Dataset:
    """Fuzzy LOOKUP join: for each probe string, the closest catalog
    string by exact byte-level Levenshtein distance, restricted to
    ``max_dist`` (no match within the cap -> no output row) — the
    dirty-dimension matching step (misspelled names against a clean
    catalog). Deterministic tiebreak: (distance, catalog value asc).

    The catalog is the SMALL side by nature: it broadcasts once as a
    byte matrix sorted by (length, value) (loud ``max_catalog`` guard).
    Each probe batch selects candidates by the lossless length band
    (|len diff| <= max_dist — a longer gap cannot beat the cap) via two
    searchsorted calls, then scores all (probe, candidate) pairs in ONE
    banded-Ukkonen vectorized DP (dedup.banded_levenshtein). No
    shuffle; the probe stream passes once."""
    import pandas as pd
    import pyarrow.compute as pc

    from kgeng.ops.dedup import _byte_matrix, banded_levenshtein

    cat_rows = catalog.select_columns([col]).take_all()
    if len(cat_rows) > max_catalog:
        raise ValueError(
            f"catalog {len(cat_rows)} exceeds max_catalog "
            f"{max_catalog}; fuzzy_lookup broadcasts the catalog")
    names = sorted({r[col] for r in cat_rows if r[col] is not None})
    cmat, clens = _byte_matrix(names)
    order = np.lexsort((np.array(names, object), clens))
    cmat, clens = cmat[order], clens[order]
    cnames = np.array(names, object)[order]
    ref = ray.put((cmat, clens, cnames))

    def lookup(t: pa.Table) -> pa.Table:
        cm, cl, cn = ray.get(ref)
        # null probes produce no output row (SQL: levenshtein(NULL, x)
        # IS NULL -> filtered), mirroring the catalog-side null guard —
        # without this, a null probe would byte-encode as '' and
        # "match" any catalog value of length <= max_dist.
        if t[col].null_count:
            t = t.filter(pc.is_valid(t[col]))
        texts = t[col].to_pylist()
        ids = t[probe_id].to_numpy(zero_copy_only=False)
        pm, pl = _byte_matrix(texts)
        # candidate ranges per probe via the sorted-length band
        lo = np.searchsorted(cl, pl - max_dist, side="left")
        hi = np.searchsorted(cl, pl + max_dist, side="right")
        cnt = (hi - lo).astype(np.int64)
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({probe_id: pa.array([], t[probe_id].type),
                             col: pa.array([], pa.string()),
                             out_match: pa.array([], pa.string()),
                             out_dist: pa.array([], pa.int64())})
        pi = np.repeat(np.arange(len(texts)), cnt)
        ci = np.repeat(lo, cnt) + (np.arange(tot)
                                   - np.repeat(np.cumsum(cnt) - cnt,
                                               cnt))
        w = max(pm.shape[1], cm.shape[1])
        left = np.zeros((tot, w), np.uint8)
        left[:, :pm.shape[1]] = pm[pi]
        right = np.zeros((tot, w), np.uint8)
        right[:, :cm.shape[1]] = cm[ci]
        dist = banded_levenshtein(left, right, pl[pi], cl[ci],
                                  max_dist)
        okm = dist <= max_dist
        if not okm.any():
            return pa.table({probe_id: pa.array([], t[probe_id].type),
                             col: pa.array([], pa.string()),
                             out_match: pa.array([], pa.string()),
                             out_dist: pa.array([], pa.int64())})
        df = pd.DataFrame({"p": pi[okm], "d": dist[okm],
                           "m": cn[ci[okm]]})
        best = df.sort_values(["p", "d", "m"]).groupby("p",
                                                       sort=False).head(1)
        sel = best["p"].to_numpy()
        return pa.table({
            probe_id: pa.array(ids[sel]),
            col: pa.array([texts[i] for i in sel], pa.string()),
            out_match: pa.array(best["m"].to_numpy(), pa.string()),
            out_dist: pa.array(best["d"].to_numpy(np.int64))})

    return probes.map_batches(lookup, batch_format="pyarrow")
