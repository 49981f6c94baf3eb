"""Golden-parity pins for rows-only driver queries (verdict r02 'Next'
#6): the driver only checks ROW COUNTS for queries without a SQL oracle,
so silent value drift would be invisible. Each pin is either a seeded
snapshot hash over the deterministic sf0.001 tables or a cross-check
against an exact twin.

If a pin fails after an INTENTIONAL semantic change, re-generate with:
    python tests/test_rows_only_pins.py        # prints current hashes
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        df.to_csv(index=False).encode()).hexdigest()[:16]


def _run(name: str) -> pd.DataFrame:
    import os
    import sys

    import pyarrow as pa
    import ray.data

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as E

    res = E.queries()[name](SF)
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


# Pinned snapshot hashes at sf0.001 (seeded inputs, deterministic
# kernels). A mismatch means the VALUES changed, not just the count.
PINS = {
    # doc_fingerprints gained a DuckDB oracle in round 5 (the token
    # hash became SQL-expressible); the pin stays as local defense.
    "doc_fingerprints": "380da954b0e936db",
    # simhash gained a DuckDB oracle in round 5 (crc32 token hash ->
    # the SQL-expressible charwise polynomial + xorshift* mix).
    "simhash_docs": "cbb29e689d5ebd5f",
    "lang_id_pred": "1ded3a4dfe803e38",
    "kg_mention_stats": "20f1e8e46729725b",
    "media_frame_samples": "6d4e240461cd4761",
    "media_features": "9b3c66b6609a91af",
    "kg_media_features": "478c173304cacd3e",
    "docs_weighted_sample": "7fb6aa41239899e6",
    "approx_distinct_users_by_type": "4b4e721d29182f10",
    "lineitem_hits": "c40d74d5ca52641d",
    "lineitem_closeness": "12a4f7c450bc7b04",
    "lineitem_slpa": "4d748d1577aa5ab0",
    "parts_k_core": "54b70945fcb9c6c0",
    "corpus_top_terms_approx": "51888b431c2e6148",
    "docs_fuzzy_decontamination": "c5e1155ba224afd1",
    "embedding_kmeans": "2ad87b8ccf93c706",
    "embedding_semantic_dup_pairs": "a206bec00539ae29",
    "docs_duplicated_spans": "15f19f56f2747127",
    "docs_curation_pipeline": "fa5885f9b6fa2707",
}


@pytest.mark.parametrize("name", sorted(PINS))
def test_rows_only_snapshot(name):
    assert _value_hash(_run(name)) == PINS[name]


def test_minhash_dedup_docs_snapshot():
    """Clustering output pinned (LSH is probabilistic only across seed /
    permutation-table changes, both of which are fixed)."""
    assert _value_hash(_run("minhash_dedup_docs")) == "7af0c14f6498ddb5"


def test_approx_quantiles_close_to_exact():
    """price_quantiles_by_priority_approx must track the exact twin
    within the histogram's bucket-width error bound."""
    exact = _run("price_quantiles_by_priority")
    approx = _run("price_quantiles_by_priority_approx")
    e = {(r["o_orderpriority"], r["q"]): r["quantile_value"]
         for _i, r in exact.iterrows()}
    a = {(r["o_orderpriority"], r["q"]): r["quantile_value"]
         for _i, r in approx.iterrows()}
    assert set(e) == set(a)
    import duckdb

    df = duckdb.sql(
        f"select o_orderpriority k, o_totalprice v from "
        f"'{SF}/orders.parquet'").df()
    # error bound = histogram bucket width (sketch resolution) + the
    # local gap between adjacent order statistics (the sketch estimates
    # a rank value; quantile_cont interpolates BETWEEN ranks — at
    # sf0.001's ~300 rows/group the inter-sample gap dominates)
    for (k, q), exact_v in e.items():
        vals = np.sort(df[df.k == k].v.to_numpy())
        width = (vals[-1] - vals[0]) / 4096
        i = int(np.clip(round(q * (len(vals) - 1)), 1, len(vals) - 2))
        local_gap = vals[i + 1] - vals[i - 1]
        assert abs(exact_v - a[(k, q)]) <= 2 * width + local_gap, \
            (k, q, exact_v, a[(k, q)])


def test_ann_lsh_and_ivf_agree_with_exact_on_top1():
    """The approximate ANN variants must mostly agree with brute-force
    on the nearest neighbor (recall pins beyond the unit recall tests)."""
    exact = _run("ann_topk").sort_values(["query_id", "sim"],
                                         ascending=[True, False])
    e1 = {r["query_id"]: r["vec_id"]
          for _i, r in exact.groupby("query_id").head(1).iterrows()}
    for variant in ("ann_topk_lsh", "ann_topk_ivf"):
        got = _run(variant).sort_values(["query_id", "sim"],
                                        ascending=[True, False])
        g1 = {r["query_id"]: r["vec_id"]
              for _i, r in got.groupby("query_id").head(1).iterrows()}
        hits = sum(1 for q in e1 if g1.get(q) == e1[q])
        assert hits / len(e1) >= 0.6, (variant, hits, len(e1))


if __name__ == "__main__":
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    for name in sorted(PINS) + ["minhash_dedup_docs"]:
        print(f'    "{name}": "{_value_hash(_run(name))}",')
    ray.shutdown()
