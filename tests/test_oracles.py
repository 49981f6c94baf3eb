"""Fast oracle-parity spot checks at sf0.001 (the full sweep lives in
scripts/check_oracles.py; the driver runs its own gate at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", [
    "q1_lineitem_agg", "doc_token_count", "dedup_exact_docs",
    "synth_clique_edges", "synth_kpartite_edges", "top_orders",
    "compat_edge_list_edges", "events_last_order",
    "events_followers_1h", "events_prev_gap", "docs_sample_by_lang",
    "docs_above_median_quality", "docs_editdist_pairs", "lang_id_pred",
    "lineitem_harmonic", "revenue_cube", "qty_price_corr_by_flag",
    "custs_both_big_and_urgent", "approx_distinct_users_by_type",
    "price_quantiles_by_priority_approx",
    # round-5 additions
    "corpus_top_terms_rescan", "embedding_kmeans_q8",
    "embedding_semantic_dup_pairs_q8", "docs_cap_per_source",
    "events_dedup_keyed", "lineitem_labelprop", "doc_pair_containment",
    "orders_price_zscore", "docs_hashed_features",
    # (kg_* oracles are sf0.01-pinned goldens — swept there, not here)
])
def test_query_matches_oracle(name, con):
    import __ray_entry__ as E

    got = canon(_to_pandas(E.queries()[name](SF)))
    want = canon(con.execute(E.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hll_oracle_matches_in_raw_estimator_branch(tmp_path):
    """The sf tables keep every group in HLL's linear-counting regime
    (<= 2.5m distinct); this pins the RAW Flajolet-estimate branch
    (> 10240 distinct at p=12) against the SQL register replay on a
    crafted table — both branches of the estimator are now
    oracle-covered."""
    import ray

    from kgeng.ops.agg import hll_count_distinct
    from kgeng.queries import hll_oracle_sql

    rng = np.random.default_rng(41)
    df = pd.DataFrame({
        # 'big' -> ~39k distinct (raw branch), 'small' -> 200 (linear)
        "k": ["big"] * 60000 + ["small"] * 3000,
        "v": np.concatenate([
            rng.integers(0, 1 << 40, 60000),
            rng.integers(0, 200, 3000)]).astype(np.int64),
    })
    pq_path = tmp_path / "t.parquet"
    df.to_parquet(pq_path)

    got = canon(hll_count_distinct(
        ray.data.from_pandas(df).repartition(5), "k", "v",
        out="n_approx").to_pandas())
    sql = hll_oracle_sql(table=f"read_parquet('{pq_path}')", key="k",
                         value="v", out="n_approx", p=12)
    want = canon(duckdb.connect().execute(sql).fetchdf())
    # sanity: the big group really exercises the raw branch
    assert int(got.loc[got["k"] == "big", "n_approx"].iloc[0]) > 10240
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
