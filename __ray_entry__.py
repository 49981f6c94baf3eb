"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline; ``queries()`` maps
every implemented operator/pipeline (SURVEY.md §2 + the training-data ops)
to a callable over an sf dir; ``oracle_sql()`` provides DuckDB-checkable
SQL for each SQL-expressible entry (KG/compat entries check against
independently-constructed golden parquet: the corpus generator's
by-construction truth and the pure-Python reference-semantics oracle in
tests/oracle.py — both written before the Ray result is computed).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kgeng import queries as Q  # noqa: E402
from kgeng.synth.corpus import corpus_dir_for  # noqa: E402


def _sql_vec(v) -> str:
    """A DOUBLE[] literal with shortest-round-trip reprs: DuckDB parses
    each decimal back to the bit-identical float64."""
    return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


def _lsh_oracle_sql(num_planes: int = 4, num_tables: int = 16,
                    dim: int = 64, seed: int = 99, k: int = 5,
                    n_queries: int = 4) -> str:
    """Independent SQL recomputation of ``lsh_topk``'s ann_topk_lsh
    entry: the seeded hyperplanes are embedded as literals (they depend
    only on the seed, never the data); signatures, bucket-candidate
    pruning, and in-candidate cosine top-k are all recomputed in SQL.
    Sign bits use RAW dot products — normalization is a positive
    per-row scale, so sign(normalized . plane) == sign(raw . plane)."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal(
        (num_tables, num_planes, dim))
    rows = ",\n              ".join(
        f"({tb}, {p}, {_sql_vec(planes[tb, p])})"
        for tb in range(num_tables) for p in range(num_planes))
    return f"""
        WITH planes(tb, p, vec) AS (VALUES
              {rows}),
        sig AS (
          SELECT e.vec_id, pl.tb,
                 sum(CASE WHEN list_dot_product(
                         CAST(e.embedding AS DOUBLE[]), pl.vec) > 0
                     THEN (1::BIGINT << pl.p) ELSE 0 END) AS s
          FROM embeddings e CROSS JOIN planes pl
          GROUP BY e.vec_id, pl.tb),
        q AS (SELECT vec_id AS query_id
              FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
        cand AS (
          SELECT DISTINCT qs.vec_id AS query_id, s.vec_id
          FROM sig qs
          JOIN q ON q.query_id = qs.vec_id
          JOIN sig s ON s.tb = qs.tb AND s.s = qs.s)
        SELECT c.query_id, c.vec_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(qe.embedding AS DOUBLE[])), 6) AS sim
        FROM cand c
        JOIN embeddings e ON e.vec_id = c.vec_id
        JOIN embeddings qe ON qe.vec_id = c.query_id
        QUALIFY row_number() OVER (
          PARTITION BY c.query_id
          ORDER BY round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(qe.embedding AS DOUBLE[])), 6) DESC,
                   c.vec_id) <= {k}
    """


def _ivf_oracle_sql(nprobe: int = 6, k: int = 5,
                    n_queries: int = 4) -> str:
    """Independent SQL recomputation of the explicit-codebook
    ``ann_topk_ivf`` entry: the codebook (seeded, data-independent —
    kgeng.queries.ann_ivf_codebook) is embedded as literals; cell
    assignment (argmax dot, tie -> lowest cell), nprobe probe-set
    ranking, and in-cell cosine top-k are recomputed in SQL. Raw dots
    rank identically to the kernel's normalized dots (positive per-row
    scale)."""
    cents = Q.ann_ivf_codebook()
    rows = ",\n              ".join(
        f"({ci}, {_sql_vec(cents[ci])})" for ci in range(len(cents)))
    return f"""
        WITH cents(ci, vec) AS (VALUES
              {rows}),
        cell AS (
          SELECT vec_id, ci FROM (
            SELECT e.vec_id, c.ci,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_dot_product(
                        CAST(e.embedding AS DOUBLE[]), c.vec) DESC,
                        c.ci) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1),
        q AS (SELECT vec_id AS query_id
              FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
        qcell AS (
          SELECT query_id, ci FROM (
            SELECT q.query_id, c.ci,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY list_dot_product(
                        CAST(qe.embedding AS DOUBLE[]), c.vec) DESC,
                        c.ci) AS rn
            FROM q JOIN embeddings qe ON qe.vec_id = q.query_id
                   CROSS JOIN cents c)
          WHERE rn <= {nprobe})
        SELECT qc.query_id, cl.vec_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(qe.embedding AS DOUBLE[])), 6) AS sim
        FROM qcell qc
        JOIN cell cl ON cl.ci = qc.ci
        JOIN embeddings e ON e.vec_id = cl.vec_id
        JOIN embeddings qe ON qe.vec_id = qc.query_id
        QUALIFY row_number() OVER (
          PARTITION BY qc.query_id
          ORDER BY round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(qe.embedding AS DOUBLE[])), 6) DESC,
                   cl.vec_id) <= {k}
    """


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize the
    interleaved corpus, run extract -> link -> block -> canonicalize ->
    triples, return the triples Dataset."""
    res = Q._kg_results("/root/testdata/sf0.001")
    return res["triples"]


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver's correctness gate checks the FIRST 50
    # entries. Round-5 rotation (VERDICT r4 items 1+2): the 46 entries
    # never driver-verified that HAVE oracles lead (incl. every query
    # added this round: q8 kmeans family, sketch-rescan heavy hitters,
    # per-source caps, keyed windowed dedup, label propagation,
    # incremental KG append), then 4 oracle UPGRADES the verdict named
    # (minhash_dedup_docs, doc_fingerprints, docs_weighted_sample,
    # docs_packed_2k — previously recorded no_oracle, now hash-gated).
    # Below the window: the remaining upgrades (slpa, ann lsh/ivf,
    # simhash — locally hash-verified by scripts/check_oracles.py),
    # the flagship KG block (driver-green r03+r04), the still-rows-only
    # float twins, and everything driver-green in earlier rounds.
    return {
        "qty_price_corr_by_flag": Q.qty_price_corr_by_flag,
        "custs_both_big_and_urgent": Q.custs_both_big_and_urgent,
        "doc_pair_jw": Q.doc_pair_jw,
        "price_stats_by_priority": Q.price_stats_by_priority,
        "parts_triangle_counts": Q.parts_triangle_counts,
        "corpus_top_terms_rescan": Q.corpus_top_terms_rescan,
        "events_profile": Q.events_profile,
        "docs_split_assign": Q.docs_split_assign,
        "embedding_centroid_by_label": Q.embedding_centroid_by_label,
        "price_quantiles_disc_by_priority": Q.price_quantiles_disc_by_priority,
        "docs_lm_scores": Q.docs_lm_scores,
        "parts_k_core": Q.parts_k_core,
        "events_value_locf": Q.events_value_locf,
        "user_event_entropy": Q.user_event_entropy,
        "corpus_pmi_collocations": Q.corpus_pmi_collocations,
        "events_ohlc_hourly": Q.events_ohlc_hourly,
        "orders_price_winsorized": Q.orders_price_winsorized,
        "embeddings_q8": Q.embeddings_q8,
        "events_running_total": Q.events_running_total,
        "orders_price_rank_dense": Q.orders_price_rank_dense,
        "orders_price_pct_rank": Q.orders_price_pct_rank,
        "docs_fuzzy_decontamination": Q.docs_fuzzy_decontamination,
        "docs_cap_per_source": Q.docs_cap_per_source,
        "events_dedup_keyed": Q.events_dedup_keyed,
        "embedding_kmeans_q8": Q.embedding_kmeans_q8,
        "embedding_semantic_dup_pairs_q8": Q.embedding_semantic_dup_pairs_q8,
        "docs_duplicated_spans": Q.docs_duplicated_spans,
        "parts_frequent_pairs": Q.parts_frequent_pairs,
        "events_props_k_counts": Q.events_props_k_counts,
        "docs_nfc_normalized": Q.docs_nfc_normalized,
        "events_sliding_window": Q.events_sliding_window,
        "docs_curation_pipeline": Q.docs_curation_pipeline,
        "price_mad_by_priority": Q.price_mad_by_priority,
        "parts_fuzzy_match": Q.parts_fuzzy_match,
        "corpus_cms_term_counts": Q.corpus_cms_term_counts,
        "lineitem_closeness_exact": Q.lineitem_closeness_exact,
        "docs_bm25": Q.docs_bm25,
        "docs_gopher_quality": Q.docs_gopher_quality,
        "docs_lm2_scores": Q.docs_lm2_scores,
        "docs_chunks": Q.docs_chunks,
        "lineitem_random_walks": Q.lineitem_random_walks,
        "docs_incremental_dedup": Q.docs_incremental_dedup,
        "parts_snm_pairs": Q.parts_snm_pairs,
        "docs_gopher_repetition": Q.docs_gopher_repetition,
        "kg_incremental_entities": Q.kg_incremental_entities,
        "lineitem_labelprop": Q.lineitem_labelprop,
        "minhash_dedup_docs": Q.minhash_dedup_docs,
        "doc_pair_containment": Q.doc_pair_containment,
        "docs_hashed_features": Q.docs_hashed_features,
        "parts_edge_support": Q.parts_edge_support,
        "orders_price_zscore": Q.orders_price_zscore,
        "docs_weighted_sample": Q.docs_weighted_sample,
        "docs_packed_2k": Q.docs_packed_2k,
        "doc_fingerprints": Q.doc_fingerprints,
        "lineitem_slpa": Q.lineitem_slpa,
        "ann_topk_lsh": Q.ann_topk_lsh,
        "ann_topk_ivf": Q.ann_topk_ivf,
        "simhash_docs": Q.simhash_docs,
        "approx_distinct_users_by_type": Q.approx_distinct_users_by_type,
        "price_quantiles_by_priority_approx": Q.price_quantiles_by_priority_approx,
        "kg_triples": Q.kg_triples,
        "kg_entities": Q.kg_entities,
        "kg_vertices_out": Q.kg_vertices_out,
        "kg_edges_out": Q.kg_edges_out,
        "kg_entity_mention_counts": Q.kg_entity_mention_counts,
        "corpus_top_terms_approx": Q.corpus_top_terms_approx,
        "embedding_kmeans": Q.embedding_kmeans,
        "embedding_semantic_dup_pairs": Q.embedding_semantic_dup_pairs,
        "lineitem_scc": Q.lineitem_scc,
        "price_quantiles_by_priority": Q.price_quantiles_by_priority,
        "lineitem_sssp": Q.lineitem_sssp,
        "lineitem_sssp_weighted": Q.lineitem_sssp_weighted,
        "dedup_exact_docs": Q.dedup_exact_docs,
        "q1_lineitem_agg": Q.q1_lineitem_agg,
        "lineitem_closeness": Q.lineitem_closeness,
        "lineitem_pagerank": Q.lineitem_pagerank,
        "lineitem_hits": Q.lineitem_hits,
        "kg_mention_stats": Q.kg_mention_stats,
        "kg_media_features": Q.kg_media_features,
        "compat_edge_list_edges": Q.compat_edge_list_edges,
        "compat_edge_list_vertices": Q.compat_edge_list_vertices,
        "compat_graphalytics_vertices": Q.compat_graphalytics_vertices,
        "compat_graphalytics_edges": Q.compat_graphalytics_edges,
        "synth_clique_edges": Q.synth_clique_edges,
        "synth_kpartite_edges": Q.synth_kpartite_edges,
        "synth_clique_vertices_smart": Q.synth_clique_vertices_smart,
        "embedding_near_dup_pairs": Q.embedding_near_dup_pairs,
        "embedding_components": Q.embedding_components,
        "ann_topk": Q.ann_topk,
        "media_features": Q.media_features,
        "media_frame_samples": Q.media_frame_samples,
        "doc_pair_jaccard": Q.doc_pair_jaccard,
        "cust_big_order_counts": Q.cust_big_order_counts,
        "events_last_order": Q.events_last_order,
        "events_followers_1h": Q.events_followers_1h,
        "revenue_by_nation": Q.revenue_by_nation,
        "revenue_by_orderpriority": Q.revenue_by_orderpriority,
        "urgent_order_revenue": Q.urgent_order_revenue,
        "custs_without_big_orders": Q.custs_without_big_orders,
        "user_event_paths": Q.user_event_paths,
        "cust_order_profile_outer": Q.cust_order_profile_outer,
        "docs_length_ntile": Q.docs_length_ntile,
        "top_event_per_user": Q.top_event_per_user,
        "events_type_long": Q.events_type_long,
        "docs_boilerplate_removed": Q.docs_boilerplate_removed,
        "docs_tfidf_terms": Q.docs_tfidf_terms,
        "docs_repetition_ratio": Q.docs_repetition_ratio,
        "lineitem_linerank": Q.lineitem_linerank,
        "lineitem_harmonic": Q.lineitem_harmonic,
        "revenue_rollup": Q.revenue_rollup,
        "revenue_cube": Q.revenue_cube,
        "corpus_top_terms": Q.corpus_top_terms,
        "docs_editdist_pairs": Q.docs_editdist_pairs,
        "lang_id_pred": Q.lang_id_pred,
        "orders_by_custseg": Q.orders_by_custseg,
        "events_tumbling_window": Q.events_tumbling_window,
        "top_orders": Q.top_orders,
        "distinct_event_types": Q.distinct_event_types,
        "events_prev_gap": Q.events_prev_gap,
        "docs_sample_by_lang": Q.docs_sample_by_lang,
        "docs_hash_sample": Q.docs_hash_sample,
        "docs_mix_by_lang": Q.docs_mix_by_lang,
        "events_hourly_active_users": Q.events_hourly_active_users,
        "parts_never_bulk_ordered": Q.parts_never_bulk_ordered,
        "corpus_term_stats": Q.corpus_term_stats,
        "corpus_bigram_counts": Q.corpus_bigram_counts,
        "docs_normalized": Q.docs_normalized,
        "docs_benchmark_contamination": Q.docs_benchmark_contamination,
        "docs_pii_redacted": Q.docs_pii_redacted,
        "events_rolling_sum": Q.events_rolling_sum,
        "events_type_pivot": Q.events_type_pivot,
        "distinct_users_by_type": Q.distinct_users_by_type,
        "sessionize_events": Q.sessionize_events,
        "top2_orders_per_cust": Q.top2_orders_per_cust,
        "doc_token_count": Q.doc_token_count,
        "doc_token_count_bpe": Q.doc_token_count_bpe,
        "doc_quality": Q.doc_quality,
        "doc_stats_by_lang": Q.doc_stats_by_lang,
        "docs_above_median_quality": Q.docs_above_median_quality,
        "doc_length_histogram": Q.doc_length_histogram,
    }


def _kmeans_q8_ctes(k: int, iters: int) -> str:
    """WITH-clause body replaying kgeng.ops.similarity.kmeans_q8_assign
    exactly: q8 quantization (the embeddings_q8 oracle's expression),
    lowest-id seeds, then ``iters`` unrolled integer Lloyd's rounds —
    assignment by row_number over (d2, cl), centroid update by the
    round-half-away integer formula, emptied clusters keeping their
    previous centroid via the LEFT JOIN coalesce. All-int64, so the
    replay is bit-exact. The caller appends one final assignment CTE
    against c{iters}."""
    parts = [f"""
        x AS (
          SELECT vec_id,
                 unnest(range(array_length(embedding))) AS dim,
                 CAST(round(CAST(unnest(embedding) AS DOUBLE)
                            * 1000000) AS BIGINT) AS q
          FROM embeddings),
        nrm AS (SELECT vec_id,
                       sqrt(CAST(sum(q * q) AS DOUBLE)) / 1000000.0
                           AS nrm
                FROM x GROUP BY vec_id),
        v AS (SELECT x.vec_id, x.dim,
                     CAST(round(127 * ((CAST(q AS DOUBLE) / 1000000.0)
                                       / nrm)) AS BIGINT) AS q8
              FROM x JOIN nrm USING (vec_id) WHERE nrm > 0),
        seeds AS (SELECT vec_id,
                         CAST(row_number() OVER (ORDER BY vec_id) - 1
                              AS BIGINT) AS cl
                  FROM (SELECT DISTINCT vec_id FROM v
                        ORDER BY vec_id LIMIT {k})),
        c0 AS (SELECT s.cl, v.dim, v.q8 AS c
               FROM v JOIN seeds s USING (vec_id))"""]
    for i in range(1, iters + 1):
        parts.append(f"""
        d{i} AS (SELECT v.vec_id, c.cl,
                        sum((v.q8 - c.c) * (v.q8 - c.c)) AS d2
                 FROM v JOIN c{i - 1} c USING (dim) GROUP BY 1, 2),
        a{i} AS (SELECT vec_id, cl FROM (
                   SELECT vec_id, cl,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d2, cl) AS rn
                   FROM d{i}) WHERE rn = 1),
        s{i} AS (SELECT a.cl, v.dim, sum(v.q8) AS s, count(*) AS n
                 FROM v JOIN a{i} a USING (vec_id) GROUP BY 1, 2),
        c{i} AS (SELECT p.cl, p.dim,
                        coalesce(CASE WHEN s.s >= 0
                                      THEN (2 * s.s + s.n) // (2 * s.n)
                                      ELSE -((2 * (-s.s) + s.n)
                                             // (2 * s.n)) END,
                                 p.c) AS c
                 FROM c{i - 1} p LEFT JOIN s{i} s
                   ON p.cl = s.cl AND p.dim = s.dim)""")
    parts.append(f"""
        df AS (SELECT v.vec_id, c.cl,
                      sum((v.q8 - c.c) * (v.q8 - c.c)) AS d2
               FROM v JOIN c{iters} c USING (dim) GROUP BY 1, 2),
        af AS (SELECT vec_id, cl FROM (
                 SELECT vec_id, cl,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY d2, cl) AS rn
                 FROM df) WHERE rn = 1)""")
    return ",".join(parts)


def oracle_sql() -> dict[str, str]:
    fx = Q.ensure_compat_goldens()
    # the driver's correctness pass runs at sf0.01 -> 1500-doc corpus;
    # generate it here too (serial, pure-python, no Ray needed) so the
    # golden parquet exists even if the oracle runs before the Ray query
    from kgeng.synth.corpus import ensure_corpus

    ensure_corpus(Q.KG_N_DOCS["sf0.01"])
    corpus = corpus_dir_for(Q.KG_N_DOCS["sf0.01"])
    gt = os.path.join(corpus, "golden_triples.parquet")
    ge = os.path.join(corpus, "golden_entities.parquet")
    return {
        "q1_lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       / 100.0 AS sum_base_price,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                            AS BIGINT)) / 100.0 AS sum_revenue,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_custseg": """
            SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
                   count(*) AS n_orders,
                   sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                       / 100.0 AS sum_price
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "events_tumbling_window": """
            SELECT event_type,
                   epoch_us(ts) // 3600000000 AS window_start_hour,
                   count(*) AS n_events,
                   sum(CAST(round(value * 10000) AS BIGINT))
                       / 10000.0 AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "revenue_by_orderpriority": """
            SELECT o.o_orderpriority, count(*) AS n_items,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT)) / 100.0 AS sum_revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "revenue_by_nation": """
            SELECT n.n_name, count(*) AS n_items,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT)) / 100.0 AS sum_revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "urgent_order_revenue": """
            SELECT o.o_orderpriority, count(*) AS n_items,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT)) / 100.0 AS sum_revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
            GROUP BY 1
        """,
        "events_last_order": """
            -- o_orderkey cast to DOUBLE: the as-of join surfaces
            -- nullable right-side ints as float64 (NaN = no prior
            -- order), the convention SQL clients use for nullable ints
            SELECT e.event_id, e.user_id, e.ts,
                   CAST(o.o_orderkey AS DOUBLE) AS o_orderkey,
                   o.o_totalprice
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            QUALIFY row_number() OVER (
                PARTITION BY e.event_id
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
        """,
        "events_followers_1h": """
            SELECT a.event_id AS a_event_id, count(*) AS n_follow
            FROM events a JOIN events b
              ON b.user_id = a.user_id
             AND b.ts >= a.ts
             AND b.ts <  a.ts + INTERVAL 1 HOUR
            GROUP BY 1
        """,
        "docs_sample_by_lang": """
            -- Knuth multiplicative hash, exact in BIGINT: the Ray
            -- sampler's arithmetic verbatim
            SELECT doc_id, lang, n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY (doc_id * 2654435761) % 4294967296,
                                doc_id) AS BIGINT) AS rank
            FROM documents
            QUALIFY rank <= 50
        """,
        "docs_hash_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE (doc_id * 2654435761) % 4294967296
                  < CAST(0.1 * 4294967296 AS BIGINT)
        """,
        "docs_weighted_sample": """
            -- Efraimidis-Spirakis A-ES keys, the sampler's arithmetic
            -- verbatim: u = (knuth_hash(id)+0.5)/2^32, key = u^(1/w);
            -- both sides call the host libm pow on identical doubles
            WITH keyed AS (
              SELECT doc_id, lang, n_chars,
                     pow(((doc_id * 2654435761) % 4294967296 + 0.5)
                         / 4294967296.0,
                         1.0 / n_chars) AS skey
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0
            )
            SELECT doc_id, lang, n_chars FROM keyed
            ORDER BY skey DESC, doc_id LIMIT 25
        """,
        "minhash_dedup_docs": """
            -- independent reconstruction: EXACT word-trigram Jaccard
            -- over ALL pairs (no LSH), then min-string-labeled
            -- connected components — matches the engine iff the banded
            -- LSH candidate set covers every >= 0.5 pair on this corpus
            -- (it does: verified at sf0.001/sf0.01; detection p >= 0.87
            -- per pair at J = 0.5 and the corpus' true dups sit far
            -- above the threshold). Short docs (< 3 tokens) shingle to
            -- their joined-token string, matching word_ngrams.
            WITH RECURSIVE toks AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
              FROM documents
            ), grams AS (
              SELECT doc_id,
                     CASE WHEN len(tk) < 3
                          THEN [array_to_string(tk, ' ')]
                          ELSE [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                for i in range(1, len(tk) - 1)]
                     END AS gs
              FROM toks
            ), dg AS (
              SELECT DISTINCT doc_id, unnest(gs) AS g FROM grams
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM dg GROUP BY 1
            ), inter AS (
              SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
              FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), dup_pairs AS (
              SELECT CAST(ida AS VARCHAR) AS a, CAST(idb AS VARCHAR) AS b
              FROM inter JOIN sizes sa ON sa.doc_id = ida
                         JOIN sizes sb ON sb.doc_id = idb
              WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
            ), edges AS (
              SELECT a AS node, b AS nbr FROM dup_pairs
              UNION ALL
              SELECT b AS node, a AS nbr FROM dup_pairs
            ), walk(node, label) AS (
              SELECT DISTINCT node, node FROM edges
              UNION
              SELECT e.node, w.label
              FROM edges e JOIN walk w ON w.node = e.nbr
            ), comp AS (
              SELECT node, min(label) AS label FROM walk GROUP BY node
            )
            SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
                   coalesce(c.label, CAST(d.doc_id AS VARCHAR))
                       AS cluster_rep
            FROM documents d
            LEFT JOIN comp c ON c.node = CAST(d.doc_id AS VARCHAR)
        """,
        # incremental dedup: same independent exact-Jaccard + min-label
        # reconstruction as minhash_dedup_docs, with the incremental
        # semantics applied identically — old x old pairs (both even
        # doc_ids) excluded from the edge set, output restricted to the
        # new (odd) side
        "docs_incremental_dedup": """
            WITH RECURSIVE toks AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
              FROM documents
            ), grams AS (
              SELECT doc_id,
                     CASE WHEN len(tk) < 3
                          THEN [array_to_string(tk, ' ')]
                          ELSE [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                for i in range(1, len(tk) - 1)]
                     END AS gs
              FROM toks
            ), dg AS (
              SELECT DISTINCT doc_id, unnest(gs) AS g FROM grams
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM dg GROUP BY 1
            ), inter AS (
              SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
              FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), dup_pairs AS (
              SELECT CAST(ida AS VARCHAR) AS a, CAST(idb AS VARCHAR) AS b
              FROM inter JOIN sizes sa ON sa.doc_id = ida
                         JOIN sizes sb ON sb.doc_id = idb
              WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
                AND NOT (ida % 2 = 0 AND idb % 2 = 0)
            ), edges AS (
              SELECT a AS node, b AS nbr FROM dup_pairs
              UNION ALL
              SELECT b AS node, a AS nbr FROM dup_pairs
            ), walk(node, label) AS (
              -- labels carry the (is_new, id) ordering: old docs (even
              -- ids) prefix '0:', new '1:', so min(label) is the
              -- old-preferred representative the engine picks
              SELECT DISTINCT node,
                     CASE WHEN CAST(node AS BIGINT) % 2 = 0
                          THEN '0:' ELSE '1:' END || node
              FROM edges
              UNION
              SELECT e.node, w.label
              FROM edges e JOIN walk w ON w.node = e.nbr
            ), comp AS (
              SELECT node, substr(min(label), 3) AS label
              FROM walk GROUP BY node
            )
            SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
                   coalesce(c.label, CAST(d.doc_id AS VARCHAR))
                       AS cluster_rep
            FROM documents d
            LEFT JOIN comp c ON c.node = CAST(d.doc_id AS VARCHAR)
            WHERE d.doc_id % 2 = 1
        """,
        "lineitem_random_walks": Q.random_walks_oracle_sql(
            walk_len=4, wpn=2),
        "docs_gopher_repetition": Q.gopher_repetition_oracle_sql(),
        "lineitem_pagerank": Q.pagerank_oracle_sql(iters=5),
        "lineitem_labelprop": Q.labelprop_oracle_sql(rounds=4),
        "lineitem_sssp": Q.SSSP_ORACLE,
        "lineitem_sssp_weighted": Q.sssp_weighted_oracle_sql(rounds=6),
        "lineitem_hits": Q.hits_oracle_sql(iters=3),
        "lang_id_pred": Q.lang_id_oracle_sql(),
        "doc_fingerprints": Q.fingerprint_oracle_sql(k=4, window=8),
        "simhash_docs": Q.simhash_oracle_sql(),
        "docs_packed_2k": Q.packed_oracle_sql(budget=2048,
                                              num_buckets=64),
        "lineitem_slpa": Q.slpa_oracle_sql(rounds=10, threshold=0.2),
        "approx_distinct_users_by_type": Q.hll_oracle_sql(
            table="events", key="event_type", value="user_id",
            out="n_users_approx", p=12),
        "corpus_cms_term_counts": Q.cms_oracle_sql(width=2048,
                                                   depth=4, k=20),
        # sorted-neighborhood: the window over (p_name, p_partkey)
        # order stated as row_number + a rank-band self-join; sim
        # thresholded UNROUNDED on both sides, rounded only for output
        "parts_snm_pairs": """
            WITH ranked AS (
              SELECT p_partkey, p_name,
                     row_number() OVER (
                       ORDER BY p_name, p_partkey) AS r
              FROM part)
            SELECT a.p_partkey AS p_a, b.p_partkey AS p_b,
                   round(jaro_winkler_similarity(a.p_name, b.p_name),
                         6) AS sim
            FROM ranked a JOIN ranked b
              ON b.r > a.r AND b.r <= a.r + 4
            WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9
        """,
        "price_quantiles_by_priority_approx": Q.hist_quantiles_oracle_sql(
            table="orders", key="o_orderpriority", value="o_totalprice",
            quantiles=(0.5, 0.9), num_bins=4096, round_to=6),
        "parts_k_core": Q.kcore_oracle_sql(k=60),
        "docs_fuzzy_decontamination": Q.fuzzy_decon_oracle_sql(
            threshold=0.5),
        "docs_curation_pipeline": Q.curation_oracle_sql(),
        "lineitem_harmonic": Q.harmonic_oracle_sql(max_hops=6),
        "lineitem_closeness_exact": Q.closeness_oracle_sql(max_hops=6),
        "lineitem_linerank": Q.linerank_oracle_sql(iters=3),
        "corpus_top_terms": """
            WITH tokens AS (
              SELECT unnest(regexp_extract_all(text, '\\S+')) AS term
              FROM documents)
            SELECT term, count(*) AS tf FROM tokens
            GROUP BY 1 ORDER BY tf DESC, term LIMIT 20
        """,
        # the rescan path is certified-exact, so its oracle IS the
        # exact top-k (same SQL as corpus_top_terms)
        "corpus_top_terms_rescan": """
            WITH tokens AS (
              SELECT unnest(regexp_extract_all(text, '\\S+')) AS term
              FROM documents)
            SELECT term, count(*) AS tf FROM tokens
            GROUP BY 1 ORDER BY tf DESC, term LIMIT 20
        """,
        "revenue_cube": """
            SELECT coalesce(o.o_orderpriority, 'ALL') AS prio,
                   coalesce(l.l_returnflag, 'ALL') AS flag,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT)) / 100.0
                       AS sum_revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY CUBE(o.o_orderpriority, l.l_returnflag)
        """,
        "revenue_rollup": """
            SELECT coalesce(o.o_orderpriority, 'ALL') AS prio,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT)) / 100.0
                       AS sum_revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY ROLLUP(o.o_orderpriority)
        """,
        "lineitem_scc": """
            WITH RECURSIVE base AS (
              SELECT CASE WHEN l_quantity <= 25 THEN l_orderkey * 2
                          ELSE l_partkey * 2 + 1 END AS src,
                     CASE WHEN l_quantity <= 25 THEN l_partkey * 2 + 1
                          ELSE l_orderkey * 2 END AS dst
              FROM lineitem WHERE l_orderkey < 800),
            edges AS (SELECT DISTINCT src, dst FROM base),
            -- explicit DISTINCT: inside WITH RECURSIVE, a bare UNION
            -- CTE was observed to emit duplicate rows (duckdb 1.x)
            nodes AS (SELECT DISTINCT node FROM (
                        SELECT src AS node FROM edges
                        UNION ALL SELECT dst FROM edges)),
            reach(a, b) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
            mutual AS (
              SELECT r1.b AS node, min(r1.a) AS m
              FROM reach r1 JOIN reach r2
                ON r2.a = r1.b AND r2.b = r1.a
              GROUP BY 1)
            SELECT n.node,
                   CAST(least(n.node, coalesce(mv.m, n.node)) AS BIGINT)
                       AS scc_id
            FROM nodes n LEFT JOIN mutual mv ON mv.node = n.node
        """,
        "cust_order_profile_outer": """
            -- counts cast to DOUBLE: the full-outer join surfaces both
            -- sides' nullable ints as float64 (NaN = absent side)
            SELECT coalesce(b.o_custkey, u.o_custkey) AS c_custkey,
                   CAST(b.n_big AS DOUBLE) AS n_big,
                   CAST(u.n_urgent AS DOUBLE) AS n_urgent
            FROM (SELECT o_custkey, count(*) AS n_big FROM orders
                  WHERE o_totalprice > 400000 GROUP BY 1) b
            FULL OUTER JOIN
                 (SELECT o_custkey, count(*) AS n_urgent FROM orders
                  WHERE o_orderpriority = '1-URGENT' GROUP BY 1) u
            ON b.o_custkey = u.o_custkey
        """,
        "docs_length_ntile": """
            WITH nn AS (SELECT count(*) AS n FROM documents)
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
                   CAST((row_number() OVER (ORDER BY n_chars, doc_id)
                         - 1) * 4 // (SELECT n FROM nn) + 1 AS BIGINT)
                       AS tile
            FROM documents
        """,
        "top_event_per_user": """
            SELECT user_id, event_type AS top_event, n FROM (
              SELECT user_id, event_type, count(*) AS n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY count(*) DESC,
                                                 event_type) AS rn
              FROM events GROUP BY 1, 2) WHERE rn = 1
        """,
        "events_type_long": """
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "docs_repetition_ratio": """
            WITH wtail AS (
              SELECT doc_id,
                     text || repeat(' buy now buy now buy now',
                                    CAST(doc_id % 3 AS INTEGER)) AS text
              FROM documents),
            toks AS (SELECT doc_id,
                            regexp_extract_all(text, '\\S+') AS tk
                     FROM wtail),
            grams AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(tk) - 2, 0)),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         AS gs
              FROM toks)
            SELECT doc_id,
                   round(CASE WHEN len(gs) > 0
                              THEN 1.0 - CAST(len(list_distinct(gs))
                                              AS DOUBLE) / len(gs)
                              ELSE 0.0 END, 6) AS rep_ratio
            FROM grams
        """,
        "docs_tfidf_terms": """
            WITH tokens AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                         AS term
              FROM documents),
            dfm AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tokens GROUP BY 1
                    HAVING count(DISTINCT doc_id) >= 5),
            nn AS (SELECT count(*) AS n FROM documents),
            tfm AS (SELECT doc_id, term, count(*) AS tf
                    FROM tokens GROUP BY 1, 2)
            SELECT tfm.doc_id, tfm.term, tfm.tf,
                   round(tfm.tf * ln(CAST((SELECT n FROM nn) AS DOUBLE)
                                     / dfm.df), 6) AS tfidf
            FROM tfm JOIN dfm ON dfm.term = tfm.term
        """,
        # BM25: every float input is an exact integer or one IEEE
        # division, constants are e0-typed DOUBLEs mirroring the
        # kernel's evaluation order; the per-doc sum over <= 4 term
        # contributions is rounded to 6 digits (far above FP noise)
        "docs_bm25": """
            WITH tokens AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                         AS term
              FROM documents),
            qs AS (SELECT unnest(['hash', 'join', 'scan', 'window'])
                       AS term),
            nn AS (SELECT count(*) AS n FROM documents),
            tot AS (SELECT count(*) AS n_tok FROM tokens),
            dlm AS (SELECT doc_id, count(*) AS dl
                    FROM tokens GROUP BY 1),
            dfm AS (SELECT q.term,
                           count(DISTINCT t.doc_id) AS df
                    FROM qs q LEFT JOIN tokens t ON t.term = q.term
                    GROUP BY 1),
            tfm AS (SELECT t.doc_id, t.term, count(*) AS tf
                    FROM tokens t JOIN qs q ON q.term = t.term
                    GROUP BY 1, 2),
            scored AS (
              SELECT tfm.doc_id,
                     ln(1e0 + ((SELECT n FROM nn) - dfm.df + 0.5e0)
                              / (dfm.df + 0.5e0))
                       * (tfm.tf * (1.2e0 + 1e0))
                       / (tfm.tf + 1.2e0 *
                          (1e0 - 0.75e0 + 0.75e0 *
                           (CAST(dlm.dl AS DOUBLE)
                            / (CAST((SELECT n_tok FROM tot) AS DOUBLE)
                               / CAST((SELECT n FROM nn) AS DOUBLE)))))
                         AS contrib
              FROM tfm
              JOIN dfm ON dfm.term = tfm.term
              JOIN dlm ON dlm.doc_id = tfm.doc_id)
            SELECT doc_id,
                   count(*) AS n_terms_matched,
                   round(sum(contrib), 6) AS bm25
            FROM scored GROUP BY 1
        """,
        # Gopher rules: both ratios are single IEEE divisions of exact
        # integers, so the flags replay exactly; the LEFT JOIN +
        # greatest() mirror the kernel's zero-token row handling
        "docs_gopher_quality": """
            WITH tokens AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                         AS term
              FROM documents),
            m AS (
              SELECT doc_id,
                     count(*) AS n_words,
                     sum(length(term)) AS tot_len,
                     sum(CASE WHEN regexp_matches(term, '[A-Za-z]')
                              THEN 1 ELSE 0 END) AS n_alpha,
                     sum(CASE WHEN term IN ('the','a','of','to','and',
                                            'that','have','with')
                              THEN 1 ELSE 0 END) AS stop_hits
              FROM tokens GROUP BY 1),
            j AS (
              SELECT d.doc_id,
                     coalesce(m.n_words, 0) AS n_words,
                     CAST(coalesce(m.tot_len, 0) AS DOUBLE)
                       / greatest(coalesce(m.n_words, 0), 1)
                         AS mean_word_len,
                     CAST(coalesce(m.n_alpha, 0) AS DOUBLE)
                       / greatest(coalesce(m.n_words, 0), 1)
                         AS alpha_frac,
                     CAST(coalesce(m.stop_hits, 0) AS BIGINT)
                         AS stop_hits
              FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id)
            SELECT doc_id, n_words,
                   round(mean_word_len, 6) AS mean_word_len,
                   round(alpha_frac, 6) AS alpha_frac,
                   stop_hits,
                   n_words >= 50 AND n_words <= 100000
                       AS ok_word_count,
                   mean_word_len >= 3e0 AND mean_word_len <= 10e0
                       AS ok_mean_word_len,
                   alpha_frac >= 0.8e0 AS ok_alpha_frac,
                   stop_hits >= 2 AS ok_stop_hits,
                   (n_words >= 50 AND n_words <= 100000)
                     AND (mean_word_len >= 3e0
                          AND mean_word_len <= 10e0)
                     AND alpha_frac >= 0.8e0
                     AND stop_hits >= 2 AS keep
            FROM j
        """,
        # bigram LM: same quantize-to-int64 replay as docs_lm_scores,
        # with the conditional denominator c(v)+V joined per context;
        # scoring the training corpus itself means every pair is
        # in-table (the fallback chain never fires, mirroring the
        # kernel)
        "docs_lm2_scores": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
              FROM documents),
            uni AS (
              SELECT term, count(*) AS tf
              FROM (SELECT unnest(regexp_extract_all(text, '\\S+'))
                        AS term FROM documents)
              GROUP BY 1),
            vv AS (SELECT count(*) AS v FROM uni),
            pairs AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(tk) - 1, 0)),
                       i -> tk[i] || ' ' || tk[i+1])) AS bigram
              FROM toks),
            bc AS (SELECT bigram, count(*) AS c_ab
                   FROM pairs GROUP BY 1),
            lp AS (
              SELECT bc.bigram,
                     CAST(round(ln((bc.c_ab + 1.0)
                                   / (u.tf + (SELECT v FROM vv)))
                                * 1000000000) AS BIGINT) AS lpq
              FROM bc JOIN uni u
                ON u.term = split_part(bc.bigram, ' ', 1))
            SELECT p.doc_id, count(*) AS n_bigrams,
                   round(CAST(sum(lp.lpq) AS DOUBLE) / 1000000000.0
                         / count(*), 6) AS avg_logprob2
            FROM pairs p JOIN lp USING (bigram)
            GROUP BY 1
        """,
        # chunking: pure integer arithmetic (stride 24 = 32 - 8) and a
        # 1-based inclusive list slice joined with single spaces —
        # exact replay of the kernel's closed-form chunk layout
        "docs_chunks": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
              FROM documents),
            nn AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
            cc AS (SELECT doc_id, tk, n,
                          CASE WHEN n = 0 THEN 0
                               ELSE 1 + greatest(0,
                                 CAST(ceil((n - 32) / 24.0)
                                      AS BIGINT)) END AS n_chunks
                   FROM nn),
            ee AS (SELECT doc_id, tk, n,
                          unnest(range(n_chunks)) AS chunk_idx
                   FROM cc)
            SELECT doc_id,
                   chunk_idx,
                   chunk_idx * 24 AS start_tok,
                   least(32, n - chunk_idx * 24) AS n_tok,
                   array_to_string(
                     tk[chunk_idx * 24 + 1
                        : chunk_idx * 24 + least(32, n - chunk_idx * 24)],
                     ' ') AS chunk_text
            FROM ee
        """,
        "docs_boilerplate_removed": """
            WITH withbp AS (
              SELECT doc_id,
                     text || chr(10) || 'SUBSCRIBE TO OUR NEWSLETTER'
                          || chr(10) || 'uid ' || CAST(doc_id AS VARCHAR)
                         AS text
              FROM documents),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr
                   FROM withbp),
            lines AS (SELECT doc_id, unnest(arr) AS line,
                             generate_subscripts(arr, 1) AS pos
                      FROM ls),
            freq AS (SELECT line FROM (
                       SELECT line, count(DISTINCT doc_id) AS c
                       FROM lines GROUP BY 1) WHERE c >= 20),
            kept AS (SELECT doc_id, line, pos FROM lines
                     WHERE line NOT IN (SELECT line FROM freq))
            SELECT w.doc_id, coalesce(k.ct, '') AS clean_text
            FROM withbp w LEFT JOIN (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY pos) AS ct
              FROM kept GROUP BY 1) k ON k.doc_id = w.doc_id
        """,
        "docs_pii_redacted": """
            WITH withpii AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or +1 555-000-'
                          || CAST(doc_id AS VARCHAR) AS text
              FROM documents)
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                     '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '[PHONE]', 'g')
                   AS redacted_text
            FROM withpii
        """,
        "docs_benchmark_contamination": """
            WITH docs AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
              FROM documents),
            grams AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(toks) - 7, 0)),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                            toks[i+2] || ' ' || toks[i+3] || ' ' ||
                            toks[i+4] || ' ' || toks[i+5] || ' ' ||
                            toks[i+6] || ' ' || toks[i+7]) AS gs
              FROM docs),
            dg AS (SELECT doc_id, unnest(gs) AS g FROM grams),
            bench AS (SELECT DISTINCT g FROM dg WHERE doc_id < 20)
            SELECT d.doc_id,
                   CAST(coalesce(max(CASE WHEN b.g IS NOT NULL
                                     THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS contaminated
            FROM docs d
            LEFT JOIN dg ON dg.doc_id = d.doc_id
            LEFT JOIN bench b ON b.g = dg.g
            GROUP BY 1
        """,
        "docs_normalized": """
            SELECT doc_id,
                   lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                       AS norm_text
            FROM documents
        """,
        "corpus_bigram_counts": """
            WITH tokens AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
              FROM documents),
            pairs AS (
              SELECT unnest(list_transform(
                       generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || ' ' || toks[i+1])) AS bigram
              FROM tokens)
            SELECT bigram, count(*) AS n FROM pairs
            GROUP BY 1 HAVING count(*) >= 20
        """,
        "corpus_term_stats": """
            WITH tokens AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                         AS term
              FROM documents)
            SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                   count(*) AS tf
            FROM tokens GROUP BY 1
            HAVING count(DISTINCT doc_id) >= 5
        """,
        "parts_never_bulk_ordered": """
            SELECT p_partkey FROM part
            EXCEPT
            SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity > 45
        """,
        "user_event_paths": """
            WITH first8 AS (
              SELECT user_id, event_type, ts, event_id FROM events
              QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) <= 8)
            SELECT user_id,
                   string_agg(event_type, ','
                              ORDER BY ts, event_id) AS path
            FROM first8 GROUP BY 1
        """,
        "events_hourly_active_users": """
            SELECT epoch_us(ts) // 3600000000 AS window_start_hour,
                   CAST(count(DISTINCT user_id) AS BIGINT)
                       AS n_active_users
            FROM events GROUP BY 1
        """,
        "docs_mix_by_lang": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 <
                  CAST((CASE lang WHEN 'en' THEN 0.5
                                  WHEN 'de' THEN 0.25
                                  ELSE 0.05 END) * 4294967296 AS BIGINT)
        """,
        "events_rolling_sum": """
            SELECT event_id, user_id, ts,
                   sum(CAST(round(value * 10000) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                   / 10000.0 AS roll4_value
            FROM events
        """,
        "events_type_pivot": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click')
                       AS n_click,
                   count(*) FILTER (WHERE event_type = 'error')
                       AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase')
                       AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup')
                       AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view')
                       AS n_view
            FROM events GROUP BY 1
        """,
        "cust_big_order_counts": """
            SELECT c.c_custkey, c.c_mktsegment,
                   CAST(coalesce(b.n_big, 0) AS BIGINT) AS n_big
            FROM customer c LEFT JOIN (
              SELECT o_custkey, count(*) AS n_big FROM orders
              WHERE o_totalprice > 400000 GROUP BY 1) b
            ON b.o_custkey = c.c_custkey
        """,
        "distinct_users_by_type": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "events_prev_gap": """
            -- microsecond diff / 1e6: fractional seconds, the same
            -- float64 op pandas total_seconds() performs
            SELECT event_id, user_id, ts,
                   CAST(date_diff('microsecond',
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id),
                        ts) AS DOUBLE) / 1e6 AS gap_sec
            FROM events
        """,
        "sessionize_events": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END
                         AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
              SELECT user_id, ts,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM gaps)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM sess GROUP BY user_id, session_id
        """,
        "top2_orders_per_cust": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER w AS BIGINT) AS rank
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey)
            QUALIFY rank <= 2
        """,
        "price_quantiles_by_priority": """
            SELECT o_orderpriority, 0.5 AS q,
                   round(quantile_cont(o_totalprice, 0.5), 6)
                       AS quantile_value
            FROM orders GROUP BY o_orderpriority
            UNION ALL
            SELECT o_orderpriority, 0.9,
                   round(quantile_cont(o_totalprice, 0.9), 6)
            FROM orders GROUP BY o_orderpriority
        """,
        "qty_price_corr_by_flag": """
            -- corr from exact integer moments: the engine states the
            -- SAME IEEE float tree over the SAME exact int64 sums, so
            -- the match is bit-exact, not approximately-equal
            WITH m AS (
              SELECT l_returnflag,
                     count(*) AS n,
                     sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
                     sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
                     sum(CAST(round(l_quantity) AS BIGINT)
                         * CAST(round(l_quantity) AS BIGINT)) AS sxx,
                     sum(CAST(round(l_extendedprice) AS BIGINT)
                         * CAST(round(l_extendedprice) AS BIGINT)) AS syy,
                     sum(CAST(round(l_quantity) AS BIGINT)
                         * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
              FROM lineitem GROUP BY 1)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                             <= 0 THEN NULL
                        ELSE round(
                          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE)
                                      * CAST(sy AS DOUBLE))), 6)
                   END AS corr
            FROM m
        """,
        "price_stats_by_priority": """
            WITH m AS (
              SELECT o_orderpriority, count(*) AS n,
                     sum(CAST(round(o_totalprice) AS BIGINT)) AS sx,
                     sum(CAST(round(o_totalprice) AS BIGINT)
                         * CAST(round(o_totalprice) AS BIGINT)) AS sxx
              FROM orders GROUP BY 1)
            SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
                   round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
                       AS mean_x,
                   CASE WHEN n < 2 THEN NULL
                        ELSE round(sqrt(
                          (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE)
                             * (CAST(n AS DOUBLE) - 1.0))), 6)
                   END AS stddev_x
            FROM m
        """,
        "docs_hashed_features": Q.hashed_features_oracle_sql(512),
        "orders_price_zscore": """
            WITH m AS (
              SELECT o_orderpriority, count(*) AS n,
                     sum(CAST(round(o_totalprice) AS BIGINT)) AS sx,
                     sum(CAST(round(o_totalprice) AS BIGINT)
                         * CAST(round(o_totalprice) AS BIGINT)) AS sxx
              FROM orders GROUP BY 1),
            s AS (SELECT o_orderpriority,
                         round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE),
                               6) AS mean6,
                         round(sqrt(
                           (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           / (CAST(n AS DOUBLE)
                              * (CAST(n AS DOUBLE) - 1.0))), 6) AS sd6
                  FROM m)
            SELECT o.o_orderkey,
                   round((CAST(round(o.o_totalprice) AS BIGINT) - s.mean6)
                         / s.sd6, 6) AS z
            FROM orders o JOIN s USING (o_orderpriority)
        """,
        "custs_both_big_and_urgent": """
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000
            INTERSECT
            SELECT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        """,
        "custs_without_big_orders": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000)
        """,
        "doc_token_count": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS n_tokens
            FROM documents
        """,
        "doc_token_count_bpe": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "doc_quality": """
            WITH base AS (
              SELECT doc_id,
                     CAST(length(text) AS DOUBLE) AS nc,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS DOUBLE) AS na,
                     CAST(length(text) - length(replace(text, ' ', ''))
                          AS DOUBLE) AS ns,
                     CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)
                          AS nt
              FROM documents)
            SELECT doc_id,
                   CAST(nc AS BIGINT) AS n_chars_q,
                   round(na / greatest(nc, 1), 6) AS alpha_ratio,
                   round(ns / greatest(nc, 1), 6) AS space_ratio,
                   round((nc - ns) / greatest(nt, 1), 6) AS avg_token_len,
                   round((na / greatest(nc, 1)) *
                         least(nt / 20.0, 1.0), 6) AS quality_score
            FROM base
        """,
        "docs_above_median_quality": """
            WITH base AS (
              SELECT doc_id,
                     CAST(length(text) AS DOUBLE) AS nc,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS DOUBLE) AS na,
                     CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)
                          AS nt
              FROM documents),
            scored AS (
              SELECT doc_id,
                     round((na / greatest(nc, 1)) *
                           least(nt / 20.0, 1.0), 6) AS quality_score
              FROM base),
            med AS (
              SELECT round(quantile_cont(quality_score, 0.5), 9) AS m
              FROM scored)
            SELECT s.doc_id, s.quality_score
            FROM scored s, med WHERE s.quality_score >= med.m
        """,
        "doc_stats_by_lang": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6)
                       AS avg_chars
            FROM documents GROUP BY lang
        """,
        "doc_length_histogram": """
            SELECT n_chars // 50 AS bucket, count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "doc_pair_jaccard": """
            WITH docs AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\\s+') AS toks
              FROM documents ORDER BY doc_id LIMIT 20
            ), grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 0)),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                            toks[i+2])) AS gs
              FROM docs
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                         / (len(a.gs) + len(b.gs)
                            - len(list_intersect(a.gs, b.gs))), 6) AS jac
            FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        """,
        "doc_pair_containment": """
            WITH docs AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\\s+') AS toks
              FROM documents ORDER BY doc_id LIMIT 20
            ), grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 0)),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                            toks[i+2])) AS gs
              FROM docs
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(CASE WHEN len(a.gs) = 0 THEN
                           CASE WHEN len(b.gs) = 0 THEN 1.0 ELSE 0.0 END
                         ELSE CAST(len(list_intersect(a.gs, b.gs))
                                   AS DOUBLE) / len(a.gs) END, 6)
                       AS containment
            FROM grams a JOIN grams b ON a.doc_id <> b.doc_id
        """,
        "doc_pair_jw": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              ORDER BY doc_id LIMIT 20)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(jaro_winkler_similarity(coalesce(a.text, ''),
                                                 coalesce(b.text, '')),
                         6) AS jw
            FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        """,
        "dedup_exact_docs": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "docs_editdist_pairs": """
            -- DuckDB levenshtein is byte-based (lev('ü','u') = 2); the
            -- engine matches by running on UTF-8 bytes, and the strlen
            -- (byte-length) prefilter is implied by dist <= 8
            -- coalesce matches the engine's null -> '' convention
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(levenshtein(coalesce(a.text, ''),
                                    coalesce(b.text, '')) AS BIGINT)
                       AS dist
            FROM documents a JOIN documents b
              ON b.doc_id > a.doc_id
             AND abs(strlen(coalesce(a.text, ''))
                     - strlen(coalesce(b.text, ''))) <= 8
            WHERE levenshtein(coalesce(a.text, ''),
                              coalesce(b.text, '')) <= 8
        """,
        "embedding_near_dup_pairs": """
            SELECT CAST(a.vec_id AS VARCHAR) AS a,
                   CAST(b.vec_id AS VARCHAR) AS b,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS sim
            FROM embeddings a JOIN embeddings b
              ON CAST(a.vec_id AS VARCHAR) < CAST(b.vec_id AS VARCHAR)
            WHERE round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
        """,
        "embedding_components": """
            WITH RECURSIVE pairs AS (
              SELECT CAST(a.vec_id AS VARCHAR) AS a,
                     CAST(b.vec_id AS VARCHAR) AS b
              FROM embeddings a JOIN embeddings b
                ON CAST(a.vec_id AS VARCHAR) < CAST(b.vec_id AS VARCHAR)
              WHERE round(list_cosine_similarity(
                        CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
            ), edges AS (
              SELECT a AS node, b AS nbr FROM pairs
              UNION ALL
              SELECT b AS node, a AS nbr FROM pairs
            ), walk(node, label) AS (
              SELECT DISTINCT node, node FROM edges
              UNION
              SELECT e.node, w.label
              FROM edges e JOIN walk w ON w.node = e.nbr
            )
            SELECT node, min(label) AS label FROM walk GROUP BY node
        """,
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding
              FROM embeddings ORDER BY vec_id LIMIT 4)
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])), 6) AS sim
            FROM q CROSS JOIN embeddings e
            QUALIFY row_number() OVER (
              PARTITION BY q.query_id
              ORDER BY round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])), 6) DESC,
                       e.vec_id) <= 5
        """,
        "ann_topk_lsh": _lsh_oracle_sql(),
        "ann_topk_ivf": _ivf_oracle_sql(),
        # compat path: golden written by the pure-Python oracle
        "compat_edge_list_edges": f"""
            SELECT "_from", "_to", weight
            FROM read_parquet('{fx}/edge_list_edges.parquet')
        """,
        "compat_edge_list_vertices": f"""
            SELECT smartProp
            FROM read_parquet('{fx}/edge_list_vertices.parquet')
        """,
        "compat_graphalytics_vertices": f"""
            SELECT smartProp, "_key"
            FROM read_parquet('{fx}/ga_vertices.parquet')
        """,
        "compat_graphalytics_edges": f"""
            SELECT "_from", "_to", weight
            FROM read_parquet('{fx}/ga_edges.parquet')
        """,
        # synthesis: closed-form SQL
        "synth_clique_edges": """
            SELECT 'vertices/' || CAST(i AS VARCHAR) AS "_from",
                   'vertices/' || CAST(j AS VARCHAR) AS "_to"
            FROM range(50) t1(i) JOIN range(50) t2(j) ON j > i
        """,
        "synth_kpartite_edges": """
            WITH v AS (
              SELECT i, CASE WHEN i < 3 THEN 0
                             WHEN i < 7 THEN 1 ELSE 2 END AS part
              FROM range(12) t(i))
            SELECT 'vertices/' || CAST(a.i AS VARCHAR) AS "_from",
                   'vertices/' || CAST(b.i AS VARCHAR) AS "_to"
            FROM v a JOIN v b ON a.part < b.part
        """,
        "synth_clique_vertices_smart": """
            SELECT CAST(i AS VARCHAR) AS smartProp,
                   CAST(i AS VARCHAR) || ':' || CAST(i AS VARCHAR) AS "_key",
                   '0' AS part
            FROM range(20) t(i)
        """,
        # KG stack: golden = by-construction truth from the corpus generator
        "kg_triples": f"""
            SELECT DISTINCT subj, pred, obj FROM read_parquet('{gt}')
        """,
        "kg_entities": f"""
            SELECT entity_id, canon_key,
                   array_to_string(surface_forms, '|') AS surface_forms_str,
                   ent_type, part
            FROM read_parquet('{ge}')
        """,
        # incremental append must reproduce the batch result exactly —
        # its oracle IS the batch golden-entities set
        "kg_incremental_entities": f"""
            SELECT entity_id, canon_key,
                   array_to_string(surface_forms, '|') AS surface_forms_str,
                   ent_type, part
            FROM read_parquet('{ge}')
        """,
        "kg_vertices_out": f"""
            SELECT entity_id, entity_id || ':' || entity_id AS "_key",
                   ent_type AS part
            FROM read_parquet('{ge}')
            UNION ALL
            SELECT DISTINCT obj, obj || ':' || obj, 'MEDIA'
            FROM read_parquet('{gt}') WHERE obj LIKE 'media://%'
        """,
        "kg_edges_out": f"""
            SELECT 'entities/' || subj || ':' || subj AS "_from",
                   'entities/' || obj || ':' || obj AS "_to",
                   pred, doc_id
            FROM read_parquet('{gt}')
        """,
        "kg_entity_mention_counts": f"""
            SELECT subj, count(*) AS n_triples
            FROM read_parquet('{gt}') GROUP BY subj
        """,
        "parts_fuzzy_match": """
            WITH cat AS (SELECT DISTINCT p_name FROM part),
                 probes AS (SELECT p_partkey,
                                   substr(p_name, 1, 1) || substr(p_name, 3)
                                       AS p_name
                            FROM part WHERE p_partkey % 100 = 0),
                 pairs AS (SELECT p.p_partkey, p.p_name,
                                  c.p_name AS match,
                                  levenshtein(p.p_name, c.p_name) AS dist
                           FROM probes p
                           JOIN cat c
                             ON abs(length(p.p_name)
                                    - length(c.p_name)) <= 3
                           WHERE levenshtein(p.p_name, c.p_name) <= 3)
            SELECT p_partkey, p_name, match, dist FROM pairs
            QUALIFY row_number() OVER (PARTITION BY p_partkey
                                       ORDER BY dist, match) = 1
        """,
        "price_mad_by_priority": """
            SELECT o_orderpriority, round(mad(o_totalprice), 6) AS mad
            FROM orders GROUP BY 1
        """,
        "events_sliding_window": """
            WITH x AS (SELECT event_type, epoch_us(ts) AS e
                       FROM events),
                 w AS (SELECT event_type,
                              unnest(generate_series(
                                  (e - 3600000000) // 900000000 + 1,
                                  e // 900000000)) AS "window"
                       FROM x)
            SELECT event_type, "window", count(*) AS n
            FROM w GROUP BY 1, 2
        """,
        "docs_nfc_normalized": """
            SELECT doc_id,
                   nfc_normalize(text || repeat(' cafe' || chr(769),
                                                doc_id % 3))
                       AS nfc_text
            FROM documents
        """,
        "events_props_k_counts": """
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS k,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "docs_duplicated_spans": """
            -- independent reconstruction over span STRINGS (the engine
            -- counts 63-bit rolling hashes; identical up to hash
            -- collisions, expectation ~ windows^2 / 2^63 ~ 1e-9 here)
            WITH docs AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''), '\\S+') AS tk
              FROM documents),
            w AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(tk) - 15, 0)),
                       i -> array_to_string(tk[i:i+15], ' ')) AS spans
              FROM docs),
            flat AS (SELECT doc_id, unnest(spans) AS s FROM w),
            dup AS (SELECT s FROM flat GROUP BY s HAVING count(*) >= 2),
            hits AS (SELECT f.doc_id, count(*) AS nd
                     FROM flat f JOIN dup d ON d.s = f.s GROUP BY 1)
            SELECT w.doc_id,
                   CAST(len(w.spans) AS BIGINT) AS n_spans,
                   CAST(coalesce(h.nd, 0) AS BIGINT) AS n_dup_spans,
                   round(CAST(coalesce(h.nd, 0) AS DOUBLE)
                         / greatest(len(w.spans), 1), 6) AS dup_fraction
            FROM w LEFT JOIN hits h ON h.doc_id = w.doc_id
        """,
        "parts_frequent_pairs": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem)
            SELECT a.p AS part_a, b.p AS part_b, count(*) AS support
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "parts_triangle_counts": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
                 e AS (SELECT DISTINCT a.p AS u, b.p AS v
                       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
                 tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                         FROM e e1
                         JOIN e e2 ON e2.u = e1.v
                         JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
                 n AS (SELECT a AS node FROM tri
                       UNION ALL SELECT b FROM tri
                       UNION ALL SELECT c FROM tri)
            SELECT node, count(*) AS n_triangles FROM n GROUP BY node
        """,
        "parts_edge_support": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
                 e AS (SELECT DISTINCT a.p AS u, b.p AS v
                       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
                 tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                         FROM e e1
                         JOIN e e2 ON e2.u = e1.v
                         JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
                 te AS (SELECT a AS u, b AS v FROM tri
                        UNION ALL SELECT a, c FROM tri
                        UNION ALL SELECT b, c FROM tri)
            SELECT u, v, count(*) AS support FROM te GROUP BY 1, 2
        """,
        "events_running_total": """
            SELECT event_id, ts, user_id,
                   CAST(round(value * 100) AS BIGINT) AS v_cents,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
                        AS BIGINT) AS running_cents
            FROM events
        """,
        "orders_price_pct_rank": """
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   percent_rank() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice)
                       AS pct_rank
            FROM orders
        """,
        "orders_price_rank_dense": """
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   dense_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC) AS rnk
            FROM orders
        """,
        "docs_cap_per_source": """
            SELECT doc_id, source, rank FROM (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rank
              FROM documents) WHERE rank <= 10
        """,
        "events_dedup_keyed": """
            SELECT event_id, user_id, event_type, "window" FROM (
              SELECT event_id, user_id, event_type,
                     epoch_us(ts) // 3600000000 AS "window",
                     row_number() OVER (
                         PARTITION BY user_id, event_type,
                                      epoch_us(ts) // 3600000000
                         ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1
        """,
        "embedding_kmeans_q8": "WITH " + _kmeans_q8_ctes(8, 3) + """
            SELECT vec_id, cl AS cluster FROM af
        """,
        "embedding_semantic_dup_pairs_q8":
            "WITH " + _kmeans_q8_ctes(8, 3) + """,
            p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                  FROM af a JOIN af b
                    ON a.cl = b.cl AND a.vec_id < b.vec_id),
            dots AS (SELECT p.id_a, p.id_b,
                            CAST(sum(va.q8 * vb.q8) AS BIGINT) AS dot
                     FROM p JOIN v va ON va.vec_id = p.id_a
                            JOIN v vb ON vb.vec_id = p.id_b
                                     AND vb.dim = va.dim
                     GROUP BY 1, 2),
            nn AS (SELECT vec_id, sum(q8 * q8) AS n2 FROM v GROUP BY 1)
            SELECT d.id_a, d.id_b, d.dot
            FROM dots d JOIN nn na ON na.vec_id = d.id_a
                        JOIN nn nb ON nb.vec_id = d.id_b
            WHERE d.dot > 0
              AND 25 * d.dot * d.dot >= 4 * na.n2 * nb.n2
        """,
        "embeddings_q8": """
            WITH x AS (
              SELECT vec_id,
                     unnest(range(array_length(embedding))) AS dim,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE)
                                * 1000000) AS BIGINT) AS q
              FROM embeddings),
            n AS (SELECT vec_id,
                         sqrt(CAST(sum(q * q) AS DOUBLE)) / 1000000.0
                             AS nrm
                  FROM x GROUP BY vec_id)
            SELECT x.vec_id, x.dim,
                   CAST(round(127 * ((CAST(q AS DOUBLE) / 1000000.0)
                                     / nrm)) AS BIGINT) AS q8
            FROM x JOIN n USING (vec_id) WHERE nrm > 0
        """,
        "orders_price_winsorized": """
            WITH q AS (SELECT round(quantile_cont(o_totalprice, 0.01), 6)
                           AS lo,
                              round(quantile_cont(o_totalprice, 0.99), 6)
                           AS hi
                       FROM orders)
            SELECT o_orderkey,
                   least(greatest(o_totalprice, lo), hi) AS price_w
            FROM orders, q
        """,
        "events_ohlc_hourly": """
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 3600000000 AS window,
                   first_value(value) OVER w AS open,
                   max(value) OVER w AS high,
                   min(value) OVER w AS low,
                   last_value(value) OVER w AS close,
                   count(*) OVER w AS n_events
            FROM events
            WINDOW w AS (PARTITION BY user_id,
                                      epoch_us(ts) // 3600000000
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        """,
        "corpus_pmi_collocations": """
            WITH tokens AS (
              SELECT regexp_extract_all(text, '\\S+') AS toks
              FROM documents),
            pairs AS (
              SELECT unnest(list_transform(
                       generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || ' ' || toks[i+1])) AS bigram
              FROM tokens),
            uni AS (SELECT unnest(toks) AS term FROM tokens),
            ucnt AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
            tot AS (SELECT (SELECT count(*) FROM uni) AS n,
                           (SELECT count(*) FROM pairs) AS b),
            bcnt AS (SELECT bigram, count(*) AS c_ab FROM pairs
                     GROUP BY 1 HAVING count(*) >= 20)
            SELECT bigram, c_ab,
                   round(ln(((CAST(c_ab AS DOUBLE) * n) * n)
                            / ((CAST(b AS DOUBLE) * ca.c) * cb.c)), 6)
                       AS pmi
            FROM bcnt
            CROSS JOIN tot
            JOIN ucnt ca ON ca.term = split_part(bigram, ' ', 1)
            JOIN ucnt cb ON cb.term = split_part(bigram, ' ', 2)
            ORDER BY pmi DESC, bigram LIMIT 50
        """,
        "user_event_entropy": """
            WITH c AS (SELECT user_id, event_type, count(*) AS c
                       FROM events GROUP BY 1, 2),
                 q AS (SELECT user_id,
                              CAST(round(c * ln(c) * 1000000000)
                                   AS BIGINT) AS q, c
                       FROM c),
                 s AS (SELECT user_id, sum(q) AS sq, sum(c) AS n
                       FROM q GROUP BY 1)
            SELECT user_id,
                   round(ln(CAST(n AS DOUBLE))
                         - (CAST(sq AS DOUBLE) / 1000000000.0)
                           / CAST(n AS DOUBLE), 6) AS entropy
            FROM s
        """,
        "events_value_locf": """
            SELECT event_id, ts, user_id,
                   CASE WHEN event_type = 'purchase' THEN NULL
                        ELSE value END AS value,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN NULL ELSE value END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS value_filled
            FROM events
        """,
        "docs_lm_scores": """
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                         AS term
              FROM documents),
            vocab AS (SELECT term, count(*) AS tf FROM toks GROUP BY 1),
            consts AS (SELECT CAST(sum(tf) + count(*) + 1 AS DOUBLE)
                           AS denom FROM vocab),
            lp AS (SELECT term,
                          CAST(round(ln((tf + 1.0) / denom)
                                     * 1000000000) AS BIGINT) AS lpq
                   FROM vocab, consts)
            SELECT doc_id, count(*) AS n_tokens,
                   round(CAST(sum(lpq) AS DOUBLE) / 1000000000.0
                         / count(*), 6) AS avg_logprob
            FROM toks JOIN lp USING (term)
            GROUP BY doc_id
        """,
        "price_quantiles_disc_by_priority": """
            SELECT o_orderpriority, q,
                   CASE q WHEN 0.25 THEN quantile_disc(o_totalprice, 0.25)
                          WHEN 0.5 THEN quantile_disc(o_totalprice, 0.5)
                          ELSE quantile_disc(o_totalprice, 0.9)
                   END AS quantile_value
            FROM orders, (SELECT unnest([0.25, 0.5, 0.9]) AS q)
            GROUP BY o_orderpriority, q
        """,
        "embedding_centroid_by_label": """
            SELECT label, dim,
                   CAST(sum(q) AS DOUBLE) / 1000000.0 / count(*)
                       AS centroid
            FROM (SELECT label,
                         unnest(range(array_length(embedding))) AS dim,
                         CAST(round(CAST(unnest(embedding) AS DOUBLE)
                                    * 1000000) AS BIGINT) AS q
                  FROM embeddings)
            GROUP BY label, dim
        """,
        "docs_split_assign": """
            SELECT doc_id, lang,
                   CASE WHEN (doc_id * 2654435761) % 4294967296
                             < 3221225472 THEN 'train'
                        WHEN (doc_id * 2654435761) % 4294967296
                             < 3221225472 + 536870912 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "events_profile": """
            SELECT 'event_id' AS col_name,
                   count(*) - count(event_id) AS n_nulls,
                   count(DISTINCT event_id) AS n_distinct,
                   CAST(min(event_id) AS BIGINT) AS min_int,
                   CAST(max(event_id) AS BIGINT) AS max_int,
                   CAST(NULL AS DOUBLE) AS min_num,
                   CAST(NULL AS DOUBLE) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str
            FROM events
            UNION ALL SELECT 'ts', count(*) - count(ts),
                   count(DISTINCT ts), epoch_us(min(ts)),
                   epoch_us(max(ts)), NULL, NULL, NULL, NULL FROM events
            UNION ALL SELECT 'user_id', count(*) - count(user_id),
                   count(DISTINCT user_id), min(user_id), max(user_id),
                   NULL, NULL, NULL, NULL FROM events
            UNION ALL SELECT 'event_type', count(*) - count(event_type),
                   count(DISTINCT event_type), NULL, NULL, NULL, NULL,
                   min(event_type), max(event_type) FROM events
            UNION ALL SELECT 'value', count(*) - count(value),
                   count(DISTINCT value), NULL, NULL, min(value),
                   max(value), NULL, NULL FROM events
            UNION ALL SELECT 'props', count(*) - count(props),
                   count(DISTINCT props), NULL, NULL, NULL, NULL,
                   min(props), max(props) FROM events
        """,
        # rows-only (all justified; everything SQL-statable is oracled
        # as of round 5):
        # - media_features / media_frame_samples / kg_media_features:
        #   decode stubbed in-sandbox by necessity (pins + pytest)
        # - kg_mention_stats: detector-attribution golden would just
        #   re-implement the NER heuristic; the mention->triple chain
        #   is exactly gated by the four kg_* oracles (pin + pytest)
        # - corpus_top_terms_approx: Misra-Gries evictions depend on
        #   block boundaries, so the estimate is partition-defined and
        #   not SQL-replayable; its EXACT twin is oracled (error-bound
        #   pytest + pin)
        # - lineitem_closeness: HyperBall register replay across BFS
        #   rounds is not practically SQL-statable; the exact bounded
        #   twin lineitem_closeness_exact is oracled
        #   (approx_distinct_users_by_type and
        #   price_quantiles_by_priority_approx ARE deterministic
        #   register/bin replays and gained full SQL oracles above)
        # - embedding_kmeans / embedding_semantic_dup_pairs: iterative
        #   float assignment — numpy matmul and a SQL fold sum in
        #   different IEEE orders, so exact replication is unsound
        #   (single-thread reference parity + partition invariance +
        #   pins instead)
    }
