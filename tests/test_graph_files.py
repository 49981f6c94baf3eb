"""Reference-compat import path: exact-match tests against the oracle."""

import os

from kgeng.io.graph_files import (CompatGraphConfig, docs_to_jsonl_rows,
                                  edge_docs, edge_list_vertices,
                                  graphalytics_files, import_edge_list,
                                  import_graphalytics, read_edge_file,
                                  read_graphalytics_vertices, read_properties)
from tests import oracle

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures")
GA_DIR = os.path.join(FIX, "graphalytics", "tiny")
EL = os.path.join(FIX, "edge_list", "comments.txt")
CFG = CompatGraphConfig()


def _doc_set(rows):
    return {tuple(sorted(r.items())) for r in rows}


def test_properties_reader():
    _v, _e, props = graphalytics_files(GA_DIR)
    assert read_properties(props, "num_vertices") == 4
    assert read_properties(props, "num_edges") == 3


def test_graphalytics_vertices_exact():
    v_path, _e, _p = graphalytics_files(GA_DIR)
    ds = read_graphalytics_vertices(v_path, CFG)
    got = _doc_set(ds.take_all())
    want = _doc_set(oracle.graphalytics_vertex_docs(
        oracle.file_lines(v_path), CFG.smart_attribute))
    assert got == want


def test_graphalytics_edges_exact():
    _v, e_path, _p = graphalytics_files(GA_DIR)
    ds = edge_docs(read_edge_file(e_path, CFG, smart_ids=True))
    got = _doc_set(docs_to_jsonl_rows_from_ds(ds))
    want_edges, _ = oracle.parse_edge_lines(
        oracle.file_lines(e_path), CFG.vertex_coll, smart=True)
    assert got == _doc_set(want_edges)


def test_edge_list_exact_with_comments_and_token_weights():
    ds_v, ds_e = import_edge_list(EL, CFG)
    got_e = _doc_set(docs_to_jsonl_rows_from_ds(ds_e))
    want_edges, want_vids = oracle.parse_edge_lines(
        oracle.file_lines(EL), CFG.vertex_coll, smart=False)
    assert got_e == _doc_set(want_edges)
    # weight 'heavy' preserved verbatim as a string; 2-field edge has NO
    # weight key at the JSON boundary (absent, not null)
    flat = docs_to_jsonl_rows_from_ds(ds_e)
    by_from = {r["_from"]: r for r in flat}
    assert by_from["vertices/3"]["weight"] == "heavy"
    assert "weight" not in by_from["vertices/2"]
    # vertex set = deduped endpoints in the dedup-insert layout
    got_v = _doc_set(ds_v.take_all())
    want_v = _doc_set(oracle.dedup_insert_vertex_docs(
        want_vids, CFG.smart_attribute))
    assert got_v == want_v


def test_import_graphalytics_pipeline():
    ds_v, ds_e = import_graphalytics(GA_DIR, CFG)
    assert ds_v.count() == 4
    assert ds_e.count() == 3
    # smart _id format on the edge path: vertices/<id>:<id>
    rows = docs_to_jsonl_rows_from_ds(ds_e)
    assert {r["_from"] for r in rows} == {"vertices/123:123", "vertices/43:43"}
    assert all(":" in r["_to"].split("/", 1)[1] for r in rows)


def test_weight_with_spaces_kept_verbatim(tmp_path):
    """split(' ', 2): anything after the second space is ONE weight token."""
    p = tmp_path / "spaces.txt"
    p.write_text("1 2 a b c\n")
    _v, ds_e = import_edge_list(str(p), CFG)
    rows = docs_to_jsonl_rows_from_ds(ds_e)
    assert rows[0]["weight"] == "a b c"
    want, _ = oracle.parse_edge_lines(["1 2 a b c"], CFG.vertex_coll, False)
    assert rows[0] == want[0]


def docs_to_jsonl_rows_from_ds(ds):
    import pyarrow as pa

    out = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        out.extend(docs_to_jsonl_rows(batch))
    return out


def test_trailing_whitespace_stripped(tmp_path):
    """file_reader strips lines (general.py:150): 'a b ' is a 2-field
    edge, not a 3-field edge with an empty weight."""
    p = tmp_path / "ws.txt"
    p.write_text("a b \n c d\n\te f\t\n")
    _v, ds_e = import_edge_list(str(p), CFG)
    rows = docs_to_jsonl_rows_from_ds(ds_e)
    assert all("weight" not in r for r in rows)
    assert {(r["_from"], r["_to"]) for r in rows} == {
        ("vertices/a", "vertices/b"), ("vertices/c", "vertices/d"),
        ("vertices/e", "vertices/f")}
