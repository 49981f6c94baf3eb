"""Stage protocol / detector registry / tar extraction."""

import os
import tarfile

import pyarrow as pa
import pytest
import ray.data

from kgeng import stages
from kgeng.io import fetch


def test_stage_compose_and_context():
    def add_one(ds, ctx):
        ctx.metrics["saw"] = True
        return ds.map_batches(
            lambda t: t.append_column(
                "y", pa.compute.add(t["x"], 1)), batch_format="pyarrow")

    run = stages.compose([stages.FnStage("add_one", add_one)])
    ctx = stages.StageContext()
    out = run(ray.data.from_arrow(pa.table({"x": [1, 2]})), ctx)
    assert [r["y"] for r in out.take_all()] == [2, 3]
    assert ctx.metrics["saw"]


def test_detector_registry_regex_and_gazetteer():
    d = stages.get_detector("regex")(r"\d{4}-\d{2}-\d{2}", "DATE")
    assert d("due 2024-05-17 ok") == [(4, "2024-05-17", "DATE")]
    g = stages.get_detector("gazetteer")({"Acme Corp": "ORG", "Acme": "ORG"})
    # longest-first alternation wins
    assert g("at Acme Corp today") == [(3, "Acme Corp", "ORG")]
    with pytest.raises(KeyError):
        stages.get_detector("nope")


def test_custom_stage_protocol_isinstance():
    class MyStage:
        name = "noop"

        def apply(self, ds, ctx):
            return ds

    assert isinstance(MyStage(), stages.Stage)


def test_tar_extract_roundtrip(tmp_path):
    src = tmp_path / "data"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    tar_path = str(tmp_path / "a.tar")
    with tarfile.open(tar_path, "w") as tf:
        tf.add(src / "a.txt", arcname="a.txt")
    out = fetch.tar_extract(tar_path, str(tmp_path / "out"))
    assert open(os.path.join(out, "a.txt")).read() == "hello"


def test_zstd_extract_env_gated(tmp_path):
    with pytest.raises(ImportError, match="zstandard"):
        fetch.zstd_extract(str(tmp_path / "x.tar.zst"), str(tmp_path))


def test_read_documents_jsonl_roundtrip(tmp_path):
    import json

    import ray.data

    from kgeng.io.source import read_documents

    p = tmp_path / "docs.jsonl"
    rows = [{"doc_id": i, "text": f"doc number {i}", "lang": "en"}
            for i in range(25)]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_documents(str(p), format="jsonl",
                        columns=["doc_id", "text"])
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 25
    assert list(out.columns) == ["doc_id", "text"]
    assert out.loc[3, "text"] == "doc number 3"
