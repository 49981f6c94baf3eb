"""Corpus-generator determinism + schema tests (FIXTURES.md §1)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from kgeng.synth.corpus import (DOC_SCHEMA, build_gazetteer, ensure_corpus,
                                generate_doc)


def _read_corpus(d):
    return pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(d + "/corpus/*.parquet")))


def test_schema_matches_input_hint(tiny_corpus):
    t = _read_corpus(tiny_corpus)
    assert t.schema.equals(DOC_SCHEMA)
    spans_type = t.schema.field("spans").type
    assert pa.types.is_list(spans_type)
    f = {fl.name: fl.type for fl in spans_type.value_type}
    assert f == {"kind": pa.string(), "text": pa.string(),
                 "media_ref": pa.string(), "offset": pa.int32()}


def test_deterministic_generation():
    gaz = build_gazetteer()
    r1 = [generate_doc(i, gaz) for i in range(20)]
    r2 = [generate_doc(i, gaz) for i in range(20)]
    assert r1 == r2


def test_offsets_monotone(tiny_corpus):
    t = _read_corpus(tiny_corpus)
    for spans in t["spans"].to_pylist():
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs)
        for s in spans:
            if s["kind"] == "text":
                assert s["text"] and not s["media_ref"]
            else:
                assert s["media_ref"].startswith("media://") and not s["text"]


def test_golden_files_exist(tiny_corpus):
    for f in ("gazetteer.parquet", "golden_triples.parquet",
              "golden_entities.parquet", "_SUCCESS"):
        assert os.path.exists(os.path.join(tiny_corpus, f))


def test_gazetteer_unique_two_word_surfaces():
    gaz = build_gazetteer()
    assert len(gaz.surfaces) == 200
    assert len(set(gaz.surfaces)) == 200
    for s in gaz.surfaces:
        words = s.split(" ")
        assert len(words) == 2
        assert all(w[0].isupper() and w[1:].islower() for w in words)
    # aliases never collide with true surfaces
    assert not (set(gaz.alias_map) & set(gaz.surfaces))
