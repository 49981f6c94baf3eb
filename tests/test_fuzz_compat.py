"""Property-based fuzz of the compat parsers vs the pure-Python oracle,
and checkpoint invalidation semantics."""

import os

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from kgeng.io.graph_files import (CompatGraphConfig, docs_to_jsonl_rows,
                                  edge_docs, read_edge_file)
from tests import oracle

CFG = CompatGraphConfig()

if HAVE_HYP:
    # tokens: printable non-whitespace, mirroring "arbitrary non-whitespace
    # weight tokens" (reference README.md:101-103)
    _token = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1, max_size=8)

    @st.composite
    def _line(draw):
        kind = draw(st.integers(0, 3))
        if kind == 0:  # comment line: first char in {#, %, /}
            return draw(st.sampled_from(["#", "%", "/"])) + draw(
                st.text(alphabet="abc 123", max_size=10))
        f, t = draw(_token), draw(_token)
        if kind == 1:  # unweighted
            return f"{f} {t}"
        # weighted; weight may itself contain spaces (split(' ', 2) keeps
        # the remainder as ONE token)
        w = " ".join(draw(st.lists(_token, min_size=1, max_size=3)))
        return f"{f} {t} {w}"

    @settings(max_examples=15, deadline=None)
    @given(lines=st.lists(_line(), min_size=0, max_size=25))
    def test_edge_parser_matches_oracle_fuzz(lines, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("fuzz")
        p = tmp / "edges.txt"
        p.write_text("".join(ln + "\n" for ln in lines))
        ds = edge_docs(read_edge_file(str(p), CFG, smart_ids=False))
        got = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.extend(docs_to_jsonl_rows(b))
        want, _ = oracle.parse_edge_lines(
            [ln.strip() for ln in lines], CFG.vertex_coll, smart=False)
        key = lambda d: tuple(sorted(d.items()))  # noqa: E731
        assert sorted(got, key=key) == sorted(want, key=key)
else:  # pragma: no cover
    def test_edge_parser_matches_oracle_fuzz():
        pytest.skip("hypothesis not installed")


def test_checkpoint_config_hash_invalidation(tiny_corpus, tmp_path):
    """A changed pipeline config must invalidate existing checkpoints
    (is_done -> False), forcing recompute — never silent reuse."""
    from kgeng.checkpoint import CheckpointStore
    from kgeng.config import BlockConfig, PipelineConfig
    from kgeng.pipeline import KGPipeline

    root = str(tmp_path / "ckpt")
    p1 = KGPipeline(checkpoint_root=root)
    p1.run(os.path.join(tiny_corpus, "corpus"),
           os.path.join(tiny_corpus, "gazetteer.parquet"))
    s1 = CheckpointStore(root, p1.cfg.config_hash())
    assert s1.is_done("records", shard=0) and s1.is_done("triples")

    cfg2 = PipelineConfig(block=BlockConfig(jaccard_threshold=0.6))
    s2 = CheckpointStore(root, cfg2.config_hash())
    assert not s2.is_done("records", shard=0)
    assert not s2.is_done("triples")
