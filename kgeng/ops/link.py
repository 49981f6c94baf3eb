"""Batched entity-link scorer — the stateful actor-pool stage.

The linker holds its state (gazetteer lookup + scoring tables) built once per
actor in ``__init__`` and scores whole Arrow batches in ``__call__``. In a
real deployment this is where a model (biencoder / cross-encoder) would load;
offline-sandbox stand-in is a deterministic lexical scorer, but the seam —
``map_batches(Linker, concurrency=N, batch_size=B)`` — is the real design.

Exact gazetteer hits link with score 1.0; NER-heuristic candidates get no
candidate here (``cand_id = ""``) and flow to MinHash-LSH blocking +
union-find canonicalization (ops/block.py, ops/canonicalize.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

LINKED_SCHEMA_EXTRA = [("cand_id", pa.string()), ("link_score", pa.float32())]


class Linker:
    def __init__(self, gazetteer_ref):
        gaz = ray.get(gazetteer_ref) if isinstance(
            gazetteer_ref, ray.ObjectRef) else gazetteer_ref
        self.gaz: dict[str, tuple[str, str]] = gaz

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        sources = batch["source"].to_pylist()
        cand, score = [], []
        for surf, src in zip(surfaces, sources):
            if src == "gazetteer":
                hit = self.gaz.get(surf)
                cand.append(hit[0] if hit else "")
                score.append(1.0 if hit else 0.0)
            else:
                cand.append("")
                score.append(0.0)
        return (batch
                .append_column("cand_id", pa.array(cand, pa.string()))
                .append_column("link_score", pa.array(score, pa.float32())))


def link_mentions(mentions: ray.data.Dataset, gazetteer: dict,
                  batch_size: int = 4096,
                  concurrency=(1, 4)) -> ray.data.Dataset:
    gaz_ref = ray.put(gazetteer)
    return mentions.map_batches(
        Linker,
        fn_constructor_args=(gaz_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
