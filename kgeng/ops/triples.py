"""Deterministic (subj, pred, obj) triple emission.

Relation/media records (surface-level, from ops/extract.py) are rewritten
into entity-level triples using the broadcast resolution map — a pure
``map_batches`` with no shuffle. Records whose subject or object surface
does not resolve are dropped (noise candidates).

Confidence rule (mirrors the synthetic-truth construction): 1.0 when both
sides resolved via exact gazetteer surfaces, 0.9 when either side resolved
through alias canonicalization; media triples are 1.0.
"""

from __future__ import annotations

import pyarrow as pa
import ray

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("doc_id", pa.string()),
    ("confidence", pa.float32()),
])


class ResolveTriples:
    def __init__(self, resolution_ref):
        res = ray.get(resolution_ref) if isinstance(
            resolution_ref, ray.ObjectRef) else resolution_ref
        self.res: dict[str, tuple[str, bool]] = res

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in TRIPLE_SCHEMA.names}
        kinds = batch["rec_kind"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        subjs = batch["subj"].to_pylist()
        preds = batch["pred"].to_pylist()
        objs = batch["obj"].to_pylist()
        for kind, doc_id, s, p, o in zip(kinds, doc_ids, subjs, preds, objs):
            if kind == "relation":
                rs = self.res.get(s)
                ro = self.res.get(o)
                if rs is None or ro is None:
                    continue
                conf = 0.9 if (rs[1] or ro[1]) else 1.0
                cols["subj"].append(rs[0])
                cols["pred"].append(p)
                cols["obj"].append(ro[0])
                cols["doc_id"].append(doc_id)
                cols["confidence"].append(conf)
            elif kind == "media":
                rs = self.res.get(s)
                if rs is None:
                    continue
                cols["subj"].append(rs[0])
                cols["pred"].append("mentions_media")
                cols["obj"].append(o)
                cols["doc_id"].append(doc_id)
                cols["confidence"].append(1.0)
        return pa.Table.from_pydict(cols, schema=TRIPLE_SCHEMA)


def emit_triples(records: ray.data.Dataset,
                 resolution: dict[str, tuple[str, bool]],
                 batch_size: int = 8192,
                 concurrency=(1, 8)) -> ray.data.Dataset:
    res_ref = ray.put(resolution)
    return records.map_batches(
        ResolveTriples,
        fn_constructor_args=(res_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
