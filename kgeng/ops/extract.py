"""Mention detection + span-local relation extraction.

One ``map_batches`` pass over the documents table emits a *records* table
holding three record kinds (all doc-local — no shuffle here, which is what
keeps the stage linear at 10^12-doc scale; only the much smaller records
table ever reaches a wide operator):

- ``mention``: a detected surface (gazetteer hit, NER-heuristic candidate, or
  regex detector hit) with (doc_id, span_idx, offset) provenance.
- ``relation``: a predicate phrase between the first two entity-candidate
  mentions of a text span, still at surface level (subj/obj are *surfaces*;
  entity resolution happens later against the canonicalization map).
- ``media``: one record per media span, carrying the doc's first
  entity-candidate surface (the subject of the later
  ``(entity, mentions_media, media_ref)`` triple).

The detector state (gazetteer dict + compiled regexes) is built once per
actor in ``__init__`` — the actor-pool pattern the reference lacks (its
parser re-evaluates per line, ``graphalytics_importer.py:112-124``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray

from kgeng.config import DetectConfig
from kgeng.synth.corpus import PRED_PHRASES

RECORD_SCHEMA = pa.schema([
    ("rec_kind", pa.string()),
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("offset", pa.int32()),
    ("surface", pa.string()),
    ("ent_type", pa.string()),
    ("source", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
])

# maximal run of >=2 Capitalized words — the NER heuristic for candidate
# mentions (catches typo aliases that are not in the gazetteer)
_CAP_RUN = r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b"


class Extract:
    """Actor-pool callable: documents batch -> records batch."""

    def __init__(self, gazetteer_ref, detect_cfg: DetectConfig | None = None):
        cfg = detect_cfg or DetectConfig()
        gaz = ray.get(gazetteer_ref) if isinstance(
            gazetteer_ref, ray.ObjectRef) else gazetteer_ref
        # surface -> (entity_id, ent_type)
        self.gaz: dict[str, tuple[str, str]] = gaz
        self.cap_run = re.compile(_CAP_RUN)
        self.detectors = [(name, re.compile(pat))
                          for name, pat in cfg.regex_detectors]
        # one alternation for predicate phrases; longest first so
        # " is located in " wins over any embedded shorter phrase
        phrases = sorted(PRED_PHRASES.items(), key=lambda kv: -len(kv[1]))
        self.phrase_re = re.compile(
            "|".join(f"(?P<{p}>{re.escape(s)})" for p, s in phrases))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # flatten the list<struct> column ONCE via Arrow (zero-copy) and
        # convert each child to a flat Python list — no per-span dicts,
        # which is what dominates allocation cost in this hot stage
        spans_col = batch["spans"].combine_chunks()
        flat = pc.list_flatten(spans_col)
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        media = flat.field("media_ref").to_pylist()
        offsets = spans_col.offsets.to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_pylist()

        rows: list[tuple] = []  # RECORD_SCHEMA field order
        append = rows.append
        gaz_get = self.gaz.get
        cap_finditer = self.cap_run.finditer
        phrase_search = self.phrase_re.search

        for di, doc_id in enumerate(doc_ids):
            lo, hi = offsets[di], offsets[di + 1]
            rel_subjects: list[str] = []  # relation subjects in span order
            media_spans = []
            for si in range(lo, hi):
                if kinds[si] != "text":
                    media_spans.append((si - lo, media[si]))
                    continue
                text = texts[si]
                span_idx = si - lo
                ent_mentions = []
                for m in cap_finditer(text):
                    surf = m.group()
                    hit = gaz_get(surf)
                    if hit is not None:
                        append(("mention", doc_id, span_idx, m.start(),
                                surf, hit[1], "gazetteer", "", "", ""))
                    else:
                        append(("mention", doc_id, span_idx, m.start(),
                                surf, "", "ner", "", "", ""))
                    ent_mentions.append((m.start(), surf))
                for name, rex in self.detectors:
                    for m in rex.finditer(text):
                        append(("mention", doc_id, span_idx, m.start(),
                                m.group(), name, "regex", "", "", ""))
                if len(ent_mentions) >= 2:
                    pm = phrase_search(text)
                    if pm is not None:
                        ent_mentions.sort()
                        append(("relation", doc_id, span_idx, 0, "", "",
                                "", ent_mentions[0][1], pm.lastgroup,
                                ent_mentions[1][1]))
                        rel_subjects.append(ent_mentions[0][1])
            if rel_subjects:
                # media subject = first RESOLVABLE relation subject; which
                # candidate resolves is only known after canonicalization,
                # so carry the ordered head of the candidate list
                cand = "|".join(rel_subjects[:8])
                for span_idx, ref in media_spans:
                    append(("media", doc_id, span_idx, 0, "", "", "",
                            cand, "", ref))
        if not rows:
            return RECORD_SCHEMA.empty_table()
        cols = list(zip(*rows))  # C-level transpose
        arrays = [
            pa.array(cols[0], pa.string()),
            pa.array(cols[1], pa.string()),
            pa.array(cols[2], pa.int32()),
            pa.array(cols[3], pa.int32()),
            pa.array(cols[4], pa.string()),
            pa.array(cols[5], pa.string()),
            pa.array(cols[6], pa.string()),
            pa.array(cols[7], pa.string()),
            pa.array(cols[8], pa.string()),
            pa.array(cols[9], pa.string()),
        ]
        return pa.Table.from_arrays(arrays, schema=RECORD_SCHEMA)


def load_gazetteer_dict(gazetteer_parquet: str) -> dict[str, tuple[str, str]]:
    """surface -> (entity_id, ent_type), for broadcast via ray.put."""
    import pyarrow.parquet as pq

    t = pq.read_table(gazetteer_parquet)
    return {
        s: (e, ty)
        for s, e, ty in zip(t["surface"].to_pylist(),
                            t["entity_id"].to_pylist(),
                            t["ent_type"].to_pylist())
    }


# worker-local detector cache: stateless tasks re-use the compiled
# detector across batches within a worker process, so there is no actor
# pool to spin up per shard (pools re-created per map_batches call cost
# ~2s each; tasks amortize to zero) while state is still built once per
# worker, not per batch
_DETECTOR_CACHE: dict[str, Extract] = {}


def _cached_extract(key: str, gaz_ref, cfg, batch: pa.Table) -> pa.Table:
    det = _DETECTOR_CACHE.get(key)
    if det is None:
        det = Extract(gaz_ref, cfg)
        _DETECTOR_CACHE.clear()
        _DETECTOR_CACHE[key] = det
    return det(batch)


def extract_records(docs: ray.data.Dataset, gazetteer: dict,
                    batch_size: int = 1024,
                    concurrency=None,
                    detect_cfg: DetectConfig | None = None) -> ray.data.Dataset:
    """documents Dataset -> records Dataset (mention | relation | media).

    The gazetteer is broadcast once with ``ray.put`` and read once per
    worker (cached) — never re-shipped per batch.
    """
    gaz_ref = ray.put(gazetteer)
    key = gaz_ref.hex()
    cfg = detect_cfg

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_extract(key, gaz_ref, cfg, batch)

    return docs.map_batches(fn, batch_format="pyarrow",
                            batch_size=batch_size)
