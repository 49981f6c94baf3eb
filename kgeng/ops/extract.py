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
        cols: dict[str, list] = {name: [] for name in RECORD_SCHEMA.names}

        def emit(kind, doc_id, span_idx, offset=0, surface="", ent_type="",
                 source="", subj="", pred="", obj=""):
            cols["rec_kind"].append(kind)
            cols["doc_id"].append(doc_id)
            cols["span_idx"].append(span_idx)
            cols["offset"].append(offset)
            cols["surface"].append(surface)
            cols["ent_type"].append(ent_type)
            cols["source"].append(source)
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj"].append(obj)

        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        for doc_id, spans in zip(doc_ids, spans_col):
            first_entity_surface: str | None = None
            media_spans: list[tuple[int, str]] = []
            for si, span in enumerate(spans):
                if span["kind"] != "text":
                    media_spans.append((si, span["media_ref"]))
                    continue
                text = span["text"]
                ent_mentions: list[tuple[int, str]] = []
                for m in self.cap_run.finditer(text):
                    surf = m.group()
                    hit = self.gaz.get(surf)
                    emit("mention", doc_id, si, m.start(), surf,
                         hit[1] if hit else "",
                         "gazetteer" if hit else "ner")
                    ent_mentions.append((m.start(), surf))
                    if first_entity_surface is None:
                        first_entity_surface = surf
                for name, rex in self.detectors:
                    for m in rex.finditer(text):
                        emit("mention", doc_id, si, m.start(), m.group(),
                             name, "regex")
                if len(ent_mentions) >= 2:
                    pm = self.phrase_re.search(text)
                    if pm is not None:
                        ent_mentions.sort()
                        emit("relation", doc_id, si,
                             subj=ent_mentions[0][1], pred=pm.lastgroup,
                             obj=ent_mentions[1][1])
            for si, ref in media_spans:
                if first_entity_surface is not None:
                    emit("media", doc_id, si,
                         subj=first_entity_surface, obj=ref)
        return pa.Table.from_pydict(cols, schema=RECORD_SCHEMA)


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


def extract_records(docs: ray.data.Dataset, gazetteer: dict,
                    batch_size: int = 1024,
                    concurrency=None) -> ray.data.Dataset:
    """documents Dataset -> records Dataset (mention | relation | media).

    The gazetteer is broadcast once with ``ray.put`` and read in each actor's
    ``__init__`` — never re-shipped per batch.
    """
    gaz_ref = ray.put(gazetteer)
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return docs.map_batches(
        Extract,
        fn_constructor_args=(gaz_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        **kwargs,
    )
