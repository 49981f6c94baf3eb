"""Deterministic synthetic interleaved-document corpus (FIXTURES.md spec).

Generates the KG input table with the authoritative shape from
``BASELINE.json`` ``input_hint``::

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

plus by-construction golden outputs (``golden_triples``, ``golden_entities``)
and the gazetteer. Every random choice is keyed on content
``(seed, doc_idx, span_idx)`` — never on task or iteration order — so the
corpus is bit-identical across runs and across parallelism levels.

Closed world:
- 200 two-word entity surfaces (PERSON / ORG / LOC) with Zipfian usage
  frequency (hot keys exercise the salting path).
- ~10% of entity usages are typo aliases (one interior character deleted) —
  these are NOT in the gazetteer and must be recovered by MinHash-LSH
  blocking + union-find canonicalization.
- Relation sentences use fixed predicate phrases, so the golden
  ``(subj, pred, obj)`` set is computable exactly by construction.
- Media spans interleave with text spans (order-preservation invariant);
  each media span yields a ``(first_entity_of_doc, mentions_media, ref)``
  triple.
"""

from __future__ import annotations

import functools as _functools
import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260817
CORPUS_VERSION = 4  # bump to invalidate cached corpora in /tmp

# decoy phrases: capitalized two-word runs that are NOT entities and NOT
# aliases (word pools disjoint from every gazetteer pool) — the NER
# heuristic will surface them as candidates, LSH must NOT resolve them,
# and the pipeline must drop their relation records (precision path)
_DECOY_A = ["Quantum", "Vortex", "Nimbus", "Zephyr", "Obsidian", "Crimson"]
_DECOY_B = ["Mesa", "Grove", "Spire", "Atlas", "Harbor", "Summit"]

# ---------------------------------------------------------------- gazetteer

_FIRST = ["Alice", "Bruno", "Carla", "Denis", "Elena", "Farid", "Greta",
          "Hugo", "Irene", "Jonas", "Katya", "Lukas", "Mona", "Nils",
          "Olga", "Pavel", "Quinn", "Rosa", "Stefan", "Tilda"]
_LAST = ["Umber", "Vance", "Walden", "Xerxes", "Yarrow", "Zander", "Abbot",
         "Birch", "Cormac", "Dunbar"]
_ORG_A = ["Acme", "Borealis", "Cobalt", "Drakon", "Everest", "Fulcrum",
          "Gavel", "Halcyon", "Ionic", "Juniper"]
_ORG_B = ["Systems", "Holdings", "Dynamics", "Labs", "Industries",
          "Partners", "Logistics", "Robotics"]
_LOC_A = ["North", "South", "East", "West", "Upper", "Lower", "New", "Old"]
_LOC_B = ["Dovergate", "Elmford", "Ferrowick", "Glenhaven", "Harwick",
          "Ironmoor", "Juneport", "Kestrelby"]

PRED_PHRASES = {
    "works_for": " works for ",
    "founded": " founded ",
    "located_in": " is located in ",
    "partnered_with": " partnered with ",
    "acquired": " acquired ",
}
# type-compatible predicate choices: (pred, subj_type, obj_type)
_RELS = [
    ("works_for", "PERSON", "ORG"),
    ("founded", "PERSON", "ORG"),
    ("located_in", "ORG", "LOC"),
    ("partnered_with", "ORG", "ORG"),
    ("acquired", "ORG", "ORG"),
]
_STARTERS = ["Reportedly,", "Meanwhile,", "Yesterday,", "Notably,", "Today,"]

MENTIONS_MEDIA_PRED = "mentions_media"


def _stable_u64(*parts) -> int:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "little")


@dataclass(frozen=True)
class Gazetteer:
    surfaces: tuple[str, ...]         # true surface per entity
    entity_ids: tuple[str, ...]       # "E0000"...
    ent_types: tuple[str, ...]        # PERSON|ORG|LOC
    alias_map: dict[str, str]         # alias surface -> entity_id (truth; tests only)

    def surface_to_entity(self) -> dict[str, str]:
        return dict(zip(self.surfaces, self.entity_ids))

    def by_type(self, t: str) -> list[int]:
        return [i for i, et in enumerate(self.ent_types) if et == t]


def _typo(surface: str, variant: int) -> str:
    """Deterministic alias: delete one interior char of the longest word.

    Deletion index is keyed on (surface, variant); capitalization is
    preserved (index >= 1), so the NER heuristic still detects the run.
    """
    words = surface.split(" ")
    wi = max(range(len(words)), key=lambda i: (len(words[i]), -i))
    w = words[wi]
    ci = 1 + _stable_u64("typo", surface, variant) % (len(w) - 2)
    words[wi] = w[:ci] + w[ci + 1:]
    return " ".join(words)


def build_gazetteer(n_entities: int = 200) -> Gazetteer:
    """200 unique two-word surfaces; deterministic; no surface is a
    word-substring of another (all are exactly two words, unique pairs)."""
    surfaces, ids, types = [], [], []
    seen = set()
    pools = {
        "PERSON": [(a, b) for a in _FIRST for b in _LAST],
        "ORG": [(a, b) for a in _ORG_A for b in _ORG_B],
        "LOC": [(a, b) for a in _LOC_A for b in _LOC_B],
    }
    order = ["PERSON", "ORG", "LOC"]
    counts = {"PERSON": 0, "ORG": 0, "LOC": 0}
    i = 0
    while len(surfaces) < n_entities:
        if all(counts[t] >= len(pools[t]) for t in order):
            raise ValueError(
                f"n_entities={n_entities} exceeds the name pools' unique-"
                f"surface ceiling ({len(surfaces)} reachable) — extend "
                f"_FIRST/_LAST/_ORG_*/_LOC_* instead of looping forever")
        t = order[i % 3]
        pool = pools[t]
        k = counts[t]
        if k >= len(pool):
            i += 1
            continue
        # deterministic shuffle of the pool per type
        j = _stable_u64("gaz", t, k) % len(pool)
        a, b = pool[j]
        counts[t] += 1
        s = f"{a} {b}"
        if s in seen:
            i += 1
            continue
        seen.add(s)
        surfaces.append(s)
        ids.append(f"E{len(ids):04d}")
        types.append(t)
        i += 1
    alias_map = {}
    for s, eid in zip(surfaces, ids):
        for v in (0, 1):
            al = _typo(s, v)
            if al not in seen and al not in alias_map:
                alias_map[al] = eid
    return Gazetteer(tuple(surfaces), tuple(ids), tuple(types), alias_map)


# ---------------------------------------------------------------- doc synth

def _clear_parts(corpus_dir: str) -> None:
    """Remove stale part files before regeneration: shrinking n_docs (or
    force=True) must not leave extra parts that downstream readers would
    include while the golden tables do not cover them."""
    import glob

    for f in glob.glob(os.path.join(corpus_dir, "part-*.parquet")):
        os.remove(f)


@_functools.lru_cache(maxsize=64)
def _zipf_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1)
    w /= w.sum()
    return w


def _zipf_pick(rng: np.random.Generator, idxs: list[int]) -> int:
    """Zipf-ish pick: rank r with weight 1/(r+1); deterministic given rng.
    Weights depend only on len(idxs) and are cached (this runs tens of
    millions of times at the 2M-doc bench operating point)."""
    n = len(idxs)
    return idxs[int(rng.choice(n, p=_zipf_weights(n)))]


def _media_ref(doc_idx: int, span_idx: int, seed: int) -> str:
    return "media://" + hashlib.sha1(
        f"{seed}|{doc_idx}|{span_idx}".encode()).hexdigest()[:12]


def generate_doc(doc_idx: int, gaz: Gazetteer, seed: int = SEED,
                 spans_lo: int = 1, spans_hi: int = 12):
    """Return (doc_row, golden_triples, used_aliases) for one document.

    doc_row = {"doc_id": str, "spans": [ {kind,text,media_ref,offset} ]}
    golden_triples = list[(subj_eid, pred, obj_eid_or_ref, doc_id, conf)]
    used_aliases = list[(alias_surface, entity_id)]
    """
    rng = np.random.default_rng([seed, doc_idx])
    doc_id = f"doc-{doc_idx:08d}"
    n_spans = int(rng.integers(spans_lo, spans_hi + 1))
    spans, triples, used_aliases = [], [], []
    offset = 0
    media_refs = []          # media spans awaiting the doc's first entity
    first_entity: str | None = None

    by_type = {t: gaz.by_type(t) for t in ("PERSON", "ORG", "LOC")}

    for si in range(n_spans):
        is_media = rng.random() < 0.25
        if is_media:
            ref = _media_ref(doc_idx, si, seed)
            spans.append({"kind": "image" if rng.random() < 0.6 else "audio",
                          "text": "", "media_ref": ref, "offset": offset})
            media_refs.append(ref)
            offset += 1
            continue
        starter = _STARTERS[int(rng.integers(0, len(_STARTERS)))]
        kind_roll = rng.random()
        if kind_roll < 0.63:
            text, tr, als = _relation_sentence(rng, gaz, by_type, starter, doc_id)
            triples.extend(tr)
            used_aliases.extend(als)
            if first_entity is None and tr:
                first_entity = tr[0][0]
        elif kind_roll < 0.70:
            # decoy relation: capitalized non-entity phrases around a real
            # predicate phrase -> the pipeline must NOT emit a triple
            d1 = (f"{_DECOY_A[int(rng.integers(0, len(_DECOY_A)))]} "
                  f"{_DECOY_B[int(rng.integers(0, len(_DECOY_B)))]}")
            d2 = (f"{_DECOY_A[int(rng.integers(0, len(_DECOY_A)))]} "
                  f"{_DECOY_B[int(rng.integers(0, len(_DECOY_B)))]}")
            pred = list(PRED_PHRASES)[int(rng.integers(0, len(PRED_PHRASES)))]
            text = f"{starter} {d1}{PRED_PHRASES[pred]}{d2}."
        elif kind_roll < 0.85:
            text = _regex_sentence(rng, starter, doc_idx, si)
        else:
            text, tr, als = _relation_sentence(rng, gaz, by_type, starter, doc_id)
            text += f" The deadline is {_rand_date(rng)}."
            triples.extend(tr)
            used_aliases.extend(als)
            if first_entity is None and tr:
                first_entity = tr[0][0]
        spans.append({"kind": "text", "text": text, "media_ref": "",
                      "offset": offset})
        offset += len(text) + 1

    if first_entity is not None:
        for ref in media_refs:
            triples.append((first_entity, MENTIONS_MEDIA_PRED, ref, doc_id, 1.0))
    return ({"doc_id": doc_id, "spans": spans}, triples, used_aliases)


def _rand_date(rng) -> str:
    y = 2000 + int(rng.integers(0, 26))
    m = 1 + int(rng.integers(0, 12))
    d = 1 + int(rng.integers(0, 28))
    return f"{y:04d}-{m:02d}-{d:02d}"


def _regex_sentence(rng, starter, doc_idx, si) -> str:
    tid = f"{'ABC DEF GHI JKL'.split()[int(rng.integers(0, 4))]}-{int(rng.integers(1, 10000))}"
    mail = f"user{int(rng.integers(1, 500))}@example{int(rng.integers(1, 20))}.com"
    return (f"{starter} the deadline is {_rand_date(rng)}, the ticket is "
            f"{tid} and the contact is {mail}.")


def _pick_surface(rng, gaz: Gazetteer, eidx: int):
    """Return (rendered_surface, entity_id, used_alias: bool, conf)."""
    eid = gaz.entity_ids[eidx]
    true_surface = gaz.surfaces[eidx]
    if rng.random() < 0.10:
        variant = int(rng.integers(0, 2))
        alias = _typo(true_surface, variant)
        if alias in gaz.alias_map and gaz.alias_map[alias] == eid:
            return alias, eid, True, 0.9
    return true_surface, eid, False, 1.0


def _relation_sentence(rng, gaz, by_type, starter, doc_id):
    pred, st, ot = _RELS[int(rng.integers(0, len(_RELS)))]
    si_ = _zipf_pick(rng, by_type[st])
    oi_ = _zipf_pick(rng, by_type[ot])
    if oi_ == si_:  # avoid self-relations (partnered_with ORG ORG)
        alt = by_type[ot]
        oi_ = alt[(alt.index(si_) + 1) % len(alt)]
    s_surf, s_eid, s_alias, s_conf = _pick_surface(rng, gaz, si_)
    o_surf, o_eid, o_alias, o_conf = _pick_surface(rng, gaz, oi_)
    text = f"{starter} {s_surf}{PRED_PHRASES[pred]}{o_surf}."
    conf = min(s_conf, o_conf)
    aliases = []
    if s_alias:
        aliases.append((s_surf, s_eid))
    if o_alias:
        aliases.append((o_surf, o_eid))
    return text, [(s_eid, pred, o_eid, doc_id, conf)], aliases


# ---------------------------------------------------------------- writers

SPAN_TYPE = pa.struct([("kind", pa.string()), ("text", pa.string()),
                       ("media_ref", pa.string()), ("offset", pa.int32())])
DOC_SCHEMA = pa.schema([("doc_id", pa.string()),
                        ("spans", pa.list_(SPAN_TYPE))])
TRIPLE_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                           ("obj", pa.string()), ("doc_id", pa.string()),
                           ("confidence", pa.float32())])


def docs_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def generate_corpus(out_dir: str, n_docs: int, seed: int = SEED,
                    n_entities: int = 200, force: bool = False) -> str:
    """Write corpus.parquet + gazetteer.parquet + golden_{triples,entities}
    .parquet under ``out_dir``; idempotent via a _SUCCESS sidecar."""
    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success) and not force:
        with open(success) as f:
            meta = json.load(f)
        if (meta.get("n_docs") == n_docs and meta.get("seed") == seed
                and meta.get("version") == CORPUS_VERSION):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    gaz = build_gazetteer(n_entities)
    doc_rows, all_triples = [], []
    alias_use: dict[str, str] = {}
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    _clear_parts(corpus_dir)  # a SHRUNK n_docs must not leave old parts
    part = 0
    part_rows = 4096  # many files + small row groups => block-level
    for di in range(n_docs):  # parallelism for the Ray readers downstream
        row, triples, aliases = generate_doc(di, gaz, seed)
        doc_rows.append(row)
        all_triples.extend(triples)
        for a, eid in aliases:
            alias_use[a] = eid
        if len(doc_rows) >= part_rows:
            pq.write_table(docs_to_table(doc_rows),
                           os.path.join(corpus_dir, f"part-{part:05d}.parquet"),
                           row_group_size=512)
            doc_rows, part = [], part + 1
    if doc_rows or part == 0:
        pq.write_table(docs_to_table(doc_rows),
                       os.path.join(corpus_dir, f"part-{part:05d}.parquet"),
                       row_group_size=512)

    pq.write_table(pa.table({
        "surface": list(gaz.surfaces),
        "entity_id": list(gaz.entity_ids),
        "ent_type": list(gaz.ent_types),
    }), os.path.join(out_dir, "gazetteer.parquet"))

    # golden triples: unique set (set semantics for P/R), keep doc_id+conf
    tr = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj": o, "doc_id": d, "confidence": c}
         for (s, p, o, d, c) in all_triples], schema=TRIPLE_SCHEMA)
    pq.write_table(tr, os.path.join(out_dir, "golden_triples.parquet"))

    # golden entities: canonical surface forms actually used in the corpus
    forms: dict[str, set[str]] = {eid: set() for eid in gaz.entity_ids}
    used_eids = {t[0] for t in all_triples} | {
        t[2] for t in all_triples if not t[2].startswith("media://")}
    s2e = gaz.surface_to_entity()
    for s, eid in s2e.items():
        forms[eid].add(s)
    for a, eid in alias_use.items():
        forms[eid].add(a)
    e2s = {eid: s for s, eid in s2e.items()}
    ents = [{"entity_id": eid,
             "canon_key": e2s[eid].lower(),
             "surface_forms": sorted(forms[eid]),
             "ent_type": gaz.ent_types[gaz.entity_ids.index(eid)],
             "part": gaz.ent_types[gaz.entity_ids.index(eid)]}
            for eid in sorted(used_eids)]
    pq.write_table(pa.Table.from_pylist(ents), os.path.join(out_dir, "golden_entities.parquet"))

    with open(success, "w") as f:
        json.dump({"n_docs": n_docs, "seed": seed, "version": CORPUS_VERSION,
                   "n_triples": tr.num_rows, "n_aliases_used": len(alias_use)}, f)
    return out_dir


def corpus_dir_for(n_docs: int, seed: int = SEED, base: str = "/tmp/kgeng_corpus") -> str:
    return os.path.join(base, f"v{CORPUS_VERSION}_n{n_docs}_s{seed}")


def ensure_corpus(n_docs: int, seed: int = SEED) -> str:
    d = corpus_dir_for(n_docs, seed)
    return generate_corpus(d, n_docs, seed)


# ------------------------------------------------- Ray-parallel generation

def generate_corpus_ray(out_dir: str, n_docs: int, seed: int = SEED,
                        n_entities: int = 200, part_rows: int = 4096,
                        spans_lo: int = 1, spans_hi: int = 12,
                        force: bool = False) -> str:
    """Parallel corpus generation: one Ray task per part file. Every doc is
    content-keyed on (seed, doc_idx), so the output is bit-identical to the
    serial generator at any parallelism. Golden triples/aliases are emitted
    as the task results (small relative to the corpus) and concatenated on
    the driver."""
    import ray
    import ray.data

    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success) and not force:
        with open(success) as f:
            meta = json.load(f)
        if (meta.get("n_docs") == n_docs and meta.get("seed") == seed
                and meta.get("version") == CORPUS_VERSION
                and meta.get("spans") == [spans_lo, spans_hi]):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    _clear_parts(corpus_dir)  # a SHRUNK n_docs must not leave old parts
    gaz = build_gazetteer(n_entities)
    gaz_ref = ray.put(gaz)
    n_parts = (n_docs + part_rows - 1) // part_rows

    @ray.remote
    def gen_part(part: int):
        g = ray.get(gaz_ref)
        lo, hi = part * part_rows, min((part + 1) * part_rows, n_docs)
        doc_rows, triples, aliases = [], [], {}
        for di in range(lo, hi):
            row, tr, al = generate_doc(di, g, seed, spans_lo, spans_hi)
            doc_rows.append(row)
            triples.extend(tr)
            for a, eid in al:
                aliases[a] = eid
        pq.write_table(docs_to_table(doc_rows),
                       os.path.join(corpus_dir, f"part-{part:05d}.parquet"),
                       row_group_size=512)
        tr_tbl = pa.Table.from_pylist(
            [{"subj": s, "pred": p, "obj": o, "doc_id": d, "confidence": c}
             for (s, p, o, d, c) in triples], schema=TRIPLE_SCHEMA)
        return tr_tbl, aliases

    results = ray.get([gen_part.remote(p) for p in range(n_parts)])
    all_tr = pa.concat_tables([r[0] for r in results])
    alias_use: dict[str, str] = {}
    for _t, al in results:
        alias_use.update(al)
    pq.write_table(all_tr, os.path.join(out_dir, "golden_triples.parquet"))
    pq.write_table(pa.table({
        "surface": list(gaz.surfaces),
        "entity_id": list(gaz.entity_ids),
        "ent_type": list(gaz.ent_types),
    }), os.path.join(out_dir, "gazetteer.parquet"))
    _write_golden_entities(out_dir, gaz, all_tr, alias_use)
    with open(success, "w") as f:
        json.dump({"n_docs": n_docs, "seed": seed,
                   "version": CORPUS_VERSION,
                   "spans": [spans_lo, spans_hi],
                   "n_triples": all_tr.num_rows,
                   "n_aliases_used": len(alias_use)}, f)
    return out_dir


def _write_golden_entities(out_dir: str, gaz: Gazetteer, tr: pa.Table,
                           alias_use: dict[str, str]):
    forms: dict[str, set] = {eid: set() for eid in gaz.entity_ids}
    subj = set(tr["subj"].to_pylist())
    objs = {o for o in tr["obj"].to_pylist()
            if not o.startswith("media://")}
    used_eids = subj | objs
    s2e = gaz.surface_to_entity()
    for s, eid in s2e.items():
        forms[eid].add(s)
    for a, eid in alias_use.items():
        forms[eid].add(a)
    ents = [{"entity_id": eid,
             "canon_key": gaz.surfaces[gaz.entity_ids.index(eid)].lower(),
             "surface_forms": sorted(forms[eid]),
             "ent_type": gaz.ent_types[gaz.entity_ids.index(eid)],
             "part": gaz.ent_types[gaz.entity_ids.index(eid)]}
            for eid in sorted(used_eids)]
    pq.write_table(pa.Table.from_pylist(ents),
                   os.path.join(out_dir, "golden_entities.parquet"))


def ensure_bench_corpus(n_docs: int, seed: int = SEED,
                        spans_lo: int = 4, spans_hi: int = 20) -> str:
    """Bench-tier corpus: denser documents (4-20 spans) so per-doc compute
    reflects realistic web-document sizes. Generated in parallel, cached."""
    d = os.path.join("/tmp/kgeng_corpus",
                     f"v{CORPUS_VERSION}_n{n_docs}_s{seed}"
                     f"_sp{spans_lo}-{spans_hi}")
    return generate_corpus_ray(d, n_docs, seed, spans_lo=spans_lo,
                               spans_hi=spans_hi)
