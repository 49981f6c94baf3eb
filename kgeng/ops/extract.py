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

Hot-path layout (this stage is the pipeline's scaling limiter — it touches
every byte of the corpus):

1. **Arrow prefilter**: ``pc.match_substring_regex`` (re2, vectorized)
   marks the text spans that can possibly yield a record; non-candidate
   spans never reach Python at all (their strings are never materialized).
2. **Megastring scan**: all candidate span texts of a batch are joined
   with ``\\n`` and each compiled pattern runs ONE ``finditer`` over the
   joined string, so Python loop overhead is per *match*, not per span ×
   pattern. Matches map back to (doc, span, offset) via vectorized
   ``np.searchsorted`` — no per-span Python. (Safe because no pattern can
   match across ``\\n``: detector/phrase patterns are gated on containing
   no ``\\n``/``\\s``; if a custom detector fails the gate, the kernel
   falls back to per-span scanning with identical semantics.)
3. **Columnar assembly**: records are built as parallel per-kind column
   arrays (doc references as int32 indices resolved via ``pc.take``), not
   per-record tuples.

The detector state (gazetteer dict + compiled regexes) is built once per
actor in ``__init__`` — the actor-pool pattern the reference lacks (its
parser re-evaluates per line, ``graphalytics_importer.py:112-124``).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
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
    # exact-gazetteer link result, folded into extraction: the lookup is
    # already paid here, so a separate link pass would rewrite the whole
    # corpus-scale mention table just to add these two columns. A
    # model-based scorer uses the ops/link.py actor-pool stage instead.
    ("cand_id", pa.string()),
    ("link_score", pa.float32()),
])

# maximal run of >=2 Capitalized words — the NER heuristic for candidate
# mentions (catches typo aliases that are not in the gazetteer)
_CAP_RUN = r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b"


# Escapes that can never match '\n' and whose semantics are position-
# independent across a '\n' join boundary. '\b' qualifies: boundary-ness
# at a span edge is "neighbor is a word char?" and both start-of-string
# and '\n' are non-word, so per-span and megastring agree.
_NL_SAFE_ESCAPES = frozenset("dwbtfrvS")


def _newline_safe(pattern: str) -> bool:
    """True if scanning the '\\n'-joined megastring yields exactly the
    per-span matches for this pattern. Rejects anything that could match
    '\\n' (``\\s \\D \\W``, hex/octal/unicode escapes, negated classes,
    literal newlines), positional assertions (``^ $ \\A \\Z \\B``),
    inline ``s``/``m``/``x`` flags, lookarounds, and backreferences —
    a rejected pattern falls back to per-span scanning."""
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\n":
            return False
        if c == "\\":
            if i + 1 >= n:
                return False
            e = pattern[i + 1]
            if e.isalnum() and e not in _NL_SAFE_ESCAPES:
                return False   # \n \s \D \W \A \Z \B \x.. \0.. \u \N \1
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c in "^$":
            return False
        if c == "[":
            in_class = True
            if pattern[i + 1:i + 2] == "^":
                return False   # negated class matches '\n'
            i += 1
            continue
        if c == "(" and pattern[i + 1:i + 2] == "?":
            nxt = pattern[i + 2:i + 3]
            if nxt == ":" or (nxt == "P" and pattern[i + 3:i + 4] == "<"):
                i += 3
                continue
            # inline flags: only a/i/u leave newline semantics intact
            j = i + 2
            while j < n and pattern[j] in "aiu":
                j += 1
            if j > i + 2 and j < n and pattern[j] in "):":
                i = j + 1
                continue
            return False       # (?s (?m (?x lookarounds conditionals ...
        i += 1
    return not in_class


# Positive-class expansions: RE2's \w/\d/\s are ASCII while Python's are
# Unicode-aware; widening with the Unicode property classes makes the
# RE2 pattern match a SUPERSET of the Python one (sound for a prefilter).
_RE2_CLASS_EXPAND = {
    "w": r"\w\p{L}\p{N}",
    "d": r"\d\p{Nd}",
    "s": "\\s\\p{Z}\\v\\x{85}\\x{1c}-\\x{1f}",
}


def _re2_superset(pattern: str) -> str | None:
    """Rewrite a Python-``re`` pattern into an RE2 pattern that matches a
    SUPERSET of it, or ``None`` if no sound rewrite is known.

    - ``\\w \\d \\s`` widen via ``_RE2_CLASS_EXPAND`` (ADVICE r02:
      'josé@example.com' matches Python's EMAIL detector but not RE2's
      ASCII ``\\w`` — the prefilter silently dropped the span).
    - ``\\b``/``\\B`` outside classes are removed: dropping a zero-width
      assertion only widens the match set.
    - ``\\W \\D \\S`` and negated classes pass through unchanged: the
      RE2 (ASCII-complement) versions are already supersets.
    - Lookarounds/conditionals have no RE2 form -> ``None`` (prefilter
      disabled, per-span Python scan keeps exact semantics).
    """
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = neg_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                return None
            e = pattern[i + 1]
            if not in_class and e in ("b", "B"):
                if pattern[i + 2:i + 3] in ("*", "+", "?", "{"):
                    return None  # quantified assertion: can't just drop
                i += 2
                continue
            if e in _RE2_CLASS_EXPAND and not neg_class:
                exp = _RE2_CLASS_EXPAND[e]
                out.append(exp if in_class else "[" + exp + "]")
            else:
                out.append(c + e)
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = neg_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            neg_class = pattern[i + 1:i + 2] == "^"
        elif c == "(" and pattern[i + 1:i + 2] == "?":
            nxt = pattern[i + 2:i + 3]
            if nxt in ("=", "!", "(") or pattern[i + 2:i + 4] in ("<=",
                                                                  "<!"):
                return None
        out.append(c)
        i += 1
    return "".join(out)


def _arrow_compilable(pattern: str) -> bool:
    try:
        pc.match_substring_regex(pa.array([""], pa.string()),
                                 pattern=pattern)
        return True
    except pa.ArrowException:
        return False


class Extract:
    """Stateless-task / actor-pool callable: documents batch -> records."""

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
        # Arrow prefilter is sound only if EVERY detector has a known
        # RE2-superset rewrite that compiles (else a span matched only by
        # the odd detector — or only under Python's Unicode \w/\d — would
        # be silently skipped)
        sup = [_re2_superset(p)
               for p in [_CAP_RUN] + [p for _n, p in cfg.regex_detectors]]
        self.prefilter = (sup if all(s is not None and _arrow_compilable(s)
                                     for s in sup)
                          else None)
        # megastring join is sound only if no pattern can match across \n
        # or change meaning at a join boundary (gate covers the built-in
        # NER/phrase patterns too, not just configured detectors)
        self.mega_ok = all(
            _newline_safe(p)
            for p in [_CAP_RUN, self.phrase_re.pattern]
            + [p for _n, p in cfg.regex_detectors])

    # ---------------------------------------------------------- scanning
    @staticmethod
    def _join(texts: list[str]):
        """('\\n'-joined megastring, span start offsets) — built once per
        batch and shared by every pattern scan."""
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        if texts:
            np.cumsum([len(t) + 1 for t in texts], out=starts[1:])
        return "\n".join(texts), starts

    def _scan(self, texts: list[str], mega: str, starts: np.ndarray,
              rex: re.Pattern, want_group: bool):
        """All matches of ``rex`` over ``texts``: returns (span_i, offset,
        surface-or-lastgroup) parallel lists. Fast path: one finditer over
        the joined megastring, mapped back via searchsorted."""
        if not texts:
            return np.empty(0, np.int64), np.empty(0, np.int64), []
        if self.mega_ok:
            pos, val = [], []
            if want_group:
                for m in rex.finditer(mega):
                    pos.append(m.start())
                    val.append(m.group())
            else:
                for m in rex.finditer(mega):
                    pos.append(m.start())
                    val.append(m.lastgroup)
            if not pos:
                return np.empty(0, np.int64), np.empty(0, np.int64), []
            p = np.asarray(pos, dtype=np.int64)
            span_i = np.searchsorted(starts, p, side="right") - 1
            return span_i, p - starts[span_i], val
        # fallback: per-span scans (identical semantics, exotic detectors)
        span_i, off, val = [], [], []
        for i, text in enumerate(texts):
            for m in rex.finditer(text):
                span_i.append(i)
                off.append(m.start())
                val.append(m.group() if want_group else m.lastgroup)
        return (np.asarray(span_i, dtype=np.int64),
                np.asarray(off, dtype=np.int64), val)

    # ---------------------------------------------------------- assembly
    @staticmethod
    def _tbl(kind: str, doc_ids: pa.Array, span_idx, offset, surface,
             ent_type, source, subj, pred, obj,
             cand="", score=None) -> pa.Table:
        n = len(doc_ids)

        def col(v):
            if isinstance(v, str):  # constant
                return pa.array([v] * n, pa.string())
            return v if isinstance(v, pa.Array) else pa.array(v, pa.string())

        score_arr = (pa.array(np.zeros(n, dtype=np.float32))
                     if score is None
                     else pa.array(np.asarray(score, dtype=np.float32)))
        return pa.Table.from_arrays([
            col(kind), doc_ids,
            pa.array(np.asarray(span_idx, dtype=np.int32), pa.int32()),
            pa.array(np.asarray(offset, dtype=np.int32), pa.int32()),
            col(surface), col(ent_type), col(source),
            col(subj), col(pred), col(obj),
            col(cand), score_arr,
        ], schema=RECORD_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].combine_chunks()
        flat = pc.list_flatten(spans_col)
        offsets = spans_col.offsets.to_numpy(zero_copy_only=False)
        doc_id_arr = batch["doc_id"].combine_chunks()

        kind_arr = flat.field("kind")
        text_arr = flat.field("text")
        is_text = pc.equal(kind_arr, "text")
        if self.prefilter is not None:
            m = pc.match_substring_regex(text_arr, pattern=self.prefilter[0])
            for pat in self.prefilter[1:]:
                m = pc.or_kleene(
                    m, pc.match_substring_regex(text_arr, pattern=pat))
            cand = pc.fill_null(pc.and_kleene(is_text, m), False)
        else:
            cand = is_text
        cand_np = cand.to_numpy(zero_copy_only=False)
        cand_idx = np.flatnonzero(cand_np)
        # adaptive prefilter: the re2 pre-pass pays for itself only when it
        # actually filters (it re-scans every byte; ~5% of batch time). If
        # a large batch shows >=95% of text spans are candidates anyway,
        # drop the prefilter for this worker's later batches — skipping it
        # treats all text spans as candidates, which is exactly the
        # fallback semantics, so output is identical either way.
        if self.prefilter is not None and len(cand_np) >= 4096:
            n_text = pc.sum(pc.cast(is_text, pa.int64())).as_py() or 0
            if n_text and cand_idx.size >= 0.95 * n_text:
                self.prefilter = None
        texts = (text_arr.take(pa.array(cand_idx)).to_pylist()
                 if len(cand_idx) else [])
        if texts and any(x is None for x in texts):
            texts = [x or "" for x in texts]  # null-safe
        mega, starts = self._join(texts)

        def to_doc(span_i: np.ndarray):
            """candidate-span index array -> (doc_idx, span_idx_in_doc)."""
            g = cand_idx[span_i]
            d = np.searchsorted(offsets, g, side="right") - 1
            return d, g - offsets[d]

        parts: list[pa.Table] = []

        # ---- entity-candidate mentions (capitalized runs) --------------
        cap_span, cap_off, cap_surf = self._scan(texts, mega, starts,
                                                 self.cap_run, True)
        if len(cap_span):
            gaz_get = self.gaz.get
            hits = [gaz_get(s) for s in cap_surf]
            ent_type = [h[1] if h is not None else "" for h in hits]
            source = ["gazetteer" if h is not None else "ner" for h in hits]
            cand = [h[0] if h is not None else "" for h in hits]
            score = np.fromiter((1.0 if h is not None else 0.0
                                 for h in hits), np.float32, len(hits))
            d, s = to_doc(cap_span)
            parts.append(self._tbl(
                "mention", pc.take(doc_id_arr, pa.array(d)), s, cap_off,
                cap_surf, ent_type, source, "", "", "",
                cand=cand, score=score))
            # side output: the batch's unique unresolved (NER) surfaces as
            # their own record kind, so canonicalization reads a tiny
            # 'surface' partition instead of re-scanning every mention
            ner_uniq = sorted({s_ for s_, h in zip(cap_surf, hits)
                               if h is None})
            if ner_uniq:
                parts.append(self._tbl(
                    "surface", pa.array([""] * len(ner_uniq)),
                    np.zeros(len(ner_uniq), np.int32),
                    np.zeros(len(ner_uniq), np.int32),
                    ner_uniq, "", "", "", "", ""))

        # ---- regex detector mentions (separate pass per detector keeps
        # cross-detector overlap semantics identical to one-scan-each) ----
        for name, rex in self.detectors:
            d_span, d_off, d_surf = self._scan(texts, mega, starts, rex,
                                               True)
            if len(d_span):
                d, s = to_doc(d_span)
                parts.append(self._tbl(
                    "mention", pc.take(doc_id_arr, pa.array(d)), s, d_off,
                    d_surf, name, "regex", "", "", ""))

        # ---- relations: first phrase in a span with >= 2 cap mentions --
        rel_doc_subjects: dict[int, list[str]] = {}
        if len(cap_span):
            ph_span, _ph_off, ph_name = self._scan(texts, mega, starts,
                                                   self.phrase_re, False)
            if len(ph_span):
                # first phrase per span (matches arrive position-ordered)
                ph_u, ph_first = np.unique(ph_span, return_index=True)
                n_cand = len(texts)
                cap_counts = np.bincount(cap_span, minlength=n_cand)
                keep = cap_counts[ph_u] >= 2
                rel_spans = ph_u[keep]
                if len(rel_spans):
                    preds = [ph_name[i] for i in ph_first[keep]]
                    first_cap = np.searchsorted(cap_span, rel_spans,
                                                side="left")
                    subj = [cap_surf[i] for i in first_cap]
                    obj = [cap_surf[i + 1] for i in first_cap]
                    d, s = to_doc(rel_spans)
                    # EARLY TRIPLE EMISSION: a relation whose subject AND
                    # object both exact-match the gazetteer is fully
                    # determined here — canonicalization maps every
                    # gazetteer surface to its own entity (via_alias=False,
                    # ops/canonicalize.py:_resolve_components), so the
                    # downstream resolve would emit exactly
                    # (eid_s, pred, eid_o, conf=1.0). Emitting it in THIS
                    # pass moves ~3/4 of triple emission into the
                    # corpus-linear extract stage and shrinks the
                    # resolve-barrier stage to the alias-dependent residue.
                    gaz_get = self.gaz.get
                    s_hit = [gaz_get(x) for x in subj]
                    o_hit = [gaz_get(x) for x in obj]
                    early = np.fromiter(
                        (a is not None and b is not None
                         for a, b in zip(s_hit, o_hit)),
                        np.bool_, len(subj))
                    if early.any():
                        e_idx = np.flatnonzero(early)
                        e_subj = [s_hit[i][0] for i in e_idx]
                        e_obj = [o_hit[i][0] for i in e_idx]
                        parts.append(self._tbl(
                            "triple", pc.take(doc_id_arr,
                                              pa.array(d[e_idx])),
                            s[e_idx], np.zeros(len(e_idx), np.int32),
                            "", "", "", e_subj,
                            [preds[i] for i in e_idx], e_obj))
                        # side output: the batch's unique early-triple
                        # entity ids (same pattern as 'surface'), so the
                        # entities stage reads a tiny partition
                        eids = sorted(set(e_subj) | set(e_obj))
                        parts.append(self._tbl(
                            "eid", pa.array([""] * len(eids)),
                            np.zeros(len(eids), np.int32),
                            np.zeros(len(eids), np.int32),
                            "", "", "", eids, "", ""))
                    if not early.all():
                        p_idx = np.flatnonzero(~early)
                        parts.append(self._tbl(
                            "relation", pc.take(doc_id_arr,
                                                pa.array(d[p_idx])),
                            s[p_idx], np.zeros(len(p_idx), np.int32),
                            "", "", "", [subj[i] for i in p_idx],
                            [preds[i] for i in p_idx],
                            [obj[i] for i in p_idx]))
                    # relation subjects per doc, span order (d is sorted);
                    # collected from ALL relations — media subjects do not
                    # depend on the early/pending split
                    for di, sj in zip(d.tolist(), subj):
                        rel_doc_subjects.setdefault(di, []).append(sj)

        # ---- media records (docs that produced a relation subject) ------
        media_idx = np.flatnonzero(
            pc.invert(is_text).to_numpy(zero_copy_only=False))
        if len(media_idx) and rel_doc_subjects:
            m_doc = np.searchsorted(offsets, media_idx, side="right") - 1
            keep = np.isin(m_doc, np.fromiter(rel_doc_subjects, np.int64,
                                              len(rel_doc_subjects)))
            if keep.any():
                m_doc = m_doc[keep]
                m_g = media_idx[keep]
                refs = flat.field("media_ref").take(pa.array(m_g)).to_pylist()
                # media subject = ordered head of the doc's relation-subject
                # candidates; which one resolves is known post-canonicalize
                cands = ["|".join(rel_doc_subjects[di][:8])
                         for di in m_doc.tolist()]
                parts.append(self._tbl(
                    "media", pc.take(doc_id_arr, pa.array(m_doc)),
                    m_g - offsets[m_doc], np.zeros(len(m_doc), np.int32),
                    "", "", "", cands, "", refs))

        if not parts:
            return RECORD_SCHEMA.empty_table()
        return pa.concat_tables(parts)


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


def plan_read_items(files: list[str],
                    target_rows: int = 4096) -> list[dict]:
    """Split parquet files into (path, row-group range) work items of
    ~``target_rows`` docs each — the task grain for the fused reader.
    One cheap footer read per file on the driver; a 245-file corpus
    plans in ~0.2 s."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    # footer reads release the GIL; threading turns ~500 serial reads
    # (~0.5-1 s of driver time per stage) into ~50 ms
    with ThreadPoolExecutor(max_workers=16) as ex:
        metas = list(ex.map(pq.read_metadata, files))
    items = []
    for f, md in zip(files, metas):
        n_rg = md.num_row_groups
        if n_rg == 0:
            continue
        rows_per_rg = max(1, md.num_rows // n_rg)
        step = max(1, target_rows // rows_per_rg)
        for lo in range(0, n_rg, step):
            hi = min(lo + step, n_rg)
            items.append({"path": f, "rg_lo": lo, "rg_hi": hi,
                          "rows": rows_per_rg * (hi - lo)})
    return items


def item_source(items: list[dict], n_tasks: int) -> ray.data.Dataset:
    """A Dataset with ``n_tasks`` blocks, each carrying one contiguous
    slice of ``items`` as a list column. Built from ``ray.data.range``
    (lazy — blocks materialize in tasks) plus ONE broadcast of the item
    list: driver-side block creation (``from_items`` / ``repartition``)
    costs ~20 ms of plasma put per block on this host, ~1 s of plan
    time per fused stage.

    Slices are ROW-balanced, not item-count-balanced: cumulative-row
    split points keep every task within ~one item of equal work, so the
    last scheduling wave is not stretched by whichever task drew the
    fattest items."""
    n_tasks = max(1, min(n_tasks, len(items)))
    rows = [max(1, int(it.get("rows", 1))) for it in items]
    total = sum(rows)
    bounds = [0]
    csum, k = 0, 1
    for i, r in enumerate(rows):
        csum += r
        while k < n_tasks and csum >= total * k / n_tasks:
            bounds.append(i + 1)
            k += 1
    bounds.append(len(items))
    groups = [items[bounds[i]:bounds[i + 1]]
              for i in range(len(bounds) - 1)]
    groups = [g for g in groups if g]  # an oversized item can skip targets
    n_tasks = len(groups)
    ref = ray.put(groups)

    def attach(b: pa.Table) -> pa.Table:
        g = ray.get(ref)
        rows = [g[i] for i in b["id"].to_pylist()]
        return pa.table({"items": pa.array(
            [[json.dumps(it) for it in row] for row in rows],
            pa.list_(pa.string()))})

    src = ray.data.range(n_tasks, override_num_blocks=n_tasks)
    return src.map_batches(attach, batch_format="pyarrow", batch_size=None)


def plan_items_from_rows(files: list[str], file_rows: dict[str, int],
                         target_rows: int = 4096,
                         row_group_size: int = 65536) -> list[dict]:
    """Plan read items from writer-recorded per-file row counts (the
    checkpoint manifests' ``file_rows`` receipts) — ZERO driver-side
    footer reads. Row-group boundaries are estimated from the writer's
    ``row_group_size``; each file's last item is open-ended
    (``rg_hi=-1``) and ``_iter_item_tables`` clamps ranges to the actual
    group count, so an estimation mismatch can never drop or duplicate
    rows. Files missing from ``file_rows`` fall back to a footer read."""
    items: list[dict] = []
    unknown: list[str] = []
    for f in files:
        rows = file_rows.get(f)
        if rows is None:
            unknown.append(f)
            continue
        if rows == 0:
            continue
        est_rg = max(1, -(-rows // row_group_size))
        rows_per_rg = max(1, rows // est_rg)
        step = max(1, target_rows // rows_per_rg)
        for lo in range(0, est_rg, step):
            hi = min(lo + step, est_rg)
            items.append({"path": f, "rg_lo": lo,
                          "rg_hi": -1 if hi >= est_rg else hi,
                          "rows": rows_per_rg * (hi - lo)})
    if unknown:
        items.extend(plan_read_items(unknown, target_rows))
    return items


def _iter_item_tables(batch: pa.Table):
    """Yield (item_dict, row-group table) for every item in a fused
    batch produced by ``item_source``. ``rg_hi`` of -1 (or past the end)
    means "to the file's last row group" — ranges are clamped against
    the actual footer, which is read HERE, in the worker. Consecutive
    items over the same file (the common case: a task's items are a
    contiguous plan slice) share one ``ParquetFile`` handle, so a
    finer-than-file item grain does not multiply footer reads."""
    import pyarrow.parquet as pq

    cur_path, pf = None, None
    for encoded in batch["items"].to_pylist():
        for s in encoded:
            it = json.loads(s)
            if it["path"] != cur_path:
                cur_path = it["path"]
                pf = pq.ParquetFile(cur_path)
            n_rg = pf.metadata.num_row_groups
            lo, hi = it["rg_lo"], it["rg_hi"]
            if hi < 0 or hi > n_rg:
                hi = n_rg
            if lo >= hi:
                continue
            yield it, pf.read_row_groups(list(range(lo, hi)))


def extract_records_fused(files: list[str], gazetteer: dict,
                          detect_cfg: DetectConfig | None = None,
                          target_rows: int = 4096,
                          writer=None) -> ray.data.Dataset:
    """Fused read+extract: each task reads its own row-group range and
    runs the detector kernel on it in-process — the decoded documents
    table never round-trips the object store, and the (read task -> map
    task) scheduling pair collapses to one task per item. Measured 12%
    faster than ``read_parquet -> map_batches`` at 32 CPUs on the 1M-doc
    bench corpus (the decoded docs are ~890 MB of plasma traffic the
    fused path never pays)."""
    gaz_ref = ray.put(gazetteer)
    key = gaz_ref.hex()
    cfg = detect_cfg
    # plan finer than the task grain, then regroup row-balanced into a
    # wave-aligned task count: file-grain items quantize to ragged final
    # waves (245 files at 32 CPUs = 7.7 waves, the last one 2/3 idle),
    # while fine items regrouped to a multiple of the CPU count pack
    # into full waves of near-equal tasks
    plan_grain = int(os.environ.get("KG_EX_PLAN_GRAIN", "0")) \
        or max(512, target_rows // 4)
    items = plan_read_items(files, plan_grain)
    if not items:
        if writer is not None:
            return ray.data.from_arrow(
                writer(RECORD_SCHEMA.empty_table()))
        return ray.data.from_arrow(RECORD_SCHEMA.empty_table())
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    total_rows = sum(it["rows"] for it in items)
    waves = max(1, round(total_rows / (target_rows * ncpu)))
    n_tasks = min(len(items), waves * ncpu)

    def read_and_extract(b: pa.Table) -> pa.Table:
        outs = [_cached_extract(key, gaz_ref, cfg, t)
                for _it, t in _iter_item_tables(b)]
        res = (pa.concat_tables(outs) if outs
               else RECORD_SCHEMA.empty_table())
        if writer is not None:
            # fused write: records go straight from the kernel to
            # partitioned parquet; only tiny receipts leave the task
            # (the corpus-scale record stream never enters plasma)
            return writer(res)
        return res

    return item_source(items, n_tasks).map_batches(
        read_and_extract, batch_format="pyarrow", batch_size=None)
