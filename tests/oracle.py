"""Pure-Python oracle of the reference importer's semantics (SURVEY.md §5.1).

An independent, line-for-line faithful re-expression of the reference's
parse/projection/dedup behavior against an in-memory sink — used to check
the Ray pipelines' outputs exactly. Citations refer to
/root/reference/<file>:<lines>; the logic is re-implemented, not copied.
"""

from __future__ import annotations


def file_lines(path: str, strip: bool = True) -> list[str]:
    """general.py:139-155 — stripped lines, streamed in bulks (bulking is
    irrelevant to the final document set, so the oracle flattens it)."""
    with open(path) as f:
        return [ln.strip() for ln in f.readlines()]


def idx_to_vertex(vcoll: str, idx) -> str:
    """vertices_generator.py:159-160."""
    return f"{vcoll}/{idx}"


def idx_to_smart_vertex(vcoll: str, idx, smart_value=None) -> str:
    """vertices_generator.py:153-157."""
    if smart_value:
        return f"{vcoll}/{smart_value}:{idx}"
    return f"{vcoll}/{idx}:{idx}"


def parse_edge_lines(lines: list[str], vcoll: str, smart: bool):
    """edge_list.py:22-40 / graphalytics_importer.py:112-124.

    Returns (edge_docs, vertex_id_set). Comment chars '#', '/', '%' on the
    FIRST character only; split(' ', 2); weight kept verbatim as a string
    and ABSENT (not None) when the line has two fields.
    """
    to_v = (lambda x: idx_to_smart_vertex(vcoll, x)) if smart else \
        (lambda x: idx_to_vertex(vcoll, x))
    edges, vertex_ids = [], set()
    for line in lines:
        if not line:
            continue
        if line[0] in ("#", "/", "%"):
            continue
        e = line.split(" ", 2)
        if len(e) == 2:
            f, t = e
            edges.append({"_from": to_v(f), "_to": to_v(t)})
        else:
            f, t, w = e
            edges.append({"_from": to_v(f), "_to": to_v(t), "weight": f"{w}"})
        vertex_ids.add(f)
        vertex_ids.add(t)
    return edges, vertex_ids


def graphalytics_vertex_docs(lines: list[str], smart_attribute: str):
    """graphalytics_importer.py:87,93."""
    return [{f"{smart_attribute}": str(v), "_key": str(v) + ":" + str(v)}
            for v in lines if v]


def dedup_insert_vertex_docs(vertex_ids, smart_attribute: str):
    """vertices_generator.py:123-146 (J1) — the net effect of the per-bulk
    anti-join: each distinct id inserted once as {smart_attribute: id}."""
    return [{smart_attribute: v} for v in sorted(set(vertex_ids))]


def prepare_vertex_doc(vid: int, is_smart: bool, smart_attribute: str,
                       part_label: str = "") -> dict:
    """vertices_generator.py:24-41 — the three layout branches (the random
    additional attribute is omitted: outputs are random either way)."""
    if is_smart:
        if smart_attribute != "part":
            doc = {f"{smart_attribute}": str(vid), "_key": f"{vid}:{vid}"}
            if part_label != "":
                doc["part"] = part_label
        else:
            doc = {"_key": f"{part_label}:{vid}", "part": f"{part_label}"}
    else:
        doc = {"_key": str(vid)}
        if part_label != "":
            doc["part"] = part_label
    return doc


def clique_edges(n: int, vcoll: str, smart: bool,
                 start: int = 0) -> list[dict]:
    """clique_generator.py:59-97 (E1) with prob_missing=0 — the
    deterministic all-pairs i<j fan-out."""
    to_v = (lambda x: idx_to_smart_vertex(vcoll, x)) if smart else \
        (lambda x: idx_to_vertex(vcoll, x))
    return [{"_from": to_v(i), "_to": to_v(j)}
            for i in range(start, start + n)
            for j in range(i + 1, start + n)]


def k_partite_edges(part_sizes: list[int], vcoll: str,
                    smart: bool) -> list[dict]:
    """edges_generator.py:99-180 (E2) with all-missing probs = 0: all
    vertex pairs between distinct parts c1 < c2. (The reference's k-partite
    entry point is broken — k_partite_generator.py:39 arity bug — so this
    encodes the documented intent, not the crash.)"""
    to_v = (lambda x: idx_to_smart_vertex(vcoll, x)) if smart else \
        (lambda x: idx_to_vertex(vcoll, x))
    starts = [0]
    for s in part_sizes:
        starts.append(starts[-1] + s)
    edges = []
    for c1 in range(len(part_sizes)):
        for c2 in range(c1 + 1, len(part_sizes)):
            for i in range(starts[c1], starts[c1 + 1]):
                for j in range(starts[c2], starts[c2 + 1]):
                    edges.append({"_from": to_v(i), "_to": to_v(j)})
    return edges
