"""Vectorized smart-graph key / ``_id`` formatting.

Byte-compatible with the reference's formatters, but as Arrow kernels over
whole columns instead of per-row f-strings:

- plain ``_id``:  ``f"{vcoll}/{idx}"``            (vertices_generator.py:159-160)
- smart ``_id``:  ``f"{vcoll}/{smart}:{idx}"``    (vertices_generator.py:153-157)
- smart ``_key``: ``f"{vid}:{vid}"``              (graphalytics_importer.py:87,93)
- smart_attr == 'part' ``_key``: ``f"{part}:{vid}"`` (vertices_generator.py:30)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _as_str(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    return pc.cast(arr, pa.string())


def idx_to_vertex(vcoll: str, idx) -> pa.Array:
    """Column of plain ``_id`` strings ``<vcoll>/<idx>``."""
    idx = _as_str(idx)
    return pc.binary_join_element_wise(
        pa.scalar(f"{vcoll}/"), idx, "")


def idx_to_smart_vertex(vcoll: str, idx, smart_value=None) -> pa.Array:
    """Column of smart ``_id`` strings ``<vcoll>/<smart>:<idx>``; when
    ``smart_value`` is None the id doubles as the smart value (the
    graphalytics-import convention)."""
    idx = _as_str(idx)
    smart = _as_str(smart_value) if smart_value is not None else idx
    return pc.binary_join_element_wise(
        pa.scalar(f"{vcoll}/"), smart, pa.scalar(":"), idx, "")


def smart_key(idx, smart_value=None) -> pa.Array:
    """Column of smart ``_key`` strings ``<smart>:<idx>`` (default
    ``<idx>:<idx>``)."""
    idx = _as_str(idx)
    smart = _as_str(smart_value) if smart_value is not None else idx
    return pc.binary_join_element_wise(smart, pa.scalar(":"), idx, "")
