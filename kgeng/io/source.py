"""Document sources.

``read_documents`` is the format seam required by SURVEY.md: the north rule
asks for Lance fragment streaming, but this sandbox has no network and no
``pylance`` wheel, so Lance is import-guarded and Parquet is the tested
implementation. Both return the same ``ray.data.Dataset`` of
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)`` blocks
(zero-copy Arrow), so every downstream stage is format-agnostic.

Scale posture: pass ``columns`` so only needed columns leave storage;
``override_num_blocks`` (or Ray's default file-splitting) controls the
partition count that all downstream `map_batches` stages inherit.
"""

from __future__ import annotations

import ray.data

try:  # pragma: no cover - not installable in this sandbox (no network)
    import lance  # type: ignore

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def read_documents(
    path: str,
    format: str = "parquet",
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Stream a documents table as a Dataset of Arrow blocks.

    The reference streams files in 10k-line bulks (``general.py:139-155``);
    here blocks play the bulk role and the streaming executor owns
    backpressure.
    """
    if format == "parquet":
        return ray.data.read_parquet(
            path, columns=columns, override_num_blocks=override_num_blocks
        )
    if format == "jsonl":
        # newline-delimited JSON (the interchange format most raw text
        # dumps arrive in); Ray's read_json handles .jsonl/.json lines
        # and file-splits like the parquet path. Column pruning happens
        # post-parse (JSON has no column projection — convert to
        # parquet for the hot path; this reader is the on-ramp).
        ds = ray.data.read_json(
            path, override_num_blocks=override_num_blocks)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if format == "lance":
        if not _HAVE_LANCE:
            raise NotImplementedError(
                "pylance is not installed in this environment (no network); "
                "use format='parquet'. The seam exists so a Lance deployment "
                "only swaps this reader."
            )
        return ray.data.read_lance(
            path, columns=columns,
            override_num_blocks=override_num_blocks)
    raise ValueError(f"unknown format: {format!r}")


def wrap_flat_documents(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Adapt a flat text table (e.g. the driver's ``documents.parquet``:
    doc_id:int64, text) into the engine's interleaved span schema — one
    text span per document. Lets every KG stage run over plain text
    corpora unchanged."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def wrap(t: pa.Table) -> pa.Table:
        from kgeng.synth.corpus import SPAN_TYPE

        # all-Arrow list<struct> construction: one struct child per
        # field + offsets [0, 1, 2, ...] (one span per doc) — this
        # on-ramp touches every corpus row, so no Python row objects
        n = len(t)
        texts = pc.cast(t[text_col], SPAN_TYPE.field("text").type) \
            .combine_chunks()
        kind = pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(n, np.int32)),
            pa.array(["text"])).cast(SPAN_TYPE.field("kind").type)
        media = pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(n, np.int32)),
            pa.array([""])).cast(SPAN_TYPE.field("media_ref").type)
        offset = pa.array(np.zeros(n, np.int32),
                          SPAN_TYPE.field("offset").type)
        structs = pa.StructArray.from_arrays(
            [kind, texts, media, offset],
            fields=list(SPAN_TYPE))
        spans = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32)), structs)
        return pa.table({
            "doc_id": pc.cast(t[id_col], pa.string()),
            "spans": spans,
        })

    return ds.map_batches(wrap, batch_format="pyarrow")
