"""Fuzz the extract kernel's fast paths against their reference paths:
the megastring scan (one finditer per pattern, searchsorted mapping)
must emit byte-identical records to per-span scanning, and the Arrow
prefilter must never skip a span the full scan would match — including
texts with embedded newlines, unicode, and boundary punctuation."""

import numpy as np
import pyarrow as pa

from kgeng.ops.extract import Extract
from kgeng.synth.corpus import SPAN_TYPE


def _random_docs(rng, n_docs: int) -> pa.Table:
    words = ["alpha", "beta", "Gamma", "Delta", "Acme", "Corp", "x",
             "Bob", "Smith", "mail@test.io", "ABC-42", "2024-01-02",
             "über", "naïve", ",", ".", "--", "(ok)"]
    caps = ["Ada Lovelace", "Acme Corp", "New York City", "Bob Smith"]
    preds = [" works at ", " is located in ", " lives in "]
    rows = []
    for d in range(n_docs):
        spans = []
        offset = 0
        for s in range(int(rng.integers(1, 6))):
            if rng.random() < 0.2:
                spans.append({"kind": "image", "text": "",
                              "media_ref": f"media://f{d}-{s}",
                              "offset": offset})
                offset += 1
                continue
            toks = list(rng.choice(words, size=int(rng.integers(2, 12))))
            if rng.random() < 0.6:
                toks.insert(int(rng.integers(0, len(toks))),
                            str(rng.choice(caps)))
            if rng.random() < 0.4:
                toks.insert(int(rng.integers(0, len(toks))),
                            str(rng.choice(caps))
                            + str(rng.choice(preds))
                            + str(rng.choice(caps)))
            text = " ".join(toks)
            if rng.random() < 0.3:  # embedded newline mid-text
                cut = int(rng.integers(0, len(text)))
                text = text[:cut] + "\n" + text[cut:]
            spans.append({"kind": "text", "text": text,
                          "media_ref": "", "offset": offset})
            offset += len(text) + 1
        rows.append({"doc_id": f"fz-{d:04d}", "spans": spans})
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "spans": pa.array([r["spans"] for r in rows],
                          pa.list_(SPAN_TYPE)),
    })


def _rows(t: pa.Table) -> set:
    return set(zip(*[t[c].to_pylist() for c in t.column_names]))


def test_megastring_equals_per_span_scan():
    gaz = {"Ada Lovelace": ("E1", "PERSON"), "Acme Corp": ("E2", "ORG"),
           "New York City": ("E3", "LOC")}
    rng = np.random.default_rng(77)
    batch = _random_docs(rng, 300)

    fast = Extract(gaz)
    assert fast.mega_ok and fast.prefilter is not None
    slow = Extract(gaz)
    slow.mega_ok = False      # force per-span reference scanning
    slow.prefilter = None     # and no Arrow prefilter

    assert _rows(fast(batch)) == _rows(slow(batch))


def test_prefilter_only_differs_in_skipping_nothing():
    gaz = {"Bob Smith": ("E9", "PERSON")}
    rng = np.random.default_rng(123)
    batch = _random_docs(rng, 200)
    with_pf = Extract(gaz)
    no_pf = Extract(gaz)
    no_pf.prefilter = None
    assert _rows(with_pf(batch)) == _rows(no_pf(batch))
