"""Raw multiprocessing scaling ceiling for the EXTRACT KERNEL itself.

Runs the exact per-batch extraction kernel (kgeng/ops/extract.py) in K
plain multiprocessing workers over pre-loaded batches — no Ray, no I/O,
no object store — and reports aggregate docs/sec per K. The K_hi/K_lo
ratio is the hardware ceiling for any system running THIS kernel at
those parallelism levels on this box: frequency scaling and memory
bandwidth cap it well below linear (measured ~3.0x for 8->32 on the
bench host, i.e. 0.74 of ideal).

Usage: python scripts/extract_ceiling.py [K ...]   (default: 1 8 32)
Prints one JSON line: {"K<k>": docs_per_sec, ..., "ratio_hi_lo": r}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(corpus_dir: str, n_iters: int, out_q):
    import pyarrow.parquet as pq

    from kgeng.ops.extract import Extract, load_gazetteer_dict

    tbl = pq.read_table(os.path.join(corpus_dir, "corpus",
                                     "part-00000.parquet"))
    gaz = load_gazetteer_dict(os.path.join(corpus_dir, "gazetteer.parquet"))
    ex = Extract(gaz)
    batches = [tbl.slice(i, 4096) for i in range(0, len(tbl), 4096)]
    ex(batches[0])  # warm (regex caches, JIT-ish numpy paths)
    t0 = time.monotonic()
    docs = 0
    for _ in range(n_iters):
        for b in batches:
            ex(b)
            docs += len(b)
    out_q.put(docs / (time.monotonic() - t0))


def measure(corpus_dir: str, k: int, n_iters: int = 3) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(corpus_dir, n_iters, q))
             for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in range(k)]
    for p in procs:
        p.join()
    return sum(rates)


def main():
    from kgeng.synth.corpus import ensure_corpus

    ks = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    corpus_dir = ensure_corpus(3000)
    out = {}
    for k in ks:
        out[f"K{k}"] = round(measure(corpus_dir, k), 1)
    lo, hi = ks[-2], ks[-1]
    if len(ks) >= 2 and hi > lo:
        out["ratio_hi_lo"] = round(out[f"K{hi}"] / out[f"K{lo}"], 3)
        out["ceiling_vs_ideal"] = round(
            out["ratio_hi_lo"] / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
