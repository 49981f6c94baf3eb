"""Loop-safe ``materialize()`` for iterative Dataset algorithms.

Ray Data's ``Dataset.materialize()`` truncates the *data* lineage (the
returned ``MaterializedDataset`` reads from pinned blocks) but carries
the full ``DatasetStats`` object forward, and every subsequent
execution chains its stats to its inputs' via ``DatasetStats.parents``.
At the end of EVERY execution the streaming executor renders
``stats.to_summary().to_string()`` (streaming_executor.py:258), which
recurses over ``parents`` with no memoization (stats.py:1016-1017).

For an iterative algorithm that joins two materialized datasets per
round (state x edges), the ancestry DAG therefore has O(2^rounds)
*paths*, and the per-round summary render grows exponentially: measured
on plan-B SCC (5k nodes / 20k edges, 64 materializations) the rounds
ran 2 s -> 98 s and the job took 524 s; with the ancestry severed the
same job runs 116 s with flat per-round cost.

``mat(ds)`` = ``ds.materialize()`` + sever the cross-execution
ancestry on the RESULT's stats. The materialized dataset keeps its own
execution's per-operator stats (``ds.stats()`` still reports the run
that produced it); only the chain to *earlier* executions is dropped,
which is exactly what a fixpoint loop wants. Use it for every
``materialize()`` inside a loop whose output feeds the next round.
"""

from __future__ import annotations

import ray.data


def mat(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize ``ds`` and sever its stats ancestry (see module doc)."""
    out = ds.materialize()
    try:
        out._plan.stats().parents = []
    except Exception:
        pass  # private-API drift: lose the optimization, not the run
    return out
