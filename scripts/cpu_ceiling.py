"""Measure this host's raw 8->32-process CPU scaling ceiling.

CPU frequency scaling / host contention means N->4N processes on this box
never reach a 4x speedup even for embarrassingly-parallel pure-CPU work;
this microbenchmark (multiprocessing + the same regex kernel family the
extract stage uses) measures that ceiling so pipeline scaling efficiency
can be judged against what the hardware permits. Prints the ceiling
(speedup/4) as the last line.
"""

import multiprocessing as mp
import re
import time

RX = re.compile(r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b")
TXT = ("Reportedly, Alice Umber works for Acme Systems. "
       "The deadline is 2024-05-17. ") * 20


def work(n):
    c = 0
    for _ in range(n):
        c += len(RX.findall(TXT))
    return c


def run(nproc, iters=3000):
    t0 = time.time()
    with mp.Pool(nproc) as p:
        p.map(work, [iters] * nproc * 4)
    return (iters * nproc * 4) / (time.time() - t0)


if __name__ == "__main__":
    t8, t32 = run(8), run(32)
    print(f"units/s at 8 procs: {t8:.0f}; at 32 procs: {t32:.0f}")
    print(round(t32 / t8 / 4, 3))
