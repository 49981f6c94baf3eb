"""Hard-kill resume: SIGKILL a pipeline subprocess mid-run, resume in a
fresh process, and require output identical to an uninterrupted run —
the checkpoint design's atomic-rename guarantee under a real crash."""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SNIPPET = """
import sys, os
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from kgeng.synth.corpus import ensure_corpus
from kgeng.pipeline import KGPipeline
d = ensure_corpus(3000)
p = KGPipeline(checkpoint_root={ckpt!r})
res = p.run(os.path.join(d, "corpus"), os.path.join(d, "gazetteer.parquet"))
print("TRIPLES", res["triples"].count(), flush=True)
ray.shutdown()
"""


def _launch(ckpt: str) -> subprocess.Popen:
    code = _RUN_SNIPPET.format(repo=REPO, ckpt=ckpt)
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)


def test_sigkill_mid_run_then_resume(tmp_path):
    from kgeng.synth.corpus import ensure_corpus

    ensure_corpus(3000)  # pre-generate so the kill lands in the pipeline
    ckpt_killed = str(tmp_path / "killed")
    proc = _launch(ckpt_killed)
    time.sleep(8)  # mid-extract/link on a 4-cpu 3000-doc run
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        killed = True
    else:
        killed = False  # finished early: resume is then trivially exercised

    # resume in a fresh process
    proc2 = _launch(ckpt_killed)
    out2, _ = proc2.communicate(timeout=300)
    assert proc2.returncode == 0, out2[-500:]
    n_resumed = int([ln for ln in out2.splitlines()
                     if ln.startswith("TRIPLES")][0].split()[1])

    # uninterrupted reference run
    ckpt_fresh = str(tmp_path / "fresh")
    proc3 = _launch(ckpt_fresh)
    out3, _ = proc3.communicate(timeout=300)
    assert proc3.returncode == 0
    n_fresh = int([ln for ln in out3.splitlines()
                   if ln.startswith("TRIPLES")][0].split()[1])

    assert n_resumed == n_fresh, (killed, n_resumed, n_fresh)
    # no half-written checkpoint dirs survive (atomic rename)
    for root, dirs, _files in os.walk(ckpt_killed):
        for d in dirs:
            assert not d.endswith(".tmp"), os.path.join(root, d)
