"""Serving mode: a resident worker runs queued jobs in-process (keeps
compiled programs warm across jobs; no reference equivalent — the
reference is subprocess-per-job throughout)."""

import json
import os
import threading

import numpy as np

from witch_tpu.io.fasta import write_fasta
from witch_tpu import server


def _tiny(tmp_path):
    rng = np.random.default_rng(3)
    letters = np.array(list("ACGT"))
    base = letters[rng.integers(0, 4, 80)]
    rows = []
    for i in range(12):
        s = base.copy()
        mut = rng.random(80) < 0.1
        s[mut] = letters[rng.integers(0, 4, mut.sum())]
        rows.append((f"t{i}", "".join(s)))
    bb = tmp_path / "bb.fasta"
    write_fasta(rows, str(bb))
    qs = [(f"q{i}", rows[i][1][10:60]) for i in range(3)]
    q = tmp_path / "q.fasta"
    write_fasta(qs, str(q))
    return bb, q


def test_serve_and_submit(tmp_path):
    bb, q = _tiny(tmp_path)
    jobs = str(tmp_path / "jobs")
    t = threading.Thread(target=server.serve, args=(jobs,),
                         kwargs=dict(poll_s=0.1, max_idle_s=30.0),
                         daemon=True)
    t.start()
    res = server.submit(jobs, [
        "-b", str(bb), "-q", str(q), "-d", str(tmp_path / "out"),
        "-o", "aligned.fasta"], timeout_s=280, poll_s=0.1)
    assert res["ok"], res
    assert os.path.exists(res["output"])
    # second job reuses the resident process
    res2 = server.submit(jobs, [
        "-b", str(bb), "-q", str(q), "-d", str(tmp_path / "out2"),
        "-o", "aligned.fasta"], timeout_s=280, poll_s=0.1)
    assert res2["ok"], res2
    # markers present
    dones = [f for f in os.listdir(jobs) if f.endswith(".done")]
    assert len(dones) == 2
    for d in dones:
        with open(os.path.join(jobs, d)) as f:
            assert json.load(f)["ok"]
