"""Shared bench tier: the pipeline's exact single-program scoring call
timed on whatever backend the calling process owns.

Used from two places:
  * bench.py (repo root) — the driver's headline metric, fresh process;
  * server.serve — a `{"kind": "bench"}` job, so a resident daemon that
    already holds the accelerator session (and its warm programs) can
    produce the TPU timing without a second process fighting it for the
    remote session (observed: fresh-process probes serialize behind the
    daemon's session on the degraded accelerator server and can stall
    for minutes; reference contract being measured is the all-vs-all
    `hmmsearch --max` farm, witch_msa/gcmm/algorithm.py:524-537).
"""

from __future__ import annotations

import os
import sys
import time


def tpu_tier(assets_path: str, reps: int = 3, QT: int = 128) -> dict:
    """Time the full-grid Forward scoring (all banks, one canonical
    program shape per bank) on the current JAX default backend.

    Returns {"dt": seconds per full grid, "padded_cells": int,
             "total_pairs": int, "true_cells": int, "backend": str,
             "warm_s": seconds spent in the warming call}.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = os.path.join(here, "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    from make_bench_assets import load_banks

    from .ops.pallas_forward import (bank_to_pallas_arrays, canonical_pad,
                                     effective_n_dbl, pallas_forward_nats)

    banks, z = load_banks(assets_path)
    codes, lens = z["codes"], z["lens"]
    true_states = int(z["true_states"])
    Q = len(lens)
    H = sum(b.H for b in banks)
    Qpad, Lpad = canonical_pad(Q, int(lens.max()), QT)
    cp = np.full((Qpad, Lpad), 4, np.int32)
    for qi in range(Q):
        cp[qi, :lens[qi]] = codes[qi, :lens[qi]]
    lp = np.ones(Qpad, np.int32)
    lp[:Q] = lens
    devbanks = []
    padded = 0
    for b in banks:
        emT, trans = bank_to_pallas_arrays(b)
        devbanks.append((jnp.asarray(emT), jnp.asarray(trans),
                         effective_n_dbl(trans)))
        padded += Qpad * Lpad * emT.shape[2] * b.H
    cpj, lpj = jnp.asarray(cp), jnp.asarray(lp)

    def run():
        tot = jnp.zeros((), jnp.float32)
        for emTj, transj, ndbl in devbanks:
            tot = tot + pallas_forward_nats(
                emTj, transj, cpj, lpj, QT=QT, n_dbl=ndbl).sum()
        return tot

    # warm (compile/load); then time with host-side sync via np.asarray
    # (block_until_ready is async-unsafe on the remote-tunnel platform)
    t0 = time.time()
    _ = float(np.asarray(run()))
    warm_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        _ = float(np.asarray(run()))
    dt = (time.time() - t0) / reps
    return {
        "dt": dt,
        "padded_cells": padded,
        "total_pairs": Q * H,
        "true_cells": int(lens.sum()) * true_states,
        "backend": jax.default_backend(),
        "warm_s": round(warm_s, 2),
    }
