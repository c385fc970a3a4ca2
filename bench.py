"""Benchmark: all-vs-all Forward scoring throughput on the example
workload (the reference's dominant cost: 141 HMMs x 500 queries of
`hmmsearch --max`; measured CPU baseline on this machine: 236.2 CPU-seconds
of hmmsearch, i.e. 59.05 s on the 4 cores = 1194 pairs/s).

Prints ONE JSON line. Timing uses a jitted scalar reduction so the
(slow) device->host tunnel transfer is excluded and the device is truly
synchronized (block_until_ready is async-unsafe on this platform).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass
    import jax.numpy as jnp

    from witch_tpu.core.alignment import PackedAlignment, subset_counts
    from witch_tpu.core.alphabet import DNA
    from witch_tpu.core.tree import decompose_backbone
    from witch_tpu.hmm.build import build_hmm, quantize_like_text
    from witch_tpu.hmm.bank import build_banks
    from witch_tpu.io.fasta import read_fasta

    data = "/root/reference/examples/data"
    bb = PackedAlignment.from_fasta(data + "/backbone.aln.fasta.gz",
                                    molecule="dna")
    subsets = decompose_backbone(data + "/backbone.tre", max_size=10)
    cores = []
    true_states = 0
    for i, leaves in enumerate(subsets):
        rows, ret, _ = subset_counts(bb, leaves)
        core = quantize_like_text(build_hmm(
            bb.codes[rows][:, ret], bb.alphabet, "dna", name="A_0_%d" % i))
        cores.append(core)
        true_states += core.M
    banks = build_banks(cores, indices=list(range(len(cores))),
                        uniform=True, n_buckets=2)

    qcodes = [DNA.encode(s.upper())
              for _, s in read_fasta(data + "/unaligned_frag.fasta")]
    Q = len(qcodes)
    Lmax = max(len(c) for c in qcodes)
    codes = np.zeros((Q, Lmax), np.int32)
    lens = np.zeros(Q, np.int32)
    for i, c in enumerate(qcodes):
        codes[i, :len(c)] = c
        lens[i] = len(c)

    H = sum(b.H for b in banks)
    total_pairs = Q * H
    true_cells = int(lens.sum()) * true_states

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from witch_tpu.ops.pallas_forward import (bank_to_pallas_arrays,
                                                  pallas_forward_nats)
        QT = 128
        # length-grouped query blocks: sort by length, pad each QT-group
        # only to its own length (rounded to 64) — most of the padded-row
        # waste of a single global Lmax pad disappears
        order = np.argsort(lens, kind="stable")
        groups = []
        for s in range(0, Q, QT):
            idx = order[s:s + QT]
            Lg = int(lens[idx].max())
            Lpad = max(64, -(-Lg // 64) * 64)
            cp = np.full((QT, Lpad), 4, np.int32)  # gap-coded padding
            for t, qi in enumerate(idx):
                cp[t, :lens[qi]] = codes[qi, :lens[qi]]
            lp = np.ones(QT, np.int32)
            lp[:len(idx)] = lens[idx]
            groups.append((jnp.asarray(cp), jnp.asarray(lp), Lpad))
        devbanks = []
        padded_cells = 0
        for b in banks:
            emT, trans = bank_to_pallas_arrays(b)
            devbanks.append((jnp.asarray(emT), jnp.asarray(trans)))
            padded_cells += sum(QT * g[2] for g in groups) * \
                (emT.shape[2]) * b.H

        def run(gs):
            tot = jnp.float32(0.0)
            for emTj, transj in devbanks:
                for cpj, lpj, _ in gs:
                    tot += pallas_forward_nats(emTj, transj, cpj, lpj,
                                               QT=QT).sum()
            return tot
        f = jax.jit(run)
        _ = np.asarray(f(groups))                  # compile + warm
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            _ = np.asarray(f(groups))
        dt = (time.time() - t0) / reps
    else:
        from witch_tpu.hmm.forward import score_bank
        for b in banks:
            _ = score_bank(b, codes, lens, backend="xla")
        t0 = time.time()
        padded_cells = 0
        for b in banks:
            _ = score_bank(b, codes, lens, backend="xla")
            padded_cells += Q * Lmax * b.H * (b.M_max + 1)
        dt = time.time() - t0

    pairs_per_s = total_pairs / dt
    baseline_pairs_per_s = 70500 / (236.2 / 4)
    print(json.dumps({
        "metric": "forward_scoring_pairs_per_s",
        "value": round(pairs_per_s, 1),
        "unit": "query-HMM pairs/s (141-HMM eHMM x 500 queries, 1 chip)",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 2),
        "gcups_true": round(true_cells / dt / 1e9, 2),
        "gcups_padded": round(padded_cells / dt / 1e9, 2),
        "seconds_per_full_grid": round(dt, 3),
        "backend": "pallas-tpu" if on_tpu else "xla",
    }))


if __name__ == "__main__":
    main()
