"""Benchmark: all-vs-all Forward scoring throughput on the example
workload (the reference's dominant cost: 141 HMMs x 500 queries of
hmmsearch --max; measured CPU baseline 236.2 s single-core-equivalent on
this machine, scratch oracle TIMING).

Prints ONE JSON line: queries*HMMs pairs scored per second, plus the
vs_baseline speedup over the CPU HMMER pipeline (same machine, 4 cores).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from witch_tpu.core.alignment import PackedAlignment
    from witch_tpu.core.alphabet import DNA
    from witch_tpu.core.tree import decompose_backbone
    from witch_tpu.core.alignment import subset_counts
    from witch_tpu.hmm.build import build_hmm, quantize_like_text
    from witch_tpu.hmm.bank import build_banks
    from witch_tpu.hmm.forward import forward_bits_bank
    from witch_tpu.io.fasta import read_fasta

    data = "/root/reference/examples/data"
    bb = PackedAlignment.from_fasta(data + "/backbone.aln.fasta.gz",
                                    molecule="dna")
    subsets = decompose_backbone(data + "/backbone.tre", max_size=10)
    cores = []
    for i, leaves in enumerate(subsets):
        rows, ret, _ = subset_counts(bb, leaves)
        cores.append(quantize_like_text(build_hmm(
            bb.codes[rows][:, ret], bb.alphabet, "dna", name="A_0_%d" % i)))
    banks = build_banks(cores)

    qnames, qcodes = [], []
    for n, s in read_fasta(data + "/unaligned_frag.fasta"):
        qnames.append(n)
        qcodes.append(DNA.encode(s.upper()))
    Lmax = max(len(c) for c in qcodes)
    Q = len(qcodes)
    codes = np.zeros((Q, Lmax), np.int32)
    lens = np.zeros(Q, np.int32)
    for i, c in enumerate(qcodes):
        codes[i, :len(c)] = c
        lens[i] = len(c)

    total_pairs = Q * len(cores)
    # warmup (compile)
    def run_all():
        outs = []
        for b in banks:
            args = [jnp.asarray(a) for a in
                    (b.em_odds, b.t_mm, b.t_mi, b.t_md, b.t_im, b.t_ii,
                     b.t_dm, b.t_dd, b.bm)]
            outs.append(forward_bits_bank(*args, jnp.asarray(codes),
                                          jnp.asarray(lens)))
        for o in outs:
            o.block_until_ready()
        return outs

    run_all()
    t0 = time.time()
    run_all()
    dt = time.time() - t0
    pairs_per_s = total_pairs / dt

    # CPU HMMER baseline on this exact workload: 236.2 CPU-seconds of
    # hmmsearch (perfectly parallel; assume the same 4 cores => 59.05 s
    # wall), i.e. 70500/59.05 = 1194 pairs/s.
    baseline_pairs_per_s = 70500 / (236.2 / 4)
    print(json.dumps({
        "metric": "forward_scoring_pairs_per_s",
        "value": round(pairs_per_s, 1),
        "unit": "query-HMM pairs/s (141-HMM eHMM, 500 queries)",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 2),
    }))


if __name__ == "__main__":
    main()
