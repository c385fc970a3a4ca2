"""Device null2/envelope gate vs the native host engine.

The pallas kernel (ops/pallas_null2.py) runs in interpret mode on CPU;
the oracle is the native engine's evaluate_targets_rows on identical
flank rows (the same comparison the TPU production path relies on,
pipeline.compute_scores use_dev_gate)."""

import os

import numpy as np
import pytest

from witch_tpu.core.alphabet import DNA
from witch_tpu.hmm.bank import build_banks
from witch_tpu.hmm.build import build_hmm, quantize_like_text
from witch_tpu.hmm.profile import configure

try:
    from witch_tpu.native import _domaindef
except ImportError:     # pragma: no cover
    _domaindef = None

LETTERS = np.array(list("ACGT"))


def synth_core(M, n, seed):
    r = np.random.default_rng(seed)
    base = r.integers(0, 4, M)
    rows = []
    for _ in range(n):
        s = base.copy()
        mut = r.random(M) < 0.15
        s[mut] = r.integers(0, 4, mut.sum())
        rows.append(DNA.encode("".join(LETTERS[s])))
    return quantize_like_text(build_hmm(np.array(rows), DNA, "dna"))


def margs(p):
    return [np.ascontiguousarray(p.msc, np.float64)] + [
        np.ascontiguousarray(getattr(p, a), np.float64)
        for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                  "t_dm", "t_dd", "bm")]


def run_case(cores, queries):
    bank = build_banks(cores, uniform=True, n_buckets=1)[0]
    clist = [np.ascontiguousarray(c, np.int32) for c in queries]
    allargs = {j: margs(configure(c, multihit=True))
               for j, c in enumerate(cores)}
    by_j = {j: list(range(len(clist))) for j in range(len(cores))}
    flank_rows = {}
    oracle = {}
    for j in by_j:
        _, mo, pb, pe = _domaindef.flank_targets_simd(
            *allargs[j], clist, 1)
        flank_rows[j] = (mo, pb, pe)
        oracle[j] = _domaindef.evaluate_targets_rows(
            *allargs[j], clist, 42, 200, 1, 0, mo, pb, pe, 1)
    from witch_tpu.hmm.gate_device import evaluate_gate_device
    results, stats = evaluate_gate_device(
        [bank], {j: (0, j) for j in by_j}, allargs, queries, by_j,
        flank_rows, interpret=True, nthreads=2)
    for j in by_j:
        onreg, onenv, osb, _, osenv, osbs, old = oracle[j]
        dnreg, dnenv, dsb, _, dsenv, dsbs, dld = results[j]
        for t in range(len(clist)):
            # gate integers exact (regions come from the same rows)
            assert onreg[t] == dnreg[t], (j, t)
            assert onenv[t] == dnenv[t], (j, t)
            assert old[t] == dld[t], (j, t)
            # f32 kernel vs f64 engine: within the print guard band
            assert abs(osb[t] - dsb[t]) < 2e-3, (j, t, osb[t], dsb[t])
            assert abs(osenv[t] - dsenv[t]) < 2e-3, (j, t)
            assert abs(osbs[t] - dsbs[t]) < 5e-3, (j, t)
    return stats


@pytest.mark.skipif(_domaindef is None or not hasattr(
    _domaindef, "flank_targets_simd"),
    reason="native AVX-512 engine unavailable")
def test_device_gate_matches_host_small():
    cores = [synth_core(36, 10, 1)]
    r = np.random.default_rng(5)
    queries = []
    for seed in range(4):
        rr = np.random.default_rng(300 + seed)
        L = int(rr.integers(24, 56))
        queries.append(DNA.encode("".join(
            LETTERS[rr.integers(0, 4, L)])))
    # two homologous fragments (real regions/envelopes exercised)
    base = r.integers(0, 4, 36)
    for seed in range(2):
        rr = np.random.default_rng(400 + seed)
        s = base.copy()
        mut = rr.random(36) < 0.1
        s[mut] = rr.integers(0, 4, mut.sum())
        queries.append(DNA.encode("".join(LETTERS[s])))
    stats = run_case(cores, queries)
    assert stats["entries"] >= 1       # device path actually exercised


@pytest.mark.skipif(
    _domaindef is None
    or not hasattr(_domaindef, "flank_targets_simd")
    or not os.environ.get("WITCH_TPU_GOLDEN"),
    reason="slow interpret tier (set WITCH_TPU_GOLDEN)")
def test_device_gate_matches_host_multi_model():
    cores = [synth_core(40, 10, 1), synth_core(55, 12, 2),
             synth_core(30, 8, 3)]
    queries = []
    for seed in range(6):
        rr = np.random.default_rng(100 + seed)
        L = int(rr.integers(25, 60))
        queries.append(DNA.encode("".join(
            LETTERS[rr.integers(0, 4, L)])))
    for seed in range(6):
        rr = np.random.default_rng(200 + seed)
        M = [40, 55, 30][seed % 3]
        base = np.random.default_rng(seed % 3 + 1).integers(0, 4, M)
        s = base.copy()
        mut = rr.random(M) < 0.1
        s[mut] = rr.integers(0, 4, mut.sum())
        queries.append(DNA.encode("".join(LETTERS[s])))
    run_case(cores, queries)
