"""AVX-512 lane-parallel f32 Forward pre-ranker vs the f64 oracle.

forward_targets_simd must reproduce forward_targets (the exact f64
multihit full-sequence Forward, hmmsearch pre-ranking contract —
reference witch_msa/gcmm/algorithm.py:524-537) to well under the
0.05-bit print precision; it feeds candidate RANKING only, but the
pipeline's depth heuristic compares it against GATE_SAFE so the error
budget matters.
"""

import numpy as np
import pytest


def _graft():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def toy():
    mod = _graft()
    bank, qcodes, qlens, sizes, cores = mod._toy_bank_and_queries(
        H=4, M=37, Q=23, L=64, seed=11)
    # ragged lengths (incl. very short) exercise lane extraction and
    # the sorted-group padding
    rng = np.random.default_rng(5)
    qlens = rng.integers(3, 65, size=qlens.shape).astype(qlens.dtype)
    for q, L in enumerate(qlens):
        qcodes[q, L:] = 0
    return qcodes, qlens, cores


def _margs(prof):
    return [np.ascontiguousarray(prof.msc, np.float64)] + [
        np.ascontiguousarray(getattr(prof, a), np.float64)
        for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                  "t_dm", "t_dd", "bm")]


def test_simd_matches_f64(toy):
    from witch_tpu.native import _domaindef
    from witch_tpu.hmm.profile import configure

    if not hasattr(_domaindef, "forward_targets_simd"):
        pytest.skip("extension built without forward_targets_simd")
    qcodes, qlens, cores = toy
    clist = [np.ascontiguousarray(qcodes[q, :qlens[q]], np.int32)
             for q in range(qcodes.shape[0])]
    for core in cores:
        args = _margs(configure(core, multihit=True))
        f64 = np.asarray(_domaindef.forward_targets(*args, clist, 1))
        f32 = np.asarray(_domaindef.forward_targets_simd(*args, clist, 2))
        np.testing.assert_allclose(f32, f64, atol=0.01 * np.log(2.0))


def test_flank_simd_rows_and_gate(toy):
    """flank_targets_simd rows vs the f64 oracle, and engine-output
    equality when they replace the host F+B (evaluate_targets_rows)."""
    from witch_tpu.native import _domaindef
    from witch_tpu.hmm.profile import configure
    from witch_tpu.hmm.domaindef import _posteriors_multihit

    if not hasattr(_domaindef, "flank_targets_simd"):
        pytest.skip("extension built without flank_targets_simd")
    qcodes, qlens, cores = toy
    clist = [np.ascontiguousarray(qcodes[q, :qlens[q]], np.int32)
             for q in range(qcodes.shape[0])]
    for core in cores[:2]:
        prof = configure(core, multihit=True)
        args = _margs(prof)
        fwd, mocc, ppb, ppe = _domaindef.flank_targets_simd(
            *args, clist, 2)
        for q, codes in enumerate(clist):
            L = len(codes)
            f64, ppB64, ppE64, mocc64 = _posteriors_multihit(
                prof, codes.astype(np.int64))
            assert abs(fwd[q] - f64) < 5e-3
            np.testing.assert_allclose(ppb[q, :L + 1], ppB64, atol=2e-3)
            np.testing.assert_allclose(ppe[q, :L + 1], ppE64, atol=2e-3)
            np.testing.assert_allclose(mocc[q, :L + 1], mocc64,
                                       atol=2e-3)
        full = _domaindef.evaluate_targets(*args, clist, 42, 200, 1, 1)
        rows = _domaindef.evaluate_targets_rows(
            *args, clist, 42, 200, 1, 1, mocc, ppb, ppe, 1)
        for i in range(4):
            np.testing.assert_array_equal(np.asarray(full[i]),
                                          np.asarray(rows[i]))


def test_simd_single_and_empty_batch(toy):
    from witch_tpu.native import _domaindef
    from witch_tpu.hmm.profile import configure

    if not hasattr(_domaindef, "forward_targets_simd"):
        pytest.skip("extension built without forward_targets_simd")
    qcodes, qlens, cores = toy
    args = _margs(configure(cores[0], multihit=True))
    one = [np.ascontiguousarray(qcodes[0, :qlens[0]], np.int32)]
    f64 = np.asarray(_domaindef.forward_targets(*args, one, 1))
    f32 = np.asarray(_domaindef.forward_targets_simd(*args, one, 1))
    np.testing.assert_allclose(f32, f64, atol=0.01 * np.log(2.0))
    empty = np.asarray(_domaindef.forward_targets_simd(*args, [], 1))
    assert empty.shape == (0,)
