"""evaluate_targets_rows (native) vs the monolithic evaluate_targets.

The rows variant consumes caller-provided flank posterior rows (the
device kernel's output) and must reproduce the full evaluation
bit-for-bit when fed the f64 host rows, and through the device f32
rows on real data.
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
        H=3, M=24, Q=8, L=48, seed=11)
    return bank, qcodes, qlens, cores


def _margs(prof):
    return [np.ascontiguousarray(prof.msc, np.float64)] + \
        [np.ascontiguousarray(getattr(prof, a), np.float64)
         for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                   "t_dm", "t_dd", "bm")]


def test_rows_variant_bitexact_with_f64_rows(toy):
    from witch_tpu.hmm.domaindef import _posteriors_multihit
    from witch_tpu.hmm.profile import configure
    from witch_tpu.native import _domaindef

    bank, qcodes, qlens, cores = toy
    Q = qcodes.shape[0]
    for core in cores:
        prof = configure(core, multihit=True)
        args = _margs(prof)
        codes_list = [np.ascontiguousarray(qcodes[q, :qlens[q]],
                                           np.int32) for q in range(Q)]
        ref = _domaindef.evaluate_targets(*args, codes_list, 42, 200,
                                          1, 1)
        Lp1 = int(qlens.max()) + 1
        mocc = np.zeros((Q, Lp1), np.float32)
        ppB = np.zeros((Q, Lp1), np.float32)
        ppE = np.zeros((Q, Lp1), np.float32)
        for q in range(Q):
            L = int(qlens[q])
            _, b64, e64, m64 = _posteriors_multihit(
                prof, qcodes[q, :L].astype(np.int64))
            mocc[q, :L + 1] = m64
            ppB[q, :L + 1] = b64
            ppE[q, :L + 1] = e64
        got = _domaindef.evaluate_targets_rows(
            *args, codes_list, 42, 200, 1, 1, mocc, ppB, ppE, 1)
        for r, g, name in zip(ref, got, ("nreg", "nenv", "bias", "fwd",
                                         "senv", "sbias", "ld")):
            # rows from the f64 oracle decode are float32-quantized on
            # input; regions/envelopes and every score must agree
            np.testing.assert_allclose(g, r, rtol=0, atol=1e-9,
                                       err_msg=name)


def test_rows_variant_through_device_rows(toy):
    from witch_tpu.hmm.flank_device import flank_rows_bank
    from witch_tpu.hmm.profile import configure
    from witch_tpu.native import _domaindef

    bank, qcodes, qlens, cores = toy
    Q = qcodes.shape[0]
    _, ppB, ppE, mocc = [np.asarray(x) for x in flank_rows_bank(
        bank.em_odds, bank.t_mm, bank.t_mi, bank.t_md, bank.t_im,
        bank.t_ii, bank.t_dm, bank.t_dd, bank.bm,
        qcodes.astype(np.int32), qlens.astype(np.int32))]
    for h, core in enumerate(cores):
        prof = configure(core, multihit=True)
        args = _margs(prof)
        codes_list = [np.ascontiguousarray(qcodes[q, :qlens[q]],
                                           np.int32) for q in range(Q)]
        ref = _domaindef.evaluate_targets(*args, codes_list, 42, 200,
                                          1, 1)
        got = _domaindef.evaluate_targets_rows(
            *args, codes_list, 42, 200, 1, 1,
            np.ascontiguousarray(mocc[:, h]),
            np.ascontiguousarray(ppB[:, h]),
            np.ascontiguousarray(ppE[:, h]), 1)
        # gate results identical through the f32 device rows on this
        # data; f64 Forward is recomputed so scores are exact
        np.testing.assert_array_equal(got[0], ref[0])   # nregions
        np.testing.assert_array_equal(got[1], ref[1])   # nenvelopes
        np.testing.assert_allclose(got[3], ref[3], atol=1e-12)  # fwd
        np.testing.assert_allclose(got[2], ref[2], atol=5e-4)   # bias
