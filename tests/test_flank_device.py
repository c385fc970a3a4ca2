"""Device flank-posterior rows vs the f64 host oracle.

The batched Forward+Backward special-row scans (hmm/flank_device.py)
must reproduce hmm/domaindef.py:_posteriors_multihit — the rows the
reporting gate's region detection consumes — and the three-way gate
prefilter must classify pairs consistently with the host
find_regions/region_split_mass semantics.
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
    # longer queries than the default toy so flanks/regions are
    # non-trivial; ragged lengths exercise the padding masks
    bank, qcodes, qlens, sizes, cores = mod._toy_bank_and_queries(
        H=3, M=24, Q=6, L=40, seed=3)
    rng = np.random.default_rng(7)
    qlens = qlens.copy()
    qlens[1] = 23
    qlens[4] = 31
    for q, L in enumerate(qlens):
        qcodes[q, L:] = 0
    return bank, qcodes, qlens, cores


def test_flank_rows_match_f64_oracle(toy):
    from witch_tpu.hmm.domaindef import _posteriors_multihit
    from witch_tpu.hmm.flank_device import flank_rows_bank
    from witch_tpu.hmm.profile import configure

    bank, qcodes, qlens, cores = toy
    fwd, ppB, ppE, mocc = [np.asarray(x) for x in flank_rows_bank(
        bank.em_odds, bank.t_mm, bank.t_mi, bank.t_md, bank.t_im,
        bank.t_ii, bank.t_dm, bank.t_dd, bank.bm,
        qcodes.astype(np.int32), qlens.astype(np.int32))]
    for h, core in enumerate(cores):
        prof = configure(core, multihit=True)
        for q in range(qcodes.shape[0]):
            L = int(qlens[q])
            codes = qcodes[q, :L].astype(np.int64)
            f64, ppB64, ppE64, mocc64 = _posteriors_multihit(prof,
                                                             codes)
            assert abs(fwd[q, h] - f64) < 5e-3, (q, h)
            np.testing.assert_allclose(ppB[q, h, :L + 1], ppB64,
                                       atol=2e-3)
            np.testing.assert_allclose(ppE[q, h, :L + 1], ppE64,
                                       atol=2e-3)
            np.testing.assert_allclose(mocc[q, h, :L + 1], mocc64,
                                       atol=2e-3)
            # padded tail zeroed
            assert not ppB[q, h, L + 1:].any()
            assert not mocc[q, h, L + 1:].any()


def test_gate_prefilter_matches_host_semantics(toy):
    from witch_tpu.hmm.domaindef import (_posteriors_multihit,
                                         find_regions)
    from witch_tpu.hmm.flank_device import RT3, flank_rows_bank, \
        gate_prefilter
    from witch_tpu.hmm.profile import configure
    from witch_tpu.hmm.trace_ensemble import region_split_mass

    bank, qcodes, qlens, cores = toy
    _, ppB, ppE, mocc = [np.asarray(x) for x in flank_rows_bank(
        bank.em_odds, bank.t_mm, bank.t_mi, bank.t_md, bank.t_im,
        bank.t_ii, bank.t_dm, bank.t_dd, bank.bm,
        qcodes.astype(np.int32), qlens.astype(np.int32))]
    Q, H = qcodes.shape[0], len(cores)
    flat = lambda a: a.reshape(Q * H, -1)
    qlens_flat = np.repeat(qlens, H)
    decision, pending = gate_prefilter(flat(mocc), flat(ppB),
                                       flat(ppE), qlens_flat)
    for h, core in enumerate(cores):
        prof = configure(core, multihit=True)
        for q in range(Q):
            L = int(qlens[q])
            codes = qcodes[q, :L].astype(np.int64)
            _, ppB64, ppE64, mocc64 = _posteriors_multihit(prof, codes)
            regions = find_regions(mocc64, ppB64, ppE64)
            k = q * H + h
            if not regions:
                assert decision[k] == -1, (q, h)
                continue
            btot = np.cumsum(np.concatenate([[0.0], ppB64[:-1]]))
            etot = np.cumsum(np.concatenate([[0.0], ppE64[1:]]))
            deterministic = any(
                region_split_mass(btot, etot, i, j) < RT3
                for (i, j) in regions)
            if deterministic:
                assert decision[k] == 1, (q, h)
            else:
                assert decision[k] == 0, (q, h)
                assert pending[k] == regions, (q, h)
