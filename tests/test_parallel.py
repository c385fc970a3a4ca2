"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def _toy():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sharded_scoring_matches_single_device():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from witch_tpu.parallel.dist import (make_mesh, replicate_bank_args,
                                         sharded_score_and_weight)
    from witch_tpu.hmm.forward import forward_bits_bank

    mod = _toy()
    bank, qcodes, qlens, sizes = mod._toy_bank_and_queries(H=8, Q=16)
    log2_sizes = np.log2(sizes).astype(np.float32)

    mesh = make_mesh(8)
    bits_sh, w_sh = sharded_score_and_weight(
        mesh, replicate_bank_args(bank), qcodes, qlens, log2_sizes)
    bits_sh = np.asarray(bits_sh)
    w_sh = np.asarray(w_sh)

    args = replicate_bank_args(bank)
    bits_1 = np.asarray(forward_bits_bank(*args, qcodes, qlens))
    np.testing.assert_allclose(bits_sh, bits_1, atol=2e-3)
    # weights: base-2 softmax over adjusted scores
    adj = bits_1 + log2_sizes[None, :]
    w_1 = np.exp2(adj - adj.max(axis=1, keepdims=True))
    w_1 /= w_1.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(w_sh, w_1, atol=1e-3)
    assert np.allclose(w_sh.sum(axis=1), 1.0, atol=1e-3)


def test_mesh_factorization():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from witch_tpu.parallel.dist import make_mesh
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    mesh2 = make_mesh(8, model_parallel=4)
    assert mesh2.shape["model"] == 4
