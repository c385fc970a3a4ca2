"""Multi-chip distribution: device mesh + sharded scoring/weighting.

The reference's "parallelism" is a single-host subprocess farm
(SURVEY.md §2.4). TPU-native design: a 2D mesh ('data' x 'model') where
query batches are data-parallel and the eHMM bank is sharded across the
model axis (a form of expert parallelism over HMMs). Forward scores are
computed locally as [q_local, h_local]; the adjusted-bitscore softmax
denominator is a psum over the model axis (riding ICI), and full score
rows are all-gathered only for the small top-k selection.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..hmm.forward import forward_bits_bank, _forward_one


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: Optional[int] = None) -> Mesh:
    """Factor devices into a (data, model) mesh."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if model_parallel is None:
        # prefer squarish split with model <= data
        model_parallel = 1
        for m in range(int(np.sqrt(n)), 0, -1):
            if n % m == 0:
                model_parallel = m
                break
    assert n % model_parallel == 0
    grid = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def _local_scores(em, t_mm, t_mi, t_md, t_im, t_ii, t_dm, t_dd, bm,
                  codes, qlens):
    f_h = jax.vmap(_forward_one,
                   in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None))
    f_qh = jax.vmap(f_h, in_axes=(None,) * 9 + (0, 0))
    fwd = f_qh(em, t_mm, t_mi, t_md, t_im, t_ii, t_dm, t_dd, bm,
               codes, qlens)
    L = qlens.astype(jnp.float32)
    p1 = L / (L + 1.0)
    null1 = (L * jnp.log(p1) + jnp.log(1.0 - p1)) / jnp.log(2.0)
    return fwd / jnp.log(2.0) - null1[:, None]


def sharded_score_and_weight(mesh: Mesh, bank_args, codes, qlens,
                             log2_sizes):
    """One full distributed scoring + weighting step.

    bank_args: 9 arrays with leading H axis (sharded over 'model').
    codes/qlens: [Q, L]/[Q] (sharded over 'data').
    log2_sizes: [H] (sharded over 'model').

    Returns (bits [Q, H] fully gathered per data shard, weights [Q, H]).
    """
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(tuple([P("model")] * 9), P("data", None), P("data"),
                  P("model")),
        out_specs=(P("data", "model"), P("data", "model")),
        check_vma=False)
    def step(bank, codes, qlens, l2s):
        bits = _local_scores(*bank, codes, qlens)       # [q_loc, h_loc]
        adj = bits + l2s[None, :]
        # distributed softmax-in-base-2 over the full model axis
        local_max = jnp.max(adj, axis=1, keepdims=True)
        gmax = jax.lax.pmax(local_max, "model")
        local_sum = jnp.sum(jnp.exp2(adj - gmax), axis=1, keepdims=True)
        denom = jax.lax.psum(local_sum, "model")
        w = jnp.exp2(adj - gmax) / denom
        return bits, w

    return step(tuple(bank_args), codes, qlens, log2_sizes)


def replicate_bank_args(bank) -> Tuple:
    return (bank.em_odds, bank.t_mm, bank.t_mi, bank.t_md, bank.t_im,
            bank.t_ii, bank.t_dm, bank.t_dd, bank.bm)
