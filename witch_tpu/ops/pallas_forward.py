"""Pallas TPU kernel: batched profile-HMM Forward scoring.

Hand-scheduled replacement for the XLA scan in witch_tpu/hmm/forward.py.
One grid step = one HMM; inside the kernel we loop over query tiles (QT
queries on sublanes, model states on lanes). Per residue: emission odds
come from one [QT,128]x[128,Mp] MXU matmul against the padded emission
table; the delete chain is a log2(Mp)-step doubling scan along lanes whose
coefficient arrays (cumulative tdd products) are precomputed once per
grid step — they underflow to zero past ~100 states, making the scan
self-truncating and exact in f32.

Everything stays in VMEM; per-row rescaling keeps odds in f32 range
(HMMER's own strategy). Validated to ~1e-3 bits against the float64
log-space reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCALE_FLOOR = 1e-30


def _forward_kernel(codes_ref, qlens_ref, nblk_ref, emT_hi_ref,
                    emT_lo_ref, trans_ref, out_ref, *, L, Mp, QT, NQT,
                    n_dbl):
    t_mm = trans_ref[0, 0:1, :]
    t_mi = trans_ref[0, 1:2, :]
    t_md = trans_ref[0, 2:3, :]
    t_im = trans_ref[0, 3:4, :]
    t_ii = trans_ref[0, 4:5, :]
    t_dm = trans_ref[0, 5:6, :]
    t_dd = trans_ref[0, 6:7, :]
    bm = trans_ref[0, 7:8, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    mask1 = (lane >= 1).astype(jnp.float32)

    def shift1(v):
        return pltpu.roll(v, 1, axis=1) * mask1

    # doubling-scan coefficients: A_1[k] = tdd[k-1]; A_2s = A_s * sh_s(A_s)
    a1 = shift1(jnp.broadcast_to(t_dd, (1, Mp)))
    As = [a1]
    for d in range(1, n_dbl):
        s = 1 << (d - 1)
        prev = As[-1]
        sh = pltpu.roll(prev, s, axis=1) * (lane >= s).astype(jnp.float32)
        As.append(prev * sh)

    def body(scM, scI, scD, scS):
        # scS rows: 0=N 1=B 2=J 3=C 4=logscale  (each [QT, 1] slice of [QT,8])
        def tile(qt, _):
            qstart = pl.multiple_of(qt * QT, QT)
            qlens = qlens_ref[pl.ds(qstart, QT), 0:1].astype(jnp.float32)
            pmove = 3.0 / (qlens + 3.0)
            ploop = 1.0 - pmove
            scM[...] = jnp.zeros((QT, Mp), jnp.float32)
            scI[...] = jnp.zeros((QT, Mp), jnp.float32)
            scD[...] = jnp.zeros((QT, Mp), jnp.float32)
            scS[...] = jnp.concatenate(
                [jnp.ones((QT, 1), jnp.float32), pmove,
                 jnp.zeros((QT, 6), jnp.float32)], axis=1)

            def step_one(x_row):
                # x_row [1, QT]: this residue for the tile's queries (lanes);
                # one-hot built transposed [code, query] — no transpose needed
                onehotT = (jax.lax.broadcasted_iota(
                    jnp.int32, (128, QT), 0) == x_row).astype(jnp.bfloat16)
                # exact emission select via two bf16 matmuls: the one-hot
                # side is exact in bf16, and emT is pre-split hi+lo so the
                # f32 values are reconstructed exactly (3x cheaper than a
                # 6-pass f32 HIGHEST matmul)
                dn = (((0,), (0,)), ((), ()))
                e = (jax.lax.dot_general(
                        onehotT, emT_hi_ref[0], dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                        onehotT, emT_lo_ref[0], dimension_numbers=dn,
                        preferred_element_type=jnp.float32))  # [QT, Mp]
                Mv, Iv, Dv = scM[...], scI[...], scD[...]
                S = scS[...]
                N = S[:, 0:1]
                B = S[:, 1:2]
                J = S[:, 2:3]
                C = S[:, 3:4]
                logs = S[:, 4:5]
                src = shift1(Mv * t_mm + Iv * t_im + Dv * t_dm) + B * bm
                Mrow = src * e
                Irow = Mv * t_mi + Iv * t_ii
                D = shift1(Mrow * t_md)
                for d in range(n_dbl):
                    s = 1 << d
                    # no lane mask needed: As[d] is exactly zero on
                    # lanes < 2^d (products of shifted masked tdd), so
                    # roll's wrap-around lanes are annihilated
                    D = D + pltpu.roll(D, s, axis=1) * As[d]
                E = (jnp.sum(Mrow, axis=1, keepdims=True)
                     + jnp.sum(D, axis=1, keepdims=True))
                Jn = J * ploop + E * 0.5
                Cn = C * ploop + E * 0.5
                Nn = N * ploop
                Bn = Nn * pmove + Jn * pmove
                scale = jnp.maximum(
                    jnp.max(Mrow, axis=1, keepdims=True),
                    jnp.maximum(Cn, jnp.maximum(Nn, SCALE_FLOOR)))
                inv = 1.0 / scale
                # no per-row length masking: padding residues use a
                # zero-emission code, so M/I/D die and C only picks up
                # ploop factors, corrected analytically by the caller
                scM[...] = Mrow * inv
                scI[...] = Irow * inv
                scD[...] = D * inv
                news = jnp.concatenate(
                    [Nn * inv, Bn * inv, Jn * inv, Cn * inv,
                     logs + jnp.log(scale),
                     jnp.zeros((QT, 3), jnp.float32)], axis=1)
                scS[...] = news
                return ()

            def step_block(blk, _):
                # sublane-aligned [8, QT] load, then 8 static row slices
                base = pl.multiple_of(blk * 8, 8)
                rows = codes_ref[pl.ds(base, 8), pl.ds(qstart, QT)]
                for j in range(8):
                    step_one(rows[j:j + 1, :])
                return ()

            # dynamic residue bound: with length-sorted queries each
            # tile runs only to its own longest query (the wrapper
            # compensates the skipped padded steps' C-loop factors)
            nblk = nblk_ref[qt, 0]
            jax.lax.fori_loop(0, nblk, step_block, (), unroll=False)
            S = scS[...]
            res = jnp.log(S[:, 3:4] * pmove) + S[:, 4:5]   # [QT, 1]
            out_ref[0, pl.ds(qt, 1), :] = res.reshape(1, QT)
            return ()

        jax.lax.fori_loop(0, NQT, tile, (), unroll=False)

    pl.run_scoped(
        body,
        scM=pltpu.VMEM((QT, Mp), jnp.float32),
        scI=pltpu.VMEM((QT, Mp), jnp.float32),
        scD=pltpu.VMEM((QT, Mp), jnp.float32),
        scS=pltpu.VMEM((QT, 8), jnp.float32),
    )


def effective_n_dbl(trans: np.ndarray) -> int:
    """Smallest doubling-pass count that is exact for this bank.

    Mirrors the kernel's coefficient recursion (A_1[k] = tdd[k-1],
    A_2s = A_s * shift_s(A_s)) in host float32: once every entry of
    A_s falls below the smallest normal f32, the pass contributes
    coefficients the device flushes (or that are <= 1e-38, i.e.
    sub-ulp against the per-row-rescaled O(1) state), so it and all
    later passes can be skipped. tdd products shrink monotonically
    (each tdd < 1), hence one all-tiny pass implies the rest. For the
    example's 16S-scale models this cuts 11-12 passes to 8-9.

    The bit-identity argument assumes the device flushes f32 subnormals
    to zero (true on TPU). Backends that preserve subnormals (e.g.
    interpret=True on CPU) can pick up sub-ulp-but-nonzero terms from a
    skipped pass, so truncated-vs-full results there agree only to the
    validated ~1e-3-bit tolerance, not bitwise — don't assert exact
    equality against an n_dbl=None run in interpret mode.
    """
    H, _, Mp = trans.shape
    n_dbl = max(1, int(np.ceil(np.log2(max(2, Mp)))))
    tdd = np.asarray(trans[:, 6, :], np.float32)
    A = np.zeros((H, Mp), np.float32)
    A[:, 1:] = tdd[:, :-1]
    minnorm = np.float32(2.0 ** -126)
    need = 1
    for d in range(1, n_dbl):
        s = 1 << (d - 1)
        sh = np.zeros_like(A)
        sh[:, s:] = A[:, :-s]
        A = (A * sh).astype(np.float32)
        if (A >= minnorm).any():
            need = d + 1
    return need


@functools.partial(jax.jit, static_argnames=("QT", "interpret", "n_dbl"))
def _pallas_forward_nats_jit(emT, trans, codes, qlens, nblk, QT=128,
                             interpret=False, n_dbl=None):
    H, _, Mp = emT.shape
    emT_hi = emT.astype(jnp.bfloat16)
    emT_lo = (emT - emT_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    Q, L = codes.shape
    NQT = Q // QT
    if n_dbl is None:
        n_dbl = max(1, int(np.ceil(np.log2(max(2, Mp)))))
    out = pl.pallas_call(
        functools.partial(_forward_kernel, L=L, Mp=Mp, QT=QT, NQT=NQT,
                          n_dbl=n_dbl),
        grid=(H,),
        in_specs=[
            pl.BlockSpec((L, Q), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NQT, 1), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, Mp), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, Mp), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Mp), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NQT, QT), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, NQT, QT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(codes.T, qlens[:, None], nblk[:, None], emT_hi, emT_lo, trans)
    return out.reshape(H, Q).T


def pallas_forward_nats_raw(emT, trans, codes, qlens, QT=128,
                            interpret=False, n_dbl=None):
    """Traceable variant (usable under jit/shard_map): no host-side
    length sorting; every tile runs the full residue loop."""
    Q, L = codes.shape
    NQT = Q // QT
    nblk = jnp.full((NQT,), max(1, L // 8), jnp.int32)
    return _pallas_forward_nats_jit(emT, trans, codes, qlens, nblk,
                                    QT=QT, interpret=interpret,
                                    n_dbl=n_dbl)


def pallas_forward_nats(emT, trans, codes, qlens, QT=128, interpret=False,
                        n_dbl=None):
    """Forward scores (nats): emT [H,128,Mp] float32, trans [H,8,Mp],
    codes [Q, L] int32 (Q multiple of QT), qlens [Q]. Returns [Q, H]
    (device array).  n_dbl (static) truncates the delete-chain scan;
    compute it with effective_n_dbl(trans) on the host copy — None
    uses the full log2(Mp) passes.

    Queries are length-sorted on the host so each QT tile's residue
    loop runs only to its own longest query (the padded-step C-loop
    factors the kernel no longer accumulates are added back
    analytically, the same approximation _bits_from_nats removes).
    Program shapes are unchanged — the dynamic bound is runtime data,
    not a compile shape."""
    Q, L = codes.shape
    NQT = Q // QT
    ql = np.asarray(qlens)
    order = np.argsort(ql, kind="stable")
    cs = np.ascontiguousarray(np.asarray(codes)[order])
    ls = np.ascontiguousarray(ql[order])
    nblk = np.zeros(NQT, np.int32)
    for t in range(NQT):
        mx = int(ls[t * QT:(t + 1) * QT].max(initial=1))
        nblk[t] = max(1, -(-mx // 8))
    out = np.asarray(_pallas_forward_nats_jit(
        emT, trans, jnp.asarray(cs), jnp.asarray(ls),
        jnp.asarray(nblk), QT=QT, interpret=interpret, n_dbl=n_dbl))
    # add back the skipped padded steps' ploop factors so callers'
    # Lpad-based correction (_bits_from_nats) stays valid unchanged
    steps = np.repeat(nblk * 8, QT)[:Q].astype(np.float64)
    lf = ls[:Q].astype(np.float64)
    ploop = 1.0 - 3.0 / (lf + 3.0)
    out = out + ((L - steps) * np.log(ploop))[:, None]
    inv = np.empty_like(order)
    inv[order] = np.arange(Q)
    return out[inv]


_DEVICE_BANK_CACHE = {}


def device_bank_arrays(bank):
    """Device-resident (emT, trans, n_dbl) for a bank, cached by content
    hash. In the resident-daemon flow consecutive jobs rebuild the same
    ensemble from the same backbone; without this cache every job
    re-converts (~0.5 s host) and re-uploads (~6 s measured over the
    remote tunnel: the example bank's emission table is 200+ MB) the
    identical arrays."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    h.update(np.ascontiguousarray(bank.em_odds).tobytes())
    for a in (bank.t_mm, bank.t_mi, bank.t_md, bank.t_im, bank.t_ii,
              bank.t_dm, bank.t_dd, bank.bm, bank.M):
        h.update(np.ascontiguousarray(a).tobytes())
    key = h.hexdigest()
    hit = _DEVICE_BANK_CACHE.get(key)
    if hit is None:
        emT, trans = bank_to_pallas_arrays(bank)
        hit = (jnp.asarray(emT), jnp.asarray(trans),
               effective_n_dbl(trans))
        while len(_DEVICE_BANK_CACHE) >= 8:        # bound device HBM
            _DEVICE_BANK_CACHE.pop(next(iter(_DEVICE_BANK_CACHE)))
        _DEVICE_BANK_CACHE[key] = hit
    return hit


def bank_to_pallas_arrays(bank):
    """Convert a ProfileBank to the kernel's (emT, trans) layout."""
    H = bank.H
    Mp1 = bank.em_odds.shape[1]
    Mp = -(-Mp1 // 128) * 128
    num_codes = bank.em_odds.shape[2]
    emT = np.zeros((H, 128, Mp), dtype=np.float32)
    emT[:, :num_codes, :Mp1] = np.transpose(bank.em_odds, (0, 2, 1))
    trans = np.zeros((H, 8, Mp), dtype=np.float32)
    for r, a in enumerate((bank.t_mm, bank.t_mi, bank.t_md, bank.t_im,
                           bank.t_ii, bank.t_dm, bank.t_dd, bank.bm)):
        trans[:, r, :Mp1] = a
    return emT, trans


def _bits_from_nats(nats, qlens, Lpad):
    L_f = qlens.astype(np.float64)
    # remove the padding rows' C-loop decay: C picked up
    # (Lpad - qlen) extra ploop factors
    ploop = 1.0 - 3.0 / (L_f + 3.0)
    nats = nats - ((Lpad - L_f) * np.log(ploop))[:, None]
    p1 = L_f / (L_f + 1.0)
    null1 = (L_f * np.log(p1) + np.log(1.0 - p1)) / np.log(2.0)
    return nats / np.log(2.0) - null1[:, None]


def canonical_pad(Q: int, Lmax: int, QT: int = 128):
    """The single-program padding rule shared by the pipeline and
    bench.py: queries padded to a multiple of QT, residues to a
    multiple of 64. One (Qpad, Lpad, Mp) triple = one compiled
    program = one remote program load."""
    return (-(-max(Q, QT) // QT) * QT, max(64, -(-Lmax // 64) * 64))


def pallas_forward_bits(bank, codes: np.ndarray, qlens: np.ndarray,
                        QT: int = 128, interpret: bool = False,
                        pad_code: int = None,
                        q_block: int = 512,
                        group_by_length: bool = True,
                        single_shape: bool = False) -> np.ndarray:
    """Null1-corrected pre-score bits [Q, H] via the Pallas kernel.

    Padding residues use the gap code (zero emission odds in every model);
    their spurious C-state ploop factors are removed analytically.

    group_by_length sorts queries by length and pads each QT-sized group
    only to its own length (rounded up to 64 to bound compile-shape
    diversity): for fragmentary workloads this removes most of the
    padded-row waste of a single global Lmax pad. Scores are independent
    of the padding thanks to the gap-code + analytic-ploop scheme, so
    grouping is bit-compatible with the blocked path.

    single_shape=True instead pads the whole batch to ONE
    (canonical_pad) shape and dispatches it as ONE program call. On
    remote-accelerator hosts a program *load* costs orders of magnitude
    more than the padding FLOPs it avoids (measured here: 12-300 s per
    program vs ~1 s for the whole example grid), so the production TPU
    path wants exactly one program.
    """
    emTj, transj, ndbl = device_bank_arrays(bank)
    if pad_code is None:
        # gap column: all-zero emission odds in every model
        gaps = np.where(np.abs(bank.em_odds).sum(axis=(0, 1)) == 0)[0]
        pad_code = int(gaps[0]) if len(gaps) else 4
    Q, L = codes.shape

    if single_shape:
        import os as _os
        Qpad, Lpad = canonical_pad(Q, int(qlens.max(initial=1)), QT)
        # Scale tiling: one giant dispatch faulted the TPU worker at
        # the 10k-query x 2.8k-HMM workload. Bound every dispatch to
        # <= HS models x <= QB padded queries (the example workload
        # stays a single dispatch; a big grid becomes a loop of
        # identically-shaped programs, so the one-time program load is
        # still amortized across all slices).
        HS = int(_os.environ.get("WITCH_TPU_H_SLICE", "512"))
        QB = int(_os.environ.get("WITCH_TPU_Q_BLOCK", "4096"))
        QB = max(QT, (QB // QT) * QT)
        H = bank.H
        if H <= HS and Qpad <= QB:
            cp = np.full((Qpad, Lpad), pad_code, np.int32)
            for qi in range(Q):
                cp[qi, :qlens[qi]] = codes[qi, :qlens[qi]]
            lp = np.ones(Qpad, np.int32)
            lp[:Q] = qlens
            nats = np.asarray(pallas_forward_nats(
                emTj, transj, jnp.asarray(cp), jnp.asarray(lp),
                QT=QT, interpret=interpret, n_dbl=ndbl))[:Q]
            return _bits_from_nats(nats, qlens, Lpad)
        n_h = -(-H // HS)
        out = np.empty((Q, H), np.float64)
        for s0 in range(0, Qpad, QB):
            q0 = min(s0, Q)
            q1 = min(s0 + QB, Q)
            cp = np.full((QB, Lpad), pad_code, np.int32)
            for t, qi in enumerate(range(q0, q1)):
                cp[t, :qlens[qi]] = codes[qi, :qlens[qi]]
            lp = np.ones(QB, np.int32)
            lp[:q1 - q0] = qlens[q0:q1]
            cpj, lpj = jnp.asarray(cp), jnp.asarray(lp)
            for h0 in range(0, H, HS):
                h1 = min(h0 + HS, H)
                eslice = emTj[h0:h0 + HS]
                tslice = transj[h0:h0 + HS]
                if h1 - h0 < HS:   # pad the last model slice
                    eslice = jnp.concatenate(
                        [eslice, jnp.zeros((HS - (h1 - h0),) +
                                           eslice.shape[1:],
                                           eslice.dtype)], axis=0)
                    tslice = jnp.concatenate(
                        [tslice, jnp.zeros((HS - (h1 - h0),) +
                                           tslice.shape[1:],
                                           tslice.dtype)], axis=0)
                nats = np.asarray(pallas_forward_nats(
                    eslice, tslice, cpj, lpj,
                    QT=QT, interpret=interpret,
                    n_dbl=ndbl))[:q1 - q0, :h1 - h0]
                if q1 > q0:
                    out[q0:q1, h0:h1] = _bits_from_nats(
                        nats, qlens[q0:q1], Lpad)
        return out

    if group_by_length and Q > QT:
        order = np.argsort(qlens, kind="stable")
        out = np.empty((Q, bank.H), np.float64)
        for s in range(0, Q, QT):
            idx = order[s:s + QT]
            n = len(idx)
            Lg = int(qlens[idx].max())
            Lpad = max(64, -(-Lg // 64) * 64)
            cp = np.full((QT, Lpad), pad_code, np.int32)
            for t, qi in enumerate(idx):
                cp[t, :qlens[qi]] = codes[qi, :qlens[qi]]
            lp = np.ones(QT, np.int32)
            lp[:n] = qlens[idx]
            nats = np.asarray(pallas_forward_nats(
                emTj, transj, jnp.asarray(cp), jnp.asarray(lp),
                QT=QT, interpret=interpret, n_dbl=ndbl))[:n]
            out[idx] = _bits_from_nats(nats, qlens[idx], Lpad)
        return out

    Lpad = -(-L // 128) * 128
    outs = []
    for s in range(0, Q, q_block):
        n = min(q_block, Q - s)
        Qpad = q_block if Q > q_block else -(-n // QT) * QT
        cp = np.full((Qpad, Lpad), pad_code, np.int32)
        cp[:n, :L] = codes[s:s + n]
        tail = np.arange(L)[None, :] >= qlens[s:s + n, None]
        cp[:n, :L][tail] = pad_code
        lp = np.ones(Qpad, np.int32)
        lp[:n] = qlens[s:s + n]
        nats = np.asarray(pallas_forward_nats(
            emTj, transj, jnp.asarray(cp), jnp.asarray(lp),
            QT=QT, interpret=interpret, n_dbl=ndbl))[:n]
        outs.append(_bits_from_nats(nats, qlens[s:s + n], Lpad))
    return np.concatenate(outs, axis=0)
