"""Pallas TPU kernel: batched per-envelope null2-by-expectation.

The hmmsearch reporting stage's dominant host cost is
`rescore_isolated_domain` semantics: for every single-envelope region of
every candidate (model, target) pair, an isolated unihit Forward over
the envelope subsequence plus a fused Backward that accumulates the
posterior state-usage expectations feeding the null2 biased-composition
correction (native/domaindef_kernel.cpp:null2_expectation; decoded from
the bundled HMMER 3.1b2 binary — reference call site
witch_msa/gcmm/algorithm.py:524-537). Measured on the example workload:
6.5 s of the 10.5 s gate stage on 4 AVX-512 cores, ~7k envelope DPs of
O(Ld x M) each.

That compute is exactly TPU-shaped: odds-domain DP rows over [pairs, M]
tiles, three passes (forward + checkpointed recompute + backward), all
in VMEM. This kernel runs QT pairs per grid step (pairs grouped by
model; the model's tables are selected per tile via scalar prefetch)
and emits per pair only O(K) scalars:

    envsc   isolated unihit Forward nats (log length-model move incl.)
    n2dot   [128] Sum_k useM[k] * em_odds[k, x]  per residue code x
    useI    total insert-state usage expectation
    usetot  total M+I usage expectation

so device->host traffic is negligible. The host finishes the (cheap)
per-position assembly: n2[x] = (n2dot[x] + useI + xocc) / Ld, per-region
log-odds sums via residue counts, and the FLogsum seqbias
(hmm/domaindef.py:_null2_for_envelope is the f64 spec of the same
math; the C++ engine is the oracle the tests compare against).

Numerics: odds-domain f32 with per-row rescaling and exponent ledgers
(same strategy as ops/pallas_forward.py); the delete chains are
doubling scans whose coefficient arrays self-truncate by underflow
(reuse effective_n_dbl). f32-vs-f64 differences are ~1e-4 bits; the
pipeline re-evaluates any pair whose reported score lands within a
guard band of a 0.1-bit print boundary on the host engine, so printed
output is invariant (pipeline.compute_scores).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCALE_FLOOR = 1e-30


def _null2_kernel(model_of, codes_ref, pmove_ref, lds_ref,
                  emT_hi_ref, emT_lo_ref, trans_ref,
                  scal_ref, n2dot_ref, *, Ld, Mp, QT, B, n_dbl):
    """One grid step = QT pairs of one model.

    codes_ref  [1, Ld, QT] i32  envelope subsequences (pad rows frozen;
               tile-major so the lane dim equals the block dim — Mosaic
               requires block lane dims divisible by 128 or full)
    pmove_ref  [QT, 1]  f32   unihit length-model move prob 2/(Lfull+2)
    lds_ref    [QT, 1]  i32   envelope lengths
    emT_*_ref  [1, 128, Mp]   emission odds, bf16 hi+lo split
    trans_ref  [1, 8, Mp]     transition odds rows (mm mi md im ii dm dd bm)
    scal_ref   [1, QT, 8]     out: envsc, useI, usetot
    n2dot_ref  [1, QT, 128]   out: Sum_k useM[k] em[k, x]
    """
    del model_of   # consumed by the BlockSpec index maps
    NB = Ld // B
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

    def shift1(v):          # [*, k] <- [*, k-1]
        return pltpu.roll(v, 1, axis=1) * mask1

    def rolll(v, s):
        # left roll by s (pltpu.roll takes non-negative shifts only)
        return pltpu.roll(v, Mp - s, axis=1)

    def shiftl(v):          # [*, k] <- [*, k+1]
        # wraparound lane Mp-1 reads lane 0; annihilate it
        return rolll(v, 1) * (lane < Mp - 1).astype(jnp.float32)

    # forward delete-chain coefficients (A_1[k] = tdd[k-1])
    a1 = shift1(jnp.broadcast_to(t_dd, (1, Mp)))
    As_f = [a1]
    for d in range(1, n_dbl):
        s = 1 << (d - 1)
        prev = As_f[-1]
        sh = pltpu.roll(prev, s, axis=1) * (lane >= s).astype(jnp.float32)
        As_f.append(prev * sh)
    # backward (right-to-left) chain coefficients: A_1[k] = tdd[k]
    Ab = [jnp.broadcast_to(t_dd, (1, Mp))]
    for d in range(1, n_dbl):
        s = 1 << (d - 1)
        prev = Ab[-1]
        sh = rolll(prev, s) * (lane < Mp - s).astype(jnp.float32)
        Ab.append(prev * sh)

    def dchain_fwd(Mrow):
        D = shift1(Mrow * t_md)
        for d in range(n_dbl):
            s = 1 << d
            D = D + pltpu.roll(D, s, axis=1) * As_f[d]
        return D

    def dchain_bck(c):
        # D[k] = c[k] + tdd[k] * D[k+1]
        D = c
        for d in range(n_dbl):
            s = 1 << d
            D = D + rolll(D, s) * Ab[d]
        return D

    def emis(x_row):
        # x_row [1, QT] -> emission odds [QT, Mp] (exact via hi+lo bf16)
        onehotT = (jax.lax.broadcasted_iota(
            jnp.int32, (128, QT), 0) == x_row).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        return (jax.lax.dot_general(
                    onehotT, emT_hi_ref[0], dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    onehotT, emT_lo_ref[0], dimension_numbers=dn,
                    preferred_element_type=jnp.float32))

    def body(scM, scI, scD, scS, ckM, ckI, ckD, ckS, blM, blI, blS,
             bMr, bIr, bSr, useM):
        pmove = pmove_ref[...]                     # [QT, 1]
        ploop = 1.0 - pmove
        lds = lds_ref[...].astype(jnp.int32)       # [QT, 1]

        # scS rows: 0=N 1=B 2=C 3=logscale
        def fstep(i_row, e):
            """One forward step consuming residue at 1-based row i_row;
            freezes pairs with i_row > Ld."""
            Mv, Iv, Dv = scM[...], scI[...], scD[...]
            S = scS[...]
            N, Bx, C, logs = (S[:, 0:1], S[:, 1:2], S[:, 2:3], S[:, 3:4])
            src = shift1(Mv * t_mm + Iv * t_im + Dv * t_dm) + Bx * bm
            Mrow = src * e
            Irow = Mv * t_mi + Iv * t_ii
            D = dchain_fwd(Mrow)
            E = (jnp.sum(Mrow, axis=1, keepdims=True)
                 + jnp.sum(D, axis=1, keepdims=True))
            Cn = C * ploop + E                      # unihit: E->C = 1
            Nn = N * ploop
            Bn = Nn * pmove
            scale = jnp.maximum(
                jnp.max(Mrow, axis=1, keepdims=True),
                jnp.maximum(Cn, jnp.maximum(Nn, SCALE_FLOOR)))
            inv = 1.0 / scale
            keep = (i_row <= lds)                   # [QT, 1] bool
            kf = keep.astype(jnp.float32)
            scM[...] = jnp.where(keep, Mrow * inv, Mv)
            scI[...] = jnp.where(keep, Irow * inv, Iv)
            scD[...] = jnp.where(keep, D * inv, Dv)
            news = jnp.concatenate(
                [Nn * inv, Bn * inv, Cn * inv, logs + jnp.log(scale),
                 jnp.zeros((QT, 4), jnp.float32)], axis=1)
            scS[...] = jnp.where(kf > 0, news, S)
            return ()

        # ---------------- pass 1: forward with checkpoints ------------
        scM[...] = jnp.zeros((QT, Mp), jnp.float32)
        scI[...] = jnp.zeros((QT, Mp), jnp.float32)
        scD[...] = jnp.zeros((QT, Mp), jnp.float32)
        scS[...] = jnp.concatenate(
            [jnp.ones((QT, 1), jnp.float32), pmove,
             jnp.zeros((QT, 6), jnp.float32)], axis=1)

        def fwd_block(b, _):
            ckM[b] = scM[...]
            ckI[b] = scI[...]
            ckD[b] = scD[...]
            ckS[b] = scS[...]

            def substep(r, _):
                i_row = b * B + r + 1
                x_row = codes_ref[0, pl.ds(b * B + r, 1), :]  # [1, QT]
                fstep(i_row, emis(x_row))
                return ()
            jax.lax.fori_loop(0, B, substep, (), unroll=False)
            return ()

        jax.lax.fori_loop(0, NB, fwd_block, (), unroll=False)
        S = scS[...]
        envsc = (jnp.log(jnp.maximum(S[:, 2:3], SCALE_FLOOR))
                 + jnp.log(pmove) + S[:, 3:4])               # [QT, 1]

        # ---------------- terminal backward row (row Ld) --------------
        bE_t = pmove                                   # bC = bE = move
        DkT = dchain_bck(jnp.broadcast_to(bE_t, (QT, Mp)))
        bMT = bE_t + shiftl(DkT) * t_md
        # terminal state rows: bM=bMT, bI=0, scalars bN=0 bC=move bled=0

        useM[...] = jnp.zeros((QT, Mp), jnp.float32)
        bMr[...] = bMT
        bIr[...] = jnp.zeros((QT, Mp), jnp.float32)
        bSr[...] = jnp.concatenate(
            [jnp.zeros((QT, 1), jnp.float32), pmove,
             jnp.zeros((QT, 6), jnp.float32)], axis=1)
        # accumulator scalars live in scS now (reuse): col0=useI col1=usetot
        scS[...] = jnp.zeros((QT, 8), jnp.float32)

        # ---------------- pass 2: blocks high -> low ------------------
        def bck_block(bb, _):
            b = NB - 1 - bb
            # recompute forward rows of block b from checkpoint b
            scM[...] = ckM[b]
            scI[...] = ckI[b]
            scD[...] = ckD[b]
            scS_acc = scS[...]          # stash accumulators
            scS[...] = ckS[b]

            def resub(r, _):
                i_row = b * B + r + 1
                x_row = codes_ref[0, pl.ds(b * B + r, 1), :]
                fstep(i_row, emis(x_row))
                blM[r] = scM[...]
                blI[r] = scI[...]
                blS[r] = scS[...]
                return ()
            jax.lax.fori_loop(0, B, resub, (), unroll=False)
            scS[...] = scS_acc

            # backward sweep rows b*B+B .. b*B+1
            def bsub(rr, _):
                r = B - 1 - rr
                i_row = b * B + r + 1
                # --- step from row i_row+1 to row i_row (consume
                # residue i_row+1 = codes[i_row]) unless terminal ---
                at_term = (i_row >= lds)               # [QT, 1]
                Mn = bMr[...]
                In = bIr[...]
                Sb = bSr[...]
                bN, bC, bled = Sb[:, 0:1], Sb[:, 1:2], Sb[:, 2:3]
                # residue row index i_row (0-based i_row-1+1 = i_row):
                # stepping consumes sub[i] with i = i_row (0-based),
                # i.e. codes_ref row i_row (guard: at Ld=Ldmax the
                # terminal mask makes the value irrelevant)
                x_row = codes_ref[0, pl.ds(
                    jnp.minimum(i_row, Ld - 1), 1), :]
                ex = emis(x_row)
                mne = Mn * ex
                Bv = jnp.sum(bm * mne, axis=1, keepdims=True)
                bNn = bN * ploop + Bv * pmove
                bCn = bC * ploop
                bEn = bCn
                c = shiftl(mne) * t_dm + bEn
                Dk = dchain_bck(c)
                Mi = bEn + shiftl(mne) * t_mm + In * t_mi \
                    + shiftl(Dk) * t_md
                Ii = shiftl(mne) * t_im + In * t_ii
                scale = jnp.maximum(
                    jnp.max(Mi, axis=1, keepdims=True),
                    jnp.maximum(bNn, jnp.maximum(bCn, SCALE_FLOOR)))
                inv = 1.0 / scale
                # select stepped vs terminal
                Mi = jnp.where(at_term, bMT, Mi * inv)
                Ii = jnp.where(at_term, 0.0, Ii * inv)
                bNn = jnp.where(at_term, 0.0, bNn * inv)
                bCn = jnp.where(at_term, pmove, bCn * inv)
                bledn = jnp.where(at_term, 0.0, bled + jnp.log(scale))
                bMr[...] = Mi
                bIr[...] = Ii
                bSr[...] = jnp.concatenate(
                    [bNn, bCn, bledn, jnp.zeros((QT, 5), jnp.float32)],
                    axis=1)
                # --- accumulate row i_row (1 <= i_row <= Ld) ---
                fM = blM[r]
                fI = blI[r]
                fled = blS[r][:, 3:4]
                sc = jnp.exp(fled + bledn - envsc)
                live = (i_row <= lds).astype(jnp.float32)
                ppM = fM * Mi * (sc * live)
                ppI = fI * Ii * (sc * live)
                useM[...] = useM[...] + ppM
                acc = scS[...]
                sI = jnp.sum(ppI, axis=1, keepdims=True)
                sM = jnp.sum(ppM, axis=1, keepdims=True)
                scS[...] = jnp.concatenate(
                    [acc[:, 0:1] + sI, acc[:, 1:2] + sI + sM,
                     jnp.zeros((QT, 6), jnp.float32)], axis=1)
                return ()
            jax.lax.fori_loop(0, B, bsub, (), unroll=False)
            return ()

        jax.lax.fori_loop(0, NB, bck_block, (), unroll=False)

        # ---------------- outputs -------------------------------------
        acc = scS[...]
        scal_ref[0] = jnp.concatenate(
            [envsc, acc[:, 0:1], acc[:, 1:2],
             jnp.zeros((QT, 5), jnp.float32)], axis=1)
        # n2dot[x] = Sum_k useM[k] em[k, x]: [QT, Mp] x [Mp, 128]
        uM = useM[...]
        dn = (((1,), (1,)), ((), ()))
        hi = jax.lax.dot_general(uM, emT_hi_ref[0].astype(jnp.float32),
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
        lo = jax.lax.dot_general(uM, emT_lo_ref[0].astype(jnp.float32),
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
        n2dot_ref[0] = hi + lo

    pl.run_scoped(
        body,
        scM=pltpu.VMEM((QT, Mp), jnp.float32),
        scI=pltpu.VMEM((QT, Mp), jnp.float32),
        scD=pltpu.VMEM((QT, Mp), jnp.float32),
        scS=pltpu.VMEM((QT, 8), jnp.float32),
        ckM=pltpu.VMEM((Ld // B, QT, Mp), jnp.float32),
        ckI=pltpu.VMEM((Ld // B, QT, Mp), jnp.float32),
        ckD=pltpu.VMEM((Ld // B, QT, Mp), jnp.float32),
        ckS=pltpu.VMEM((Ld // B, QT, 8), jnp.float32),
        blM=pltpu.VMEM((B, QT, Mp), jnp.float32),
        blI=pltpu.VMEM((B, QT, Mp), jnp.float32),
        blS=pltpu.VMEM((B, QT, 8), jnp.float32),
        bMr=pltpu.VMEM((QT, Mp), jnp.float32),
        bIr=pltpu.VMEM((QT, Mp), jnp.float32),
        bSr=pltpu.VMEM((QT, 8), jnp.float32),
        useM=pltpu.VMEM((QT, Mp), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("QT", "B", "interpret", "n_dbl"))
def pallas_null2(model_of, emT, trans, codesT, pmove, lds,
                 QT=16, B=32, interpret=False, n_dbl=None):
    """Batched envelope null2 expectations.

    model_of [T] i32 (scalar-prefetch: bank row per tile);
    emT [H, 128, Mp] f32 (split bf16 hi+lo in-graph); trans [H, 8, Mp];
    codesT [T, Ldmax, QT] i32; pmove [T*QT, 1] f32; lds [T*QT, 1] i32.
    Returns (scal [T, QT, 8], n2dot [T, QT, 128]).
    """
    emT_hi = emT.astype(jnp.bfloat16)
    emT_lo = (emT - emT_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    H, _, Mp = emT.shape
    T, Ld, _ = codesT.shape
    if n_dbl is None:
        n_dbl = max(1, int(np.ceil(np.log2(max(2, Mp)))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Ld, QT), lambda t, m: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, 1), lambda t, m: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, 1), lambda t, m: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, Mp), lambda t, m: (m[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, Mp), lambda t, m: (m[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Mp), lambda t, m: (m[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, QT, 8), lambda t, m: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, 128), lambda t, m: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_null2_kernel, Ld=Ld, Mp=Mp, QT=QT, B=B,
                          n_dbl=n_dbl),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, QT, 8), jnp.float32),
                   jax.ShapeDtypeStruct((T, QT, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(model_of, codesT, pmove, lds, emT_hi, emT_lo, trans)


def null2_envelopes_device(bank, entries: Sequence[Tuple[int, np.ndarray,
                                                         int]],
                           QT: int = 16, B: int = 32, Ldmax: int = None,
                           interpret: bool = False):
    """Device null2 for a list of (bank_row, sub_codes, L_full) envelope
    entries. Returns per entry (envsc_nats, n2
    odds per code [K=128], useI, usetot), order-preserving.

    Groups entries by bank row (one model per tile), pads each group to
    a QT multiple, and dispatches ONE pallas program.
    """
    from .pallas_forward import device_bank_arrays
    emTj, transj, ndbl = device_bank_arrays(bank)
    n = len(entries)
    if n == 0:
        return np.zeros((0,)), np.zeros((0, 128)), np.zeros(0), np.zeros(0)
    if Ldmax is None:
        Ldmax = max(len(sub) for _, sub, _ in entries)
    # quantize to 64-multiples (and the checkpoint block) so the row
    # count — part of the compiled program shape — is stable across runs
    Ldmax = max(B, 64, -(-Ldmax // 64) * 64)
    assert Ldmax % B == 0
    # order: group by model
    order = sorted(range(n), key=lambda r: entries[r][0])
    tiles = []          # (model_row, [entry indices...])
    for r in order:
        j = entries[r][0]
        if tiles and tiles[-1][0] == j and len(tiles[-1][1]) < QT:
            tiles[-1][1].append(r)
        else:
            tiles.append((j, [r]))
    # bucket the tile count so the program SHAPE is stable across runs
    # (every distinct T would otherwise be a fresh compile + remote
    # program load); dummy tiles run model 0 with Ld=0 (frozen rows)
    # Fixed tile-batch: ceil(T / TB) dispatches of ONE program shape
    # (TB tiles each, short batches padded with frozen dummy tiles), so
    # the compiled program — and its one-time remote load — is shared
    # across runs regardless of the candidate distribution.
    T = len(tiles)
    TB = T if interpret else 256
    # pad with a zero-odds code: the gap column of the bank
    gaps = np.where(np.abs(bank.em_odds).sum(axis=(0, 1)) == 0)[0]
    pad_code = int(gaps[0]) if len(gaps) else 4
    envsc = np.zeros(n)
    n2d = np.zeros((n, 128))
    useI = np.zeros(n)
    usetot = np.zeros(n)
    for c0 in range(0, T, TB):
        chunk = tiles[c0:c0 + TB]
        codesT = np.full((TB, Ldmax, QT), pad_code, np.int32)
        pmove = np.full((TB * QT, 1), 0.5, np.float32)
        lds = np.zeros((TB * QT, 1), np.int32)
        model_of = np.zeros(TB, np.int32)
        for t, (j, rows) in enumerate(chunk):
            model_of[t] = j
            for s, r in enumerate(rows):
                _, sub, lfull = entries[r]
                codesT[t, :len(sub), s] = sub
                lds[t * QT + s, 0] = len(sub)
                pmove[t * QT + s, 0] = 2.0 / (float(lfull) + 2.0)
        scal, n2dot = pallas_null2(
            jnp.asarray(model_of), emTj, transj, jnp.asarray(codesT),
            jnp.asarray(pmove), jnp.asarray(lds), QT=QT, B=B,
            interpret=interpret, n_dbl=ndbl)
        scal = np.asarray(scal).reshape(TB * QT, 8)
        n2dot = np.asarray(n2dot).reshape(TB * QT, 128)
        for t, (j, rows) in enumerate(chunk):
            for s, r in enumerate(rows):
                p = t * QT + s
                envsc[r] = scal[p, 0]
                useI[r] = scal[p, 1]
                usetot[r] = scal[p, 2]
                n2d[r] = n2dot[p]
    return envsc, n2d, useI, usetot
