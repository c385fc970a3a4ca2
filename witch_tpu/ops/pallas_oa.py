"""Pallas TPU kernel: fused per-pair posterior decoding + optimal
accuracy alignment + in-kernel traceback.

The per-query alignment prologue (reference hmmalign call per
(query, HMM) pair, witch_msa/gcmm/aligner.py:88-142) is the last
host-dominated hot loop of the pipeline: ~3 s of f64 posterior + OA
DP per scenario-D run on 4 AVX-512 cores. This kernel moves the whole
stage onto the TPU:

  pass A  unihit Backward over the full query, scaled odds domain,
          checkpointing the (bM, bI, specials) state every B rows;
          reaching row 0 yields the total score Z.
  pass B  Forward sweep; per checkpoint block the Backward rows are
          recomputed into VMEM (descending), so posterior rows
          ppM/ppI/ppN/ppC materialize IN FORWARD ORDER and the
          optimal-accuracy DP (hmm/align_ref.py:oa_fill semantics)
          fuses directly: per row only 4-bit traceback pointers and a
          few per-row scalars are kept, all resident in VMEM.
  pass C  in-kernel traceback (hmm/align_ref.py:oa_trace first-max-
          wins order) walks the pointer tile per pair and emits
          aligned columns [Ld] i32 — the only data shipped to host
          (plus margins), so the 17 MB/s device->host tunnel cost is
          negligible.

Numeric parity: the host/native chain (native/oa_kernel.cpp) is f64;
this kernel is f32. Every argmax in fill+trace uses the host's
first-max-wins precedence, and the kernel tracks the minimum decision
margin over all cells; pairs whose margin falls below a guard (or
whose traceback fails) are re-aligned on the host engine, so output
rows are invariant (aligner.DeviceAligner). Exact ties (margin == 0)
take the same precedence branch in both precisions and are trusted.

Restriction: all core transitions within 1..M must be > 0 (true for
any prior-smoothed HMM; hmm/build.py output always is), so the host
spec's FLT_MIN deltas reduce to lane masks. The host path covers
anything else (aligner checks `bank_strictly_positive`).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCALE_FLOOR = 1e-30
NEG = float(np.float32(-np.finfo(np.float32).max))
LN2 = float(np.float32(np.log(2.0)))


def _oa_kernel(model_of, ms_arr, codes_ref, pmove_ref, lds_ref,
               emT_ref, trans_ref,
               cols_ref, stat_ref, *rest,
               Ld, Mp, QT, B, debug_ptr=False):
    if debug_ptr:
        dptr_ref, drow_ref, dck_ref, dckM_ref = rest[:4]
        rest = rest[4:]
    (fM, fI, fD, fS, bM, bI, bS, ckM, ckI, ckS,
     blM, blI, blS, oaM, oaI, oaD, oaMl, oaIl, oaDl,
     oaS, ptr, rowi) = rest[:22]
    eR = rest[22] if len(rest) > 22 else None
    """One grid step = QT (query, model) pairs of one model.

    codes_ref [1, Ld, QT] i32; pmove_ref/lds_ref [QT, 1];
    emT_* [1, 128, Mp] bf16 hi/lo; trans [1, 8, Mp] f32
    (mm mi md im ii dm dd bm probability-domain rows).
    cols_ref [1, Ld, QT] i32 out: aligned column per residue (-1 =
    insert/flank). stat_ref [1, QT, 8] f32 out:
    0 min margin, 1 trace_ok, 2 Zlog, 3 n steps.
    """
    t = pl.program_id(0)
    M_model = ms_arr[t]
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
    kmask = jnp.logical_and(lane >= 1, lane <= M_model)      # M lanes
    imask = jnp.logical_and(lane >= 1, lane <= M_model - 1)  # I lanes
    dmask = jnp.logical_and(lane >= 2, lane <= M_model)      # D lanes

    def po2_scale(scale):
        """Exact power-of-two row normalization: 2^floor(log2 s).
        TPU divisions/reciprocals are approximate (~2^-12), which
        accumulated ~1%% Forward-score drift per 100 rows; a
        power-of-two inverse multiplies exactly and the ledger
        becomes an integer exponent count."""
        sb = pltpu.bitcast(scale, jnp.int32)
        eb = jnp.bitwise_and(sb, jnp.int32(0x7F800000))
        scale2 = pltpu.bitcast(eb, jnp.float32)
        inv = pltpu.bitcast(jnp.int32(254 << 23) - eb, jnp.float32)
        k = (jnp.right_shift(eb, 23) - 127).astype(jnp.float32)
        return scale2, inv, k

    def shift1(v):          # odds-domain [*, k] <- [*, k-1], zero fill
        return pltpu.roll(v, 1, axis=1) * (lane >= 1).astype(jnp.float32)

    def rolll(v, s):
        return pltpu.roll(v, Mp - s, axis=1)

    def shiftl(v):
        return rolll(v, 1) * (lane < Mp - 1).astype(jnp.float32)

    def shift1_neg(v):      # accuracy-domain shift, NEG fill
        return jnp.where(lane >= 1, pltpu.roll(v, 1, axis=1), NEG)

    def emis(x_row):
        # single f32 one-hot matmul: a bf16 hi+lo pair here measured
        # a 1-2%% systematic Forward-score error on TPU (the two dots
        # appear to get algebraically merged, dropping the lo part);
        # the one-hot selection makes the f32 dot exact by construction
        onehotT = (jax.lax.broadcasted_iota(
            jnp.int32, (128, QT), 0) == x_row).astype(jnp.float32)
        dn = (((0,), (0,)), ((), ()))
        return jax.lax.dot_general(
            onehotT, emT_ref[0], dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    n_dbl = max(1, int(np.ceil(np.log2(max(2, Mp)))))
    a1 = shift1(jnp.broadcast_to(t_dd, (1, Mp)))
    As_f = [a1]
    for d in range(1, n_dbl):
        s = 1 << (d - 1)
        prev = As_f[-1]
        sh = pltpu.roll(prev, s, axis=1) * (lane >= s).astype(jnp.float32)
        As_f.append(prev * sh)
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
        D = c
        for d in range(n_dbl):
            s = 1 << d
            D = D + rolll(D, s) * Ab[d]
        return D

    def cummax_neg(v):
        # accuracy-domain prefix max over lanes (delete chain: interior
        # deltas are exactly 1 given the >0-transition restriction)
        D = v
        for d in range(n_dbl):
            s = 1 << d
            D = jnp.maximum(
                D, jnp.where(lane >= s, pltpu.roll(D, s, axis=1), NEG))
        return D

    pmove = pmove_ref[...]
    ploop = 1.0 - pmove
    lds = lds_ref[...].astype(jnp.int32)

    # ---------------- pass A: backward Ld -> 1, checkpoints -----------
    bE_t = pmove
    DkT = dchain_bck(jnp.broadcast_to(bE_t, (QT, Mp)))
    bMT = bE_t + shiftl(DkT) * t_md
    bM[...] = bMT
    bI[...] = jnp.zeros((QT, Mp), jnp.float32)
    # bS cols: 0=bN 1=bC 2=bled
    bS[...] = jnp.concatenate(
        [jnp.zeros((QT, 1), jnp.float32), pmove,
         jnp.zeros((QT, 6), jnp.float32)], axis=1)

    def emis_row(i_row, store=False):
        """Emission odds for (1-based) residue row i_row. With the
        eR cache, pass A computes+stores each row's HIGHEST-precision
        matmul once and the two pass-B sweeps read it back (the f32
        matmul is 6 MXU passes at [128, QT] - the dominant per-row
        cost at production Mp)."""
        r = jnp.minimum(i_row, Ld) - 1
        if eR is not None and not store:
            return eR[pl.ds(r, 1)][0]
        ex = emis(codes_ref[0, pl.ds(r, 1), :])
        if eR is not None:
            eR[pl.ds(r, 1)] = ex.reshape(1, QT, Mp)
        return ex

    def bstep(i_row, store_emis=False):
        """Backward step row i_row+1 -> i_row (consume residue
        i_row+1); pairs with i_row >= lds stay terminal."""
        at_term = (i_row >= lds)
        Mn = bM[...]
        In = bI[...]
        Sb = bS[...]
        bN, bC, bled = Sb[:, 0:1], Sb[:, 1:2], Sb[:, 2:3]
        ex = emis_row(jnp.minimum(i_row + 1, Ld), store=store_emis)
        mne = Mn * ex
        Bv = jnp.sum(bm * mne, axis=1, keepdims=True)
        bNn = bN * ploop + Bv * pmove
        bCn = bC * ploop
        bEn = bCn
        c = shiftl(mne) * t_dm + bEn
        Dk = dchain_bck(c)
        Mi = bEn + shiftl(mne) * t_mm + In * t_mi + shiftl(Dk) * t_md
        Ii = shiftl(mne) * t_im + In * t_ii
        scale = jnp.maximum(
            jnp.max(Mi, axis=1, keepdims=True),
            jnp.maximum(bNn, jnp.maximum(bCn, SCALE_FLOOR)))
        _, inv, kexp = po2_scale(scale)
        # bled ledger holds the INTEGER exponent sum (exact in f32)
        bM[...] = jnp.where(at_term, bMT, Mi * inv)
        bI[...] = jnp.where(at_term, 0.0, Ii * inv)
        bS[...] = jnp.concatenate(
            [jnp.where(at_term, 0.0, bNn * inv),
             jnp.where(at_term, pmove, bCn * inv),
             jnp.where(at_term, 0.0, bled + kexp),
             jnp.zeros((QT, 5), jnp.float32)], axis=1)

    def apass_block(bb, _):
        b = NB - 1 - bb
        # checkpoint = state AT row (b+1)*B (top row of block b)
        ckM[b] = bM[...]
        ckI[b] = bI[...]
        ckS[b] = bS[...]

        def sub(rr, _):
            i_row = (b + 1) * B - 1 - rr
            bstep(i_row, store_emis=True)
            return ()
        jax.lax.fori_loop(0, B, sub, (), unroll=False)
        return ()

    jax.lax.fori_loop(0, NB, apass_block, (), unroll=False)
    S0 = bS[...]
    Zlog = (jnp.log(jnp.maximum(S0[:, 0:1], SCALE_FLOOR))
            + S0[:, 2:3] * LN2)                            # [QT, 1]

    # ---------------- pass B: forward + fused OA fill -----------------
    fM[...] = jnp.zeros((QT, Mp), jnp.float32)
    fI[...] = jnp.zeros((QT, Mp), jnp.float32)
    fD[...] = jnp.zeros((QT, Mp), jnp.float32)
    # fS cols: 0=N 1=B 2=C 3=fled
    fS[...] = jnp.concatenate(
        [jnp.ones((QT, 1), jnp.float32), pmove,
         jnp.zeros((QT, 6), jnp.float32)], axis=1)
    # The OA DP runs in DOUBLE-FLOAT (hi+lo compensated f32, ~2^-48
    # resolution): plain f32 collapses distinct f64 path sums into
    # exact ties that the host breaks by comparison, flipping ~7% of
    # pairs (measured). In double-float an exact tie is (near-
    # certainly) a structural tie - identical sums propagated along
    # exact-zero paths - which both precisions break by the same
    # first-max precedence, so ties are trusted and only genuinely
    # small margins defer to the host.
    oaM[...] = jnp.full((QT, Mp), NEG, jnp.float32)
    oaI[...] = jnp.full((QT, Mp), NEG, jnp.float32)
    oaD[...] = jnp.full((QT, Mp), NEG, jnp.float32)
    oaMl[...] = jnp.zeros((QT, Mp), jnp.float32)
    oaIl[...] = jnp.zeros((QT, Mp), jnp.float32)
    oaDl[...] = jnp.zeros((QT, Mp), jnp.float32)
    # oaS cols: 0=N_hi 1=C_hi 2=minmargin 3=N_lo 4=C_lo
    oaS[...] = jnp.concatenate(
        [jnp.zeros((QT, 1), jnp.float32),
         jnp.full((QT, 1), NEG, jnp.float32),
         jnp.full((QT, 1), jnp.inf, jnp.float32),
         jnp.zeros((QT, 5), jnp.float32)], axis=1)

    def df_ge(h1, l1, h2, l2):
        return jnp.logical_or(h1 > h2,
                              jnp.logical_and(h1 == h2, l1 >= l2))

    def df_gt(h1, l1, h2, l2):
        return jnp.logical_or(h1 > h2,
                              jnp.logical_and(h1 == h2, l1 > l2))

    def df_eq(h1, l1, h2, l2):
        return jnp.logical_and(h1 == h2, l1 == l2)

    def df_max(h1, l1, h2, l2):
        m = df_ge(h1, l1, h2, l2)
        return jnp.where(m, h1, h2), jnp.where(m, l1, l2)

    def df_add_f32(h, l, b):
        """(h, l) + b via two-sum, renormalized."""
        s_ = h + b
        z = s_ - h
        e = (h - (s_ - z)) + (b - z)
        lo = l + e
        hi2 = s_ + lo
        lo2 = lo - (hi2 - s_)
        return hi2, lo2

    def df_shift1(h, l):
        return (jnp.where(lane >= 1, pltpu.roll(h, 1, axis=1), NEG),
                jnp.where(lane >= 1, pltpu.roll(l, 1, axis=1), 0.0))

    def df_cummax(h, l):
        for d in range(n_dbl):
            s_ = 1 << d
            rh = jnp.where(lane >= s_, pltpu.roll(h, s_, axis=1), NEG)
            rl = jnp.where(lane >= s_, pltpu.roll(l, s_, axis=1), 0.0)
            h, l = df_max(h, l, rh, rl)
        return h, l

    def pair_margin(best, others, mask2d):
        """Min over masked cells of (best - second) in double-float;
        exact ties and single-candidate cells contribute +inf."""
        bh, bl = best
        sh = jnp.full(bh.shape, NEG, jnp.float32)
        sl = jnp.zeros(bh.shape, jnp.float32)
        any_tie = jnp.zeros(bh.shape, jnp.bool_)
        for oh, ol in others:
            below = df_gt(bh, bl, oh, ol)
            any_tie = jnp.logical_or(any_tie, df_eq(oh, ol, bh, bl))
            ch = jnp.where(below, oh, NEG)
            cl = jnp.where(below, ol, 0.0)
            sh, sl = df_max(sh, sl, ch, cl)
        m = jnp.where(jnp.logical_or(any_tie, sh == NEG),
                      jnp.inf, (bh - sh) + (bl - sl))
        return jnp.min(jnp.where(mask2d, m, jnp.inf), axis=1,
                       keepdims=True)

    def bpass_block(b, _):
        # recompute backward rows of block b into bl slots:
        # slot r holds the backward state AT row b*B + r + 1
        bM[...] = ckM[b]
        bI[...] = ckI[b]
        bS[...] = ckS[b]
        blM[B - 1] = bM[...]
        blI[B - 1] = bI[...]
        blS[B - 1] = bS[...]

        def resub(rr, _):
            i_row = (b + 1) * B - 1 - rr
            bstep(i_row)
            blM[B - 2 - rr] = bM[...]
            blI[B - 2 - rr] = bI[...]
            blS[B - 2 - rr] = bS[...]
            return ()
        jax.lax.fori_loop(0, B - 1, resub, (), unroll=False)

        def fsub(r, _):
            i_row = b * B + r + 1                        # 1-based
            live = (i_row <= lds)
            Mv, Iv, Dv = fM[...], fI[...], fD[...]
            S = fS[...]
            fN0, fB0, fC0, fled0 = (S[:, 0:1], S[:, 1:2],
                                    S[:, 2:3], S[:, 3:4])
            e = emis_row(i_row)
            src = shift1(Mv * t_mm + Iv * t_im + Dv * t_dm) + fB0 * bm
            Mrow = src * e
            Irow = Mv * t_mi + Iv * t_ii
            Drow = dchain_fwd(Mrow)
            E = (jnp.sum(Mrow, axis=1, keepdims=True)
                 + jnp.sum(Drow, axis=1, keepdims=True))
            Cn = fC0 * ploop + E
            Nn = fN0 * ploop
            Bn = Nn * pmove
            scale = jnp.maximum(
                jnp.max(Mrow, axis=1, keepdims=True),
                jnp.maximum(Cn, jnp.maximum(Nn, SCALE_FLOOR)))
            _, inv, kexp = po2_scale(scale)
            fM[...] = jnp.where(live, Mrow * inv, Mv)
            fI[...] = jnp.where(live, Irow * inv, Iv)
            fD[...] = jnp.where(live, Drow * inv, Dv)
            fled1 = fled0 + kexp
            fS[...] = jnp.where(
                live,
                jnp.concatenate(
                    [Nn * inv, Bn * inv, Cn * inv, fled1,
                     jnp.zeros((QT, 4), jnp.float32)], axis=1),
                S)

            # posterior rows for row i_row (backward side from slot r)
            bMr_ = blM[r]
            bIr_ = blI[r]
            bSr_ = blS[r]
            bN_i, bC_i, bled_i = (bSr_[:, 0:1], bSr_[:, 1:2],
                                  bSr_[:, 2:3])
            sc = jnp.exp((fled1 + bled_i) * LN2 - Zlog)
            ppM = jnp.where(kmask, fM[...] * bMr_ * sc, 0.0)
            ppI = jnp.where(imask, fI[...] * bIr_ * sc, 0.0)
            scN = jnp.exp((fled0 + bled_i) * LN2 - Zlog)
            ppN = fN0 * ploop * bN_i * scN
            ppC = fC0 * ploop * bC_i * scN

            # ---- OA fill row i_row (align_ref.oa_fill semantics,
            # double-float accumulation) ----
            pM0h, pI0h, pD0h = oaM[...], oaI[...], oaD[...]
            pM0l, pI0l, pD0l = oaMl[...], oaIl[...], oaDl[...]
            oS = oaS[...]
            oN0, oC0, mm0 = oS[:, 0:1], oS[:, 1:2], oS[:, 2:3]
            oN0l, oC0l = oS[:, 3:4], oS[:, 4:5]
            c_mmh, c_mml = df_shift1(pM0h, pM0l)
            c_imh, c_iml = df_shift1(pI0h, pI0l)
            c_dmh, c_dml = df_shift1(pD0h, pD0l)
            c_bh = jnp.broadcast_to(oN0, (QT, Mp))   # B[i-1] = N[i-1]
            c_bl = jnp.broadcast_to(oN0l, (QT, Mp))
            ch, cl = df_max(c_mmh, c_mml, c_imh, c_iml)
            ch, cl = df_max(ch, cl, c_dmh, c_dml)
            ch, cl = df_max(ch, cl, c_bh, c_bl)
            Mxh, Mxl = df_add_f32(ch, cl, ppM)
            Mxh = jnp.where(kmask, Mxh, NEG)
            Mxl = jnp.where(kmask, Mxl, 0.0)
            pm = jnp.where(
                df_eq(c_mmh, c_mml, ch, cl), 0,
                jnp.where(df_eq(c_imh, c_iml, ch, cl), 1,
                          jnp.where(df_eq(c_dmh, c_dml, ch, cl), 2,
                                    3))).astype(jnp.int32)
            m_M = pair_margin(
                (ch, cl), [(c_mmh, c_mml), (c_imh, c_iml),
                           (c_dmh, c_dml), (c_bh, c_bl)], kmask)
            cih, cil = df_max(pM0h, pM0l, pI0h, pI0l)
            Ixh, Ixl = df_add_f32(cih, cil, ppI)
            Ixh = jnp.where(imask, Ixh, NEG)
            Ixl = jnp.where(imask, Ixl, 0.0)
            pi_ = jnp.where(df_ge(pM0h, pM0l, pI0h, pI0l), 0,
                            1).astype(jnp.int32)      # 0 = from M
            m_I = pair_margin((cih, cil),
                              [(pM0h, pM0l), (pI0h, pI0l)], imask)
            sM1h, sM1l = df_shift1(Mxh, Mxl)
            Dxh, Dxl = df_cummax(sM1h, sM1l)
            Dxh = jnp.where(dmask, Dxh, NEG)
            Dxl = jnp.where(dmask, Dxl, 0.0)
            sD1h, sD1l = df_shift1(Dxh, Dxl)
            pd = jnp.where(df_ge(sM1h, sM1l, sD1h, sD1l), 0,
                           1).astype(jnp.int32)       # 0 = from M
            dbh, dbl = df_max(sM1h, sM1l, sD1h, sD1l)
            m_D = pair_margin((dbh, dbl),
                              [(sM1h, sM1l), (sD1h, sD1l)], dmask)
            # E: first max over k of (M then D), lexicographic
            cEh, cEl = df_max(Mxh, Mxl, Dxh, Dxl)
            cEh = jnp.where(kmask, cEh, NEG)
            cEl = jnp.where(kmask, cEl, 0.0)
            rh = jnp.max(cEh, axis=1, keepdims=True)
            at_h = cEh == rh
            rl = jnp.max(jnp.where(at_h, cEl, NEG), axis=1,
                         keepdims=True)
            isbest = jnp.logical_and(at_h, cEl == rl)
            kE = jnp.min(jnp.where(isbest, lane, Mp + 1), axis=1,
                         keepdims=True)
            nbest = jnp.sum(isbest.astype(jnp.int32), axis=1,
                            keepdims=True)
            blw = df_gt(rh, rl, cEh, cEl)
            s2h = jnp.max(jnp.where(blw, cEh, NEG), axis=1,
                          keepdims=True)
            s2l = jnp.max(
                jnp.where(jnp.logical_and(blw, cEh == s2h), cEl, NEG),
                axis=1, keepdims=True)
            m_E = jnp.where(jnp.logical_or(nbest > 1, s2h == NEG),
                            jnp.inf, (rh - s2h) + (rl - s2l))
            MxkEh = jnp.max(jnp.where(lane == kE, Mxh, NEG), axis=1,
                            keepdims=True)
            MxkEl = jnp.max(jnp.where(lane == kE, Mxl, NEG), axis=1,
                            keepdims=True)
            eIsD = df_gt(rh, rl, MxkEh, MxkEl).astype(jnp.float32)
            m_ED = jnp.where(df_eq(MxkEh, MxkEl, rh, rl), jnp.inf,
                             (rh - MxkEh) + (rl - MxkEl))
            clh, cll = df_add_f32(oC0, oC0l, ppC)
            cge = df_ge(clh, cll, rh, rl)
            Cnh = jnp.where(cge, clh, rh)
            Cnl = jnp.where(cge, cll, rl)
            cbit = cge.astype(jnp.float32)
            m_C = jnp.where(df_eq(clh, cll, rh, rl), jnp.inf,
                            jnp.abs((clh - rh) + (cll - rl)))
            Nnh, Nnl = df_add_f32(oN0, oN0l, ppN)
            newmm = jnp.minimum(
                jnp.minimum(jnp.minimum(mm0, m_M), jnp.minimum(m_I,
                                                               m_D)),
                jnp.minimum(jnp.minimum(m_E, m_C), m_ED))
            oaM[...] = jnp.where(live, Mxh, pM0h)
            oaI[...] = jnp.where(live, Ixh, pI0h)
            oaD[...] = jnp.where(live, Dxh, pD0h)
            oaMl[...] = jnp.where(live, Mxl, pM0l)
            oaIl[...] = jnp.where(live, Ixl, pI0l)
            oaDl[...] = jnp.where(live, Dxl, pD0l)
            oaS[...] = jnp.where(
                live,
                jnp.concatenate(
                    [Nnh, Cnh, newmm, Nnl, Cnl,
                     jnp.zeros((QT, 3), jnp.float32)], axis=1),
                oS)
            # pointer byte: bits0-1 pm, bit2 pi, bit3 pd
            pbyte = (pm + pi_ * 4 + pd * 8).astype(jnp.int8)
            ptr[pl.ds(i_row - 1, 1)] = pbyte.reshape(1, QT, Mp)
            rowi[pl.ds(i_row - 1, 1)] = jnp.concatenate(
                [kE.astype(jnp.float32), eIsD, cbit,
                 jnp.zeros((QT, 5), jnp.float32)],
                axis=1).reshape(1, QT, 8)
            return ()
        jax.lax.fori_loop(0, B, fsub, (), unroll=False)
        return ()

    jax.lax.fori_loop(0, NB, bpass_block, (), unroll=False)
    if debug_ptr:
        dptr_ref[0] = ptr[...]
        drow_ref[0] = rowi[...]
        dck_ref[0] = ckS[...]
        dckM_ref[0] = ckM[...]

    # ---------------- pass C: traceback per pair ----------------------
    # Mosaic has no dynamic-lane gather/scatter, so: the pair loop is a
    # STATIC python unroll (s fixed per copy), pointer bytes are read as
    # [1, Mp] rows with one-hot lane extraction, and cols is laid out
    # [Ld, QT] so the dynamic row index sits on the sublane dim.
    cols_ref[0] = jnp.full((Ld, QT), -1, jnp.int32)
    oSf = oaS[...]
    stat_ref[0] = jnp.concatenate(
        [oSf[:, 2:3], jnp.zeros((QT, 1), jnp.float32), Zlog,
         jnp.zeros((QT, 5), jnp.float32)], axis=1)

    for s in range(QT):
        ld_s = lds[s, 0]

        # states: 0=C 1=E 2=M 3=I 4=D 5=N
        def cond(c):
            i, k, st, steps, dead = c
            return jnp.logical_and(
                jnp.logical_not(jnp.logical_and(st == 5, i == 0)),
                jnp.logical_and(steps < 2 * Ld + Mp + 16, dead == 0))

        def step(c):
            i, k, st, steps, dead = c
            row = jnp.maximum(i, 1) - 1
            ri = rowi[pl.ds(row, 1), s]                   # [1, 8]
            kE = ri[0, 0].astype(jnp.int32)
            eisd = ri[0, 1]
            cbit = ri[0, 2]
            prow = ptr[pl.ds(row, 1), s].astype(jnp.int32)  # [1, Mp]
            pbk = jnp.sum(jnp.where(lane == k, prow, 0))
            pm = jax.lax.rem(pbk, 4)
            pi_ = jax.lax.rem(pbk // 4, 2)
            pd = jax.lax.rem(pbk // 8, 2)

            ni, nk, nst = i, k, st
            rec = jnp.int32(-2)
            is_c = st == 0
            c_loop = jnp.logical_and(is_c,
                                     jnp.logical_and(i > 0, cbit > 0.5))
            nst = jnp.where(is_c, jnp.where(c_loop, 0, 1), nst)
            ni = jnp.where(c_loop, i - 1, ni)
            is_e = st == 1
            nst = jnp.where(is_e, jnp.where(eisd > 0.5, 4, 2), nst)
            nk = jnp.where(is_e, kE, nk)
            is_m = st == 2
            rec = jnp.where(jnp.logical_and(is_m, i > 0), k - 1, rec)
            mst = jnp.where(pm == 0, 2,
                            jnp.where(pm == 1, 3,
                                      jnp.where(pm == 2, 4, 5)))
            nst = jnp.where(is_m, mst, nst)
            nk = jnp.where(is_m, jnp.where(pm == 3, 0, k - 1), nk)
            ni = jnp.where(is_m, i - 1, ni)
            is_i = st == 3
            nst = jnp.where(is_i, jnp.where(pi_ == 0, 2, 3), nst)
            ni = jnp.where(is_i, i - 1, ni)
            is_d = st == 4
            nst = jnp.where(is_d, jnp.where(pd == 0, 2, 4), nst)
            nk = jnp.where(is_d, k - 1, nk)
            is_n = st == 5
            ni = jnp.where(is_n, i - 1, ni)
            dead = jnp.where(jnp.logical_or(ni < 0, nk < 0), 1, dead)

            @pl.when(rec > jnp.int32(-2))
            def _():
                cols_ref[0, pl.ds(row, 1), s:s + 1] = rec.reshape(1, 1)
            return (ni, nk, nst, steps + 1, dead)

        dead0 = jnp.where(ld_s > 0, jnp.int32(0), jnp.int32(1))
        fi, fk, fst, fsteps, fdead = jax.lax.while_loop(
            cond, step, (ld_s, jnp.int32(0), jnp.int32(0),
                         jnp.int32(0), dead0))
        ok = jnp.logical_and(jnp.logical_and(fst == 5, fi == 0),
                             fdead == 0)
        stat_ref[0, s:s + 1, 1:2] = ok.astype(jnp.float32).reshape(1, 1)
        stat_ref[0, s:s + 1, 3:4] = fsteps.astype(
            jnp.float32).reshape(1, 1)


@functools.partial(jax.jit,
                   static_argnames=("QT", "B", "interpret",
                                    "debug_ptr"))
def pallas_oa(model_of, ms_arr, emT, trans, codesT, pmove, lds,
              QT=16, B=32, interpret=False, debug_ptr=False):
    """Batched fused posterior+OA+traceback.

    model_of [T] i32 (scalar prefetch: bank row per tile); ms_arr [T]
    i32 (M per tile); emT [H, 128, Mp] f32; trans [H, 8, Mp] f32;
    codesT [T, Ld, QT] i32; pmove/lds [T*QT, 1].
    Returns (cols [T, Ld, QT] i32, stat [T, QT, 8] f32).
    """
    H, _, Mp = emT.shape
    T, Ld, _ = codesT.shape
    # emission-row cache: one HIGHEST-precision matmul per row instead
    # of three; skipped when the cache alone would crowd VMEM
    cache_emis = Ld * QT * Mp * 4 <= 40 * 1024 * 1024
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Ld, QT), lambda t, m, ms: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, 1), lambda t, m, ms: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, 1), lambda t, m, ms: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, Mp), lambda t, m, ms: (m[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Mp), lambda t, m, ms: (m[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Ld, QT), lambda t, m, ms: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, 8), lambda t, m, ms: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1, Ld, QT, Mp), lambda t, m, ms: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ld, QT, 8), lambda t, m, ms: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ld // B, QT, 8),
                         lambda t, m, ms: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ld // B, QT, Mp),
                         lambda t, m, ms: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] if debug_ptr else []),
        scratch_shapes=[
            pltpu.VMEM((QT, Mp), jnp.float32),          # fM
            pltpu.VMEM((QT, Mp), jnp.float32),          # fI
            pltpu.VMEM((QT, Mp), jnp.float32),          # fD
            pltpu.VMEM((QT, 8), jnp.float32),           # fS
            pltpu.VMEM((QT, Mp), jnp.float32),          # bM
            pltpu.VMEM((QT, Mp), jnp.float32),          # bI
            pltpu.VMEM((QT, 8), jnp.float32),           # bS
            pltpu.VMEM((Ld // B, QT, Mp), jnp.float32),  # ckM
            pltpu.VMEM((Ld // B, QT, Mp), jnp.float32),  # ckI
            pltpu.VMEM((Ld // B, QT, 8), jnp.float32),   # ckS
            pltpu.VMEM((B, QT, Mp), jnp.float32),        # blM
            pltpu.VMEM((B, QT, Mp), jnp.float32),        # blI
            pltpu.VMEM((B, QT, 8), jnp.float32),         # blS
            pltpu.VMEM((QT, Mp), jnp.float32),           # oaM
            pltpu.VMEM((QT, Mp), jnp.float32),           # oaI
            pltpu.VMEM((QT, Mp), jnp.float32),           # oaD
            pltpu.VMEM((QT, Mp), jnp.float32),           # oaMl
            pltpu.VMEM((QT, Mp), jnp.float32),           # oaIl
            pltpu.VMEM((QT, Mp), jnp.float32),           # oaDl
            pltpu.VMEM((QT, 8), jnp.float32),            # oaS
            pltpu.VMEM((Ld, QT, Mp), jnp.int8),          # ptr
            pltpu.VMEM((Ld, QT, 8), jnp.float32),        # rowi
        ] + ([pltpu.VMEM((Ld, QT, Mp), jnp.float32)]      # eR cache
             if cache_emis else []),
    )
    return pl.pallas_call(
        functools.partial(_oa_kernel, Ld=Ld, Mp=Mp, QT=QT, B=B,
                          debug_ptr=debug_ptr),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, Ld, QT), jnp.int32),
                   jax.ShapeDtypeStruct((T, QT, 8), jnp.float32)]
        + ([jax.ShapeDtypeStruct((T, Ld, QT, Mp), jnp.int8),
            jax.ShapeDtypeStruct((T, Ld, QT, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, Ld // B, QT, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, Ld // B, QT, Mp), jnp.float32)]
           if debug_ptr else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(model_of, ms_arr, codesT, pmove, lds, emT, trans)


def bank_strictly_positive(bank) -> bool:
    """True when every in-range core transition is > 0, i.e. the
    FLT_MIN deltas of the host OA spec reduce to lane masks (always
    the case for prior-smoothed hmm/build.py output)."""
    ok = True
    for h in range(bank.H):
        M = int(bank.M[h])
        ok = ok and bool(
            (bank.t_mm[h, 1:M] > 0).all()
            and (bank.t_im[h, 1:M] > 0).all()
            and (bank.t_dm[h, 1:M] > 0).all()
            and (bank.t_mi[h, 1:M] > 0).all()
            and (bank.t_ii[h, 1:M] > 0).all()
            and (bank.t_md[h, 1:M] > 0).all()
            and (bank.t_dd[h, 1:M] > 0).all()
            and (bank.bm[h, 1:M + 1] > 0).all())
        if not ok:
            break
    return ok


def oa_columns_device(banks, bank_row, pairs: Sequence[Tuple[int,
                                                             np.ndarray]],
                      QT: int = 16, B: int = 32, Ldmax: int = None,
                      interpret: bool = False):
    """Device fused posterior+OA for (hmm_idx, codes) pairs.

    banks: list of unihit ProfileBanks; bank_row: {hmm_idx: (bi, row)}.
    Returns (cols list [len(codes)] i32 or None-for-pad, margins [n],
    ok [n] bool) in input order. Caller re-aligns pairs with
    ok=False or margin < guard on the host engine.
    """
    from .pallas_forward import device_bank_arrays
    n = len(pairs)
    if n == 0:
        return [], np.zeros(0), np.zeros(0, bool)
    if Ldmax is None:
        Ldmax = max(len(c) for _, c in pairs)
    Ldmax = max(B, 64, -(-Ldmax // 64) * 64)
    assert Ldmax % B == 0

    import os
    import time as _time
    prof = bool(os.environ.get("WITCH_TPU_OA_PROFILE"))
    t_pack = t_disp = t_unpack = 0.0
    cols_out: list = [None] * n
    margins = np.zeros(n)
    oks = np.zeros(n, bool)

    # group pairs by bank, then by model row (tiles of <= QT pairs)
    by_bank = {}
    for p, (idx, codes) in enumerate(pairs):
        bi, row = bank_row[idx]
        by_bank.setdefault(bi, []).append((row, p))
    for bi, plist in sorted(by_bank.items()):
        bank = banks[bi]
        emTj, transj, _ = device_bank_arrays(bank)
        plist.sort(key=lambda rp: rp[0])
        tiles = []
        for row, p in plist:
            if tiles and tiles[-1][0] == row and len(tiles[-1][1]) < QT:
                tiles[-1][1].append(p)
            else:
                tiles.append((row, [p]))
        T = len(tiles)
        TB = T if interpret else 128
        gaps = np.where(np.abs(bank.em_odds).sum(axis=(0, 1)) == 0)[0]
        pad_code = int(gaps[0]) if len(gaps) else 4
        for c0 in range(0, T, TB):
            t0_ = _time.time()
            chunk = tiles[c0:c0 + TB]
            codesT = np.full((TB, Ldmax, QT), pad_code, np.int32)
            pmove = np.full((TB * QT, 1), 0.5, np.float32)
            lds = np.zeros((TB * QT, 1), np.int32)
            model_of = np.zeros(TB, np.int32)
            ms_arr = np.ones(TB, np.int32)
            for t, (row, ps) in enumerate(chunk):
                model_of[t] = row
                ms_arr[t] = int(bank.M[row])
                for s, p in enumerate(ps):
                    c = pairs[p][1]
                    codesT[t, :len(c), s] = c
                    lds[t * QT + s, 0] = len(c)
                    pmove[t * QT + s, 0] = 2.0 / (float(len(c)) + 2.0)
            t1_ = _time.time()
            cols, stat = pallas_oa(
                jnp.asarray(model_of), jnp.asarray(ms_arr), emTj,
                transj, jnp.asarray(codesT), jnp.asarray(pmove),
                jnp.asarray(lds), QT=QT, B=B, interpret=interpret)
            cols = np.asarray(cols)
            stat = np.asarray(stat)
            t2_ = _time.time()
            t_pack += t1_ - t0_
            t_disp += t2_ - t1_
            for t, (row, ps) in enumerate(chunk):
                for s, p in enumerate(ps):
                    L = len(pairs[p][1])
                    cols_out[p] = cols[t, :L, s].astype(np.int64)
                    margins[p] = stat[t, s, 0]
                    oks[p] = stat[t, s, 1] > 0.5
            t_unpack += _time.time() - t2_
    if prof:
        print("oa_columns_device: pack %.2fs dispatch %.2fs unpack "
              "%.2fs (%d pairs)" % (t_pack, t_disp, t_unpack, n),
              flush=True)
    return cols_out, margins, oks
