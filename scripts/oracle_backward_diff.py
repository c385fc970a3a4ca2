"""Calibration harness: oracle p7_Backward vs our exact-f32 backward,
cell-by-cell.  Usage: python scripts/oracle_backward_diff.py [m] [q]"""

import ctypes
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from make_bench_assets import load_banks  # noqa: E402

from witch_tpu.native import _domaindef, icc_libm, set_trace_alphabet  # noqa: E402

ESL_DNA_ORDER = "ACGT-RYMKSWHBVDN"
c = ctypes
CF = ctypes.CFUNCTYPE


def main():
    midx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    qidx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    syms = icc_libm.load_full()
    assert syms
    p7_hmmfile_OpenE = CF(c.c_int, c.c_char_p, c.c_char_p,
                          c.POINTER(c.c_void_p), c.c_void_p)(
                              syms["p7_hmmfile_OpenE"])
    p7_hmmfile_Read = CF(c.c_int, c.c_void_p, c.POINTER(c.c_void_p),
                         c.POINTER(c.c_void_p))(syms["p7_hmmfile_Read"])
    p7_bg_Create = CF(c.c_void_p, c.c_void_p)(syms["p7_bg_Create"])
    p7_profile_Create = CF(c.c_void_p, c.c_int, c.c_void_p)(
        syms["p7_profile_Create"])
    p7_ProfileConfig = CF(c.c_int, c.c_void_p, c.c_void_p, c.c_void_p,
                          c.c_int, c.c_int)(syms["p7_ProfileConfig"])
    p7_oprofile_Create = CF(c.c_void_p, c.c_int, c.c_void_p)(
        syms["p7_oprofile_Create"])
    p7_oprofile_Convert = CF(c.c_int, c.c_void_p, c.c_void_p)(
        syms["p7_oprofile_Convert"])
    p7_oprofile_ReconfigLength = CF(c.c_int, c.c_void_p, c.c_int)(
        syms["p7_oprofile_ReconfigLength"])
    p7_omx_Create = CF(c.c_void_p, c.c_int, c.c_int, c.c_int)(
        syms["p7_omx_Create"])
    p7_Forward = CF(c.c_int, c.c_char_p, c.c_int, c.c_void_p,
                    c.c_void_p, c.POINTER(c.c_float))(syms["p7_Forward"])
    p7_Backward = CF(c.c_int, c.c_char_p, c.c_int, c.c_void_p,
                     c.c_void_p, c.c_void_p, c.POINTER(c.c_float))(
                         syms["p7_Backward"])

    from witch_tpu.core.alignment import PackedAlignment, subset_counts
    from witch_tpu.core.alphabet import ALPHABETS
    from witch_tpu.core.tree import decompose_backbone
    from witch_tpu.hmm.build import build_hmm, quantize_like_text
    from witch_tpu.hmm.profile import configure
    from witch_tpu.io.hmmer_text import write_hmm
    DATA = "/root/reference/examples/data"
    subsets = decompose_backbone(os.path.join(DATA, "backbone.tre"),
                                 max_size=10)
    bb = PackedAlignment.from_fasta(
        os.path.join(DATA, "backbone.aln.fasta.gz"), molecule="dna")
    rows, retained, _ = subset_counts(bb, subsets[midx])
    sub = PackedAlignment([bb.names[r] for r in rows],
                          bb.codes[rows][:, retained], bb.alphabet)
    core = build_hmm(sub.codes, sub.alphabet, "dna", name="m%d" % midx)
    hmm_path = "/tmp/oracle_bwd_m%d.hmm" % midx
    write_hmm(core, hmm_path)
    prof = configure(quantize_like_text(core), multihit=True)
    M = prof.M

    banks, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
    codes, lens = z["codes"], z["lens"]
    L = int(lens[qidx])
    q = np.ascontiguousarray(codes[qidx, :L], np.int32)
    print("model %d M=%d  query %d L=%d" % (midx, M, qidx, L))

    hfp = c.c_void_p()
    assert p7_hmmfile_OpenE(hmm_path.encode(), None, c.byref(hfp),
                            None) == 0
    abc = c.c_void_p(); hmm = c.c_void_p()
    assert p7_hmmfile_Read(hfp, c.byref(abc), c.byref(hmm)) == 0
    bg = p7_bg_Create(abc)
    gm = p7_profile_Create(M, abc)
    assert p7_ProfileConfig(hmm, bg, gm, L, 1) == 0
    om = p7_oprofile_Create(M, abc)
    assert p7_oprofile_Convert(gm, om) == 0
    assert p7_oprofile_ReconfigLength(om, L) == 0

    alpha = ALPHABETS["dna"]
    ours_to_esl = np.full(alpha.num_codes, 15, np.uint8)
    for i, ch in enumerate(ESL_DNA_ORDER):
        ours_to_esl[int(alpha.encode(ch)[0])] = i
    dsq = np.zeros(L + 2, np.uint8)
    dsq[0] = 127; dsq[L + 1] = 127
    dsq[1:L + 1] = ours_to_esl[q]

    Qs = max(2, (M + 3) // 4)
    oxf = p7_omx_Create(M, L, L)
    oxb = p7_omx_Create(M, L, L)
    fsc = c.c_float(); bsc = c.c_float()
    assert p7_Forward(dsq.tobytes(), L, om, oxf, c.byref(fsc)) == 0
    rc = p7_Backward(dsq.tobytes(), L, om, oxf, oxb, c.byref(bsc))
    assert rc == 0, rc
    print("oracle fwd %.6f bck %.6f" % (fsc.value, bsc.value))

    def read_omx(ox):
        dpf = c.cast(c.c_void_p(ox + 8), c.POINTER(c.c_void_p))[0]
        rowptr = c.cast(dpf, c.POINTER(c.c_void_p))
        xmxp = c.cast(c.c_void_p(ox + 0x48), c.POINTER(c.c_void_p))[0]
        xmx = np.ctypeslib.as_array(
            c.cast(xmxp, c.POINTER(c.c_float)), shape=(L + 1, 6)).copy()
        dp = np.zeros((L + 1, Qs * 12), np.float32)
        for i in range(L + 1):
            dp[i] = np.ctypeslib.as_array(
                c.cast(rowptr[i], c.POINTER(c.c_float)),
                shape=(Qs * 12,))
        return dp, xmx

    odp, oxmx = read_omx(oxb)

    set_trace_alphabet("dna")
    args = [np.ascontiguousarray(prof.msc, np.float64)] + [
        np.ascontiguousarray(getattr(prof, a), np.float64)
        for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                  "t_dm", "t_dd", "bm")]
    mdp, mxmx = _domaindef.dbg_f32_backward(*args, q, L)
    mdp = np.asarray(mdp); mxmx = np.asarray(mxmx)

    bad_x = (mxmx.view(np.uint32) != oxmx.view(np.uint32))
    bad_d = (mdp.view(np.uint32) != odp.view(np.uint32))
    print("xmx cells differing: %d/%d" % (bad_x.sum(), bad_x.size))
    print("dp  cells differing: %d/%d" % (bad_d.sum(), bad_d.size))
    rows_bad = sorted(set(np.argwhere(bad_x)[:, 0]) |
                      set(np.argwhere(bad_d)[:, 0]), reverse=True)
    if rows_bad:
        r0 = rows_bad[0]   # backward fills from L down: highest bad row
        print("highest bad row:", r0, "of L =", L)
        bx = np.argwhere(bad_x[r0]).ravel()
        if len(bx):
            print("  xmx lanes:", bx, "oracle", oxmx[r0][bx],
                  "ours", mxmx[r0][bx])
        bd = np.argwhere(bad_d[r0]).ravel()[:10]
        for wi in bd:
            qq, rem = divmod(int(wi), 12)
            vec, zz = divmod(rem, 4)
            print("  dp q=%d %s z=%d: oracle=%r ours=%r"
                  % (qq, "MDI"[vec], zz, odp[r0][wi], mdp[r0][wi]))


if __name__ == "__main__":
    main()
