"""Calibration harness: compare our exact-f32 striped profile
(_domaindef.dbg_oprofile) against the oracle binary's own
p7_ProfileConfig + p7_oprofile_Convert output, lane by lane.

Loads the bundled hmmsearch image in-process (witch_tpu/native/icc_libm
loader + relocations) and calls its profile-build chain on a .hmm text
file written by our hmm writer — the exact interop the gate emulates
(reference contract witch_msa/gcmm/algorithm.py:524-605).

Usage: python scripts/oracle_profile_diff.py [model_index] [L]
"""

import ctypes
import os
import struct
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from make_bench_assets import load_banks, load_profile_row  # noqa: E402

from witch_tpu.native import _domaindef, icc_libm, set_trace_alphabet  # noqa: E402


def main():
    midx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    syms = icc_libm.load_full()
    assert syms, "could not load the oracle image"

    CF = ctypes.CFUNCTYPE
    c = ctypes
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

    # write our model as .hmm text (the same artifact the reference's
    # hmmsearch consumes)
    banks, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
    # rebuild the CoreHMM for midx from the example decomposition
    from witch_tpu.core.alignment import PackedAlignment, subset_counts
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
    hmm_path = "/tmp/oracle_diff_m%d.hmm" % midx
    write_hmm(core, hmm_path)
    core_q = quantize_like_text(core)
    prof = configure(core_q, multihit=True)
    M = prof.M
    print("model %d: M=%d" % (midx, M))

    # oracle chain
    hfp = c.c_void_p()
    rc = p7_hmmfile_OpenE(hmm_path.encode(), None, c.byref(hfp), None)
    assert rc == 0, rc
    abc = c.c_void_p()
    hmm = c.c_void_p()
    rc = p7_hmmfile_Read(hfp, c.byref(abc), c.byref(hmm))
    assert rc == 0, rc
    hmm_M = c.cast(hmm, c.POINTER(c.c_int))[0]
    assert hmm_M == M, (hmm_M, M)
    bg = p7_bg_Create(abc)
    gm = p7_profile_Create(hmm_M, abc)
    rc = p7_ProfileConfig(hmm, bg, gm, L, 1)   # p7_LOCAL (multihit)
    assert rc == 0, rc
    om = p7_oprofile_Create(hmm_M, abc)
    rc = p7_oprofile_Convert(gm, om)
    assert rc == 0, rc
    rc = p7_oprofile_ReconfigLength(om, L)
    assert rc == 0, rc

    # read om arrays: rfv(float**) at +0x50, tfv(__m128*) at +0x58,
    # xf float[4][2] at +0x60, M int at +0x19c, nj float at +0x1b8
    omv = om
    Mo = c.cast(omv + 0x19c, c.POINTER(c.c_int))[0]
    Q = max(2, (Mo + 3) // 4)
    tfv_ptr = c.cast(omv + 0x58, c.POINTER(c.c_void_p))[0]
    tfv = np.ctypeslib.as_array(
        c.cast(tfv_ptr, c.POINTER(c.c_float)), shape=(8 * Q, 4)).copy()
    rfv_pp = c.cast(omv + 0x50, c.POINTER(c.c_void_p))
    Kp = 18   # eslDNA Kp
    rfv = np.zeros((Kp, Q * 4), np.float32)
    rfv_tab = c.cast(rfv_pp[0], c.POINTER(c.c_void_p))
    for x in range(Kp):
        rfv[x] = np.ctypeslib.as_array(
            c.cast(rfv_tab[x], c.POINTER(c.c_float)), shape=(Q * 4,))
    xf = np.ctypeslib.as_array(
        c.cast(omv + 0x60, c.POINTER(c.c_float)), shape=(4, 2)).copy()

    # ours
    set_trace_alphabet("dna")
    args = [np.ascontiguousarray(prof.msc, np.float64)] + [
        np.ascontiguousarray(getattr(prof, a), np.float64)
        for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                  "t_dm", "t_dd", "bm")]
    Qo, my_rfv, my_tfv, my_xf = _domaindef.dbg_oprofile(*args, L)
    assert Qo == Q, (Qo, Q)

    def cmp(name, a, b):
        a = np.asarray(a); b = np.asarray(b)
        same = (a.view(np.uint32) == b.view(np.uint32))
        n_bad = int((~same).sum())
        print("%-8s: %d/%d lanes differ" % (name, n_bad, same.size))
        if n_bad:
            idx = np.argwhere(~same)[:8]
            for w in idx:
                w = tuple(w)
                print("   ", w, "oracle=%r ours=%r" % (b[w], a[w]))
        return n_bad

    # our code order -> eslDNA code order for rfv rows:
    # ours: 0..3 ACGT, 4 gap, 5.. sorted degen letters
    # eslDNA: 0..3 ACGT, 4 '-',  5.. RYMKSWHBVDN then *, ~
    from witch_tpu.core.alphabet import ALPHABETS
    alpha = ALPHABETS["dna"]
    esl_order = "ACGT-RYMKSWHBVDN"
    total = 0
    total += cmp("tfv", my_tfv, tfv)
    total += cmp("xf", my_xf, xf)
    for i, ch in enumerate(esl_order):
        code = int(alpha.encode(ch)[0])
        total += cmp("rfv[%s]" % ch, np.asarray(my_rfv)[code], rfv[i])
    print("TOTAL differing lanes:", total)


if __name__ == "__main__":
    main()
