"""Per-pair gate oracle: drive the bundled hmmsearch's OWN pipeline
stages in-process (ForwardParser -> BackwardParser ->
p7_domaindef_ByPosteriorHeuristics) and report its domain-definition
results for (model, query) pairs — the exact decisions behind the
reporting gate (reference contract witch_msa/gcmm/algorithm.py:524-605).

Used to calibrate/verify the native engine's gate emulation pair by
pair without text-parsing hmmsearch output.

Usage:
  python scripts/oracle_gate.py scan  MODEL_IDX QUERY_IDX   # find ddef offsets
  python scripts/oracle_gate.py diff  MODEL_IDX             # all queries vs ours
"""

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


class Oracle:
    """In-process driver of the oracle binary's gate pipeline."""

    def __init__(self, hmm_path: str):
        syms = icc_libm.load_full()
        assert syms, "could not load the oracle image"
        S = syms
        self.p7_hmmfile_OpenE = CF(c.c_int, c.c_char_p, c.c_char_p,
                                   c.POINTER(c.c_void_p), c.c_void_p)(
                                       S["p7_hmmfile_OpenE"])
        self.p7_hmmfile_Read = CF(c.c_int, c.c_void_p,
                                  c.POINTER(c.c_void_p),
                                  c.POINTER(c.c_void_p))(
                                      S["p7_hmmfile_Read"])
        self.p7_bg_Create = CF(c.c_void_p, c.c_void_p)(S["p7_bg_Create"])
        self.p7_bg_SetLength = CF(c.c_int, c.c_void_p, c.c_int)(
            S["p7_bg_SetLength"])
        self.p7_profile_Create = CF(c.c_void_p, c.c_int, c.c_void_p)(
            S["p7_profile_Create"])
        self.p7_ProfileConfig = CF(c.c_int, c.c_void_p, c.c_void_p,
                                   c.c_void_p, c.c_int, c.c_int)(
                                       S["p7_ProfileConfig"])
        self.p7_oprofile_Create = CF(c.c_void_p, c.c_int, c.c_void_p)(
            S["p7_oprofile_Create"])
        self.p7_oprofile_Convert = CF(c.c_int, c.c_void_p, c.c_void_p)(
            S["p7_oprofile_Convert"])
        self.p7_oprofile_ReconfigLength = CF(c.c_int, c.c_void_p,
                                             c.c_int)(
            S["p7_oprofile_ReconfigLength"])
        self.p7_omx_Create = CF(c.c_void_p, c.c_int, c.c_int, c.c_int)(
            S["p7_omx_Create"])
        self.p7_omx_GrowTo = CF(c.c_int, c.c_void_p, c.c_int, c.c_int,
                                c.c_int)(S["p7_omx_GrowTo"])
        self.p7_omx_Reuse = CF(c.c_int, c.c_void_p)(S["p7_omx_Reuse"])
        self.p7_ForwardParser = CF(c.c_int, c.c_char_p, c.c_int,
                                   c.c_void_p, c.c_void_p,
                                   c.POINTER(c.c_float))(
                                       S["p7_ForwardParser"])
        self.p7_BackwardParser = CF(c.c_int, c.c_char_p, c.c_int,
                                    c.c_void_p, c.c_void_p, c.c_void_p,
                                    c.POINTER(c.c_float))(
                                        S["p7_BackwardParser"])
        self.esl_randomness_CreateFast = CF(c.c_void_p, c.c_uint)(
            S["esl_randomness_CreateFast"])
        self.p7_domaindef_Create = CF(c.c_void_p, c.c_void_p)(
            S["p7_domaindef_Create"])
        self.p7_domaindef_Reuse = CF(c.c_int, c.c_void_p)(
            S["p7_domaindef_Reuse"])
        self.p7_domaindef_ByPH = CF(
            c.c_int, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int)(
                S["p7_domaindef_ByPosteriorHeuristics"])
        self.esl_sq_CreateDigitalFrom = CF(
            c.c_void_p, c.c_void_p, c.c_char_p, c.c_char_p, c.c_long,
            c.c_char_p, c.c_char_p, c.c_char_p)(
                S["esl_sq_CreateDigitalFrom"])

        hfp = c.c_void_p()
        assert self.p7_hmmfile_OpenE(hmm_path.encode(), None,
                                     c.byref(hfp), None) == 0
        self.abc = c.c_void_p()
        hmm = c.c_void_p()
        assert self.p7_hmmfile_Read(hfp, c.byref(self.abc),
                                    c.byref(hmm)) == 0
        self.M = c.cast(hmm, c.POINTER(c.c_int))[0]
        self.bg = self.p7_bg_Create(self.abc)
        self.gm = self.p7_profile_Create(self.M, self.abc)
        assert self.p7_ProfileConfig(hmm, self.bg, self.gm, 100, 1) == 0
        self.om = self.p7_oprofile_Create(self.M, self.abc)
        assert self.p7_oprofile_Convert(self.gm, self.om) == 0
        self.oxf = self.p7_omx_Create(self.M, 0, 4096)
        self.oxb = self.p7_omx_Create(self.M, 0, 4096)
        self.fwd = self.p7_omx_Create(self.M, 64, 64)
        self.bck = self.p7_omx_Create(self.M, 64, 64)
        rng = self.esl_randomness_CreateFast(42)
        self.ddef = self.p7_domaindef_Create(rng)

    def run_pair(self, esl_dsq: np.ndarray, L: int):
        """Returns (rc, fwdsc, ddef_words int32[64]) after running the
        --max pipeline stages on one digitized query."""
        sq = self.esl_sq_CreateDigitalFrom(
            self.abc, b"q", esl_dsq.tobytes(), L, None, None, None)
        self.p7_domaindef_Reuse(self.ddef)
        self.p7_omx_Reuse(self.oxf)
        self.p7_omx_Reuse(self.oxb)
        self.p7_omx_Reuse(self.fwd)
        self.p7_omx_Reuse(self.bck)
        self.p7_bg_SetLength(self.bg, L)
        self.p7_oprofile_ReconfigLength(self.om, L)
        assert self.p7_omx_GrowTo(self.oxf, self.M, 0, L) == 0
        assert self.p7_omx_GrowTo(self.oxb, self.M, 0, L) == 0
        fsc = c.c_float()
        rc = self.p7_ForwardParser(esl_dsq.tobytes(), L, self.om,
                                   self.oxf, c.byref(fsc))
        assert rc == 0, rc
        rc = self.p7_BackwardParser(esl_dsq.tobytes(), L, self.om,
                                    self.oxf, self.oxb, None)
        assert rc == 0, rc
        rc = self.p7_domaindef_ByPH(sq, self.om, self.oxf, self.oxb,
                                    self.fwd, self.bck, self.ddef,
                                    self.bg, 0)
        words = np.ctypeslib.as_array(
            c.cast(c.c_void_p(self.ddef), c.POINTER(c.c_int32)),
            shape=(64,)).copy()
        return rc, fsc.value, words


def build_model(midx):
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
    hmm_path = "/tmp/oracle_gate_m%d.hmm" % midx
    write_hmm(core, hmm_path)
    return hmm_path, configure(quantize_like_text(core), multihit=True)


def esl_encode(q, alpha):
    ours_to_esl = np.full(alpha.num_codes, 15, np.uint8)
    for i, ch in enumerate(ESL_DNA_ORDER):
        ours_to_esl[int(alpha.encode(ch)[0])] = i
    L = len(q)
    dsq = np.zeros(L + 2, np.uint8)
    dsq[0] = 127
    dsq[L + 1] = 127
    dsq[1:L + 1] = ours_to_esl[q]
    return dsq


def main():
    mode = sys.argv[1]
    midx = int(sys.argv[2])
    if mode == "drill":
        drill(midx, int(sys.argv[3]))
        return
    if mode == "trace":
        trace_cmp(midx, int(sys.argv[3]), int(sys.argv[4]),
                  int(sys.argv[5]))
        return
    from witch_tpu.core.alphabet import ALPHABETS
    alpha = ALPHABETS["dna"]
    banks, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
    codes, lens = z["codes"], z["lens"]
    hmm_path, prof = build_model(midx)
    orc = Oracle(hmm_path)
    set_trace_alphabet("dna")
    args = [np.ascontiguousarray(prof.msc, np.float64)] + [
        np.ascontiguousarray(getattr(prof, a), np.float64)
        for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                  "t_dm", "t_dd", "bm")]

    if mode == "scan":
        qidx = int(sys.argv[3])
        q = np.ascontiguousarray(codes[qidx, :lens[qidx]], np.int32)
        rc, fsc, words = orc.run_pair(esl_encode(q, alpha), len(q))
        r = _domaindef.evaluate_targets(*args, [q], 42, 200, 1, 1)
        print("rc=%d fwdsc=%.4f ours nreg=%d nenv=%d"
              % (rc, fsc, r[0][0], r[1][0]))
        for off in range(64):
            print("%3d(0x%02x): %d" % (off * 4, off * 4, words[off]))
    elif mode == "diff":
        NREG_OFF = int(os.environ.get("DDEF_NREG", "-1"))
        NENV_OFF = int(os.environ.get("DDEF_NENV", "-1"))
        assert NREG_OFF >= 0 and NENV_OFF >= 0, "set DDEF_NREG/DDEF_NENV"
        Q = len(lens)
        qlist = [np.ascontiguousarray(codes[i, :lens[i]], np.int32)
                 for i in range(Q)]
        ours = _domaindef.evaluate_targets(*args, qlist, 42, 200, 1, 4)
        mism = []
        for i in range(Q):
            rc, fsc, words = orc.run_pair(
                esl_encode(qlist[i], alpha), int(lens[i]))
            o_nreg, o_nenv = words[NREG_OFF // 4], words[NENV_OFF // 4]
            gate_o = o_nreg > 0 and o_nenv > 0
            gate_m = ours[0][i] > 0 and ours[1][i] > 0
            if gate_o != gate_m or (o_nreg, o_nenv) != (ours[0][i],
                                                        ours[1][i]):
                mism.append((i, o_nreg, o_nenv, int(ours[0][i]),
                             int(ours[1][i]), gate_o != gate_m))
        print("pairs with (nreg, nenv) mismatch: %d/%d" % (len(mism), Q))
        ngate = sum(1 for m in mism if m[5])
        print("pairs with GATE mismatch: %d/%d" % (ngate, Q))
        for m in mism[:25]:
            print("  q=%d oracle=(%d,%d) ours=(%d,%d)%s"
                  % (m[0], m[1], m[2], m[3], m[4],
                     "  GATE FLIP" if m[5] else ""))


def drill(midx, qidx):
    """Single-pair drill-down: compare the oracle's posterior rows and
    region bounds against ours, and report our ensemble's cluster
    supports for the region."""
    from witch_tpu.core.alphabet import ALPHABETS
    alpha = ALPHABETS["dna"]
    banks, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
    codes, lens = z["codes"], z["lens"]
    hmm_path, prof = build_model(midx)
    orc = Oracle(hmm_path)
    set_trace_alphabet("dna")
    q = np.ascontiguousarray(codes[qidx, :lens[qidx]], np.int32)
    L = len(q)
    rc, fsc, words = orc.run_pair(esl_encode(q, alpha), L)
    print("oracle: nreg=%d nclustered=%d noverlaps=%d nenv=%d"
          % (words[0x8c // 4], words[0x90 // 4], words[0x94 // 4],
             words[0x98 // 4]))
    # oracle posterior rows
    def farr(off, n):
        p = c.cast(c.c_void_p(orc.ddef), c.POINTER(c.c_void_p))[off // 8]
        return np.ctypeslib.as_array(c.cast(p, c.POINTER(c.c_float)),
                                     shape=(n,)).copy()
    o_mocc = farr(0x00, L + 1)
    o_btot = farr(0x08, L + 1)
    o_etot = farr(0x10, L + 1)

    # our f64 posterior rows via the python spec path
    from witch_tpu.hmm import domaindef as dd
    _fwd, dB, dE, mocc = dd._posteriors_multihit(prof, q)
    regions_ours = dd.find_regions(mocc, dB, dE)
    # oracle regions recomputed from ITS rows (same thresholds)
    btot_d = np.diff(o_btot, prepend=0.0)
    etot_d = np.diff(o_etot, prepend=0.0)
    regions_oracle = dd.find_regions(
        o_mocc.astype(np.float64), btot_d.astype(np.float64),
        etot_d.astype(np.float64))
    print("regions ours  :", regions_ours)
    print("regions oracle:", regions_oracle)
    print("max |mocc diff|:", np.abs(
        o_mocc[1:] - np.asarray(mocc[1:], np.float32)).max())
    # our ensemble cluster supports for each multidomain region
    from witch_tpu.hmm import trace_ensemble as te
    btot = np.cumsum(dB)
    etot = np.cumsum(dE)
    for (i, j) in regions_ours:
        mass = te.region_split_mass(btot, etot, i, j)
        print("region (%d,%d): split_mass=%.4f multidomain=%s"
              % (i, j, mass, mass >= 0.2))
        if mass >= 0.2:
            cl = te.resolve_region(prof, q, i, j, L, seed=42)
            for d in cl:
                print("   cluster:", d)


def trace_cmp(midx, qidx, i0, j0):
    """Compare per-sample trace segments for region [i0,j0] of query
    qidx: oracle p7_Forward + p7_StochasticTrace vs our exact-f32
    ensemble."""
    from witch_tpu.core.alphabet import ALPHABETS
    alpha = ALPHABETS["dna"]
    banks, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
    codes, lens = z["codes"], z["lens"]
    hmm_path, prof = build_model(midx)
    orc = Oracle(hmm_path)
    set_trace_alphabet("dna")
    q = np.ascontiguousarray(codes[qidx, :lens[qidx]], np.int32)
    L = len(q)
    Lr = j0 - i0 + 1
    S = icc_libm.load_full()
    p7_oprofile_ReconfigMultihit = CF(c.c_int, c.c_void_p, c.c_int)(
        S["p7_oprofile_ReconfigMultihit"])
    p7_Forward = CF(c.c_int, c.c_char_p, c.c_int, c.c_void_p,
                    c.c_void_p, c.POINTER(c.c_float))(S["p7_Forward"])
    p7_trace_Create = CF(c.c_void_p)(S["p7_trace_Create"])
    p7_trace_Reuse = CF(c.c_int, c.c_void_p)(S["p7_trace_Reuse"])
    p7_trace_Index = CF(c.c_int, c.c_void_p)(S["p7_trace_Index"])
    p7_StochasticTrace = CF(c.c_int, c.c_void_p, c.c_char_p, c.c_int,
                            c.c_void_p, c.c_void_p, c.c_void_p)(
                                S["p7_StochasticTrace"])
    esl_rng_fast = orc.esl_randomness_CreateFast
    fwdx = orc.p7_omx_Create(orc.M, Lr, Lr)
    orc.p7_oprofile_ReconfigLength(orc.om, L)
    p7_oprofile_ReconfigMultihit(orc.om, L)
    dsq = esl_encode(q, alpha)
    region = np.ascontiguousarray(dsq[i0 - 1:j0 + 2])  # dsq+i0-1, 1-based
    fsc = c.c_float()
    rc = p7_Forward(region.tobytes(), Lr, orc.om, fwdx, c.byref(fsc))
    assert rc == 0, rc
    print("oracle region fwd: %.6f" % fsc.value)
    rng = esl_rng_fast(42)
    tr = p7_trace_Create()
    osegs = []
    for t in range(200):
        p7_trace_Reuse(tr)
        rc = p7_StochasticTrace(rng, region.tobytes(), Lr, orc.om,
                                fwdx, tr)
        assert rc == 0, rc
        p7_trace_Index(tr)
        ndom = c.cast(c.c_void_p(tr + 0x30), c.POINTER(c.c_int))[0]
        ptr = lambda off: c.cast(c.c_void_p(tr + off),
                                 c.POINTER(c.c_void_p))[0]
        for d in range(ndom):
            sqf = c.cast(ptr(0x48), c.POINTER(c.c_int))[d]
            sqt = c.cast(ptr(0x50), c.POINTER(c.c_int))[d]
            hmf = c.cast(ptr(0x58), c.POINTER(c.c_int))[d]
            hmt = c.cast(ptr(0x60), c.POINTER(c.c_int))[d]
            osegs.append((t, sqf, sqt, hmf, hmt))
    # ours
    args = [np.ascontiguousarray(prof.msc, np.float64)] + [
        np.ascontiguousarray(getattr(prof, a), np.float64)
        for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                  "t_dm", "t_dd", "bm")]
    sub = np.ascontiguousarray(q[i0 - 1:j0], np.int32)
    msegs = _domaindef.dbg_f32_ensemble(*args, sub, L, 42, 200)
    msegs = [tuple(int(v) for v in r) for r in np.asarray(msegs)]
    osegs = [tuple(int(v) for v in r) for r in osegs]
    print("oracle segs: %d   ours: %d" % (len(osegs), len(msegs)))
    oby = {}
    mby = {}
    for s in osegs:
        oby.setdefault(s[0], []).append(s[1:])
    for s in msegs:
        mby.setdefault(s[0], []).append(s[1:])
    nbad = 0
    for t in range(200):
        a = sorted(oby.get(t, []))
        b = sorted(mby.get(t, []))
        if a != b:
            nbad += 1
            if nbad <= 6:
                print("sample %d: oracle=%s ours=%s" % (t, a, b))
    print("diverging samples: %d/200" % nbad)

    # clustering comparison: feed the oracle's OWN spensemble the same
    # segments and read its significant clusters
    sp_create = CF(c.c_void_p, c.c_int, c.c_int, c.c_int)(
        S["p7_spensemble_Create"])
    sp_add = CF(c.c_int, c.c_void_p, c.c_int, c.c_int, c.c_int,
                c.c_int, c.c_int)(S["p7_spensemble_Add"])
    sp_cluster_t = CF(c.c_int, c.c_void_p, c.c_float, c.c_int, c.c_int,
                      c.c_float, c.c_float, c.POINTER(c.c_int))
    sp_cluster = sp_cluster_t(S["p7_spensemble_Cluster"])
    sp_getcc = CF(c.c_int, c.c_void_p, c.c_int, c.POINTER(c.c_int),
                  c.POINTER(c.c_int), c.POINTER(c.c_int),
                  c.POINTER(c.c_int), c.POINTER(c.c_float))(
                      S["p7_spensemble_GetClusterCoords"])
    sp = sp_create(1024, 64, 32)
    for (t, sqf, sqt, hmf, hmt) in osegs:
        sp_add(sp, t, sqf, sqt, hmf, hmt)
    print("sp words:", np.ctypeslib.as_array(
        c.cast(c.c_void_p(sp), c.POINTER(c.c_int32)), shape=(12,)))
    nc = c.c_int()
    rc = sp_cluster(sp, 0.8, 1, 4, 0.0, 0.02, c.byref(nc))
    print("oracle clusters (prob cut 0.0): %d" % nc.value)
    for w in range(nc.value):
        ii = c.c_int(); jj = c.c_int(); kk = c.c_int(); mm = c.c_int()
        pb = c.c_float()
        sp_getcc(sp, w, c.byref(ii), c.byref(jj), c.byref(kk),
                 c.byref(mm), c.byref(pb))
        print("  oracle cluster: i=%d j=%d k=%d m=%d prob=%.4f"
              % (ii.value, jj.value, kk.value, mm.value, pb.value))
    from witch_tpu.hmm.trace_ensemble import cluster_ensemble
    print("our clusters:", cluster_ensemble(list(msegs), 200))


if __name__ == "__main__":
    main()
