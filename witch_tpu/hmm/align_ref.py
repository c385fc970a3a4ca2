"""Reference (numpy) posterior-decoding optimal-accuracy alignment.

Replaces the contract of `hmmalign -o out model query.fasta` as the
reference uses it (witch_msa/gcmm/aligner.py:96-142): align ONE query to a
profile and report, per query residue, whether it is match-emitted (and by
which match state) or insert/flank-emitted.

HMMER3 hmmalign = Forward/Backward -> posterior decode -> optimal accuracy
(OA) DP -> traceback. OA semantics: states carry expected-accuracy values
(>= 0); disallowed transitions contribute a 0 floor (not -inf); argmax ties
resolve first-candidate-wins in a fixed order. Profile mode calibrated
empirically against the bundled binary (tests/test_hmmalign_parity.py).
"""

from __future__ import annotations

import numpy as np

from .profile import Profile
from .forward_ref import forward_matrices, backward_matrices


def posterior_decode(prof: Profile, codes: np.ndarray):
    """Posterior probabilities of emitting residue i from each state."""
    fwd, F = forward_matrices(prof, codes)
    bck, B = backward_matrices(prof, codes)
    L = len(codes)
    loop, _ = prof.length_model(L)
    with np.errstate(invalid="ignore", over="ignore"):
        pp_M = np.exp(F["M"] + B["M"] - fwd)
        pp_I = np.exp(F["I"] + B["I"] - fwd)
        # N/C/J emit on their LOOP transition only: residue i is emitted by
        # X iff the path used X(i-1) -> X(i); the E->C / E->J arrival into
        # row i emits nothing.
        pp_N = np.zeros(L + 1)
        pp_J = np.zeros(L + 1)
        pp_C = np.zeros(L + 1)
        pp_N[1:] = np.exp(F["N"][:-1] + loop + B["N"][1:] - fwd)
        pp_J[1:] = np.exp(F["J"][:-1] + loop + B["J"][1:] - fwd)
        pp_C[1:] = np.exp(F["C"][:-1] + loop + B["C"][1:] - fwd)
    return dict(M=np.nan_to_num(pp_M), I=np.nan_to_num(pp_I),
                N=np.nan_to_num(pp_N), J=np.nan_to_num(pp_J),
                C=np.nan_to_num(pp_C), fwd=fwd, bck=bck)


FLT_MIN = 1.17549435e-38   # HMMER's TSCDELTA for disallowed transitions


def oa_fill(prof: Profile, pp):
    """Optimal-accuracy DP fill (HMMER semantics: row 0 M/I/D start at
    -inf; disallowed transitions multiply by FLT_MIN rather than 0, so
    unreachable -inf states stay -inf and never win a max)."""
    M = prof.M
    ppM, ppI = pp["M"], pp["I"]
    ppN, ppJ, ppC = pp["N"], pp["J"], pp["C"]
    L = ppM.shape[0] - 1
    NEG = -np.inf

    def delta(v):
        return np.where(v > -np.inf, 1.0, FLT_MIN)

    d_mm, d_im, d_dm = delta(prof.t_mm), delta(prof.t_im), delta(prof.t_dm)
    d_mi, d_ii = delta(prof.t_mi), delta(prof.t_ii)
    d_md, d_dd = delta(prof.t_md), delta(prof.t_dd)
    d_bm = delta(prof.bm)

    Mx = np.full((L + 1, M + 1), NEG)
    Ix = np.full((L + 1, M + 1), NEG)
    Dx = np.full((L + 1, M + 1), NEG)
    N = np.zeros(L + 1)
    B = np.zeros(L + 1)
    E = np.full(L + 1, NEG)
    J = np.full(L + 1, NEG)
    C = np.full(L + 1, NEG)
    N[0] = 0.0
    B[0] = 0.0

    e_loop_ok = prof.multihit
    for i in range(1, L + 1):
        prevM, prevI, prevD = Mx[i - 1], Ix[i - 1], Dx[i - 1]
        cand = np.maximum(
            np.maximum(np.concatenate(([NEG], d_mm[:-1] * prevM[:-1])),
                       np.concatenate(([NEG], d_im[:-1] * prevI[:-1]))),
            np.maximum(np.concatenate(([NEG], d_dm[:-1] * prevD[:-1])),
                       d_bm * B[i - 1]))
        Mx[i] = ppM[i] + cand
        Mx[i, 0] = NEG
        Ix[i] = ppI[i] + np.maximum(d_mi * prevM, d_ii * prevI)
        Ix[i, 0] = NEG
        Ix[i, M] = NEG
        # delete chain: Dx[i,k] = max(d_md[k-1]*Mx[i,k-1], d_dd[k-1]*Dx[i,k-1])
        # interior deltas are 1 -> running max of Mx[i,1:M]
        if M >= 2:
            Dx[i, 2:] = np.maximum.accumulate(
                (d_md[1:M] * Mx[i, 1:M]))
        E[i] = max(Mx[i, 1:].max(initial=NEG), Dx[i, 1:].max(initial=NEG))
        jloop = (J[i - 1] + ppJ[i]) if i > 0 else NEG
        J[i] = max(jloop, E[i] if e_loop_ok else NEG)
        C[i] = max(C[i - 1] + ppC[i] if np.isfinite(C[i - 1]) else NEG,
                   E[i])
        N[i] = N[i - 1] + ppN[i]
        B[i] = max(N[i], J[i] if e_loop_ok else NEG)
    return dict(M=Mx, I=Ix, D=Dx, N=N, B=B, E=E, J=J, C=C)


def oa_trace(prof: Profile, pp, mx):
    """Traceback mirroring HMMER's select_* first-max-wins order."""
    M = prof.M
    Mx, Ix, Dx = mx["M"], mx["I"], mx["D"]
    N, B, E, J, C = mx["N"], mx["B"], mx["E"], mx["J"], mx["C"]
    ppJ, ppC = pp["J"], pp["C"]
    L = Mx.shape[0] - 1

    def delta(v):
        return 1.0 if v > -np.inf else FLT_MIN

    path = []
    i = L
    state = "C"
    k = 0
    max_steps = 4 * (L + M) + 16
    steps = 0
    while not (state == "N" and i == 0):
        steps += 1
        if steps > max_steps or i < 0:
            raise RuntimeError(
                "OA traceback did not terminate (i=%d state=%s k=%d); "
                "degenerate posterior?" % (i, state, k))
        if state == "C":
            loop = (C[i - 1] + ppC[i]
                    if i > 0 and np.isfinite(C[i - 1]) else -np.inf)
            if loop >= E[i]:
                path.append(("C", 0, i))
                i -= 1
            else:
                state = "E"
        elif state == "J":
            loop = (J[i - 1] + ppJ[i]
                    if i > 0 and np.isfinite(J[i - 1]) else -np.inf)
            if loop >= E[i]:
                path.append(("J", 0, i))
                i -= 1
            else:
                state = "E"
        elif state == "E":
            best = -np.inf
            smax, kmax = "M", 1
            for kk in range(1, M + 1):
                if Mx[i, kk] > best:
                    best = Mx[i, kk]
                    smax, kmax = "M", kk
                if Dx[i, kk] > best:
                    best = Dx[i, kk]
                    smax, kmax = "D", kk
            state, k = smax, kmax
        elif state == "M":
            path.append(("M", k, i))
            cands = [
                delta(prof.t_mm[k - 1]) * Mx[i - 1, k - 1],
                delta(prof.t_im[k - 1]) * Ix[i - 1, k - 1],
                delta(prof.t_dm[k - 1]) * Dx[i - 1, k - 1],
                delta(prof.bm[k]) * B[i - 1],
            ]
            j = int(np.argmax(cands))   # first max wins
            state, k = [("M", k - 1), ("I", k - 1), ("D", k - 1),
                        ("B", 0)][j]
            i -= 1
        elif state == "I":
            path.append(("I", k, i))
            a = delta(prof.t_mi[k]) * Mx[i - 1, k]
            b = delta(prof.t_ii[k]) * Ix[i - 1, k]
            state = "M" if a >= b else "I"
            i -= 1
        elif state == "D":
            a = delta(prof.t_md[k - 1]) * Mx[i, k - 1]
            b = delta(prof.t_dd[k - 1]) * Dx[i, k - 1]
            path.append(("D", k, i))
            if a >= b:
                state, k = "M", k - 1
            else:
                state, k = "D", k - 1
        elif state == "B":
            if prof.multihit and J[i] > N[i]:
                state = "J"
            else:
                state = "N"
        elif state == "N":
            path.append(("N", 0, i))
            i -= 1
    path.reverse()
    return path


def oa_align(prof: Profile, codes: np.ndarray):
    pp = posterior_decode(prof, codes)
    mx = oa_fill(prof, pp)
    return oa_trace(prof, pp, mx)


def _deltas_u8(prof: Profile):
    def d(v):
        return (v > -np.inf).astype(np.uint8)
    return (d(prof.t_mm), d(prof.t_mi), d(prof.t_md), d(prof.t_im),
            d(prof.t_ii), d(prof.t_dm), d(prof.t_dd), d(prof.bm))


def oa_columns_from_pp(prof: Profile, pp) -> np.ndarray:
    """OA fill+trace -> aligned columns; uses the native C++ kernel when
    available (witch_tpu/native/_oa), else the numpy path."""
    try:
        from ..native import _oa
    except ImportError:
        _oa = None
    if _oa is not None:
        args = [np.ascontiguousarray(pp["M"], dtype=np.float64),
                np.ascontiguousarray(pp["I"], dtype=np.float64),
                np.ascontiguousarray(pp["N"], dtype=np.float64),
                np.ascontiguousarray(pp["J"], dtype=np.float64),
                np.ascontiguousarray(pp["C"], dtype=np.float64)]
        args += [np.ascontiguousarray(x) for x in _deltas_u8(prof)]
        return _oa.oa_align(*args, bool(prof.multihit))
    mx = oa_fill(prof, pp)
    path = oa_trace(prof, pp, mx)
    out = np.full(pp["M"].shape[0] - 1, -1, dtype=np.int64)
    for state, k, i in path:
        if state == "M" and i > 0:
            out[i - 1] = k - 1
    return out


def aligned_columns(prof: Profile, codes: np.ndarray) -> np.ndarray:
    """Per query residue: 0-based match-state column, or -1 if the residue
    is emitted by insert/flank states — the quantity WITCH derives from
    hmmalign's Stockholm output (aligner.py:126-142)."""
    pp = posterior_decode(prof, codes)
    return oa_columns_from_pp(prof, pp)
