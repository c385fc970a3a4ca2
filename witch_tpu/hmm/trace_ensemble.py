"""hmmsearch reporting-gate emulation: stochastic trace ensemble +
segment clustering (p7_domaindef_ByPosteriorHeuristics multidomain path).

WITCH consumes hmmsearch's per-sequence table, and hmmsearch only prints
a target if domain definition produced >= 1 domain.  Reconstructed from
the bundled HMMER 3.1b2 binary (disassembly-verified constants and
control flow; reference contract witch_msa/gcmm/algorithm.py:524-605):

* the pipeline RNG (esl_randomness_CreateFast(seed), default seed 42)
  is re-initialized before EVERY region ensemble, so the gate is a
  deterministic function of (model, target);
* regions come from posterior heuristics (domaindef.find_regions);
* a region is "multidomain" iff max over split points z of
  min(E-mass before z, B-mass after z) >= rt3 (0.2);
* multidomain regions are resolved by sampling nsamples=200 stochastic
  tracebacks from a Forward matrix of the region subsequence with the
  profile in MULTIHIT mode, length model = full sequence length;
* each sampled domain adds a segment (i, j, k, m); segments cluster by
  single linkage where linked means: seq overlap >= 0.8 * smaller
  seq-length AND model overlap >= 0.8 * smaller model-length AND
  (|start-diag diff| <= 4 OR |end-diag diff| <= 4);
* clusters with (distinct samples)/nsamples < min_posterior (0.25) are
  discarded; among surviving clusters whose seq envelopes overlap >=
  0.8 of the smaller, the lower-posterior one is discarded (earlier one
  on ties);
* envelope coords: per endpoint, the outermost value whose endpoint
  count >= ceil(min_endpointp * cluster_sample_count), else the
  histogram argmax;
* every surviving cluster is rescored (always yielding a domain on this
  workload; the only rejection path is an f32-overflow eslERANGE inside
  p7_Decoding, which does not trigger at these scales);
* a non-multidomain region is itself a single envelope -> one domain.

Hence: target reported  <=>  some region is non-multidomain OR some
multidomain region has >= 1 surviving cluster.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .easel import jenkins_mix3, fchoose_cumnorm
from .forward_ref import forward_matrices
from .domaindef import RT3, find_regions

_M32 = 0xFFFFFFFF

NSAMPLES = 200
MIN_OVERLAP = 0.8
MAX_DIAGDIFF = 4
MIN_POSTERIOR = 0.25
MIN_ENDPOINTP = 0.02


class EselRng:
    """esl_randomness 'fast' (LCG) stream, incremental."""

    def __init__(self, seed: int = 42):
        self.seed(seed)

    def seed(self, seed: int):
        self.x = jenkins_mix3(seed, 87654321, 12345678)

    def random(self) -> float:
        self.x = (69069 * self.x + 1) & _M32
        return self.x * 2.0 ** -32

    def fchoose(self, p_f32: np.ndarray) -> int:
        """esl_rnd_FChoose over a float32 vector (binary semantics:
        double-accumulated CDF of the f32 entries / f32-summed norm)."""
        cum = fchoose_cumnorm(p_f32)
        roll = self.random()
        i = int(np.searchsorted(cum, roll, side="right"))
        return min(i, len(cum) - 1)

    def choose_log(self, logw: np.ndarray) -> int:
        """FChoose over log-weights (exp-normalized by the max; ratios,
        hence the sampled distribution, are preserved)."""
        m = np.max(logw)
        if not np.isfinite(m):
            raise FloatingPointError("all candidates -inf")
        return self.fchoose(np.exp(logw - m).astype(np.float32))


class RegionProfile:
    """Multihit local profile view with length model pinned to the full
    sequence length (ReconfigMultihit(om, L_seq) semantics)."""

    __slots__ = ("M", "msc", "isc", "t_mm", "t_mi", "t_md", "t_im",
                 "t_ii", "t_dm", "t_dd", "bm", "multihit", "_Lm")

    def __init__(self, prof, Lseq: int):
        for a in ("M", "msc", "isc", "t_mm", "t_mi", "t_md", "t_im",
                  "t_ii", "t_dm", "t_dd", "bm"):
            setattr(self, a, getattr(prof, a))
        self.multihit = True
        self._Lm = Lseq

    def length_model(self, L):
        pmove = 3.0 / (self._Lm + 3.0)
        return np.log(1.0 - pmove), np.log(pmove)

    @property
    def xsc_e_loop(self):
        return np.log(0.5)

    @property
    def xsc_e_move(self):
        return np.log(0.5)


def sample_trace(rng: EselRng, prof, F, L: int
                 ) -> List[Tuple[int, int, int, int]]:
    """One stochastic traceback from Forward rows F (nats); returns the
    trace's domains [(i_from, i_to, k_from, k_to)], 1-based local."""
    M = prof.M
    loop, _move = prof.length_model(L)
    eloop, emove = prof.xsc_e_loop, prof.xsc_e_move
    NEG = -np.inf
    FM, FI, FD = F["M"], F["I"], F["D"]
    FN, FB, FE, FJ, FC = F["N"], F["B"], F["E"], F["J"], F["C"]
    doms: List[Tuple[int, int, int, int]] = []
    i = L
    state = "C"
    k = 0
    cur_end = cur_kend = 0
    while not (state == "N" and i == 0):
        if state == "C":
            j = rng.choose_log(np.array(
                [(FC[i - 1] + loop) if i > 0 else NEG,
                 FE[i] + emove]))
            if j == 0:
                i -= 1
            else:
                state = "E"
        elif state == "J":
            j = rng.choose_log(np.array(
                [(FJ[i - 1] + loop) if i > 0 else NEG,
                 FE[i] + eloop]))
            if j == 0:
                i -= 1
            else:
                state = "E"
        elif state == "E":
            # one raw draw walks M then D cells per striped q block
            # (k = z*Q + q + 1), each normalized by E[i]
            Q = max(2, (M + 3) // 4)
            order = []
            for q in range(Q):
                for z in range(4):
                    kk = z * Q + q + 1
                    if kk <= M:
                        order.append(("M", kk))
                for z in range(4):
                    kk = z * Q + q + 1
                    if 2 <= kk <= M:
                        order.append(("D", kk))
            mx = max(np.max(FM[i, 1:M + 1]), np.max(FD[i, 2:M + 1])
                     if M >= 2 else NEG)
            Enorm = np.exp(FE[i] - mx)
            roll = rng.random()
            cum = 0.0
            sel = None
            for stt, kk in order:
                v = FM[i, kk] if stt == "M" else FD[i, kk]
                cum += float(np.float32(np.exp(v - mx) / Enorm))
                if cum > roll:
                    sel = (stt, kk)
                    break
            if sel is None:
                sel = ("M", M)
            state, k = sel
            cur_end, cur_kend = i, k
        elif state == "M":
            # the binary's candidate order is [B, M, I, D]
            j = rng.choose_log(np.array(
                [FB[i - 1] + prof.bm[k],
                 (FM[i - 1, k - 1] + prof.t_mm[k - 1]) if k > 1 else NEG,
                 (FI[i - 1, k - 1] + prof.t_im[k - 1]) if k > 1 else NEG,
                 (FD[i - 1, k - 1] + prof.t_dm[k - 1]) if k > 1 else NEG]))
            if j == 0:
                doms.append((i, cur_end, k, cur_kend))
                state = "B"
                i -= 1
            else:
                state, k = (("M", k - 1), ("I", k - 1),
                            ("D", k - 1))[j - 1]
                i -= 1
        elif state == "I":
            j = rng.choose_log(np.array(
                [FM[i - 1, k] + prof.t_mi[k],
                 FI[i - 1, k] + prof.t_ii[k]]))
            state = "M" if j == 0 else "I"
            i -= 1
        elif state == "D":
            j = rng.choose_log(np.array(
                [FM[i, k - 1] + prof.t_md[k - 1],
                 FD[i, k - 1] + prof.t_dd[k - 1]]))
            state, k = ("M", k - 1) if j == 0 else ("D", k - 1)
        elif state == "B":
            j = rng.choose_log(np.array([FN[i], FJ[i]]))
            state = "N" if j == 0 else "J"
        elif state == "N":
            i -= 1
        if i < 0:
            raise FloatingPointError("trace walked past row 0")
    doms.reverse()
    return doms


def cluster_ensemble(segs: List[Tuple[int, int, int, int, int]],
                     nsamples: int = NSAMPLES):
    """Single-linkage clustering of (sample, i, j, k, m) segments with
    the binary's linkage rule; returns surviving clusters as dicts with
    env coords and posterior, after the min_posterior cut and the
    overlapping-cluster dedup."""
    n = len(segs)
    if n == 0:
        return []
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    arr = np.asarray(segs, dtype=np.int64)
    for a in range(n):
        ta, ia, ja, ka, ma = arr[a]
        for b in range(a + 1, n):
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            tb, ib, jb, kb, mb = arr[b]
            # link_spsamples semantics (verified against the binary's
            # own predicate): seq overlap INCLUSIVE (+1), hmm overlap
            # EXCLUSIVE (min_m - max_k, no +1 — an upstream quirk),
            # both as f32 divisions nov/n < 0.8f over inclusive min len
            ov = min(ja, jb) - max(ia, ib) + 1
            if (np.float32(ov) / np.float32(min(ja - ia + 1, jb - ib + 1))
                    < np.float32(MIN_OVERLAP)):
                continue
            ovk = min(ma, mb) - max(ka, kb)
            if (np.float32(ovk) / np.float32(min(ma - ka + 1,
                                                 mb - kb + 1))
                    < np.float32(MIN_OVERLAP)):
                continue
            if (abs((ia - ka) - (ib - kb)) > MAX_DIAGDIFF and
                    abs((ja - ma) - (jb - mb)) > MAX_DIAGDIFF):
                continue
            parent[ra] = rb

    groups = {}
    for a in range(n):
        groups.setdefault(find(a), []).append(a)

    def consensus(vals: np.ndarray, thr: int, outermost_min: bool) -> int:
        lo, hi = int(vals.min()), int(vals.max())
        hist = np.bincount(vals - lo, minlength=hi - lo + 1)
        if outermost_min:
            idx = np.flatnonzero(hist >= thr)
            if idx.size:
                return lo + int(idx[0])
        else:
            idx = np.flatnonzero(hist >= thr)
            if idx.size:
                return lo + int(idx[-1])
        return lo + int(np.argmax(hist))

    clusters = []
    for g in groups.values():
        sub = arr[g]
        nsamp = len(set(sub[:, 0].tolist()))
        post = nsamp / float(nsamples)
        if post < MIN_POSTERIOR:
            continue
        thr = int(np.ceil(np.float32(nsamp) * np.float32(MIN_ENDPOINTP)))
        env_i = consensus(sub[:, 1], thr, True)
        env_j = consensus(sub[:, 2], thr, False)
        env_k = consensus(sub[:, 3], thr, True)
        env_m = consensus(sub[:, 4], thr, False)
        clusters.append(dict(i=env_i, j=env_j, k=env_k, m=env_m,
                             post=post, nsamp=nsamp))
    # cluster order: groups iterate in first-seen segment order, which
    # approximates the binary's single-linkage discovery order (only
    # matters for the rare equal-posterior dedup tie)
    # overlap dedup: for each ordered pair, if seq envelopes overlap
    # >= 0.8 of the smaller, kill the lower-posterior (earlier on ties)
    dead = [False] * len(clusters)
    for a in range(len(clusters)):
        if dead[a]:
            continue
        for b in range(a + 1, len(clusters)):
            if dead[b]:
                continue
            ca, cb = clusters[a], clusters[b]
            ov = min(ca["j"], cb["j"]) - max(ca["i"], cb["i"]) + 1
            if ov <= 0:
                continue
            if ov / min(ca["j"] - ca["i"] + 1,
                        cb["j"] - cb["i"] + 1) >= MIN_OVERLAP:
                if ca["post"] > cb["post"]:
                    dead[b] = True
                else:
                    dead[a] = True
                    break
    return [c for c, d in zip(clusters, dead) if not d]


def region_split_mass(btot, etot, i: int, j: int) -> float:
    """max over z in [i,j] of min(E mass in [i,z], B mass in [z,j])."""
    ps = np.arange(i, j + 1)
    epre = (etot[ps] - etot[i - 1]).astype(np.float32)
    bpost = (btot[j] - btot[ps - 1]).astype(np.float32)
    return float(np.minimum(epre, bpost).max()) if j >= i else 0.0


def resolve_region(prof, codes: np.ndarray, i: int, j: int, Lseq: int,
                   seed: int = 42,
                   rng: Optional[EselRng] = None,
                   want_null2: bool = False):
    """Run the 200-trace ensemble for region [i,j] (1-based, inclusive)
    of the encoded query `codes`; returns surviving clusters with env
    coords in full-sequence coordinates (and, when want_null2, the
    per-position expected null2 odds over the region).

    Uses the native C++ engine (witch_tpu.native._domaindef) when built;
    the numpy path below is the readable reference implementation."""
    sub = np.ascontiguousarray(codes[i - 1:j], dtype=np.int32)
    try:
        from ..native import _domaindef, set_trace_alphabet
    except ImportError:
        _domaindef = None
    if _domaindef is not None:
        set_trace_alphabet(prof.molecule)
        cl, n2acc = _domaindef.ensemble_region(
            np.ascontiguousarray(prof.msc, np.float64),
            *[np.ascontiguousarray(getattr(prof, a), np.float64)
              for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                        "t_dm", "t_dd", "bm")],
            sub, int(Lseq), int(seed), NSAMPLES, int(want_null2))
        clusters = [dict(i=ci + i - 1, j=cj + i - 1, k=ck, m=cm,
                         post=post, nsamp=nsamp)
                    for (ci, cj, ck, cm, post, nsamp) in cl]
        if want_null2:
            return clusters, n2acc
        return clusters
    rm = RegionProfile(prof, Lseq)
    _fwd, F = forward_matrices(rm, sub)
    if rng is None:
        rng = EselRng(seed)
    else:
        rng.seed(seed)
    segs = []
    for t in range(NSAMPLES):
        for (i1, j1, k1, m1) in sample_trace(rng, rm, F, len(sub)):
            segs.append((t, i1 + i - 1, j1 + i - 1, k1, m1))
    clusters = cluster_ensemble(segs)
    if want_null2:
        return clusters, None
    return clusters


def target_reported(prof, codes: np.ndarray, mocc, ppB, ppE,
                    seed: int = 42) -> bool:
    """The reporting gate for one (model, target) pair given the
    full-sequence posterior rows: True iff hmmsearch would print it."""
    btot = np.cumsum(np.concatenate([[0.0], ppB[:-1]]))
    etot = np.cumsum(np.concatenate([[0.0], ppE[1:]]))
    regions = find_regions(mocc, ppB, ppE)
    L = len(codes)
    for (i, j) in regions:
        if region_split_mass(btot, etot, i, j) < RT3:
            return True            # deterministic single envelope
        if resolve_region(prof, codes, i, j, L, seed=seed):
            return True
    return False
