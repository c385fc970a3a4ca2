"""End-to-end scenario-A quality: SP homology of the full output
(backbone + queries) against the reference's shipped result.

Scenario A estimates its own backbone alignment, so row-exactness vs
the reference is undefined; the right metric is pairwise-homology
SP recall/precision over the unmasked output (insertion columns are
alignment columns too), sampled over (query, query), (query, backbone)
and (backbone, backbone) pairs separately.

Usage: python scripts/eval_scenarioA.py <outdir>/aligned.fasta
       [reference_aligned_all.fasta.gz]
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from witch_tpu.core.alignment import PackedAlignment  # noqa: E402
from witch_tpu.core.alphabet import ALPHABETS  # noqa: E402
from witch_tpu.io.fasta import read_fasta  # noqa: E402

REF = "/root/reference/examples/data/aligned_all.fasta.gz"
BB = "/root/reference/examples/data/backbone.aln.fasta.gz"


def residx(aln):
    gap = aln.alphabet.gap_code
    ng = aln.codes != gap
    idx = np.cumsum(ng, axis=1) - 1
    idx[~ng] = -1
    return idx


def main():
    mine_path = sys.argv[1]
    ref_path = sys.argv[2] if len(sys.argv) > 2 else REF
    al = ALPHABETS["dna"]
    # uppercase both (insertion columns are lowercase in outputs)
    mine_recs = [(n, s.upper()) for n, s in read_fasta(mine_path)]
    ref_recs = [(n, s.upper()) for n, s in read_fasta(ref_path)]
    mine = PackedAlignment.from_records(mine_recs, alphabet=al)
    ref = PackedAlignment.from_records(ref_recs, alphabet=al)
    bb_names = {n for n, _ in read_fasta(BB)}
    common = [n for n in ref.names if n in set(mine.names)]
    mi = {n: i for i, n in enumerate(mine.names)}
    ri = {n: i for i, n in enumerate(ref.names)}
    Rm = residx(mine)
    Rr = residx(ref)
    rng = np.random.default_rng(7)
    cls = {"bb-bb": [], "q-bb": [], "q-q": []}
    hits = {k: [0, 0, 0] for k in cls}
    for _ in range(6000):
        a, b = rng.choice(len(common), 2, replace=False)
        na, nb = common[a], common[b]
        k = ("bb-bb" if na in bb_names and nb in bb_names else
             "q-q" if na not in bb_names and nb not in bb_names
             else "q-bb")
        ra, rb = Rm[mi[na]], Rm[mi[nb]]
        m = (ra >= 0) & (rb >= 0)
        pm = ra[m].astype(np.int64) * 10**6 + rb[m]
        ra, rb = Rr[ri[na]], Rr[ri[nb]]
        m = (ra >= 0) & (rb >= 0)
        pr = ra[m].astype(np.int64) * 10**6 + rb[m]
        inter = np.intersect1d(pm, pr, assume_unique=True)
        hits[k][0] += len(inter)
        hits[k][1] += len(pr)
        hits[k][2] += len(pm)
    for k in ("bb-bb", "q-bb", "q-q"):
        h, tr, tm = hits[k]
        print("%s: recall %.3f precision %.3f (ref pairs %d)"
              % (k, h / max(tr, 1), h / max(tm, 1), tr))


if __name__ == "__main__":
    main()
