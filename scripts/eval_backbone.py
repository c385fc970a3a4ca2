"""SP-score a candidate backbone alignment (quality harness).

Measures any backbone aligner against the shipped reference backbone
alignment, the basis for the quality table in docs/COMPONENTS.md
(ours vs reference MAGUS vs MAFFT L-INS-i). Modes: progressive,
progressive+refine, iterhmm, magus-lite, consistency, large (the
production align_backbone_consistency), sparse, file <path>.

Original docstring: SP-score a candidate backbone alignment against the reference
backbone alignment (examples/data/backbone.aln.fasta.gz = curated truth).

Usage:
  python scratch/eval_backbone.py progressive [n_seqs] [kwargs k=v ...]
  python scratch/eval_backbone.py file <path> [n_seqs]
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from witch_tpu.io.fasta import read_fasta
from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.core.alphabet import ALPHABETS

REF = "/root/reference/examples/data/backbone.aln.fasta.gz"


def residx(aln):
    """[n, W] residue index per cell, -1 at gaps."""
    gap = aln.alphabet.gap_code
    ng = aln.codes != gap
    idx = np.cumsum(ng, axis=1) - 1
    idx[~ng] = -1
    return idx


def sp_score(cand, ref, n_pairs=2000, seed=1):
    order = {nm: i for i, nm in enumerate(cand.names)}
    rows = [order[nm] for nm in ref.names]
    ri_c = residx(cand)[rows]
    ri_r = residx(ref)
    n = ref.n_seqs
    rng = np.random.default_rng(seed)
    hits = tot_ref = tot_cand = 0
    for _ in range(n_pairs):
        s, t = rng.integers(n), rng.integers(n)
        if s == t:
            continue
        def pairs(ri):
            a, b = ri[s], ri[t]
            m = (a >= 0) & (b >= 0)
            return a[m].astype(np.int64) * 10**6 + b[m]
        pr, pc = pairs(ri_r), pairs(ri_c)
        inter = np.intersect1d(pr, pc, assume_unique=True)
        hits += len(inter); tot_ref += len(pr); tot_cand += len(pc)
    rec = hits / max(tot_ref, 1)
    prec = hits / max(tot_cand, 1)
    return rec, prec


def main():
    mode = sys.argv[1]
    ref_recs = list(read_fasta(REF))
    alphabet = ALPHABETS["dna"]
    ref = PackedAlignment.from_records(ref_recs, alphabet=alphabet)
    nsub = None
    kwargs = {}
    rest = sys.argv[2:]
    for a in rest:
        if "=" in a:
            k, v = a.split("=", 1)
            try:
                kwargs[k] = int(v)
            except ValueError:
                try:
                    kwargs[k] = float(v)
                except ValueError:
                    kwargs[k] = v
        elif a.isdigit():
            nsub = int(a)
    if mode == "file":
        cand = PackedAlignment.from_records(list(read_fasta(rest[0])),
                                            alphabet=alphabet)
        names = set(cand.names)
        keep = [i for i, nm in enumerate(ref.names) if nm in names]
        ref = PackedAlignment([ref.names[i] for i in keep],
                              ref.codes[keep], alphabet)
        ref, _ = ref.delete_all_gap_columns()
    else:
        if nsub:
            rng = np.random.default_rng(0)
            keep = sorted(rng.choice(ref.n_seqs, nsub, replace=False))
            ref = PackedAlignment([ref.names[i] for i in keep],
                                  ref.codes[keep], alphabet)
            ref, _ = ref.delete_all_gap_columns()
        names = list(ref.names)
        gap = alphabet.gap_code
        seqs = [alphabet.decode(row[row != gap]) for row in ref.codes]
        t0 = time.time()
        if mode == "progressive":
            from witch_tpu.backbone_progressive import progressive_align
            cand = progressive_align(names, seqs, "dna", **kwargs)
        elif mode == "progressive+refine":
            from witch_tpu.backbone_progressive import \
                align_backbone_progressive
            cand = align_backbone_progressive(names, seqs, "dna", **kwargs)
        elif mode == "iterhmm":
            from witch_tpu.backbone import align_backbone
            cand = align_backbone(names, seqs, "dna", use_device=False)
        elif mode == "consistency":
            from witch_tpu.backbone_consistency import consistency_align
            cand = consistency_align(names, seqs, "dna",
                                     log=lambda m: print("  " + m),
                                     **kwargs)
        elif mode == "sparse":
            from witch_tpu.backbone_consistency import sparse_global_align
            cand = sparse_global_align(
                names, seqs, "dna", log=lambda m: print("  " + m),
                **kwargs)
        elif mode == "large":
            from witch_tpu.backbone_consistency import \
                align_backbone_consistency
            cand = align_backbone_consistency(
                names, seqs, "dna", log=lambda m: print("  " + m),
                **kwargs)
            import os
            os.makedirs("scratch", exist_ok=True)
            cand.write("scratch/eval_backbone_large.fasta")
        elif mode == "magus-lite":
            from witch_tpu.backbone_magus import align_backbone_magus
            cand = align_backbone_magus(names, seqs, "dna",
                                        use_device=False)
        print("align: %.1fs, %d seqs x %d cols"
              % (time.time() - t0, cand.n_seqs, cand.n_cols))
    rec, prec = sp_score(cand, ref)
    print("SP recall=%.4f precision=%.4f (ref %d cols)"
          % (rec, prec, ref.n_cols))


if __name__ == "__main__":
    main()
