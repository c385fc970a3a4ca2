"""Per-subset aligner quality: the pinpointed backbone bottleneck.

eval_merge_ceiling.py shows the column-graph merge is near-lossless
(SP 0.974 with truth subsets), so the n=500 gap (0.760 vs MAGUS 0.829)
is the subset aligner.  This harness scores consistency_align_core on
individual production clusters (same kmeans-anchor decomposition as
it0) against the reference truth restricted to the cluster — a fast
loop (one ~70-seq subset, not a 1100 s full run) for tuning the
engine.  Reference contract: MAGUS subsets are MAFFT L-INS-i
(magus/align/aligner.py).

Usage: python scripts/eval_subset_quality.py [n=500] [cluster_ids] [k=v ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from witch_tpu.backbone_consistency import (_kmeans_rows, anchor_embedding,
                                            consistency_align_core)
from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.core.alphabet import ALPHABETS
from witch_tpu.io.fasta import read_fasta

sys.path.insert(0, "/root/repo/scripts")
from eval_backbone import REF, sp_score  # noqa: E402


def main():
    nsub = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    cids = None
    kwargs = {}
    for a in sys.argv[2:]:
        if "=" in a:
            k, v = a.split("=", 1)
            try:
                kwargs[k] = int(v)
            except ValueError:
                kwargs[k] = float(v)
        else:
            cids = [int(x) for x in a.split(",")]
    alphabet = ALPHABETS["dna"]
    ref = PackedAlignment.from_records(list(read_fasta(REF)),
                                       alphabet=alphabet)
    rng = np.random.default_rng(0)
    keep = sorted(rng.choice(ref.n_seqs, nsub, replace=False))
    ref = PackedAlignment([ref.names[i] for i in keep], ref.codes[keep],
                          alphabet)
    ref, _ = ref.delete_all_gap_columns()
    names = list(ref.names)
    gap = alphabet.gap_code
    seqs = [alphabet.decode(row[row != gap]) for row in ref.codes]
    codes = [alphabet.encode(s) for s in seqs]
    n = len(seqs)

    E = anchor_embedding(codes, alphabet, workers=8, seed=0)
    subset_size = int(np.clip(n / 6, 50, 120))
    n_clusters = max(2, -(-n // subset_size))
    clusters = _kmeans_rows(E, n_clusters, seed=0)
    split = []
    for idx in clusters:
        if len(idx) > int(1.5 * subset_size):
            k = -(-len(idx) // subset_size)
            split.extend(np.array_split(idx, k))
        else:
            split.append(idx)
    clusters = [c for c in split if len(c)]
    order = np.argsort([-len(c) for c in clusters])
    if cids is None:
        cids = [int(order[i]) for i in (0, 2) if i < len(order)]
    for ci in cids:
        idx = clusters[ci]
        rows_g = [int(i) for i in idx]
        sub_codes = [codes[i] for i in rows_g]
        t0 = time.time()
        srows, smat, _, _ = consistency_align_core(
            sub_codes, alphabet, match_p=None, delta=None,
            seed=ci, workers=8, **kwargs)
        dt = time.time() - t0
        cand = PackedAlignment([names[rows_g[r]] for r in srows], smat,
                               alphabet)
        refsub_rows = rows_g
        mat = ref.codes[refsub_rows]
        keep_cols = ~(mat == gap).all(axis=0)
        refsub = PackedAlignment([names[i] for i in refsub_rows],
                                 np.ascontiguousarray(mat[:, keep_cols]),
                                 alphabet)
        rec, prec = sp_score(cand, refsub, n_pairs=4000)
        print("cluster %d (n=%d, %d cols, %.1fs): SP recall=%.4f "
              "precision=%.4f  %s"
              % (ci, len(rows_g), cand.n_cols, dt, rec, prec,
                 kwargs or ""), flush=True)


if __name__ == "__main__":
    main()
