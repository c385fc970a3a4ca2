"""Backbone-merge ceiling: merge TRUTH-PERFECT subset alignments.

Round-4 diagnostic for the n=500 SP gap (ours 0.760 vs reference MAGUS
0.829, docs/ROADMAP.md §0).  The round-4 density experiment showed the
cross-subset column-graph evidence density is NOT the bottleneck
(density 0.2 -> 0.5, ~2.5x sampled pair posteriors: SP 0.7597/0.7605
-> 0.7601/0.7609).  This script isolates the other factor: feed the
merge machinery subset alignments RESTRICTED FROM THE REFERENCE TRUTH
(i.e. perfect subsets, same clustering as production it0) and score
the merged result.  A high ceiling (>= ~0.9) localizes the remaining
gap in the subset aligner (consistency engine vs MAGUS's L-INS-i,
magus/align/aligner.py); a low ceiling implicates the graph
merge itself (graph_builder.py:26-231 analogue).

Usage: python scripts/eval_merge_ceiling.py [n_seqs=500] [k=v ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from witch_tpu.backbone_consistency import (_build_column_graph,
                                            _column_consistency,
                                            _graph_merge, _graph_refine,
                                            _kmeans_rows, anchor_embedding,
                                            estimate_params,
                                            _emission_odds)
from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.core.alphabet import ALPHABETS
from witch_tpu.io.fasta import read_fasta

sys.path.insert(0, "/root/repo/scripts")
from eval_backbone import REF, sp_score  # noqa: E402


def main():
    nsub = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    kwargs = {}
    for a in sys.argv[2:]:
        if "=" in a:
            k, v = a.split("=", 1)
            kwargs[k] = float(v) if "." in v else int(v)
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
    codes32 = [np.ascontiguousarray(c, np.int32) for c in codes]
    n = len(seqs)

    t0 = time.time()
    match_p, delta, ea = estimate_params(codes, alphabet, workers=8,
                                         seed=0)
    em = _emission_odds(alphabet, match_p, None)
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
    print("clusters: %s" % sorted((len(c) for c in clusters),
                                  reverse=True))

    # PERFECT subsets: the reference truth restricted to each cluster
    subs = []
    for idx in clusters:
        rows = [int(i) for i in idx]
        mat = ref.codes[rows]
        keep_cols = ~(mat == gap).all(axis=0)
        subs.append((rows, np.ascontiguousarray(mat[:, keep_cols])))

    log = lambda m: print("  " + m, flush=True)  # noqa: E731
    Wg, nsamp = _build_column_graph(
        subs, codes32, em, delta, 0.75, 0.01, gap,
        density=kwargs.get("density", 0.2), cap_lo=400,
        cap_hi=int(kwargs.get("cap_hi", 8000)), workers=8, seed=77,
        log=log)
    sizes_sub = [len(g) for g, _ in subs]
    What = _column_consistency(Wg, nsamp, sizes_sub,
                               rounds=int(kwargs.get("col_rounds", 1)),
                               direct_w=kwargs.get("direct_w", 2.0),
                               cutoff=kwargs.get("col_cutoff", 1e-4),
                               log=log)
    cent = np.stack([E[[i for i in g]].mean(axis=0) for g, _ in subs])
    DS = np.sqrt(((cent[:, None, :] - cent[None, :, :]) ** 2).sum(-1))
    rows, mat, colmaps = _graph_merge(subs, What, DS, gap, log=log)
    rows, mat, colmaps, obj = _graph_refine(
        subs, What, rows, mat, colmaps, gap,
        passes=int(kwargs.get("refine_passes", 2)), log=log)
    cand = PackedAlignment([names[i] for i in rows], mat, alphabet)
    cand, _ = cand.delete_all_gap_columns()
    print("merge: %.1fs, %d seqs x %d cols"
          % (time.time() - t0, cand.n_seqs, cand.n_cols))
    rec, prec = sp_score(cand, ref)
    print("MERGE CEILING (perfect subsets): SP recall=%.4f "
          "precision=%.4f" % (rec, prec))


if __name__ == "__main__":
    main()
