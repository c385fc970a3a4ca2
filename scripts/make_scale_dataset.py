"""Generate the BASELINE-config-#3 scale workload: an RNASim-style
10k-sequence backbone (alignment + matching tree) and >=10k
fragmentary queries, for the 1k-HMM-ensemble scale proof
(BASELINE.md "Kernel metric ... at 1k-HMM ensemble"; reference
chunking contract witch_msa/gcmm/algorithm.py:209,280-284).

Sequences evolve along a simulated random coalescent tree from a
root sampled off the example backbone's column profile, with
per-lineage substitutions and indel (column-presence) events, so the
alignment has realistic gap structure and the tree is REAL for the
data (handing 10k leaves to NJ estimation would be O(n^3)).

  python scripts/make_scale_dataset.py --n 10000 --queries 10000 \
      --out scratch/scale10k

Outputs: backbone.aln.fasta.gz, backbone.tre, queries.fasta.
"""

import argparse
import sys as _sys0
_sys0.setrecursionlimit(200000)
import gzip
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

ALPHA = "ACGT"


def random_tree(n, rng):
    """Random coalescent topology; returns (children, bl, order) with
    nodes 0..n-1 = leaves, binary internals appended; root = last."""
    nodes = list(range(n))
    children = {}
    bl = {}
    nxt = n
    while len(nodes) > 1:
        i, j = rng.choice(len(nodes), 2, replace=False)
        a, b = nodes[i], nodes[j]
        for x in (i, j) if i > j else (j, i):
            nodes.pop(x)
        children[nxt] = (a, b)
        # coalescent-ish heights compressed into usable branch lengths
        bl[a] = float(rng.exponential(0.06) + 0.01)
        bl[b] = float(rng.exponential(0.06) + 0.01)
        nodes.append(nxt)
        nxt += 1
    root = nodes[0]
    return children, bl, root


def newick(children, bl, root, names):
    out = []

    def rec(v):
        if v not in children:
            out.append(names[v])
        else:
            a, b = children[v]
            out.append("(")
            rec(a)
            out.append(":%.6f," % bl[a])
            rec(b)
            out.append(":%.6f" % bl[b])
            out.append(")")
    rec(root)
    return "".join(out) + ";"


def evolve(children, bl, root, n, L, rng, col_freqs, gap_p):
    """Evolve codes + presence masks down the tree (iterative DFS)."""
    codes = np.zeros((n, L), np.int8)
    root_codes = np.array(
        [rng.choice(4, p=col_freqs[c]) for c in range(L)], np.int8)
    root_pres = rng.random(L) > gap_p
    stack = [(root, root_codes, root_pres)]
    while stack:
        v, cv, pv = stack.pop()
        if v not in children:
            codes[v] = np.where(pv, cv, -1)
            continue
        for ch in children[v]:
            d = bl[ch]
            p_sub = 1.0 - np.exp(-d)
            c2 = cv.copy()
            mut = rng.random(L) < p_sub
            c2[mut] = rng.integers(0, 4, int(mut.sum()))
            p2 = pv.copy()
            # indel events: runs of columns gained/lost
            n_ev = rng.poisson(d * 12)
            for _ in range(n_ev):
                s = int(rng.integers(0, L))
                ln = 1 + int(rng.geometric(0.35))
                p2[s:s + ln] = not p2[s] if ln else p2[s]
            stack.append((ch, c2, p2))
    return codes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--queries", type=int, default=10000)
    ap.add_argument("--cols", type=int, default=1536)
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--out", default="scratch/scale10k")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    n, L = args.n, args.cols

    # column base frequencies off a dirichlet (conserved + variable mix)
    conc = np.where(rng.random(L) < 0.5, 0.3, 5.0)
    col_freqs = np.stack([rng.dirichlet(np.full(4, c)) for c in conc])

    children, bl, root = random_tree(n, rng)
    names = ["S%05d" % i for i in range(n)]
    codes = evolve(children, bl, root, n, L, rng, col_freqs, gap_p=0.12)

    # drop all-gap columns
    keep = (codes >= 0).any(axis=0)
    codes = codes[:, keep]
    L = codes.shape[1]
    print("backbone: %d seqs x %d cols, mean occupancy %.2f"
          % (n, L, float((codes >= 0).mean())))

    with gzip.open(os.path.join(args.out, "backbone.aln.fasta.gz"),
                   "wt") as f:
        lut = np.frombuffer(b"ACGT", np.uint8)
        for i in range(n):
            row = np.where(codes[i] >= 0,
                           lut[np.clip(codes[i], 0, 3)],
                           ord("-")).astype(np.uint8)
            f.write(">%s\n%s\n" % (names[i], row.tobytes().decode()))
    with open(os.path.join(args.out, "backbone.tre"), "w") as f:
        f.write(newick(children, bl, root, names) + "\n")

    # queries: fragments of further-mutated backbone rows
    with open(os.path.join(args.out, "queries.fasta"), "w") as f:
        lut = "ACGT"
        for qi in range(args.queries):
            src = int(rng.integers(0, n))
            seq = codes[src][codes[src] >= 0]
            p_sub = 1.0 - np.exp(-float(rng.exponential(0.05) + 0.02))
            mut = rng.random(len(seq)) < p_sub
            s2 = seq.copy()
            s2[mut] = rng.integers(0, 4, int(mut.sum()))
            frac = rng.uniform(0.15, 0.6)
            ln = max(30, int(len(s2) * frac))
            st = int(rng.integers(0, max(1, len(s2) - ln + 1)))
            frag = s2[st:st + ln]
            f.write(">Q%05d\n%s\n" % (qi, "".join(lut[c] for c in frag)))
    print("queries: %d" % args.queries)


if __name__ == "__main__":
    main()
