"""Generate the PRODUCTION-SCALE amino golden: a synthetic protein
family with a 100-seq backbone and 500 fragmentary queries, plus the
reference-execution oracle.

Pipeline (one command, ~15 min on 4 cores):
  1. synthesize the family (5 clades, per-branch substitutions,
     deletions tracked through the true alignment; queries are
     fragments with untracked insertions so the lowercase/insertion
     machinery is exercised);
  2. build the decomposition with OUR pipeline (--keep-decomposition);
  3. regenerate every .hmm + hmmsearch.results.* with the REFERENCE's
     bundled HMMER binaries (scripts/ref_harness.py --rebuild), so all
     numbers the reference consumes are its own;
  4. run the REFERENCE pipeline (-p resume) -> oracle masked fasta;
  5. (separately) tests/test_amino_golden.py runs OUR pipeline on the
     same inputs and asserts row identity.

Usage:
    python scripts/make_amino_golden.py /tmp/amino500 [--commit]

--commit copies the dataset + oracle into tests/golden/ as
ref_amino500.*.
"""

import gzip
import os
import shutil
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

AA = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
N_CLADES = 5
BB_PER_CLADE = 20          # 100 backbone seqs
N_QUERIES = 500
ANC_LEN = 350
P_SUB = 0.22
P_DEL = 0.04
P_INS = 0.03


def evolve_cols(rng, cols, p_sub, p_del):
    """Evolve a column-indexed sequence: cols is [(col, aa_idx)].
    Substitutions keep the column id; deletions drop the entry (the
    true alignment keeps a gap there)."""
    out = []
    for col, aa in cols:
        if rng.random() < p_del:
            continue
        if rng.random() < p_sub:
            aa = int(rng.integers(20))
        out.append((col, aa))
    return out


def main():
    workdir = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                              else "/tmp/amino500")
    commit = "--commit" in sys.argv
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(20260820)

    anc = [(c, int(rng.integers(20))) for c in range(ANC_LEN)]
    clades = [evolve_cols(rng, anc, P_SUB, P_DEL)
              for _ in range(N_CLADES)]
    bb_rows = []        # (name, cols)
    for ci, clade in enumerate(clades):
        for s in range(BB_PER_CLADE):
            cols = evolve_cols(rng, clade, P_SUB, P_DEL)
            bb_rows.append(("bb_c%d_%d" % (ci, s), cols))

    # true backbone alignment over ancestral columns
    used = sorted({c for _, cols in bb_rows for c, _ in cols})
    col_pos = {c: i for i, c in enumerate(used)}
    W = len(used)
    bb_path = os.path.join(workdir, "backbone.fasta")
    with open(bb_path, "w") as f:
        for name, cols in bb_rows:
            row = ["-"] * W
            for c, aa in cols:
                row[col_pos[c]] = AA[aa]
            f.write(">%s\n%s\n" % (name, "".join(row)))

    # clade-structured tree (topology is all the decomposition uses)
    tre_path = os.path.join(workdir, "backbone.tre")
    with open(tre_path, "w") as f:
        parts = []
        for ci in range(N_CLADES):
            names = ["bb_c%d_%d:0.1" % (ci, s)
                     for s in range(BB_PER_CLADE)]
            # caterpillar inside each clade
            sub = names[0]
            for nm in names[1:]:
                sub = "(%s,%s):0.05" % (sub, nm)
            parts.append(sub)
        tree = parts[0]
        for p in parts[1:]:
            tree = "(%s,%s):0.2" % (tree, p)
        f.write(tree + ";\n")

    # fragmentary queries: evolve from a random clade, take a fragment,
    # sprinkle insertions (not in the backbone's column space)
    q_path = os.path.join(workdir, "queries.fasta")
    with open(q_path, "w") as f:
        for qi in range(N_QUERIES):
            clade = clades[int(rng.integers(N_CLADES))]
            cols = evolve_cols(rng, clade, P_SUB, P_DEL)
            seq = [AA[aa] for _, aa in cols]
            n = len(seq)
            flen = int(rng.integers(max(30, n // 5), max(60, n // 2)))
            a = int(rng.integers(0, max(1, n - flen)))
            frag = seq[a:a + flen]
            out = []
            for ch in frag:
                out.append(ch)
                if rng.random() < P_INS:
                    out.append(AA[int(rng.integers(20))])
            f.write(">q%d\n%s\n" % (qi, "".join(out)))

    print("dataset: %d backbone seqs x %d cols, %d queries -> %s"
          % (len(bb_rows), W, N_QUERIES, workdir))

    # ---- reference harness: decomposition + reference-native artifacts
    sys.path.insert(0, HERE)
    import ref_harness
    ref_harness.setup(workdir)
    ref_harness.build_hmmdir(workdir, rebuild=True, backbone=bb_path,
                             tree=tre_path, queries=q_path,
                             molecule="amino")

    # ---- reference run (-p resume)
    hmmdir = os.path.join(workdir, "ours_d", "tree_decomp", "root")
    out_ref = os.path.join(workdir, "ref_out")
    args = [sys.executable, os.path.join(workdir, "ref", "witch.py"),
            "--num-cpus", "4", "-b", bb_path, "-p", hmmdir,
            "-q", q_path, "-d", out_ref, "-o", "aligned.fasta",
            "--molecule", "amino"]
    print("+ " + " ".join(args))
    r = subprocess.run(args, env=ref_harness.ref_env(workdir))
    assert r.returncode == 0, "reference run failed"
    oracle = os.path.join(out_ref, "aligned.masked.fasta")
    assert os.path.exists(oracle)

    if commit:
        gold = os.path.join(REPO, "tests", "golden")
        shutil.copy(bb_path, os.path.join(gold,
                                          "ref_amino500.backbone.fasta"))
        shutil.copy(tre_path, os.path.join(gold,
                                           "ref_amino500.backbone.tre"))
        shutil.copy(q_path, os.path.join(gold,
                                         "ref_amino500.queries.fasta"))
        with open(oracle, "rb") as fin, gzip.open(
                os.path.join(gold,
                             "ref_amino500.aligned.masked.fasta.gz"),
                "wb") as fout:
            fout.write(fin.read())
        print("committed golden inputs + oracle to tests/golden/")
    print("oracle:", oracle)


if __name__ == "__main__":
    main()
