"""Full-grid score grader: native domaindef engine vs the reference's
bundled hmmsearch binary on the example workload (141 HMMs x 500 queries).

Reproduces the CALIBRATION.md validation numbers from a clean checkout
(round-2 state: membership 70,276/70,500; score column 46,122/46,179;
bias column 46,170/46,179 print-exact):

  python scripts/grade_scores.py            # full grid, ~5-8 min on 4 cores
  python scripts/grade_scores.py --limit 8  # smoke: first 8 models

For every ensemble model the same .hmm text file (our hmmbuild,
parity <5e-6 vs the binary — tests/test_hmmbuild_parity.py) is scored
two ways against the 500 example queries:

  oracle: hmmsearch --noali -E 99999999 --max --cpu 1  (the exact
          invocation WITCH makes, witch_msa/gcmm/algorithm.py:524-537),
          parsing the per-target (score, bias) print columns with the
          reference's own regex semantics (algorithm.py:579-605);
  ours:   the native engine (native/domaindef_kernel.cpp): AVX-512
          flank rows + evaluate_targets_rows gate/null2 + f64 exact
          Forward + p7_pipeline reconstruction-score substitution —
          the identical code path pipeline.compute_scores runs.

Grades: reported-set membership, and 0.1-bit print-exactness of the
score and bias columns over the intersection.
"""

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

REF = "/root/reference"
HMMSEARCH = os.path.join(REF, "witch_msa/tools/magus/tools/hmmer/hmmsearch")
DATA = os.path.join(REF, "examples/data")

# the reference's per-target line regex (algorithm.py:583-585), extended
# by one group so the bias column (group 3) is graded too
_LINE = re.compile(
    r"([^\s]+)\s+([^\s]+)\s+([^\s]+)\s+([^\s]+)\s+([^\s]+)\s+"
    r"([^\s]+)\s+([^\s]+)\s+([^\s]+)\s+([^\s]+)")


def parse_hmmsearch(text):
    """taxon -> (score_str, bias_str) from the complete-sequences table."""
    out = {}
    reading = False
    for line in text.split("\n"):
        line = line.strip()
        if not reading and line.startswith("E-value"):
            reading = True
        elif reading and line == "":
            break
        elif reading:
            m = _LINE.search(line)
            if m is not None and m.group(0).find("--") == -1:
                out[m.group(9).strip()] = (m.group(2), m.group(3))
    return out


def run_oracle(hmm_path, qpath):
    r = subprocess.run(
        [HMMSEARCH, "--noali", "-E", "99999999", "--max", "--cpu", "1",
         hmm_path, qpath],
        capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        raise RuntimeError("hmmsearch failed: %s" % r.stderr[-500:])
    return parse_hmmsearch(r.stdout)


def run_ours(core, qcodes):
    """taxon-index -> (reported bool, score bits, bias bits) via the
    native engine (mirrors pipeline.compute_scores eval_model +
    score assembly, witch_tpu/pipeline.py)."""
    from witch_tpu.hmm.profile import configure, null1_score
    from witch_tpu.native import _domaindef, set_trace_alphabet

    set_trace_alphabet(core.molecule)
    prof = configure(core, multihit=True)
    args = [np.ascontiguousarray(prof.msc, np.float64)] + [
        np.ascontiguousarray(getattr(prof, a), np.float64)
        for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                  "t_dm", "t_dd", "bm")]
    codes_list = [np.ascontiguousarray(c, np.int32) for c in qcodes]
    flank = getattr(_domaindef, "flank_targets_simd", None)
    if flank is not None:
        _, mocc, ppb, ppe = flank(*args, codes_list, 1)
        fwd = np.asarray(_domaindef.forward_targets_exact(
            *args, codes_list, 1))
        nreg, nenv, sbias, _fz, senv, sbsum, ldv = \
            _domaindef.evaluate_targets_rows(
                *args, codes_list, 42, 200, 1, 0, mocc, ppb, ppe, 1)
    else:
        nreg, nenv, sbias, fwd, senv, sbsum, ldv = \
            _domaindef.evaluate_targets(*args, codes_list, 42, 200, 1, 1)
    ln2 = np.log(2.0)
    out = []
    for t, c in enumerate(qcodes):
        Lq = len(c)
        null1 = null1_score(Lq)
        seq = (fwd[t] - null1 - sbias[t]) / ln2
        if ldv[t] > 0:
            sum_nats = senv[t] + (Lq - ldv[t]) * np.log(Lq / (Lq + 3.0))
            bias2 = np.logaddexp(0.0, np.log(1.0 / 256.0) + sbsum[t])
            sumsc = (sum_nats - null1 - bias2) / ln2
            if sumsc > seq:
                seq = sumsc
        out.append((bool(nreg[t] > 0 and nenv[t] > 0),
                    float(seq), float(sbias[t] / ln2)))
    # exact-f32 reported-score chain (single-envelope pairs): the
    # binary's printed score and bias (= pre - score) bit-exactly
    exact32 = getattr(_domaindef, "exact_scores32", None)
    if exact32 is not None:
        okx, seqx, prex = exact32(*args, codes_list, 4)
        for t in range(len(out)):
            if okx[t]:
                out[t] = (out[t][0], float(seqx[t]),
                          float(prex[t] - seqx[t]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=None,
                    help="grade only the first N models (smoke)")
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    from witch_tpu.core.alignment import PackedAlignment
    from witch_tpu.ensemble import build_ensemble
    from witch_tpu.io.fasta import read_fasta
    from witch_tpu.io.hmmer_text import write_hmm

    t0 = time.time()
    bb = PackedAlignment.from_fasta(
        os.path.join(DATA, "backbone.aln.fasta.gz"), molecule="dna")
    ens = build_ensemble(bb, os.path.join(DATA, "backbone.tre"),
                         alignment_size=10, molecule="dna", n_workers=4)
    indices = ens.indices
    if args.limit:
        indices = indices[:args.limit]
    print("[%5.1fs] ensemble built: grading %d models"
          % (time.time() - t0, len(indices)), flush=True)

    qpath = os.path.join(DATA, "unaligned_frag.fasta")
    qnames, qcodes = [], []
    for name, seq in read_fasta(qpath):
        qnames.append(name)
        qcodes.append(bb.alphabet.encode(seq.upper()))

    tmpdir = tempfile.mkdtemp(prefix="grade_scores_")

    def grade_model(idx):
        core = ens.cores[idx]
        hmm_path = os.path.join(tmpdir, "A_0_%d.hmm" % idx)
        write_hmm(core, hmm_path)
        oracle = run_oracle(hmm_path, qpath)
        ours = run_ours(core, qcodes)
        mem_ok = mem_tot = sc_ok = bias_ok = printed = 0
        for t, name in enumerate(qnames):
            rep, score, bias = ours[t]
            o = oracle.get(name)
            mem_tot += 1
            if rep == (o is not None):
                mem_ok += 1
            if o is not None and rep:
                printed += 1
                if "%.1f" % score == o[0]:
                    sc_ok += 1
                if "%.1f" % bias == o[1]:
                    bias_ok += 1
        return idx, mem_ok, mem_tot, sc_ok, bias_ok, printed

    tot = np.zeros(5, np.int64)  # mem_ok, mem_tot, sc_ok, bias_ok, printed
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        for idx, mem_ok, mem_tot, sc_ok, bias_ok, printed in ex.map(
                grade_model, indices):
            tot += (mem_ok, mem_tot, sc_ok, bias_ok, printed)
            if mem_ok != mem_tot or sc_ok != printed:
                print("  model %3d: membership %d/%d score %d/%d bias %d/%d"
                      % (idx, mem_ok, mem_tot, sc_ok, printed,
                         bias_ok, printed), flush=True)
    print("[%5.1fs] TOTALS: membership %d/%d  score %d/%d  bias %d/%d"
          % (time.time() - t0, tot[0], tot[1], tot[2], tot[4],
             tot[3], tot[4]), flush=True)


if __name__ == "__main__":
    main()
