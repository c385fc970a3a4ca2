"""hmmalign parity: our posterior-OA alignment vs the bundled binary.

The quantity under test is exactly what WITCH consumes from hmmalign
output (aligner.py:126-142): per query residue, the match column it
aligns to (or -1 for insert/flank)."""

import subprocess

import numpy as np

from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.core.alphabet import DNA
from witch_tpu.hmm.align_ref import aligned_columns
from witch_tpu.hmm.build import build_hmm, quantize_like_text
from witch_tpu.hmm.profile import configure
from witch_tpu.io.fasta import read_fasta
from witch_tpu.io.hmmer_text import write_hmm


def _binary_columns(hmmalign_bin, hmm_path, qname, qseq, tmp_path):
    qf = tmp_path / "q.fasta"
    qf.write_text(">%s\n%s\n" % (qname, qseq))
    sto = tmp_path / "q.sto"
    subprocess.run([hmmalign_bin, "-o", str(sto), str(hmm_path), str(qf)],
                   check=True, capture_output=True)
    seq = ""
    for line in sto.read_text().split("\n"):
        s = line.strip()
        if not s or s.startswith("#") or s == "//":
            continue
        k, v = s.split()
        if k == qname:
            seq += v
    seq = seq.replace(".", "-")
    cols, regular = [], 0
    for ch in seq:
        if ch == "-":
            regular += 1
        elif ch.islower():
            cols.append(-1)
        else:
            cols.append(regular)
            regular += 1
    return np.array(cols)


def test_oa_alignment_matches_binary(hmmalign_bin, example_data, tmp_path):
    bb = PackedAlignment.from_fasta(
        str(example_data / "backbone.aln.fasta.gz"), molecule="dna")
    sub = bb.sub_alignment(bb.names[100:130])
    sub2, _ = sub.delete_all_gap_columns()
    core = quantize_like_text(build_hmm(sub2.codes, sub2.alphabet, "dna",
                                        name="t"))
    hmm_path = tmp_path / "t.hmm"
    write_hmm(core, str(hmm_path))
    prof = configure(core, multihit=False)   # hmmalign = unihit local
    queries = list(read_fasta(str(example_data / "unaligned_frag.fasta")))
    for name, seq in queries[5:9]:
        ref = _binary_columns(hmmalign_bin, hmm_path, name, seq.upper(),
                              tmp_path)
        mine = aligned_columns(prof, DNA.encode(seq.upper()))
        assert np.array_equal(ref, mine), name


def test_native_oa_matches_numpy(example_data, tmp_path):
    """The C++ OA kernel must agree with the numpy reference exactly."""
    import numpy as np
    from witch_tpu.hmm.align_ref import (posterior_decode, oa_fill,
                                         oa_trace, oa_columns_from_pp)
    pytest = __import__("pytest")
    try:
        from witch_tpu.native import _oa  # noqa: F401
    except ImportError:
        pytest.skip("native extension not built")
    bb = PackedAlignment.from_fasta(
        str(example_data / "backbone.aln.fasta.gz"), molecule="dna")
    sub = bb.sub_alignment(bb.names[:25])
    sub2, _ = sub.delete_all_gap_columns()
    core = quantize_like_text(build_hmm(sub2.codes, sub2.alphabet, "dna"))
    prof = configure(core, multihit=False)
    queries = list(read_fasta(str(example_data / "unaligned_frag.fasta")))
    for name, seq in queries[10:14]:
        codes = DNA.encode(seq.upper())
        pp = posterior_decode(prof, codes)
        nat = oa_columns_from_pp(prof, pp)
        mx = oa_fill(prof, pp)
        path = oa_trace(prof, pp, mx)
        ref = np.full(len(codes), -1, dtype=np.int64)
        for st, k, i in path:
            if st == "M" and i > 0:
                ref[i - 1] = k - 1
        assert np.array_equal(nat, ref), name
