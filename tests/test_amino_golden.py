"""Amino-acid golden regression vs a true reference execution.

The oracle was produced by the reference WITCH v1.0.10 on a synthetic
120-seq protein family (5 clades, p-sub 0.25/branch, 4% indels): our
decomposition artifacts (hmmbuild-parity .hmm models consumed directly
by the bundled HMMER binaries), hmmsearch run with the real binary per
model, and the reference pipeline downstream (`-p` resume). Our amino
pipeline matches it on ALL 90/90 masked rows (30 queries + 60 backbone),
with every natively-evaluated (query, HMM) reported score print-exact
including ByTrace null2 biases up to 27 bits.
"""

import gzip
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden")


def _read_fasta_dict(fh):
    d, name, buf = {}, None, []
    for line in fh:
        line = line.strip()
        if line.startswith(">"):
            if name is not None:
                d[name] = "".join(buf)
            name, buf = line[1:].split()[0], []
        else:
            buf.append(line)
    if name is not None:
        d[name] = "".join(buf)
    return d


def test_amino_golden(tmp_path):
    from witch_tpu.cli import init_parser
    from witch_tpu.config import build_configs
    from witch_tpu.pipeline import main_alignment_process
    outdir = tmp_path / "out"
    build_configs(init_parser(), [
        "-b", os.path.join(GOLD, "ref_amino.backbone.fasta"),
        "-e", os.path.join(GOLD, "ref_amino.backbone.tre"),
        "-q", os.path.join(GOLD, "ref_amino.queries.fasta"),
        "-d", str(outdir), "-o", "aligned.fasta",
        "--molecule", "amino"])
    out = main_alignment_process()
    masked = os.path.join(os.path.dirname(out), "aligned.masked.fasta")
    mine = _read_fasta_dict(open(masked))
    with gzip.open(os.path.join(GOLD,
                   "ref_amino.aligned.masked.fasta.gz"), "rt") as f:
        oracle = _read_fasta_dict(f)
    bad = [n for n in oracle if mine.get(n) != oracle[n]]
    assert not bad, "%d/%d amino rows diverge: %s" % (
        len(bad), len(oracle), bad[:8])


def test_amino500_golden(tmp_path):
    """Production-scale amino golden: 100-seq backbone, 500 fragmentary
    queries (5 clades, substitutions + deletions, query insertions).
    Oracle = reference WITCH resumed from reference-native HMMER
    artifacts (scripts/make_amino_golden.py). Round 5 (exact Blocks9
    mixture + exact insert prior read from the bundled hmmbuild):
    grid membership 9500/9500, scores 9500/9500 AND bias 9500/9500
    print-exact; all 600 masked rows bit-identical."""
    from witch_tpu.cli import init_parser
    from witch_tpu.config import build_configs
    from witch_tpu.pipeline import main_alignment_process
    outdir = tmp_path / "out500"
    build_configs(init_parser(), [
        "-b", os.path.join(GOLD, "ref_amino500.backbone.fasta"),
        "-e", os.path.join(GOLD, "ref_amino500.backbone.tre"),
        "-q", os.path.join(GOLD, "ref_amino500.queries.fasta"),
        "-d", str(outdir), "-o", "aligned.fasta",
        "--molecule", "amino"])
    out = main_alignment_process()
    masked = os.path.join(os.path.dirname(out), "aligned.masked.fasta")
    mine = _read_fasta_dict(open(masked))
    with gzip.open(os.path.join(
            GOLD, "ref_amino500.aligned.masked.fasta.gz"), "rt") as f:
        oracle = _read_fasta_dict(f)
    bad = [n for n in oracle if mine.get(n) != oracle[n]]
    assert len(oracle) == 600
    assert not bad, "%d/600 amino rows diverge: %s" % (len(bad), bad[:8])
