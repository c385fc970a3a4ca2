"""old-witch (GCM) mode golden regression vs a true reference execution.

The oracle was produced by the reference WITCH v1.0.10 in
`--mode old-witch` (vendored MAGUS + bundled mcl) on 24 example queries
with the reference's own decomposition, after fixing the upstream
`Configs.gcm_path` AttributeError (gcmm/aligner.py:218, the variable is
unused) and shimming dendropy for the vendored MAGUS. 5 of the 24 rows
genuinely differ from witch-ng mode (SECH, SIC, SBFA, SDAG, SGCI).

Our ops/gcm.py (MCL-filtered edge-graph merge) reproduces 20/24 rows
exactly, including SBFA where GCM diverges from the DP; agreement stats
are documented in docs/CALIBRATION.md. The floor below guards
regressions without requiring bit-exactness of the remaining rows.
"""

import gzip
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden")
DATA = "/root/reference/examples/data"


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


@pytest.mark.skipif(not os.path.isdir(DATA), reason="example data absent")
def test_oldwitch_golden(tmp_path):
    from witch_tpu.cli import init_parser
    from witch_tpu.config import build_configs
    from witch_tpu.pipeline import main_alignment_process
    qpath = os.path.join(GOLD, "ref_oldwitch.queries.fasta")
    outdir = tmp_path / "out"
    build_configs(init_parser(), [
        "-b", os.path.join(DATA, "backbone.aln.fasta.gz"),
        "-e", os.path.join(DATA, "backbone.tre"),
        "-q", qpath, "-d", str(outdir), "-o", "aligned.fasta",
        "--mode", "old-witch"])
    out = main_alignment_process()
    masked = os.path.join(os.path.dirname(out), "aligned.masked.fasta")
    mine = _read_fasta_dict(open(masked))
    with gzip.open(os.path.join(GOLD,
                   "ref_oldwitch.aligned.masked.fasta.gz"), "rt") as f:
        oracle = _read_fasta_dict(f)
    qnames = _read_fasta_dict(open(qpath)).keys()
    good = sum(1 for n in qnames if mine.get(n) == oracle[n])
    assert good >= 19, \
        "old-witch agreement dropped: %d/24 rows match the MAGUS-GCM " \
        "oracle" % good


@pytest.mark.skipif(not os.path.isdir(DATA), reason="example data absent")
@pytest.mark.skipif(not os.environ.get("WITCH_TPU_GOLDEN"),
                    reason="slow tier (set WITCH_TPU_GOLDEN); ~5 min")
def test_oldwitch_500_golden(tmp_path):
    """Full 500-query old-witch golden vs a true reference GCM
    execution (vendored MAGUS + bundled mcl via scripts/ref_harness.py;
    oracle regenerated round 4 with the dendropy.utility shim fix —
    the earlier 24-query tier sampled 5 of the hard rows).

    Measured: 963/1000 rows bit-identical. Wherever GCM agrees with
    witch-ng (953 rows) we match ALL of them; of the 47 rows where GCM
    genuinely diverges (MCL clustering + trace specifics) we reproduce
    10. Floor 950 guards the approximation without requiring the
    divergent-tail rows."""
    from witch_tpu.cli import init_parser
    from witch_tpu.config import build_configs
    from witch_tpu.pipeline import main_alignment_process
    outdir = tmp_path / "out500"
    build_configs(init_parser(), [
        "-b", os.path.join(DATA, "backbone.aln.fasta.gz"),
        "-e", os.path.join(DATA, "backbone.tre"),
        "-q", os.path.join(DATA, "unaligned_frag.fasta"),
        "-d", str(outdir), "-o", "aligned.fasta",
        "--mode", "old-witch"])
    out = main_alignment_process()
    masked = os.path.join(os.path.dirname(out), "aligned.masked.fasta")
    mine = _read_fasta_dict(open(masked))
    with gzip.open(os.path.join(
            GOLD, "ref_oldwitch500.aligned.masked.fasta.gz"), "rt") as f:
        oracle = _read_fasta_dict(f)
    assert len(oracle) == 1000
    same = sum(1 for n in oracle if mine.get(n) == oracle[n])
    assert same >= 950, "old-witch 500q floor: %d/1000" % same
