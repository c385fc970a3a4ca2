"""Small end-to-end pipeline tests on CPU (tiny synthetic data)."""

import gzip
import os

import numpy as np
import pytest

from witch_tpu.cli import init_parser
from witch_tpu.config import Configs, build_configs
from witch_tpu.io.fasta import read_fasta, write_fasta


@pytest.fixture()
def tiny_problem(tmp_path):
    """A 30-seq backbone alignment + tree + 8 fragmentary queries."""
    rng = np.random.default_rng(11)
    letters = np.array(list("ACGT"))
    base = letters[rng.integers(0, 4, 120)]
    rows = []
    for i in range(30):
        s = base.copy()
        mut = rng.random(120) < 0.1
        s[mut] = letters[rng.integers(0, 4, mut.sum())]
        gap = rng.random(120) < 0.05
        s = np.where(gap, "-", s)
        rows.append((f"t{i}", "".join(s)))
    bb_path = tmp_path / "bb.fasta"
    write_fasta(rows, str(bb_path))
    queries = []
    for i in range(8):
        src = rows[rng.integers(0, 30)][1].replace("-", "")
        a = rng.integers(0, 40)
        queries.append((f"q{i}", src[a:a + 60]))
    q_path = tmp_path / "q.fasta"
    write_fasta(queries, str(q_path))
    return bb_path, q_path


def _run(args):
    parser = init_parser()
    build_configs(parser, args)
    from witch_tpu.pipeline import main_alignment_process
    return main_alignment_process()


def test_scenario_c_and_resume(tiny_problem, tmp_path):
    bb, q = tiny_problem
    outdir = tmp_path / "out"
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(outdir),
                "-o", "aligned.fasta", "--save-weight", "1"])
    rows = dict(read_fasta(out))
    assert len(rows) == 38           # 30 backbone + 8 queries
    masked = dict(read_fasta(str(outdir / "aligned.masked.fasta")))
    assert len(next(iter(masked.values()))) == 120
    # every query's residues survive ungapped
    qd = dict(read_fasta(str(q)))
    for name, seq in qd.items():
        assert rows[name].replace("-", "").upper() == seq.upper()

    # artifacts exist
    assert (outdir / "weights.txt").exists()
    assert (outdir / "checkpoint_alignments.txt.gz").exists()
    assert (outdir / "tree_decomp" / "backbone.est.tre").exists()

    # resume: rerun reuses weights + checkpoints and reproduces output
    out2 = _run(["-b", str(bb), "-q", str(q), "-d", str(outdir),
                 "-o", "aligned2.fasta", "--save-weight", "1"])
    rows2 = dict(read_fasta(out2))
    assert rows2 == rows


def test_decomposition_reuse(tiny_problem, tmp_path):
    bb, q = tiny_problem
    out1 = tmp_path / "o1"
    _run(["-b", str(bb), "-q", str(q), "-d", str(out1),
          "-o", "aligned.fasta", "--keep-decomposition", "1"])
    hmmdir = out1 / "tree_decomp" / "root"
    assert any(d.startswith("A_0_") for d in os.listdir(hmmdir))
    out2 = tmp_path / "o2"
    got = _run(["-b", str(bb), "-q", str(q), "-d", str(out2),
                "-o", "aligned.fasta", "-p", str(hmmdir)])
    r1 = dict(read_fasta(str(out1 / "aligned.fasta")))
    r2 = dict(read_fasta(got))
    assert r1 == r2


def test_scenario_a_end_to_end(tmp_path):
    """-i only: backbone selection + alignment + tree + full pipeline."""
    rng = np.random.default_rng(5)
    letters = np.array(list("ACGT"))
    base = letters[rng.integers(0, 4, 100)]
    records = []
    for i in range(24):                      # full-length (backbone pool)
        s = base.copy()
        mut = rng.random(100) < 0.08
        s[mut] = letters[rng.integers(0, 4, mut.sum())]
        records.append((f"f{i}", "".join(s)))
    for i in range(6):                       # fragments (become queries)
        a = rng.integers(0, 40)
        records.append((f"q{i}", records[i][1][a:a + 45]))
    inp = tmp_path / "all.fasta"
    write_fasta(records, str(inp))
    outdir = tmp_path / "out"
    out = _run(["-i", str(inp), "-d", str(outdir), "-o", "aligned.fasta"])
    rows = dict(read_fasta(out))
    assert len(rows) == 30
    src = dict(records)
    for name, seq in rows.items():
        assert seq.replace("-", "").upper() == src[name].upper()
    # masked output exists and is flush
    masked = dict(read_fasta(str(outdir / "aligned.masked.fasta")))
    widths = {len(v) for v in masked.values()}
    assert len(widths) == 1


def test_config_file_layering(tiny_problem, tmp_path):
    bb, q = tiny_problem
    cfg = tmp_path / "user.config"
    cfg.write_text("[commandline]\nnum-hmms = 3\n")
    parser = init_parser()
    build_configs(parser, ["-b", str(bb), "-q", str(q),
                           "-d", str(tmp_path / "x"), "-c", str(cfg)])
    assert Configs.num_hmms == 3
    # cmdline wins over config file
    build_configs(parser, ["-b", str(bb), "-q", str(q),
                           "-d", str(tmp_path / "x"), "-c", str(cfg),
                           "-k", "7"])
    assert Configs.num_hmms == 7


def test_old_witch_mode(tiny_problem, tmp_path):
    bb, q = tiny_problem
    outdir = tmp_path / "ow"
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(outdir),
                "-o", "aligned.fasta", "-m", "old-witch"])
    rows = dict(read_fasta(out))
    assert len(rows) == 38
    qd = dict(read_fasta(str(q)))
    for name, seq in qd.items():
        assert rows[name].replace("-", "").upper() == seq.upper()


def test_amino_scenario_c(tmp_path):
    """Protein pipeline end-to-end (molecule inference + amino priors)."""
    rng = np.random.default_rng(9)
    letters = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    base = letters[rng.integers(0, 20, 80)]
    rows = []
    for i in range(20):
        s = base.copy()
        mut = rng.random(80) < 0.1
        s[mut] = letters[rng.integers(0, 20, mut.sum())]
        rows.append((f"p{i}", "".join(s)))
    bb = tmp_path / "bb.fasta"
    write_fasta(rows, str(bb))
    queries = [(f"q{i}", rows[i][1][10:60]) for i in range(4)]
    q = tmp_path / "q.fasta"
    write_fasta(queries, str(q))
    outdir = tmp_path / "out"
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(outdir),
                "-o", "aligned.fasta"])
    rows_out = dict(read_fasta(out))
    assert len(rows_out) == 24
    for name, seq in queries:
        assert rows_out[name].replace("-", "").upper() == seq
    import re
    log = (outdir / "log.txt").read_text()
    assert "amino" in log


def test_scenario_b_no_weight(tiny_problem, tmp_path):
    """-w 0 (scenario B): raw ranked bitscores instead of weights; every
    query still aligns and the weight file holds score tuples."""
    bb, q = tiny_problem
    outdir = tmp_path / "outb"
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(outdir),
                "-o", "aligned.fasta", "-w", "0", "--save-weight", "1"])
    rows = dict(read_fasta(out))
    qnames = [n for n, _ in read_fasta(str(q))]
    for n in qnames:
        assert n in rows
    # scores saved instead of normalized weights: entries need not sum ~1
    wpath = os.path.join(str(outdir), "weights.txt")
    assert os.path.exists(wpath)
