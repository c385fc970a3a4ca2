"""Production edge cases: degenerate residues, renamed taxa, tiny and
odd inputs. All run the full pipeline on CPU."""

import os

import numpy as np
import pytest

from witch_tpu.cli import init_parser
from witch_tpu.config import build_configs
from witch_tpu.io.fasta import read_fasta, write_fasta


def _run(args):
    build_configs(init_parser(), args)
    from witch_tpu.pipeline import main_alignment_process
    return main_alignment_process()


def _bb(tmp_path, n=16, L=90, molecule="dna", seed=5):
    rng = np.random.default_rng(seed)
    letters = np.array(list("ACGT" if molecule != "amino"
                            else "ACDEFGHIKLMNPQRSTVWY"))
    base = letters[rng.integers(0, len(letters), L)]
    rows = []
    for i in range(n):
        s = base.copy()
        mut = rng.random(L) < 0.12
        s[mut] = letters[rng.integers(0, len(letters), mut.sum())]
        rows.append((f"t{i}", "".join(s)))
    p = tmp_path / "bb.fasta"
    write_fasta(rows, str(p))
    return p, rows


def test_degenerate_residues_and_renamed_taxa(tmp_path):
    bb, rows = _bb(tmp_path)
    # queries with N (degenerate), lowercase input, and a '/' in the name
    src = rows[3][1]
    queries = [
        ("qN", src[5:60].replace(src[10], "N", 1)),
        ("q/slash", src[10:70].lower()),
        ("qshort", src[20:34]),
    ]
    q = tmp_path / "q.fasta"
    write_fasta(queries, str(q))
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(tmp_path / "o"),
                "-o", "aligned.fasta"])
    d = dict(read_fasta(out))
    assert "qN" in d and "q/slash" in d and "qshort" in d
    # residues preserved (case-insensitively)
    assert d["q/slash"].replace("-", "").replace(".", "").upper() \
        == queries[1][1].upper()


def test_single_query_and_duplicate_content(tmp_path):
    bb, rows = _bb(tmp_path, seed=7)
    q = tmp_path / "q.fasta"
    # a query identical to a backbone sequence plus an exact duplicate
    write_fasta([("dup1", rows[0][1]), ("dup2", rows[0][1])], str(q))
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(tmp_path / "o2"),
                "-o", "aligned.fasta"])
    d = dict(read_fasta(out))
    assert "dup1" in d and "dup2" in d
    assert d["dup1"] == d["dup2"]


def test_rna_end_to_end(tmp_path):
    rng = np.random.default_rng(9)
    letters = np.array(list("ACGU"))
    base = letters[rng.integers(0, 4, 80)]
    rows = []
    for i in range(12):
        s = base.copy()
        mut = rng.random(80) < 0.1
        s[mut] = letters[rng.integers(0, 4, mut.sum())]
        rows.append((f"r{i}", "".join(s)))
    bb = tmp_path / "bb.fasta"
    write_fasta(rows, str(bb))
    q = tmp_path / "q.fasta"
    write_fasta([("rq0", rows[2][1][10:60]), ("rq1", rows[5][1][:45])],
                str(q))
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(tmp_path / "o3"),
                "-o", "aligned.fasta", "--molecule", "rna"])
    d = dict(read_fasta(out))
    assert "rq0" in d and "rq1" in d


def test_query_with_no_hits_is_ignored(tmp_path):
    bb, rows = _bb(tmp_path, seed=11)
    rng = np.random.default_rng(4)
    junk = "".join(np.random.default_rng(2).choice(list("ACGT"), 40))
    # a pure-junk query may or may not clear the reporting gate; the
    # pipeline must either align it or list it in ignored_queries.fasta
    q = tmp_path / "q.fasta"
    write_fasta([("junk", junk), ("real", rows[1][1][5:55])], str(q))
    outdir = tmp_path / "o4"
    out = _run(["-b", str(bb), "-q", str(q), "-d", str(outdir),
                "-o", "aligned.fasta"])
    d = dict(read_fasta(out))
    assert "real" in d
    ignored = os.path.join(str(outdir), "ignored_queries.fasta")
    assert "junk" in d or os.path.exists(ignored)
