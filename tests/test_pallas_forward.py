"""Pallas Forward kernel correctness (interpret mode on CPU)."""

import numpy as np

from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.core.alphabet import DNA
from witch_tpu.hmm.bank import build_banks
from witch_tpu.hmm.build import build_hmm, quantize_like_text
from witch_tpu.hmm.forward_ref import bit_score
from witch_tpu.hmm.profile import configure
from witch_tpu.io.fasta import read_fasta
from witch_tpu.ops.pallas_forward import pallas_forward_bits


def test_pallas_matches_f64_reference(example_data):
    bb = PackedAlignment.from_fasta(
        str(example_data / "backbone.aln.fasta.gz"), molecule="dna")
    cores = []
    for sl in (slice(0, 12), slice(30, 45)):
        sub = bb.sub_alignment(bb.names[sl])
        sub2, _ = sub.delete_all_gap_columns()
        cores.append(quantize_like_text(
            build_hmm(sub2.codes, sub2.alphabet, "dna")))
    bank = build_banks(cores, uniform=True)[0]
    queries = list(read_fasta(str(example_data / "unaligned_frag.fasta")))
    codes_list = [DNA.encode(s.upper()) for _, s in queries[:5]]
    Lmax = max(len(c) for c in codes_list)
    cm = np.zeros((5, Lmax), np.int32)
    lens = np.zeros(5, np.int32)
    for i, c in enumerate(codes_list):
        cm[i, :len(c)] = c
        lens[i] = len(c)
    got = pallas_forward_bits(bank, cm, lens, QT=8, interpret=True)
    for h, core in enumerate(cores):
        prof = configure(core, multihit=True)
        for q, c in enumerate(codes_list):
            exp = bit_score(prof, c)
            assert abs(got[q, h] - exp) < 5e-3, (q, h, got[q, h], exp)


def test_grouped_by_length_matches_blocked(example_data):
    """Length-grouped dispatch (per-group Lpad + scatter) == blocked."""
    bb = PackedAlignment.from_fasta(
        str(example_data / "backbone.aln.fasta.gz"), molecule="dna")
    sub = bb.sub_alignment(bb.names[0:10])
    sub2, _ = sub.delete_all_gap_columns()
    bank = build_banks([quantize_like_text(
        build_hmm(sub2.codes, sub2.alphabet, "dna"))], uniform=True)[0]
    queries = list(read_fasta(str(example_data / "unaligned_frag.fasta")))
    codes_list = [DNA.encode(s.upper()) for _, s in queries[:20]]
    Lmax = max(len(c) for c in codes_list)
    cm = np.zeros((20, Lmax), np.int32)
    lens = np.zeros(20, np.int32)
    for i, c in enumerate(codes_list):
        cm[i, :len(c)] = c
        lens[i] = len(c)
    blocked = pallas_forward_bits(bank, cm, lens, QT=8, interpret=True,
                                  group_by_length=False)
    grouped = pallas_forward_bits(bank, cm, lens, QT=8, interpret=True,
                                  group_by_length=True)
    np.testing.assert_allclose(grouped, blocked, atol=2e-3)


def test_single_shape_matches_blocked(example_data):
    """canonical_pad single-program dispatch == blocked (the TPU
    production path: one program shape, one remote program load)."""
    bb = PackedAlignment.from_fasta(
        str(example_data / "backbone.aln.fasta.gz"), molecule="dna")
    sub = bb.sub_alignment(bb.names[0:10])
    sub2, _ = sub.delete_all_gap_columns()
    bank = build_banks([quantize_like_text(
        build_hmm(sub2.codes, sub2.alphabet, "dna"))], uniform=True)[0]
    queries = list(read_fasta(str(example_data / "unaligned_frag.fasta")))
    codes_list = [DNA.encode(s.upper()) for _, s in queries[:20]]
    Lmax = max(len(c) for c in codes_list)
    cm = np.zeros((20, Lmax), np.int32)
    lens = np.zeros(20, np.int32)
    for i, c in enumerate(codes_list):
        cm[i, :len(c)] = c
        lens[i] = len(c)
    blocked = pallas_forward_bits(bank, cm, lens, QT=8, interpret=True,
                                  group_by_length=False)
    single = pallas_forward_bits(bank, cm, lens, QT=8, interpret=True,
                                 single_shape=True)
    np.testing.assert_allclose(single, blocked, atol=2e-3)
