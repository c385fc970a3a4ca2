"""Flag/config surface: every accepted flag is functional
(VERDICT round-1 item 7; reference flag list witch_msa/__init__.py:32-233,
including the flags the reference ships commented-out, which are active
and wired here)."""

import os

import numpy as np
import pytest

from witch_tpu.cli import init_parser
from witch_tpu.config import Configs, build_configs, set_valid_configuration


def _build(tmp_path, extra):
    return build_configs(init_parser(), [
        "-d", str(tmp_path / "out")] + extra)


def test_all_reference_flags_accepted(tmp_path):
    """Flag-for-flag: every reference CLI flag (active or commented)
    parses here."""
    _build(tmp_path, [
        "-i", "in.fasta", "-p", "hmmdir", "-b", "bb.fasta",
        "-e", "t.tre", "-q", "q.fasta", "-o", "out.fasta",
        "-t", "4", "--max-concurrent-jobs", "8", "--timeout", "60",
        "--chunksize", "2", "--collapse-singletons", "0",
        "--backbone-size", "500", "--selection-strategy", "random",
        "--backbone-method", "magus",
        "-m", "old-witch", "--keeptemp", "--keep-decomposition", "0",
        "-k", "4", "-w", "0", "--save-weight", "1", "-A", "5", "-Z", "25",
        "--molecule", "dna", "-s", "3", "--weight-adjust", "normalize",
        "-y", "--keepgcmtemp", "-f", "2.5", "--graphclustermethod", "none",
        "--graphtracemethod", "fm", "--graphtraceoptimize", "true"])
    assert Configs.chunksize == 2
    assert Configs.collapse_singletons is False
    assert Configs.backbone_size == 500
    assert Configs.selection_strategy == "random"
    assert Configs.subset_size == 3
    assert Configs.weight_adjust == "normalize"
    assert Configs.inflation_factor == 2.5
    assert Configs.graphclustermethod == "none"
    assert Configs.timeout == 60
    assert Configs.keeptemp is True


def test_config_sections(tmp_path):
    cfg = tmp_path / "user.config"
    cfg.write_text(
        "[commandline]\nnum-hmms = 7\n\n"
        "[Backbone]\nbackbone_size = 321\nselection_strategy = random\n"
        "alignment_method = magus\n\n"
        "[Basic]\nalignment_size = 12\n\n"
        "[MAGUS]\ninflation_factor = 3.0\ngraphclustermethod = none\n")
    _build(tmp_path, ["-c", str(cfg)])
    assert Configs.num_hmms == 7
    assert Configs.backbone_size == 321
    assert Configs.selection_strategy == "random"
    assert Configs.alignment_size == 12
    assert Configs.inflation_factor == 3.0
    assert Configs.graphclustermethod == "none"
    # cmdline wins over config sections
    _build(tmp_path, ["-c", str(cfg), "--backbone-size", "99",
                      "-f", "5.5"])
    assert Configs.backbone_size == 99
    assert Configs.inflation_factor == 5.5


def test_config_section_validation():
    with pytest.raises(AssertionError):
        set_valid_configuration("Backbone",
                                {"selection_strategy": "bogus"})
    with pytest.raises(AssertionError):
        set_valid_configuration("Backbone",
                                {"alignment_method": "bogus"})


def test_weight_adjust(tmp_path):
    from witch_tpu.pipeline import rank_and_weight
    scores = np.array([[10.0, 8.0, 5.0]])
    valid = np.ones((1, 3), bool)
    _build(tmp_path, [])
    Configs.weight_adjust = "normalize"
    w = rank_and_weight(scores, valid, [0, 1, 2],
                        {0: 5, 1: 5, 2: 5}, ["q"])["q"]
    assert abs(sum(x for _, x in w) - 1.0) < 1e-9
    Configs.weight_adjust = "maxto1"
    w = rank_and_weight(scores, valid, [0, 1, 2],
                        {0: 5, 1: 5, 2: 5}, ["q"])["q"]
    assert max(x for _, x in w) == pytest.approx(1.0)
    Configs.weight_adjust = "none"


def test_collapse_singletons_merge():
    from witch_tpu.merger import merge_rows
    bb = [("b1", "AC"), ("b2", "AC")]
    qs = [("q1", "Agg C"), ("q2", "Att C")]
    qs = [(n, r.replace(" ", "")) for n, r in qs]
    shared, _ = merge_rows(bb, qs, collapse_singletons=True)
    private, _ = merge_rows(bb, qs, collapse_singletons=False)
    # shared: both 2-char runs at boundary 1 share columns -> width 4
    assert len(shared[0][1]) == 4
    # private: 2+2 insertion columns -> width 6
    assert len(private[0][1]) == 6
    d = dict(private)
    assert d["q1"] == "Agg--C"   # q1 run first, q2's columns gapped
    assert d["q2"] == "A--ttC"


def test_selection_strategy_random():
    from witch_tpu.backbone import select_backbone
    recs = [("s%d" % i, "A" * (10 if i < 8 else 100)) for i in range(10)]
    bb, qs = select_backbone(recs, backbone_size=4, strategy="random")
    assert len(bb) == 4 and len(qs) == 6
    # median_length would exclude the two long ones entirely
    bbm, _ = select_backbone(recs, backbone_size=4)
    assert all(len(s) == 10 for _, s in bbm)


def test_gcm_options_flow():
    from witch_tpu.ops.gcm import gcm_align_query_row
    ac = np.array([0, 1, 2], np.int64)
    retained = np.arange(3)
    nongaps = np.full(3, 5.0)
    per_hmm = [(ac, retained, nongaps, 1.0)]
    r_mcl = gcm_align_query_row("AAA", 3, per_hmm, inflation=4.0)
    r_none = gcm_align_query_row("AAA", 3, per_hmm,
                                 clustermethod="none")
    assert r_mcl == r_none == "AAA"


def test_keeptemp_cleanup(tmp_path):
    from witch_tpu.pipeline import clear_temp_files
    _build(tmp_path, [])
    td = os.path.join(Configs.outdir, "tree_decomp")
    os.makedirs(os.path.join(td, "backbone"), exist_ok=True)
    os.makedirs(os.path.join(td, "root"), exist_ok=True)
    Configs.keeptemp = False
    Configs.keep_decomposition = True
    clear_temp_files()
    assert not os.path.isdir(os.path.join(td, "backbone"))
    assert os.path.isdir(os.path.join(td, "root"))
    os.makedirs(os.path.join(td, "backbone"), exist_ok=True)
    Configs.keep_decomposition = False
    clear_temp_files()
    assert not os.path.isdir(td)
    Configs.keeptemp = True
    Configs.keep_decomposition = True
