"""Tests for the witch-ng merge DP, weighting, and transitive merger."""

import numpy as np
import pytest

from witch_tpu.ops.merge_dp import (accumulate_edges, align_query_row,
                                    banded_dp, compress_insertions,
                                    traceback)
from witch_tpu.merger import merge_rows, parse_query_row, \
    remove_insertion_columns
from witch_tpu.weighting import (adaptive_top_hmms, calculate_weights,
                                 read_weights, write_weights)


def reference_dp(seq, backbone_length, cw_dict, min_col, max_col):
    """Direct transliteration of the published recurrence
    (aligner.py:426-482 semantics) used as a test oracle."""
    n = len(seq)
    ag = [[0.0] * (backbone_length + 1) for _ in range(n + 1)]
    bt = [[0] * (backbone_length + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        for j in range(min_col, max_col + 2):
            if i == 0 or j == min_col:
                ag[i][j] = 0.0
                continue
            cur_max, cur_bt = 0.0, 0
            cw = cw_dict.get((i - 1, j - 1), 0.0)
            values = [ag[i - 1][j - 1] + cw, ag[i - 1][j], ag[i][j - 1]]
            for ind, val in enumerate(values):
                if ind == 0 and cw <= 0:
                    cur_bt = 1
                    continue
                if val > cur_max:
                    cur_max = val
                    cur_bt = ind
            ag[i][j] = cur_max
            bt[i][j] = cur_bt
    result = []
    i, j = n, max_col + 1
    while i > 0 and j > min_col:
        b = bt[i][j]
        if b == 0:
            result.append(seq[i - 1]); i -= 1; j -= 1
        elif b == 1:
            result.append(seq[i - 1].lower()); i -= 1
        else:
            result.append("-"); j -= 1
    while i > 0:
        result.append(seq[i - 1].lower()); i -= 1
    while j > min_col:
        result.append("-"); j -= 1
    result = result[::-1]
    row = ["-"] * min_col + result + \
        ["-"] * (backbone_length - max_col - 1)
    return compress_insertions("".join(row))


def test_dp_matches_reference_semantics_random():
    rng = np.random.default_rng(0)
    for trial in range(30):
        n = int(rng.integers(3, 15))
        L = int(rng.integers(n, 25))
        seq = "".join(rng.choice(list("ACGT"), n))
        # random sparse edges
        cw = {}
        for _ in range(int(rng.integers(1, 3 * n))):
            i = int(rng.integers(0, n))
            j = int(rng.integers(0, L))
            cw[(i, j)] = cw.get((i, j), 0.0) + float(rng.integers(1, 9))
        min_col = min(j for _, j in cw)
        max_col = max(j for _, j in cw)
        expect = reference_dp(seq, L, cw, min_col, max_col)

        dense = np.zeros((n, max_col - min_col + 1))
        for (i, j), w in cw.items():
            dense[i, j - min_col] += w
        bt = banded_dp(dense)
        got = compress_insertions(
            traceback(seq, bt, min_col, max_col, L))
        assert got == expect, (trial, seq, cw, got, expect)


def test_align_query_row_simple():
    # query ACGT matches backbone columns 2..5 of a 8-col backbone
    ac = np.array([0, 1, 2, 3])
    retained = np.array([2, 3, 4, 5])
    nongaps = np.array([3, 3, 3, 3])
    row = align_query_row("ACGT", 8, [(ac, retained, nongaps, 1.0)])
    assert row == "--ACGT--"


def test_align_query_row_insertion():
    # middle residue has no column support -> insertion (lowercase)
    ac = np.array([0, -1, 1])
    retained = np.array([1, 3])
    nongaps = np.array([2, 2])
    row = align_query_row("AGT", 6, [(ac, retained, nongaps, 1.0)])
    assert row.replace("-", "").upper() == "AGT"
    assert "g" in row  # insertion kept lowercase
    assert row.index("A") < row.index("g") < row.index("T")


def test_calculate_weights_formula():
    w = calculate_weights([5, 7], [10.0, 8.0], [4, 4], 10)
    # w_5 = 1/(1 + 2^-2), w_7 = 1/(2^2 + 1)
    assert w[0][0] == 5
    np.testing.assert_allclose(w[0][1], 1 / (1 + 0.25))
    np.testing.assert_allclose(w[1][1], 1 / 5.0)
    # size adjustment: log2(s_j/s_i)
    w2 = calculate_weights([1, 2], [10.0, 10.0], [8, 2], 10)
    assert w2[0][0] == 1 and w2[0][1] > w2[1][1]


def test_adaptive_prefix():
    ws = ((1, 0.9), (2, 0.09), (3, 0.009), (4, 0.0009))
    top = adaptive_top_hmms(ws)
    assert [i for i, _ in top] == [1, 2, 3]  # 0.999 reached after 3
    assert adaptive_top_hmms(ws, use_weight=False) == [
        (1, 1), (2, 1), (3, 1), (4, 1)]


def test_weights_txt_roundtrip(tmp_path):
    d = {"q1": ((3, 0.75), (1, 0.25)), "q2": ((0, 1.0),)}
    p = str(tmp_path / "weights.txt")
    write_weights(d, p)
    assert read_weights(p) == d


def test_merge_rows_overlay():
    bb = [("b1", "ACGT"), ("b2", "A-GT")]
    q1 = "Axx-GT-"          # ins run of 2 after col 0, trailing nothing
    # q1: match A, ins x x, del, G, T, del? — must cover 4 backbone cols:
    q1 = "AxxCGT"           # A, ins xx, C, G, T
    q2 = "AC?GT".replace("?", "y")   # ins y after col 1
    recs, mask = merge_rows(bb, [("q1", q1), ("q2", q2)])
    d = dict(recs)
    width = len(d["b1"])
    assert all(len(r) == width for _, r in recs)
    # insertions overlay: q1 has 2 after col0, q2 has 1 after col1
    assert d["b1"] == "A--C-GT"
    assert d["q1"] == "AxxC-GT"
    assert d["q2"] == "A--CyGT"
    masked = dict(remove_insertion_columns(recs, mask))
    assert masked["b1"] == "ACGT"
    assert masked["q1"] == "ACGT"
    assert masked["q2"] == "ACGT"


def test_merge_order_independent():
    bb = [("b", "AAAA")]
    rows = [("q1", "AaaAAA"), ("q2", "AaAAaA")]
    r1, m1 = merge_rows(bb, rows)
    r2, m2 = merge_rows(bb, rows[::-1])
    assert dict(r1) == dict(r2)


def test_parse_query_row_counts():
    mc, runs = parse_query_row("xxA-Gy", 3)
    assert mc == ["A", "-", "G"]
    assert runs == {0: "xx", 3: "y"}
    with pytest.raises(ValueError):
        parse_query_row("AG", 3)


def test_gcm_mode_agrees_on_clean_cases():
    from witch_tpu.ops.gcm import gcm_align_query_row, mcl
    ac = np.array([0, 1, 2, 3])
    retained = np.array([2, 3, 4, 5])
    nongaps = np.array([3, 3, 3, 3])
    per = [(ac, retained, nongaps, 1.0)]
    assert gcm_align_query_row("ACGT", 8, per) == \
        align_query_row("ACGT", 8, per)
    # MCL pairs up a clean bipartite matching
    adj = np.zeros((4, 4))
    adj[0, 2] = adj[2, 0] = 2.0
    adj[1, 3] = adj[3, 1] = 3.0
    labels = mcl(adj)
    assert labels[0] == labels[2] and labels[1] == labels[3]
    assert labels[0] != labels[1]
