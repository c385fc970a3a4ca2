"""Transitive merge of aligned query rows into the backbone alignment.

Equivalent to the reference's ExtendedAlignment.merge_in chain
(witch_msa/helpers/alignment_tools.py:1183-1316) + mergeAlignmentsCollapsed
(witch_msa/gcmm/merger.py:42-103), re-designed as a direct O(output)
construction: since every query row covers all backbone columns, the
sequential pairwise merge reduces to overlaying insertion runs at shared
boundaries (left-aligned), with the final insertion-region length at each
boundary being the maximum run length over queries. This is provably
equivalent to the reference's merge order-independently (content-wise),
and removes its quadratic re-splicing of bytearrays.

Row layout of a query: [leading insertions][per backbone column: residue
or '-' interleaved with internal insertion runs][trailing insertions]
(the output of witch_tpu.ops.merge_dp.align_query_row).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def parse_query_row(row: str, backbone_length: int):
    """Split an aligned query row into per-boundary insertion runs and the
    backbone-aligned characters.

    Returns (match_chars: list[str] of length backbone_length,
    runs: dict boundary->str) where boundary g means 'before backbone
    column g' (g in 0..backbone_length).
    """
    match_chars = []
    runs: Dict[int, List[str]] = {}
    col = 0
    for ch in row:
        if ch.islower():
            runs.setdefault(col, []).append(ch)
        else:
            match_chars.append(ch)
            col += 1
    if col != backbone_length:
        raise ValueError(
            "query row covers %d backbone columns, expected %d"
            % (col, backbone_length))
    return match_chars, {g: "".join(v) for g, v in runs.items()}


def merge_rows(backbone_records: Sequence[Tuple[str, str]],
               query_rows: Sequence[Tuple[str, str]],
               collapse_singletons: bool = True):
    """Merge aligned query rows into the backbone.

    backbone_records: (name, aligned row) of the uppercased working
    backbone. query_rows: (name, witch-ng output row).
    Returns (records, insertion_mask) where records is the merged full
    alignment (backbone rows first, then queries in given order) and
    insertion_mask marks insertion columns (for the .masked output).

    collapse_singletons=False gives every query's insertion runs private
    output columns instead of sharing left-aligned columns at the same
    backbone boundary (the reference's dormant --collapse-singletons=0).
    """
    if not backbone_records:
        raise ValueError("empty backbone")
    L = len(backbone_records[0][1])
    parsed = []
    run_len = np.zeros(L + 1, dtype=np.int64)
    qrun_off = []                 # per query: boundary -> offset in run
    for name, row in query_rows:
        mc, runs = parse_query_row(row, L)
        parsed.append((name, mc, runs))
        if collapse_singletons:
            for g, s in runs.items():
                run_len[g] = max(run_len[g], len(s))
            qrun_off.append({g: 0 for g in runs})
        else:
            off = {}
            for g, s in runs.items():
                off[g] = int(run_len[g])
                run_len[g] += len(s)
            qrun_off.append(off)

    # output column layout: [runs@0][col0][runs@1][col1]...[colL-1][runs@L]
    total = L + int(run_len.sum())
    ins_mask = np.zeros(total, dtype=bool)
    pos = 0
    col_pos = np.zeros(L, dtype=np.int64)     # output index of backbone col
    run_pos = np.zeros(L + 1, dtype=np.int64)  # output start of boundary g
    for g in range(L + 1):
        run_pos[g] = pos
        ins_mask[pos:pos + run_len[g]] = True
        pos += int(run_len[g])
        if g < L:
            col_pos[g] = pos
            pos += 1

    records = []
    for name, row in backbone_records:
        out = np.full(total, "-", dtype="U1")
        out[col_pos] = list(row)
        records.append((name, "".join(out)))
    for (name, mc, runs), off in zip(parsed, qrun_off):
        out = np.full(total, "-", dtype="U1")
        out[col_pos] = mc
        for g, s in runs.items():
            start = run_pos[g] + off[g]
            out[start:start + len(s)] = list(s)
        records.append((name, "".join(out)))
    return records, ins_mask


def remove_insertion_columns(records: Sequence[Tuple[str, str]],
                             ins_mask: np.ndarray):
    """Masked output: drop insertion columns (reference
    remove_insertion_columns, alignment_tools.py:1140-1156)."""
    keep = ~ins_mask
    out = []
    for name, row in records:
        arr = np.array(list(row), dtype="U1")
        out.append((name, "".join(arr[keep])))
    return out
