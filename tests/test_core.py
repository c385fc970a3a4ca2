"""Unit tests for alphabet / fasta IO / alignment containers / tree."""

import gzip

import numpy as np

from witch_tpu.core.alphabet import ALPHABETS, DNA, infer_datatype
from witch_tpu.core.alignment import PackedAlignment, subset_counts
from witch_tpu.core.tree import Tree
from witch_tpu.io.fasta import read_fasta, write_fasta


def test_encode_decode_roundtrip():
    s = "ACGTNRY-acgt"
    codes = DNA.encode(s)
    assert DNA.decode(codes) == "ACGTNRY-ACGT"
    assert DNA.is_gap(codes).sum() == 1


def test_degenerate_expansion():
    e = DNA.expansion_matrix()
    n = DNA.encode("N")[0]
    np.testing.assert_allclose(e[n], [0.25] * 4)
    r = DNA.encode("R")[0]
    np.testing.assert_allclose(e[r], [0.5, 0, 0.5, 0])
    gap = DNA.encode("-")[0]
    np.testing.assert_allclose(e[gap], [0, 0, 0, 0])


def test_infer_datatype():
    assert infer_datatype([("a", "ACGTACGT")]) == "dna"
    assert infer_datatype([("a", "ACGUACGU")]) == "rna"
    assert infer_datatype([("a", "MKVLITTTW")]) == "amino"


def test_fasta_gzip_roundtrip(tmp_path):
    path = str(tmp_path / "x.fasta.gz")
    recs = [("a b", "ACGT"), ("c", "AC-T")]
    write_fasta(recs, path)
    assert list(read_fasta(path)) == recs
    assert list(read_fasta(path, remove_gaps=True))[1] == ("c", "ACT")


def test_delete_all_gap_columns():
    aln = PackedAlignment.from_records(
        [("a", "A-C-"), ("b", "A--T")], molecule="dna")
    sub, kept = aln.delete_all_gap_columns()
    assert list(kept) == [0, 2, 3]
    assert sub.row_string("a") == "AC-"
    assert list(aln.nongaps_per_column()) == [2, 0, 1, 1]


def test_subset_counts():
    aln = PackedAlignment.from_records(
        [("a", "A-C-"), ("b", "A--T"), ("c", "GGGG")], molecule="dna")
    rows, retained, nongaps = subset_counts(aln, ["a", "b"])
    assert list(retained) == [0, 2, 3]
    assert list(nongaps) == [2, 1, 1]


NEWICK = "((a:1,b:2)x:0.5,(c:1,(d:1,e:1):0.1):0.5,f:3);"


def test_newick_parse():
    t = Tree.from_newick(NEWICK)
    assert t.leaf_labels() == ["a", "b", "c", "d", "e", "f"]
    assert t.root.children[0].label == "x"
    assert t.root.children[0].length == 0.5


def test_newick_quoted():
    t = Tree.from_newick("('a b':1,\"?\"x_y:2);")
    assert t.leaf_labels()[0] == "a b"


def test_resolve_and_decompose():
    t = Tree.from_newick("((a:1,b:1):1,(c:1,d:1):1,(e:1,f:1):1);")
    t.resolve_polytomies()
    # root becomes binary
    assert len(t.root.children) == 2
    subsets = t.decompose(max_size=4, min_size=2)
    # hierarchical: first subset is everything
    assert sorted(subsets[0]) == list("abcdef")
    # every leaf appears in at least one small subset
    small = [s for s in subsets if len(s) <= 4]
    covered = set()
    for s in small:
        covered.update(s)
    assert covered == set("abcdef")


def test_decompose_balanced():
    # 8-leaf caterpillar; centroid split should produce balanced halves
    nw = "(((((((a:1,b:1):1,c:1):1,d:1):1,e:1):1,f:1):1,g:1):1,h:1);"
    t = Tree.from_newick(nw)
    t.resolve_polytomies()
    subsets = t.decompose(max_size=4, min_size=2)
    sizes = sorted(len(s) for s in subsets)
    assert sizes[-1] == 8  # full set recorded first
    assert all(len(s) >= 2 for s in subsets)


def test_nni_refine_improves_parsimony():
    """Fitch-parsimony NNI: monotone improvement, taxa preserved."""
    import numpy as np
    from witch_tpu.core.alignment import PackedAlignment
    from witch_tpu.tree_estimate import (estimate_tree, nni_refine,
                                         neighbor_joining,
                                         pairwise_distances)
    rng = np.random.default_rng(11)
    AB = "ACGT"
    anc = "".join(rng.choice(list(AB), 120))
    def ev(s, p):
        return "".join(AB[rng.integers(4)] if rng.random() < p else c
                       for c in s)
    clades = [ev(anc, 0.2) for _ in range(4)]
    names, seqs = [], []
    for i in range(24):
        names.append("x%d" % i)
        seqs.append(ev(clades[i % 4], 0.1))
    aln = PackedAlignment.from_records(list(zip(names, seqs)),
                                       alphabet=None, molecule="dna")
    d = pairwise_distances(aln, use_device=False)
    nwk = neighbor_joining(d, names)
    refined = nni_refine(nwk, aln)
    import re
    taxa = set(re.findall(r"[\(,](x\d+):", refined))
    assert taxa == set(names)


def test_ml_refine_recovers_clades():
    """HKY+Gamma ML NNI (tree_estimate.ml_refine): repairs cross-clade
    leaf swaps in a clean 4-clade synthetic and preserves the taxa."""
    import numpy as np
    from witch_tpu.core.alignment import PackedAlignment
    from witch_tpu.tree_estimate import (ml_refine, neighbor_joining,
                                         pairwise_distances, _Tree)
    rng = np.random.default_rng(7)
    AB = "ACGT"
    anc = "".join(rng.choice(list(AB), 160))

    def ev(s, p):
        return "".join(AB[rng.integers(4)] if rng.random() < p else c
                       for c in s)
    clades = [ev(anc, 0.25) for _ in range(4)]
    names, seqs = [], []
    for i in range(24):
        names.append("x%d" % i)
        seqs.append(ev(clades[i % 4], 0.08))
    aln = PackedAlignment.from_records(list(zip(names, seqs)),
                                       alphabet=None, molecule="dna")
    d = pairwise_distances(aln, use_device=False)
    nwk = neighbor_joining(d, names)
    # break two clades by swapping leaves across them
    nwk = (nwk.replace("x0:", "TMP:").replace("x1:", "x0:")
              .replace("TMP:", "x1:"))
    nwk = (nwk.replace("x6:", "TMP:").replace("x7:", "x6:")
              .replace("TMP:", "x7:"))
    refined = ml_refine(nwk, aln)
    t = _Tree.parse(refined)
    taxa = {nm for nm in t.name if nm}
    assert taxa == set(names)
    # every clade must be a clan (some edge splits exactly it off)
    n_nodes = len(t.children)
    below = [set() for _ in range(n_nodes)]
    order = []
    stack = [next(i for i in range(n_nodes) if t.parent[i] < 0)]
    while stack:
        x = stack.pop()
        order.append(x)
        stack.extend(t.children[x])
    for x in order[::-1]:
        if not t.children[x]:
            below[x] = {t.name[x]}
        else:
            below[x] = set().union(*(below[c] for c in t.children[x]))
    splits = {frozenset(b) for b in below} | {
        frozenset(taxa - b) for b in below}
    for c in range(4):
        clade = frozenset(names[i] for i in range(24) if i % 4 == c)
        assert clade in splits, "clade %d not recovered" % c
