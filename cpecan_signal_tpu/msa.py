"""Posterior-pair multiple sequence alignment: the multipleAligner equivalent.

Mirrors impl/multipleAligner.c: pairwise posterior alignments over a chosen
set of sequence pairs (all pairs for small inputs, spanning trees otherwise,
getReferencePairwiseAlignments :740 / makeAlignment :892-944), then greedy
maximum-weight column merging constrained to keep a valid partial order of
columns (getMultipleSequenceAlignment :272; the poset safeguard is implemented
as a cycle check over the column-precedence DAG), and a filter retaining the
pairs consistent with the columns (filterMultipleAlignedPairs), which for two
sequences is the consistency filter used by the realigner
(filterPairwiseAlignmentToMakePairsOrdered :949-997).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from .engine.align import align_sequence_pair
from .models.params import AlignmentParams
from .models.state_machines import bind_symbol_sequences, make_symbol_sm5


@dataclass
class MultipleAlignment:
    """Columns of (seq_idx, position) plus the consistent pairwise pairs."""

    columns: list[set[tuple[int, int]]]
    consistent_pairs: list[tuple[int, int, int, int, int]]  # (w, s1, p1, s2, p2)
    pairwise_pairs: list[tuple[int, int, int, int, int]]


class _ColumnPoset:
    """Union-find over (seq, pos) with a precedence-cycle safeguard
    (the stPosetAlignment role)."""

    def __init__(self, seq_lengths: list[int]):
        self.parent: dict[tuple[int, int], tuple[int, int]] = {}
        self.members: dict[tuple[int, int], set[tuple[int, int]]] = {}
        self.seq_lengths = seq_lengths

    def find(self, key):
        if key not in self.parent:
            self.parent[key] = key
            self.members[key] = {key}
            return key
        root = key
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[key] != root:
            self.parent[key], key = root, self.parent[key]
        return root

    def _succ_columns(self, root):
        """Columns that must come strictly after ``root``: for each member
        (s, p), the column of the next aligned position of s."""
        out = set()
        for (s, p) in self.members[root]:
            q = p + 1
            while q < self.seq_lengths[s]:
                key = (s, q)
                if key in self.parent:
                    out.add(self.find(key))
                    break
                q += 1
        return out

    def _reaches(self, start_roots, target, limit=10000):
        seen = set()
        stack = list(start_roots)
        while stack and len(seen) < limit:
            r = stack.pop()
            if r == target:
                return True
            if r in seen:
                continue
            seen.add(r)
            stack.extend(self._succ_columns(r))
        return False

    def can_merge(self, a, b) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return True
        sa = {s for s, _ in self.members[ra]}
        sb = {s for s, _ in self.members[rb]}
        if sa & sb:
            return False  # two positions of one sequence in one column
        # merging must not create a precedence cycle: rb must not be reachable
        # from ra's successors and vice versa
        if self._reaches(self._succ_columns(ra), rb):
            return False
        if self._reaches(self._succ_columns(rb), ra):
            return False
        return True

    def merge(self, a, b) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return True
        if not self.can_merge(a, b):
            return False
        self.parent[rb] = ra
        self.members[ra] |= self.members.pop(rb)
        return True

    def same(self, a, b) -> bool:
        return self.find(a) == self.find(b)

    def column_sets(self):
        return [set(v) for k, v in self.members.items() if self.find(k) == k]


def _spanning_tree_pairs(n: int, n_trees: int) -> list[tuple[int, int]]:
    """Pair selection like getReferencePairwiseAlignments: successive spanning
    trees with different phases (multipleAligner.c:740-790)."""
    pairs = set()
    for tree in range(max(n_trees, 1)):
        step = tree + 1
        for i in range(n):
            j = (i + step) % n
            if i != j:
                pairs.add((min(i, j), max(i, j)))
    return sorted(pairs)


def make_alignment(seqs: list[str], spanning_trees: int = 2,
                   max_pairs_to_consider: int = 10,
                   params: AlignmentParams | None = None,
                   match_gamma: float = 0.0) -> MultipleAlignment:
    """Posterior-pair MSA (makeAlignment, multipleAligner.c:892-944)."""
    from .anchor.seed_chain import get_anchor_pairs_for_params

    params = params or AlignmentParams()
    n = len(seqs)
    if n * (n - 1) // 2 <= max_pairs_to_consider:
        pair_ids = [(i, j) for i in range(n) for j in range(i + 1, n)]
    else:
        pair_ids = _spanning_tree_pairs(n, spanning_trees)

    def mk(sx, sy):
        sm = make_symbol_sm5()
        bind_symbol_sequences(sm, sx, sy)
        return sm

    all_pairs: list[tuple[int, int, int, int, int]] = []
    for (i, j) in pair_ids:
        anchors = get_anchor_pairs_for_params(seqs[i], seqs[j], params)
        ap = align_sequence_pair(mk, seqs[i], seqs[j], anchors, params)
        for w, x, y in ap.as_tuples():
            all_pairs.append((w, i, int(x), j, int(y)))

    # greedy merge by descending weight with poset safeguard
    poset = _ColumnPoset([len(s) for s in seqs])
    for w, s1, p1, s2, p2 in sorted(all_pairs, key=lambda t: -t[0]):
        poset.merge((s1, p1), (s2, p2))

    consistent = [t for t in all_pairs
                  if poset.same((t[1], t[2]), (t[3], t[4]))]
    return MultipleAlignment(columns=poset.column_sets(),
                             consistent_pairs=consistent,
                             pairwise_pairs=all_pairs)
