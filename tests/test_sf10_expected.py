"""The pure-Python reference oracle (tools/sf10_expected.py) backs the
sf10 acceptance artifact, so it gets its own adversarial check: at
small copy counts we can BRUTE-FORCE the ground truth by actually
rendering every copy's token sequences and running an exact
posting-list Jaccard join over the rendered corpus — no combinatorial
shortcuts, no shared code with the oracle's enumeration. The oracle's
closed-form enumeration (within-copy replication + verbatim-class
cross-copy pairs + salted-collision specials) must match bit-for-bit.

No Spark, no DuckDB result dependence — this is Python vs Python over
the same generator algebra the sf10 data was built with.
"""

from __future__ import annotations

import itertools
from collections import Counter, defaultdict

import pytest

from tools.sf10_expected import DOC_STRIDE, BaseCorpus, _union_find


@pytest.fixture(scope="module")
def bc3() -> BaseCorpus:
    return BaseCorpus(3)


def _render_all(bc: BaseCorpus):
    """(instance_id, rendered token tuple) for every doc instance."""
    out = {}
    for k in range(bc.copies):
        vm = bc.vm[k]
        for d in bc.doc_ids:
            out[d + k * DOC_STRIDE] = tuple(vm[w] for w in bc.tokens[d])
    return out


def _brute_pairs(rendered: dict[int, tuple], threshold: float):
    """Exact shingle-Jaccard pairs over the RENDERED corpus via a full
    posting-list join — the oracle-free ground truth."""
    sh = {
        i: frozenset(
            ts[p: p + 3] for p in range(len(ts) - 2)
        )
        for i, ts in rendered.items()
        if len(ts) >= 3
    }
    postings = defaultdict(list)
    for i in sorted(sh):
        for s in sh[i]:
            postings[s].append(i)
    inter = Counter()
    for docs in postings.values():
        for a, b in itertools.combinations(docs, 2):
            inter[(a, b)] += 1
    out = set()
    for (a, b), i in inter.items():
        j = i / (len(sh[a]) + len(sh[b]) - i)
        if j >= threshold:
            out.add((a, b, round(j, 9)))
    return out


@pytest.mark.parametrize("threshold", [0.8, 0.7])
def test_expected_pairs_match_brute_force(bc3, threshold):
    rendered = _render_all(bc3)
    brute = _brute_pairs(rendered, threshold)
    oracle = {
        (a, b, round(j, 9))
        for a, b, j in bc3.expected_pairs_explicit(threshold)
    }
    assert oracle == brute


def test_expected_pairs_cover_special_collision_copy_pair():
    """copies=24 brings in the vm_23('part')=='part' collision — the
    enumeration must produce exactly what brute force sees between
    copies 0 and 23 (pairs whose Jaccard needs the 'part' shingles).
    Brute force is restricted to those two copies (their within- and
    cross-pairs are self-contained), keeping the test fast."""
    bc = BaseCorpus(24)
    assert ("part", "part") in bc.extra.get((0, 23), set())
    keep = {0, 23}
    rendered = {
        i: ts
        for i, ts in _render_all(bc).items()
        if i // DOC_STRIDE in keep
    }
    brute = _brute_pairs(rendered, 0.8)
    oracle = {
        (a, b, round(j, 9))
        for a, b, j in bc.expected_pairs_explicit(0.8)
        if a // DOC_STRIDE in keep and b // DOC_STRIDE in keep
    }
    assert oracle == brute
    # and the special pair actually contributes something beyond the
    # standard verbatim class, so this test can't silently go vacuous
    cross_0_23 = {
        (a, b) for a, b, _ in brute
        if {a // DOC_STRIDE, b // DOC_STRIDE} == {0, 23}
    }
    assert cross_0_23


def test_expected_pairs_cover_noninjective_copy():
    """copies=161 brings in copy 159, whose map renders BOTH 'the' and
    'dup' to 'dup' — non-injective, so within-copy Jaccard changes and
    every (159, j) agreement relation is non-functional. The oracle's
    rendered-set path must match brute force on the {0, 159, 160}
    sub-corpus (within- and cross-pairs of those copies are
    self-contained)."""
    bc = BaseCorpus(161)
    assert bc.noninjective == {159}
    keep = {0, 159, 160}
    rendered = {
        i: ts
        for i, ts in _render_all(bc).items()
        if i // DOC_STRIDE in keep
    }
    brute = _brute_pairs(rendered, 0.8)
    oracle = {
        (a, b, round(j, 9))
        for a, b, j in bc.expected_pairs_explicit(0.8)
        if a // DOC_STRIDE in keep and b // DOC_STRIDE in keep
    }
    assert oracle == brute
    cross_159 = {
        (a, b) for a, b, _ in brute
        if (a // DOC_STRIDE == 159) != (b // DOC_STRIDE == 159)
    }
    assert cross_159  # the collision really contributes pairs


def test_noninjective_copy_within_pairs_explicitly_computed():
    """On THIS corpus no doc happens to contain both a 'the'-shingle
    and its 'dup'-twin, so copy 159's rendered sets do not shrink and
    its within-copy pairs coincide with the base pairs — but the
    oracle must arrive at that via the rendered posting join, not the
    replication shortcut, and the equality is asserted (it would break
    loudly if the corpus ever gained such a doc)."""
    bc = BaseCorpus(161)
    within = {(a, b, round(j, 9))
              for a, b, j in bc._within_pairs_rendered(159, 0.8)}
    base = {(a, b, round(j, 9)) for a, b, j in bc.base_pairs(0.8)}
    assert within == base


def test_exact_classes_match_rendered_texts(bc3):
    rendered = _render_all(bc3)
    first: dict[tuple, int] = {}
    brute = {}
    for i in sorted(rendered):
        brute[i] = first.setdefault(rendered[i], i)
    assert bc3.exact_classes() == brute


def test_keepset_is_explicit_cascade(bc3):
    """Reference keepset == an independently coded cascade over the
    brute-force structures (exact classes from rendered texts, near
    pairs from the brute posting join on survivors)."""
    rendered = _render_all(bc3)
    first: dict[tuple, int] = {}
    rep = {}
    for i in sorted(rendered):
        rep[i] = first.setdefault(rendered[i], i)
    survivors = {i for i, r in rep.items() if i == r}
    pairs = [
        (a, b)
        for a, b, _ in _brute_pairs(rendered, 0.8)
        if a in survivors and b in survivors
    ]
    comp = _union_find(pairs)
    agg: dict[str, dict[str, int]] = defaultdict(
        lambda: {
            "n_docs": 0,
            "n_dropped_exact": 0,
            "n_dropped_near": 0,
            "n_kept": 0,
        }
    )
    for i in rendered:
        src = bc3.source[i % DOC_STRIDE]
        rec = agg[src]
        rec["n_docs"] += 1
        if rep[i] != i:
            rec["n_dropped_exact"] += 1
        elif comp.get(i, i) != i:
            rec["n_dropped_near"] += 1
        else:
            rec["n_kept"] += 1
    assert bc3.expected_keepset(0.8) == dict(agg)


def test_components_partition_and_labels(bc3):
    comps = bc3.expected_components(0.8)
    pairs = bc3.expected_pairs_explicit(0.8)
    touched = {x for a, b, _ in pairs for x in (a, b)}
    assert sum(n for _, n, _ in comps) == len(touched)
    assert all(c == keep for c, _, keep in comps)
    # every edge is intra-component
    label = {}
    comp_map = _union_find([(a, b) for a, b, _ in pairs])
    for a, b, _ in pairs:
        assert comp_map[a] == comp_map[b]
        label.setdefault(comp_map[a], 0)
    assert len(label) == len(comps)
