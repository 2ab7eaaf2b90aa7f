"""Pure-Python reference oracle for the replicated-corpus decades.

Computes, from the BASE corpus (`/root/testdata/sf0.1/documents.parquet`)
plus the generator's own vocabulary algebra (tools/gen_sf1.py), the
EXACT expected results of the word-level dedup family on a
``--copies N`` replica — independently of both Spark and DuckDB.
This is what makes the sf10 decade checkable: the DuckDB pair oracle
is quadratic in the hot-shingle df and stops being affordable, but
the generator's construction makes the truth computable in closed
form:

- **Within-copy pairs**: the per-copy token bijection is injective on
  the corpus vocabulary (verified here for every copy), and an
  injective word map preserves word-shingle Jaccard exactly, so each
  copy contributes precisely the base corpus's pair set.
- **Cross-copy pairs**: two copies agree only on the verbatim-kept
  vocabulary half (plus enumerable salted-rename collisions — at 100
  copies exactly two: ``vm_23('part')=='part'`` and
  ``vm_36('key')==vm_52('the')``). A cross-copy doc pair needs ≥
  threshold of its shingles rendered identically, so candidates are
  the handful of docs whose verbatim-shingle fraction clears the
  bound J(A_i,B_j) <= min(f_a, f_b); their cross-copy Jaccards are
  computed exactly and multiplied out combinatorially. (This is also
  where gen_sf1's docstring claim of "zero new pairs" is corrected:
  base docs written entirely in verbatim words render identically in
  EVERY copy — at sf0.1 five docs have cross-copy J >= 0.8, two of
  them exact clones.)
- **Exact-duplicate classes**: every instance's rendered token
  sequence is materialized (a 31-symbol substitution over index
  arrays — numpy, not string work), giving the exact fingerprint
  classes, survivor set, and per-source cascade audit.

Everything downstream (connected components, survivorship, keepset
counts) is explicit: expand the expected pairs to id pairs (~50k at
copies=100) and union-find them in Python.

Validation contract: at copies=10 these functions must reproduce the
engine's sf1 results bit-for-bit (which the sf1 sweep already
cross-verified against DuckDB); only then is the sf10 run meaningful.
"""

from __future__ import annotations

import itertools
import os
import re
import sys
from collections import Counter, defaultdict

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_sf1 import vocab_map  # noqa: E402

SF01 = "/root/testdata/sf0.1"
WORD = re.compile(r"[a-z0-9]+")
DOC_STRIDE = 5_000  # tools/gen_sf1.py stride["doc"]


class BaseCorpus:
    """The sf0.1 documents table, tokenized once, plus the per-copy
    vocabulary maps and their cross-copy agreement structure."""

    def __init__(self, copies: int, src: str = SF01):
        rows = duckdb.sql(
            f"SELECT doc_id, source, text FROM '{src}/documents.parquet' "
            "ORDER BY doc_id"
        ).fetchall()
        self.copies = copies
        self.doc_ids = [r[0] for r in rows]
        self.source = {r[0]: r[1] for r in rows}
        self.tokens = {r[0]: WORD.findall(r[2].lower()) for r in rows}
        # exact-tier normalization == token join (no punctuation/case
        # in this corpus — asserted so a future generator change
        # fails loudly instead of silently skewing the closed form)
        for did, (_, _, text) in zip(self.doc_ids, rows):
            norm = re.sub(r"\s+", " ", text.lower()).strip()
            assert norm == " ".join(self.tokens[did]), (
                f"doc {did}: normalized text != token join; the "
                "closed-form exact-dup model no longer applies"
            )
        self.vocab = sorted({w for ts in self.tokens.values() for w in ts})
        self.word_idx = {w: i for i, w in enumerate(self.vocab)}
        # per-copy renders; copy 0 is verbatim. A copy's map may be
        # NON-injective (first case: copy 159 renders 'the' to 'dup',
        # colliding with the verbatim 'dup') — within such a copy the
        # rendered shingle sets can SHRINK, so Jaccard preservation
        # fails and every pair involving that copy is computed on
        # rendered sets instead of via the fast replication path.
        self.vm = {0: {w: w for w in self.vocab}}
        self.noninjective: set[int] = set()
        for k in range(1, copies):
            self.vm[k] = vocab_map(set(self.vocab), k)
            if len(set(self.vm[k].values())) != len(self.vocab):
                self.noninjective.add(k)
        # cross-copy agreement: for each ordered copy pair (i, j), any
        # rendered-value coincidence beyond the verbatim identity
        # (vm_i(w1) == vm_j(w2) with w1 or w2 salted) flags the pair
        # as SPECIAL — evaluated exactly on rendered sets. The
        # relation may be non-functional (copy 159's 'the'->'dup'
        # coincides with every copy's verbatim 'dup'), which is why
        # special pairs are not evaluated through a word MAP at all.
        self.verbatim = {w for w in self.vocab if self._kept(w)}
        by_val: dict[str, list[tuple[int, str]]] = defaultdict(list)
        for k in range(copies):
            for w in self.vocab:
                by_val[self.vm[k][w]].append((k, w))
        self.extra: dict[tuple[int, int], set[tuple[str, str]]] = (
            defaultdict(set)
        )
        for lst in by_val.values():
            if len(lst) < 2:
                continue
            for (i, w1), (j, w2) in itertools.permutations(lst, 2):
                if i == j:
                    continue
                if w1 in self.verbatim and w2 in self.verbatim:
                    continue  # that's just the standard agreement
                self.extra[(i, j)].add((w1, w2))
        # shingle sets (word 3-gram tuples) for the near-dup family
        self.shingles = {
            d: frozenset(
                tuple(ts[i: i + 3]) for i in range(len(ts) - 2)
            )
            for d, ts in self.tokens.items()
            if len(ts) >= 3
        }
        self._rendered_cache: dict[tuple[int, int], frozenset] = {}
        self._rsize_cache: dict[int, dict[int, int]] = {}
        self._cands_cache: dict[tuple, list[int]] = {}

    @staticmethod
    def _kept(w: str) -> bool:
        import hashlib

        return hashlib.blake2b(w.encode(), digest_size=1).digest()[0] % 2 == 0

    # -- near-dup pair enumeration -------------------------------------

    def base_pairs(self, threshold: float) -> list[tuple[int, int, float]]:
        """Exact shingle-Jaccard pairs of the BASE corpus (inverted
        index; df is tiny at sf0.1 so the quadratic term is moot)."""
        postings: dict[tuple, list[int]] = defaultdict(list)
        for d in sorted(self.shingles):
            for sh in self.shingles[d]:
                postings[sh].append(d)
        inter = Counter()
        for docs in postings.values():
            for a, b in itertools.combinations(docs, 2):
                inter[(a, b)] += 1
        out = []
        for (a, b), i in sorted(inter.items()):
            j = i / (len(self.shingles[a]) + len(self.shingles[b]) - i)
            if j >= threshold:
                out.append((a, b, j))
        return out

    def _cross_match_j(self, a: int, b: int, wmap: dict[str, str]) -> float:
        """Jaccard of copy-i doc a vs copy-j doc b when the copies
        agree exactly on ``wmap`` (injective partial word map)."""
        sa, sb = self.shingles.get(a), self.shingles.get(b)
        if sa is None or sb is None:
            return 0.0
        m = 0
        for s in sa:
            t = tuple(wmap.get(w) for w in s)
            if None not in t and t in sb:
                m += 1
        return m / (len(sa) + len(sb) - m) if m else 0.0

    # -- rendered-set machinery (special copy pairs / non-injective) ----

    def _rendered_set(self, k: int, d: int) -> frozenset:
        """Doc d's shingle set as rendered by copy k (distinct rendered
        trigram tuples — the set the ENGINE actually deduplicates on)."""
        key = (k, d)
        got = self._rendered_cache.get(key)
        if got is None:
            vm = self.vm[k]
            got = frozenset(
                tuple(vm[w] for w in s) for s in self.shingles[d]
            )
            self._rendered_cache[key] = got
        return got

    def _rsize(self, k: int, d: int) -> int:
        """|rendered shingle set| — equals |base set| for injective
        copies; computed (once per copy, all docs) otherwise."""
        if k not in self.noninjective:
            return len(self.shingles[d])
        sizes = self._rsize_cache.get(k)
        if sizes is None:
            sizes = {
                dd: len(self._rendered_set(k, dd)) for dd in self.shingles
            }
            self._rsize_cache[k] = sizes
        return sizes[d]

    def _cross_pairs_exact(
        self, i: int, j: int, threshold: float
    ) -> list[tuple[int, int, float]]:
        """EXACT pair set between copy i docs (a-side) and copy j docs
        (b-side) via rendered-set intersection — the general path for
        special copy pairs, correct even when the agreement relation
        is non-functional or a copy's map is non-injective.

        Sound prefilter: a matched rendered shingle of A_i must be in
        image(vm_j), so m <= |{s in S_a : words(s) subset D}| with
        D = {w : vm_i(w) in image(vm_j)}, and J <= m/|render_i(S_a)|.
        Symmetrically for the b-side."""
        img_i = set(self.vm[i].values())
        img_j = set(self.vm[j].values())
        dom = {w for w in self.vocab if self.vm[i][w] in img_j}
        ran = {w for w in self.vocab if self.vm[j][w] in img_i}

        def cands(words: set[str], k: int) -> list[int]:
            # identical across injective copies (rendered sizes equal
            # base sizes there), so memoize on the words + the
            # non-injective copy id (or -1)
            key = (
                tuple(sorted(words)),
                k if k in self.noninjective else -1,
                threshold,
            )
            got = self._cands_cache.get(key)
            if got is not None:
                return got
            out = []
            for d, s in self.shingles.items():
                cnt = sum(1 for sh in s if set(sh) <= words)
                if cnt / self._rsize(k, d) >= threshold:
                    out.append(d)
            self._cands_cache[key] = out
            return out

        out = []
        for a in cands(dom, i):
            ra = self._rendered_set(i, a)
            for b in cands(ran, j):
                rb = self._rendered_set(j, b)
                m = len(ra & rb)
                if not m:
                    continue
                jac = m / (len(ra) + len(rb) - m)
                if jac >= threshold:
                    out.append((a, b, jac))
        return out

    def _within_pairs_rendered(
        self, k: int, threshold: float
    ) -> list[tuple[int, int, float]]:
        """Within-copy pairs of a NON-injective copy, by posting join
        over its rendered shingle sets (the replication shortcut is
        invalid there: merged shingles change Jaccard)."""
        rsets = {d: self._rendered_set(k, d) for d in self.shingles}
        postings: dict[tuple, list[int]] = defaultdict(list)
        for d in sorted(rsets):
            for sh in rsets[d]:
                postings[sh].append(d)
        inter = Counter()
        for docs in postings.values():
            for a, b in itertools.combinations(docs, 2):
                inter[(a, b)] += 1
        out = []
        for (a, b), m in sorted(inter.items()):
            jac = m / (len(rsets[a]) + len(rsets[b]) - m)
            if jac >= threshold:
                out.append((a, b, jac))
        return out

    def _cross_pairs_for_map(
        self, wmap: dict[str, str], threshold: float
    ) -> list[tuple[int, int, float]]:
        """All base-doc pairs (a, b) — including a == b — whose
        cross-copy Jaccard under ``wmap`` clears the threshold.
        Candidate prefilter: J <= min(dom-fraction(a), ran-fraction(b))."""
        assert len(set(wmap.values())) == len(wmap), "wmap must be injective"
        dom, ran = set(wmap), set(wmap.values())

        def frac(d: int, words: set[str]) -> float:
            s = self.shingles.get(d)
            if not s:
                return 0.0
            return sum(1 for sh in s if set(sh) <= words) / len(s)

        cand_a = [d for d in self.shingles if frac(d, dom) >= threshold]
        cand_b = {d for d in self.shingles if frac(d, ran) >= threshold}
        out = []
        for a in cand_a:
            for b in cand_b:
                j = self._cross_match_j(a, b, wmap)
                if j >= threshold:
                    out.append((a, b, j))
        return out

    def expected_pairs_explicit(
        self, threshold: float
    ) -> list[tuple[int, int, float]]:
        """Every expected (doc_a, doc_b, jaccard) with doc_a < doc_b at
        replica scale — within-copy pairs replicated per copy plus the
        enumerated cross-copy classes."""
        copies, stride = self.copies, DOC_STRIDE
        out: list[tuple[int, int, float]] = []
        base = self.base_pairs(threshold)
        for k in range(copies):
            if k in self.noninjective:
                # the replication shortcut is invalid here — merged
                # shingles change within-copy Jaccard
                for a, b, j in self._within_pairs_rendered(k, threshold):
                    out.append((a + k * stride, b + k * stride, j))
            else:
                for a, b, j in base:
                    out.append((a + k * stride, b + k * stride, j))
        # standard cross-copy class: agreement == verbatim identity,
        # both copies injective, no salted-rename coincidences. std
        # contains BOTH orientations of every a != b pair (and each
        # a == b once), so iterating unordered copy pairs (i < j_)
        # covers (a_i, b_j) and (b_i, a_j); each id pair decodes to a
        # unique (base_a, copy_a, base_b, copy_b), so the set-dedup at
        # the end can never fold two different Jaccards together.
        std_map = {w: w for w in self.verbatim}
        std = self._cross_pairs_for_map(std_map, threshold)
        special = {frozenset(kp) for kp in self.extra if max(kp) < copies}
        special |= {
            frozenset((k, j))
            for k in self.noninjective
            for j in range(copies)
            if j != k
        }
        for i, j_ in itertools.combinations(range(copies), 2):
            if frozenset((i, j_)) in special:
                continue
            for a, b, j in std:
                ida, idb = a + i * stride, b + j_ * stride
                out.append((min(ida, idb), max(ida, idb), j))
        # special copy pairs: exact rendered-set evaluation, both
        # orientations (the relation may be non-functional, so no
        # word-map shortcut applies)
        for kp in sorted(tuple(sorted(s)) for s in special):
            i, j_ = kp
            for (ci, cj) in ((i, j_), (j_, i)):
                for a, b, j in self._cross_pairs_exact(ci, cj, threshold):
                    ida, idb = a + ci * stride, b + cj * stride
                    if ida < idb:
                        out.append((ida, idb, j))
        return sorted(set(out))

    # -- exact-duplicate classes (rendered text identity) ---------------

    def exact_classes(self) -> dict[int, int]:
        """instance doc_id -> class representative (min doc_id with the
        same rendered token sequence). Rendered sequences materialized
        as numpy substitutions over vocab-index arrays."""
        copies, stride = self.copies, DOC_STRIDE
        # int16, not int8: an int8 index wraps negative past 127 and
        # lut[idx] would silently index from the END of the lut,
        # corrupting the reference classes without any error. The
        # base vocabulary is 31 words today, but this is the one
        # model precondition that would fail silently rather than
        # loudly, so remove it instead of asserting it.
        idx_arrays = {
            d: np.array([self.word_idx[w] for w in ts], dtype=np.int16)
            for d, ts in self.tokens.items()
        }
        # per copy: vocab index -> rendered token id (global interning)
        intern: dict[str, int] = {}

        def tok_id(w: str) -> int:
            return intern.setdefault(w, len(intern))

        first_seen: dict[bytes, int] = {}
        rep: dict[int, int] = {}
        for k in range(copies):
            lut = np.array(
                [tok_id(self.vm[k][w]) for w in self.vocab], dtype=np.int32
            )
            for d in self.doc_ids:
                inst = d + k * stride
                key = lut[idx_arrays[d]].tobytes()
                rep.setdefault(inst, first_seen.setdefault(key, inst))
        return rep

    # -- cascade audit (keepset) ----------------------------------------

    def expected_keepset(self, threshold: float = 0.8):
        """Per-source (n_docs, n_dropped_exact, n_dropped_near, n_kept)
        of the exact→near→components→min-id cascade."""
        copies, stride = self.copies, DOC_STRIDE
        rep = self.exact_classes()
        survivors = {i for i, r in rep.items() if i == r}
        pairs = [
            (a, b)
            for a, b, _ in self.expected_pairs_explicit(threshold)
            if a in survivors and b in survivors
        ]
        comp = _union_find(pairs)
        out: dict[str, dict[str, int]] = defaultdict(
            lambda: {
                "n_docs": 0,
                "n_dropped_exact": 0,
                "n_dropped_near": 0,
                "n_kept": 0,
            }
        )
        for d in self.doc_ids:
            src = self.source[d]
            for k in range(copies):
                inst = d + k * stride
                rec = out[src]
                rec["n_docs"] += 1
                if rep[inst] != inst:
                    rec["n_dropped_exact"] += 1
                elif comp.get(inst, inst) != inst:
                    rec["n_dropped_near"] += 1
                else:
                    rec["n_kept"] += 1
        return dict(out)

    def expected_components(self, threshold: float = 0.8):
        """(component, size, keep_id) rows of connected components over
        the FULL-corpus expected pair set (the clusters acceptance)."""
        pairs = [
            (a, b) for a, b, _ in self.expected_pairs_explicit(threshold)
        ]
        comp = _union_find(pairs)
        sizes = Counter(comp.values())
        return sorted(
            (c, n, c) for c, n in sizes.items()
        )  # min-id label == keep_id


def _union_find(pairs) -> dict[int, int]:
    """node -> min-id component label for every node touched by a pair."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}
