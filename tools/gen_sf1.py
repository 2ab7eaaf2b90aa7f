"""Synthesize a local sf1 dataset (10x sf0.1) for the scaling probe.

The driver generates sf0.001/0.01/0.1 only (TESTDATA.md, read-only).
VERDICT r5 ask #5 wants scaling measured one decade further, where
fixed costs stop dominating. This tool builds sf1 at
``.localdata/sf1/`` (gitignored) from sf0.1 by replication that
PRESERVES the driver's own scaling pattern (all dimensions grow ~10x
per decade; embeddings grow 4x, matching the driver's 500->2000 step
from sf0.01->0.1):

- **Key offsets**: copy ``k`` shifts every key by ``k * (max_key+1)``
  consistently across fact/dim tables, so FK integrity (orders ->
  customer, lineitem -> orders/part/supplier, events.user_id) holds
  and per-entity densities (orders per customer, events per user)
  stay constant — joins/sessionization/windows scale linearly.
- **Token bijection on text** (documents.text, part.p_name, copy>0):
  each word maps through a length- and charclass-preserving salted
  bijection, with a word-hash-stable 50% kept verbatim. Jaccard is
  invariant under an injective vocabulary map, so the WITHIN-copy
  near-dup pair structure is exactly the sf0.1 structure (pair counts
  scale linearly, 10x), while a TYPICAL cross-copy clone lands at
  J~=1/3 — far below every catalog threshold (0.7+). Caveat,
  discovered when building the sf10 reference oracle
  (tools/sf10_expected.py): base docs written (almost) entirely in
  the verbatim-kept vocabulary half DO stay near-identical across
  copies — at sf0.1 five docs have cross-copy J >= 0.8 (two exact
  clones), contributing C(copies, 2)-shaped pair families on top of
  the linear within-copy structure (225 of sf1's 2785 pairs; 24,751
  of sf10's 50,351). Cross-engine sweeps are immune (both engines
  see the same data); anything claiming a pure x-copies invariant is
  not — use the reference oracle. Naive replication would instead
  create ~C(copies,2) exact-clone pairs per EVERY document and make
  every pair-emitting dedup query look quadratic by construction.
  Space/char counts are preserved exactly (n_chars stays valid).
- **Orthogonal rotation on embeddings** (copy>0): a seeded QR-derived
  rotation preserves norms and all within-copy cosines (ANN/top-k
  structure per copy is exactly sf0.1's) while cross-copy cosines
  collapse to ~N(0, 1/sqrt(64)) — no cosine~1 clone pairs.
- Names (``Customer#...``/``Supplier#...``) are renumbered to the new
  key, matching the generator's own format.

region/nation are fixed-size dims and copied verbatim.

Usage: python tools/gen_sf1.py [--copies 10] [--out .localdata/sf1]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORD = re.compile(r"[A-Za-z0-9]+")
SRC = "/root/testdata/sf0.1"


def salted_token(word: str, k: int) -> str:
    """Length- and charclass-preserving salted rename of ``word`` for
    copy ``k``. Deterministic; both args participate in the hash."""
    h = hashlib.blake2b(f"{k}:{word}".encode(), digest_size=32).digest()
    out = []
    for i, ch in enumerate(word):
        b = h[i % 32] + (i // 32)
        if ch.islower():
            out.append(chr(97 + b % 26))
        elif ch.isupper():
            out.append(chr(65 + b % 26))
        else:
            out.append(chr(48 + b % 10))
    return "".join(out)


def vocab_map(words: set[str], k: int) -> dict[str, str]:
    """Per-copy vocabulary bijection: a word-hash-stable half of the
    vocab is kept verbatim in EVERY copy (so cross-copy Jaccard of a
    clone is ~(0.5)/(1.5)=1/3, not 0 — mimicking shared stopwords),
    the rest is salted per copy."""
    m = {}
    for w in words:
        keep = hashlib.blake2b(w.encode(), digest_size=1).digest()[0] % 2 == 0
        m[w] = w if keep else salted_token(w, k)
    return m


def resub_texts(texts: list[str], k: int) -> list[str]:
    vocab = set()
    for t in texts:
        vocab.update(WORD.findall(t))
    vm = vocab_map(vocab, k)
    return [WORD.sub(lambda m: vm[m.group(0)], t) for t in texts]


def rotation(dim: int, k: int) -> np.ndarray:
    """Seeded orthogonal matrix (QR with sign fix for determinism)."""
    rng = np.random.default_rng(90_000 + k)
    q, r = np.linalg.qr(rng.normal(size=(dim, dim)))
    return (q * np.sign(np.diag(r))).astype(np.float64)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--emb-copies", type=int, default=4)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata",
            "sf1",
        ),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    def load(t: str) -> pa.Table:
        return con.execute(f"SELECT * FROM '{SRC}/{t}.parquet'").arrow()

    def save(t: str, tab: pa.Table) -> None:
        pq.write_table(tab, os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: {tab.num_rows} rows", flush=True)

    # strides: max key + 1 per key domain (keys are 0-based dense)
    stride = {
        "cust": 15_000, "supp": 1_000, "part": 20_000, "order": 150_000,
        "event": 100_000, "user": 1_500, "doc": 5_000, "vec": 2_000,
    }

    for t in ("region", "nation"):
        save(t, load(t))

    def replicated(t: str, shifts: dict[str, str], ncopies: int,
                   transform=None) -> pa.Table:
        """Concat ncopies of table ``t``; column -> stride-name shifts;
        ``transform(tab, k)`` applies per-copy content rewrites."""
        base = load(t)
        chunks = []
        for k in range(ncopies):
            tab = base
            if transform is not None:
                tab = transform(tab, k)
            if k:
                for col, dom in shifts.items():
                    idx = tab.schema.get_field_index(col)
                    shifted = pa.compute.add(tab.column(col), k * stride[dom])
                    tab = tab.set_column(
                        idx, tab.schema.field(col),
                        shifted.cast(tab.schema.field(col).type),
                    )
            chunks.append(tab)
        return pa.concat_tables(chunks)

    def renumber(tab: pa.Table, col: str, key_col: str, prefix: str,
                 k: int, dom: str) -> pa.Table:
        if k == 0:
            return tab
        keys = tab.column(key_col).to_pylist()
        names = [f"{prefix}#{key + k * stride[dom]:09d}" for key in keys]
        idx = tab.schema.get_field_index(col)
        return tab.set_column(idx, tab.schema.field(col), pa.array(names))

    save("customer", replicated(
        "customer", {"c_custkey": "cust"}, args.copies,
        transform=lambda tab, k: renumber(
            tab, "c_name", "c_custkey", "Customer", k, "cust"),
    ))
    save("supplier", replicated(
        "supplier", {"s_suppkey": "supp"}, args.copies,
        transform=lambda tab, k: renumber(
            tab, "s_name", "s_suppkey", "Supplier", k, "supp"),
    ))

    def salt_part_names(tab: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return tab
        idx = tab.schema.get_field_index("p_name")
        names = resub_texts(tab.column("p_name").to_pylist(), k)
        return tab.set_column(idx, tab.schema.field("p_name"), pa.array(names))

    save("part", replicated(
        "part", {"p_partkey": "part"}, args.copies,
        transform=salt_part_names,
    ))
    save("orders", replicated(
        "orders", {"o_orderkey": "order", "o_custkey": "cust"}, args.copies))
    save("lineitem", replicated(
        "lineitem",
        {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
        args.copies))
    save("events", replicated(
        "events", {"event_id": "event", "user_id": "user"}, args.copies))

    def salt_docs(tab: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return tab
        idx = tab.schema.get_field_index("text")
        texts = resub_texts(tab.column("text").to_pylist(), k)
        return tab.set_column(idx, tab.schema.field("text"), pa.array(texts))

    save("documents", replicated(
        "documents", {"doc_id": "doc"}, args.copies, transform=salt_docs))

    def rotate_embeddings(tab: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return tab
        vecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
        rot = (vecs @ rotation(vecs.shape[1], k)).astype(np.float32)
        idx = tab.schema.get_field_index("embedding")
        arr = pa.array(list(rot), type=tab.schema.field("embedding").type)
        return tab.set_column(idx, tab.schema.field("embedding"), arr)

    save("embeddings", replicated(
        "embeddings", {"vec_id": "vec"}, args.emb_copies,
        transform=rotate_embeddings))

    with open(os.path.join(args.out, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "source": SRC,
                "copies": args.copies,
                "emb_copies": args.emb_copies,
                "method": "key-offset replication + per-copy token "
                          "bijection (text) + orthogonal rotation "
                          "(embeddings); see tools/gen_sf1.py docstring",
            },
            f, indent=1,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
