"""Scale-up generator: tile a driver-generated sf directory K-fold into a
larger, schema-identical benchmark directory (e.g. sf0.1 x10 -> "sf1").

Usage:
    python -m hadoop_bam_spark.tools.make_scale SRC_DIR DST_DIR [K]

Key design points (all deterministic, seedless):

- Referential integrity is preserved: every replica shifts each surrogate
  key by ``replica * (max_key + 1)`` consistently across fact and dim
  tables, so joins at the scaled SF hit exactly K times the rows with the
  same per-key fan-out as the source.
- ``region``/``nation`` stay fixed (TPC-H semantics: dims that do not
  scale with SF).
- ``documents.text`` gets a per-replica word-level suffix (every
  whitespace token gains ``~{r}``), which changes *every* shingle. Without
  this, tiling would make each document a near-duplicate of its K-1
  clones and the dedup workload would be quadratically heavier than a real
  corpus at that SF; with it, the duplicate-cluster structure of the
  source replicates K times but stays disjoint across replicas.
- ``embeddings.embedding`` gets per-(vector, dim, replica) hash noise of
  amplitude +-0.15 per element (vectors are unit-ish, 64-dim), pushing
  cross-replica cosine to ~0.8 — below near-dup thresholds — while
  keeping within-replica geometry identical.
- ``events.user_id`` shifts per replica so session/funnel cardinalities
  scale in users, not in events-per-user.

Runs entirely in DuckDB (vectorized, out-of-core) so generating the ~10x
directory takes seconds and no Spark session is needed.
"""

from __future__ import annotations

import os
import sys

import duckdb

# (table, [key columns to shift]); region/nation copied verbatim.
_SHIFTED_KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_VERBATIM = ["region", "nation"]


def _perm_case_expr(vocab: list[str], seed: int) -> str:
    """CASE expression remapping each vocabulary token under a seeded
    derangement (no fixed points; deterministic LCG Fisher-Yates).

    Why a permutation and not a suffix (both earlier designs failed the r6
    sf10 stress): any per-replica token SUFFIX either (a) repeats across
    nested tilings — a bare ~{r} made generation-2 replica r of an
    unsuffixed doc byte-identical to generation-1 replica r of the same
    source doc, planting one exact clone per (doc, replica) — or (b) once
    made generation-unique, grows to >= the dedup shingle width and
    becomes a shingle shared by EVERY token of a replica, collapsing the
    corpus's shingle diversity (measured: sf1 candidate pairs 349k ->
    2.9M). Re-labeling the closed vocabulary keeps within-replica
    statistics IDENTICAL to the source corpus (dup clusters map 1:1) while
    making cross-replica word sequences disjoint; the vocabulary is closed
    under composition, so nested tilings compose permutations and stay
    well-behaved. Seeds (replica * doc-key stride) never repeat across
    nested generations: r*stride_g1 < K*stride_g1 = stride_g2 <= r'*stride_g2.
    """
    n = len(vocab)
    x = (seed * 0x9E3779B97F4A7C15 + 0x2545F4914F6CDD1D) % (1 << 64)

    def nxt(bound: int) -> int:
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (x >> 16) % bound

    while True:
        idx = list(range(n))
        for i in range(n - 1, 0, -1):
            j = nxt(i + 1)
            idx[i], idx[j] = idx[j], idx[i]
        if all(idx[i] != i for i in range(n)):
            break
    whens = " ".join(
        f"WHEN '{vocab[i]}' THEN '{vocab[idx[i]]}'" for i in range(n)
    )
    return f"CASE t {whens} ELSE t END"

# Key spaces shared across tables: shift amounts must agree between the
# dim and every fact referencing it.
_KEY_SPACE: dict[str, tuple[str, str]] = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def make_scale(src: str, dst: str, k: int = 10,
               tables: set[str] | None = None) -> None:
    """``tables`` restricts the tiling to a subset (e.g. {"documents"} for
    a documents-only deep-scale stress directory); default is all. Key
    strides are still computed from the owning table in SRC so a partial
    tiling stays key-compatible with a full one at the same K."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count() or 8}")

    wanted = set(_SHIFTED_KEYS) | set(_VERBATIM) if tables is None else tables
    needed_spaces = {
        _KEY_SPACE[c]
        for t in wanted & set(_SHIFTED_KEYS)
        for c in _SHIFTED_KEYS[t]
    }

    # One stride per key space, from the owning table's max.
    stride: dict[tuple[str, str], int] = {}
    for space in needed_spaces:
        table, col = space
        (mx,) = con.execute(
            f"select max({col}) from '{src}/{table}.parquet'"
        ).fetchone()
        stride[space] = int(mx) + 1

    for t in _VERBATIM:
        if t not in wanted:
            continue
        con.execute(
            f"COPY (select * from '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT parquet, COMPRESSION snappy)"
        )

    doc_vocab: list[str] = []
    if "documents" in wanted and k > 1:
        doc_vocab = [
            row[0]
            for row in con.execute(
                "select distinct unnest(string_split(text, ' ')) tok"
                f" from '{src}/documents.parquet' order by tok"
            ).fetchall()
            if row[0]
        ]
        if len(doc_vocab) > 1000:
            raise ValueError(
                "documents vocabulary is not closed/small "
                f"({len(doc_vocab)} tokens); the permutation scale-up "
                "transform assumes a bounded vocabulary"
            )

    for t, keys in _SHIFTED_KEYS.items():
        if t not in wanted:
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"describe select * from '{src}/{t}.parquet'"
            ).fetchall()
        ]
        parts = []
        for r in range(k):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {r * stride[_KEY_SPACE[c]]} as {c}")
                elif t == "documents" and c in ("text", "n_chars") and r > 0:
                    # re-label the (closed, small) vocabulary under a
                    # per-replica derangement — see _perm_case_expr for why
                    # suffixing is the wrong transform here
                    case = _perm_case_expr(
                        doc_vocab, r * stride[_KEY_SPACE["doc_id"]]
                    )
                    remap = (
                        "array_to_string(list_transform("
                        f"string_split(text, ' '), t -> {case}), ' ')"
                    )
                    sel.append(
                        f"{remap} as text" if c == "text"
                        else f"length({remap}) as n_chars"
                    )
                elif t == "embeddings" and c == "embedding" and r > 0:
                    # per-(vec,dim,replica) hash noise, +-0.15/element:
                    # cross-replica cosine ~0.8, within-replica geometry kept
                    sel.append(
                        "list_transform(list_zip(embedding, range(len(embedding))),"
                        f" p -> CAST(p[1] + ((hash(vec_id * 1000003 + p[2] * 7919 + {r})"
                        " % 1000) / 1000.0 - 0.5) * 0.3 AS FLOAT)) as embedding"
                    )
                else:
                    sel.append(c)
            parts.append(
                f"select {', '.join(sel)} from '{src}/{t}.parquet'"
            )
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{dst}/{t}.parquet'"
            " (FORMAT parquet, COMPRESSION snappy)"
        )
        (n,) = con.execute(f"select count(*) from '{dst}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--tables=")]
    tabs = None
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tabs = set(a.split("=", 1)[1].split(","))
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    make_scale(argv[0], argv[1], int(argv[2]) if len(argv) > 2 else 10,
               tables=tabs)
