"""Scale-up generator invariants (tools/make_scale.py).

The r6 sf10 stress caught two generator defects that silently corrupted
scale conclusions (SCALE.md): nested tilings planting exact cross-
generation document clones, and a replica-universal suffix shingle
collapsing minhash diversity. These tests pin the fixed contract on a
tiny corpus so the defects cannot return.
"""

import os

import duckdb
import pytest

from hadoop_bam_spark.tools.make_scale import _perm_case_expr, make_scale

VOCAB = sorted(
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the "
    "row agg key query a scan batch dup".split()
)


def _mk_src(tmp_path, n_docs=40):
    """Tiny documents table with one exact-dup pair, plus the key-space
    owner tables make_scale derives strides from."""
    src = tmp_path / "src"
    os.makedirs(src)
    con = duckdb.connect()
    import hashlib

    rows = []
    for i in range(n_docs):
        words = [
            VOCAB[hashlib.md5(f"{i}:{j}".encode()).digest()[0] % len(VOCAB)]
            for j in range(30)
        ]
        rows.append((i, " ".join(words)))
    rows[n_docs - 1] = (n_docs - 1, rows[0][1])  # one exact dup pair
    con.execute("create table d (doc_id bigint, text varchar)")
    con.executemany("insert into d values (?, ?)", rows)
    con.execute("alter table d add column n_chars int")
    con.execute("update d set n_chars = length(text)")
    con.execute(
        f"COPY (select * from d) TO '{src}/documents.parquet' (FORMAT parquet)"
    )
    return str(src)


def _dup_rows(con, path):
    return con.execute(
        f"select count(*) - count(distinct text) from '{path}/documents.parquet'"
    ).fetchone()[0]


def test_perm_case_expr_is_derangement_and_seed_sensitive():
    e1 = _perm_case_expr(VOCAB, seed=5 * 100)
    e2 = _perm_case_expr(VOCAB, seed=5 * 1000)
    assert e1 != e2  # different seeds -> different permutations
    # derangement: no token maps to itself
    for v in VOCAB:
        assert f"WHEN '{v}' THEN '{v}'" not in e1
    # closed: every THEN target is in the vocabulary
    import re
    for tgt in re.findall(r"THEN '(\w+)'", e1):
        assert tgt in VOCAB


def test_single_tiling_linear_dups(tmp_path):
    src = _mk_src(tmp_path)
    dst = str(tmp_path / "x3")
    make_scale(src, dst, 3, tables={"documents"})
    con = duckdb.connect()
    (n,) = con.execute(f"select count(*) from '{dst}/documents.parquet'").fetchone()
    assert n == 120
    # exact-dup rows scale exactly linearly: the source's 1 dup row x 3
    assert _dup_rows(con, src) == 1
    assert _dup_rows(con, dst) == 3
    # replica keys shifted by stride
    (mx,) = con.execute(f"select max(doc_id) from '{dst}/documents.parquet'").fetchone()
    assert mx == 40 * 2 + 39


def test_nested_tiling_no_cross_generation_clones(tmp_path):
    """The regression the sf10 stress caught: generation-2 replica r of an
    untouched doc must NOT equal generation-1 replica r of the same
    source doc."""
    src = _mk_src(tmp_path)
    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    make_scale(src, g1, 3, tables={"documents"})
    make_scale(g1, g2, 3, tables={"documents"})
    con = duckdb.connect()
    (n,) = con.execute(f"select count(*) from '{g2}/documents.parquet'").fetchone()
    assert n == 360
    # with the suffix scheme this was 1*9 + cross-generation clones; the
    # derangement scheme keeps it exactly linear: 1 dup row per replica^2
    assert _dup_rows(con, g2) == 9
    # within-replica statistics preserved: token multiset sizes identical
    per_rep = con.execute(f"""
        select doc_id // 120 as rep,
               count(distinct text) as uniq,
               sum(length(text) - length(replace(text, ' ', '')) + 1) as toks
        from '{g2}/documents.parquet' group by 1 order by 1
    """).fetchall()
    assert len(per_rep) == 3
    assert len({(u, t) for _, u, t in per_rep}) == 1  # identical across replicas


def test_n_chars_matches_remapped_text(tmp_path):
    src = _mk_src(tmp_path)
    dst = str(tmp_path / "x2")
    make_scale(src, dst, 2, tables={"documents"})
    con = duckdb.connect()
    (bad,) = con.execute(
        f"select count(*) from '{dst}/documents.parquet' where n_chars != length(text)"
    ).fetchone()
    assert bad == 0


def test_open_vocabulary_rejected(tmp_path):
    src = tmp_path / "open"
    os.makedirs(src)
    con = duckdb.connect()
    con.execute(
        f"""COPY (select range as doc_id, 'tok' || range::varchar || ' filler' as text,
            10 as n_chars from range(2000))
            TO '{src}/documents.parquet' (FORMAT parquet)"""
    )
    with pytest.raises(ValueError, match="vocabulary"):
        make_scale(str(src), str(tmp_path / "out"), 2, tables={"documents"})
