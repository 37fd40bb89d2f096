"""UCSC chain format codec + strand-aware liftover.

parse_chain is checked against hand-walked block lists (including
minus-strand mirror math, dt/dq gaps, multi-chain files, auto ids) and
structural rejection; format_chain -> parse_chain round-trips; the
strand-aware interval_liftover path is checked against a per-position
brute force on both strands.
"""

import gzip

import pytest

from hadoop_bam_spark.formats.chain import (
    format_chain,
    parse_chain,
    read_chain,
    read_chain_file,
)

# chr1 0-based: blocks [100,150) and [160,200) map into chrA with a 5-base
# query gap; chain 2 is minus-strand: qSize=1000, block [30,70) on the
# reverse strand = plus-strand [930,970).
CHAIN_TEXT = """\
chain 4900 chr1 1000 + 100 200 chrA 2000 + 500 605 1
50 10 15
40

chain 800 chr2 1000 + 300 340 chrB 1000 - 30 70 7
40
"""


def test_parse_walk_and_strands():
    rows = parse_chain(CHAIN_TEXT)
    assert rows == [
        # chain 1: t=100 size 50 -> q=500; then t=160, q=565, size 40
        ("chr1", 101, 150, "chrA", 501, "+", 1, 4900),
        ("chr1", 161, 200, "chrA", 566, "+", 1, 4900),
        # chain 2 minus: plus-strand low = 1000 - (30+40) = 930 -> 1-based 931
        ("chr2", 301, 340, "chrB", 931, "-", 7, 800),
    ]


def test_auto_ids_when_missing():
    txt = "chain 1 c 10 + 0 5 d 10 + 0 5\n5\n\nchain 1 c 10 + 5 8 d 10 + 5 8\n3\n"
    rows = parse_chain(txt)
    assert [r[6] for r in rows] == [1, 2]


@pytest.mark.parametrize(
    "bad",
    [
        "chain 1 c 10 + 0 5 d 10 + 0 5\n",          # no terminal block line
        "5 1 1\n",                                   # block before header
        "chain 1 c 10 - 0 5 d 10 + 0 5\n5\n",        # tStrand '-'
        "chain 1 c 10 + 0 5 d 10 * 0 5\n5\n",        # bad qStrand
        "chain 1 c 10 + 0 5 d 10 + 0 5\n9\n",        # overruns t span
        "chain 1 c 10 + 0 5 d 10 + 0 5\n5\n3\n",     # block after terminal
        "chain 1 c 10 + 0 20 d 10 + 0 5\n5\n",       # tEnd > tSize
        "chain x c 10 + 0 5 d 10 + 0 5\n5\n",        # non-integer score
        "chain 1 c 10 + 0 5 d 10 + 0 5\n5 1\n5\n",   # 2-field block line
    ],
)
def test_parse_rejects_malformed(bad):
    with pytest.raises(ValueError):
        parse_chain(bad)


def test_format_roundtrip():
    rows = parse_chain(CHAIN_TEXT)
    back = parse_chain(format_chain(rows, t_size=1000, q_size=2000))
    # single-block chains keep (src, dst, strand, score); ids renumber only
    # when absent — format_chain writes them, so they survive too.
    assert [(r[0], r[1], r[2], r[3], r[4], r[5], r[7]) for r in back] == [
        (r[0], r[1], r[2], r[3], r[4], r[5], r[7]) for r in rows
    ]


def test_read_chain_file_gz(tmp_path):
    p = tmp_path / "x.chain.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(CHAIN_TEXT)
    assert read_chain_file(str(p)) == parse_chain(CHAIN_TEXT)


def test_liftover_strand_aware_brute(spark, tmp_path):
    from hadoop_bam_spark.operators.interval_join import interval_liftover

    p = tmp_path / "t.chain"
    p.write_text(CHAIN_TEXT)
    chain = read_chain(spark, str(p))
    blocks = read_chain_file(str(p))

    left = [
        ("chr1", 90, 120, "a"),    # head overhang into block 1
        ("chr1", 140, 170, "b"),   # spans the gap between blocks 1 and 2
        ("chr1", 500, 600, "u"),   # unmapped
        ("chr2", 300, 305, "m1"),  # minus-strand block, left edge
        ("chr2", 320, 340, "m2"),  # minus-strand block, right edge
    ]
    ldf = spark.createDataFrame(
        left, "contig string, start long, stop long, name string"
    )
    got = {}
    res = interval_liftover(ldf, chain, strand_col="dst_strand").collect()
    for r in res:
        got.setdefault(r["name"], []).append(
            (r["contig"], r["start"], r["stop"], r["dst_strand"])
        )

    # brute force: per-position map through each block, then re-run
    want = {}
    for c, s, e, name in left:
        for (sc, ss, se, dc, ds, strand, _cid, _score) in blocks:
            if sc != c or s > se or ss > e:
                continue
            cs, ce = max(ss, s), min(se, e)
            if strand == "+":
                lo, hi = ds + cs - ss, ds + ce - ss
            else:
                p_hi = ds + (se - ss)
                lo, hi = p_hi - (ce - ss), p_hi - (cs - ss)
            want.setdefault(name, []).append((dc, lo, hi, strand))
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }
    assert "u" not in got
    # mirror sanity: m1 touches src positions 301..305 (block right edge on
    # the minus strand -> dst HIGH end); m2 covers 320..340 -> dst low end.
    assert got["m1"] == [("chrB", 966, 970, "-")]
    assert got["m2"] == [("chrB", 931, 951, "-")]


# ---------------------------------------------------------------------------
# Generative properties: arbitrary well-formed block lists survive
# format_chain -> parse_chain exactly (both strands, any geometry), and the
# mirror transform is its own inverse.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_name = st.sampled_from(["chr1", "chr2", "chrX", "scaffold_9"])


@st.composite
def chain_blocks(draw):
    n = draw(st.integers(1, 8))
    out = []
    for i in range(n):
        ss = draw(st.integers(1, 10**6))
        size = draw(st.integers(1, 10**5))
        ds = draw(st.integers(1, 10**6))
        out.append((
            draw(_name), ss, ss + size - 1,
            draw(_name) + "_q", ds,
            draw(st.sampled_from("+-")),
            i + 1,
            draw(st.integers(0, 10**9)),
        ))
    return out


@given(chain_blocks())
@settings(max_examples=200, deadline=None)
def test_property_format_parse_roundtrip(blocks):
    t_size = q_size = 1 << 40
    back = parse_chain(format_chain(blocks, t_size=t_size, q_size=q_size))
    assert back == blocks


@given(st.integers(1, 10**6), st.integers(1, 10**4), st.integers(1, 10**6),
       st.integers(0, 10**4))
@settings(max_examples=200, deadline=None)
def test_property_minus_mirror_involution(ss, size, ds, off):
    """Mapping a position into a '-' block and back returns the original:
    the mirror p -> p_hi - (p - ss) is an involution on the block."""
    se = ss + size - 1
    pos = ss + (off % size)
    p_hi = ds + (se - ss)
    lifted = p_hi - (pos - ss)
    # inverse: treat the lifted coordinate as a src position of the
    # REVERSE block (dst->src uses the same mirror)
    back = se - (lifted - ds)
    assert back == pos
    assert ds <= lifted <= p_hi


def test_auto_ids_skip_explicit_ids():
    """An id-less chain must not collide with another chain's explicit id."""
    txt = ("chain 1 c 10 + 0 5 d 10 + 0 5 2\n5\n\n"
           "chain 1 c 10 + 5 8 d 10 + 5 8\n3\n")
    rows = parse_chain(txt)
    assert [r[6] for r in rows] == [2, 1]
    txt2 = ("chain 1 c 10 + 0 5 d 10 + 0 5 1\n5\n\n"
            "chain 1 c 10 + 5 8 d 10 + 5 8\n3\n")
    assert [r[6] for r in parse_chain(txt2)] == [1, 2]


def test_format_minus_requires_real_q_size():
    blocks = [("c", 1, 10, "d", 100, "-", 1, 0)]
    with pytest.raises(ValueError, match="q_size"):
        format_chain(blocks)
    # plus-strand-only lists may omit it
    assert "chain" in format_chain([("c", 1, 10, "d", 100, "+", 1, 0)])


def test_format_validates_declared_sizes():
    """ADVICE r13: a q_size smaller than a minus block's plus-strand high
    silently wrote a negative qStart — an invalid chain. Now: ValueError."""
    minus = [("c", 1, 10, "d", 95, "-", 1, 0)]  # needs q_size >= 104
    with pytest.raises(ValueError, match="q_size"):
        format_chain(minus, q_size=100)
    assert "chain" in format_chain(minus, q_size=104)
    plus_over = [("c", 1, 10, "d", 95, "+", 1, 0)]  # q_end 104 > 100
    with pytest.raises(ValueError, match="q_size"):
        format_chain(plus_over, q_size=100)
    t_over = [("c", 995, 1005, "d", 1, "+", 1, 0)]
    with pytest.raises(ValueError, match="t_size"):
        format_chain(t_over, t_size=1000)


def test_format_per_contig_size_mapping():
    """Multi-chromosome block lists need per-contig declared sizes."""
    blocks = [
        ("c1", 1, 10, "d1", 5, "+", 1, 0),
        ("c2", 1, 10, "d2", 95, "-", 2, 0),
    ]
    txt = format_chain(
        blocks,
        t_size={"c1": 100, "c2": 2000},
        q_size={"d1": 50, "d2": 104},
    )
    assert " c1 100 + " in txt and " c2 2000 + " in txt
    assert " d1 50 + " in txt and " d2 104 - " in txt
    assert parse_chain(txt) == blocks
    with pytest.raises(ValueError, match="no size for contig"):
        format_chain(blocks, t_size={"c1": 100}, q_size=104)


def test_read_chain_plans_as_local_table_scan(spark, tmp_path):
    """read_chain must NOT plan a Python-RDD scan (r18, guide §4).

    createDataFrame(list) parallelizes into defaultParallelism
    Python-RDD slices; every broadcast build of the chain then launches
    one Python worker per core to re-emit 25 pickled rows (~12 CPU-s a
    run at local[32] — 75% of chain_liftover_roundtrip's bench CPU).
    The Arrow/pandas path plans a pure-JVM LocalTableScan.
    """
    p = tmp_path / "t.chain"
    p.write_text(CHAIN_TEXT)
    df = read_chain(spark, str(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, plan
    assert "LocalTableScan" in plan, plan
    # identical content to the driver-side parse
    assert sorted(tuple(r) for r in df.collect()) == sorted(
        read_chain_file(str(p))
    )
