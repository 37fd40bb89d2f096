"""Property tests: format_chain <-> parse_chain against adversarial
geometry (r14 VERDICT #8).

r14 added validation raises to both directions; these tests PIN the
accept/reject boundary generatively — multi-chromosome size maps, minus
blocks hugging contig ends, q_end == q_size / t_end == t_size exactness
— the way test_codec_properties.py pins the byte-level codecs.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_bam_spark.formats.chain import format_chain, parse_chain

T_SIZES = {"tA": 500, "tB": 80, "tC": 10_000}
Q_SIZES = {"qA": 400, "qB": 64, "qC": 9_999}


@st.composite
def _blocks(draw, min_blocks=1, max_blocks=8):
    n = draw(st.integers(min_blocks, max_blocks))
    out = []
    for i in range(n):
        sc = draw(st.sampled_from(sorted(T_SIZES)))
        dc = draw(st.sampled_from(sorted(Q_SIZES)))
        size = draw(st.integers(1, min(T_SIZES[sc], Q_SIZES[dc], 40)))
        # bias toward the boundaries: first slot, last slot, or anywhere
        def _place(limit):
            mode = draw(st.integers(0, 3))
            if mode == 0:
                return 1
            if mode == 1:
                return limit - size + 1
            return draw(st.integers(1, limit - size + 1))

        ss = _place(T_SIZES[sc])
        ds = _place(Q_SIZES[dc])
        strand = draw(st.sampled_from(["+", "-"]))
        score = draw(st.integers(0, 10_000))
        out.append((sc, ss, ss + size - 1, dc, ds, strand, i + 1, score))
    return out


class TestChainRoundtrip:
    @given(_blocks())
    @settings(max_examples=60, deadline=None)
    def test_format_parse_roundtrip(self, blocks):
        """Any in-bounds block list — including blocks whose t_end/q_end
        exactly equal the declared sizes and minus blocks at either
        contig end — survives format_chain -> parse_chain verbatim (the
        minus-strand mirror cancels exactly)."""
        text = format_chain(blocks, t_size=T_SIZES, q_size=Q_SIZES)
        assert parse_chain(text) == blocks

    @given(_blocks(max_blocks=4))
    @settings(max_examples=30, deadline=None)
    def test_single_int_sizes_roundtrip(self, blocks):
        """The scalar-size form (one declared size for every contig) is
        equivalent to a constant mapping."""
        big = max(max(T_SIZES.values()), max(Q_SIZES.values()))
        text = format_chain(blocks, t_size=big, q_size=big)
        assert parse_chain(text) == blocks


class TestChainRejectBoundary:
    @given(_blocks(max_blocks=3), st.integers(0, 2))
    @settings(max_examples=40, deadline=None)
    def test_one_past_the_end_rejects(self, blocks, which):
        """Shrinking the declared size below any block's high coordinate
        (by exactly one) must raise, on whichever side was violated —
        the q-side check is what keeps a minus block from silently
        writing a negative qStart."""
        sc, ss, se, dc, ds, strand, cid, score = blocks[0]
        size = se - ss + 1
        t_sizes, q_sizes = dict(T_SIZES), dict(Q_SIZES)
        if which == 0:
            t_sizes[sc] = se - 1  # tEnd > tSize
        elif which == 1:
            q_sizes[dc] = ds + size - 2  # q_end > qSize (or qStart < 0 on '-')
        else:
            del t_sizes[sc]  # contig missing from the mapping
        with pytest.raises(ValueError):
            format_chain(blocks, t_size=t_sizes, q_size=q_sizes)

    @given(_blocks(max_blocks=1))
    @settings(max_examples=20, deadline=None)
    def test_minus_block_requires_real_q_size(self, blocks):
        blocks = [b[:5] + ("-",) + b[6:] for b in blocks]
        with pytest.raises(ValueError, match="q_size"):
            format_chain(blocks, t_size=T_SIZES, q_size=None)

    @given(_blocks(max_blocks=2))
    @settings(max_examples=30, deadline=None)
    def test_parse_rejects_overrun_block_walk(self, blocks):
        """Corrupting a formatted chain's size line to walk one base past
        the declared span must raise in parse_chain — the bound the r14
        validation added."""
        text = format_chain(blocks, t_size=T_SIZES, q_size=Q_SIZES)
        lines = text.splitlines()
        for i, ln in enumerate(lines):
            if ln and not ln.startswith("chain"):
                lines[i] = str(int(ln) + 1)
                break
        with pytest.raises(ValueError, match="overruns|outside"):
            parse_chain("\n".join(lines) + "\n")
