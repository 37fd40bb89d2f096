"""Property tests for the interval-text codecs (BED, GFF3): arbitrary
well-formed rows must survive format -> parse (scalar) and
format -> chunk-parse (vectorized) bit-exact, for any column widths and
placeholder patterns — the generative counterpart of the fixed corpora
in test_bed.py / test_gff.py."""

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_bam_spark.formats.bed import (
    format_bed_line,
    parse_bed_chunk,
    parse_bed_line,
)
from hadoop_bam_spark.formats.gff import (
    format_gff_line,
    parse_gff_chunk,
    parse_gff_line,
)

# field text: printable, no tab/newline (the format's own constraint),
# non-empty, and not a bare '.' (the placeholder is a distinct state
# tested separately)
_txt = st.text(
    st.characters(min_codepoint=33, max_codepoint=126,
                  exclude_characters="\t"),
    min_size=1, max_size=12,
).filter(lambda s: s != ".")

_contig = st.sampled_from(["chr1", "chr2", "chrX", "ctg_07", "1"])


@st.composite
def bed_rows(draw):
    start = draw(st.integers(1, 10**9))
    length = draw(st.integers(0, 10**6))  # 0 = insertion point
    rest = draw(st.none() | st.lists(_txt, min_size=1, max_size=6))
    return (
        draw(_contig),
        start,
        start + length - 1 if length == 0 else start + length - 1,
        draw(st.none() | _txt),
        draw(st.none() | st.integers(0, 1000)),
        draw(st.none() | st.sampled_from(["+", "-"])),
        rest,
    )


@given(st.lists(bed_rows(), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_bed_roundtrip_scalar_and_vectorized(rows):
    lines = [format_bed_line(r) for r in rows]
    assert [parse_bed_line(ln) for ln in lines] == list(rows)
    arrays = parse_bed_chunk(lines)
    assert arrays is not None
    got = list(zip(*(arrays[c].to_pylist()
                     for c in ("contig", "start", "end", "name",
                               "score", "strand", "rest"))))
    assert [(g[0], g[1], g[2], g[3], g[4], g[5],
             g[6] if g[6] is not None else None) for g in got] == [
        (r[0], r[1], r[2], r[3], r[4], r[5],
         list(r[6]) if r[6] else None) for r in rows]


# attribute keys must not contain '=', ';'; values must not contain ';'
# (they may contain '=' — first-split only)
_akey = st.text(
    st.characters(min_codepoint=33, max_codepoint=126,
                  exclude_characters="\t=;"),
    min_size=1, max_size=8)
_aval = st.text(
    st.characters(min_codepoint=33, max_codepoint=126,
                  exclude_characters="\t;"),
    min_size=1, max_size=8)


@st.composite
def gff_rows(draw):
    start = draw(st.integers(1, 10**9))
    # score: quarters only, so float text round-trips exactly
    score = draw(st.none() | st.integers(0, 4000).map(lambda v: v / 4.0))
    return (
        draw(_contig),
        draw(st.none() | _txt),
        draw(st.none() | _txt),
        start,
        start + draw(st.integers(0, 10**6)),
        score,
        draw(st.none() | st.sampled_from(["+", "-", "?"])),
        draw(st.none() | st.integers(0, 2)),
        draw(st.dictionaries(_akey, _aval, max_size=5)),
    )


@given(st.lists(gff_rows(), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_gff_roundtrip_scalar_and_vectorized(rows):
    lines = [format_gff_line(r) for r in rows]
    assert [parse_gff_line(ln) for ln in lines] == list(rows)
    arrays = parse_gff_chunk(lines)
    assert arrays is not None
    got = list(zip(*(arrays[c].to_pylist()
                     for c in ("contig", "source", "type", "start", "end",
                               "score", "strand", "phase", "attributes"))))
    for g, r in zip(got, rows):
        assert g[:8] == r[:8]
        assert dict(g[8]) == r[8]
