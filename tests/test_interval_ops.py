"""bedtools-family interval operators vs a brute-force Python reference.

Each operator (subtract / complement / closest / coverage / jaccard) is
checked on seeded random interval sets against an independent O(n*m)
per-base / all-pairs model — deliberately the dumbest possible
implementation, so any clever-plan bug in the Spark composition
(bin dedup, sentinel walk, union-window sweep) diverges from it.

Interval convention everywhere: 1-based closed, overlap iff
a.start <= b.stop AND b.start <= a.stop (htsjdk Interval).
"""

import random

import pytest

from hadoop_bam_spark.operators.interval_join import (
    interval_closest,
    interval_complement,
    interval_coverage,
    interval_jaccard,
    interval_merge,
    interval_subtract,
)

CONTIGS = ["c1", "c2", "c3"]
AXIS = 3000  # small axis so overlaps/adjacency/containment all occur


def _mk(rng, n, name_prefix):
    rows = []
    for i in range(n):
        c = rng.choice(CONTIGS)
        s = rng.randint(1, AXIS)
        e = s + rng.randint(0, 120)
        rows.append((c, s, e, f"{name_prefix}{i}"))
    return rows


def _covered(rows):
    """contig -> set of covered positions (the per-base truth)."""
    cov = {}
    for c, s, e, *_ in rows:
        cov.setdefault(c, set()).update(range(s, e + 1))
    return cov


def _runs(positions):
    """sorted position set -> list of (start, stop) maximal runs."""
    out = []
    for p in sorted(positions):
        if out and p == out[-1][1] + 1:
            out[-1] = (out[-1][0], p)
        else:
            out.append((p, p))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    rng = random.Random(20260816)
    left = _mk(rng, 120, "L")
    right = _mk(rng, 80, "R")
    ldf = spark.createDataFrame(left, "contig string, start long, stop long, name string")
    rdf = spark.createDataFrame(right, "contig string, start long, stop long, name string")
    return left, right, ldf, rdf


def test_merge_matches_per_base_runs(spark, frames):
    left, _, ldf, _ = frames
    got = {
        (r["contig"], r["start"], r["stop"])
        for r in interval_merge(ldf, keys=("contig", "start", "stop")).collect()
    }
    want = set()
    for c, pos in _covered(left).items():
        # gap=0 merges book-ended intervals: adjacent positions join runs.
        want.update((c, s, e) for s, e in _runs(pos))
    assert got == want


@pytest.mark.parametrize("bin_size", [16384, 256])
def test_subtract_matches_per_base(spark, frames, bin_size):
    left, right, ldf, rdf = frames
    got = {}
    res = interval_subtract(ldf, rdf, keys=("contig", "start", "stop"),
                            bin_size=bin_size)
    assert set(res.columns) == {"contig", "start", "stop", "name"}
    for r in res.collect():
        got.setdefault(r["name"], []).append((r["start"], r["stop"]))
    rcov = _covered(right)
    for c, s, e, name in left:
        keep = [p for p in range(s, e + 1) if p not in rcov.get(c, ())]
        want = _runs(keep)
        assert sorted(got.get(name, [])) == want, name


def test_complement_matches_per_base(spark, frames):
    left, _, ldf, _ = frames
    sizes = spark.createDataFrame(
        [(c, AXIS + 200) for c in CONTIGS] + [("empty_contig", 50)],
        "contig string, size long",
    )
    res = interval_complement(ldf, sizes, keys=("contig", "start", "stop"))
    got = {}
    for r in res.collect():
        got.setdefault(r["contig"], []).append((r["start"], r["stop"]))
    cov = _covered(left)
    for c in CONTIGS + ["empty_contig"]:
        size = 50 if c == "empty_contig" else AXIS + 200
        free = [p for p in range(1, size + 1) if p not in cov.get(c, ())]
        assert sorted(got.get(c, [])) == _runs(free), c


def test_closest_matches_all_pairs(spark, frames):
    left, right, ldf, rdf = frames
    res = interval_closest(ldf, rdf, keys=("contig", "start", "stop"))
    got = {r["name"]: r["closest_dist"] for r in res.collect()}
    assert len(got) == len(left)
    by_contig = {}
    for c, s, e, _ in right:
        by_contig.setdefault(c, []).append((s, e))
    for c, s, e, name in left:
        cands = by_contig.get(c)
        if not cands:
            assert got[name] is None, name
            continue
        want = min(max(rs - e, s - re, 0) for rs, re in cands)
        assert got[name] == want, name


@pytest.mark.parametrize("chunk_size", [None, 97])
@pytest.mark.parametrize(
    "io,iu,idn", [(True, False, False), (False, True, False),
                  (False, False, True), (True, True, False)]
)
def test_closest_options_brute(spark, frames, io, iu, idn, chunk_size):
    """bedtools closest -io / -iu / -id / -D ref vs the all-pairs model."""
    left, right, ldf, rdf = frames
    res = interval_closest(
        ldf, rdf, keys=("contig", "start", "stop"), chunk_size=chunk_size,
        ignore_overlaps=io, ignore_upstream=iu, ignore_downstream=idn,
        signed=True,
    )
    got = {r["name"]: r["closest_dist"] for r in res.collect()}
    assert len(got) == len(left)
    by_contig = {}
    for c, s, e, _ in right:
        by_contig.setdefault(c, []).append((s, e))
    for c, s, e, name in left:
        cands = by_contig.get(c, [])
        overlaps = any(rs <= e and s <= re for rs, re in cands)
        if overlaps and not io:
            assert got[name] == 0, name
            continue
        prev = [s - re for rs, re in cands
                if (re < s if io else re <= s)] if not iu else []
        nxt = [rs - e for rs, re in cands
               if (rs > e if io else rs >= e)] if not idn else []
        d_prev = min(prev) if prev else None
        d_next = min(nxt) if nxt else None
        if d_prev is None and d_next is None:
            assert got[name] is None, name
        elif d_next is None or (d_prev is not None and d_prev <= d_next):
            assert got[name] == -d_prev, name
        else:
            assert got[name] == d_next, name


@pytest.mark.parametrize("io,signed", [(False, False), (True, True)])
def test_closest_all_ties_matches_all_pairs(spark, frames, io, signed):
    """bedtools -t all (the default tie mode): one row per tied-closest
    right feature, vs brute-force tie enumeration."""
    from hadoop_bam_spark.operators.interval_join import interval_closest_all

    left, right, ldf, rdf = frames
    res = interval_closest_all(
        ldf, rdf.drop("name"), keys=("contig", "start", "stop"),
        ignore_overlaps=io, signed=signed,
    )
    got = {}
    for r in res.collect():
        got.setdefault(r["name"], set()).add(
            (r["closest_dist"], r["closest_start"], r["closest_stop"])
        )
    assert len(set(len(v) for v in got.values())) >= 1
    by_contig = {}
    for rc, rs, re_, _ in right:
        by_contig.setdefault(rc, []).append((rs, re_))
    for lc, ls, le, name in left:
        cands = by_contig.get(lc, [])
        want = set()
        overl = [(rs, re_) for rs, re_ in cands if rs <= le and ls <= re_]
        if overl and not io:
            want = {(0, rs, re_) for rs, re_ in overl}
        else:
            prev = [(ls - re_, rs, re_) for rs, re_ in cands
                    if (re_ < ls if io else re_ <= ls)]
            nxt = [(rs - le, rs, re_) for rs, re_ in cands
                   if (rs > le if io else rs >= le)]
            dists = [p[0] for p in prev] + [p[0] for p in nxt]
            if not dists:
                want = {(None, None, None)}
            else:
                dmin = min(dists)
                want = {(-dmin if signed else dmin, rs, re_)
                        for dd, rs, re_ in prev if dd == dmin}
                want |= {(dmin, rs, re_) for dd, rs, re_ in nxt if dd == dmin}
        assert got[name] == want, (name, got[name], want)


def test_closest_rejects_iu_and_id(spark, frames):
    _, _, ldf, rdf = frames
    with pytest.raises(ValueError, match="ignore_upstream"):
        interval_closest(ldf, rdf, keys=("contig", "start", "stop"),
                         ignore_upstream=True, ignore_downstream=True)


@pytest.mark.parametrize("bin_size", [16384, 256])
def test_coverage_matches_per_base(spark, frames, bin_size):
    left, right, ldf, rdf = frames
    res = interval_coverage(ldf, rdf, keys=("contig", "start", "stop"),
                            bin_size=bin_size)
    rows = {r["name"]: r for r in res.collect()}
    assert len(rows) == len(left)
    rcov = _covered(right)
    by_contig = {}
    for c, s, e, _ in right:
        by_contig.setdefault(c, []).append((s, e))
    for c, s, e, name in left:
        r = rows[name]
        n = sum(1 for rs, re in by_contig.get(c, []) if rs <= e and s <= re)
        cov = sum(1 for p in range(s, e + 1) if p in rcov.get(c, ()))
        assert r["n_overlaps"] == n, name
        assert r["covered_bases"] == cov, name
        assert r["interval_len"] == e - s + 1
        assert r["coverage_fraction"] == pytest.approx(cov / (e - s + 1))


@pytest.mark.parametrize("bin_size", [16384, 256])
def test_jaccard_matches_per_base(spark, frames, bin_size):
    left, right, ldf, rdf = frames
    row = interval_jaccard(ldf, rdf, bin_size=bin_size).collect()[0]
    a, b = _covered(left), _covered(right)
    inter = sum(len(a.get(c, set()) & b.get(c, set())) for c in CONTIGS)
    union = sum(len(a.get(c, set()) | b.get(c, set())) for c in CONTIGS)
    assert row["intersection_bases"] == inter
    assert row["union_bases"] == union
    assert row["jaccard"] == pytest.approx(inter / union)
    # n_intersections = disjoint intersection runs (both sides pre-merged)
    n_runs = sum(len(_runs(a.get(c, set()) & b.get(c, set()))) for c in CONTIGS)
    assert row["n_intersections"] == n_runs


def test_edge_shapes(spark):
    """Containment, book-ending, identical intervals, full cover."""
    ldf = spark.createDataFrame(
        [("c", 10, 20, "a"), ("c", 30, 30, "b"), ("c", 100, 110, "u")],
        "contig string, start long, stop long, name string",
    )
    rdf = spark.createDataFrame(
        [("c", 1, 50, "x"), ("c", 12, 15, "y")],
        "contig string, start long, stop long, name string",
    )
    # every left base covered except the untouched 100-110
    segs = interval_subtract(ldf, rdf).collect()
    assert [(r["name"], r["start"], r["stop"]) for r in segs] == [("u", 100, 110)]
    cov = {r["name"]: r for r in interval_coverage(ldf, rdf).collect()}
    assert cov["a"]["coverage_fraction"] == 1.0
    assert cov["u"]["n_overlaps"] == 0 and cov["u"]["covered_bases"] == 0
    dist = {r["name"]: r["closest_dist"] for r in interval_closest(ldf, rdf).collect()}
    assert dist == {"a": 0, "b": 0, "u": 50}  # 100 - 50 = 50


@pytest.mark.parametrize("bin_size", [16384, 256])
def test_liftover_matches_per_base(spark, frames, bin_size):
    from hadoop_bam_spark.operators.interval_join import interval_liftover

    left, _, ldf, _ = frames
    # Disjoint chain blocks per contig: [1+600k, 500+600k] stride 700.
    chain = [
        (c, k * 700 + 1, k * 700 + 500, f"{c}_new", 1_000_000 + k * 10_000)
        for c in CONTIGS
        for k in range(5)
    ]
    cdf = spark.createDataFrame(
        chain,
        "src_contig string, src_start long, src_stop long, "
        "dst_contig string, dst_start long",
    )
    by_c = {}
    for sc, ss, se, dc, ds in chain:
        by_c.setdefault(sc, []).append((ss, se, dc, ds))

    def brute(min_match):
        segs, fracs = {}, {}
        for c, s, e, name in left:
            mapped = []
            for ss, se, dc, ds in by_c.get(c, []):
                cs, ce = max(ss, s), min(se, e)
                if cs <= ce:
                    mapped.append((dc, ds + cs - ss, ds + ce - ss, ce - cs + 1))
            tot = sum(m[3] for m in mapped)
            fr = tot / (e - s + 1)
            if fr >= min_match and mapped:
                segs[name] = sorted((d, a, b) for d, a, b, _ in mapped)
                fracs[name] = fr
        return segs, fracs

    for min_match in (0.0, 0.5):
        res = interval_liftover(
            ldf, cdf, bin_size=bin_size, min_match=min_match
        ).collect()
        got = {}
        for r in res:
            got.setdefault(r["name"], []).append(
                (r["contig"], r["start"], r["stop"])
            )
            if min_match > 0:
                assert 0 < r["mapped_fraction"] <= 1.0
        want, fracs = brute(min_match)
        assert {k: sorted(v) for k, v in got.items()} == want, f"min_match={min_match}"
        if min_match > 0:
            fr_got = {
                r["name"]: r["mapped_fraction"]
                for r in res
            }
            for k, v in fracs.items():
                assert fr_got[k] == pytest.approx(v)


def test_multiinter_matches_per_base(spark, frames):
    from hadoop_bam_spark.operators.interval_join import interval_multiinter

    left, right, ldf, rdf = frames
    rng = random.Random(99)
    third = _mk(rng, 60, "T")
    tdf = spark.createDataFrame(
        third, "contig string, start long, stop long, name string")
    sets = {"alpha": left, "beta": right, "gamma": third}
    res = interval_multiinter(
        {"alpha": ldf, "beta": rdf, "gamma": tdf}).collect()

    # per-base truth: combo at each covered position, then maximal runs
    covs = {n: _covered(rows) for n, rows in sets.items()}
    want = []
    for c in CONTIGS:
        combo = {}
        for p in range(1, AXIS + 300):
            names = sorted(n for n in sets if p in covs[n].get(c, ()))
            if names:
                combo[p] = ",".join(names)
        # runs of constant combo
        run_start = None
        prev = None
        for p in sorted(combo) + [10**9]:
            if run_start is None or p != prev + 1 or combo.get(p) != combo[prev]:
                if run_start is not None:
                    want.append(
                        (c, run_start, prev, len(combo[prev].split(",")),
                         combo[prev]))
                run_start = p if p != 10**9 else None
            prev = p
    got = sorted(
        (r["contig"], r["start"], r["stop"], r["n_sets"], r["set_list"])
        for r in res
    )
    assert got == sorted(want)


def test_cluster_matches_merge_membership(spark, frames):
    from hadoop_bam_spark.operators.interval_join import interval_cluster

    left, _, ldf, _ = frames
    res = interval_cluster(ldf).collect()
    assert len(res) == len(left)
    # truth: intervals in the same per-base merged run share a cluster
    runs = {c: _runs(pos) for c, pos in _covered(left).items()}

    def run_of(c, s):
        for i, (rs, re) in enumerate(runs[c]):
            if rs <= s <= re:
                return i
        raise AssertionError

    by_run, by_cid = {}, {}
    for r in res:
        k_run = (r["contig"], run_of(r["contig"], r["start"]))
        k_cid = (r["contig"], r["cluster_id"])
        # bijection between merge-run membership and cluster ids
        assert by_run.setdefault(k_run, k_cid) == k_cid
        assert by_cid.setdefault(k_cid, k_run) == k_run


def test_complement_clamps_to_declared_sizes(spark):
    """sizes is the universe: undeclared contigs are ignored, intervals
    past the declared size clamp to it, and no gap can name a position
    beyond the contig."""
    from hadoop_bam_spark.operators.interval_join import interval_complement

    ldf = spark.createDataFrame(
        [("c1", 1200, 1300, "past_end"),      # fully beyond size -> ignored
         ("c1", 100, 200, "in"),
         ("c1", 950, 1100, "straddles"),      # clamps to 1000
         ("cX", 10, 20, "undeclared")],       # contig not in sizes
        "contig string, start long, stop long, name string",
    )
    sizes = spark.createDataFrame([("c1", 1000)], "contig string, size long")
    got = sorted(
        (r["contig"], r["start"], r["stop"])
        for r in interval_complement(ldf, sizes).collect()
    )
    assert got == [("c1", 1, 99), ("c1", 201, 949)]


def test_genome_sizes_reads_chrom_sizes_and_fai(spark, tmp_path):
    from hadoop_bam_spark.operators.interval_join import (
        genome_sizes,
        interval_complement,
    )

    cs = tmp_path / "hg.chrom.sizes"
    cs.write_text("# comment\nchr1\t1000\nchr2\t500\n")
    fai = tmp_path / "ref.fa.fai"
    fai.write_text("chr1\t1000\t6\t70\t71\nchr2\t500\t1025\t70\t71\n")
    want = [("chr1", 1000), ("chr2", 500)]
    for p in (cs, fai):
        got = sorted(tuple(r) for r in genome_sizes(spark, str(p)).collect())
        assert got == want

    bad = tmp_path / "bad.genome"
    bad.write_text("chr1\tlots\n")
    with pytest.raises(ValueError, match="non-integer"):
        genome_sizes(spark, str(bad))

    # end-to-end with complement
    ldf = spark.createDataFrame(
        [("chr1", 100, 900, "a")],
        "contig string, start long, stop long, name string")
    gaps = sorted(
        (r["contig"], r["start"], r["stop"])
        for r in interval_complement(ldf, genome_sizes(spark, str(cs))).collect()
    )
    assert gaps == [("chr1", 1, 99), ("chr1", 901, 1000), ("chr2", 1, 500)]


def test_coverage_keeps_null_coordinate_rows(spark):
    """A left row with a NULL coordinate must still appear (zero
    coverage), per the documented 'returns the left rows' contract."""
    from hadoop_bam_spark.operators.interval_join import interval_coverage

    ldf = spark.createDataFrame(
        [("c", 10, 20, "ok"), ("c", None, 500, "null_start")],
        "contig string, start long, stop long, name string",
    )
    rdf = spark.createDataFrame(
        [("c", 5, 15, "r")], "contig string, start long, stop long, name string")
    rows = {r["name"]: r for r in interval_coverage(ldf, rdf).collect()}
    assert set(rows) == {"ok", "null_start"}
    assert rows["ok"]["covered_bases"] == 6
    assert rows["null_start"]["n_overlaps"] == 0
    assert rows["null_start"]["covered_bases"] == 0


def test_genome_sizes_rejects_duplicate_contig(spark, tmp_path):
    from hadoop_bam_spark.operators.interval_join import genome_sizes

    p = tmp_path / "dup.genome"
    p.write_text("chr1\t1000\nchr1\t1000\n")
    with pytest.raises(ValueError, match="duplicate contig"):
        genome_sizes(spark, str(p))


@pytest.mark.parametrize("stranded", [False, True])
def test_slop_and_flank_brute(spark, frames, stranded):
    from hadoop_bam_spark.operators.interval_join import (
        interval_flank,
        interval_slop,
    )

    from pyspark.sql import functions as F

    left, _, ldf, _ = frames
    rng = random.Random(5)
    strands = {name: rng.choice("+-") for _, _, _, name in left}
    ldf2 = ldf.withColumn(
        "strand",
        F.when(F.col("name").isin([n for n, st in strands.items() if st == "-"]), "-")
        .otherwise("+"),
    ) if stranded else ldf
    SIZE = AXIS + 50
    sizes = spark.createDataFrame([(c, SIZE) for c in CONTIGS],
                                  "contig string, size long")
    L, R = 30, 70
    kw = {"strand_col": "strand"} if stranded else {}
    slop = {
        r["name"]: (r["start"], r["stop"])
        for r in interval_slop(ldf2, sizes, left=L, right=R, **kw).collect()
    }
    flank = {}
    for r in interval_flank(ldf2, sizes, left=L, right=R, **kw).collect():
        flank.setdefault(r["name"], []).append(
            (r["flank_side"], r["start"], r["stop"]))
    for c, s, e, name in left:
        lo, hi = (L, R)
        if stranded and strands[name] == "-":
            lo, hi = R, L
        assert slop[name] == (max(s - lo, 1), min(e + hi, SIZE)), name
        want = []
        if s > 1:
            want.append(("upstream", max(s - lo, 1), s - 1))
        if e < SIZE and hi > 0:
            want.append(("downstream", e + 1, min(e + hi, SIZE)))
        # zero-length upstream flank when lo == 0
        want = [(w, a, b) for (w, a, b) in want if a <= b]
        assert sorted(flank.get(name, [])) == sorted(want), name


# ---------------------------------------------------------------------------
# r14: two-phase range-partitioned merge/cluster (the per-contig window
# ceiling removal). Small chunk_size forces many chunks per contig so the
# stitch map (chunk-boundary-crossing regions, whole-chunk absorption,
# origin propagation across several chunks) is exercised hard.
# ---------------------------------------------------------------------------


def _brute_merge(rows, gap=0):
    """contig -> {(start, stop): n_merged} by direct sequential sweep."""
    per_c = {}
    for c, s, e, *_ in rows:
        per_c.setdefault(c, []).append((s, e))
    out = {}
    for c, iv in per_c.items():
        iv.sort()
        cur_s, cur_e, n = iv[0][0], iv[0][1], 1
        for s, e in iv[1:]:
            if s <= cur_e + 1 + gap:
                cur_e = max(cur_e, e)
                n += 1
            else:
                out[(c, cur_s, cur_e)] = n
                cur_s, cur_e, n = s, e, 1
        out[(c, cur_s, cur_e)] = n
    return out


def _adversarial_rows(rng, n):
    rows = []
    for i in range(n):
        c = rng.choice(CONTIGS)
        s = rng.randint(1, AXIS)
        # long tails: some intervals span many 64-wide chunks
        e = s + (rng.randint(0, 30) if i % 3 else rng.randint(0, 900))
        rows.append((c, s, e, f"x{i}"))
    rows += [
        ("c1", 1, AXIS, "whole_axis"),      # one region swallowing everything
        ("c2", 63, 64, "bk_lo"),            # book-ended across a 64-chunk edge
        ("c2", 65, 66, "bk_hi"),
        ("c3", 128, 128, "pt"),             # single-base at a boundary
        ("c3", 129, 129, "pt2"),
        ("c1", 10, 20, "dup"),
        ("c1", 10, 20, "dup2"),             # exact duplicates
    ]
    return rows


@pytest.mark.parametrize(
    "chunk_size,gap", [(64, 0), (64, 5), (256, 0), (257, 3), (1, 0), (1, 4)]
)
def test_merge_two_phase_chunked_matches_brute(spark, chunk_size, gap):
    rows = _adversarial_rows(random.Random(77), 300)
    df = spark.createDataFrame(
        rows, "contig string, start long, stop long, name string"
    )
    got = {
        (r["contig"], r["start"], r["stop"]): r["n_merged"]
        for r in interval_merge(df, gap=gap, chunk_size=chunk_size).collect()
    }
    assert got == _brute_merge(rows, gap=gap)


@pytest.mark.parametrize("chunk_size", [64, 4096])
def test_cluster_two_phase_exact_ordinals(spark, chunk_size):
    """cluster_id must be the EXACT per-contig region ordinal (1-based, in
    region start order) — stronger than the membership-only gate oracle."""
    from hadoop_bam_spark.operators.interval_join import interval_cluster

    rows = _adversarial_rows(random.Random(88), 200)
    df = spark.createDataFrame(
        rows, "contig string, start long, stop long, name string"
    )
    regions = {}  # contig -> sorted [(start, stop)]
    for (c, s, e) in _brute_merge(rows):
        regions.setdefault(c, []).append((s, e))
    want = {}
    for c, rs in regions.items():
        for i, (s, e) in enumerate(sorted(rs), 1):
            want[(c, s, e)] = i
    got = interval_cluster(df, chunk_size=chunk_size).collect()
    assert len(got) == len(rows)
    assert set(got[0].asDict()) == {"contig", "start", "stop", "name", "cluster_id"}
    for r in got:
        region_id = next(
            i for (c, s, e), i in want.items()
            if c == r["contig"] and s <= r["start"] and r["stop"] <= e
        )
        assert r["cluster_id"] == region_id, r


def test_merge_chunk_absorbs_entire_chunks(spark):
    """A region spanning whole chunks absorbs every run inside them, and the
    origin propagates across chunks whose runs were ALL absorbed."""
    rows = [
        ("c1", 5, 10, "origin"),
        ("c1", 20, 2000, "long_reach"),   # spans chunks 0..31 at size 64
        ("c1", 100, 110, "inner1"),       # chunk 1, fully absorbed
        ("c1", 700, 710, "inner2"),       # chunk 10, fully absorbed
        ("c1", 2001, 2005, "bookend"),    # book-ends the long reach
        ("c1", 2100, 2110, "separate"),
    ]
    df = spark.createDataFrame(
        rows, "contig string, start long, stop long, name string"
    )
    got = sorted(
        (r["start"], r["stop"], r["n_merged"])
        for r in interval_merge(df, chunk_size=64).collect()
    )
    assert got == [(5, 10, 1), (20, 2005, 4), (2100, 2110, 1)]


def test_binned_rejects_unknown_mode(spark, frames):
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    _, _, ldf, rdf = frames
    with pytest.raises(ValueError, match="unsupported"):
        interval_join_binned(ldf, rdf, how="full")


@pytest.mark.parametrize("bin_size", [16384, 64])
def test_binned_left_outer_is_sql_strict(spark, bin_size):
    """how='left_outer' must match SQL left-outer exactly: one
    null-extended row per unmatched LEFT COPY (duplicates included),
    zero null rows for lefts that match anywhere — the contract the
    loose mode deliberately relaxes (ADVICE r13)."""
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    rng = random.Random(42)
    left = [
        (rng.choice(CONTIGS), s := rng.randint(1, 800), s + rng.randint(0, 200))
        for _ in range(60)
    ]
    left += left[:5]  # duplicate left rows keep their copies, like SQL
    right = [
        (rng.choice(CONTIGS), s := rng.randint(1, 800), s + rng.randint(0, 80))
        for _ in range(40)
    ]
    ldf = spark.createDataFrame(left, "contig string, start long, stop long")
    rdf = spark.createDataFrame(
        right, "rc string, rs long, re long"
    )
    got = sorted(
        (r["contig"], r["start"], r["stop"], r["rc"], r["rs"], r["re"])
        for r in interval_join_binned(
            ldf, rdf, right_keys=("rc", "rs", "re"),
            bin_size=bin_size, how="left_outer",
        ).collect()
    )
    want = []
    for c, s, e in left:
        matches = [
            (rc, rs, re) for rc, rs, re in right
            if rc == c and s <= re and rs <= e
        ]
        if matches:
            want.extend((c, s, e, *m) for m in matches)
        else:
            want.append((c, s, e, None, None, None))
    assert got == sorted(want)
    # loose mode on the same data: same matched pairs, possibly extra
    # null rows — but never a MISSING left tuple
    loose = interval_join_binned(
        ldf, rdf, right_keys=("rc", "rs", "re"),
        bin_size=bin_size, how="left_outer_loose",
    ).collect()
    matched_loose = sorted(
        (r["contig"], r["start"], r["stop"], r["rc"], r["rs"], r["re"])
        for r in loose if r["rc"] is not None
    )
    assert matched_loose == sorted(w for w in want if w[3] is not None)
    assert {(r["contig"], r["start"], r["stop"]) for r in loose} == {
        (c, s, e) for c, s, e in left
    }


def test_liftover_rejects_unset_strand_on_stranded_chain(spark):
    """A chain frame carrying dst_strand (what read_chain returns) must not
    be silently lifted with plus-strand arithmetic (ADVICE r13)."""
    from hadoop_bam_spark.operators.interval_join import interval_liftover

    chain = spark.createDataFrame(
        [("c1", 1, 100, "d1", 500, "-", 1, 0)],
        "src_contig string, src_start long, src_stop long, dst_contig string,"
        " dst_start long, dst_strand string, chain_id long, score long",
    )
    ivs = spark.createDataFrame([("c1", 10, 20)], "contig string, start long, stop long")
    with pytest.raises(ValueError, match="dst_strand"):
        interval_liftover(ivs, chain)
    # explicit opt-in works; dropping the column asserts plus-only
    assert interval_liftover(ivs, chain, strand_col="dst_strand").count() == 1
    assert interval_liftover(ivs, chain.drop("dst_strand")).count() == 1


@pytest.mark.parametrize("chunk_size", [64, 256])
def test_closest_chunked_matches_all_pairs(spark, frames, chunk_size):
    """interval_closest with forced multi-chunk scans (the chunked prefix
    machinery of operators/sweep.py) must match the all-pairs truth."""
    from hadoop_bam_spark.operators.interval_join import interval_closest

    left, right, ldf, rdf = frames
    by_c = {}
    for c, s, e, *_ in right:
        by_c.setdefault(c, []).append((s, e))
    want = {}
    for c, s, e, name in left:
        ds = [
            0 if (s <= re and rs <= e) else (rs - e if rs > e else s - re)
            for rs, re in by_c.get(c, [])
        ]
        want[name] = min(ds) if ds else None
    got = {
        r["name"]: r["closest_dist"]
        for r in interval_closest(ldf, rdf, chunk_size=chunk_size).collect()
    }
    assert got == want


@pytest.mark.parametrize("chunk_size", [64, 256])
def test_multiinter_chunked_matches_per_base(spark, frames, chunk_size):
    """interval_multiinter with forced multi-chunk scans: reconstruct the
    per-base covering-combination truth from the segments."""
    from hadoop_bam_spark.operators.interval_join import interval_multiinter

    left, right, ldf, rdf = frames
    segs = interval_multiinter(
        {"L": ldf, "R": rdf}, chunk_size=chunk_size
    ).collect()
    got = {}
    for r in segs:
        for p in range(r["start"], r["stop"] + 1):
            key = (r["contig"], p)
            assert key not in got, f"overlapping segments at {key}"
            got[key] = r["set_list"]
    cov_l, cov_r = _covered(left), _covered(right)
    want = {}
    for c in set(cov_l) | set(cov_r):
        for p in cov_l.get(c, set()) | cov_r.get(c, set()):
            names = [n for n, cv in (("L", cov_l), ("R", cov_r)) if p in cv.get(c, set())]
            want[(c, p)] = ",".join(names)
    assert got == want


@pytest.mark.parametrize("bin_size", [16384, 64])
def test_map_matches_all_pairs(spark, frames, bin_size):
    """interval_map (bedtools map) vs direct all-pairs aggregation,
    including zero-match lefts (NULL aggregates, count 0) and the
    loose-join null rows the aggregates must ignore."""
    from hadoop_bam_spark.operators.interval_join import interval_map

    left, right, ldf, _ = frames
    vals = [(c, s, e, (s * 7 + e) % 101) for c, s, e, _ in right]
    rdf = spark.createDataFrame(vals, "rc string, rs long, re long, v long")
    got = {
        r["name"]: (r["n"], r["sv"], r["mx"], r["vs"])
        for r in interval_map(
            ldf, rdf,
            specs=[("v", "count", "n"), ("v", "sum", "sv"),
                   ("v", "max", "mx"), ("v", "collect", "vs")],
            right_keys=("rc", "rs", "re"), bin_size=bin_size,
        ).collect()
    }
    assert len(got) == len(left)
    for c, s, e, name in left:
        ov = sorted(v for rc, rs, re, v in vals if rc == c and s <= re and rs <= e)
        want = (len(ov), sum(ov) if ov else None, max(ov) if ov else None, ov)
        assert got[name] == want, (name, got[name], want)


def test_map_rejects_unknown_op(spark, frames):
    from hadoop_bam_spark.operators.interval_join import interval_map

    _, _, ldf, rdf = frames
    with pytest.raises(ValueError, match="unsupported interval_map op"):
        interval_map(ldf, rdf, specs=[("start", "median", "x")])


def test_merge_hypothesis_randomized(spark):
    """Property sweep of the two-phase merge: random interval sets, gaps
    and chunk sizes (including the 1-base degenerate where the stitch
    map does all the merging) must equal the sequential sweep. Batched:
    every scenario gets its own contig namespace so ONE Spark job per
    (gap, chunk_size) checks many scenarios at once."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    scenario = st.lists(
        st.tuples(st.integers(1, 400), st.integers(0, 120)),
        min_size=1, max_size=25,
    )
    batches = st.lists(scenario, min_size=1, max_size=12)

    @given(
        batches,
        st.integers(0, 6),
        st.sampled_from([1, 2, 7, 64, 4096]),
    )
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def run(batch, gap, chunk_size):
        rows = [
            (f"s{i}", s, s + ln, f"s{i}_{j}")
            for i, sc in enumerate(batch)
            for j, (s, ln) in enumerate(sc)
        ]
        df = spark.createDataFrame(
            rows, "contig string, start long, stop long, name string"
        )
        got = {
            (r["contig"], r["start"], r["stop"]): r["n_merged"]
            for r in interval_merge(df, gap=gap, chunk_size=chunk_size).collect()
        }
        assert got == _brute_merge(rows, gap=gap)

    run()


def test_makewindows_tiling_brute(spark):
    from hadoop_bam_spark.operators.interval_join import genome_makewindows

    sizes = spark.createDataFrame(
        [("c1", 100), ("c2", 7), ("c3", 30), ("empty", 0)],
        "contig string, size long",
    )
    for w, st in ((10, None), (10, 7), (7, 10), (1, 1)):
        got = sorted(
            (r["contig"], r["start"], r["stop"], r["window_id"])
            for r in genome_makewindows(sizes, w, step=st).collect()
        )
        want = []
        step = st or w
        for c, size in (("c1", 100), ("c2", 7), ("c3", 30)):
            i = 0
            while i * step < size:
                want.append((c, i * step + 1, min(i * step + w, size), i))
                i += 1
        assert got == sorted(want), (w, st)
    with pytest.raises(ValueError):
        genome_makewindows(sizes, 0)
    with pytest.raises(ValueError):
        genome_makewindows(sizes, 5, step=-1)


@pytest.mark.parametrize("bin_size", [16384, 64])
def test_window_proximity_brute(spark, frames, bin_size):
    from hadoop_bam_spark.operators.interval_join import interval_window

    left, right, ldf, rdf = frames
    got = {}
    res = interval_window(
        ldf, rdf.selectExpr("contig AS rc", "start AS rs", "stop AS re"),
        before=30, after=70, right_keys=("rc", "rs", "re"),
        bin_size=bin_size,
    ).collect()
    for r in res:
        got.setdefault(r["name"], []).append((r["rs"], r["re"]))
    for c, s, e, name in left:
        want = sorted(
            (rs, re) for rc, rs, re, _ in right
            if rc == c and s - 30 <= re and rs <= e + 70
        )
        assert sorted(got.get(name, [])) == want, name


@pytest.mark.parametrize("chunk_size", [None, 64])
def test_reldist_matches_brute(spark, frames, chunk_size):
    from hadoop_bam_spark.operators.interval_join import interval_reldist

    import math

    left, right, ldf, rdf = frames
    got = {
        r["reldist"]: (r["count"], r["fraction"])
        for r in interval_reldist(ldf, rdf, chunk_size=chunk_size).collect()
    }
    r_mid = {}
    for c, s, e, _ in right:
        r_mid.setdefault(c, []).append((s - 1 + e) // 2)
    rels = []
    for c, s, e, _ in left:
        m = (s - 1 + e) // 2
        # bedtools semantics: the preceding flank may BE the midpoint
        # (coincidence -> reldist 0), the following flank is strictly
        # beyond it
        prevs = [x for x in r_mid.get(c, []) if x <= m]
        nexts = [x for x in r_mid.get(c, []) if x > m]
        if not prevs or not nexts:
            continue
        p, n = max(prevs), min(nexts)
        rels.append(math.floor(min(m - p, n - m) / (n - p) * 100) / 100)
    want = {}
    for v in rels:
        want[v] = want.get(v, 0) + 1
    assert {k: c for k, (c, _) in got.items()} == want
    for k, (cnt, frac) in got.items():
        assert frac == pytest.approx(cnt / len(rels))


def test_reldist_coincident_midpoint_is_zero(spark):
    """A left midpoint exactly on a right midpoint reports reldist 0.00
    (bedtools parity — the colocalization extreme), instead of being
    dropped; one with no STRICTLY following right flank is dropped."""
    from hadoop_bam_spark.operators.interval_join import interval_reldist

    # right midpoints at 100 and 500; left midpoints at 100 (coincident,
    # kept as 0.0), 300 (plain interior), 500 (coincident with the LAST
    # right -> no strict following flank -> dropped)
    rdf = spark.createDataFrame(
        [("c1", 91, 110), ("c1", 491, 510)],
        "contig string, start long, stop long",
    )
    ldf = spark.createDataFrame(
        [("c1", 95, 106), ("c1", 295, 306), ("c1", 495, 506)],
        "contig string, start long, stop long",
    )
    got = {
        r["reldist"]: r["count"]
        for r in interval_reldist(ldf, rdf).collect()
    }
    # mid 300: min(200, 200) / 400 = 0.5
    assert got == {0.0: 1, 0.5: 1}


@pytest.mark.parametrize("bin_size", [16384, 16])
def test_getfasta_stitches_chunks(spark, tmp_path, bin_size):
    """interval_getfasta vs direct string slicing — small bin_size forces
    intervals to span many FASTA chunk rows, exercising the stitch; a
    40-char line width makes chunk boundaries land mid-interval."""
    from hadoop_bam_spark.operators.interval_join import interval_getfasta
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    rng = random.Random(7)
    seqs = {
        f"c{i}": "".join(rng.choice("ACGTN") for _ in range(500))
        for i in range(3)
    }
    p = tmp_path / "t.fa"
    with open(p, "w") as fh:
        for name, seq in seqs.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 40):
                fh.write(seq[i:i + 40] + "\n")
    fasta = spark.read.format("fasta").load(str(p))
    ivs = [
        (f"c{rng.randrange(3)}", s := rng.randint(1, 480),
         min(s + rng.randint(0, 200), 500), i)
        for i in range(40)
    ] + [("c0", 1, 500, 100), ("c1", 490, 520, 101), ("off_contig", 5, 9, 102)]
    idf = spark.createDataFrame(
        ivs, "contig string, start long, stop long, uid long"
    )
    got = {
        r["uid"]: r["seq"]
        for r in interval_getfasta(idf, fasta, bin_size=bin_size).collect()
    }
    for c, s, e, uid in ivs:
        if c not in seqs:
            assert uid not in got  # off-contig rows drop, like bedtools
            continue
        assert got[uid] == seqs[c][s - 1:e], uid  # clipped at contig end


@pytest.mark.parametrize("chunk_size", [None, 64])
def test_closest_report_right_matches_brute(spark, frames, chunk_size):
    """report_right=True returns the winning B interval under the
    documented tie rules: overlap -> (max stop, max start); flanks ->
    nearer one, upstream on a distance tie, with (max stop, max start)
    upstream / (min start, min stop) downstream candidate ties."""
    from hadoop_bam_spark.operators.interval_join import interval_closest

    left, right, ldf, rdf = frames
    got = {
        r["name"]: (r["closest_dist"], r["closest_start"], r["closest_stop"])
        for r in interval_closest(
            ldf, rdf.select("contig", "start", "stop"),
            chunk_size=chunk_size, report_right=True,
        ).collect()
    }
    by_c = {}
    for rc, rs, re, _ in right:
        by_c.setdefault(rc, []).append((rs, re))
    for lc, ls, le, name in left:
        rights = by_c.get(lc, [])
        dist, cs, ce = got[name]
        if not rights:
            assert (dist, cs, ce) == (None, None, None), name
            continue
        ov = [(re, rs) for rs, re in rights if rs <= le and re >= ls]
        if ov:
            k, o = max(ov)
            assert (dist, cs, ce) == (0, o, k), name
            continue
        prevs = [(re, rs) for rs, re in rights if re <= ls]
        nexts = [(rs, re) for rs, re in rights if rs >= le]
        d_prev = ls - max(prevs)[0] if prevs else None
        d_next = min(nexts)[0] - le if nexts else None
        want_d = min(x for x in (d_prev, d_next) if x is not None)
        assert dist == want_d, name
        if d_prev is not None and (d_next is None or d_prev <= d_next):
            k, o = max(prevs)
            assert (cs, ce) == (o, k), name
        else:
            k, o = min(nexts)
            assert (cs, ce) == (k, o), name
    # default form unchanged: no report columns
    cols = interval_closest(ldf, rdf.select("contig", "start", "stop")).columns
    assert "closest_start" not in cols


@pytest.mark.parametrize("fl,fr,either", [
    (0.5, None, False),   # bedtools -f 0.5
    (None, 0.9, False),   # bedtools -F 0.9
    (0.5, 0.5, False),    # bedtools -r -f 0.5
    (0.6, 0.6, True),     # bedtools -e -f 0.6 -F 0.6
])
def test_binned_join_overlap_fraction_brute(spark, frames, fl, fr, either):
    """bedtools intersect -f/-F/-e/-r: the fraction predicate is part of
    the match definition, checked against all-pairs brute force in both
    inner and strict-left-outer modes."""
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    left, right, ldf, rdf = frames
    r2 = rdf.selectExpr("contig AS rc", "start AS rs", "stop AS re",
                        "name AS rname")

    def qualifies(ls, le, rs, re):
        if ls > re or rs > le:
            return False
        ov = min(le, re) - max(ls, rs) + 1
        checks = []
        if fl is not None:
            checks.append(ov >= fl * (le - ls + 1))
        if fr is not None:
            checks.append(ov >= fr * (re - rs + 1))
        return any(checks) if either else all(checks)

    want_pairs = {
        (ln, rn)
        for lc, ls, le, ln in left
        for rc, rs, re, rn in right
        if lc == rc and qualifies(ls, le, rs, re)
    }
    got_inner = interval_join_binned(
        ldf, r2, right_keys=("rc", "rs", "re"), bin_size=256,
        min_frac_left=fl, min_frac_right=fr, frac_either=either,
    ).select("name", "rname").collect()
    assert {(r["name"], r["rname"]) for r in got_inner} == want_pairs
    # strict left_outer: null-extended iff no QUALIFYING match anywhere
    got_outer = interval_join_binned(
        ldf, r2, right_keys=("rc", "rs", "re"), bin_size=256,
        how="left_outer",
        min_frac_left=fl, min_frac_right=fr, frac_either=either,
    ).select("name", "rname").collect()
    matched = {ln for ln, _ in want_pairs}
    want_outer = want_pairs | {
        (ln, None) for _, _, _, ln in left if ln not in matched
    }
    assert {(r["name"], r["rname"]) for r in got_outer} == want_outer


def test_binned_join_rejects_bad_fraction(spark, frames):
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    _, _, ldf, rdf = frames
    with pytest.raises(ValueError, match="min_frac_left"):
        interval_join_binned(ldf, rdf, min_frac_left=0.0)
    with pytest.raises(ValueError, match="min_frac_right"):
        interval_join_binned(ldf, rdf, min_frac_right=1.5)


def test_getfasta_rejects_duplicate_interval_tuples(spark, tmp_path):
    """r14 VERDICT #5: duplicated interval tuples used to silently
    collapse through the regroup (fewer output rows than inputs, no
    error) — now the stitch walk raises on them."""
    from hadoop_bam_spark.operators.interval_join import interval_getfasta
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    p = tmp_path / "d.fa"
    with open(p, "w") as fh:
        fh.write(">c1\n" + "ACGTACGTAC\nGTACGTACGT\n")
    fasta = spark.read.format("fasta").load(str(p))
    dup = spark.createDataFrame(
        [("c1", 2, 9), ("c1", 2, 9), ("c1", 11, 15)],
        "contig string, start long, stop long",
    )
    with pytest.raises(Exception, match="duplicate interval tuples"):
        interval_getfasta(dup, fasta).collect()
    # distinguishing id column: same coordinates, no longer duplicates
    tagged = spark.createDataFrame(
        [("c1", 2, 9, "a"), ("c1", 2, 9, "b"), ("c1", 11, 15, "c")],
        "contig string, start long, stop long, uid string",
    )
    got = {r["uid"]: r["seq"] for r in interval_getfasta(tagged, fasta).collect()}
    assert got == {"a": "CGTACGTA", "b": "CGTACGTA", "c": "GTACG"}


def test_shuffle_deterministic_and_bounded(spark):
    from hadoop_bam_spark.operators.interval_join import interval_shuffle

    rows = [("c1", 10, 59, "a"), ("c1", 10, 59, "a2"), ("c2", 1, 100, "b"),
            ("c2", 50, 320, "too_long"), ("gone", 1, 5, "no_contig")]
    df = spark.createDataFrame(
        rows, "contig string, start long, stop long, name string")
    sizes = spark.createDataFrame(
        [("c1", 200), ("c2", 250)], "contig string, size long")
    got = {r["name"]: (r["contig"], r["start"], r["stop"])
           for r in interval_shuffle(df, sizes, id_col="name").collect()}
    # dropped: longer than contig, absent contig
    assert set(got) == {"a", "a2", "b"}
    for c, s, e, name in rows:
        if name not in got:
            continue
        nc, ns, ne = got[name]
        assert nc == c                     # -chrom: same contig
        assert ne - ns == e - s            # length preserved
        size = 200 if c == "c1" else 250
        assert 1 <= ns and ne <= size      # inside the contig
    # distinct ids land at distinct draws (with these salts/inputs)
    assert got["a"] != got["a2"]
    # reproducible: second run identical
    again = {r["name"]: (r["contig"], r["start"], r["stop"])
             for r in interval_shuffle(df, sizes, id_col="name").collect()}
    assert again == got


def test_shuffle_genome_wide_matches_brute(spark):
    """keep_contig=False: the genome-wide draw is uniform over valid
    placements — replay the identical md5 walk in Python."""
    import hashlib

    from hadoop_bam_spark.operators.interval_join import interval_shuffle

    rows = [
        ("c1", 10, 59, "a"),
        ("c2", 1, 100, "b"),
        ("c3", 2, 221, "fits_only_c2"),   # len 220 > c1(200), > c3(50)
        ("c1", 1, 300, "fits_nowhere"),   # len 300 > every contig
        ("gone", 5, 14, "src_contig_gone"),  # source contig irrelevant
    ]
    df = spark.createDataFrame(
        rows, "contig string, start long, stop long, name string")
    contigs = [("c1", 200), ("c2", 250), ("c3", 50)]
    sizes = spark.createDataFrame(contigs, "contig string, size long")
    got = {r["name"]: (r["contig"], r["start"], r["stop"])
           for r in interval_shuffle(
               df, sizes, id_col="name", keep_contig=False).collect()}

    def brute(name, ln):
        rooms = [(c, max(0, sz - ln + 1)) for c, sz in sorted(contigs)]
        total = sum(r for _, r in rooms)
        if total == 0:
            return None
        r = int(hashlib.md5(f"ivshuffle:{name}".encode()).hexdigest()[:15],
                16) % total
        for c, room in rooms:
            if r < room:
                return (c, r + 1, r + ln)
            r -= room
        raise AssertionError

    want = {}
    for c, s, e, name in rows:
        placed = brute(name, e - s + 1)
        if placed is not None:
            want[name] = placed
    assert got == want
    assert "fits_nowhere" not in got
    # the 220-base row can only land on c2 (the one contig with room)
    assert got["fits_only_c2"][0] == "c2"


def test_random_generator_deterministic_and_uniform(spark):
    """bedtools random analog: deterministic per salt, length-exact,
    in-bounds, spread across contigs weighted by room."""
    from hadoop_bam_spark.operators.interval_join import interval_random

    sizes = spark.createDataFrame(
        [("c1", 1000), ("c2", 500)], "contig string, size long"
    )
    a = sorted(map(tuple, interval_random(sizes, 300, 50).collect()))
    b = sorted(map(tuple, interval_random(sizes, 300, 50).collect()))
    assert a == b and len(a) == 300
    by_size = dict(sizes.collect())
    from collections import Counter
    per_contig = Counter()
    for _id, c, s, e in a:
        assert e - s + 1 == 50
        assert 1 <= s and e <= by_size[c]
        per_contig[c] += 1
    # rooms 951 vs 451 -> roughly 2:1 split
    assert per_contig["c1"] > per_contig["c2"] > 30
    # a different salt moves placements
    c2 = sorted(map(tuple, interval_random(sizes, 300, 50, salt="x").collect()))
    assert c2 != a
    # longer than every contig -> empty, not an error
    assert interval_random(sizes, 10, 2000).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        interval_random(sizes, -1, 50)
    with _pytest.raises(ValueError):
        interval_random(sizes, 10, 0)


@pytest.fixture(scope="module")
def stranded_frames(spark):
    rng = random.Random(20260817)
    strands = ["+", "-", "+", "-", "."]  # '.' exercises the unstranded rules
    left = [(c, s, e, rng.choice(strands), n)
            for c, s, e, n in _mk(rng, 100, "L")]
    right = [(c, s, e, rng.choice(strands), n)
             for c, s, e, n in _mk(rng, 70, "R")]
    sch = "contig string, start long, stop long, strand string, name string"
    return left, right, spark.createDataFrame(left, sch), spark.createDataFrame(right, sch)


def _strand_cands(right, mode, lstrand):
    """Brute candidate set under the documented strand rules: literal
    equality for 'same' (incl. '.'=='.'), flipped +/- for 'opposite'
    (rights outside {+,-} never match)."""
    flip = {"+": "-", "-": "+"}
    out = []
    for c, s, e, rstrand, _ in right:
        if mode == "same":
            if rstrand != lstrand:
                continue
        else:
            if flip.get(rstrand) != lstrand:
                continue
        out.append((c, s, e))
    return out


@pytest.mark.parametrize("mode", ["same", "opposite"])
@pytest.mark.parametrize("chunk_size", [None, 97])
def test_closest_stranded_matches_all_pairs(spark, stranded_frames, mode,
                                            chunk_size):
    """bedtools closest -s / -S (with -D ref signing) vs all-pairs."""
    left, right, ldf, rdf = stranded_frames
    res = interval_closest(
        ldf, rdf.drop("name"), keys=("contig", "start", "stop"),
        strand=mode, signed=True, chunk_size=chunk_size,
    )
    got = {r["name"]: r["closest_dist"] for r in res.collect()}
    assert len(got) == len(left)
    for lc, ls, le, lstrand, name in left:
        cands = [(s, e) for c, s, e in _strand_cands(right, mode, lstrand)
                 if c == lc]
        if not cands:
            assert got[name] is None, name
            continue
        if any(rs <= le and ls <= re_ for rs, re_ in cands):
            assert got[name] == 0, name
            continue
        prev = [ls - re_ for rs, re_ in cands if re_ <= ls]
        nxt = [rs - le for rs, re_ in cands if rs >= le]
        d_prev = min(prev) if prev else None
        d_next = min(nxt) if nxt else None
        if d_next is None or (d_prev is not None and d_prev <= d_next):
            assert got[name] == -d_prev, name
        else:
            assert got[name] == d_next, name


@pytest.mark.parametrize("mode", ["same", "opposite"])
def test_closest_all_stranded_matches_all_pairs(spark, stranded_frames, mode):
    """-t all composed with -s / -S: tie expansion respects the strand
    restriction in all three parts (overlap tile join, both flanks)."""
    from hadoop_bam_spark.operators.interval_join import interval_closest_all

    left, right, ldf, rdf = stranded_frames
    res = interval_closest_all(
        ldf, rdf.drop("name"), keys=("contig", "start", "stop"), strand=mode,
    )
    got = {}
    for r in res.collect():
        got.setdefault(r["name"], set()).add(
            (r["closest_dist"], r["closest_start"], r["closest_stop"])
        )
    for lc, ls, le, lstrand, name in left:
        cands = [(s, e) for c, s, e in _strand_cands(right, mode, lstrand)
                 if c == lc]
        overl = [(rs, re_) for rs, re_ in cands if rs <= le and ls <= re_]
        if overl:
            want = {(0, rs, re_) for rs, re_ in overl}
        else:
            prev = [(ls - re_, rs, re_) for rs, re_ in cands if re_ <= ls]
            nxt = [(rs - le, rs, re_) for rs, re_ in cands if rs >= le]
            dists = [p[0] for p in prev] + [p[0] for p in nxt]
            if not dists:
                want = {(None, None, None)}
            else:
                dmin = min(dists)
                want = {(dmin, rs, re_) for dd, rs, re_ in prev if dd == dmin}
                want |= {(dmin, rs, re_) for dd, rs, re_ in nxt if dd == dmin}
        assert got[name] == want, (name, got[name], want)


def test_closest_strand_rejects_bad_mode(spark, stranded_frames):
    _, _, ldf, rdf = stranded_frames
    with pytest.raises(ValueError):
        interval_closest(ldf, rdf.drop("name"), strand="both")


@pytest.mark.parametrize("mode", ["same", "opposite"])
@pytest.mark.parametrize("how,bin_size", [("inner", 16384), ("inner", 256),
                                          ("left_outer", 16384)])
def test_binned_join_stranded_matches_all_pairs(spark, stranded_frames,
                                                mode, how, bin_size):
    """bedtools intersect -s / -S: the strand restriction is part of the
    binned join's match definition (outer modes null-extend a left row
    whose every overlap is on the wrong strand)."""
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    left, right, ldf, rdf = stranded_frames
    rr = (rdf.drop("name")
          .withColumnRenamed("contig", "rc")
          .withColumnRenamed("start", "rs")
          .withColumnRenamed("stop", "re")
          .withColumnRenamed("strand", "rstrand"))
    res = interval_join_binned(
        ldf, rr, left_keys=("contig", "start", "stop"),
        right_keys=("rc", "rs", "re"), bin_size=bin_size, how=how,
        strand=mode, strand_cols=("strand", "rstrand"),
    )
    got = {}
    for r in res.collect():
        got.setdefault(r["name"], set()).add((r["rs"], r["re"]))
    flip = {"+": "-", "-": "+"}
    for lc, ls, le, lstrand, name in left:
        want = set()
        for rc_, rs_, re_, rstrand, _ in right:
            if rc_ != lc or rs_ > le or ls > re_:
                continue
            if mode == "same":
                if rstrand != lstrand:
                    continue
            elif flip.get(rstrand) != lstrand:
                continue
            want.add((rs_, re_))
        if how == "left_outer" and not want:
            want = {(None, None)}
        assert got.get(name, set()) == want, (name, mode, how)


@pytest.mark.parametrize("mode", ["same", "opposite"])
def test_coverage_stranded_matches_per_base(spark, stranded_frames, mode):
    """bedtools coverage -s / -S: only matching-strand rights count and
    cover; wrong-strand-only left rows survive with zero coverage."""
    left, right, ldf, rdf = stranded_frames
    res = interval_coverage(
        ldf, rdf.drop("name").withColumnRenamed("strand", "rstrand"),
        keys=("contig", "start", "stop"),
        right_keys=("contig", "start", "stop"),
        strand=mode, strand_cols=("strand", "rstrand"),
    )
    got = {r["name"]: (r["n_overlaps"], r["covered_bases"]) for r in res.collect()}
    assert len(got) == len(left)
    for lc, ls, le, lstrand, name in left:
        cands = [(s, e) for c, s, e in _strand_cands(right, mode, lstrand)
                 if c == lc]
        hits = [(rs, re_) for rs, re_ in cands if rs <= le and ls <= re_]
        covered = set()
        for rs, re_ in hits:
            covered.update(range(max(rs, ls), min(re_, le) + 1))
        assert got[name] == (len(hits), len(covered)), (name, mode)


@pytest.mark.parametrize("mode", ["same", "opposite"])
def test_map_stranded_matches_brute(spark, stranded_frames, mode):
    """bedtools map -s / -S: aggregates see only matching-strand rights."""
    from pyspark.sql import functions as _F

    from hadoop_bam_spark.operators.interval_join import interval_map

    left, right, ldf, rdf = stranded_frames
    rv = (rdf.drop("name")
          .withColumnRenamed("strand", "rstrand")
          .withColumn("val", (_F.col("start") % 7).cast("long")))
    res = interval_map(
        ldf, rv, [("val", "sum", "v_sum"), ("val", "count", "v_n")],
        keys=("contig", "start", "stop"),
        right_keys=("contig", "start", "stop"),
        strand=mode, strand_cols=("strand", "rstrand"),
    )
    got = {r["name"]: (r["v_sum"], r["v_n"]) for r in res.collect()}
    assert len(got) == len(left)
    for lc, ls, le, lstrand, name in left:
        vals = [s % 7 for c, s, e in _strand_cands(right, mode, lstrand)
                if c == lc and s <= le and ls <= e]
        want = (sum(vals) if vals else None, len(vals))
        assert got[name] == want, (name, mode)


def test_subtract_reads_keeps_fully_covered_contig_group(spark):
    """A contig whose mapped reads are ALL fully covered by the merged
    regions must still appear as a zero row (the oracle groups over reads,
    not over surviving segments). Regression: at sf0.001 contig 0 is fully
    covered and its group silently vanished."""
    from pyspark.sql import functions as _F

    from hadoop_bam_spark.queries import REGISTRY

    df = REGISTRY["interval_subtract_reads"].fn(spark, "/root/testdata/sf0.001")
    rows = {r["ref_idx"]: r for r in df.collect()}
    assert set(rows) == {0, 1, 2, 3}
    z = rows[0]
    assert (z["n_segments"], z["remaining_bases"], z["n_surviving_reads"]) == (0, 0, 0)
