"""Vectorized (columnar) BCF2 record encode — the write-side twin of
``formats/bcf_vec.py`` and the mirror of ``formats/bam_venc.py``.

Instead of ``encode_record`` per row (formats/bcf.py — kept as the parity
oracle and the fallback for shapes this path rejects), a whole Arrow batch
of VCF_SCHEMA rows encodes into ONE contiguous byte blob:

- the 8-byte length prefix and 24-byte fixed section scatter as one
  (n, 32) structured-dtype matrix — no per-record ``struct.pack``;
- ID strings encode fully vectorized: the typed-string descriptor bytes
  come from length masks (1 byte under 15 chars, the 0xF7-prefixed typed
  int above) and the payload gathers straight out of the Arrow data
  buffer with the decoder's ramp index;
- alleles, FILTER lists, INFO entries, and whole per-record genotype
  blocks are dictionary-encoded FIRST (Arrow ``dictionary_encode`` over
  composed keys): only UNIQUE values pay the scalar encode (via the same
  formats/bcf.py helpers, so bytes are identical by construction), then
  per-record bytes gather from the unique-encodings concat. Real call
  sets have a handful of distinct allele/filter/genotype shapes and
  low-cardinality INFO values, so the scalar cost is O(unique), not O(n);
- INFO is handled per flat map ENTRY (key 0x00 value composed strings):
  one segmented cumsum places each entry's bytes inside its record.

Any shape outside the fast path (strings over 32767 bytes, maps with
non-empty ranges under a null mask) raises :class:`VecUnsupported` and the
sink falls back to the scalar encoder for that batch.

Fills the role of htsjdk's BCF2Writer behind the reference's record
writer (BCFRecordWriter.java:108-129) — the reference gets this speed
from JVM bytecode; we get it from batch vectorization.
"""

from __future__ import annotations

import numpy as np

from hadoop_bam_spark.formats import bcf as B
from hadoop_bam_spark.formats.bam_venc import (
    _exclusive_cumsum,
    _int_col,
    _ramp,
    _string_parts,
)


class VecUnsupported(ValueError):
    """Batch shape outside the vectorized encode fast path."""


_PREFIX_DTYPE = np.dtype(
    [
        ("l_shared", "<u4"),
        ("l_indiv", "<u4"),
        ("contig", "<i4"),
        ("pos", "<i4"),
        ("rlen", "<i4"),
        ("qual", "<u4"),
        ("n_allele_info", "<u4"),
        ("n_fmt_sample", "<u4"),
    ]
)


def _combined(col):
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def _list_counts(col, n: int) -> np.ndarray:
    """Per-record child counts of a list/map column; nulls must have empty
    ranges (Spark writes them so) else the flat children would misalign."""
    import pyarrow as pa

    col = _combined(col)
    if col.null_count == n:
        return np.zeros(n, np.int64)
    width = (
        np.int64
        if isinstance(col.type, pa.LargeListType)
        else np.int32
    )
    offs = np.frombuffer(col.buffers()[1], dtype=width)[
        col.offset: col.offset + n + 1
    ].astype(np.int64)
    counts = offs[1:] - offs[:-1]
    if col.null_count:
        null = np.asarray(col.is_null())
        if counts[null].any():
            raise VecUnsupported("null list entry with non-empty range")
    return counts


def _abs_offsets(col, n: int) -> np.ndarray:
    """Absolute child offsets of a list/map column slice (n+1 values)."""
    import pyarrow as pa

    width = (
        np.int64 if isinstance(col.type, pa.LargeListType) else np.int32
    )
    return np.frombuffer(col.buffers()[1], dtype=width)[
        col.offset: col.offset + n + 1
    ].astype(np.int64)


def _map_children(col, n: int):
    """Map column -> (absolute offsets, full flat keys, full flat items).

    ``MapArray.keys``/``.items`` ignore the parent's slice offset, so the
    caller must address them through the absolute offsets."""
    col = _combined(col)
    if col.null_count == n:
        return np.zeros(n + 1, np.int64), None, None
    offs = _abs_offsets(col, n)
    if col.null_count:
        null = np.asarray(col.is_null())
        if (offs[1:] - offs[:-1])[null].any():
            raise VecUnsupported("null map entry with non-empty range")
    return offs, col.keys, col.items


def _dict_encode_keys(keys):
    """Composed string keys -> (codes int64, first-occurrence row index per
    unique)."""
    import pyarrow.compute as pc

    d = pc.dictionary_encode(_combined(keys))
    codes = np.asarray(d.indices).astype(np.int64)
    n_unique = len(d.dictionary)
    first = np.full(n_unique, -1, dtype=np.int64)
    # reverse iteration order makes the FIRST occurrence win
    first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1, dtype=np.int64)
    return codes, first


class _PieceTable:
    """Unique byte pieces + gather of their concat into the output blob."""

    def __init__(self, pieces: list[bytes]):
        self.lens = np.fromiter(
            (len(p) for p in pieces), dtype=np.int64, count=len(pieces)
        )
        self.starts = _exclusive_cumsum(self.lens)[:-1]
        self.buf = np.frombuffer(b"".join(pieces), dtype=np.uint8)

    def scatter(self, out: np.ndarray, codes: np.ndarray, dest: np.ndarray):
        lens = self.lens[codes]
        out[_ramp(dest, lens)] = self.buf[_ramp(self.starts[codes], lens)]


def _join_list_of_strings(col, n: int, sep: str):
    """list<string> column -> per-record joined string (null LISTS -> '').

    Null ELEMENTS inside a list are rejected: ``pc.binary_join`` returns
    null for any list containing a null element, and the final
    ``fill_null`` would then collapse e.g. alts ``[null]`` onto the same
    dictionary key as alts ``[]`` — whose encoded bytes differ — so a
    non-representative record would silently get the representative's
    bytes. Those batches must take the scalar fallback instead."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = _combined(col)
    if col.null_count == n or n == 0:
        return pa.array([""] * n, pa.string())
    if col.type != pa.list_(pa.string()):
        # Spark's bridge emits list<string not null>/large variants that
        # pc.binary_join lacks kernels for — normalize first
        col = col.cast(pa.list_(pa.string()))
    if pc.list_flatten(col).null_count:
        raise VecUnsupported("null string element in list")
    joined = pc.binary_join(col, sep)
    return pc.fill_null(joined, "")


def _merge_group_parts(parts: list, n: int):
    """Merge per-group indiv encodings back into record order: ``parts``
    is [(record indexes, flat bytes, per-record lens, n_fmt)] covering
    all ``n`` records exactly once; returns (flat, lens, nfmt) in
    record order via one byte gather per group. Shared by the grouped
    and union indiv paths."""
    lens = np.empty(n, np.int64)
    nfmt = np.empty(n, np.int64)
    for ridx, _, lens_g, m_g in parts:
        lens[ridx] = lens_g
        nfmt[ridx] = m_g
    starts = _exclusive_cumsum(lens)[:-1]
    flat = np.empty(int(lens.sum()), np.uint8)
    for ridx, flat_g, lens_g, _ in parts:
        if not len(flat_g):
            continue
        g_starts = _exclusive_cumsum(lens_g)[:-1]
        flat[_ramp(starts[ridx], lens_g)] = flat_g[_ramp(g_starts, lens_g)]
    return flat, lens, nfmt


class BCFBatchEncoder:
    """Columnar encoder bound to one BCF header.

    ``encode_batch`` consumes a pyarrow RecordBatch with the VCF_SCHEMA
    columns (contig, start, end, id, ref, alts, qual, filters, info,
    genotypes) and returns one bytes blob of concatenated BCF2 records,
    byte-identical to ``encode_record`` per row (property-tested in
    tests/test_bcf_venc.py).
    """

    #: separators for composed dictionary keys — control chars that cannot
    #: appear in VCF fields (tab/newline-delimited text format)
    _S0, _S1, _S2 = "\x00", "\x01", "\x02"
    #: null-FORMAT-value sentinel (spec-missing value in a present key)
    _SNULL = "\x04"

    def __init__(self, hdr: B.BCFHeader):
        self.hdr = hdr
        self.sidx = hdr.string_index
        self.cidx = hdr.contig_index
        #: which indiv strategy the LAST encode_batch used —
        #: "uniform" | "grouped" | "union" | "dict" (observability for
        #: tools/bench_bcf_nulls.py and the path-pinning tests)
        self.last_indiv_path = None

    # -- unique-piece encoders (scalar helpers from formats/bcf.py keep
    # byte parity by construction) ------------------------------------

    def _allele_piece(self, ref: str, alts) -> bytes:
        out = bytearray()
        for a in [ref] + list(alts or []):
            out += B._enc_string(a)
        return bytes(out)

    def _info_entry_piece(self, key: str, value: str) -> bytes:
        return B._enc_idx(self.sidx[key]) + B._enc_info_value(value)

    # -- batch encode --------------------------------------------------

    def encode_batch(self, batch) -> tuple[bytes, np.ndarray, tuple]:
        """RecordBatch -> (blob, per-record byte lengths,
        (rid, beg0, end0) int64 arrays for inline CSI accumulation)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        n = batch.num_rows
        if n == 0:
            empty = np.zeros(0, np.int64)
            return b"", empty, (empty, empty, empty)
        col = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}

        # ---- fixed-section scalars
        contig_codes, contig_first = _dict_encode_keys(col["contig"])
        contig_arr = _combined(col["contig"])
        contig_ids = np.empty(len(contig_first), np.int64)
        for u, i in enumerate(contig_first):
            contig_ids[u] = self.cidx[contig_arr[int(i)].as_py()]
        contig_id = contig_ids[contig_codes]
        start = _int_col(col["start"])
        end = _int_col(col["end"])
        qual = _combined(col["qual"])
        qual_null = (
            np.asarray(qual.is_null())
            if qual.null_count
            else np.zeros(n, bool)
        )
        qual_f = np.asarray(pc.fill_null(qual, 0.0)).astype(np.float32)
        qual_bits = qual_f.view(np.uint32).astype(np.int64)
        qual_bits[qual_null] = B._FLOAT_MISSING_BITS

        # ---- ID strings: fully vectorized typed-string encode
        id_flat, id_lens, id_null, _ = _string_parts(_combined(col["id"]))
        if id_lens.max(initial=0) > 32767:
            raise VecUnsupported("ID string over 32767 bytes")
        empty_id = id_null | (id_lens == 0)
        small = (~empty_id) & (id_lens < 15)
        med = (~empty_id) & (id_lens >= 15) & (id_lens <= 127)
        big = (~empty_id) & (id_lens > 127)
        id_desc_lens = np.where(empty_id, 1, np.where(small, 1, np.where(med, 3, 4)))
        id_payload = np.where(empty_id, 0, id_lens)
        id_sec = id_desc_lens + id_payload

        # ---- alleles: unique (ref, alts) combos
        ref_arr = _combined(col["ref"])
        alts_counts = _list_counts(col["alts"], n)
        alts_joined = _join_list_of_strings(col["alts"], n, self._S0)
        allele_keys = pc.binary_join_element_wise(
            pc.cast(ref_arr, "string"), alts_joined, self._S1
        )
        al_codes, al_first = _dict_encode_keys(allele_keys)
        # only REPRESENTATIVE rows pay the Python materialization
        ref_rep = ref_arr.take(al_first).to_pylist()
        alts_rep = _combined(col["alts"]).take(al_first).to_pylist()
        al_pieces = [
            self._allele_piece(r, a) for r, a in zip(ref_rep, alts_rep)
        ]
        al_table = _PieceTable(al_pieces)
        al_sec = al_table.lens[al_codes]
        n_allele = 1 + alts_counts

        # ---- filters: unique lists
        filt_arr = _combined(col["filters"])
        filt_joined = _join_list_of_strings(col["filters"], n, self._S0)
        # distinguish null (b"\x01" too, but via tuple None) from empty —
        # both encode identically so one key suffices
        f_codes, f_first = _dict_encode_keys(filt_joined)
        f_pieces = [
            B.encode_filters(fl, self.sidx)
            for fl in filt_arr.take(f_first).to_pylist()
        ]
        f_table = _PieceTable(f_pieces)
        f_sec = f_table.lens[f_codes]

        # ---- INFO: per flat map entry
        info_offs, info_keys, info_items = _map_children(col["info"], n)
        info_counts = info_offs[1:] - info_offs[:-1]
        n_entries = int(info_counts.sum())
        if n_entries:
            off0 = int(info_offs[0])
            ik = pc.cast(
                info_keys.slice(off0, int(info_offs[-1]) - off0), "string"
            )
            iv = pc.cast(
                info_items.slice(off0, int(info_offs[-1]) - off0), "string"
            )
            if ik.null_count or iv.null_count:
                raise VecUnsupported("null INFO key/value")
            entry_keys = pc.binary_join_element_wise(ik, iv, self._S0)
            e_codes, e_first = _dict_encode_keys(entry_keys)
            ik_rep = ik.take(e_first).to_pylist()
            iv_rep = iv.take(e_first).to_pylist()
            e_pieces = [
                self._info_entry_piece(k, v)
                for k, v in zip(ik_rep, iv_rep)
            ]
            e_table = _PieceTable(e_pieces)
            entry_lens = e_table.lens[e_codes]
            # per-record section length via segmented prefix sums (np.add.at
            # is an order of magnitude slower here)
            ecs = _exclusive_cumsum(entry_lens)
            rel = info_offs - info_offs[0]
            info_sec = ecs[rel[1:]] - ecs[rel[:-1]]
        else:
            e_table = None
            entry_lens = np.zeros(0, np.int64)
            info_sec = np.zeros(n, np.int64)

        # ---- genotypes
        geno_arr = _combined(col["genotypes"])
        geno_counts = _list_counts(col["genotypes"], n)
        # fully vectorized indiv encode for the uniform-FORMAT batch shape
        # (every cell shares one key sequence; GT + int/int-vector values)
        # — value-diverse cohorts make whole-record combos ~100% unique,
        # so the dictionary below degenerates to per-record encode_indiv
        # (~8 krec/s measured, bench_bcf_nulls.py); this path has no
        # per-record python at all
        fast = self._indiv_uniform_fast(geno_arr, n)
        if fast is not None:
            indiv_flat, indiv_lens, n_fmt = fast
            g_table = g_codes = None
        else:
            self.last_indiv_path = "dict"
            g_keys = self._genotype_keys(geno_arr, n)
            g_codes, g_first = _dict_encode_keys(g_keys)
            g_pieces = []
            g_nfmt = np.empty(len(g_first), np.int64)
            # one batched take+to_pylist for every representative record:
            # the old per-unique scalar `geno_arr[i].as_py()` was ~40% of
            # encode_batch on unique-combo data
            reps = geno_arr.take(pa.array(g_first)).to_pylist()
            for u, genos in enumerate(reps):
                # map values come back as [(k, v), ...] — encode_indiv
                # wants dicts
                tuples = (
                    [
                        (
                            g["sample"],
                            g["gt"],
                            dict(g["fields"])
                            if g["fields"] is not None
                            else None,
                        )
                        for g in genos
                    ]
                    if genos
                    else genos
                )
                piece, nf = B.encode_indiv(tuples, self.sidx)
                g_pieces.append(piece)
                g_nfmt[u] = nf
            g_table = _PieceTable(g_pieces)
            indiv_lens = g_table.lens[g_codes]
            n_fmt = g_nfmt[g_codes]

        # ---- layout
        shared_lens = 24 + id_sec + al_sec + f_sec + info_sec
        rec_lens = 8 + shared_lens + indiv_lens
        rec_starts = _exclusive_cumsum(rec_lens)
        total = int(rec_starts[-1])
        rec_starts = rec_starts[:-1]
        out = np.empty(total, np.uint8)

        # prefix + fixed: one structured scatter
        head = np.empty(n, dtype=_PREFIX_DTYPE)
        head["l_shared"] = shared_lens
        head["l_indiv"] = indiv_lens
        head["contig"] = contig_id
        head["pos"] = start - 1
        head["rlen"] = end - (start - 1)
        head["qual"] = qual_bits
        head["n_allele_info"] = (n_allele << 16) | info_counts
        head["n_fmt_sample"] = (n_fmt << 24) | geno_counts
        # direct scatter: view the structured rows as a flat byte stream
        idx32 = _ramp(rec_starts, np.full(n, 32, np.int64))
        out[idx32] = head.view(np.uint8)

        # ID section
        id_dest = rec_starts + 32
        desc = np.empty(n, np.uint8)
        desc[empty_id] = 0x07
        desc[small] = ((id_lens[small] << 4) | 7).astype(np.uint8)
        desc[med | big] = 0xF7
        out[id_dest] = desc
        if med.any():
            out[id_dest[med] + 1] = 0x11
            out[id_dest[med] + 2] = id_lens[med].astype(np.uint8)
        if big.any():
            out[id_dest[big] + 1] = 0x12
            le16 = id_lens[big].astype("<u2").view(np.uint8).reshape(-1, 2)
            out[id_dest[big] + 2] = le16[:, 0]
            out[id_dest[big] + 3] = le16[:, 1]
        src_starts = _exclusive_cumsum(id_lens)[:-1]
        pay = id_payload
        out[_ramp(id_dest + id_desc_lens, pay)] = id_flat[
            _ramp(src_starts, pay)
        ]

        # alleles / filters
        al_dest = id_dest + id_sec
        al_table.scatter(out, al_codes, al_dest)
        f_dest = al_dest + al_sec
        f_table.scatter(out, f_codes, f_dest)

        # INFO entries: segmented placement inside each record
        info_dest = f_dest + f_sec
        if n_entries:
            g_cum = _exclusive_cumsum(entry_lens)  # n_entries + 1 values
            rec_entry_starts = rel[:-1]  # may equal n_entries for 0-entry tails
            seg = g_cum[:-1] - np.repeat(g_cum[rec_entry_starts], info_counts)
            entry_dest = np.repeat(info_dest, info_counts) + seg
            e_table.scatter(out, e_codes, entry_dest)

        # indiv section
        indiv_dest = info_dest + info_sec
        if g_table is None:
            out[_ramp(indiv_dest, indiv_lens)] = indiv_flat
        else:
            g_table.scatter(out, g_codes, indiv_dest)

        return out.tobytes(), rec_lens, (contig_id, start - 1, end)

    def _indiv_uniform_fast(self, geno_arr, n: int):
        """Fully vectorized indiv-section encode for the uniform-FORMAT
        batch shape -> (flat uint8 stream, per-record byte lens,
        per-record n_fmt), or ``None`` when the batch doesn't qualify
        (the unique-combo dictionary path handles it instead).

        Shape contract (checked, bail on any miss):
        - every record has the same sample count S >= 1, no null
          genotypes lists / struct elements / fields maps;
        - within each record, every sample's fields map carries the
          IDENTICAL key sequence. One sequence across the whole batch
          (the parquet-borne cohort shape) takes the single-group path;
          sequences varying ACROSS records (the single-sample VCF-text
          shape — the parser drops '.'-valued pairs per record) group by
          signature and encode per group (``_indiv_grouped``);
        - GT values are missing or ploidy <= 2 with single-digit alleles
          ('0/1', '.', '1|1', null);
        - every other key holds int or comma-joined-int values ('.' parts
          = in-cell MISSING, null values = absent cell) — float/string
          FORMAT values bail.

        Byte parity with ``encode_indiv`` is property-tested
        (tests/test_bcf_venc.py); every type-choice rule (per-record
        int8/16/32 from the record's value range, EOV padding to the
        record's max cell width, MISSING sentinels) is mirrored exactly.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        if n == 0 or geno_arr.null_count:
            return None
        g_offs = _abs_offsets(geno_arr, n)
        counts = (g_offs[1:] - g_offs[:-1]).astype(np.int64)
        S = int(counts[0])
        if S < 1 or not (counts == S).all():
            return None
        lo, hi = int(g_offs[0]), int(g_offs[-1])
        cells = geno_arr.values.slice(lo, hi - lo)  # n*S structs
        if cells.null_count:
            return None
        res = self._encode_cells_uniform(cells, n, S)
        if res is not None:
            self.last_indiv_path = "uniform"
            return res
        return self._indiv_grouped(cells, n, S)

    def _indiv_grouped(self, cells, n: int, S: int):
        """Per-keyset grouping: records whose cells all share ONE key
        sequence, but where the sequence VARIES across records (the
        single-sample VCF-text shape — the parser drops '.'-valued pairs
        per record) group by their key-sequence signature; each group
        encodes through the uniform fast path and the flats merge back
        in record order with one byte gather. Bails (None) when any
        record's cells disagree with each other, when a group fails the
        uniform contract, or when fragmentation is too high to pay the
        per-group overhead."""
        import pyarrow as pa
        import pyarrow.compute as pc

        nc = n * S
        f = cells.field("fields")
        if f.null_count:
            return None
        f_offs = _abs_offsets(f, nc)
        klo = int(f_offs[0])
        keys = f.keys.slice(klo, int(f_offs[-1]) - klo)
        if keys.null_count:
            return None
        cell_keys = pa.ListArray.from_arrays(
            (f_offs - klo).astype(np.int32), pc.cast(keys, pa.string())
        )
        sig = pc.dictionary_encode(
            pc.fill_null(pc.binary_join(cell_keys, "\x00"), "")
        )
        codes = np.asarray(sig.indices).astype(np.int64).reshape(n, S)
        if not (codes == codes[:, :1]).all():
            # cells within one record disagree -> union key-set shape
            # (r11): expand every cell to the record's union key
            # sequence with null values for absent keys, then encode
            # through the uniform path per union group
            return self._indiv_union(cells, n, S, f_offs)
        rec_sig = codes[:, 0]
        groups = np.unique(rec_sig)
        if len(groups) > 32:
            # too fragmented; dictionary path instead. Routing this
            # overflow to the union path was TRIED and measured in r11:
            # on an 8-key text-import corpus (~120 sequences, ~34
            # records/group) the per-group overhead made it 3.7x SLOWER
            # than the dictionary path (10.4 vs 38.1 krec/s — the
            # unique-combo dictionary amortizes well when values are
            # low-cardinality). Union stays reserved for within-record
            # DISAGREEMENT, where the per-record scalar is the
            # alternative and union measured 2.4x faster.
            return None
        m_per_cell = (f_offs[1:] - f_offs[:-1]).astype(np.int64)
        parts = []
        for sg in groups.tolist():
            ridx = np.flatnonzero(rec_sig == sg)
            n_g = len(ridx)
            cidx = (ridx[:, None] * S + np.arange(S)).ravel()
            if int(m_per_cell[ridx[0] * S]) == 0:
                # empty fields maps: encode_indiv emits nothing, n_fmt 0.
                # EVERY cell of the group must be empty — an
                # empty-string FORMAT key produces the same "" signature
                # as an empty map, so a mixed group must bail to the
                # dictionary path instead of silently encoding the keyed
                # records as empty indiv (r9 ADVICE).
                if m_per_cell[cidx].any():
                    return None
                parts.append(
                    (ridx, np.zeros(0, np.uint8),
                     np.zeros(n_g, np.int64), 0)
                )
                continue
            cells_g = cells.take(pa.array(cidx))
            res = self._encode_cells_uniform(cells_g, n_g, S)
            if res is None:
                return None
            flat_g, lens_g, nfmt_g = res
            parts.append((ridx, flat_g, lens_g, int(nfmt_g[0])))
        self.last_indiv_path = "grouped"
        return _merge_group_parts(parts, n)

    def _indiv_union(self, cells, n: int, S: int, f_offs):
        """Within-record key-set disagreement (the adversarial cohort
        shape: per-sample FORMAT keys differing inside one record):
        scalar ``encode_indiv`` takes the UNION of keys across samples
        in first-seen order and reads absent cells as None. This
        vectorizes that exactly. Records group by their UNION key
        sequence — NOT by the full per-cell pattern, which fans out as
        (distinct cell key-sets)^S and blows any group cap on real
        cohorts, while distinct unions stay bounded by the header's
        FORMAT key subsets that actually co-occur (usually a handful).
        Per group, every cell expands to the union sequence via one
        vectorized entry scatter + Arrow take with null indexes for
        absent keys (null value == absent cell, bytewise identical per
        encode_indiv's ``fm.get``), then encodes through the uniform
        fast path. Bails (None -> per-record dictionary path) on
        fragmentation (> 128 ordered unions, > 64 distinct keys), an
        over-large expansion (> 2^27 slots), duplicate keys inside one
        cell, or a group the uniform contract rejects."""
        import pyarrow as pa
        import pyarrow.compute as pc

        f = cells.field("fields")
        nc = n * S
        klo, khi = int(f_offs[0]), int(f_offs[-1])
        keys = pc.cast(f.keys.slice(klo, khi - klo), pa.string())
        items = f.items  # absolute child indexing below
        if keys.null_count:
            return None
        kd = pc.dictionary_encode(keys)
        kcodes = np.asarray(kd.indices).astype(np.int64)
        K = len(kd.dictionary)
        E = len(kcodes)
        if K > 64:
            return None
        ent_per_cell = (f_offs[1:] - f_offs[:-1]).astype(np.int64)
        cell_of_entry = np.repeat(np.arange(nc, dtype=np.int64),
                                  ent_per_cell)
        rec_of_entry = cell_of_entry // S
        # duplicate key inside one cell: scalar's dict shape dedups —
        # route to the dictionary path
        if len(np.unique(cell_of_entry * K + kcodes)) != E:
            return None
        # first-seen flat position per (record, key): record-major entry
        # order IS the scalar's union discovery order
        INF = np.iinfo(np.int64).max
        first_pos = np.full((n, K), INF, np.int64)
        np.minimum.at(
            first_pos, (rec_of_entry, kcodes),
            np.arange(E, dtype=np.int64),
        )
        order = np.argsort(first_pos, axis=1, kind="stable")
        poss = np.take_along_axis(first_pos, order, axis=1)
        uni = np.where(poss < INF, order, -1)  # (n, K) canonical unions
        pats, rec_pat = np.unique(uni, axis=0, return_inverse=True)
        rec_pat = rec_pat.ravel()  # numpy<2.1 returns (n,1) with axis=0
        # unions are ORDERED sequences (discovery order fixes the wire
        # key order), so subsets multiply by their orderings — allow a
        # wider fan-out than the grouped path; per-group cost is a few
        # vectorized ops, and 128 groups on a 4096-row batch still
        # leaves ~32 records per encode_cells_uniform call
        if len(pats) > 128:
            return None
        # per-record union slot of each key
        slot_of = np.full((n, K), -1, np.int64)
        rr = np.repeat(np.arange(n, dtype=np.int64), K)
        flatu = uni.ravel()
        valid = flatu >= 0
        slot_of[rr[valid], flatu[valid]] = np.tile(
            np.arange(K, dtype=np.int64), n
        )[valid]
        dest_slot = slot_of[rec_of_entry, kcodes]
        ent_group = rec_pat[rec_of_entry]
        parts = []
        for g in range(len(pats)):
            ridx = np.flatnonzero(rec_pat == g)
            n_g = len(ridx)
            urow = pats[g]
            u = int((urow >= 0).sum())
            if u == 0:
                parts.append(
                    (ridx, np.zeros(0, np.uint8), np.zeros(n_g, np.int64), 0)
                )
                continue
            if n_g * S * u > (1 << 27):
                # the expansion materializes n_g*S*u slots at once — a
                # cohort-scale batch (10^5 samples x wide union) must
                # not OOM here or wrap the int32 map offsets; bail to
                # the per-record path instead
                return None
            union_keys = [str(kd.dictionary[int(c)]) for c in urow[:u]]
            sel = np.flatnonzero(ent_group == g)
            loc = np.full(n, -1, np.int64)
            loc[ridx] = np.arange(n_g, dtype=np.int64)
            cell_local = (
                loc[rec_of_entry[sel]] * S + cell_of_entry[sel] % S
            )
            src = np.full(n_g * S * u, -1, np.int64)
            src[cell_local * u + dest_slot[sel]] = sel + klo
            mask = src < 0
            items_exp = items.take(
                pa.array(np.where(mask, 0, src), mask=mask)
            )
            offs = pa.array(
                np.arange(0, (n_g * S * u) + 1, u, dtype=np.int32)
            )
            map_arr = pa.MapArray.from_arrays(
                offs,
                pa.array(union_keys * (n_g * S), pa.string()),
                items_exp,
            )
            cells_exp = pa.StructArray.from_arrays([map_arr], ["fields"])
            res = self._encode_cells_uniform(cells_exp, n_g, S)
            if res is None:
                return None
            flat_g, lens_g, nfmt_g = res
            parts.append((ridx, flat_g, lens_g, int(nfmt_g[0])))
        self.last_indiv_path = "union"
        return _merge_group_parts(parts, n)

    def _encode_cells_uniform(self, cells, n: int, S: int):
        """The uniform-key-sequence encoder proper: ``cells`` is the
        (n*S)-long genotype struct child; every cell must carry the same
        key sequence. Returns (flat, per-record lens, per-record n_fmt)
        or None."""
        import pyarrow as pa
        import pyarrow.compute as pc

        nc = n * S
        f = cells.field("fields")
        if f.null_count:
            return None
        f_offs = _abs_offsets(f, nc)
        m = int(f_offs[1] - f_offs[0]) if nc else 0
        if m < 1 or not ((f_offs[1:] - f_offs[:-1]) == m).all():
            return None
        klo, khi = int(f_offs[0]), int(f_offs[-1])
        keys = f.keys.slice(klo, khi - klo)
        items = f.items.slice(klo, khi - klo)
        if keys.null_count:
            return None
        kd = pc.dictionary_encode(pc.cast(keys, pa.string()))
        kcodes = np.asarray(kd.indices).astype(np.int64)
        if not (kcodes.reshape(nc, m) == kcodes[:m]).all():
            return None
        key_names = [str(kd.dictionary[int(c)]) for c in kcodes[:m]]
        if len(set(key_names)) != m:
            return None  # duplicate key in one map: scalar dedups
        order = list(range(m))
        if "GT" in key_names:
            jg = key_names.index("GT")
            order = [jg] + [x for x in range(m) if x != jg]
        try:
            idx_bytes = [
                np.frombuffer(B._enc_idx(self.sidx[key_names[j]]), np.uint8)
                for j in order
            ]
        except KeyError:
            return None  # unknown FORMAT key: scalar raises the real error
        vals = pc.cast(items, pa.string())

        # element byte size per BCF type code (1/2/3 = int8/16/32,
        # 5 = float32, 7 = char)
        esize = np.array([0, 1, 2, 4, 0, 4, 0, 1], np.int64)
        _EOV = {1: B._INT8_EOV, 2: B._INT16_EOV, 3: B._INT32_EOV}
        _MISS = {1: B._INT8_MISSING, 2: B._INT16_MISSING, 3: B._INT32_MISSING}

        rec_of_cell = np.repeat(np.arange(n, dtype=np.int64), S)
        cell_in_rec = np.tile(np.arange(S, dtype=np.int64), n)

        # per ordered key: (typ[n], width[n], value arrays for emission)
        per_key = []
        for j in order:
            cv = vals.take(pa.array(np.arange(j, nc * m, m)))
            if key_names[j] == "GT":
                filled = pc.fill_null(cv, "")
                ln = np.asarray(pc.binary_length(filled)).astype(np.int64)
                if not np.isin(ln, (0, 1, 3)).all():
                    # exotic shapes — ploidy > 2 ('0/1/2') and/or
                    # multi-digit allele indexes ('10|2') — take the
                    # general split-based parse (r11: these used to bail
                    # the whole batch to the per-record dictionary path)
                    res = self._gt_general(filled, nc, n, S, rec_of_cell)
                    if res is None:
                        return None
                    cnt, flat_vals, typ, width = res
                    flat_miss = np.zeros(len(flat_vals), bool)
                    flat_flt = s_starts = s_data = cell_len = None
                    per_key.append(
                        (cnt, flat_vals, flat_miss, typ, width,
                         flat_flt, s_starts, s_data, cell_len)
                    )
                    continue
                comb = filled.combine_chunks() if hasattr(
                    filled, "combine_chunks") else filled
                boffs = np.frombuffer(comb.buffers()[1], np.int32)[
                    comb.offset: comb.offset + nc + 1
                ].astype(np.int64)
                data = np.frombuffer(
                    comb.buffers()[2] or b"\x00", np.uint8
                )
                st = boffs[:-1]
                safe = np.minimum(st, len(data) - 1)
                c0 = data[safe]
                c1 = data[np.minimum(safe + 1, len(data) - 1)]
                c2 = data[np.minimum(safe + 2, len(data) - 1)]
                one = ln >= 1
                dig0 = (c0 >= 48) & (c0 <= 57)
                if not ((~one) | dig0 | (c0 == ord("."))).all():
                    return None
                three = ln == 3
                if not (
                    (~three) | ((c1 == ord("/")) | (c1 == ord("|")))
                ).all():
                    return None
                dig2 = (c2 >= 48) & (c2 <= 57)
                if not ((~three) | dig2 | (c2 == ord("."))).all():
                    return None
                a0 = np.where(dig0, c0.astype(np.int64) - 48, -1)
                code0 = np.where(one, ((a0 + 1) << 1), 0)
                a1 = np.where(dig2, c2.astype(np.int64) - 48, -1)
                code1 = ((a1 + 1) << 1) | (c1 == ord("|")).astype(np.int64)
                ploidy = np.where(three, 2, 1)
                # flatten (value, rec, slot) triplets: slot = sample*width
                # is resolved at emission; here cell-level (cnt, values)
                cnt = ploidy
                flat_vals = np.empty(int(cnt.sum()), np.int64)
                # interleave code0 at positions cumsum, code1 where three
                pos = _exclusive_cumsum(cnt)[:-1]
                flat_vals[pos] = code0
                flat_vals[pos[three] + 1] = code1[three]
                flat_miss = np.zeros(len(flat_vals), bool)
                typ = np.ones(n, np.int64)  # GT codes fit int8 always
                width = np.maximum(
                    cnt.reshape(n, S).max(axis=1), 1
                )
                flat_flt = s_starts = s_data = cell_len = None
            else:
                # Per-record type selection, mirroring encode_indiv's
                # try-int, try-float, else-string over each record's flat
                # values. Strict regex classification; anything python's
                # int()/float() would accept that the regexes reject
                # (whitespace, '+', '_' digit separators, inf/nan) bails
                # the batch so the scalar oracle decides.
                filled_cv = pc.fill_null(cv, "")
                blen = np.asarray(pc.binary_length(filled_cv)).astype(
                    np.int64
                )
                # ASCII only: the scalar string path pads by CHARS then
                # encodes utf-8 (byte length drifts for non-ASCII), and
                # python accepts unicode digits the regexes don't
                if not (
                    blen
                    == np.asarray(pc.utf8_length(filled_cv)).astype(np.int64)
                ).all():
                    return None
                parts = pc.split_pattern(cv, ",")  # null -> null list
                cnt = np.asarray(
                    pc.fill_null(pc.list_value_length(parts), 0)
                ).astype(np.int64)
                flat = pc.list_flatten(parts)  # null lists contribute 0
                dots = np.asarray(pc.equal(flat, "."))
                if len(dots) and np.asarray(
                    pc.match_substring_regex(
                        flat, r"(?i)[\s_]|^\+|inf|nan"
                    )
                ).any():
                    return None
                is_int = np.asarray(
                    pc.match_substring_regex(flat, r"^-?[0-9]+$")
                )
                is_num = is_int | np.asarray(
                    pc.match_substring_regex(
                        flat,
                        r"^-?(?:[0-9]+\.?[0-9]*|\.[0-9]+)"
                        r"(?:[eE][+-]?[0-9]+)?$",
                    )
                )
                rec_ids = np.repeat(rec_of_cell, cnt)
                rec_is_int = (
                    np.bincount(rec_ids[~(is_int | dots)], minlength=n) == 0
                )
                rec_is_num = (
                    np.bincount(rec_ids[~(is_num | dots)], minlength=n) == 0
                )
                rec_is_flt = rec_is_num & ~rec_is_int
                rec_is_str = ~rec_is_num
                flat_miss = dots
                flat_vals = np.zeros(len(dots), np.int64)
                int_sel = rec_is_int[rec_ids] & ~dots
                if int_sel.any():
                    flat_vals[int_sel] = np.asarray(
                        pc.cast(flat.filter(pa.array(int_sel)), pa.int64())
                    )
                flat_flt = np.zeros(len(dots), np.float64)
                flt_sel = rec_is_flt[rec_ids] & ~dots
                if flt_sel.any():
                    flat_flt[flt_sel] = np.asarray(
                        pc.cast(
                            flat.filter(pa.array(flt_sel)), pa.float64()
                        )
                    )
                # per-record value range over PRESENT ints (scalar:
                # min/max of isinstance-int values, default 0, no clamp)
                lo_r = np.zeros(n, np.int64)
                hi_r = np.zeros(n, np.int64)
                if int_sel.any():
                    lo_acc = np.full(n, np.iinfo(np.int64).max, np.int64)
                    hi_acc = np.full(n, np.iinfo(np.int64).min, np.int64)
                    np.minimum.at(lo_acc, rec_ids[int_sel],
                                  flat_vals[int_sel])
                    np.maximum.at(hi_acc, rec_ids[int_sel],
                                  flat_vals[int_sel])
                    got = lo_acc != np.iinfo(np.int64).max
                    lo_r[got] = lo_acc[got]
                    hi_r[got] = hi_acc[got]
                int_typ = np.where(
                    (lo_r >= -120) & (hi_r <= 127), 1,
                    np.where((lo_r >= -32000) & (hi_r <= 32767), 2, 3),
                )
                typ = np.where(
                    rec_is_str, 7, np.where(rec_is_flt, 5, int_typ)
                )
                # width: int/float records use the max cell VALUE count
                # (0-value cells excluded, default 1); string records use
                # the max cell CHAR length of the unsplit value, min 1
                w_num = np.maximum(cnt.reshape(n, S).max(axis=1), 1)
                w_str = np.maximum(blen.reshape(n, S).max(axis=1), 1)
                width = np.where(rec_is_str, w_str, w_num)
                # raw cell bytes for the string payload
                comb = filled_cv.combine_chunks() if hasattr(
                    filled_cv, "combine_chunks") else filled_cv
                s_starts = np.frombuffer(comb.buffers()[1], np.int32)[
                    comb.offset: comb.offset + nc + 1
                ].astype(np.int64)[:-1]
                s_data = np.frombuffer(
                    comb.buffers()[2] or b"", np.uint8
                )
                cell_len = blen
            per_key.append(
                (cnt, flat_vals, flat_miss, typ, width,
                 flat_flt, s_starts, s_data, cell_len)
            )

        # ---- lengths and layout
        desc_cache: dict = {}

        def desc_bytes(t: int, w: int) -> np.ndarray:
            got = desc_cache.get((t, w))
            if got is None:
                got = desc_cache[(t, w)] = np.frombuffer(
                    B._enc_descriptor(int(t), int(w)), np.uint8
                )
            return got

        block_lens = np.empty((len(order), n), np.int64)
        desc_lens = np.empty((len(order), n), np.int64)
        for ki, entry in enumerate(per_key):
            typ, width = entry[3], entry[4]
            dl = np.empty(n, np.int64)
            for (t, w) in {
                (int(t), int(w)) for t, w in zip(typ.tolist(), width.tolist())
            }:
                dl[(typ == t) & (width == w)] = len(desc_bytes(t, w))
            desc_lens[ki] = dl
            block_lens[ki] = (
                len(idx_bytes[ki]) + dl + S * width * esize[typ]
            )
        rec_lens = block_lens.sum(axis=0)
        rec_starts = _exclusive_cumsum(rec_lens)
        total = int(rec_starts[-1])
        rec_starts = rec_starts[:-1]
        out = np.empty(total, np.uint8)

        key_off = rec_starts.copy()
        for ki, entry in enumerate(per_key):
            (cnt, flat_vals, flat_miss, typ, width,
             flat_flt, s_starts, s_data, cell_len) = entry
            ib = idx_bytes[ki]
            # key index bytes (constant per key)
            out[key_off[:, None] + np.arange(len(ib))] = ib
            dstart = key_off + len(ib)
            pstart = dstart + desc_lens[ki]
            for (t, w) in {
                (int(t), int(w)) for t, w in zip(typ.tolist(), width.tolist())
            }:
                sel = (typ == t) & (width == w)
                db = desc_bytes(t, w)
                out[dstart[sel][:, None] + np.arange(len(db))] = db
            # payload: prefill per type group (int EOV / float EOV bits /
            # NUL string padding), then scatter values
            for t in (1, 2, 3, 5, 7):
                gsel = typ == t
                if not gsel.any():
                    continue
                es = int(esize[t])
                plens = S * width[gsel] * es
                slots = _ramp(pstart[gsel], plens)
                if t == 7:
                    out[slots] = 0
                    continue
                if t == 5:
                    eov_le = np.frombuffer(
                        np.array(
                            [B._FLOAT_EOV_BITS], dtype="<u4"
                        ).tobytes(),
                        np.uint8,
                    )
                else:
                    eov_le = np.frombuffer(
                        np.array([_EOV[t]], dtype="<i%d" % es).tobytes(),
                        np.uint8,
                    )
                out[slots] = np.tile(eov_le, len(slots) // es)
            # numeric value elements: dest = pstart[rec] +
            # (sample*width[rec] + i) * esize[typ[rec]]
            elem_rec = np.repeat(rec_of_cell, cnt)
            elem_cell_sample = np.repeat(cell_in_rec, cnt)
            # index within the cell
            pos0 = _exclusive_cumsum(cnt)[:-1]
            elem_i = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
                pos0, cnt
            )
            vv = np.where(flat_miss, 0, flat_vals)
            for t in (1, 2, 3):
                es = int(esize[t])
                sel = typ[elem_rec] == t
                if not sel.any():
                    continue
                dest = (
                    pstart[elem_rec[sel]]
                    + (
                        elem_cell_sample[sel] * width[elem_rec[sel]]
                        + elem_i[sel]
                    )
                    * es
                )
                v = np.where(flat_miss[sel], _MISS[t], vv[sel])
                vb = v.astype("<i%d" % es).view(np.uint8).reshape(-1, es)
                for b in range(es):
                    out[dest + b] = vb[:, b]
            if flat_flt is not None:
                sel = typ[elem_rec] == 5
                if sel.any():
                    dest = (
                        pstart[elem_rec[sel]]
                        + (
                            elem_cell_sample[sel] * width[elem_rec[sel]]
                            + elem_i[sel]
                        )
                        * 4
                    )
                    bits = flat_flt[sel].astype("<f4").view("<u4")
                    bits = np.where(
                        flat_miss[sel],
                        np.uint32(B._FLOAT_MISSING_BITS),
                        bits,
                    ).astype("<u4")
                    vb = bits.view(np.uint8).reshape(-1, 4)
                    for b in range(4):
                        out[dest + b] = vb[:, b]
            if s_starts is not None:
                # string cells: raw chars at sample*width, NUL-padded
                csel = (typ[rec_of_cell] == 7) & (cell_len > 0)
                if csel.any():
                    dest = (
                        pstart[rec_of_cell[csel]]
                        + cell_in_rec[csel] * width[rec_of_cell[csel]]
                    )
                    lens_c = cell_len[csel]
                    out[_ramp(dest, lens_c)] = s_data[
                        _ramp(s_starts[csel], lens_c)
                    ]
            key_off = key_off + block_lens[ki]

        return out, rec_lens, np.full(n, m, np.int64)

    def _gt_general(self, filled, nc: int, n: int, S: int, rec_of_cell):
        """General vectorized GT parse: arbitrary ploidy and multi-digit
        allele indexes ('0/1/2', '10|2', './0'). Returns
        (per-cell allele counts, flat allele codes, per-record typ,
        per-record width) or None (non-GT garbage -> dictionary path,
        where the scalar raises the real error).

        Mirrors ``bcf._enc_gt`` exactly: allele code =
        ``((a + 1) << 1) | phased``, ``a = -1`` for '.'/'' alleles, the
        phase bit of allele k>0 is 1 iff the separator BEFORE it is '|'
        (allele 0 is always unphased), null/empty GT encodes the single
        code 0, and the int type widens per record when a large allele
        index pushes codes past int8/int16 (codes are >= 0, so only the
        high bound matters)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        al = pc.split_pattern_regex(filled, r"[/|]")
        cnt = np.asarray(pc.list_value_length(al)).astype(np.int64)
        flat = pc.list_flatten(al)
        ok = np.asarray(pc.match_substring_regex(flat, r"^([0-9]+|\.?)$"))
        if not ok.all():
            return None
        absent = np.asarray(pc.match_substring_regex(flat, r"^\.?$"))
        a = np.full(len(absent), -1, np.int64)
        digs = ~absent
        if digs.any():
            try:
                a[digs] = np.asarray(
                    pc.cast(flat.filter(pa.array(digs)), pa.int64())
                )
            except pa.lib.ArrowInvalid:
                # allele index too wide even for int64 (e.g. a 20-digit
                # GT): bail to the scalar path so the caller surfaces
                # the documented struct.error, not a raw Arrow error
                return None
        # separator chars survive stripping digits and dots; one byte
        # per inter-allele gap, in order
        seps = pc.replace_substring_regex(filled, r"[0-9.]", "")
        comb = seps.combine_chunks() if hasattr(
            seps, "combine_chunks") else seps
        soffs = np.frombuffer(comb.buffers()[1], np.int32)[
            comb.offset : comb.offset + nc + 1
        ].astype(np.int64)
        sdata = np.frombuffer(comb.buffers()[2] or b"", np.uint8)
        if not ((soffs[1:] - soffs[:-1]) == cnt - 1).all():
            return None  # stray non-digit/dot/sep characters
        pos0 = _exclusive_cumsum(cnt)[:-1]
        elem_i = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            pos0, cnt
        )
        cell_of = np.repeat(np.arange(nc, dtype=np.int64), cnt)
        phase = np.zeros(len(a), np.int64)
        nz = elem_i > 0
        if nz.any():
            phase[nz] = (
                sdata[soffs[cell_of[nz]] + elem_i[nz] - 1] == ord("|")
            ).astype(np.int64)
        codes = ((a + 1) << 1) | phase
        hi = np.zeros(n, np.int64)
        np.maximum.at(hi, np.repeat(rec_of_cell, cnt), codes)
        if (hi > 0x7FFFFFFF).any():
            # code would overflow the int32 wire type: the scalar path
            # raises struct.error on such a (malformed) allele index —
            # bail so it does, instead of silently wrapping
            return None
        typ = np.where(hi <= 127, 1, np.where(hi <= 32767, 2, 3))
        width = np.maximum(cnt.reshape(n, S).max(axis=1), 1)
        return cnt, codes, typ.astype(np.int64), width

    def _genotype_keys(self, geno_arr, n: int):
        """Composed per-record key discriminating genotype combos.

        Only the per-genotype ``fields`` maps drive the indiv encoding
        (encode_indiv reads g[2]); sample names and the redundant ``gt``
        struct field don't affect bytes, but including nothing they
        contain keeps keys shorter. Entries join with control-char
        separators that cannot occur in VCF text.

        Null FORMAT *values* (e.g. ``{"DP": null}`` — the real-VCF missing
        shape when frames arrive from parquet instead of VCF text) are
        TOLERATED: they key with the ``\\x04`` sentinel, a control char
        that cannot occur in VCF text (tab-separated format), so the
        combo keys distinctly from both ``{}`` and ``{"DP": "."}`` and
        the representative record's scalar ``encode_indiv`` (which reads
        the actual null through ``fm.get``) produces the right bytes for
        every record sharing the key. Without the sentinel,
        ``binary_join_element_wise`` / ``binary_join`` propagate the null
        and the trailing ``fill_null(..., "")`` would collapse the shape
        onto the *empty*-fields-map key, whose encode_indiv bytes differ
        (r7 silent-wrong-bytes defect; r9 replaces the r8 bail-per-batch
        with this key-level fix — measured in FORMAT_BENCH.md).

        Null FORMAT *keys* and null genotype struct elements are still
        REJECTED (VecUnsupported -> scalar fallback): a null key has no
        defined wire encoding (the scalar path raises on it too)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if geno_arr.null_count == n:
            return pa.array([""] * n, pa.string())
        g_offs = _abs_offsets(geno_arr, n)
        if geno_arr.null_count:
            null = np.asarray(geno_arr.is_null())
            if (g_offs[1:] - g_offs[:-1])[null].any():
                raise VecUnsupported("null genotypes with non-empty range")
        structs = geno_arr.values  # full child, offset-free
        lo, hi = int(g_offs[0]), int(g_offs[-1])
        if hi > lo and structs.slice(lo, hi - lo).null_count:
            raise VecUnsupported("null genotype struct element")
        fields = structs.field("fields")
        m = len(fields)
        f_offs, f_keys, f_items = _map_children(fields, m)
        if f_keys is None:
            per_geno = pa.array([""] * m, pa.string())
        else:
            flo, fhi = int(f_offs[lo]), int(f_offs[hi])
            if fhi > flo and f_keys.slice(flo, fhi - flo).null_count:
                raise VecUnsupported("null FORMAT key")
            fk = pc.cast(f_keys, "string")
            # null values (spec-missing) key via a control-char sentinel
            # no VCF text can contain — distinct from "." and from an
            # absent key; the representative's encode_indiv sees the real
            # null and emits MISSING
            fv = pc.fill_null(pc.cast(f_items, "string"), self._SNULL)
            entry = pc.binary_join_element_wise(fk, fv, self._S0)
            per_geno = pc.binary_join(
                pa.ListArray.from_arrays(
                    f_offs.astype(np.int32), entry
                ),
                self._S1,
            )
        per_rec = pc.binary_join(
            pa.ListArray.from_arrays(
                g_offs.astype(np.int32),
                pc.fill_null(per_geno, ""),
            ),
            self._S2,
        )
        return pc.fill_null(per_rec, "")
