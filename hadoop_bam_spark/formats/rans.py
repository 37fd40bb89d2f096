"""rANS-4x8 order-0 ENCODER (CRAM 3.0 spec §13; htslib rans_static
layout — the exact stream our own decoder ``formats/cram.py:rans_decode``
reads, and what htslib/htsjdk emit for quality/flag-class series behind
``CRAMRecordWriter``).

Encoding is the inverse of the decode recurrence: symbols are processed
in REVERSE order across 4 interleaved states (state ``j`` owns symbols
``i`` with ``i & 3 == j``), renormalization bytes are emitted backwards
and reversed once at the end, and the final 4 states land in the header
where the decoder picks them up. Frequencies are quantized to sum exactly
``4096`` (every present symbol >= 1) and serialized with the same
symbol-RLE table format the decoder parses.

The per-symbol state chain is inherently sequential (each state's next
value depends on how many bytes the previous step emitted). When the
native kernel is available (r11, `formats/rans_native.py`), the walk
runs in C with the tables computed HERE — format decisions never leave
this module, so native and pure-Python streams are byte-identical by
construction (182/59 MB/s order-0/1 measured; FORMAT_BENCH.md r11).
Without a compiler the walk falls back to tight Python over
preallocated lookup lists (~1-4 MB/s) — which is why the CRAM sink
keeps gzip as the default codec and offers rANS as the opt-in for
compiler-equipped deployments.

Frequency counting and table prep are numpy-vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

_TF_SHIFT = 12
_TOTFREQ = 1 << _TF_SHIFT  # 4096
_LOW = 1 << 23


def _quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """Scale raw symbol counts to sum EXACTLY 4096 with every present
    symbol >= 1 (a zero frequency for a present symbol would make it
    unencodable)."""
    total = int(counts.sum())
    freqs = np.zeros(256, dtype=np.int64)
    present = counts > 0
    if total == 0:
        return freqs
    scaled = counts[present].astype(np.float64) * _TOTFREQ / total
    q = np.maximum(np.round(scaled).astype(np.int64), 1)
    freqs[present] = q
    # fix rounding drift by walking the largest frequencies (never below 1)
    diff = int(freqs.sum()) - _TOTFREQ
    while diff != 0:
        order = np.argsort(freqs)[::-1]
        for s in order:
            if diff == 0:
                break
            if diff > 0 and freqs[s] > 1:
                take = min(diff, int(freqs[s]) - 1)
                freqs[s] -= take
                diff -= take
            elif diff < 0 and freqs[s] > 0:
                freqs[s] += -diff
                diff = 0
    return freqs


def _write_freq_table(freqs: np.ndarray) -> bytes:
    """Inverse of ``cram._rans_read_freqs``: ascending symbols, runs of
    consecutive symbols RLE'd, freqs >= 128 in two bytes, 0 terminator."""
    syms = np.flatnonzero(freqs).tolist()
    out = bytearray()

    def emit_freq(f: int) -> None:
        if f >= 128:
            out.append(128 | (f >> 8))
            out.append(f & 0xFF)
        else:
            out.append(f)

    i = 0
    n = len(syms)
    first = True
    while i < n:
        # maximal run of consecutive symbols starting at syms[i]
        j = i
        while j + 1 < n and syms[j + 1] == syms[j] + 1:
            j += 1
        if first:
            out.append(syms[i])
            first = False
        else:
            out.append(syms[i])
        emit_freq(int(freqs[syms[i]]))
        if j > i:
            # next symbol is consecutive: name it, then the count of
            # FURTHER consecutive symbols after it
            out.append(syms[i] + 1)
            out.append(j - i - 1)
            for k in range(i + 1, j + 1):
                emit_freq(int(freqs[syms[k]]))
        i = j + 1
    out.append(0)  # terminator
    return bytes(out)


def rans_encode_order1(data: bytes) -> bytes:
    """``data`` -> rANS-4x8 ORDER-1 stream decodable by
    ``cram.rans_decode`` (htslib rans_static layout). Each state owns a
    contiguous QUARTER of the stream (q = n >> 2; state 3 also carries
    the ragged tail), the context of a symbol is the previous byte of
    its quarter (0 at each quarter start), and per-context frequency
    tables are RLE-serialized with the order-0 table format inside.

    Order-1 wins on correlated streams (real phred runs, flag patterns);
    on iid data the ~per-context table overhead loses to order-0 — the
    CRAM ``codecs="auto"`` path measures both and keeps the smaller.
    """
    n = len(data)
    if n == 0:
        return b""
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    q = n >> 2
    # context of position p: 0 at each state's first symbol (positions
    # 0, q, 2q, 3q), else the previous byte of the same run; state 3's
    # run extends through the ragged tail [3q, n)
    ctx = np.empty(n, np.int64)
    ctx[1:] = arr[:-1]
    for p in (0, q, 2 * q, 3 * q):
        if p < n:
            ctx[p] = 0
    # per-context quantized tables: one flat bincount over ctx*256+sym
    # (np.add.at's scatter-add is ~10x slower than bincount here and was
    # the dominant prep cost once the state walk went native)
    pair_counts = np.bincount(
        (ctx << 8) | arr, minlength=1 << 16
    ).reshape(256, 256)
    live = np.flatnonzero(pair_counts.sum(axis=1))
    freqs = np.zeros((256, 256), np.int64)
    cums = np.zeros((256, 257), np.int64)
    for c in live.tolist():
        freqs[c] = _quantize_freqs(pair_counts[c])
        np.cumsum(freqs[c], out=cums[c][1:])
    # outer context-RLE serialization mirroring the decoder's reader
    table = bytearray()
    i = 0
    lv = live.tolist()
    while i < len(lv):
        j = i
        while j + 1 < len(lv) and lv[j + 1] == lv[j] + 1:
            j += 1
        table.append(lv[i])
        table += _write_freq_table(freqs[lv[i]])
        if j > i:
            table.append(lv[i] + 1)
            table.append(j - i - 1)
            for k in range(i + 1, j + 1):
                table += _write_freq_table(freqs[lv[k]])
        i = j + 1
    table.append(0)

    # native reverse state walk when available (r11): identical bytes
    # by construction — the tables above are THE tables, C only runs
    # the exact-integer walk (~100x the Python loop below)
    from hadoop_bam_spark.formats import rans_native

    got = rans_native.encode_walk(
        data, 1,
        freqs.astype("<u2").tobytes(),
        np.ascontiguousarray(cums[:, :256]).astype("<u2").tobytes(),
    )
    if got is not None:
        rev_b, st = got
        body = bytes(table) + struct.pack("<4I", *st) + rev_b
        return b"\x01" + struct.pack("<II", len(body), n) + body

    # per-position transition params, gathered vectorized
    f_all = freqs[ctx, arr]
    c_all = cums[ctx, arr]
    xmax_all = ((_LOW >> _TF_SHIFT) << 8) * f_all

    states = [_LOW, _LOW, _LOW, _LOW]
    rev = bytearray()
    append = rev.append
    fl, cl, xl = f_all.tolist(), c_all.tolist(), xmax_all.tolist()
    # reverse of the decoder's consumption order: ragged tail first
    # (state 3), then the interleaved main loop i = q-1..0, j = 3..0
    x = states[3]
    for p in range(n - 1, 4 * q - 1, -1):
        xm = xl[p]
        while x >= xm:
            append(x & 0xFF)
            x >>= 8
        f = fl[p]
        x = ((x // f) << _TF_SHIFT) + (x % f) + cl[p]
    states[3] = x
    for i in range(q - 1, -1, -1):
        for j in (3, 2, 1, 0):
            p = j * q + i
            x = states[j]
            xm = xl[p]
            while x >= xm:
                append(x & 0xFF)
                x >>= 8
            f = fl[p]
            states[j] = ((x // f) << _TF_SHIFT) + (x % f) + cl[p]
    rev.reverse()
    body = bytes(table) + struct.pack("<4I", *states) + bytes(rev)
    return b"\x01" + struct.pack("<II", len(body), n) + body


def rans_encode_order0(data: bytes) -> bytes:
    """``data`` -> rANS-4x8 order-0 stream decodable by
    ``cram.rans_decode`` (and htslib). Empty input encodes to an empty
    payload the decoder's empty-guard accepts."""
    n = len(data)
    if n == 0:
        return b""
    arr = np.frombuffer(data, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256).astype(np.int64)
    freqs = _quantize_freqs(counts)
    cum = np.zeros(257, dtype=np.int64)
    np.cumsum(freqs, out=cum[1:])
    table = _write_freq_table(freqs)

    # native reverse state walk when available (r11): identical bytes
    # by construction (same tables, exact integer walk in C)
    from hadoop_bam_spark.formats import rans_native

    got = rans_native.encode_walk(
        data, 0,
        freqs.astype("<u2").tobytes(),
        np.ascontiguousarray(cum[:256]).astype("<u2").tobytes(),
    )
    if got is not None:
        rev_b, st = got
        body = table + struct.pack("<4I", *st) + rev_b
        return b"\x00" + struct.pack("<II", len(body), n) + body

    freq_l = freqs.tolist()
    cum_l = cum.tolist()
    # one tuple lookup per symbol: (renorm threshold, freq, cum). Renorm
    # emits low bytes while x >= x_max(sym) = ((LOW >> 12) << 8) * freq.
    tbl = [
        (((_LOW >> _TF_SHIFT) << 8) * freq_l[s], freq_l[s], cum_l[s])
        for s in range(256)
    ]

    # 4 interleaved states (lane j owns symbols i with i & 3 == j),
    # processed in REVERSE symbol order; emitted bytes are reversed once
    # at the end so the decoder reads them forward. Lane states live in
    # locals and the main loop is unrolled 4-wide (lanes 3,2,1,0 per
    # group) — ~1.5x over the generic states[i & 3] loop; the chain is
    # inherently sequential (each state's next value depends on how many
    # bytes the previous step emitted), so this is the python ceiling.
    x0 = x1 = x2 = x3 = _LOW
    rev = bytearray()  # renorm bytes, reverse order
    append = rev.append
    buf = data
    i = n - 1
    states = [x0, x1, x2, x3]
    while i >= 0 and (i & 3) != 3:  # peel the ragged high-index tail
        j = i & 3
        xm, f, c = tbl[buf[i]]
        x = states[j]
        while x >= xm:
            append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << _TF_SHIFT) + (x % f) + c
        i -= 1
    x0, x1, x2, x3 = states
    while i >= 3:
        xm, f, c = tbl[buf[i]]
        while x3 >= xm:
            append(x3 & 0xFF)
            x3 >>= 8
        x3 = ((x3 // f) << _TF_SHIFT) + (x3 % f) + c
        xm, f, c = tbl[buf[i - 1]]
        while x2 >= xm:
            append(x2 & 0xFF)
            x2 >>= 8
        x2 = ((x2 // f) << _TF_SHIFT) + (x2 % f) + c
        xm, f, c = tbl[buf[i - 2]]
        while x1 >= xm:
            append(x1 & 0xFF)
            x1 >>= 8
        x1 = ((x1 // f) << _TF_SHIFT) + (x1 % f) + c
        xm, f, c = tbl[buf[i - 3]]
        while x0 >= xm:
            append(x0 & 0xFF)
            x0 >>= 8
        x0 = ((x0 // f) << _TF_SHIFT) + (x0 % f) + c
        i -= 4
    rev.reverse()

    body = table + struct.pack("<4I", x0, x1, x2, x3) + bytes(rev)
    return b"\x00" + struct.pack("<II", len(body), n) + body
