"""Batched numpy rANS-4x8 decode (CRAM 3.0 spec §13).

A single rANS stream is inherently sequential — every symbol's state
depends on how many renorm bytes the previous symbols consumed — so a
4-lane numpy decode of ONE stream loses to tight scalar Python (numpy
dispatch ~1 µs/op vs ~0.3 µs/symbol scalar). The parallelism that DOES
exist at scan time is ACROSS blocks: a 32 MB CRAM split holds ~30
containers × (up to 3 slices × several rANS series) of similar-length
blocks (reference scan path: `CRAMRecordReader.java:33-56`, whose
htsjdk codecs are C-backed). This module decodes N blocks in lockstep:
one wave = one symbol for each of the 4 interleaved states of every
active block; table lookups are flat gathers, and the variable-length
renorm is resolved branch-free — a state needs 0/1/2 bytes, known from
the post-update state magnitude alone, so a per-wave prefix sum over
the 4 lanes yields every byte's position in one shot.

Strategy per batch (``decode_batch``):
- native ctypes kernel available (`formats/rans_native.py`) → per-block
  C decode, fastest everywhere;
- ≥ ``_MIN_LANES`` blocks of one order → numpy lockstep, compacting
  finished blocks out of the active set; when the active set drops
  below the breakeven lane count the survivors finish on a tuned
  scalar continuation (mid-stream rANS state is resumable);
- otherwise → scalar decode per block.

Byte parity with ``formats/cram.py:rans_decode`` is property-tested in
``tests/test_rans.py`` (random + adversarial + truncated streams).
"""

from __future__ import annotations

import struct

import numpy as np

_TF_SHIFT = 12
_TOTFREQ = 1 << _TF_SHIFT
_LOW = 1 << 23
_HALF = 1 << 15  # below this a renormalizing state needs TWO bytes

#: lockstep breakeven: a wave costs ~20 numpy dispatches regardless of
#: width (measured ~20 µs), so below ~20 active blocks (80 lanes) tight
#: scalar Python (~0.28 µs/symbol) wins
_MIN_LANES = 20
#: per-item zero pad: renorm overrun between truncation checks. A wave
#: consumes <= 8 bytes per block (4 states x 2), checks run every
#: ``_CHECK_EVERY`` waves, so drift stays inside the pad.
_CHECK_EVERY = 8
_PAD = 8 * _CHECK_EVERY
#: waves per output phase: symbols land in a wave-major staging buffer
#: (plain slice assign) and flush to the item layout once per phase
_PHASE_W = 256


# ---------------------------------------------------------------------------
# header / table parsing (scalar, per block — not the hot path)
# ---------------------------------------------------------------------------

def _read_freqs_np(data: bytes, p: int):
    """Order-0 table -> f-indexed (sym, fr, bias) arrays + new p.

    ``bias[f] = f - cum[sym[f]]`` folds the decode transform to
    ``s' = fr[f] * (s >> 12) + bias[f]`` — one gather set per wave.
    """
    from hadoop_bam_spark.formats.cram import _rans_read_freqs

    freq, cum, lookup, p = _rans_read_freqs(data, p)
    sym_f = np.frombuffer(lookup, dtype=np.uint8)
    s64 = sym_f.astype(np.int64)
    fr_f = np.asarray(freq, dtype=np.int64)[s64]
    bias_f = np.arange(_TOTFREQ, dtype=np.int64) - np.asarray(
        cum[:256], dtype=np.int64
    )[s64]
    return sym_f, fr_f, bias_f, p


def _parse_order1_tables(data: bytes, p: int):
    """Order-1 per-context tables -> ({ctx: (sym, fr, bias)}, new p)."""
    tables: dict[int, tuple] = {}
    ctx = data[p]
    p += 1
    last = ctx
    rle = 0
    while True:
        sym_f, fr_f, bias_f, p = _read_freqs_np(data, p)
        tables[ctx] = (sym_f, fr_f, bias_f)
        if rle > 0:
            rle -= 1
            ctx += 1
        else:
            last = ctx
            ctx = data[p]
            p += 1
            if ctx == last + 1:
                rle = data[p]
                p += 1
        if ctx == 0:
            break
    return tables, p


def _tuple_table(sym_f, fr_f, bias_f):
    """f-indexed (fr, bias, sym) tuples for the scalar continuations."""
    return list(zip(fr_f.tolist(), bias_f.tolist(), sym_f.tolist()))


def _pair_view(joined: bytes) -> np.ndarray:
    """data16[i] = data[i]<<8 | data[i+1]: one gather per renorm instead
    of two (the pad guarantees i+1 stays in range for reachable i)."""
    d = np.frombuffer(joined, dtype=np.uint8)
    out = np.empty(len(d), np.int64)
    # uint8 -> int64 via widening ufuncs: ~18x faster than .astype
    np.multiply(d, 256, out=out, casting="unsafe")
    np.add(out[:-1], d[1:], out=out[:-1], casting="unsafe")
    return out


# ---------------------------------------------------------------------------
# order-0 lockstep
# ---------------------------------------------------------------------------

class _Item0:
    __slots__ = ("data", "n", "ptr", "states", "tab", "out")

    def __init__(self, data: bytes, n: int):
        self.data = data
        self.n = n
        sym_f, fr_f, bias_f, p = _read_freqs_np(data, 9)
        self.states = list(struct.unpack_from("<4I", data, p))
        self.ptr = p + 16  # first renorm byte
        self.tab = (sym_f, fr_f, bias_f)
        self.out = None


def _scalar0_finish(joined: bytes, p: int, end: int, states: list,
                    tbl: list, i0: int, n: int) -> bytes:
    """Order-0 continuation: symbols [i0, n) (symbol i -> state i & 3),
    reading renorm bytes from ``joined`` at absolute ``p``; returns the
    decoded segment. Raises on byte-pointer overrun past ``end``."""
    seg = bytearray(n - i0)
    sts = [int(x) for x in states]
    for i in range(i0, n):
        j = i & 3
        s = sts[j]
        fr, bi, sym = tbl[s & 4095]
        seg[i - i0] = sym
        s = fr * (s >> _TF_SHIFT) + bi
        while s < _LOW:
            s = (s << 8) | joined[p]
            p += 1
        sts[j] = s
    if p > end:
        raise ValueError("truncated rANS block")
    return bytes(seg)


def _run_phase(S, ptr, base2d, packed, data16, buf, W, check_ref):
    """Order-0 wave kernel: ``W`` unmasked waves for the active set,
    staging symbols into ``buf[w]``.

    All hot ops write into preallocated scratch with ``out=`` — numpy
    dispatch, not element work, is the cost model here. ``data16`` is
    the byte-PAIR view of the renorm stream (data16[i] = data[i]<<8 |
    data[i+1]), so one gather serves a 0/1/2-byte renorm branch-free:
    the post-update magnitude alone fixes the byte count k, a 4-lane
    prefix sum fixes each lane's byte position, and the pair value
    shifted by 8*(2-k) contributes exactly k bytes.
    """
    A = S.shape[0]
    f = np.empty((A, 4), np.int64)
    idx = np.empty((A, 4), np.int64)
    P = np.empty((A, 4), np.int64)
    fr = np.empty((A, 4), np.int64)
    k = np.empty((A, 4), np.int64)
    m2 = np.empty((A, 4), bool)
    cs = np.empty((A, 4), np.int64)
    o0 = np.empty((A, 4), np.int64)
    b1 = np.empty((A, 4), np.int64)
    ends, next_check = check_ref
    ptrcol = ptr[:, 0]
    cs3 = cs[:, 3]
    for w in range(W):
        np.bitwise_and(S, _TOTFREQ - 1, out=f)
        np.add(base2d, f, out=idx)
        packed.take(idx, out=P)
        # packed = fr<<20 | sym<<12 | bias; transform folds to
        # s' = fr * (s >> 12) + bias
        np.right_shift(S, _TF_SHIFT, out=S)
        np.right_shift(P, 20, out=fr)
        np.multiply(S, fr, out=S)
        np.bitwise_and(P, _TOTFREQ - 1, out=f)  # f reused: bias
        np.add(S, f, out=S)
        np.right_shift(P, 12, out=P)
        np.bitwise_and(P, 255, out=P)  # P now = sym
        buf[w] = P
        np.less(S, _LOW, out=k, casting="unsafe")
        np.less(S, _HALF, out=m2)
        np.add(k, m2, out=k)
        k.cumsum(axis=1, out=cs)
        np.subtract(cs, k, out=o0)
        np.add(o0, ptr, out=o0)
        data16.take(o0, out=b1)
        np.left_shift(k, 3, out=o0)  # o0 reused: shift = 8k
        np.left_shift(S, o0, out=S)
        np.subtract(16, o0, out=o0)
        np.right_shift(b1, o0, out=b1)
        np.bitwise_or(S, b1, out=S)
        np.add(ptrcol, cs3, out=ptrcol)
        next_check -= 1
        if next_check <= 0:
            if (ptrcol > ends).any():
                raise ValueError("truncated rANS block")
            next_check = _CHECK_EVERY
    check_ref[1] = next_check


def _run_phase1(S, ptr, ctx, rowbase2d, seg_flat, sym_arena, fr_flat,
                cum_flat, data16, buf, W, check_ref):
    """Order-1 wave kernel. Two-level tables keep the hot gathers
    cache-resident: the f->symbol maps live in ONE uint8 arena (4096
    bytes per live context, ~25 MB for 100 quality blocks, vs ~200 MB
    packed int64), while freq/cum are 256-entry int64 tables indexed by
    the decoded symbol. ``seg_flat[b*256 + ctx]`` holds the context's
    arena offset (slot * 4096); slot*256 for the small tables is just
    that offset >> 4."""
    A = S.shape[0]
    f = np.empty((A, 4), np.int64)
    idx = np.empty((A, 4), np.int64)
    segb = np.empty((A, 4), np.int64)
    sym8 = np.empty((A, 4), np.uint8)
    fr = np.empty((A, 4), np.int64)
    cm = np.empty((A, 4), np.int64)
    k = np.empty((A, 4), np.int64)
    m2 = np.empty((A, 4), bool)
    cs = np.empty((A, 4), np.int64)
    o0 = np.empty((A, 4), np.int64)
    b1 = np.empty((A, 4), np.int64)
    ends, next_check = check_ref
    ptrcol = ptr[:, 0]
    cs3 = cs[:, 3]
    for w in range(W):
        np.bitwise_and(S, _TOTFREQ - 1, out=f)
        np.add(rowbase2d, ctx, out=idx)
        seg_flat.take(idx, out=segb)
        np.add(segb, f, out=idx)
        sym_arena.take(idx, out=sym8)
        buf[w] = sym8
        np.multiply(sym8, 1, out=ctx, casting="unsafe")  # widen to i64
        np.right_shift(segb, 4, out=segb)  # slot*4096 -> slot*256
        np.add(segb, ctx, out=idx)
        fr_flat.take(idx, out=fr)
        cum_flat.take(idx, out=cm)
        np.right_shift(S, _TF_SHIFT, out=S)
        np.multiply(S, fr, out=S)
        np.add(S, f, out=S)
        np.subtract(S, cm, out=S)  # s' = fr*(s>>12) + f - cum[sym]
        np.less(S, _LOW, out=k, casting="unsafe")
        np.less(S, _HALF, out=m2)
        np.add(k, m2, out=k)
        k.cumsum(axis=1, out=cs)
        np.subtract(cs, k, out=o0)
        np.add(o0, ptr, out=o0)
        data16.take(o0, out=b1)
        np.left_shift(k, 3, out=o0)
        np.left_shift(S, o0, out=S)
        np.subtract(16, o0, out=o0)
        np.right_shift(b1, o0, out=b1)
        np.bitwise_or(S, b1, out=S)
        np.add(ptrcol, cs3, out=ptrcol)
        next_check -= 1
        if next_check <= 0:
            if (ptrcol > ends).any():
                raise ValueError("truncated rANS block")
            next_check = _CHECK_EVERY
    check_ref[1] = next_check


def _lockstep0(items: list["_Item0"]) -> None:
    A = len(items)
    packed = np.concatenate([
        (it.tab[1] << 20)
        | (it.tab[0].astype(np.int64) << 12)
        | it.tab[2]
        for it in items
    ])
    joined = b"".join(it.data + b"\0" * _PAD for it in items)
    data16 = _pair_view(joined)

    starts = np.empty(A, np.int64)
    ends = np.empty(A, np.int64)
    out_base = np.empty(A, np.int64)
    off = ob = 0
    for b, it in enumerate(items):
        starts[b] = off
        ends[b] = off + len(it.data)
        off += len(it.data) + _PAD
        out_base[b] = ob
        ob += it.n
    out_flat = np.empty(ob, np.uint8)

    ids = np.arange(A, dtype=np.int64)
    S = np.asarray([it.states for it in items], np.int64)
    ptr = (starts + np.asarray([it.ptr for it in items], np.int64))[:, None]
    n_arr = np.asarray([it.n for it in items], np.int64)

    wave = 0
    carry = _CHECK_EVERY  # truncation-check counter carries across
    # phases so the pad invariant (<= _CHECK_EVERY unchecked waves, i.e.
    # <= _PAD bytes of drift) holds at phase boundaries too
    while ids.size:
        rem = n_arr - 4 * wave
        keep = rem >= 4
        if keep.sum() < _MIN_LANES:
            keep[:] = False
        # blocks at their final partial wave (rem 1-3) — or everything,
        # below the lockstep breakeven — finish on the tuned scalar
        # continuation (mid-stream rANS state is resumable)
        hand = (rem > 0) & ~keep
        for t in np.flatnonzero(hand).tolist():
            g = int(ids[t])
            it = items[g]
            i0 = it.n - int(rem[t])
            seg = _scalar0_finish(
                joined, int(ptr[t, 0]), int(ends[g]),
                S[t].tolist(), _tuple_table(*it.tab), i0, it.n,
            )
            o = int(out_base[g])
            out_flat[o + i0 : o + it.n] = np.frombuffer(seg, np.uint8)
        if not keep.all():
            # blocks completing exactly on a wave boundary (n % 4 == 0)
            # skip the scalar handoff — give them its final overrun check
            di = np.flatnonzero(rem <= 0)
            if di.size and (ptr[di, 0] > ends[ids[di]]).any():
                raise ValueError("truncated rANS block")
            ki = np.flatnonzero(keep)
            ids, S, ptr, n_arr = ids[ki], S[ki], ptr[ki], n_arr[ki]
            rem = rem[ki]
            if ids.size == 0:
                break
        W = min(_PHASE_W, int(rem.min()) // 4)
        buf = np.empty((W, ids.size, 4), np.uint8)
        base2d = (ids << _TF_SHIFT)[:, None]
        check = [ends[ids], carry]
        _run_phase(S, ptr, base2d, packed, data16, buf, W, check)
        carry = check[1]
        # flush: item t's symbols for waves [wave, wave+W) interleave as
        # positions 4*wave .. 4*(wave+W) — contiguous per item after one
        # vectorized transpose
        bt = np.ascontiguousarray(buf.transpose(1, 0, 2)).reshape(
            ids.size, 4 * W
        )
        for t in range(ids.size):
            o = int(out_base[ids[t]]) + 4 * wave
            out_flat[o : o + 4 * W] = bt[t]
        wave += W

    for b, it in enumerate(items):
        o = int(out_base[b])
        it.out = out_flat[o : o + it.n]


# ---------------------------------------------------------------------------
# order-1 lockstep
# ---------------------------------------------------------------------------

class _Item1:
    __slots__ = ("data", "n", "ptr", "states", "tabs", "out")

    def __init__(self, data: bytes, n: int):
        self.data = data
        self.n = n
        tabs, p = _parse_order1_tables(data, 9)
        self.states = list(struct.unpack_from("<4I", data, p))
        self.ptr = p + 16
        self.tabs = tabs
        self.out = None


def _scalar1_finish(joined: bytes, it: "_Item1", p: int, end: int,
                    states: list, ctxs: list, i0: int) -> tuple:
    """Order-1 continuation from main-loop wave ``i0``: the four
    quarter-streams [i0, q) plus the state-3 ragged tail. Returns
    (per-quarter segments, tail). Context tuple-tables build lazily —
    a finished block's 1-3-symbol tail must not pay for all 256."""
    _cache: dict = {}

    def _tbl(c):
        t = _cache.get(c)
        if t is None:
            raw = it.tabs.get(c) or it.tabs[0]
            t = _cache[c] = _tuple_table(*raw)
        return t

    class _Lazy:
        def get(self, c):
            return _tbl(c)

        def __getitem__(self, c):
            return _tbl(c)

    tbls = _Lazy()
    q = it.n >> 2
    sts = [int(x) for x in states]
    cxs = [int(x) for x in ctxs]
    segs = [bytearray(q - i0) for _ in range(4)]
    for i in range(i0, q):
        for j in range(4):
            tb = tbls.get(cxs[j]) or tbls[0]
            s = sts[j]
            fr, bi, sym = tb[s & 4095]
            segs[j][i - i0] = sym
            s = fr * (s >> _TF_SHIFT) + bi
            while s < _LOW:
                s = (s << 8) | joined[p]
                p += 1
            sts[j] = s
            cxs[j] = sym
    tail = bytearray(it.n - 4 * q)
    s = sts[3]
    c3 = cxs[3]
    for i in range(len(tail)):
        tb = tbls.get(c3) or tbls[0]
        fr, bi, sym = tb[s & 4095]
        tail[i] = sym
        s = fr * (s >> _TF_SHIFT) + bi
        # renorm only while input remains: the final symbols of a
        # well-formed stream leave the state below LOW with nothing left
        while s < _LOW and p < end:
            s = (s << 8) | joined[p]
            p += 1
        c3 = sym
    if p > end:
        raise ValueError("truncated rANS block")
    return segs, bytes(tail)


def _lockstep1(items: list["_Item1"]) -> None:
    A = len(items)
    # two-level ctx-table arena: every (item, live-ctx) pair owns a
    # 4096-byte f->symbol segment in ONE uint8 arena (cache-friendly),
    # plus 256-entry freq/cum tables at slot*256. seg_flat[b*256 + ctx]
    # -> arena offset (slot*4096). A context never seen in the table
    # section falls back to the item's ctx-0 table (scalar parity:
    # `freqs[ctx] or freqs[0]`).
    sym_parts, fr_parts, cum_parts = [], [], []
    seg_base = np.zeros((A, 256), np.int64)
    arena = 0
    for b, it in enumerate(items):
        offs = {}
        for c, t in it.tabs.items():
            sym_f, fr_f, bias_f = t
            sym_parts.append(sym_f)
            s64 = sym_f.astype(np.int64)
            fr256 = np.zeros(256, np.int64)
            cum256 = np.zeros(256, np.int64)
            fr256[s64] = fr_f
            # bias[f] = f - cum[sym[f]]  =>  cum[sym] = f - bias[f]
            cum256[s64] = np.arange(_TOTFREQ, dtype=np.int64) - bias_f
            fr_parts.append(fr256)
            cum_parts.append(cum256)
            offs[c] = arena
            arena += _TOTFREQ
        row = np.full(256, offs.get(0, next(iter(offs.values()))), np.int64)
        for c, o in offs.items():
            row[c] = o
        seg_base[b] = row
    sym_arena = np.concatenate(sym_parts)
    fr_flat = np.concatenate(fr_parts)
    cum_flat = np.concatenate(cum_parts)
    seg_flat = seg_base.ravel()

    joined = b"".join(it.data + b"\0" * _PAD for it in items)
    data16 = _pair_view(joined)
    starts = np.empty(A, np.int64)
    ends = np.empty(A, np.int64)
    out_base = np.empty(A, np.int64)
    off = ob = 0
    for b, it in enumerate(items):
        starts[b] = off
        ends[b] = off + len(it.data)
        off += len(it.data) + _PAD
        out_base[b] = ob
        ob += it.n
    out_flat = np.empty(ob, np.uint8)

    q_all = np.asarray([it.n >> 2 for it in items], np.int64)
    ids = np.arange(A, dtype=np.int64)
    S = np.asarray([it.states for it in items], np.int64)
    ptr = (starts + np.asarray([it.ptr for it in items], np.int64))[:, None]
    ctx = np.zeros((A, 4), np.int64)

    def _finish(t: int, i0: int) -> None:
        g = int(ids[t])
        it = items[g]
        segs, tail = _scalar1_finish(
            joined, it, int(ptr[t, 0]), int(ends[g]),
            S[t].tolist(), ctx[t].tolist(), i0,
        )
        q = it.n >> 2
        o = int(out_base[g])
        for j in range(4):
            out_flat[o + j * q + i0 : o + (j + 1) * q] = np.frombuffer(
                bytes(segs[j]), np.uint8
            )
        if tail:
            out_flat[o + 4 * q : o + it.n] = np.frombuffer(tail, np.uint8)

    wave = 0
    carry = _CHECK_EVERY  # see _lockstep0: pad invariant across phases
    while ids.size:
        q_act = q_all[ids]
        rem = q_act - wave
        keep = rem > 0
        if keep.sum() < _MIN_LANES:
            keep[:] = False
        # finished items owe their state-3 ragged tail; below-breakeven
        # survivors hand the whole remainder to the scalar continuation
        for t in np.flatnonzero(~keep).tolist():
            _finish(t, min(wave, int(q_act[t])))
        if not keep.all():
            ki = np.flatnonzero(keep)
            ids, S, ptr, ctx = ids[ki], S[ki], ptr[ki], ctx[ki]
            rem = rem[ki]
            if ids.size == 0:
                break
        W = min(_PHASE_W, int(rem.min()))
        buf = np.empty((W, ids.size, 4), np.uint8)
        rowbase2d = (ids * 256)[:, None]
        check = [ends[ids], carry]
        _run_phase1(S, ptr, ctx, rowbase2d, seg_flat, sym_arena,
                    fr_flat, cum_flat, data16, buf, W, check)
        carry = check[1]
        # flush: state j of item t wrote quarter positions
        # [j*q + wave, j*q + wave + W) — contiguous per (item, state)
        # after one vectorized transpose
        bt = np.ascontiguousarray(buf.transpose(1, 2, 0))
        for t in range(ids.size):
            g = int(ids[t])
            q = int(q_all[g])
            o = int(out_base[g]) + wave
            for j in range(4):
                out_flat[o + j * q : o + j * q + W] = bt[t, j]
        wave += W

    for b, it in enumerate(items):
        o = int(out_base[b])
        it.out = out_flat[o : o + it.n]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def decode_batch(blobs: list) -> list:
    """Decode many rANS streams (full streams, 9-byte header included,
    paired with the block header's raw size or None) with the best
    available strategy. Semantics and errors match
    ``cram.rans_decode`` item-for-item."""
    from hadoop_bam_spark.formats import rans_native
    from hadoop_bam_spark.formats.cram import rans_decode

    out: list = [None] * len(blobs)
    native = rans_native.available()

    todo0: list = []
    todo1: list = []
    for i, (data, raw_size) in enumerate(blobs):
        if not data:
            if raw_size:
                raise ValueError("truncated rANS block")
            out[i] = b""
            continue
        order = data[0]
        if order not in (0, 1):
            raise ValueError(f"unsupported rANS order {order}")
        try:
            (n_out,) = struct.unpack_from("<I", data, 5)
        except struct.error:
            # 1-8 byte payload: header itself is truncated. Normalize to
            # ValueError so batch_rans_caches' fallback contract holds.
            raise ValueError("truncated rANS block") from None
        if raw_size is not None and n_out != raw_size:
            raise ValueError(
                f"rANS raw size mismatch: block header says {raw_size}, "
                f"stream embeds {n_out}"
            )
        if native:
            got = rans_native.decode(data[9:], order, n_out)
            if got is not None:
                out[i] = got
                continue
        (todo0 if order == 0 else todo1).append((i, data, n_out))

    for order, todo in ((0, todo0), (1, todo1)):
        if not todo:
            continue
        if len(todo) < _MIN_LANES:
            for i, data, n_out in todo:
                out[i] = rans_decode(data, n_out)
            continue
        try:
            if order == 0:
                items = [_Item0(d, n) for _, d, n in todo]
                _lockstep0(items)
            else:
                items = [_Item1(d, n) for _, d, n in todo]
                _lockstep1(items)
        except (IndexError, KeyError, struct.error):
            raise ValueError("truncated rANS block") from None
        for (i, _d, _n), it in zip(todo, items):
            out[i] = it.out.tobytes()
    return out
