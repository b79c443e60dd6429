"""Progressive-JPEG (SOF2) decode — successive approximation + spectral
selection, stdlib + numpy.

``jpegdecode.py`` moved the lossy-codec boundary to "baseline
sequential JPEG really decodes; progressive is in-scope-but-
unimplemented". This module moves it again (round-15 verdict ask #2):
most web JPEGs are progressive, and progressive decode is still pure
published arithmetic — ITU-T T.81 section G: spectral-selection bands,
successive-approximation point transforms, EOBRUN run coding across
blocks, and the refinement-scan correction-bit algorithm (figure G.7).
No codec library is involved. (Round 17 moved the AUDIO boundary the
same way — operators/mp3.py decodes MPEG-1 Layer III; H.264 stays the
one loud codec stub, routed to codec workers at 100 TB.)

The planted coefficient pattern is IMPORTED from jpegdecode (same
(doc_id, block, component, zigzag) arithmetic, same grid), so the same
coefficient/pixel statistics certify this decoder — and three NEW
columns pin the progressive structure itself:

- ``n_scans`` — SOS segments actually decoded (the fixed 10-scan
  plan below);
- ``sum_ac_first`` — the sum of every AC coefficient as it stands
  AFTER the four first (Ah=0, Al=1) AC scans and BEFORE any
  refinement: the point transform truncates toward zero, so each
  planted v contributes trunc(v/2)*2. A decoder that skips the
  two-stage reconstruction cannot produce this number;
- ``n_new_nonzero`` — coefficients placed by the refinement scans
  (|v| == 1: invisible at Al=1, newly nonzero at Al=0), exercising
  the (run<<4|1)+sign path of G.1.2.3;
- ``n_corr_one`` — correction bits equal to 1 read at
  nonzero-history positions (|v| >= 2 with |v| odd), exercising the
  buffered-correction-bit path including bits read under EOBRUN
  block skips.

Scan plan (10 scans — DC interleaved, AC per-component, luma band
split so a band STARTS mid-spectrum, refinement mirroring the first
scans):

  1  DC  comps 1,2,3  Ss=0  Se=0   Ah=0 Al=1   (Huffman diffs of dc>>1)
  2  AC  comp 1       Ss=1  Se=9   Ah=0 Al=1
  3  AC  comp 1       Ss=10 Se=63  Ah=0 Al=1
  4  AC  comp 2       Ss=1  Se=63  Ah=0 Al=1
  5  AC  comp 3       Ss=1  Se=63  Ah=0 Al=1
  6  DC  comps 1,2,3  Ss=0  Se=0   Ah=1 Al=0   (one raw bit per block)
  7  AC  comp 1       Ss=1  Se=9   Ah=1 Al=0
  8  AC  comp 1       Ss=10 Se=63  Ah=1 Al=0
  9  AC  comp 2       Ss=1  Se=63  Ah=1 Al=0
  10 AC  comp 3       Ss=1  Se=63  Ah=1 Al=0

The planted AC positions (1..10 and 20..39) straddle the luma band
split, so band handling is really exercised; EOB runs span multiple
blocks (even-parity blocks carry no ACs), so EOBn symbols with n >= 1
extra bits are really emitted; ZRL appears in both first and
refinement scans (the 1..10 -> 20..39 gap). The luma and chroma AC
tables assign DIFFERENT value orderings (the jpegdecode discipline) so
a table mixup decodes garbage instead of silently passing.

The DuckDB oracle recomputes every statistic from the planted
arithmetic — it never sees a byte — so a value-hash match certifies
synthesize -> 10-scan progressive Huffman -> destuff -> EOBRUN/
refinement decode -> dequantize -> (DC-exact) IDCT end-to-end. The
hand tests additionally pin cross-decoder agreement: the progressive
file and jpegdecode's baseline file for the same doc_id must decode to
IDENTICAL quantized coefficient tensors.

Scale shape: one Arrow-batched ``mapInPandas`` pass, no shuffle, no
state — embarrassingly parallel per document, same class as every
media pass here.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md §2
row 32l.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.operators.jpegdecode import (
    _DC_BITS,
    _DC_VALS,
    _ZZ_NP,
    _BitReader,
    _BitWriter,
    _amplitude,
    _dec_table,
    _enc_table,
    _grid,
    _idct2,
    _receive_extend,
    Q_CHROMA,
    Q_LUMA,
    planted_acs,
    planted_dcq,
)
from etl_pipeline_example_spark.sources.readers import read_table

JPEG2_SCHEMA = (
    "doc_id bigint, width int, height int, n_blocks bigint, n_px bigint,"
    " sum_px bigint, max_px int, n_ac_nonzero bigint, sum_ac bigint,"
    " zz_moment bigint, n_scans int, sum_ac_first bigint,"
    " n_new_nonzero bigint, n_corr_one bigint"
)

# Progressive AC Huffman spec: EOB0..EOB5 (run-length 1..63 across
# blocks), ZRL, and (run 0..15, size 1..3) — first-scan magnitudes are
# |v|>>1 <= 4 so size <= 3; refinement only ever emits size 1. 55
# symbols, all at code length 7 (canonical codes 0..54, nowhere near
# the all-ones prefix). Chroma permutes the value order so a table
# mixup is loud.
_ACP_BITS = [0] * 6 + [55] + [0] * 9
_ACP_VALS_LUMA = (
    [n << 4 for n in range(6)]  # EOB0..EOB5
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 4)]
)
_ACP_VALS_CHROMA = (
    [(r << 4) | s for r in reversed(range(16)) for s in range(1, 4)]
    + [0xF0]
    + [n << 4 for n in range(6)]
)

# scan plan rows: (comp_list, ss, se, ah, al)
_SCAN_PLAN: list[tuple[tuple[int, ...], int, int, int, int]] = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 9, 0, 1),
    ((0,), 10, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 9, 1, 0),
    ((0,), 10, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
]
N_SCANS = len(_SCAN_PLAN)


def _planted_zz(doc_id: int, bx: int, by: int, c: int) -> list[int]:
    """The full 64-entry quantized-coefficient vector (zigzag order)."""
    zz = [0] * 64
    zz[0] = planted_dcq(doc_id, bx, by, c)
    for pos, val in planted_acs(doc_id, bx, by):
        zz[pos] = val
    return zz


# ------------------------------------------------------------- encoder

class _AcScanState:
    """Per-scan EOBRUN + buffered-correction-bit state (T.81 G.1.2.2-3)."""

    def __init__(self, bw: _BitWriter, enc_ac: dict) -> None:
        self.bw = bw
        self.enc_ac = enc_ac
        self.eobrun = 0
        self.bits: list[int] = []  # buffered correction bits

    def emit_symbol(self, sym: int) -> None:
        code, length = self.enc_ac[sym]
        self.bw.write(code, length)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.emit_symbol(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            self.flush_bits()

    def flush_bits(self) -> None:
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []


def _encode_ac_first(
    st: _AcScanState, zz: list[int], ss: int, se: int, al: int
) -> None:
    """One block of an Ah=0 AC scan (T.81 G.1.2.2): point-transformed
    magnitudes with ZRL runs and cross-block EOBRUN."""
    vals = []
    for k in range(ss, se + 1):
        v = zz[k]
        vals.append(-((-v) >> al) if v < 0 else v >> al)  # trunc toward 0
    if not any(vals):
        st.eobrun += 1
        return
    run = 0
    for v in vals:
        if v == 0:
            run += 1
            continue
        st.flush_eobrun()
        while run > 15:
            st.emit_symbol(0xF0)
            run -= 16
        s, extra = _amplitude(v)
        st.emit_symbol((run << 4) | s)
        st.bw.write(extra, s)
        run = 0
    if run > 0:
        st.eobrun += 1


def _encode_ac_refine(
    st: _AcScanState, zz: list[int], ss: int, se: int, al: int
) -> None:
    """One block of an Ah=Al+1 AC refinement scan (T.81 figure G.7 /
    the public libjpeg encode_mcu_AC_refine shape): newly-nonzero
    coefficients as (run<<4|1)+sign; history coefficients as correction
    bits. Two buffered-bit pools, exactly as the spec's interleaving
    requires: bits from THIS block since the last symbol (``cur``)
    flush right after the next ZRL / (run,1) symbol; bits folded into
    an EOB run (``st.bits``) flush with the EOBn code — the decoder
    reads the former during its positional advance after the symbol
    and the latter while skipping EOB blocks."""
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eob = -1  # index (within band) of the LAST newly-nonzero coef
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    run = 0
    cur: list[int] = []  # correction bits buffered since last flush
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            st.flush_eobrun()
            st.emit_symbol(0xF0)
            run -= 16
            for b in cur:
                st.bw.write(b, 1)
            cur = []
        if t > 1:
            cur.append(t & 1)
            continue
        st.flush_eobrun()
        st.emit_symbol((run << 4) | 1)
        st.bw.write(1 if zz[ss + i] > 0 else 0, 1)
        for b in cur:
            st.bw.write(b, 1)
        cur = []
        run = 0
    if run > 0 or cur:
        st.eobrun += 1
        st.bits.extend(cur)


def encode_progressive(doc_id: int) -> bytes:
    """Complete valid 10-scan progressive JPEG (SOF2) carrying the same
    planted coefficients as jpegdecode.encode_jpeg(doc_id)."""
    nbx, nby = _grid(doc_id)
    w, h = nbx * 8, nby * 8
    coefs = [
        [[_planted_zz(doc_id, bx, by, c) for c in range(3)] for bx in range(nbx)]
        for by in range(nby)
    ]
    enc_dc = _enc_table(_DC_BITS, _DC_VALS)
    enc_ac = (
        _enc_table(_ACP_BITS, _ACP_VALS_LUMA),
        _enc_table(_ACP_BITS, _ACP_VALS_CHROMA),
    )
    scans: list[tuple[bytes, bytes]] = []
    for comps, ss, se, ah, al in _SCAN_PLAN:
        bw = _BitWriter()
        if ss == 0:  # DC scan, interleaved over all comps
            if ah == 0:
                pred = [0, 0, 0]
                for by in range(nby):
                    for bx in range(nbx):
                        for c in comps:
                            dc = coefs[by][bx][c][0] >> al
                            s, extra = _amplitude(dc - pred[c])
                            pred[c] = dc
                            code, length = enc_dc[s]
                            bw.write(code, length)
                            if s:
                                bw.write(extra, s)
            else:
                for by in range(nby):
                    for bx in range(nbx):
                        for c in comps:
                            bw.write((coefs[by][bx][c][0] >> al) & 1, 1)
        else:  # AC scan, single component, raster block order
            c = comps[0]
            st = _AcScanState(bw, enc_ac[0 if c == 0 else 1])
            enc = _encode_ac_first if ah == 0 else _encode_ac_refine
            for by in range(nby):
                for bx in range(nbx):
                    enc(st, coefs[by][bx][c], ss, se, al)
            st.flush_eobrun()
        if ss == 0:
            hdr = bytes([3])
            for c in comps:
                hdr += bytes([c + 1, ((0 if c == 0 else 1) << 4)])
        else:
            c = comps[0]
            hdr = bytes([1, c + 1, ((0 if c == 0 else 1) << 4) | (0 if c == 0 else 1)])
        hdr += bytes([ss, se, (ah << 4) | al])
        scans.append((hdr, bw.flush()))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = bytes([0]) + bytes(Q_LUMA) + bytes([1]) + bytes(Q_CHROMA)
    sof2 = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    dht = b"".join(
        bytes([cls_id]) + bytes(bits) + bytes(vals)
        for cls_id, bits, vals in [
            (0x00, _DC_BITS, _DC_VALS),
            (0x01, _DC_BITS, _DC_VALS),
            (0x10, _ACP_BITS, _ACP_VALS_LUMA),
            (0x11, _ACP_BITS, _ACP_VALS_CHROMA),
        ]
    )
    out = b"\xff\xd8" + seg(0xFFE0, app0) + seg(0xFFDB, dqt) + seg(0xFFC2, sof2) + seg(0xFFC4, dht)
    for hdr, data in scans:
        out += seg(0xFFDA, hdr) + data
    return out + b"\xff\xd9"


# ------------------------------------------------------------- decoder

class _ProgStats:
    """Diagnostics accumulated while decoding — each one pins a distinct
    arm of the progressive algorithm against the oracle."""

    def __init__(self) -> None:
        self.n_scans = 0
        self.sum_ac_first = 0  # AC sum snapshot before first refinement
        self.first_snapped = False
        self.n_new_nonzero = 0  # refinement (run,1)+sign placements
        self.n_corr_one = 0  # correction bits == 1 actually applied
        self.n_eobn_hi = 0  # EOBn decodes with n >= 1 (multi-block runs)
        self.n_zrl = 0  # ZRL (16-zero-run) symbols decoded


def _decode_ac_first_block(
    br: _BitReader, zz: list[int], actab: dict, ss: int, se: int, al: int,
    state: dict, stats: _ProgStats,
) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.symbol(actab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                if r:
                    stats.n_eobn_hi += 1
                state["eobrun"] = (1 << r) + (br.take(r) if r else 0) - 1
                return
            stats.n_zrl += 1
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive first scan")
        zz[k] = _receive_extend(br, s) << al
        k += 1


def _decode_ac_refine_block(
    br: _BitReader, zz: list[int], actab: dict, ss: int, se: int, al: int,
    state: dict, stats: _ProgStats,
) -> None:
    """T.81 G.1.2.3 refinement decode (the public libjpeg
    decode_mcu_AC_refine shape): correction bits ride along every
    positional advance, including under EOBRUN block skips."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = br.symbol(actab)
            r, s = rs >> 4, rs & 15
            sval = 0
            if s == 0:
                if r != 15:
                    if r:
                        stats.n_eobn_hi += 1
                    state["eobrun"] = (1 << r) + (br.take(r) if r else 0)
                    break
                stats.n_zrl += 1
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                sval = p1 if br.bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    if br.bit():
                        stats.n_corr_one += 1
                        if not (abs(zz[k]) & p1):
                            zz[k] += p1 if zz[k] > 0 else -p1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if sval and k <= se:
                zz[k] = sval
                stats.n_new_nonzero += 1
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if zz[k] != 0:
                if br.bit():
                    stats.n_corr_one += 1
                    if not (abs(zz[k]) & p1):
                        zz[k] += p1 if zz[k] > 0 else -p1
            k += 1
        state["eobrun"] -= 1


def decode_progressive(payload: bytes):
    """(planes, quantized, stats) for a 3-component 4:4:4 8-bit
    progressive JPEG: planes — 3 (h, w) uint8 arrays (dequantize +
    float64 IDCT + level shift); quantized — (nby, nbx, 3, 64) int32 in
    zigzag order; stats — _ProgStats (scan count + successive-
    approximation diagnostics)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    dims = None
    comp_q: list[int] = []
    coefs = None
    nbx = nby = 0
    stats = _ProgStats()
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                huff[(cls, tid)] = _dec_table(bits, list(body[i + 17 : i + 17 + n]))
                i += 17 + n
        elif marker == 0xC2:  # SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component progressive")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("only 4:4:4 sampling")
                comp_q.append(tq)
            dims = (w, h)
            nbx, nby = w // 8, h // 8
            coefs = [
                [[[0] * 64 for _ in range(3)] for _ in range(nbx)]
                for _ in range(nby)
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(
                "not progressive (SOF2) — use jpegdecode for baseline"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — one of possibly many scans
            if coefs is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scomps: list[tuple[int, int, int]] = []  # (comp, dc_tab, ac_tab)
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append((cid - 1, tabs >> 4, tabs & 0xF))
            ss, se, aa = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = aa >> 4, aa & 0xF
            # entropy data: up to the next real marker (stuffing is FF00)
            end = pos
            while True:
                end = payload.index(b"\xff", end)
                if payload[end + 1] != 0x00:
                    break
                end += 2
            data = payload[pos:end].replace(b"\xff\x00", b"\xff")
            pos = end
            stats.n_scans += 1
            if ah != 0 and not stats.first_snapped:
                # snapshot: every AC value as reconstructed by the
                # first (Ah=0) scans alone
                stats.sum_ac_first = sum(
                    coefs[by][bx][c][k]
                    for by in range(nby)
                    for bx in range(nbx)
                    for c in range(3)
                    for k in range(1, 64)
                )
                stats.first_snapped = True
            br = _BitReader(data)
            if ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                if ah == 0:
                    pred = [0] * 3
                    for by in range(nby):
                        for bx in range(nbx):
                            for c, dct, _act in scomps:
                                s = br.symbol(huff[(0, dct)])
                                pred[c] += _receive_extend(br, s)
                                coefs[by][bx][c][0] = pred[c] << al
                else:
                    for by in range(nby):
                        for bx in range(nbx):
                            for c, _dct, _act in scomps:
                                if br.bit():
                                    coefs[by][bx][c][0] |= 1 << al
            else:  # AC scan: exactly one component
                if ns != 1:
                    raise ValueError("AC scans must be non-interleaved")
                c, _dct, act = scomps[0]
                actab = huff[(1, act)]
                state = {"eobrun": 0}
                for by in range(nby):
                    for bx in range(nbx):
                        if ah == 0:
                            _decode_ac_first_block(
                                br, coefs[by][bx][c], actab, ss, se, al,
                                state, stats,
                            )
                        else:
                            _decode_ac_refine_block(
                                br, coefs[by][bx][c], actab, ss, se, al,
                                state, stats,
                            )
    if dims is None:
        raise ValueError("missing SOF2")
    w, h = dims
    quant = np.array(coefs, dtype=np.int32).reshape(nby, nbx, 3, 64)
    planes = [np.empty((h, w), dtype=np.uint8) for _ in range(3)]
    for by in range(nby):
        for bx in range(nbx):
            for c in range(3):
                nat = np.zeros(64, dtype=np.float64)
                nat[_ZZ_NP] = quant[by, bx, c] * np.asarray(
                    qt[comp_q[c]], dtype=np.int64
                )
                px = _idct2(nat.reshape(8, 8)) + 128.0
                planes[c][
                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                ] = np.clip(np.rint(px), 0, 255).astype(np.uint8)
    return planes, quant, stats


# -------------------------------------------------------------- operator

def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "doc_id", "width", "height", "n_blocks", "n_px", "sum_px",
        "max_px", "n_ac_nonzero", "sum_ac", "zz_moment", "n_scans",
        "sum_ac_first", "n_new_nonzero", "n_corr_one",
    ]
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            planes, quant, st = decode_progressive(encode_progressive(doc_id))
            nby, nbx = quant.shape[:2]
            ac = quant[:, :, :, 1:]
            nz = ac != 0
            posw = np.arange(1, 64, dtype=np.int64)
            zz_moment = int((ac.astype(np.int64) * posw).sum())
            ac_free = ~nz.any(axis=3)
            n_px = int(ac_free.sum()) * 64
            sum_px = 0
            max_px = 0
            for by in range(nby):
                for bx in range(nbx):
                    for c in range(3):
                        if ac_free[by, bx, c]:
                            blk = planes[c][
                                by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                            ]
                            sum_px += int(blk.sum(dtype=np.int64))
                            max_px = max(max_px, int(blk.max()))
            rows.append(
                {
                    "doc_id": doc_id,
                    "width": nbx * 8,
                    "height": nby * 8,
                    "n_blocks": nbx * nby * 3,
                    "n_px": n_px,
                    "sum_px": sum_px,
                    "max_px": max_px,
                    "n_ac_nonzero": int(nz.sum()),
                    "sum_ac": int(ac.sum(dtype=np.int64)),
                    "zz_moment": zz_moment,
                    "n_scans": st.n_scans,
                    "sum_ac_first": st.sum_ac_first,
                    "n_new_nonzero": st.n_new_nonzero,
                    "n_corr_one": st.n_corr_one,
                }
            )
        yield pd.DataFrame(rows, columns=cols)


def multimodal_decode_jpeg2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ..., n_scans, sum_ac_first, n_new_nonzero, n_corr_one):
    exact integer statistics of a REALLY-decoded synthesized
    progressive (SOF2) JPEG per document — 10 scans of spectral
    selection + successive approximation, certified at the coefficient
    level, with the refinement-pass diagnostics pinned separately."""
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id"
    )
    return docs.mapInPandas(_decode_batch, schema=JPEG2_SCHEMA)


# Oracle: pure planted-pattern arithmetic — never sees a byte. Shares
# the jpegdecode block-enumeration arithmetic and adds the successive-
# approximation columns: trunc(v/2)*2 per AC for the first-scan
# snapshot, |v|==1 counts for newly-nonzero, odd |v|>=2 counts for
# one-valued correction bits.
_NBX = "(2 + doc_id % 6)"
_NBY = "(2 + (doc_id * 3) % 6)"
_BX = f"(i % {_NBX})"
_BY = f"((i // {_NBX}) % {_NBY})"
_CC = f"(i // ({_NBX} * {_NBY}))"
_ACB = f"(({_BX} + {_BY} + doc_id) % 2 = 1)"
_P1 = f"(1 + (doc_id + {_BX}) % 10)"
_V1 = f"(1 + (doc_id + {_BX} + {_BY}) % 9)"
_P2 = f"(20 + ({_BY} + doc_id) % 20)"
_V2A = f"(1 + (7 * doc_id + {_BX}) % 9)"
_PXV = f"((doc_id + 5 * {_BX} + 11 * {_BY} + 29 * {_CC}) % 256)"

MULTIMODAL_DECODE_JPEG2_SQL = f"""
WITH blk AS (
  SELECT doc_id,
         [ CASE WHEN {_ACB} THEN -1 ELSE {_PXV} END
           for i in range({_NBX} * {_NBY} * 3) ] AS freevals,
         [ CASE WHEN {_ACB} THEN {_V1} - {_V2A} ELSE 0 END
           for i in range({_NBX} * {_NBY} * 3) ] AS acsum,
         [ CASE WHEN {_ACB} THEN {_P1} * {_V1} - {_P2} * {_V2A} ELSE 0 END
           for i in range({_NBX} * {_NBY} * 3) ] AS zzmom,
         [ CASE WHEN {_ACB} THEN 2 ELSE 0 END
           for i in range({_NBX} * {_NBY} * 3) ] AS acn,
         [ CASE WHEN {_ACB}
                THEN ({_V1} // 2) * 2 - ({_V2A} // 2) * 2 ELSE 0 END
           for i in range({_NBX} * {_NBY} * 3) ] AS acfirst,
         [ CASE WHEN {_ACB}
                THEN (CASE WHEN {_V1} = 1 THEN 1 ELSE 0 END)
                   + (CASE WHEN {_V2A} = 1 THEN 1 ELSE 0 END) ELSE 0 END
           for i in range({_NBX} * {_NBY} * 3) ] AS newnz,
         [ CASE WHEN {_ACB}
                THEN (CASE WHEN {_V1} > 1 AND {_V1} % 2 = 1
                           THEN 1 ELSE 0 END)
                   + (CASE WHEN {_V2A} > 1 AND {_V2A} % 2 = 1
                           THEN 1 ELSE 0 END) ELSE 0 END
           for i in range({_NBX} * {_NBY} * 3) ] AS corr1
  FROM documents
)
SELECT doc_id,
       cast({_NBX} * 8 AS int) AS width,
       cast({_NBY} * 8 AS int) AS height,
       cast({_NBX} * {_NBY} * 3 AS bigint) AS n_blocks,
       cast(64 * len(list_filter(freevals, v -> v >= 0)) AS bigint) AS n_px,
       cast(64 * list_sum(list_filter(freevals, v -> v >= 0)) AS bigint)
         AS sum_px,
       cast(list_max(freevals) AS int) AS max_px,
       cast(list_sum(acn) AS bigint) AS n_ac_nonzero,
       cast(list_sum(acsum) AS bigint) AS sum_ac,
       cast(list_sum(zzmom) AS bigint) AS zz_moment,
       cast({N_SCANS} AS int) AS n_scans,
       cast(list_sum(acfirst) AS bigint) AS sum_ac_first,
       cast(list_sum(newnz) AS bigint) AS n_new_nonzero,
       cast(list_sum(corr1) AS bigint) AS n_corr_one
FROM blk
"""


JPEGPROG_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_decode_jpeg2": multimodal_decode_jpeg2,
}

JPEGPROG_ORACLES: dict[str, str] = {
    "multimodal_decode_jpeg2": MULTIMODAL_DECODE_JPEG2_SQL,
}
