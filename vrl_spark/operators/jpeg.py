"""Baseline + progressive JPEG raster decoder, stdlib + numpy only.

Covers the sequential baseline process (SOF0) and the progressive
Huffman process (SOF2): 8-bit samples, 1- or 3-component YCbCr, any
h/v sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0), restart markers,
8- and 16-bit-precision quantization tables. Progressive scans support
the full T.81 Annex G feature set: spectral selection (Ss/Se bands),
successive approximation (Ah/Al bit-plane refinement, DC and AC), EOB
run lengths, and interleaved DC / non-interleaved AC scan geometry.
Arithmetic coding, hierarchical (SOF5+), and 12-bit precision return
None — the caller falls back to the metadata path.

This is a from-scratch implementation of the public ITU-T T.81 spec
(the reference repo has no JPEG code at all — its media handling stops
at opaque bytes). Decode cost is per-image Python+numpy inside a
mapInPandas task: the raster never crosses the shuffle, so the 100 TB
properties of the media pipeline (operators/multimodal.py docstring)
are unchanged.

Decoder structure:
- segment walk: DQT / SOF0 / DHT / SOS / DRI
- canonical Huffman decode via per-length (min, max, symbol-offset)
  tables — O(bits) per symbol, no tree objects
- per-MCU: DC diff + run-length AC in zigzag order, dequantize,
  separable matrix IDCT (numpy), +128 level shift
- chroma upsampling by pixel replication, BT.601 YCbCr -> RGB
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index k of the scan -> (row, col) flat index
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8-point DCT-II basis matrix: M[u, x] = alpha(u) cos((2x+1)u pi/16)
_M = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical Huffman table from a DHT spec (counts per length 1-16
    + symbols in code order)."""

    __slots__ = ("min_code", "max_code", "val_off", "symbols")

    def __init__(self, counts: list[int], symbols: bytes):
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_off = [0] * 17
        self.symbols = symbols
        code, k = 0, 0
        for ln in range(1, 17):
            self.val_off[ln] = k - code
            self.min_code[ln] = code
            code += counts[ln - 1]
            k += counts[ln - 1]
            self.max_code[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any marker (0xFF xx, xx != 0) and reports it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is not None:
                    self.marker = nxt
                    return self.nbits > 0
                else:
                    return self.nbits > 0
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Drop partial byte + consume an RST marker (after DRI).

        The reader may have buffered the interval's final data bytes
        without ever peeking the marker (fill stops at 24+ bits), so
        when no marker was observed, peek directly at the stream."""
        self.acc = 0
        self.nbits = 0
        if (
            self.marker is None
            and self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.marker = self.data[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None

    def decode_symbol(self, h: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            if code <= h.max_code[ln]:
                return h.symbols[h.val_off[ln] + code]
        raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(data: bytes):
    """Baseline or progressive JPEG -> HxWx3 uint8 RGB array
    (grayscale replicated), or None for non-JPEG / unsupported
    flavors."""
    try:
        return _decode(data)
    except Exception:
        return None


def _next_marker(data: bytes, pos: int) -> int:
    """Advance past entropy-coded data to the next real marker (skips
    0xFF00 stuffing and fill bytes; leaves RSTn to the caller)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return n


def _decode(data: bytes):
    if data[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            if frame is not None and frame.get("progressive") \
                    and frame.get("coeffs_ready"):
                return _finish_progressive(frame)
            return None
        if pos + 4 > n:
            return None
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec:
                    vals = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                qt[tid] = vals  # zigzag order
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1 : i + 17])
                total = sum(counts)
                syms = body[i + 17 : i + 17 + total]
                (huff_ac if cls else huff_dc)[tid] = _Huff(counts, syms)
                i += 17 + total
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            bits, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if bits != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/arithmetic/hierarchical frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan_ids = []
            tables = {}
            for i in range(ns):
                cid, t = body[1 + 2 * i], body[2 + 2 * i]
                scan_ids.append(cid)
                tables[cid] = (t >> 4, t & 0xF)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if frame["progressive"]:
                pos = _progressive_scan(
                    data, pos, frame, scan_ids, tables, ss, se, ah, al,
                    qt, huff_dc, huff_ac, restart_interval,
                )
                pos = _next_marker(data, pos)
                continue
            if ns != len(frame["comps"]):
                return None  # baseline multi-scan not supported
            if ns == 1:
                # single-component scan is non-interleaved: one data
                # unit per MCU regardless of declared sampling factors
                frame["comps"][0]["h"] = frame["comps"][0]["v"] = 1
            return _scan(data, pos, frame, tables, qt, huff_dc, huff_ac,
                         restart_interval)
    return None


def _scan(data, pos, frame, tables, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["cols"] = mcux * c["h"] * 8
        c["rows"] = mcuy * c["v"] * 8
        c["plane"] = np.zeros((c["rows"], c["cols"]), dtype=np.float64)
        c["pred"] = 0
        c["dc"], c["ac"] = tables[c["id"]]
        c["q"] = qt[c["tq"]]

    br = _BitReader(data, pos)
    coeffs = np.zeros(64, dtype=np.int32)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.align_to_marker()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dc_t, ac_t = huff_dc[c["dc"]], huff_ac[c["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs[:] = 0
                        s = br.decode_symbol(dc_t)
                        diff = _extend(br.bits(s), s) if s else 0
                        c["pred"] += diff
                        coeffs[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: skip 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            coeffs[k] = _extend(br.bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coeffs * c["q"]
                        spatial = _M.T @ block.reshape(8, 8) @ _M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = spatial
            n_mcu += 1

    return _assemble(comps, w, h, hmax, vmax)


def _assemble(comps, w, h, hmax, vmax):
    """Upsample component planes to full resolution by replication,
    crop to (h, w), convert BT.601 YCbCr -> RGB (grayscale
    replicated)."""
    planes = []
    for c in comps:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# progressive process (SOF2) — T.81 Annex G decode procedures
# ---------------------------------------------------------------------


def _prog_init(frame, qt):
    """Allocate per-component quantized-coefficient storage (zigzag
    order per block) sized to the padded interleaved-MCU grid; record
    the non-interleaved block geometry each AC scan walks."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                             dtype=np.int32)
        # full (non-interleaved) block counts: ceil(comp_px / 8) of
        # the component's own pixel dimensions
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        c["bw_full"] = -(-cw // 8)
        c["bh_full"] = -(-ch // 8)
        c["pred"] = 0
        c["q"] = qt[c["tq"]]
    frame["coeffs_ready"] = True


def _progressive_scan(data, pos, frame, scan_ids, tables, ss, se, ah, al,
                      qt, huff_dc, huff_ac, restart_interval):
    """Decode one progressive scan into the coefficient buffers;
    returns the stream position where entropy data ended."""
    if "hmax" not in frame:
        _prog_init(frame, qt)
    comps = {c["id"]: c for c in frame["comps"]}
    scan = [comps[cid] for cid in scan_ids]
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        return _prog_dc_scan(data, pos, frame, scan, tables, ah, al,
                             huff_dc, restart_interval)
    if len(scan) != 1:
        raise ValueError("AC scans are single-component")
    return _prog_ac_scan(data, pos, scan[0], tables, ss, se, ah, al,
                         huff_ac, restart_interval)


def _prog_dc_scan(data, pos, frame, scan, tables, ah, al, huff_dc,
                  restart_interval):
    br = _BitReader(data, pos)
    interleaved = len(scan) > 1
    for c in scan:
        c["pred"] = 0
    if interleaved:
        units = []  # (comp, by, bx) in MCU order
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            units.append((c, my * c["v"] + by,
                                          mx * c["h"] + bx))
        mcu_units = sum(c["h"] * c["v"] for c in scan)
    else:
        # non-interleaved DC scan: MCU = one block of this component
        c = scan[0]
        units = [(c, by, bx)
                 for by in range(c["bh_full"])
                 for bx in range(c["bw_full"])]
        mcu_units = 1
    n_mcu = 0
    for i, (c, by, bx) in enumerate(units):
        if (restart_interval and i % mcu_units == 0
                and n_mcu and n_mcu % restart_interval == 0):
            br.align_to_marker()
            for cc in scan:
                cc["pred"] = 0
        if i % mcu_units == mcu_units - 1:
            n_mcu += 1
        if ah == 0:
            s = br.decode_symbol(huff_dc[tables[c["id"]][0]])
            diff = _extend(br.bits(s), s) if s else 0
            c["pred"] += diff
            c["coef"][by, bx, 0] = c["pred"] << al
        elif br.bit():
            c["coef"][by, bx, 0] |= 1 << al
    return br.pos


def _prog_ac_scan(data, pos, c, tables, ss, se, ah, al, huff_ac,
                  restart_interval):
    br = _BitReader(data, pos)
    ac_t = huff_ac[tables[c["id"]][1]]
    state = {"eobrun": 0}
    n = 0
    for by in range(c["bh_full"]):
        for bx in range(c["bw_full"]):
            if restart_interval and n and n % restart_interval == 0:
                br.align_to_marker()
                state["eobrun"] = 0
            n += 1
            coef = c["coef"][by, bx]
            if ah == 0:
                _ac_first(br, ac_t, coef, ss, se, al, state)
            else:
                _ac_refine(br, ac_t, coef, ss, se, al, state)
    return br.pos


def _ac_first(br, ac_t, coef, ss, se, al, state):
    """T.81 G.1.2.2: first scan of an AC band (Ah=0)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode_symbol(ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        coef[k] = _extend(br.bits(s), s) << al
        k += 1


def _ac_refine(br, ac_t, coef, ss, se, al, state):
    """T.81 G.1.2.3: successive-approximation refinement of an AC band
    (Ah = Al+1). History coefficients absorb one correction bit each;
    newly significant ones arrive as +-1 at bit Al, positioned by runs
    of zero-history coefficients."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = br.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.bits(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                newval = p1 if br.bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if br.bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0:
                if br.bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _finish_progressive(frame):
    """Dequantize + IDCT every component's coefficient grid (batched
    numpy over all blocks) and assemble the image."""
    for c in frame["comps"]:
        deq = c["coef"].astype(np.float64) * c["q"][None, None, :]
        nat = np.zeros_like(deq)
        nat[..., _ZIGZAG] = deq
        bh, bw = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(bh, bw, 8, 8)
        spatial = _M.T @ blocks @ _M + 128.0
        c["plane"] = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble(frame["comps"], frame["w"], frame["h"],
                     frame["hmax"], frame["vmax"])
