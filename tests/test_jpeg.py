"""JPEG baseline decoder tests.

The encoder here is written INDEPENDENTLY of the decoder: it entropy-
codes chosen quantized coefficient arrays (no DCT — coefficients are
the ground truth), and expected pixels come from a direct O(N^4)
inverse-DCT double loop, not the decoder's separable matrix path. A
decoder bug in Huffman tables, zigzag, dequant, predictors, restart
handling, IDCT, upsampling, or color conversion breaks the comparison.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vrl_spark.operators.jpeg import decode_jpeg_pixels

ZIGZAG = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def direct_idct(coeffs_zz):
    """O(N^4) reference IDCT from zigzag-ordered coefficients (q=1)."""
    F = np.zeros((8, 8))
    for k, c in enumerate(coeffs_zz):
        F[ZIGZAG[k] // 8][ZIGZAG[k] % 8] = c
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    au = np.sqrt(1 / 8) if u == 0 else 0.5
                    av = np.sqrt(1 / 8) if v == 0 else 0.5
                    s += (au * av * F[u][v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x][y] = s + 128.0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --- minimal encoder -------------------------------------------------

def canonical_codes(counts, symbols):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per T.81

    def raw_marker(self, b):
        self.pad()
        self.out += bytes([0xFF, b])


def size_cat(v):
    s = 0
    a = abs(v)
    while a:
        s += 1
        a >>= 1
    return s


def encode_block(bw, coeffs_zz, pred, dc_codes, ac_codes):
    diff = coeffs_zz[0] - pred
    s = size_cat(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        mag = diff if diff > 0 else diff + (1 << s) - 1
        bw.put(mag, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coeffs_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = coeffs_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s = size_cat(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        mag = v if v > 0 else v + (1 << s) - 1
        bw.put(mag, s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return coeffs_zz[0]


def used_ac_symbols(blocks):
    syms = {0x00, 0xF0}
    for b in blocks:
        run = 0
        last_nz = max([k for k in range(1, 64) if b[k]] or [0])
        for k in range(1, last_nz + 1):
            if b[k] == 0:
                run += 1
                continue
            while run > 15:
                run -= 16
            syms.add((run << 4) | size_cat(b[k]))
            run = 0
    return sorted(syms)


def seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def build_jpeg(w, h, comps, blocks_per_comp, q=1, restart_interval=0):
    """comps: list of (id, hsamp, vsamp); blocks_per_comp: dict id ->
    list of zigzag coeff arrays in MCU scan order."""
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = bytes(range(12))
    dc_codes = canonical_codes(dc_counts, dc_syms)
    all_blocks = [b for bl in blocks_per_comp.values() for b in bl]
    ac_syms = bytes(used_ac_symbols(all_blocks))
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)  # all AC symbols at length 8
    ac_codes = canonical_codes(ac_counts, ac_syms)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    bw = BitWriter()
    idx = {cid: 0 for cid, _, _ in comps}
    pred = {cid: 0 for cid, _, _ in comps}
    n_mcu = 0
    rst = 0
    for _ in range(mcux * mcuy):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            bw.raw_marker(0xD0 + rst % 8)
            rst += 1
            pred = {cid: 0 for cid, _, _ in comps}
        for cid, hs, vs in comps:
            for _ in range(hs * vs):
                blk = blocks_per_comp[cid][idx[cid]]
                idx[cid] += 1
                pred[cid] = encode_block(bw, blk, pred[cid],
                                         dc_codes, ac_codes)
        n_mcu += 1
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --- tests -----------------------------------------------------------

def test_flat_gray_dc_only():
    # DC=16, q=1 -> every pixel exactly 16/8 + 128 = 130
    blk = [0] * 64
    blk[0] = 16
    data = build_jpeg(8, 8, [(1, 1, 1)], {1: [blk]})
    px = decode_jpeg_pixels(data)
    assert px is not None and px.shape == (8, 8, 3)
    assert (px == 130).all()


def test_gray_full_ac_matches_direct_idct():
    rng = np.random.RandomState(7)
    blocks = []
    for _ in range(2):  # 16x8 -> two MCUs, exercises DC prediction
        b = rng.randint(-30, 31, size=64).tolist()
        b[17] = 0  # plant zero runs
        b[18] = 0
        blocks.append(b)
    data = build_jpeg(16, 8, [(1, 1, 1)], {1: blocks})
    px = decode_jpeg_pixels(data)
    assert px is not None and px.shape == (8, 16, 3)
    for i, b in enumerate(blocks):
        want = direct_idct(b)
        got = px[:, 8 * i : 8 * i + 8, 0].astype(np.int32)
        assert np.abs(got - want.astype(np.int32)).max() <= 1, i


def test_color_420_flat():
    # flat RGB (200, 30, 60) via DC-only YCbCr at 4:2:0
    r, g, b = 200.0, 30.0, 60.0
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    def dc(v):
        return int(round(8 * (v - 128.0)))
    yb = [0] * 64; yb[0] = dc(y)
    cbb = [0] * 64; cbb[0] = dc(cb)
    crb = [0] * 64; crb[0] = dc(cr)
    data = build_jpeg(
        16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
        {1: [list(yb) for _ in range(4)], 2: [cbb], 3: [crb]},
    )
    px = decode_jpeg_pixels(data)
    assert px is not None and px.shape == (16, 16, 3)
    # expected: quantized DCs back through BT.601 inverse
    yq, cbq, crq = dc(y) / 8 + 128, dc(cb) / 8 + 128, dc(cr) / 8 + 128
    er = yq + 1.402 * (crq - 128)
    eg = yq - 0.344136 * (cbq - 128) - 0.714136 * (crq - 128)
    eb = yq + 1.772 * (cbq - 128)
    got = px[0, 0].astype(np.float64)
    assert abs(got[0] - er) <= 1 and abs(got[1] - eg) <= 1 \
        and abs(got[2] - eb) <= 1
    assert (px == px[0, 0]).all()  # flat everywhere


def test_restart_markers_reset_dc_prediction():
    blocks = []
    for v in (16, 40, -24):
        b = [0] * 64
        b[0] = v
        blocks.append(b)
    data = build_jpeg(24, 8, [(1, 1, 1)], {1: blocks},
                      restart_interval=1)
    px = decode_jpeg_pixels(data)
    assert px is not None
    for i, v in enumerate((16, 40, -24)):
        want = int(np.clip(round(v / 8 + 128), 0, 255))
        assert (px[:, 8 * i : 8 * i + 8, 0] == want).all(), i


def test_unsupported_and_garbage_return_none():
    assert decode_jpeg_pixels(b"notajpeg") is None
    # progressive (SOF2) declared -> None
    blk = [0] * 64
    blk[0] = 8
    data = bytearray(build_jpeg(8, 8, [(1, 1, 1)], {1: [blk]}))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(data)) is None


def test_quant_table_applied():
    blk = [0] * 64
    blk[0] = 4
    data = build_jpeg(8, 8, [(1, 1, 1)], {1: [blk]}, q=4)
    px = decode_jpeg_pixels(data)
    # 4 * q4 / 8 = 2 -> 130
    assert (px == 130).all()


def test_image_embedding_uses_real_jpeg_pixels():
    from vrl_spark.operators.multimodal import _image_embedding

    # flat gray 130 image -> luminance cells all 130/255
    blk = [0] * 64
    blk[0] = 16
    data = build_jpeg(8, 8, [(1, 1, 1)], {1: [blk]})
    emb = _image_embedding(data)
    assert emb[:4] == [round(130 / 255, 6)] * 4   # 2x2 mean luminance
    assert emb[4:7] == [round(130 / 255, 6)] * 3  # RGB means
    assert emb[7] == 0.0                          # flat -> zero std


def test_restart_markers_any_boundary_alignment():
    """Regression: when an interval's entropy bytes ended exactly at a
    bit-reader fill boundary, the RST marker was never peeked and
    decode crashed to None. Sweep varied DC magnitudes (=varied
    bitstream lengths) so segment ends land on every alignment."""
    rng = np.random.RandomState(11)
    for trial in range(40):
        # multiples of 8: v/8 is an integer, so expected pixels avoid
        # the .5 rounding boundary the float IDCT can land either side of
        vals = [int(v) * 8 for v in rng.randint(-112, 113, size=3)]
        blocks = []
        for v in vals:
            b = [0] * 64
            b[0] = v
            blocks.append(b)
        data = build_jpeg(24, 8, [(1, 1, 1)], {1: blocks},
                          restart_interval=1)
        px = decode_jpeg_pixels(data)
        assert px is not None, (trial, vals)
        for i, v in enumerate(vals):
            want = int(np.clip(round(v / 8 + 128), 0, 255))
            assert (px[:, 8 * i : 8 * i + 8, 0] == want).all(), (trial, i)


# --- progressive (SOF2) ----------------------------------------------
# Independent progressive encoder: spectral selection + successive
# approximation per T.81 Annex G / the public libjpeg encoder
# structure (EOB-run accumulation, buffered correction bits). Ground
# truth stays the direct O(N^4) IDCT of the chosen coefficients.


def _emit_eobrun(bw, ac_codes, state):
    if state["eobrun"] > 0:
        r = state["eobrun"].bit_length() - 1
        code, ln = ac_codes[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(state["eobrun"] - (1 << r), r)
        for b in state["be_bits"]:
            bw.put(b, 1)
        state["eobrun"] = 0
        state["be_bits"] = []


def _enc_ac_first(bw, ac_codes, coeffs_zz, ss, se, al, state):
    vals = []
    for k in range(ss, se + 1):
        t = abs(coeffs_zz[k]) >> al
        vals.append(t if coeffs_zz[k] >= 0 else -t)
    last = -1
    for i, t in enumerate(vals):
        if t:
            last = i
    if last < 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, ac_codes, state)
        return
    _emit_eobrun(bw, ac_codes, state)
    run = 0
    for i in range(last + 1):
        t = vals[i]
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = size_cat(t)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        mag = t if t > 0 else t + (1 << s) - 1
        bw.put(mag, s)
        run = 0
    if last < se - ss:
        state["eobrun"] += 1


def _enc_ac_refine(bw, ac_codes, coeffs_zz, ss, se, al, state):
    absv = [abs(coeffs_zz[k]) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    br_bits = []
    for i in range(se - ss + 1):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            _emit_eobrun(bw, ac_codes, state)
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            r -= 16
            for b in br_bits:
                bw.put(b, 1)
            br_bits = []
        if t > 1:  # history coefficient: one correction bit
            br_bits.append(t & 1)
            continue
        _emit_eobrun(bw, ac_codes, state)
        code, ln = ac_codes[(r << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if coeffs_zz[ss + i] >= 0 else 0, 1)
        for b in br_bits:
            bw.put(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        state["eobrun"] += 1
        state["be_bits"].extend(br_bits)


def build_progressive_jpeg(w, h, comps, blocks_per_comp, scans, q=1,
                           restart_interval=0):
    """comps: [(id, hs, vs)]; blocks_per_comp: id -> padded block grid
    in row-major (by, bx) order per the interleaved geometry;
    scans: [(comp_ids, ss, se, ah, al)]."""
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = bytes(range(12))
    dc_codes = canonical_codes(dc_counts, dc_syms)
    ac_counts = [0] * 16
    ac_counts[8] = 255  # symbols 0x00-0xFE at length 9
    ac_counts[9] = 1    # 0xFF at length 10 (count field is one byte)
    ac_syms = bytes(range(256))
    ac_codes = canonical_codes(ac_counts, ac_syms)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geom = {}
    for cid, hs, vs in comps:
        bw_pad, bh_pad = mcux * hs, mcuy * vs
        bw_full = -(-(-(-w * hs // hmax)) // 8)
        bh_full = -(-(-(-h * vs // vmax)) // 8)
        geom[cid] = (hs, vs, bw_pad, bh_pad, bw_full, bh_full)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)  # SOF2 progressive
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    rst = 0
    for comp_ids, ss, se, ah, al in scans:
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw = BitWriter()
        state = {"eobrun": 0, "be_bits": []}
        if ss == 0:  # DC scan
            if len(comp_ids) > 1:
                units = []
                for my in range(mcuy):
                    for mx in range(mcux):
                        for cid in comp_ids:
                            hs, vs, bwp, _, _, _ = geom[cid]
                            for by in range(vs):
                                for bx in range(hs):
                                    units.append(
                                        (cid,
                                         (my * vs + by) * bwp
                                         + mx * hs + bx))
                per_mcu = sum(geom[c][0] * geom[c][1] for c in comp_ids)
            else:
                cid = comp_ids[0]
                hs, vs, bwp, _, bwf, bhf = geom[cid]
                units = [(cid, by * bwp + bx)
                         for by in range(bhf) for bx in range(bwf)]
                per_mcu = 1
            pred = {cid: 0 for cid in comp_ids}
            n_mcu = 0
            for i, (cid, bi) in enumerate(units):
                if (restart_interval and i % per_mcu == 0 and n_mcu
                        and n_mcu % restart_interval == 0):
                    bw.raw_marker(0xD0 + rst % 8)
                    rst += 1
                    pred = {c: 0 for c in comp_ids}
                if i % per_mcu == per_mcu - 1:
                    n_mcu += 1
                v = blocks_per_comp[cid][bi][0] >> al  # arithmetic shift
                if ah == 0:
                    diff = v - pred[cid]
                    pred[cid] = v
                    s = size_cat(diff)
                    code, ln = dc_codes[s]
                    bw.put(code, ln)
                    if s:
                        mag = diff if diff > 0 else diff + (1 << s) - 1
                        bw.put(mag, s)
                else:
                    bw.put(v & 1, 1)
        else:  # AC scan: single component, non-interleaved
            cid = comp_ids[0]
            hs, vs, bwp, _, bwf, bhf = geom[cid]
            n = 0
            for by in range(bhf):
                for bx in range(bwf):
                    if restart_interval and n and n % restart_interval == 0:
                        _emit_eobrun(bw, ac_codes, state)
                        bw.raw_marker(0xD0 + rst % 8)
                        rst += 1
                    n += 1
                    blk = blocks_per_comp[cid][by * bwp + bx]
                    if ah == 0:
                        _enc_ac_first(bw, ac_codes, blk, ss, se, al, state)
                    else:
                        _enc_ac_refine(bw, ac_codes, blk, ss, se, al, state)
            _emit_eobrun(bw, ac_codes, state)
        bw.pad()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_spectral_selection_gray():
    rng = np.random.RandomState(11)
    blocks = []
    for _ in range(2):
        b = rng.randint(-30, 31, size=64).tolist()
        b[40] = 0  # plant a mid-band zero run
        b[41] = 0
        blocks.append(b)
    data = build_progressive_jpeg(
        16, 8, [(1, 1, 1)], {1: blocks},
        scans=[([1], 0, 0, 0, 0), ([1], 1, 5, 0, 0), ([1], 6, 63, 0, 0)],
    )
    px = decode_jpeg_pixels(data)
    assert px is not None and px.shape == (8, 16, 3)
    for i, b in enumerate(blocks):
        want = direct_idct(b)
        got = px[:, 8 * i : 8 * i + 8, 0].astype(np.int32)
        assert np.abs(got - want.astype(np.int32)).max() <= 1, i


def test_progressive_successive_approximation_gray():
    rng = np.random.RandomState(13)
    blocks = []
    for _ in range(3):
        b = rng.randint(-19, 20, size=64).tolist()  # odd values included
        blocks.append(b)
    # coarse bit-plane first (Al=1), then refinement to full precision
    data = build_progressive_jpeg(
        24, 8, [(1, 1, 1)], {1: blocks},
        scans=[
            ([1], 0, 0, 0, 1),      # DC first, Al=1
            ([1], 1, 63, 0, 1),     # AC first, Al=1
            ([1], 0, 0, 1, 0),      # DC refine
            ([1], 1, 63, 1, 0),     # AC refine
        ],
    )
    px = decode_jpeg_pixels(data)
    assert px is not None and px.shape == (8, 24, 3)
    for i, b in enumerate(blocks):
        want = direct_idct(b)
        got = px[:, 8 * i : 8 * i + 8, 0].astype(np.int32)
        assert np.abs(got - want.astype(np.int32)).max() <= 1, i


def test_progressive_eobrun_and_band_split():
    # 8 blocks, most with an empty high band -> EOB runs span blocks;
    # band split exercises per-band EOBRUN state isolation
    rng = np.random.RandomState(17)
    blocks = []
    for j in range(8):
        b = [0] * 64
        b[0] = rng.randint(-100, 101)
        if j in (0, 5):  # only two blocks carry AC detail
            for k in range(1, 6):
                b[k] = rng.randint(-20, 21)
            b[50] = 7
        blocks.append(b)
    data = build_progressive_jpeg(
        64, 8, [(1, 1, 1)], {1: blocks},
        scans=[
            ([1], 0, 0, 0, 1),
            ([1], 1, 9, 0, 1),
            ([1], 10, 63, 0, 1),
            ([1], 0, 0, 1, 0),
            ([1], 10, 63, 1, 0),
            ([1], 1, 9, 1, 0),
        ],
    )
    px = decode_jpeg_pixels(data)
    assert px is not None
    for i, b in enumerate(blocks):
        want = direct_idct(b)
        got = px[:, 8 * i : 8 * i + 8, 0].astype(np.int32)
        assert np.abs(got - want.astype(np.int32)).max() <= 1, i


def test_progressive_color_420_interleaved_dc():
    r, g, b = 200.0, 30.0, 60.0
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    def dc(v):
        return int(round(8 * (v - 128.0)))
    yb = [0] * 64; yb[0] = dc(y)
    cbb = [0] * 64; cbb[0] = dc(cb)
    crb = [0] * 64; crb[0] = dc(cr)
    data = build_progressive_jpeg(
        16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
        {1: [list(yb) for _ in range(4)], 2: [cbb], 3: [crb]},
        scans=[
            ([1, 2, 3], 0, 0, 0, 0),   # interleaved DC
            ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0), ([3], 1, 63, 0, 0),
        ],
    )
    px = decode_jpeg_pixels(data)
    assert px is not None and px.shape == (16, 16, 3)
    yq, cbq, crq = dc(y) / 8 + 128, dc(cb) / 8 + 128, dc(cr) / 8 + 128
    er = yq + 1.402 * (crq - 128)
    eg = yq - 0.344136 * (cbq - 128) - 0.714136 * (crq - 128)
    eb = yq + 1.772 * (cbq - 128)
    got = px[0, 0].astype(np.float64)
    assert abs(got[0] - er) <= 1 and abs(got[1] - eg) <= 1 \
        and abs(got[2] - eb) <= 1
    assert (px == px[0, 0]).all()


def test_progressive_matches_baseline_decode():
    """The same coefficients through the baseline and progressive
    codecs must produce IDENTICAL rasters (same dequant + IDCT)."""
    rng = np.random.RandomState(19)
    blocks = [rng.randint(-25, 26, size=64).tolist() for _ in range(4)]
    base = build_jpeg(32, 8, [(1, 1, 1)], {1: blocks}, q=2)
    prog = build_progressive_jpeg(
        32, 8, [(1, 1, 1)], {1: blocks}, q=2,
        scans=[
            ([1], 0, 0, 0, 2), ([1], 1, 20, 0, 2), ([1], 21, 63, 0, 2),
            ([1], 0, 0, 1, 1), ([1], 1, 20, 1, 1), ([1], 21, 63, 1, 1),
            ([1], 0, 0, 1, 0), ([1], 1, 20, 1, 0), ([1], 21, 63, 1, 0),
        ],
    )
    a = decode_jpeg_pixels(base)
    b = decode_jpeg_pixels(prog)
    assert a is not None and b is not None
    assert (a == b).all()


def test_progressive_restart_markers():
    blocks = []
    for v in (16, 40, -24, 8):
        b = [0] * 64
        b[0] = v
        b[3] = v // 2
        blocks.append(b)
    data = build_progressive_jpeg(
        32, 8, [(1, 1, 1)], {1: blocks}, restart_interval=2,
        scans=[([1], 0, 0, 0, 0), ([1], 1, 63, 0, 0)],
    )
    px = decode_jpeg_pixels(data)
    assert px is not None
    for i, b in enumerate(blocks):
        want = direct_idct(b)
        got = px[:, 8 * i : 8 * i + 8, 0].astype(np.int32)
        assert np.abs(got - want.astype(np.int32)).max() <= 1, i


def test_sequential_stream_mislabeled_progressive_is_rejected():
    # a baseline scan header (Ss=0, Se=63) is invalid in a progressive
    # frame: DC scans need Se=0 -> decoder must reject, not misdecode
    blk = [0] * 64
    blk[0] = 8
    data = bytearray(build_jpeg(8, 8, [(1, 1, 1)], {1: [blk]}))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(data)) is None
