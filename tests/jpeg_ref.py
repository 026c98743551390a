"""Independent minimal baseline JPEG ENCODER for testing the decoder in
osmexpress_spark/operators/multimodal.py (the same independent-model
strategy as the PNG work: the decoder is checked against bytes produced
by code that shares none of its tables or transforms beyond the public
T.81 spec).

Supports: 8-bit baseline sequential, grayscale or YCbCr, 4:4:4 and
4:2:0 sampling, optional restart intervals, per-call quality (uniform
quant scale). Deliberately simple — correctness over speed.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.3 typical Huffman tables: (bits[16], huffval)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _codes(bits, vals):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8

    def align(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits

    def raw_marker(self, m: int) -> None:
        self.align()
        self.buf += bytes([0xFF, m])


def _fdct_mat():
    x, u = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = np.cos((2 * x + 1) * u * np.pi / 16.0) / 2.0
    m[:, 0] /= np.sqrt(2.0)
    return m  # spatial rows, freq cols; F = M.T @ f @ M


def _cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amp(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(w, block, q, pred, dc_codes, ac_codes, half=128.0):
    m = _fdct_mat()
    coef = m.T @ (block - half) @ m
    qc = np.rint(coef / q).astype(int)
    zz = [int(qc.flat[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    t = _cat(diff)
    c, ln = dc_codes[t]
    w.put(c, ln)
    if t:
        w.put(_amp(diff, t), t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            w.put(c, ln)
            run -= 16
        s = _cat(zz[k])
        c, ln = ac_codes[(run << 4) | s]
        w.put(c, ln)
        w.put(_amp(zz[k], s), s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        w.put(c, ln)
    return zz[0]


def _pad_to(plane, mh, mw):
    h, w = plane.shape
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    quality_q: int = 1,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """img: HxW (grayscale) or HxWx3 (RGB) uint8. quality_q = the
    uniform quantization step (1 = near-lossless). subsample: '444' or
    '420' (ignored for grayscale)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full((8, 8), float(quality_q))

    if gray:
        planes = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsample == "420":
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb2 = cbp.reshape(cbp.shape[0] // 2, 2,
                              cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(crp.shape[0] // 2, 2,
                              crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [y, cb2, cr2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(subsample)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_to(p, mcuy * sv * 8 // 1, mcux * sh * 8 // 1)[: mcuy * sv * 8,
                                                           : mcux * sh * 8]
        for p, (sh, sv) in zip(planes, samp)
    ]
    # _pad_to pads up to multiples; force exact MCU-grid dims
    padded = [
        np.pad(
            p,
            ((0, mcuy * sv * 8 - p.shape[0]), (0, mcux * sh * 8 - p.shape[1])),
            mode="edge",
        )
        if p.shape != (mcuy * sv * 8, mcux * sh * 8)
        else p
        for p, (sh, sv) in zip(padded, samp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0; chroma reuses it — uniform step anyway)
    zzq = bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    for tc, th, (bits, vals) in (
        (0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHR), (1, 1, AC_CHR)
    ):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        tbl = 0 if i == 0 else 1
        sos += bytes([i + 1, (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_tabs = [_codes(*DC_LUM), _codes(*DC_CHR), _codes(*DC_CHR)]
    ac_tabs = [_codes(*AC_LUM), _codes(*AC_CHR), _codes(*AC_CHR)]
    preds = [0] * ncomp
    bw = _BitWriter()
    mcu_count, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, blk, q, preds[ci],
                            dc_tabs[ci], ac_tabs[ci],
                        )
            mcu_count += 1
    bw.align()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive (SOF2) encoder ---------------------------------------------
#
# Exercises all four progressive scan types against the SAME quantized
# coefficients encode_jpeg produces, so a correct decoder must return
# bit-identical channel means for both streams: DC first (Al=1,
# interleaved), DC refine, then per component AC first (1..63, Al=1)
# and AC refine (Al=0) with EOB runs and buffered correction bits
# (the jcphuff.c control flow re-derived from T.81 G.1.2).


# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the Annex
# K.3 baseline tables do not define; use a deliberately simple custom
# canonical table instead: 255 symbols at 9 bits + symbol 0xFF at 10
# (Kraft < 1, no 16-bit edge cases) covering every possible RS byte.
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(255)) + [255],
)


def _coef_blocks(plane, q):
    m = _fdct_mat()
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    out = []
    for y in range(by):
        row = []
        for x in range(bx):
            blk = plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8]
            qc = np.rint((m.T @ (blk - 128.0) @ m) / q).astype(int)
            row.append([int(qc.flat[ZIGZAG[i]]) for i in range(64)])
        out.append(row)
    return out


def _sos_header(comp_specs, ss, se, ah, al):
    body = bytes([len(comp_specs)])
    for cid, td, ta in comp_specs:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _ac_first_scan(w, blocks, ac_codes, al, restart_interval=0):
    eobrun = 0
    rst = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            c, ln = ac_codes[r << 4]
            w.put(c, ln)
            if r:
                w.put(eobrun - (1 << r), r)
            eobrun = 0

    for bi, blk in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            flush_eob()
            w.raw_marker(0xD0 + (rst & 7))
            rst += 1
        vals = [abs(blk[k]) >> al for k in range(64)]
        last = 63
        while last >= 1 and vals[last] == 0:
            last -= 1
        if last < 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for k in range(1, last + 1):
            v = vals[k]
            if v == 0:
                r += 1
                continue
            while r > 15:
                c, ln = ac_codes[0xF0]
                w.put(c, ln)
                r -= 16
            s = v.bit_length()
            c, ln = ac_codes[(r << 4) | s]
            w.put(c, ln)
            w.put(_amp(v if blk[k] >= 0 else -v, s), s)
            r = 0
        if last < 63:
            eobrun += 1
    flush_eob()


def _ac_refine_scan(w, blocks, ac_codes, al, restart_interval=0):
    eobrun = 0
    rst = 0
    be: list[int] = []

    def flush_eob():
        nonlocal eobrun, be
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            c, ln = ac_codes[r << 4]
            w.put(c, ln)
            if r:
                w.put(eobrun - (1 << r), r)
            eobrun = 0
            for b in be:
                w.put(b, 1)
            be = []

    for bi, blk in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            flush_eob()
            w.raw_marker(0xD0 + (rst & 7))
            rst += 1
        vals = [abs(blk[k]) >> al for k in range(64)]
        eob = 0
        for k in range(1, 64):
            if vals[k] == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(1, 64):
            temp = vals[k]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                c, ln = ac_codes[0xF0]
                w.put(c, ln)
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if temp > 1:
                br.append(temp & 1)
                continue
            flush_eob()
            c, ln = ac_codes[(r << 4) | 1]
            w.put(c, ln)
            w.put(0 if blk[k] < 0 else 1, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be += br
            if eobrun == 0x7FFF or len(be) > 900:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray,
    quality_q: int = 1,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) encode of the SAME quantized coefficients
    encode_jpeg emits, as four+ scans: interleaved DC first (Al=1),
    interleaved DC refine, then per component AC first (Ss=1..Se=63,
    Al=1) and AC refine (Al=0)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full((8, 8), float(quality_q))
    if gray:
        planes = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsample == "420":
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb2 = cbp.reshape(cbp.shape[0] // 2, 2,
                              cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(crp.shape[0] // 2, 2,
                              crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [y, cb2, cr2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        np.pad(
            p,
            ((0, mcuy * sv * 8 - p.shape[0]),
             (0, mcux * sh * 8 - p.shape[1])),
            mode="edge",
        )
        for p, (sh, sv) in zip(planes, samp)
    ]
    coefs = [_coef_blocks(p, q) for p in padded]
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")
    zzq = bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (bits, vals) in (
        (0, 0, DC_LUM), (1, 0, PROG_AC), (0, 1, DC_CHR), (1, 1, PROG_AC)
    ):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_tabs = [_codes(*DC_LUM)] + [_codes(*DC_CHR)] * (ncomp - 1)
    ac_tabs = [_codes(*PROG_AC)] * ncomp

    # scan 1: DC first, interleaved, Al=1
    out += _sos_header(
        [(i + 1, 0 if i == 0 else 1, 0) for i in range(ncomp)], 0, 0, 0, 1
    )
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_i, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
                preds = [0] * ncomp
            mcu_i += 1
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = coefs[ci][my * sv + by][mx * sh + bx][0] >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = _cat(diff)
                        c, ln = dc_tabs[ci][t]
                        bw.put(c, ln)
                        if t:
                            bw.put(_amp(diff, t), t)
    bw.align()
    out += bw.buf

    # scan 2: DC refine, interleaved, Ah=1 Al=0 (raw bits, no Huffman)
    out += _sos_header(
        [(i + 1, 0, 0) for i in range(ncomp)], 0, 0, 1, 0
    )
    bw = _BitWriter()
    mcu_i, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
            mcu_i += 1
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bw.put(coefs[ci][my * sv + by][mx * sh + bx][0] & 1, 1)
    bw.align()
    out += bw.buf

    # scans 3..: per component AC first (Al=1) then AC refine (Al=0),
    # over the component's NON-interleaved block grid
    for ci in range(ncomp):
        sh, sv = samp[ci]
        bwide = -(-(-(-w * sh // hmax)) // 8)
        bhigh = -(-(-(-h * sv // vmax)) // 8)
        blocks = [
            coefs[ci][uy][ux]
            for uy in range(bhigh)
            for ux in range(bwide)
        ]
        for encoder_fn, ah, al in (
            (_ac_first_scan, 0, 1), (_ac_refine_scan, 1, 0),
        ):
            out += _sos_header(
                [(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, ah, al
            )
            bw = _BitWriter()
            encoder_fn(bw, blocks, ac_tabs[ci], al, restart_interval)
            bw.align()
            out += bw.buf

    out += b"\xff\xd9"
    return bytes(out)


# --- 12-bit extended sequential (SOF1) encoder -------------------------------
#
# The Annex K.3 example tables only define 12 DC categories and 8-bit
# AC magnitudes; 12-bit precision needs DC categories to 15 and AC
# magnitude categories to 14, so use deliberately simple full canonical
# tables (the PROG_AC trick): all 16 DC symbols at 5 bits, the 256-way
# AC table shared with the progressive encoder.
DC_16 = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
         list(range(16)))


def encode_jpeg12(
    img: np.ndarray,
    quality_q: int = 1,
    subsample: str = "444",
) -> bytes:
    """img: HxW (grayscale) or HxWx3 (RGB) with values 0..4095.
    Emits a 12-bit extended sequential stream (SOF1, 16-bit DQT)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full((8, 8), float(quality_q))

    if gray:
        planes = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 2048.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 2048.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "444":
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
        elif subsample == "420":
            cbp, crp = _pad_to(cb, 2, 2), _pad_to(cr, 2, 2)
            planes = [
                y,
                cbp.reshape(cbp.shape[0] // 2, 2,
                            cbp.shape[1] // 2, 2).mean(axis=(1, 3)),
                crp.reshape(crp.shape[0] // 2, 2,
                            crp.shape[1] // 2, 2).mean(axis=(1, 3)),
            ]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(subsample)

    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        np.pad(
            p,
            ((0, mcuy * sv * 8 - p.shape[0]),
             (0, mcux * sh * 8 - p.shape[1])),
            mode="edge",
        )
        for p, (sh, sv) in zip(planes, samp)
    ]

    out = bytearray(b"\xff\xd8")
    # 16-bit-precision DQT (pq=1), table 0
    zzq = b"".join(
        struct.pack(">H", int(q.flat[ZIGZAG[i]])) for i in range(64)
    )
    out += b"\xff\xdb" + struct.pack(">H", 131) + b"\x10" + zzq
    sof = struct.pack(">BHHB", 12, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    out += b"\xff\xc1" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (bits, vals) in ((0, 0, DC_16), (1, 0, PROG_AC)):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc = _codes(*DC_16)
    ac = _codes(*PROG_AC)
    preds = [0] * ncomp
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, blk, q, preds[ci], dc, ac, half=2048.0
                        )
    bw.align()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


# --- Adobe APP14 streams: CMYK / YCCK / transform-0 RGB ----------------------
def _app14(transform: int) -> bytes:
    return (b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
            + struct.pack(">HHHB", 100, 0, 0, transform))


def rgb_to_cmyk_inv(img: np.ndarray) -> np.ndarray:
    """RGB uint8 -> the ADOBE-STORED (inverted) CMYK planes: s_k =
    max(r,g,b), s_c = r*255/s_k (0 where s_k == 0) — chosen so the
    naive decode r = s_c*s_k/255 inverts it exactly up to rounding."""
    img = np.asarray(img, dtype=np.float64)
    sk = img.max(axis=2)
    safe = np.where(sk == 0, 1.0, sk)
    inv = np.stack(
        [np.where(sk == 0, 0.0, img[..., i] * 255.0 / safe)
         for i in range(3)]
        + [sk],
        axis=2,
    )
    return np.rint(inv)


def encode_jpeg_adobe(
    planes4_or_rgb: np.ndarray,
    quality_q: int = 1,
    transform: int = 2,
) -> bytes:
    """Adobe-marked streams, 4:4:4, 8-bit:

    - transform=2 with an HxWx4 inverted-CMYK array -> YCCK (the first
      three planes go through the forward YCbCr transform; K as-is);
    - transform=0 with HxWx4 -> inverted CMYK stored directly;
    - transform=0 with HxWx3 -> plain RGB (no YCbCr), the Adobe
      3-channel corner."""
    img = np.asarray(planes4_or_rgb, dtype=np.float64)
    h, w = img.shape[:2]
    ncomp = img.shape[2]
    if ncomp == 4 and transform == 2:
        c, m, y_, k = (img[..., i] for i in range(4))
        yy = 0.299 * c + 0.587 * m + 0.114 * y_
        cb = 128.0 - 0.168736 * c - 0.331264 * m + 0.5 * y_
        cr = 128.0 + 0.5 * c - 0.418688 * m - 0.081312 * y_
        planes = [yy, cb, cr, k]
    elif transform == 0 and ncomp in (3, 4):
        planes = [img[..., i] for i in range(ncomp)]
    else:
        raise ValueError((ncomp, transform))

    q = np.full((8, 8), float(quality_q))
    mcux, mcuy = -(-w // 8), -(-h // 8)
    padded = [
        np.pad(p, ((0, mcuy * 8 - h), (0, mcux * 8 - w)), mode="edge")
        for p in planes
    ]
    out = bytearray(b"\xff\xd8")
    out += _app14(transform)
    zzq = bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (bits, vals) in ((0, 0, DC_LUM), (1, 0, AC_LUM)):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc = _codes(*DC_LUM)
    ac = _codes(*AC_LUM)
    preds = [0] * ncomp
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                blk = padded[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[ci] = _encode_block(bw, blk, q, preds[ci], dc, ac)
    bw.align()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


# --- lossless sequential (SOF3) encoder --------------------------------------
#
# T.81 Annex H: Huffman-coded differences against a spatial predictor,
# modulo 2^16, no DCT — bit-exact by construction. Difference
# categories run 0..16, so use a full 17-symbol canonical table.
DC_LL = ([0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
         list(range(17)))


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 4,
    pt: int = 0,
    prec: int = 8,
    restart_interval: int = 0,
) -> bytes:
    """img: HxW or HxWx3 integer array with values 0..2^prec-1.
    Point-transformed samples (>> pt) are coded; restart intervals are
    in samples (MCUs) and reset the prediction context to
    start-of-scan state (the shared convention with the decoder)."""
    img = np.asarray(img, dtype=np.int64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ncomp = 1 if gray else img.shape[2]
    planes = [img >> pt] if gray else [img[..., i] >> pt
                                       for i in range(ncomp)]

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    body = bytes([0x00]) + bytes(DC_LL[0]) + bytes(DC_LL[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    codes = _codes(*DC_LL)
    default = 1 << (prec - 1 - pt)
    bw = _BitWriter()
    unit, rst = 0, 0
    row_restart = [0] * ncomp
    for y in range(h):
        for x in range(w):
            if restart_interval and unit and unit % restart_interval == 0:
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
                for ci in range(ncomp):
                    row_restart[ci] = -1
            for ci in range(ncomp):
                p = planes[ci]
                if row_restart[ci] == -1:
                    px = default
                    row_restart[ci] = y
                elif y == row_restart[ci] and x == 0 and y == 0:
                    px = default
                elif y == row_restart[ci] or y == 0:
                    px = int(p[y, x - 1]) if x else default
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    ra, rb, rc = (int(p[y, x - 1]), int(p[y - 1, x]),
                                  int(p[y - 1, x - 1]))
                    px = [ra, rb, rc, ra + rb - rc,
                          ra + ((rb - rc) >> 1), rb + ((ra - rc) >> 1),
                          (ra + rb) >> 1][predictor - 1]
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if diff == -32768:
                    c, ln = codes[16]
                    bw.put(c, ln)
                else:
                    t = _cat(diff)
                    c, ln = codes[t]
                    bw.put(c, ln)
                    if t:
                        bw.put(_amp(diff, t), t)
            unit += 1
    bw.align()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)
