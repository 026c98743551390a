"""Independent minimal FLAC ENCODER for testing flac_decoder in
osmexpress_spark/operators/multimodal.py — same strategy as jpeg_ref:
built only from the public format spec, sharing no code with the
decoder.  FLAC is lossless, so the decoder must reproduce the source
samples' statistics exactly.

Covers: constant / verbatim / fixed(1,2) / LPC(2) subframes, Rice
residual partitions (orders 0 and 1) incl. the escape (raw) code,
wasted bits, independent / left-side / right-side / mid-side stereo,
any block size, real header CRC-8 and frame CRC-16.
"""

from __future__ import annotations


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _zigzag(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def _write_residuals(bw, res, order, blocksize, po, escape_part=None):
    bw.put(0, 2)  # method 0: 4-bit rice
    bw.put(po, 4)
    nparts = 1 << po
    idx = 0
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        part = res[idx : idx + n]
        idx += n
        if escape_part is not None and p == escape_part:
            raw = max(
                (abs(v).bit_length() + 1 for v in part), default=1
            )
            bw.put(15, 4)
            bw.put(raw, 5)
            for v in part:
                bw.put(v & ((1 << raw) - 1), raw)
            continue
        us = [_zigzag(v) for v in part]
        k = min(14, max((u.bit_length() - 1 for u in us), default=0))
        k = max(k, 0)
        bw.put(k, 4)
        for u in us:
            q = u >> k
            bw.put(0, q) if q else None
            bw.put(1, 1)
            if k:
                bw.put(u & ((1 << k) - 1), k)


_FIXED = {1: [1], 2: [2, -1]}


def _write_subframe(bw, samples, bps, kind, po, escape_part=None):
    blocksize = len(samples)
    wasted = 0
    if kind == "wasted":
        # all samples must share >=1 trailing zero bit
        wasted = 1
        assert all(s % 2 == 0 for s in samples)
        samples = [s >> 1 for s in samples]
        kind = "verbatim"
    eff = bps - wasted
    bw.put(0, 1)  # padding
    if kind == "constant":
        assert len(set(samples)) == 1
        bw.put(0, 6)
        _wasted_bits(bw, wasted)
        bw.put(samples[0], eff)
    elif kind == "verbatim":
        bw.put(1, 6)
        _wasted_bits(bw, wasted)
        for s in samples:
            bw.put(s, eff)
    elif kind in ("fixed1", "fixed2"):
        order = int(kind[-1])
        bw.put(8 + order, 6)
        _wasted_bits(bw, wasted)
        for s in samples[:order]:
            bw.put(s, eff)
        coefs = _FIXED[order]
        res = [
            samples[i]
            - sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _write_residuals(bw, res, order, blocksize, po, escape_part)
    elif kind == "lpc2":
        order, coefs, prec, shift = 2, [3, -1], 4, 1
        bw.put(32 + order - 1, 6)
        _wasted_bits(bw, wasted)
        for s in samples[:order]:
            bw.put(s, eff)
        bw.put(prec - 1, 4)
        bw.put(shift, 5)
        for c in coefs:
            bw.put(c, prec)
        res = [
            samples[i]
            - (sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
               >> shift)
            for i in range(order, blocksize)
        ]
        _write_residuals(bw, res, order, blocksize, po, escape_part)
    else:
        raise ValueError(kind)


def _wasted_bits(bw, wasted):
    if wasted == 0:
        bw.put(0, 1)
    else:
        bw.put(1, 1)
        bw.put(0, wasted - 1) if wasted > 1 else None
        bw.put(1, 1)


def _utf8_num(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits_needed = n.bit_length()
    for nbytes in range(2, 8):
        if bits_needed <= 6 * (nbytes - 1) + (7 - nbytes):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            payload = [(n >> (6 * i)) & 0x3F for i in range(nbytes - 1)]
            out = [lead | (n >> (6 * (nbytes - 1)))]
            out += [0x80 | p for p in reversed(payload)]
            return bytes(out)
    raise ValueError("frame number too large")


def encode_flac(
    channels: list[list[int]],
    rate: int = 8000,
    bps: int = 16,
    blocksize: int = 64,
    stereo: str = "independent",
    kinds=("verbatim", "fixed1", "fixed2", "lpc2"),
    po: int = 0,
    escape_part=None,
) -> bytes:
    """channels: per-channel signed sample lists (equal length)."""
    nch = len(channels)
    total = len(channels[0])
    out = bytearray(b"fLaC")
    si = _BW()
    si.put(1, 1)      # last metadata block
    si.put(0, 7)      # STREAMINFO
    si.put(34, 24)
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(total, 36)
    for _ in range(16):
        si.put(0, 8)  # md5 unset
    out += si.bytes()

    ch_code = nch - 1
    if stereo != "independent":
        assert nch == 2
        ch_code = {"left-side": 8, "right-side": 9, "mid-side": 10}[stereo]

    nframes = (total + blocksize - 1) // blocksize
    for fi in range(nframes):
        lo, hi = fi * blocksize, min((fi + 1) * blocksize, total)
        bs = hi - lo
        fh = _BW()
        fh.put(0b11111111111110, 14)
        fh.put(0, 1)
        fh.put(0, 1)  # fixed blocking
        fh.put(7, 4)  # 16-bit blocksize-1 at header end
        fh.put(0, 4)  # rate from STREAMINFO
        fh.put(ch_code, 4)
        fh.put(0, 3)  # bps from STREAMINFO
        fh.put(0, 1)
        fh.align()
        head = bytearray(fh.bytes())
        head += _utf8_num(fi)
        head += bytes([(bs - 1) >> 8, (bs - 1) & 0xFF])
        head.append(_crc8(bytes(head)))

        body = _BW()
        subs = []
        if stereo == "independent":
            subs = [(channels[c][lo:hi], bps) for c in range(nch)]
        else:
            left = channels[0][lo:hi]
            right = channels[1][lo:hi]
            side = [a - b for a, b in zip(left, right)]
            if stereo == "left-side":
                subs = [(left, bps), (side, bps + 1)]
            elif stereo == "right-side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
        for ci, (samples, sbps) in enumerate(subs):
            kind = kinds[(fi + ci) % len(kinds)]
            if kind == "constant" and len(set(samples)) != 1:
                kind = "verbatim"
            if kind == "wasted" and any(s % 2 for s in samples):
                kind = "verbatim"
            order = {"fixed1": 1, "fixed2": 2, "lpc2": 2}.get(kind, 0)
            if order >= bs:  # spec: predictor order < block size
                kind, order = "verbatim", 0
            use_po = po
            if bs % (1 << po) or (bs >> po) < order:
                use_po = 0
            _write_subframe(body, samples, sbps, kind, use_po, escape_part)
        body.align()
        frame = bytes(head) + body.bytes()
        crc = _crc16(frame)
        out += frame + bytes([crc >> 8, crc & 0xFF])
    return bytes(out)
