"""Pure-stdlib baseline JPEG codec (decode + test-fixture encode).

Closes the last compressed-codec gap in the multimodal decode dispatch
(BMP and PNG are already real): `decode_jpeg` parses baseline sequential
DCT JFIF — DQT/SOF0/DHT/SOS marker walk, generic canonical-Huffman
reconstruction from DHT, MSB-first entropy decoding with 0xFF00
byte-unstuffing, dequantize → inverse zigzag → 8x8 float IDCT → level
shift, and YCbCr→RGB — for 8-bit 4:4:4 color and grayscale, no
interlace/progressive (those raise loudly).

`encode_jpeg` is the deterministic fixture encoder (same role as
``encode_bmp``/``encode_png``): forward DCT, Annex-K-style quant tables
scaled by quality, run-length + categorized coefficients, and VALID
flat-length canonical Huffman tables generated per image (every emitted
symbol gets one code length with slack so the reserved all-ones code is
never used) — suboptimal compression, simple and correct, and it
exercises the decoder's generic DHT path rather than a hardcoded table.

Python-speed note: this runs inside the Arrow-batched featurizer on
small media payloads; a production deployment swaps in libjpeg-turbo via
PIL at the same dispatch point (operators/multimodal.py::_decode).
"""

from __future__ import annotations

import math
import struct

# Annex K luminance/chrominance quantization tables (natural order).
_LUM_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_CHROM_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Zigzag scan: _ZIGZAG[i] = natural-order index of the i-th zigzag element.
def _build_zigzag() -> list[int]:
    order = []
    for s in range(15):
        idxs = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        if s % 2 == 0:
            idxs.reverse()
        order.extend(r * 8 + c for r, c in idxs)
    return order


_ZIGZAG = _build_zigzag()
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x * 8 + y] * _COS[x][u] * _COS[y][v]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += _C[u] * _C[v] * coef[u * 8 + v] * _COS[x][u] * _COS[y][v]
            out[x * 8 + y] = 0.25 * s
    return out


def _scale_q(table: list[int], quality: int) -> list[int]:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (q * s + 50) // 100)) for q in table]


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1s


def _category(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length() if v < 0 else 0


def _encode_value_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _block_symbols(zz: list[int], prev_dc: int) -> tuple[list, int]:
    """(symbol, value_bits, n_bits) stream for one quantized zigzag block."""
    syms = []
    diff = zz[0] - prev_dc
    s = _category(diff)
    syms.append(("dc", s, _encode_value_bits(diff, s), s))
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i]:
            last_nz = i
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(zz[i])
        syms.append(("ac", (run << 4) | s, _encode_value_bits(zz[i], s), s))
        run = 0
    if last_nz < 63:
        syms.append(("ac", 0x00, 0, 0))  # EOB
    return syms, zz[0]


def _flat_huffman(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """A VALID flat canonical Huffman table: every symbol at one code
    length L with 2^L >= n+1 slack (the all-ones code stays unused, as
    the spec reserves). Returns (bits[16], huffval, {sym: (code, len)})."""
    vals = sorted(symbols)
    n = max(1, len(vals))
    length = max(2, (n + 1).bit_length())  # 2^length >= n+1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    codes = {v: (i, length) for i, v in enumerate(vals)}
    return bits, vals, codes


def _rgb_to_ycbcr(px: tuple[int, int, int]) -> tuple[float, float, float]:
    r, g, b = px
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return y, cb, cr


def encode_jpeg(
    pixels: list[list[tuple[int, int, int]]], quality: int = 90
) -> bytes:
    """Minimal baseline JFIF encoder (8-bit, 4:4:4, no subsampling)."""
    h = len(pixels)
    w = len(pixels[0])
    qy = _scale_q(_LUM_Q, quality)
    qc = _scale_q(_CHROM_Q, quality)

    # pad to 8x8 blocks by edge replication
    bw, bh = (w + 7) // 8 * 8, (h + 7) // 8 * 8
    planes: list[list[list[float]]] = [[], [], []]  # per component, per block
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            blocks = [[0.0] * 64 for _ in range(3)]
            for yy in range(8):
                for xx in range(8):
                    sy = min(by + yy, h - 1)
                    sx = min(bx + xx, w - 1)
                    y, cb, cr = _rgb_to_ycbcr(pixels[sy][sx])
                    for ci, val in enumerate((y, cb, cr)):
                        blocks[ci][yy * 8 + xx] = val - 128.0
            for ci in range(3):
                planes[ci].append(blocks[ci])

    # quantize to zigzag blocks + collect symbol stream
    q_by_comp = (qy, qc, qc)
    zz_blocks: list[list[list[int]]] = [[], [], []]
    for ci in range(3):
        for blk in planes[ci]:
            coef = _fdct(blk)
            zz = [
                int(round(coef[_ZIGZAG[i]] / q_by_comp[ci][_ZIGZAG[i]]))
                for i in range(64)
            ]
            zz_blocks[ci].append(zz)

    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    streams: list[list] = [[], [], []]
    prev_dc = [0, 0, 0]
    n_blocks = len(zz_blocks[0])
    for bi in range(n_blocks):
        for ci in range(3):
            tbl = 0 if ci == 0 else 1
            syms, prev_dc[ci] = _block_symbols(zz_blocks[ci][bi], prev_dc[ci])
            for kind, sym, vbits, nbits in syms:
                (dc_syms if kind == "dc" else ac_syms)[tbl].add(sym)
            streams[ci].append(syms)

    dc_tables = [_flat_huffman(s) for s in dc_syms]
    ac_tables = [_flat_huffman(s) for s in ac_syms]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT (zigzag order)
    for tq, table in ((0, qy), (1, qc)):
        body = bytes([tq]) + bytes(table[_ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    for cls, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (bits, vals, _) in enumerate(tables):
            body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([3])
    for cid, tsel in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tsel])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # entropy-coded data
    bw_ = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(3):
            tbl = 0 if ci == 0 else 1
            for kind, sym, vbits, nbits in streams[ci][bi]:
                code, clen = (dc_tables if kind == "dc" else ac_tables)[tbl][2][sym]
                bw_.write(code, clen)
                if nbits:
                    bw_.write(vbits, nbits)
    bw_.flush()
    out += bw_.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decoder(bits: list[int], vals: list[int]):
    """Canonical table -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a baseline JFIF payload to (width, height, RGB rows)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    scan_comps: list[dict] = []
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(body[o + 1 : o + 65])
                nat = [0] * 64
                for i in range(64):
                    nat[_ZIGZAG[i]] = zz[i]
                qt[tq] = nat
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                huff[(cls, tid)] = _huff_decoder(bits, vals)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError("chroma subsampling unsupported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tsel = body[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tsel >> 4, "ac": tsel & 0xF}
                )
            data_start = pos
            break
        # other markers (APPn, COM) are skipped
    if data_start is None or not scan_comps:
        raise ValueError("JPEG missing SOS scan")

    reader = _BitReader(payload[data_start:])
    bw, bh = (w + 7) // 8 * 8, (h + 7) // 8 * 8
    nbx, nby = bw // 8, bh // 8
    planes = [
        [[0.0] * (nbx * 8) for _ in range(nby * 8)] for _ in scan_comps
    ]
    prev_dc = [0] * len(scan_comps)
    for by in range(nby):
        for bx in range(nbx):
            for ci, comp in enumerate(scan_comps):
                dc_tab = huff[(0, comp["dc"])]
                ac_tab = huff[(1, comp["ac"])]
                q = qt[comp["tq"]]
                zz = [0] * 64
                s = _read_symbol(reader, dc_tab)
                diff = _extend(reader.bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = _read_symbol(reader, ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    i += run
                    if i > 63:
                        raise ValueError("AC run overflows block")
                    zz[i] = _extend(reader.bits(size), size)
                    i += 1
                coef = [0.0] * 64
                for i in range(64):
                    coef[_ZIGZAG[i]] = zz[i] * q[_ZIGZAG[i]]
                px = _idct(coef)
                for yy in range(8):
                    row = planes[ci][by * 8 + yy]
                    for xx in range(8):
                        row[bx * 8 + xx] = px[yy * 8 + xx] + 128.0
    rows: list[list[tuple[int, int, int]]] = []
    clamp = lambda v: 0 if v < 0 else 255 if v > 255 else int(round(v))  # noqa: E731
    for yy in range(h):
        row = []
        for xx in range(w):
            if len(scan_comps) == 1:
                yv = planes[0][yy][xx]
                row.append((clamp(yv),) * 3)
            else:
                yv = planes[0][yy][xx]
                cb = planes[1][yy][xx] - 128.0
                cr = planes[2][yy][xx] - 128.0
                row.append(
                    (
                        clamp(yv + 1.402 * cr),
                        clamp(yv - 0.344136 * cb - 0.714136 * cr),
                        clamp(yv + 1.772 * cb),
                    )
                )
        rows.append(row)
    return w, h, rows


def decode_jpeg(payload: bytes) -> list[float]:
    """JPEG -> the featurizer's 8-dim content vector
    [width, height, mean_r, mean_g, mean_b, lum_mean, lum_std, 5.0]."""
    w, h, rows = decode_jpeg_pixels(payload)
    sr = sg = sb = 0
    lum_s = lum_s2 = 0.0
    for row in rows:
        for r, g, b in row:
            sr += r
            sg += g
            sb += b
            lum = 0.299 * r + 0.587 * g + 0.114 * b
            lum_s += lum
            lum_s2 += lum * lum
    n = w * h
    lum_mean = lum_s / n
    lum_var = max(lum_s2 / n - lum_mean * lum_mean, 0.0)
    return [
        float(w),
        float(h),
        sr / n,
        sg / n,
        sb / n,
        lum_mean,
        math.sqrt(lum_var),
        5.0,
    ]
