"""Pure-numpy baseline JPEG codec (S5 — SURVEY §2.1).

Reference: main.nf:392-406 converts JPEG timelapse exports to grayscale
TIFF before segmentation. The container images lack Pillow/ImageMagick,
so the engine carries its own baseline decoder implemented from the
public ITU-T T.81 spec: SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS/RSTn/EOI
marker parse, canonical Huffman entropy decode with byte-stuffing and
restart handling, dequantise + dezigzag, 8×8 IDCT (exact float DCT-III
basis, no table approximations), MCU reassembly with 4:4:4 / 4:2:2 /
4:2:0 sampling factors. Grayscale output is the LUMA plane — for a
JPEG, Y *is* the BT.601 grayscale, so the JPEG→gray stage needs no
chroma upsample (chroma blocks are still entropy-decoded to keep the
bitstream in sync).

Out of baseline scope (raise ValueError, naming the variant):
progressive (SOF2), arithmetic coding (SOF9+), lossless, hierarchical,
12-bit precision. Those need Pillow/tifffile, which `decode_frame`
prefers automatically when installed.

``encode_jpeg_gray`` is the matching single-component writer (standard
Annex K luminance table scaled by quality, canonical example Huffman
tables) used to BYTE-BUILD test payloads — the same codec-proof
pattern as the TIFF/PNG/WAV baselines (images.py / media.py): the test
constructs the container from raw bytes, the decoder must read it back
bit-exactly (quality 100 keeps every coefficient, so round-trip error
is the DCT float path only, asserted ≤1 gray level).
"""

from __future__ import annotations

import struct

import numpy as np

#: JPEG zigzag order: zz[i] = (row, col) of the i-th coefficient
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

#: Annex K.1 luminance quantisation table (row-major 8×8)
_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

#: Annex K.3 example Huffman tables (counts per code length 1-16, symbols)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
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


def _dct_basis() -> np.ndarray:
    """8×8 DCT-II basis matrix C with orthonormal scaling:
    block = C.T @ coeff @ C is the exact 2-D IDCT."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] *= 1 / np.sqrt(2)
    return c * 0.5


_C = _dct_basis()


def _build_huffman(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(bit-length, code) -> symbol} (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over destuffed entropy-coded data."""

    def __init__(self, data: bytes):
        self.data = data
        self.byte = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.bit == 0:
            if self.byte >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            self.cur = self.data[self.byte]
            self.byte += 1
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_gray(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG to its grayscale (luma) plane, uint8
    (h, w). Raises ValueError on non-JPEG or beyond-baseline variants.
    """
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    restart_interval = 0
    frame = None
    scan = None
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(content):
            raise ValueError("JPEG truncated at marker boundary")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside scan
            continue
        if pos + 2 > len(content):
            raise ValueError("JPEG truncated inside segment header")
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        seg = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                raw = seg[p : p + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = vals[i]
                qtables[tid] = q
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                htables[(cls, tid)] = _build_huffman(counts, symbols)
                p += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} beyond 8-bit baseline")
            comps = []
            for i in range(ncomp):
                cid, hv, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} beyond baseline sequential "
                "(progressive/arithmetic/lossless need Pillow)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0x0F})
            pos += seglen
            break  # entropy-coded data follows
        # APPn / COM / others: skip
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # entropy data: up to EOI, split on RST markers, destuffed
    data = content[pos:]
    end = data.rfind(b"\xff\xd9")
    if end >= 0:
        data = data[:end]
    intervals = []
    cur = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))

    comps = frame["comps"]
    # T.81 A.2: a single-component scan is always NON-interleaved — its
    # sampling factors apply only to multi-component interleave, so the
    # MCU is one block regardless of declared h/v
    if len(comps) == 1:
        comps[0]["h"] = comps[0]["v"] = 1
    # this decoder supports the dominant baseline layout: ONE
    # interleaved scan covering every frame component; a multi-scan
    # (non-interleaved) baseline file is legal T.81 but out of scope
    scan_ids = {s["id"] for s in scan}
    missing = [c["id"] for c in comps if c["id"] not in scan_ids]
    if missing:
        raise ValueError(
            "multi-scan (non-interleaved) baseline JPEG: components "
            f"{missing} are not in the first scan — install Pillow for "
            "this variant"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)
    for c in comps:
        c["plane"] = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        sc = next(s for s in scan if s["id"] == c["id"])
        c["dct"] = htables[(0, sc["dc"])]
        c["act"] = htables[(1, sc["ac"])]
        c["pred"] = 0

    reader = _BitReader(intervals[0])
    interval_ix = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            interval_ix += 1
            reader = _BitReader(intervals[interval_ix])
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcus_x)
        for c in comps:
            q = qtables[c["q"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coeff = np.zeros((8, 8), dtype=np.float64)
                    s = reader.decode_symbol(c["dct"])
                    diff = _extend(reader.read_bits(s), s)
                    c["pred"] += diff
                    coeff[0, 0] = c["pred"] * q[0, 0]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(c["act"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        rr, cc = _ZIGZAG[k]
                        coeff[rr, cc] = _extend(reader.read_bits(s), s) * q[rr, cc]
                        k += 1
                    block = _C.T @ coeff @ _C + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block

    luma = comps[0]["plane"][: frame["h"], : frame["w"]]
    return np.clip(np.round(luma), 0, 255).astype(np.uint8)


def _huffman_encode_map(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """Inverse of _build_huffman: symbol -> (bit-length, code)."""
    return {s: (l, c) for (l, c), s in _build_huffman(counts, symbols).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _quality_tables(quality: int) -> tuple[np.ndarray, dict, dict]:
    """(quant 8×8, DC map, AC map) for a libjpeg-style quality factor —
    shared by both test writers so the scaling contract exists once."""
    if quality < 50:
        scale = 5000 // quality
    else:
        scale = 200 - 2 * quality
    q = (
        np.clip((_STD_LUMA_Q * scale + 50) // 100, 1, 255)
        .astype(np.int64)
        .reshape(8, 8)
    )
    return q, _huffman_encode_map(*_STD_DC_LUMA), _huffman_encode_map(*_STD_AC_LUMA)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _table_segments(q: np.ndarray) -> bytes:
    """DQT + the two DHT segments every writer emits."""
    zz_q = bytes(int(q[r, c]) for r, c in _ZIGZAG)
    return (
        _seg(0xDB, b"\x00" + zz_q)
        + _seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0]) + bytes(_STD_DC_LUMA[1]))
        + _seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0]) + bytes(_STD_AC_LUMA[1]))
    )


def encode_jpeg_gray(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode a uint8 grayscale array as a single-component baseline
    JPEG (Annex K tables, no subsampling). Test-payload writer for the
    decoder above; quality scales the Annex K.1 table the libjpeg way
    (50→1×, 100→all-ones lossless-quantisation). ``restart_interval``
    > 0 writes a DRI segment and RSTn markers every N MCUs (with DC
    predictor reset), exercising the decoder's restart path."""
    h, w = img.shape
    q, dc_map, ac_map = _quality_tables(quality)
    out = bytearray(b"\xff\xd8")
    out += _table_segments(q)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    pred = 0
    mcu_count = 0
    rst = 0
    pad_h = -(-h // 8) * 8
    pad_w = -(-w // 8) * 8
    padded = np.empty((pad_h, pad_w), dtype=np.float64)
    padded[:h, :w] = img.astype(np.float64)
    padded[h:, :w] = img[-1:, :].astype(np.float64)  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]

    for y0 in range(0, pad_h, 8):
        for x0 in range(0, pad_w, 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = 0
            mcu_count += 1
            pred = _encode_block(
                bw, padded[y0 : y0 + 8, x0 : x0 + 8], q, dc_map, ac_map, pred
            )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _emit_magnitude(v: int) -> tuple[int, int]:
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << s) - 1
    return s, code


def _encode_block(
    bw: _BitWriter,
    pixels: np.ndarray,
    q: np.ndarray,
    dc_map: dict,
    ac_map: dict,
    pred: int,
) -> int:
    """Forward-DCT + quantise + Huffman-code one 8×8 block; returns the
    new DC predictor. Shared by the gray and YCbCr test writers."""
    coeff = _C @ (pixels - 128.0) @ _C.T
    quant = np.round(coeff / q).astype(np.int64)
    diff = int(quant[0, 0]) - pred
    pred = int(quant[0, 0])
    s, code = _emit_magnitude(diff) if diff else (0, 0)
    length, hc = dc_map[s]
    bw.write(hc, length)
    if s:
        bw.write(code, s)
    zz = [int(quant[r, c]) for r, c in _ZIGZAG[1:]]
    run = 0
    last_nz = max((i for i, v in enumerate(zz) if v), default=-1)
    for i, v in enumerate(zz):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, hc = ac_map[0xF0]  # ZRL
            bw.write(hc, length)
            run -= 16
        s, code = _emit_magnitude(v)
        length, hc = ac_map[(run << 4) | s]
        bw.write(hc, length)
        bw.write(code, s)
        run = 0
    if last_nz < len(zz) - 1:  # EOB unless k=63 itself was coded
        length, hc = ac_map[0x00]
        bw.write(hc, length)
    return pred


def encode_jpeg_ycbcr(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    subsample: bool = False,
    quality: int = 90,
) -> bytes:
    """Three-component baseline JPEG test writer: 4:4:4
    (``subsample=False``, cb/cr same shape as y) or 4:2:0
    (``subsample=True``, cb/cr at half resolution, y dims multiples of
    16). One shared quant + Huffman table set for all components (legal
    per T.81; keeps the writer minimal). Exists to drive the DECODER's
    multi-component MCU/interleave/subsampling paths with byte-built
    payloads — the decoder returns the luma plane, so a round-trip
    compares against ``y`` regardless of chroma content."""
    h, w = y.shape
    q, dc_map, ac_map = _quality_tables(quality)
    sy = 2 if subsample else 1
    out = bytearray(b"\xff\xd8")
    out += _table_segments(q)
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (sy << 4) | sy, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    mcu = 8 * sy
    if h % mcu or w % mcu:
        raise ValueError(f"test writer needs dims divisible by {mcu}")
    planes = {
        "y": y.astype(np.float64),
        "cb": cb.astype(np.float64),
        "cr": cr.astype(np.float64),
    }
    bw = _BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}
    for my in range(h // mcu):
        for mx in range(w // mcu):
            for by in range(sy):
                for bx in range(sy):
                    blk = planes["y"][
                        (my * sy + by) * 8 : (my * sy + by) * 8 + 8,
                        (mx * sy + bx) * 8 : (mx * sy + bx) * 8 + 8,
                    ]
                    preds["y"] = _encode_block(bw, blk, q, dc_map, ac_map, preds["y"])
            for name in ("cb", "cr"):
                blk = planes[name][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[name] = _encode_block(bw, blk, q, dc_map, ac_map, preds[name])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
