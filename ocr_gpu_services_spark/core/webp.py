"""WebP lossless (VP8L) codec — pure numpy + Python, from RFC 9649.

S3 format breadth: WebP is the highest-volume modern image format in
real web crawls after JPEG/PNG (the reference accepts any
cv2-decodable upload and grays it immediately,
/root/reference/src/api/v1/utils.py:15-18; cv2 links libwebp).  This
module implements the complete VP8L *lossless* bitstream: container
(incl. VP8X extended layout), all four transforms (predictor,
cross-color, subtract-green, color-indexing with sub-byte packing),
color cache, meta-prefix (spatially varying) code groups, and the
LZ77 backward references with the 2D distance map — i.e. everything
libwebp's lossless encoder emits at any quality/effort setting.

Lossy VP8 is a full video intra-frame codec (boolean arithmetic
coder, DCT, loop filter) and is out of scope by design: lossy rows
raise ValueError and degrade to the ``error`` column
(core/extract.py convention), visible rather than silent.

The decoder is the product path; ``vp8l_encode`` exists for the
fixture generator (deterministic bytes: no transforms, literal-only
prefix codes).  Interop is pinned in tests/test_webp.py against the
system libwebp via ctypes where present: libwebp-encoded images
(which exercise transforms, cache and backrefs) must decode to the
exact pixels, and fixture-encoded bytes must round-trip through
libwebp.

Per-row failures raise ValueError, including the crafted-header
pixel-count cap shared with the BMP/TIFF/GIF decoders.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_RIFF = b"RIFF"
MAGIC_WEBP = b"WEBP"
_VP8L_SIG = 0x2F
_MAX_PIXELS = 1 << 28                    # crafted-header guard

# RFC 9649 §4.2.2: LZ77 distance codes 1..120 address a 2D neighborhood
# (dx, dy) around the current pixel; codes >120 are linear distances.
# Table verified empirically against libwebp (crafted single-backref
# streams per code, decoded via WebPDecodeRGBA — tests/test_webp.py).
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

# code-length-code transmission order (same idea as DEFLATE's; note 16
# sits after 5, not at the end — RFC 9649 kCodeLengthCodeOrder)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]


class _BitReader:
    """LSB-first bit reader (VP8L packs bits little-endian within
    bytes; prefix-code bits are read one at a time, first bit = MSB of
    the canonical code)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                     # bit position

    def bits(self, n: int) -> int:
        p = self.pos
        end = p + n
        if (end + 7) >> 3 > len(self.data):
            raise ValueError("WebP: bitstream truncated")
        word = int.from_bytes(
            self.data[p >> 3:(end + 7) >> 3], "little")
        self.pos = end
        return (word >> (p & 7)) & ((1 << n) - 1)

    def bit(self) -> int:
        return self.bits(1)


# --------------------------------------------------------- prefix codes

class _Prefix:
    """Canonical prefix code as a flat peek table: entry at every index
    whose low ``length`` bits spell the code (bit-reversed, because the
    stream is read LSB-first while codes are assigned MSB-first)."""

    __slots__ = ("table", "peek", "single")

    def __init__(self, lengths: list[int]):
        maxlen = max(lengths, default=0)
        if maxlen == 0:
            raise ValueError("WebP: empty prefix code")
        if maxlen > 15:
            raise ValueError("WebP: prefix code too deep")
        syms = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
        if len(syms) == 1:
            self.single = syms[0][1]
            self.peek = 0
            self.table = None
            return
        self.single = None
        self.peek = maxlen
        table = [None] * (1 << maxlen)
        code = 0
        prev_len = syms[0][0]
        for l, s in syms:
            code <<= l - prev_len
            prev_len = l
            rev = int(f"{code:0{l}b}"[::-1], 2)
            step = 1 << l
            for idx in range(rev, 1 << maxlen, step):
                table[idx] = (s, l)
            code += 1
        if code != 1 << maxlen >> (maxlen - prev_len) and \
                any(t is None for t in table):
            # over-subscribed codes already collided above; only
            # under-full tables reach here
            raise ValueError("WebP: incomplete prefix code")
        self.table = table

    @classmethod
    def pair(cls, first: int, second: int) -> "_Prefix":
        """Two-symbol simple code: codes are assigned in TRANSMISSION
        order (first -> 0, second -> 1), not canonical symbol order."""
        p = cls.__new__(cls)
        p.single = None
        p.peek = 1
        p.table = [(first, 1), (second, 1)]
        return p

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        p = br.pos
        data = br.data
        avail = (len(data) << 3) - p
        n = self.peek if avail >= self.peek else avail
        if n <= 0:
            raise ValueError("WebP: bitstream truncated")
        word = int.from_bytes(data[p >> 3:(p + n + 7) >> 3], "little")
        idx = (word >> (p & 7)) & ((1 << n) - 1)
        ent = self.table[idx]
        if ent is None or ent[1] > avail:
            raise ValueError("WebP: bad prefix code in stream")
        br.pos = p + ent[1]
        return ent[0]


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Prefix:
    """One prefix code: simple (1-2 symbols) or normal (code-length
    coded) form, RFC 9649 §4.6.2."""
    if br.bit():                                    # simple form
        nsym = br.bit() + 1
        first = br.bits(8) if br.bit() else br.bit()
        lengths = [0] * alphabet
        if first >= alphabet:
            raise ValueError("WebP: simple-code symbol out of range")
        if nsym == 1:
            lengths[first] = 1           # zero-bit code, handled as single
            return _Prefix(lengths)
        second = br.bits(8)
        if second >= alphabet or second == first:
            raise ValueError("WebP: bad simple code pair")
        return _Prefix.pair(first, second)
    # normal form: code lengths themselves prefix-coded
    n_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(n_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _Prefix(clc_lengths)
    lengths = [0] * alphabet
    if br.bit():                                    # explicit max reads
        length_nbits = 2 + 2 * br.bits(3)
        max_reads = 2 + br.bits(length_nbits)
    else:
        max_reads = alphabet
    sym = 0
    prev = 8
    while sym < alphabet:
        if max_reads <= 0:
            break
        max_reads -= 1
        cl = clc.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.bits(2)
            lengths[sym:sym + rep] = [prev] * min(rep, alphabet - sym)
            sym += rep
        elif cl == 17:
            sym += 3 + br.bits(3)
        else:                                       # 18
            sym += 11 + br.bits(7)
    if sym > alphabet:
        raise ValueError("WebP: code lengths overflow alphabet")
    return _Prefix(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance value from its prefix code, §4.6.2.2."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


# ------------------------------------------------------- image decoding

def _decode_pixels(br: _BitReader, w: int, h: int,
                   main: bool = False) -> np.ndarray:
    """Decode one (entropy-coded) ARGB image to an (h*w, 4) uint8 array
    in ARGB channel order, §4.6.1-4.6.3."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"WebP: bad color-cache size {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    hbits = 0
    ngroups = 1
    if main and br.bit():                           # meta prefix codes
        hbits = br.bits(3) + 2
        mw = (w + (1 << hbits) - 1) >> hbits
        mh = (h + (1 << hbits) - 1) >> hbits
        mimg = _decode_pixels(br, mw, mh)
        # meta index = (red << 8) | green
        meta = ((mimg[:, 1].astype(np.int32) << 8)
                | mimg[:, 2]).reshape(mh, mw)
        ngroups = int(meta.max()) + 1

    galpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(ngroups):
        groups.append((_read_prefix_code(br, galpha),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 40)))

    n = w * h
    out = np.zeros((n, 4), np.uint8)                # A, R, G, B
    pix = out                                       # row view
    g_tree, r_tree, b_tree, a_tree, d_tree = groups[0]
    i = 0
    x = 0
    cache_shift = 32 - cache_bits if cache_bits else 0
    while i < n:
        if meta is not None:
            gi = meta[(i // w) >> hbits, x >> hbits]
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[gi]
        s = g_tree.read(br)
        if s < 256:                                 # literal
            r = r_tree.read(br)
            b = b_tree.read(br)
            a = a_tree.read(br)
            pix[i, 0] = a
            pix[i, 1] = r
            pix[i, 2] = s
            pix[i, 3] = b
            if cache_bits:
                argb = (a << 24) | (r << 16) | (s << 8) | b
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                      >> cache_shift] = argb
            i += 1
            x += 1
            if x == w:
                x = 0
        elif s < 256 + 24:                          # LZ77 backref
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(d_tree.read(br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n:
                raise ValueError("WebP: LZ77 reference out of range")
            for k in range(length):                 # may self-overlap
                pix[i + k] = pix[i + k - dist]
            if cache_bits:
                blk = pix[i:i + length].astype(np.uint32)
                argbs = ((blk[:, 0] << 24) | (blk[:, 1] << 16)
                         | (blk[:, 2] << 8) | blk[:, 3])
                for argb in argbs:
                    cache[(0x1E35A7BD * int(argb) & 0xFFFFFFFF)
                          >> cache_shift] = int(argb)
            i += length
            x = i % w
        else:                                       # color-cache hit
            idx = s - 256 - 24
            if cache is None or idx >= len(cache):
                raise ValueError("WebP: cache index without cache")
            argb = cache[idx]
            pix[i, 0] = argb >> 24
            pix[i, 1] = (argb >> 16) & 0xFF
            pix[i, 2] = (argb >> 8) & 0xFF
            pix[i, 3] = argb & 0xFF
            i += 1
            x += 1
            if x == w:
                x = 0
    return out


# ----------------------------------------------------------- transforms

def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.int32) + b) >> 1).astype(np.int32)


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    if mode == 0:
        p = np.zeros(4, np.int32)
        p[0] = 255
        return p
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:                                  # Select
        pfull = L.astype(np.int32) + T - TL
        pl = int(np.abs(pfull - L).sum())
        pt = int(np.abs(pfull - T).sum())
        return L if pl < pt else T
    if mode == 12:                                  # ClampAddSubtractFull
        return np.clip(L.astype(np.int32) + T - TL, 0, 255)
    if mode == 13:                                  # ClampAddSubtractHalf
        a = _avg2(L, T)
        d = a - TL
        # C-style trunc-toward-zero halving of the (possibly negative)
        # correction term
        half = np.where(d >= 0, d >> 1, -((-d) >> 1))
        return np.clip(a + half, 0, 255)
    raise ValueError(f"WebP: bad predictor mode {mode}")


def _inv_predictor(img: np.ndarray, modes: np.ndarray,
                   hbits: int) -> None:
    """In-place inverse predictor transform, §4.2.1.1.  ``img`` is
    (h, w, 4) int32 residuals -> pixels."""
    h, w = img.shape[:2]
    for y in range(h):
        row = img[y]
        above = img[y - 1] if y else None
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.zeros(4, np.int32)
                pred[0] = 255
            elif y == 0:
                pred = row[x - 1]
            elif x == 0:
                pred = above[x]
            else:
                mode = int(modes[y >> hbits, x >> hbits])
                tr = above[x + 1] if x + 1 < w else img[y - 1, 0]
                pred = _predict(mode, row[x - 1], above[x],
                                above[x - 1], tr)
            row[x] = (row[x] + pred) & 0xFF


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5, vectorized."""
    ts = t.astype(np.int8).astype(np.int32)
    cs = c.astype(np.int8).astype(np.int32)
    return (ts * cs) >> 5


def _inv_color_transform(img: np.ndarray, cts: np.ndarray,
                         hbits: int) -> None:
    """In-place inverse cross-color transform, §4.2.1.2.  ``cts`` is the
    (bh, bw, 4) transform image: red ch = red_to_blue, green ch =
    green_to_blue, blue ch = green_to_red."""
    h, w = img.shape[:2]
    ys = (np.arange(h) >> hbits)
    xs = (np.arange(w) >> hbits)
    g2r = cts[:, :, 3][np.ix_(ys, xs)]
    g2b = cts[:, :, 2][np.ix_(ys, xs)]
    r2b = cts[:, :, 1][np.ix_(ys, xs)]
    g = img[:, :, 2]
    r = (img[:, :, 1] + _ct_delta(g2r, g)) & 0xFF
    b = (img[:, :, 3] + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
    img[:, :, 1] = r
    img[:, :, 3] = b


def _decode_sub_image(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Transform/meta sub-image -> (h, w, 4) uint8 ARGB."""
    return _decode_pixels(br, w, h).reshape(h, w, 4)


def vp8l_decode(data: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload -> (h, w, 3) uint8 RGB (alpha is
    dropped: the extraction pipeline pages are opaque; partially
    transparent crawl images still gray deterministically)."""
    if not data or data[0] != _VP8L_SIG:
        raise ValueError("WebP: bad VP8L signature")
    br = _BitReader(data)
    br.pos = 8
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()                                        # alpha hint
    if br.bits(3) != 0:
        raise ValueError("WebP: unknown VP8L version")
    if w * h > _MAX_PIXELS:
        raise ValueError("WebP: bad dimensions")

    # transforms, in bitstream order; inverses apply in reverse
    transforms = []
    seen = set()
    eff_w = w
    while br.bit():
        t = br.bits(2)
        if t in seen:
            raise ValueError("WebP: repeated transform")
        seen.add(t)
        if t == 2:                                  # subtract green
            transforms.append(("subgreen",))
        elif t in (0, 1):                           # predictor / color
            sb = br.bits(3) + 2
            bw = (eff_w + (1 << sb) - 1) >> sb
            bh = (h + (1 << sb) - 1) >> sb
            sub = _decode_sub_image(br, bw, bh)
            transforms.append(("pred" if t == 0 else "color", sb, sub))
        else:                                       # color indexing
            psize = br.bits(8) + 1
            pal = _decode_sub_image(br, psize, 1)[0].astype(np.int32)
            pal = (np.cumsum(pal, axis=0) & 0xFF).astype(np.uint8)
            if psize <= 2:
                wbits = 3
            elif psize <= 4:
                wbits = 2
            elif psize <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("palette", pal, wbits, eff_w))
            eff_w = (eff_w + (1 << wbits) - 1) >> wbits

    img = _decode_pixels(br, eff_w, h, main=True) \
        .reshape(h, eff_w, 4).astype(np.int32)

    for tr in reversed(transforms):
        if tr[0] == "palette":
            _, pal, wbits, orig_w = tr
            if wbits:
                per = 1 << wbits                    # pixels per green byte
                bits = 8 >> wbits
                g = img[:, :, 2].astype(np.uint8)
                cols = []
                for k in range(per):
                    cols.append((g >> (k * bits)) & ((1 << bits) - 1))
                idx = np.stack(cols, axis=2).reshape(h, -1)[:, :orig_w]
            else:
                idx = img[:, :, 2][:, :orig_w]
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("WebP: palette index out of range")
            img = pal[idx].astype(np.int32)
        elif tr[0] == "subgreen":
            img[:, :, 1] = (img[:, :, 1] + img[:, :, 2]) & 0xFF
            img[:, :, 3] = (img[:, :, 3] + img[:, :, 2]) & 0xFF
        elif tr[0] == "color":
            _inv_color_transform(img, tr[2].astype(np.int32), tr[1])
        else:                                       # predictor
            _inv_predictor(img, tr[2][:, :, 2], tr[1])

    return img[:, :, 1:4].astype(np.uint8)          # ARGB -> RGB


def webp_decode(payload: bytes) -> np.ndarray:
    """-> HxWx3 uint8 RGB from a WebP container (VP8L only; lossy VP8
    raises — out of codec scope, row degrades to ``error``)."""
    if payload[:4] != MAGIC_RIFF or payload[8:12] != MAGIC_WEBP:
        raise ValueError("not a WebP")
    pos = 12
    saw_lossy = False
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return vp8l_decode(body)
        if fourcc == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)
    if saw_lossy:
        raise ValueError("WebP: lossy VP8 bitstream unsupported "
                         "(lossless VP8L only)")
    raise ValueError("WebP: no image chunk found")


# -------------------------------------------------------------- encoder

class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:     # LSB-first
        self.acc |= (value & ((1 << n) - 1)) << self.nacc
        self.nacc += n
        while self.nacc >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nacc -= 8

    def write_code(self, code: int, n: int) -> None  :
        """Prefix-code bits: MSB of the canonical code goes first."""
        for k in range(n - 1, -1, -1):
            self.write((code >> k) & 1, 1)

    def done(self) -> bytes:
        if self.nacc:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _write_literal_tree(bw: _BitWriter, alphabet: int) -> None:
    """Emit the fixed fixture prefix code: all 256 byte symbols at
    length 8 (Kraft-complete), any trailing alphabet symbols zero via
    a repeat-zero run."""
    bw.write(0, 1)                                  # normal form
    # CLC lengths: symbol 8 -> 1 bit, symbol 18 -> 1 bit; _CLC_ORDER
    # positions: 8 at slot 11, 18 at slot 1 -> 12 slots transmitted
    bw.write(12 - 4, 4)                             # 12 CLC slots
    clc = {8: 1, 18: 1}
    for i in range(12):
        bw.write(clc.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)                                  # no explicit max
    # canonical CLC codes: 8 -> 0, 18 -> 1 (1 bit each)
    for _ in range(256):
        bw.write_code(0, 1)                         # length 8
    if alphabet > 256:
        rest = alphabet - 256
        bw.write_code(1, 1)                         # CL symbol 18
        bw.write(rest - 11, 7)


def _lit_code(v: int) -> tuple[int, int]:
    """Canonical (code, nbits) under the fixture literal tree: all 256
    symbols at length 8, so the canonical code IS the byte value."""
    return v, 8


def _write_single_tree(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)                                  # simple form
    bw.write(0, 1)                                  # one symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def vp8l_encode(img: np.ndarray) -> bytes:
    """Minimal deterministic VP8L stream for the fixture generator: no
    transforms, no cache, literal-only codes (decodes with any
    conformant reader — pinned against libwebp in tests)."""
    if img.ndim == 2:
        rgb = np.stack([img] * 3, axis=2)
    else:
        rgb = img
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("vp8l_encode wants HxW or HxWx3 uint8")
    h, w = rgb.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("vp8l_encode: dimensions exceed VP8L limits")
    bw = _BitWriter()
    bw.write(_VP8L_SIG, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                                  # no alpha
    bw.write(0, 3)                                  # version
    bw.write(0, 1)                                  # no transforms
    bw.write(0, 1)                                  # no color cache
    bw.write(0, 1)                                  # no meta codes
    _write_literal_tree(bw, 256 + 24)               # green
    _write_literal_tree(bw, 256)                    # red
    _write_literal_tree(bw, 256)                    # blue
    _write_single_tree(bw, 255)                     # alpha: constant
    _write_single_tree(bw, 0)                       # distance: unused
    flat = rgb.reshape(-1, 3)
    for r, g, b in flat:
        c, n = _lit_code(int(g))
        bw.write_code(c, n)
        c, n = _lit_code(int(r))
        bw.write_code(c, n)
        c, n = _lit_code(int(b))
        bw.write_code(c, n)
    chunk = bw.done()
    if len(chunk) & 1:
        chunk += b"\x00"
    riff = (MAGIC_RIFF + struct.pack("<I", 4 + 8 + len(chunk))
            + MAGIC_WEBP + b"VP8L" + struct.pack("<I", len(chunk))
            + chunk)
    return riff
