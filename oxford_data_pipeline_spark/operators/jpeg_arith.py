"""Arithmetic entropy coding for JPEG (ITU-T T.81 Annex D + F/G).

The QM-coder — the adaptive binary arithmetic coder of T.81's
SOF9/SOF10 processes — plus the DC/AC statistical models (Annex F
sequential, Annex G progressive).  This closes the repo's last JPEG
entropy-mode quarantine (carried since round 8; round-10 verdict
item 5 asked for exactly this: implement decode with a verified state
table, or close the decision).

Why this was quarantined before: the coder's probability-estimation
state machine is Table D.3 — 113 empirical rows (Qe value, next state
after MPS, next state after LPS, MPS-switch flag) that cannot be
derived, only transcribed.  A misremembered row decodes external
streams WRONGLY while self round-trips still pass (encoder and
decoder share the wrong table), which is strictly worse than a typed
error.  What unblocked it: this environment ships libjpeg62-turbo,
whose public `jpeg_aritab` symbol IS the spec table (spec DATA, not
code); `QM_TABLE` below was transcribed from that binary export and
spot-checked against the universally published first rows
(Qe(0)=0x5A1D, Qe(1)=0x2586, ...).  External conformance is then
pinned the strong way: tests/golden JPEG fixtures produced by
libjpeg's own arithmetic encoder must decode through THIS module to
the exact coefficients of their Huffman twins, and this module's
encoder output must decode identically through libjpeg
(tests/test_properties.py::test_jpeg_arithmetic_*; the gcc-built
harness regenerates the fixtures when available).

Coverage: sequential (SOF9) decode + encode, progressive (SOF10)
decode + encode (DC first/refine and AC first/refine scans; the
encoder emits the same 4-phase Annex-G scan script as the Huffman
progressive emitter, QM-coded, libjpeg-decode-verified), DAC
conditioning (L/U bounds, Kx), restart intervals, grayscale + YCbCr
4:4:4/4:2:0, 8-bit and 12-bit.  Arithmetic LOSSLESS (SOF11) and the differential
hierarchical arithmetic frames (SOF13-15) remain typed
NotImplementedError — they would need the Annex-H/J drivers re-plumbed
onto this coder and have no conformance source here.

Register conventions: the software conventions of T.81 Annex D (the
same ones libjpeg documents): interval [C, C + A) with the MPS
sub-interval at the bottom, A renormalized into [0x8000, 0x10000],
byte-oriented C with a bit-stuffing-free 0x00-after-0xFF byte stuff,
carry absorbed by buffering the last emitted byte plus a stacked-0xFF
count.
"""

from __future__ import annotations


# --------------------------------------------------------------------------
# ITU-T T.81 Table D.3 — the QM-coder probability estimation state
# machine: (Qe, NMPS, NLPS, SWITCH) per state.  Spec data transcribed
# from the installed libjpeg62-turbo's exported `jpeg_aritab` symbol
# (packed (Qe<<16)|(NMPS<<8)|(SWITCH<<7)|NLPS), NOT from memory — see
# module docstring for why that distinction is the whole point.
# --------------------------------------------------------------------------
QM_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1),
)

# Default conditioning (T.81 F.1.4.4.1.4 / F.1.4.4.2.1): DC bounds
# (L, U) = (0, 1), AC block-end index Kx = 5.
DEFAULT_DC_COND = (0, 1)
DEFAULT_AC_KX = 5

# Statistics-area sizes (T.81 F.1.4.4.1.3 / F.1.4.4.2): 49 DC bins
# (20 context bins: 5 diff classes x 4, X1..X15 at 20..34, magnitude
# bits at 34..48) and 245 AC bins (63x3 per-k bins, then the two
# shared magnitude areas at 189/217 with their value bins at +14).
DC_STAT_BINS = 64
AC_STAT_BINS = 256


class ArithDecoder:
    """QM decoder over one entropy-coded segment (T.81 D.2, software
    conventions).  Bytes are consumed with 0x00-after-0xFF destuffing;
    a marker freezes the feed at zero bytes (D.2.6's marker rule) and
    records its offset.  Statistics bins are bytearrays holding
    (state_index << 1) | MPS."""

    __slots__ = ("data", "pos", "end", "c", "a", "ct")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.end: int | None = None
        b0 = self._fetch()
        b1 = self._fetch()
        self.c = (b0 << 8) | b1
        self.ct = 0
        self.a = 0x10000

    def _fetch(self) -> int:
        if self.end is not None:
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("truncated entropy-coded segment")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2
                return 0xFF
            # marker: the scan's data is over — feed zeros from here on
            self.end = p
            return 0
        self.pos = p + 1
        return b

    def _renorm(self) -> None:
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            if ct == 0:
                c = (c << 8) | self._fetch()
                ct = 8
            a <<= 1
            ct -= 1
        self.a, self.c, self.ct = a, c, ct

    def decode(self, stats: bytearray, i: int) -> int:
        if self.a < 0x8000:
            self._renorm()
        sv = stats[i]
        qe, nmps, nlps, sw = QM_TABLE[sv >> 1]
        mps = sv & 1
        self.a -= qe
        if ((self.c >> self.ct) & 0xFFFF) < self.a:
            if self.a < 0x8000:  # MPS with renorm: conditional exchange
                if self.a < qe:
                    d = 1 - mps
                    if sw:
                        mps = d
                    stats[i] = (nlps << 1) | mps
                else:
                    d = mps
                    stats[i] = (nmps << 1) | mps
                return d
            return mps
        self.c -= self.a << self.ct
        if self.a < qe:  # LPS path conditional exchange: actually MPS
            d = mps
            stats[i] = (nmps << 1) | mps
        else:
            d = 1 - mps
            if sw:
                mps = d
            stats[i] = (nlps << 1) | mps
        self.a = qe
        return d

    def decode_fixed(self) -> int:
        """The non-adaptive 'fixed' bin (state 113 in the spec's table:
        Qe = 0x5A1D, no transitions, MPS = 0) — AC signs and DC
        refinement bits use it."""
        if self.a < 0x8000:
            self._renorm()
        self.a -= 0x5A1D
        if ((self.c >> self.ct) & 0xFFFF) < self.a:
            if self.a < 0x8000:
                return 1 if self.a < 0x5A1D else 0
            return 0
        self.c -= self.a << self.ct
        d = 0 if self.a < 0x5A1D else 1
        self.a = 0x5A1D
        return d

    def scan_end(self) -> int:
        """Offset just past the consumed entropy data (at the marker if
        one terminated the feed, else the current read position)."""
        return self.end if self.end is not None else self.pos


class ArithEncoder:
    """QM encoder (T.81 D.1, software conventions): byte-out from bit
    19 of C, carry absorbed by the buffered last byte, 0xFF bytes
    stacked until a non-carry proves them final, 0x00 stuffed after
    every emitted 0xFF."""

    __slots__ = ("a", "c", "ct", "buffer", "sc", "out")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer: int | None = None
        self.sc = 0
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: ripple into the buffered byte; stacked 0xFFs all
            # became 0x00 (0xFF + 1 with carry continuing upward)
            if self.buffer is not None:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self._emit(0x00)
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # defer: a later carry could turn it to 0x00
        else:
            if self.buffer is not None:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def code(self, d: int, stats: bytearray, i: int) -> None:
        sv = stats[i]
        qe, nmps, nlps, sw = QM_TABLE[sv >> 1]
        mps = sv & 1
        self.a -= qe
        if d == mps:
            if self.a >= 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            stats[i] = (nmps << 1) | mps
        else:
            if self.a >= qe:  # no exchange: LPS takes the top
                self.c += self.a
                self.a = qe
            # else exchange: LPS keeps the bottom interval (size A-Qe)
            if sw:
                mps = 1 - mps
            stats[i] = (nlps << 1) | mps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def code_fixed(self, d: int) -> None:
        """Encode with the non-adaptive fixed bin (MPS = 0)."""
        self.a -= 0x5A1D
        if d == 0:
            if self.a >= 0x8000:
                return
            if self.a < 0x5A1D:
                self.c += self.a
                self.a = 0x5A1D
        else:
            if self.a >= 0x5A1D:
                self.c += self.a
                self.a = 0x5A1D
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def flush(self) -> bytes:
        """Terminate the segment (T.81 D.1.8/D.1.9 FLUSH): clear the
        final interval to the value with the most trailing zero bits,
        resolve the pending carry into the buffered byte and the
        0xFF stack, then emit the remaining C bytes — each only if its
        bit range still carries information (a final byte that is all
        zero is reproduced by the decoder's zero-feed past the
        marker).  Never retro-trims emitted bytes: a trailing data
        0xFF00 pair is NOT padding (zero-feed would decode it as
        0x00) — the bug an earlier trim introduced, caught by the
        per-document libjpeg cross-decode gate."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c > 0x7FFFFFF:  # carry out of bit 26
            if self.buffer is not None:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self._emit(0x00)
        else:
            if self.buffer is not None:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
        if self.c & 0x7FFF800:
            self._emit((self.c >> 19) & 0xFF)
            if self.c & 0x7F800:
                self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


# --------------------------------------------------------------------------
# Statistical models (T.81 Annex F sequential, Annex G progressive)
# --------------------------------------------------------------------------
def _classify_dc(sign: int, m: int, lo: int, up: int) -> int:
    """Context-bin base for the NEXT block (T.81 F.1.4.4.1.2): 0
    zero/near-zero, 4/8 small +/-, 12/16 large +/-.  The conditioning
    compares **m — the decoded magnitude-category MSB (0 for |diff| in
    {0, 1}, else 2^(cat-1))** against the L/U bounds, NOT the
    reconstructed |diff|: with the default (L, U) = (0, 1) a diff of
    +-2 has m = 1 and classifies SMALL.  (Verified against the
    installed libjpeg's decode_mcu disassembly after a one-in-a-
    thousand-blocks conformance divergence traced exactly here.)"""
    if m < ((1 << lo) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def _decode_dc_diff(dec: ArithDecoder, stats: bytearray, ctx: int,
                    lo: int, up: int) -> tuple[int, int]:
    """One DC difference (F.1.4.4.1, Figure F.24 magnitude pattern).
    Returns (diff, next context-bin base)."""
    if dec.decode(stats, ctx) == 0:
        return 0, 0
    sign = dec.decode(stats, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 20  # X1
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    # context conditioning uses the category MSB m, pre value bits
    nctx = _classify_dc(sign, m, lo, up)
    v = m
    if m:
        st += 14  # magnitude-bit bins
        mm = m >> 1
        while mm:
            if dec.decode(stats, st):
                v |= mm
            mm >>= 1
    v += 1
    return (-v if sign else v), nctx


def _encode_dc_diff(enc: ArithEncoder, stats: bytearray, ctx: int,
                    v: int, lo: int, up: int) -> int:
    """Mirror of `_decode_dc_diff`; returns the next context base."""
    if v == 0:
        enc.code(0, stats, ctx)
        return 0
    enc.code(1, stats, ctx)
    sign = 1 if v < 0 else 0
    enc.code(sign, stats, ctx + 1)
    st = ctx + 2 + sign
    sz = (-v if sign else v) - 1
    if sz == 0:
        enc.code(0, stats, st)
        return _classify_dc(sign, 0, lo, up)
    enc.code(1, stats, st)
    m = 1
    st = 20
    while sz >= (m << 1):
        enc.code(1, stats, st)
        m <<= 1
        if m == 0x8000:
            raise ValueError("arithmetic DC magnitude overflow")
        st += 1
    enc.code(0, stats, st)
    st += 14
    mm = m >> 1
    while mm:
        enc.code(1 if sz & mm else 0, stats, st)
        mm >>= 1
    return _classify_dc(sign, m, lo, up)


def _decode_ac_band(dec, stats, blk, kx, ss, se, al) -> None:
    """Nonzero-history AC band decode (sequential: ss=1, se=63, al=0;
    progressive first pass: the scan's band, values << Al).
    F.1.4.4.2 / G.?: per-k EOB decision, zero-run walk, fixed-bin
    sign, shared high-magnitude areas split at Kx."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past band end")
        sign = dec.decode_fixed()
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    st += 1
        v = m
        if m:
            st += 14
            mm = m >> 1
            while mm:
                if dec.decode(stats, st):
                    v |= mm
                mm >>= 1
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _encode_ac_band(enc, stats, blk, kx, ss, se, al) -> None:
    """Mirror of `_decode_ac_band` (sequential encode uses ss=1, se=63,
    al=0; the progressive first pass uses the scan's Al).  The AC
    point transform truncates the MAGNITUDE toward zero (G.1.2.2) —
    a floor shift would round negatives away from zero."""
    vals = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        m = (-v if v < 0 else v) >> al
        vals.append(-m if v < 0 else m)
    last_nz = 0
    for i, v in enumerate(vals):
        if v:
            last_nz = i + 1
    k = ss
    while k - ss < last_nz:
        st = 3 * (k - 1)
        enc.code(0, stats, st)  # not EOB
        v = vals[k - ss]
        while v == 0:
            enc.code(0, stats, st + 1)
            st += 3
            k += 1
            v = vals[k - ss]
        enc.code(1, stats, st + 1)
        sign = 1 if v < 0 else 0
        enc.code_fixed(sign)
        st += 2
        sz = (-v if sign else v) - 1
        if sz == 0:
            enc.code(0, stats, st)
        else:
            enc.code(1, stats, st)
            if sz == 1:
                enc.code(0, stats, st)
            else:
                enc.code(1, stats, st)
                m = 2
                st = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.code(1, stats, st)
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    st += 1
                enc.code(0, stats, st)
            # magnitude bits below the MSB
            m = 1 << (sz.bit_length() - 1)
            st += 14
            mm = m >> 1
            while mm:
                enc.code(1 if sz & mm else 0, stats, st)
                mm >>= 1
        k += 1
    if k <= se:
        enc.code(1, stats, 3 * (k - 1))  # EOB


def _fresh_stats(comps, smap, dc_cond):
    """Per-scan statistics state: one DC + one AC bin area per table id
    referenced by the scan, plus per-component context/prediction.
    Reset at scan start and at every restart marker (T.81 F.1.4.4)."""
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    for c in comps:
        if c["id"] in smap:
            td, ta = smap[c["id"]]
            dc_stats.setdefault(td, bytearray(DC_STAT_BINS))
            ac_stats.setdefault(ta, bytearray(AC_STAT_BINS))
    ctx = {c["id"]: 0 for c in comps}
    pred = {c["id"]: 0 for c in comps}
    return dc_stats, ac_stats, ctx, pred


def _expect_rst(data, pos, n) -> int:
    """Scan past any flush residue to the RSTn marker ending an
    interval; returns the offset just past it."""
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:
            pos += 2
            continue
        if nxt == 0xD0 + n:
            return pos + 2
        raise ValueError("missing restart marker")
    raise ValueError("truncated restart marker")


def decode_arith_scan(data, pos, frame, comps, smap, restart,
                      dc_cond, ac_cond, mcus_x, mcus_y,
                      differential=False) -> int:
    """One interleaved sequential SOF9/SOF13 scan: fills each
    component's `coefs` rows, returns the offset of the terminating
    marker.  `differential=True` is the SOF13 process (T.81
    F.1.1.5.1): the coded DC value IS the block's difference
    coefficient — prediction stays zero; the conditioning contexts
    update from the coded value exactly as in the non-differential
    case."""
    h, w, nc, prec = frame
    dec = ArithDecoder(data, pos)
    dc_stats, ac_stats, ctx, pred = _fresh_stats(comps, smap, dc_cond)
    scomps = [c for c in comps if c["id"] in smap]
    if len(scomps) != len(comps):
        raise ValueError("component missing from scan")
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                nxt = _expect_rst(data, dec.scan_end(), rst_n)
                rst_n = (rst_n + 1) % 8
                dec = ArithDecoder(data, nxt)
                dc_stats, ac_stats, ctx, pred = _fresh_stats(
                    comps, smap, dc_cond
                )
            for c in comps:
                cid = c["id"]
                td, ta = smap[cid]
                lo, up = dc_cond.get(td, DEFAULT_DC_COND)
                kx = ac_cond.get(ta, DEFAULT_AC_KX)
                for by in range(c["sv"]):
                    for bx in range(c["sh"]):
                        blk = c["coefs"][
                            (my * c["sv"] + by) * c["bw"] + mx * c["sh"] + bx
                        ]
                        diff, ctx[cid] = _decode_dc_diff(
                            dec, dc_stats[td], ctx[cid], lo, up
                        )
                        if differential:
                            blk[0] = diff
                        else:
                            pred[cid] += diff
                            blk[0] = pred[cid]
                        _decode_ac_band(dec, ac_stats[ta], blk, kx, 1, 63, 0)
            mcu_count += 1
    return dec.scan_end()


def decode_arith_progressive_scan(
    data, pos, frame, comps, smap, restart, dc_cond, ac_cond,
    ss, se, ah, al, hmax, vmax, mcus_x, mcus_y, differential=False,
) -> int:
    """One SOS of a progressive SOF10 frame (Annex G with arithmetic
    coding): DC scans interleaved in MCU order, AC scans
    single-component; no EOB runs — the per-block EOB decision bin
    replaces them.  Returns the offset of the terminating marker."""
    from oxford_data_pipeline_spark.operators.jpeg import _scan_grid

    scomps = [c for c in comps if c["id"] in smap]
    if len(scomps) != len(smap):
        raise ValueError("unknown scan component")
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("DC scan with Se != 0")
    if se > 63 or ss > se:
        raise ValueError("spectral band out of range")
    if not dc_scan and len(scomps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ah and al != ah - 1:
        raise ValueError("successive approximation must step by one bit")

    dec = ArithDecoder(data, pos)
    dc_stats, ac_stats, ctx, pred = _fresh_stats(comps, smap, dc_cond)
    rst_n = 0
    count = 0

    def maybe_restart():
        nonlocal dec, dc_stats, ac_stats, ctx, pred, rst_n
        if restart and count and count % restart == 0:
            nxt = _expect_rst(data, dec.scan_end(), rst_n)
            rst_n = (rst_n + 1) % 8
            dec = ArithDecoder(data, nxt)
            dc_stats, ac_stats, ctx, pred = _fresh_stats(comps, smap, dc_cond)

    if dc_scan and len(scomps) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for c in scomps:
                    cid = c["id"]
                    td = smap[cid][0]
                    lo, up = dc_cond.get(td, DEFAULT_DC_COND)
                    for by in range(c["sv"]):
                        for bx in range(c["sh"]):
                            blk = c["coefs"][
                                (my * c["sv"] + by) * c["bw"]
                                + mx * c["sh"] + bx
                            ]
                            if ah == 0:
                                diff, ctx[cid] = _decode_dc_diff(
                                    dec, dc_stats[td], ctx[cid], lo, up
                                )
                                if differential:
                                    blk[0] = diff << al
                                else:
                                    pred[cid] += diff
                                    blk[0] = pred[cid] << al
                            elif dec.decode_fixed():
                                blk[0] = int(blk[0]) | (1 << al)
                count += 1
        return dec.scan_end()

    c = scomps[0]
    cid = c["id"]
    td, ta = smap[cid]
    lo, up = dc_cond.get(td, DEFAULT_DC_COND)
    kx = ac_cond.get(ta, DEFAULT_AC_KX)
    bw_s, bh_s = _scan_grid(c, frame, hmax, vmax)
    p1 = 1 << al
    m1 = -1 << al
    for by in range(bh_s):
        for bx in range(bw_s):
            maybe_restart()
            blk = c["coefs"][by * c["bw"] + bx]
            if dc_scan:
                if ah == 0:
                    diff, ctx[cid] = _decode_dc_diff(
                        dec, dc_stats[td], ctx[cid], lo, up
                    )
                    if differential:
                        blk[0] = diff << al
                    else:
                        pred[cid] += diff
                        blk[0] = pred[cid] << al
                elif dec.decode_fixed():
                    blk[0] = int(blk[0]) | (1 << al)
            elif ah == 0:
                _decode_ac_band(dec, ac_stats[ta], blk, kx, ss, se, al)
            else:
                # AC refinement (G.2 arithmetic): correction bit via the
                # per-k bin st+2 for nonzero history, newly-nonzero via
                # st+1 with a fixed-bin sign; EOB decision only past the
                # previous stage's last nonzero index
                kex = se
                while kex >= ss and blk[kex] == 0:
                    kex -= 1
                k = ss
                stats = ac_stats[ta]
                while k <= se:
                    st = 3 * (k - 1)
                    if k > kex and dec.decode(stats, st):
                        break  # EOB
                    while True:
                        cur = int(blk[k])
                        if cur:
                            if dec.decode(stats, st + 2):
                                blk[k] = cur + (m1 if cur < 0 else p1)
                            break
                        if dec.decode(stats, st + 1):
                            blk[k] = m1 if dec.decode_fixed() else p1
                            break
                        st += 3
                        k += 1
                        if k > se:
                            raise ValueError(
                                "arithmetic AC refinement past band end"
                            )
                    k += 1
            count += 1
    return dec.scan_end()


def encode_arith_scan(comps_coefs, samp, bws, mcus_x, mcus_y,
                      restart_interval, dc_cond, ac_cond,
                      table_ids, differential=False) -> bytes:
    """Entropy-encode one interleaved sequential scan arithmetically:
    `comps_coefs` = per-component [n_blocks, 64] zigzag coefficients in
    raster block order, `samp` = per-component (sh, sv), `bws` =
    per-component blocks-per-row, `table_ids` = per-component (td, ta).
    The MCU walk mirrors `decode_arith_scan` exactly; returns the
    entropy-coded bytes (with RSTn markers when `restart_interval`)."""
    nc = len(comps_coefs)
    out = bytearray()

    def fresh():
        dc_s = {td: bytearray(DC_STAT_BINS) for td, _ in table_ids}
        ac_s = {ta: bytearray(AC_STAT_BINS) for _, ta in table_ids}
        return ArithEncoder(), dc_s, ac_s, [0] * nc, [0] * nc

    enc, dc_s, ac_s, ctx, pred = fresh()
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                enc, dc_s, ac_s, ctx, pred = fresh()
            for ci in range(nc):
                sh, sv = samp[ci]
                td, ta = table_ids[ci]
                lo, up = dc_cond.get(td, DEFAULT_DC_COND)
                kx = ac_cond.get(ta, DEFAULT_AC_KX)
                for by in range(sv):
                    for bx in range(sh):
                        blk = comps_coefs[ci][
                            (my * sv + by) * bws[ci] + mx * sh + bx
                        ]
                        if differential:
                            diff = int(blk[0])  # zero prediction
                        else:
                            diff = int(blk[0]) - pred[ci]
                            pred[ci] = int(blk[0])
                        ctx[ci] = _encode_dc_diff(
                            enc, dc_s[td], ctx[ci], diff, lo, up
                        )
                        _encode_ac_band(enc, ac_s[ta], blk, kx, 1, 63, 0)
            mcu_count += 1
    out += enc.flush()
    return bytes(out)


def _encode_ac_refine(enc, stats, blk, ss, se, al) -> None:
    """AC successive-approximation refinement encode (G.2 arithmetic
    mirror of the decoder's refine loop): per k a correction bit at
    st+2 for nonzero-history coefficients, a newly-nonzero decision at
    st+1 with a fixed-bin sign, and the per-block EOB decision past
    BOTH the history's last nonzero index and the last newly-nonzero
    event (the decoder stops reading entirely after EOB = 1)."""
    ah = al + 1

    def mag(k):
        v = int(blk[k])
        return -v if v < 0 else v

    kex = se
    while kex >= ss and (mag(kex) >> ah) == 0:
        kex -= 1
    # the decoder decodes NOTHING after accepting EOB, so EOB may only
    # be signalled once no newly-nonzero event remains either
    klast = se
    while klast >= ss and (mag(klast) >> al) == 0:
        klast -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > klast:
                enc.code(1, stats, st)  # EOB
                return
            enc.code(0, stats, st)
        while True:
            m = mag(k)
            if (m >> ah) != 0:  # nonzero history: one correction bit
                enc.code((m >> al) & 1, stats, st + 2)
                break
            if (m >> al) != 0:  # newly nonzero at this stage
                enc.code(1, stats, st + 1)
                enc.code_fixed(1 if int(blk[k]) < 0 else 0)
                break
            enc.code(0, stats, st + 1)
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refinement past band end")
        k += 1


def encode_arith_progressive_scans(
    coefs, planes, samp, gray, h, w, emit_sos, dc_cond, ac_cond,
    differential=False,
) -> bytes:
    """The progressive ARITHMETIC scan script (SOF10) — the same
    4-phase script as the Huffman emitter (interleaved DC first at
    Al=1, per-component AC first bands with the luma 1-5/6-63 split,
    interleaved DC refine, per-component AC refines), each scan a
    fresh QM coder + statistics (T.81: every scan is an independent
    entropy-coded segment).  `emit_sos` is the caller's SOS-header
    builder (jpeg.py owns marker emission)."""
    ncomp = len(coefs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    table_ids = [(0, 0)] + [(1, 1)] * (ncomp - 1)

    def mcu_dc_blocks():
        if gray:
            for blk in coefs[0]:
                yield [(0, blk)]
            return
        ywb = planes[0].shape[1] // 8
        cwb = planes[1].shape[1] // 8
        if samp[0] == (2, 2):
            for my in range(planes[1].shape[0] // 8):
                for mx in range(cwb):
                    units = [
                        (0, coefs[0][(2 * my + dy) * ywb + 2 * mx + dx])
                        for dy in (0, 1) for dx in (0, 1)
                    ]
                    units.append((1, coefs[1][my * cwb + mx]))
                    units.append((2, coefs[2][my * cwb + mx]))
                    yield units
        else:
            for i in range(len(coefs[0])):
                yield [(0, coefs[0][i]), (1, coefs[1][i]), (2, coefs[2][i])]

    def comp_blocks(ci):
        sh, sv = samp[ci]
        stride = planes[ci].shape[1] // 8
        bw_s = (-(-(w * sh) // hmax) + 7) // 8
        bh_s = (-(-(h * sv) // vmax) + 7) // 8
        for by in range(bh_s):
            for bx in range(bw_s):
                yield coefs[ci][by * stride + bx]

    out = bytearray()
    scan_comps = [(ci + 1, *table_ids[ci]) for ci in range(ncomp)]
    # 1: DC first, interleaved, Al=1 (DC point transform = arithmetic
    # shift per G.1.2.1)
    out += emit_sos([(cid, td, 0) for cid, td, _ in scan_comps], 0, 0, 0, 1)
    enc = ArithEncoder()
    dc_s = {td: bytearray(DC_STAT_BINS) for td, _ in table_ids}
    ctx = [0] * ncomp
    pred = [0] * ncomp
    for units in mcu_dc_blocks():
        for ci, blk in units:
            td = table_ids[ci][0]
            lo, up = dc_cond.get(td, DEFAULT_DC_COND)
            v = int(blk[0]) >> 1
            if differential:
                diff = v  # zero prediction (T.81 F.1.1.5.1)
            else:
                diff = v - pred[ci]
                pred[ci] = v
            ctx[ci] = _encode_dc_diff(enc, dc_s[td], ctx[ci], diff, lo, up)
    out += enc.flush()
    # 2: AC first bands per component, Al=1 (luma split exercises Ss>1)
    bands = {0: [(1, 5), (6, 63)]}
    for ci in range(ncomp):
        cid, _, ta = scan_comps[ci]
        kx = ac_cond.get(ta, DEFAULT_AC_KX)
        for ss, se in bands.get(ci, [(1, 63)]):
            out += emit_sos([(cid, 0, ta)], ss, se, 0, 1)
            enc = ArithEncoder()
            ac_s = bytearray(AC_STAT_BINS)
            for blk in comp_blocks(ci):
                _encode_ac_band(enc, ac_s, blk, kx, ss, se, 1)
            out += enc.flush()
    # 3: DC refine, interleaved (fixed-bin bit Al=0 per block)
    out += emit_sos([(cid, td, 0) for cid, td, _ in scan_comps], 0, 0, 1, 0)
    enc = ArithEncoder()
    for units in mcu_dc_blocks():
        for _ci, blk in units:
            enc.code_fixed(int(blk[0]) & 1)
    out += enc.flush()
    # 4: AC refine bands per component, Ah=1 -> Al=0
    for ci in range(ncomp):
        cid, _, ta = scan_comps[ci]
        for ss, se in bands.get(ci, [(1, 63)]):
            out += emit_sos([(cid, 0, ta)], ss, se, 1, 0)
            enc = ArithEncoder()
            ac_s = bytearray(AC_STAT_BINS)
            for blk in comp_blocks(ci):
                _encode_ac_refine(enc, ac_s, blk, ss, se, 0)
            out += enc.flush()
    return bytes(out)
