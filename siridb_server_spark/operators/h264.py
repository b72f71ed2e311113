"""From-scratch, library-free H.264/AVC baseline I+P codec.

Implements the decode side of ITU-T H.264 (ISO/IEC 14496-10) for the
CAVLC baseline subset — the last pixel-level codec the multimodal
surface stubbed:

- Annex B byte-stream parsing (start codes, emulation prevention)
  and AVCC length-prefixed access units (as stored in MP4 ``avc1``
  sample entries, extradata per 14496-15).
- SPS / PPS exp-Golomb parsing (profile, dimensions, cropping,
  entropy mode, QP, deblocking control).
- IDR / I slices with CAVLC entropy coding (Table 9-5 coeff_token,
  level prefix/suffix with adaptive suffixLength, total_zeros,
  run_before), macroblock types I_PCM, Intra_4x4 and Intra_16x16.
- All intra prediction modes: the nine 4x4 modes, the four 16x16
  modes (V/H/DC/Plane) and the four chroma modes (DC/H/V/Plane),
  with the spec's availability and default-mode rules.
- The exact integer inverse transforms (4x4 core, 4x4 luma-DC
  Hadamard, 2x2 chroma DC) and flat-matrix dequantization, so the
  reconstruction is bit-exact by construction — H.264's decode loop
  is pure integer math.

- P slices (spec 8.4, round 8): mb_skip_run/P_Skip, every P
  partition shape (16x16, 16x8, 8x16, P_8x8 with 8x8/8x4/4x8/4x4
  sub-partitions), median + directional motion-vector prediction
  with the 8.4.1.3 availability/substitution rules, quarter-pel
  luma interpolation (6-tap halves, unrounded-intermediate centre
  j, half-up quarter averages — fuzz-checked against an independent
  scalar transcription), eighth-pel bilinear chroma, the Inter
  column of Table 9-4 for CBP, and intra MBs inside P slices.
  Single-reference DPB (the baseline fixture shape): the previous
  decoded picture, post-deblock, is list-0 reference 0.

The in-loop deblocking filter (spec section 8.7) IS implemented:
full boundary-strength derivation (intra 4/3 on MB/internal edges;
inter bS 2 on coded coefficients, 1 on ≥1-quarter-sample MV deltas
or reference changes, 0 unfiltered — per 4-sample segment), the
Table 8-16/8-17 alpha/beta/tC0 thresholds with slice alpha/beta
offsets, normal and strong filtering for luma and chroma, and
qPp = 0 for I_PCM macroblocks — so streams signaling
``disable_deblocking_filter_idc`` 0 or 2 decode conformantly
(bit-exact against the encoder-embedded filtered reconstruction,
and the vectorized kernel is fuzz-checked against an independent
scalar transcription of the spec formulas in test_h264.py).

Unsupported (returns ``None``, never crashes): CABAC streams, B
slices, interlaced coding (frame_mbs_only_flag == 0), multiple
reference frames / list modification, high-profile tools (8x8
transform, scaling lists, monochrome), multi-slice frames.

The encode side (``encode_h264_annexb`` for one intra frame,
``encode_h264_sequence`` for IDR+P sequences) exists to build
deterministic test fixtures: I_PCM mode passes pixels through
losslessly, and the intra/inter modes run a full forward transform +
quantize + CAVLC write with an embedded decoder-identical
reconstruction loop, so tests can assert the decoder reproduces the
encoder's reconstruction bit-for-bit (everything is integer — there
is no rounding tolerance).

Reference parity note: the SiriDB reference has no codec code at all
(multimodal decode is beyond it); this module exists for the
training-data-pipeline surface, citing only the public spec. Table
constants follow the published standard's tables (9-5, 9-7, 9-8,
9-10, 8-15); each is validated structurally in tests (prefix-free,
complete where the spec's code is complete).
"""

from __future__ import annotations

# ---------------------------------------------------------------------
# Bitstream primitives
# ---------------------------------------------------------------------


def _ebsp_to_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 \
                and data[i + 2] == 3:
            out += data[i:i + 2]
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _rbsp_to_ebsp(data: bytes) -> bytes:
    """Insert emulation-prevention bytes."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def u(self, nbits: int) -> int:
        if self.pos + nbits > self.n:
            raise EOFError("rbsp exhausted")
        v = 0
        p = self.pos
        d = self.data
        for _ in range(nbits):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad exp-golomb")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self):
        self.pos = (self.pos + 7) & ~7

    def bytes_aligned(self, count: int) -> bytes:
        assert self.pos & 7 == 0
        start = self.pos >> 3
        if start + count > len(self.data):
            raise EOFError("rbsp exhausted")
        self.pos += count * 8
        return self.data[start:start + count]

    def more_rbsp_data(self) -> bool:
        """True while payload bits remain before rbsp_stop_one_bit."""
        if self.pos >= self.n:
            return False
        # find last 1 bit in the stream: everything strictly before
        # it is payload
        d = self.data
        for byte_i in range(len(d) - 1, -1, -1):
            if d[byte_i]:
                b = d[byte_i]
                last_one = byte_i * 8 + (7 - (b & -b).bit_length() + 1)
                return self.pos < last_one
        return False


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def u(self, nbits: int, v: int):
        assert 0 <= v < (1 << nbits)
        self.acc = (self.acc << nbits) | v
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def bits(self, s: str):
        for ch in s:
            self.u(1, 1 if ch == "1" else 0)

    def ue(self, v: int):
        assert v >= 0
        k = v + 1
        nb = k.bit_length()
        self.u(nb - 1, 0)
        self.u(nb, k)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self):
        if self.nacc:
            self.u(8 - self.nacc, 0)

    def rbsp_trailing(self):
        self.u(1, 1)
        self.byte_align_zero()

    def getvalue(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------
# NAL layer
# ---------------------------------------------------------------------


def split_annexb(data: bytes) -> list:
    """Split an Annex B byte stream into raw NAL units (EBSP,
    header byte included)."""
    nals = []
    i, n = 0, len(data)
    starts = []
    while i + 2 < n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 3 < n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (s, body) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        nal = data[body:end]
        # trailing zero bytes between NALs are padding
        while nal and nal[-1] == 0:
            nal = nal[:-1]
        if nal:
            nals.append(nal)
    return nals


def split_avcc(data: bytes, length_size: int) -> list:
    """Split a length-prefixed (MP4 sample) access unit into NALs."""
    nals = []
    i, n = 0, len(data)
    while i + length_size <= n:
        ln = int.from_bytes(data[i:i + length_size], "big")
        i += length_size
        if ln <= 0 or i + ln > n:
            return nals
        nals.append(data[i:i + ln])
        i += ln
    return nals


def _nal_header(nal: bytes):
    if not nal or nal[0] & 0x80:
        return None
    return (nal[0] >> 5) & 3, nal[0] & 0x1F  # (nal_ref_idc, type)


# ---------------------------------------------------------------------
# Parameter sets
# ---------------------------------------------------------------------


def parse_sps(nal: bytes):
    """Parse a seq_parameter_set NAL. Returns a dict or None when the
    stream uses tools outside the supported subset."""
    hdr = _nal_header(nal)
    if hdr is None or hdr[1] != 7:
        return None
    try:
        r = _BitReader(_ebsp_to_rbsp(nal[1:]))
        profile_idc = r.u(8)
        r.u(8)  # constraint flags + reserved
        level_idc = r.u(8)
        sps_id = r.ue()
        chroma_format_idc = 1
        if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128,
                           138, 139, 134, 135):
            chroma_format_idc = r.ue()
            if chroma_format_idc == 3:
                r.u(1)
            r.ue()  # bit_depth_luma_minus8
            r.ue()  # bit_depth_chroma_minus8
            r.u(1)  # qpprime_y_zero_transform_bypass
            if r.u(1):  # seq_scaling_matrix_present
                return None  # scaling lists unsupported
        if chroma_format_idc != 1:
            return None  # 4:2:0 only
        log2_max_frame_num = r.ue() + 4
        poc_type = r.ue()
        if poc_type == 0:
            log2_max_poc_lsb = r.ue() + 4
        elif poc_type == 1:
            r.u(1)
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
            log2_max_poc_lsb = 0
        else:
            log2_max_poc_lsb = 0
        r.ue()  # max_num_ref_frames
        r.u(1)  # gaps_in_frame_num_value_allowed
        pw_mbs = r.ue() + 1
        ph_units = r.ue() + 1
        frame_mbs_only = r.u(1)
        if not frame_mbs_only:
            return None  # interlace unsupported
        r.u(1)  # direct_8x8_inference
        crop = (0, 0, 0, 0)
        if r.u(1):  # frame_cropping
            crop = (r.ue(), r.ue(), r.ue(), r.ue())
        width = pw_mbs * 16 - 2 * (crop[0] + crop[1])
        height = ph_units * 16 - 2 * (crop[2] + crop[3])
        return {
            "profile_idc": profile_idc,
            "level_idc": level_idc,
            "sps_id": sps_id,
            "log2_max_frame_num": log2_max_frame_num,
            "poc_type": poc_type,
            "log2_max_poc_lsb": log2_max_poc_lsb,
            "pic_width_mbs": pw_mbs,
            "pic_height_mbs": ph_units,
            "crop": crop,
            "width": width,
            "height": height,
        }
    except (EOFError, ValueError):
        return None


def parse_pps(nal: bytes):
    hdr = _nal_header(nal)
    if hdr is None or hdr[1] != 8:
        return None
    try:
        r = _BitReader(_ebsp_to_rbsp(nal[1:]))
        pps_id = r.ue()
        sps_id = r.ue()
        entropy_coding_mode = r.u(1)
        if entropy_coding_mode:
            return None  # CABAC unsupported
        r.u(1)  # bottom_field_pic_order_in_frame_present
        if r.ue() != 0:  # num_slice_groups_minus1 (FMO unsupported)
            return None
        r.ue()  # num_ref_idx_l0_default_active_minus1
        r.ue()  # num_ref_idx_l1_default_active_minus1
        r.u(1)  # weighted_pred_flag
        r.u(2)  # weighted_bipred_idc
        pic_init_qp = r.se() + 26
        r.se()  # pic_init_qs
        chroma_qp_offset = r.se()
        deblocking_filter_control = r.u(1)
        constrained_intra = r.u(1)
        redundant_pic_cnt = r.u(1)
        return {
            "pps_id": pps_id,
            "sps_id": sps_id,
            "pic_init_qp": pic_init_qp,
            "chroma_qp_offset": chroma_qp_offset,
            "deblocking_filter_control": deblocking_filter_control,
            "constrained_intra": constrained_intra,
            "redundant_pic_cnt": redundant_pic_cnt,
        }
    except (EOFError, ValueError):
        return None


# ---------------------------------------------------------------------
# CAVLC tables (spec Tables 9-5, 9-7, 9-8, 9-9a, 9-10)
# ---------------------------------------------------------------------
# coeff_token: per context, {bitstring: (TotalCoeff, TrailingOnes)}.
# Contexts 0/1/2 = nC ranges [0,2) / [2,4) / [4,8); context 3 = the
# chroma-DC table (nC == -1). nC >= 8 uses a 6-bit FLC, handled in
# code. Each (length, value) pair below renders to a bitstring.
# Structural validation (prefix-free + Kraft completeness with the
# spec's known holes) lives in tests/test_h264.py.

_CT_LEN_BITS = {
    # context 0: 0 <= nC < 2 — rows TotalCoeff 0..16, cols T1 0..3
    0: [
        [(1, 1)],
        [(6, 5), (2, 1)],
        [(8, 7), (6, 4), (3, 1)],
        [(9, 7), (8, 6), (7, 5), (5, 3)],
        [(10, 7), (9, 6), (8, 5), (6, 3)],
        [(11, 7), (10, 6), (9, 5), (7, 4)],
        [(13, 15), (11, 6), (10, 5), (8, 4)],
        [(13, 11), (13, 14), (11, 5), (9, 4)],
        [(13, 8), (13, 10), (13, 13), (10, 4)],
        [(14, 15), (14, 14), (13, 9), (11, 4)],
        [(14, 11), (14, 10), (14, 13), (13, 12)],
        [(15, 15), (15, 14), (14, 9), (14, 12)],
        [(15, 11), (15, 10), (15, 13), (14, 8)],
        [(16, 15), (15, 1), (15, 9), (15, 12)],
        [(16, 11), (16, 14), (16, 13), (15, 8)],
        [(16, 7), (16, 10), (16, 9), (16, 12)],
        [(16, 4), (16, 6), (16, 5), (16, 8)],
    ],
    # context 1: 2 <= nC < 4
    1: [
        [(2, 3)],
        [(6, 11), (2, 2)],
        [(6, 7), (5, 7), (3, 3)],
        [(7, 7), (6, 10), (6, 9), (4, 5)],
        [(8, 7), (6, 6), (6, 5), (4, 4)],
        [(8, 4), (7, 6), (7, 5), (5, 6)],
        [(9, 7), (8, 6), (8, 5), (6, 8)],
        [(11, 15), (9, 6), (9, 5), (6, 4)],
        [(11, 11), (11, 14), (11, 13), (7, 4)],
        [(12, 15), (11, 10), (11, 9), (9, 4)],
        [(12, 11), (12, 14), (12, 13), (11, 12)],
        [(12, 8), (12, 10), (12, 9), (11, 8)],
        [(13, 15), (13, 14), (13, 13), (12, 12)],
        [(13, 11), (13, 10), (13, 9), (13, 12)],
        [(13, 7), (14, 11), (14, 10), (13, 8)],
        [(14, 9), (14, 8), (14, 13), (13, 1)],
        [(14, 7), (14, 6), (14, 5), (14, 4)],
    ],
    # context 2: 4 <= nC < 8
    2: [
        [(4, 15)],
        [(6, 15), (4, 14)],
        [(6, 11), (5, 15), (4, 13)],
        [(6, 8), (5, 12), (5, 14), (4, 12)],
        [(7, 15), (5, 10), (5, 11), (4, 11)],
        [(7, 11), (5, 8), (5, 9), (4, 10)],
        [(7, 9), (6, 14), (6, 13), (4, 9)],
        [(7, 8), (6, 10), (6, 9), (4, 8)],
        [(8, 15), (7, 14), (7, 13), (5, 13)],
        [(8, 11), (8, 14), (7, 10), (6, 12)],
        [(9, 15), (8, 10), (8, 13), (7, 12)],
        [(9, 11), (9, 14), (8, 9), (8, 12)],
        [(9, 8), (9, 10), (9, 9), (8, 8)],
        [(10, 13), (9, 7), (9, 12), (9, 13)],
        [(10, 9), (10, 12), (10, 11), (10, 10)],
        [(10, 5), (10, 8), (10, 7), (10, 6)],
        [(10, 1), (10, 4), (10, 3), (10, 2)],
    ],
    # context 3: chroma DC (nC == -1), TotalCoeff 0..4
    3: [
        [(2, 1)],
        [(6, 7), (1, 1)],
        [(6, 4), (6, 6), (3, 1)],
        [(6, 3), (7, 3), (7, 2), (6, 5)],
        [(6, 2), (8, 3), (8, 2), (7, 0)],
    ],
}


def _render(length, value):
    return format(value, "0{}b".format(length))


def _build_coeff_token_maps():
    maps = []
    for ctx in range(4):
        m = {}
        for tc, row in enumerate(_CT_LEN_BITS[ctx]):
            for t1, (ln, bits) in enumerate(row):
                m[_render(ln, bits)] = (tc, t1)
        maps.append(m)
    return maps


_COEFF_TOKEN = _build_coeff_token_maps()
_COEFF_TOKEN_ENC = [
    {v: k for k, v in m.items()} for m in _COEFF_TOKEN
]

# total_zeros for 4x4 blocks (Tables 9-7/9-8): row = TotalCoeff 1..15,
# entry i = code for total_zeros == i. (length, bits) pairs.
_TZ_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
_TZ_BITS = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]

# chroma DC total_zeros (Table 9-9a, maxNumCoeff 4)
_TZ_CDC = [
    ["1", "01", "001", "000"],
    ["1", "01", "00"],
    ["1", "0"],
]

# run_before (Table 9-10): row = min(zerosLeft, 7) - 1,
# entry i = code for run_before == i.
_RUN_BEFORE = [
    ["1", "0"],
    ["1", "01", "00"],
    ["11", "10", "01", "00"],
    ["11", "10", "01", "001", "000"],
    ["11", "10", "011", "010", "001", "000"],
    ["11", "000", "001", "011", "010", "101", "100"],
    ["111", "110", "101", "100", "011", "010", "001", "0001",
     "00001", "000001", "0000001", "00000001", "000000001",
     "0000000001", "00000000001"],
]


def _tz_maps():
    dec = []
    for lens, bits in zip(_TZ_LEN, _TZ_BITS):
        dec.append({_render(ln, b): i
                    for i, (ln, b) in enumerate(zip(lens, bits))})
    return dec


_TZ_DEC = _tz_maps()
_TZ_ENC = [{v: k for k, v in m.items()} for m in _TZ_DEC]
_TZ_CDC_DEC = [{c: i for i, c in enumerate(row)} for row in _TZ_CDC]
_RB_DEC = [{c: i for i, c in enumerate(row)} for row in _RUN_BEFORE]


def _read_vlc(r: _BitReader, table: dict, max_len: int = 16):
    code = ""
    for _ in range(max_len):
        code += "1" if r.u(1) else "0"
        if code in table:
            return table[code]
    raise ValueError("bad vlc")


# ---------------------------------------------------------------------
# Transforms and quantization (spec 8.5; flat scaling lists)
# ---------------------------------------------------------------------

# normAdjust4x4 (dequant) constants per qP % 6 and position class.
_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
      (14, 23, 18), (16, 25, 20), (18, 29, 23)]
# forward multipliers (encoder side, JM convention)
_MF = [(13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
       (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559)]

# position class per raster index in a 4x4 block: 0 for corners of
# the even lattice, 1 for odd-odd, 2 otherwise
_POS_CLASS = [0, 2, 0, 2,
              2, 1, 2, 1,
              0, 2, 0, 2,
              2, 1, 2, 1]

# 4x4 zigzag: scan position -> raster index
_ZIGZAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# Table 8-15: qPi -> qPc for the chroma QP
_QPC = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                          36, 36, 37, 37, 37, 38, 38, 38, 39, 39,
                          39, 39]


def _clip_qp(qp):
    return 0 if qp < 0 else (51 if qp > 51 else qp)


def _dequant4x4(coef, qp):
    """coef: list of 16 (raster order) quantized levels -> list of 16
    dequantized values. DC position included (callers overwrite it
    for the DC-transform paths)."""
    shift = qp // 6
    v = _V[qp % 6]
    return [(c * v[_POS_CLASS[i]]) << shift
            for i, c in enumerate(coef)]


def _itransform4x4(d):
    """Exact inverse 4x4 integer transform (8.5.12.2). d: 16 ints in
    raster order -> 16 residual ints (after (x+32)>>6)."""
    e = [0] * 16
    for i in range(4):  # rows
        d0, d1, d2, d3 = d[4 * i:4 * i + 4]
        a0 = d0 + d2
        a1 = d0 - d2
        a2 = (d1 >> 1) - d3
        a3 = d1 + (d3 >> 1)
        e[4 * i + 0] = a0 + a3
        e[4 * i + 1] = a1 + a2
        e[4 * i + 2] = a1 - a2
        e[4 * i + 3] = a0 - a3
    out = [0] * 16
    for j in range(4):  # columns
        d0, d1, d2, d3 = e[j], e[j + 4], e[j + 8], e[j + 12]
        a0 = d0 + d2
        a1 = d0 - d2
        a2 = (d1 >> 1) - d3
        a3 = d1 + (d3 >> 1)
        out[j] = (a0 + a3 + 32) >> 6
        out[j + 4] = (a1 + a2 + 32) >> 6
        out[j + 8] = (a1 - a2 + 32) >> 6
        out[j + 12] = (a0 - a3 + 32) >> 6
    return out


def _ftransform4x4(p):
    """Forward 4x4 core transform (encoder side)."""
    e = [0] * 16
    for i in range(4):
        p0, p1, p2, p3 = p[4 * i:4 * i + 4]
        s0, s1, s2, s3 = p0 + p3, p1 + p2, p1 - p2, p0 - p3
        e[4 * i + 0] = s0 + s1
        e[4 * i + 1] = 2 * s3 + s2
        e[4 * i + 2] = s0 - s1
        e[4 * i + 3] = s3 - 2 * s2
    out = [0] * 16
    for j in range(4):
        p0, p1, p2, p3 = e[j], e[j + 4], e[j + 8], e[j + 12]
        s0, s1, s2, s3 = p0 + p3, p1 + p2, p1 - p2, p0 - p3
        out[j] = s0 + s1
        out[j + 4] = 2 * s3 + s2
        out[j + 8] = s0 - s1
        out[j + 12] = s3 - 2 * s2
    return out


def _hadamard4x4(f):
    """4x4 Hadamard (self-inverse up to scale) for the Intra_16x16
    luma DC plane — used both directions."""
    e = [0] * 16
    for i in range(4):
        d0, d1, d2, d3 = f[4 * i:4 * i + 4]
        s0, s1, s2, s3 = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        e[4 * i + 0] = s0 + s3
        e[4 * i + 1] = s1 + s2
        e[4 * i + 2] = s1 - s2
        e[4 * i + 3] = s0 - s3
    out = [0] * 16
    for j in range(4):
        d0, d1, d2, d3 = e[j], e[j + 4], e[j + 8], e[j + 12]
        s0, s1, s2, s3 = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        out[j] = s0 + s3
        out[j + 4] = s1 + s2
        out[j + 8] = s1 - s2
        out[j + 12] = s0 - s3
    return out


def _dequant_luma_dc(f, qp):
    """Dequantize the inverse-Hadamard luma DC plane (8.5.10)."""
    v = _V[qp % 6][0]
    if qp >= 12:
        return [(x * v) << (qp // 6 - 2) for x in f]
    shift = 2 - qp // 6
    add = 1 << (1 - qp // 6)
    return [(x * v + add) >> shift for x in f]


def _chroma_dc_transform(c):
    """2x2 Hadamard for chroma DC (both directions)."""
    c00, c01, c10, c11 = c
    return [c00 + c01 + c10 + c11,
            c00 - c01 + c10 - c11,
            c00 + c01 - c10 - c11,
            c00 - c01 - c10 + c11]


def _dequant_chroma_dc(f, qpc):
    v = _V[qpc % 6][0]
    return [((x * v) << (qpc // 6)) >> 1 for x in f]


def _quant4x4(w, qp, intra=True, dc_skip=False):
    """Encoder-side quantization of forward-transform coefficients."""
    qbits = 15 + qp // 6
    f = ((1 << qbits) // 3) if intra else ((1 << qbits) // 6)
    mf = _MF[qp % 6]
    out = []
    for i, x in enumerate(w):
        if dc_skip and i == 0:
            out.append(0)
            continue
        m = mf[_POS_CLASS[i]]
        lv = (abs(x) * m + f) >> qbits
        out.append(-lv if x < 0 else lv)
    return out


def _quant_dc(values, qp, mf0_shift=1):
    """Encoder-side quantization of a (Hadamard-transformed) DC
    plane: level = (|x| * MF0 + 2f) >> (qbits + 1)."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    m = _MF[qp % 6][0]
    out = []
    for x in values:
        lv = (abs(x) * m + 2 * f) >> (qbits + mf0_shift)
        out.append(-lv if x < 0 else lv)
    return out


# ---------------------------------------------------------------------
# Residual block CAVLC read/write (spec 9.2)
# ---------------------------------------------------------------------


def _coeff_token_read(r: _BitReader, nC: int):
    if nC >= 8:
        v = r.u(6)
        if v == 3:
            return 0, 0
        return (v >> 2) + 1, v & 3
    ctx = 3 if nC < 0 else (0 if nC < 2 else (1 if nC < 4 else 2))
    return _read_vlc(r, _COEFF_TOKEN[ctx])


def _coeff_token_write(w: _BitWriter, nC: int, tc: int, t1: int):
    if nC >= 8:
        w.u(6, 3 if tc == 0 else (((tc - 1) << 2) | t1))
        return
    ctx = 3 if nC < 0 else (0 if nC < 2 else (1 if nC < 4 else 2))
    w.bits(_COEFF_TOKEN_ENC[ctx][(tc, t1)])


def _residual_read(r: _BitReader, nC: int, max_coeff: int):
    """Read one CAVLC residual block. Returns a list of max_coeff
    coefficient values in scan order."""
    tc, t1 = _coeff_token_read(r, nC)
    coeffs = [0] * max_coeff
    if tc == 0:
        return coeffs, 0
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(tc - t1):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("bad level prefix")
        size = suffix_len
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        level_code = (min(15, prefix) << suffix_len)
        if size:
            level_code += r.u(size)
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1 < 3:
            level_code += 2
        if level_code & 1:
            levels.append(-((level_code + 1) >> 1))
        else:
            levels.append((level_code + 2) >> 1)
        if suffix_len == 0:
            suffix_len = 1
        if abs(levels[-1]) > (3 << (suffix_len - 1)) \
                and suffix_len < 6:
            suffix_len += 1
    total_zeros = 0
    if tc < max_coeff:
        if nC < 0:
            total_zeros = _read_vlc(r, _TZ_CDC_DEC[tc - 1], 3)
        else:
            total_zeros = _read_vlc(r, _TZ_DEC[tc - 1], 9)
    pos = tc + total_zeros - 1
    zeros_left = total_zeros
    for i in range(tc):
        coeffs[pos] = levels[i]
        if i == tc - 1:
            break
        if zeros_left > 0:
            run = _read_vlc(r, _RB_DEC[min(zeros_left, 7) - 1], 11)
        else:
            run = 0
        zeros_left -= run
        pos -= 1 + run
    return coeffs, tc


def _residual_write(w: _BitWriter, nC: int, coeffs, max_coeff: int):
    """Encode one residual block (scan-order coefficient list); the
    exact inverse of _residual_read. Returns TotalCoeff."""
    nz = [(i, c) for i, c in enumerate(coeffs[:max_coeff]) if c]
    tc = len(nz)
    if tc == 0:
        _coeff_token_write(w, nC, 0, 0)
        return 0
    # trailing ones: up to 3 final +-1 values
    t1 = 0
    while t1 < 3 and t1 < tc and abs(nz[tc - 1 - t1][1]) == 1:
        t1 += 1
    _coeff_token_write(w, nC, tc, t1)
    for k in range(t1):
        w.u(1, 1 if nz[tc - 1 - k][1] < 0 else 0)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    rest = [nz[i][1] for i in range(tc - t1 - 1, -1, -1)]
    for i, level in enumerate(rest):
        level_code = 2 * level - 2 if level > 0 else -2 * level - 1
        if i == 0 and t1 < 3:
            level_code -= 2
        if suffix_len == 0:
            if level_code < 14:
                w.u(level_code + 1, 1)  # prefix zeros + stop bit
            elif level_code < 30:
                w.u(15, 1)  # prefix 14
                w.u(4, level_code - 14)
            else:
                assert level_code - 30 < (1 << 12), "level too large"
                w.u(16, 1)  # prefix 15
                w.u(12, level_code - 30)
        else:
            if level_code < (15 << suffix_len):
                prefix = level_code >> suffix_len
                w.u(prefix + 1, 1)
                w.u(suffix_len, level_code & ((1 << suffix_len) - 1))
            else:
                extra = level_code - (15 << suffix_len)
                assert extra < (1 << 12), "level too large"
                w.u(16, 1)  # prefix 15, 12-bit suffix
                w.u(12, extra)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = nz[tc - 1][0] - (tc - 1)
    if tc < max_coeff:
        if nC < 0:
            w.bits(_TZ_CDC[tc - 1][total_zeros])
        else:
            w.bits(_TZ_ENC[tc - 1][total_zeros])
    zeros_left = total_zeros
    for i in range(tc - 1, 0, -1):
        run = nz[i][0] - nz[i - 1][0] - 1
        if zeros_left > 0:
            w.bits(_RUN_BEFORE[min(zeros_left, 7) - 1][run])
        zeros_left -= run
    return tc


# ---------------------------------------------------------------------
# Intra prediction (spec 8.3)
# ---------------------------------------------------------------------


def _clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _pred4x4(mode, top, left, tl, avail_top, avail_left):
    """One 4x4 luma prediction. top: 8 samples p[0..7,-1] (top-right
    substitution already applied by the caller), left: p[-1,0..3],
    tl: p[-1,-1]. Returns a 16-list (raster)."""
    p = [0] * 16
    if mode == 0:  # Vertical
        for y in range(4):
            for x in range(4):
                p[4 * y + x] = top[x]
    elif mode == 1:  # Horizontal
        for y in range(4):
            for x in range(4):
                p[4 * y + x] = left[y]
    elif mode == 2:  # DC
        if avail_top and avail_left:
            dc = (sum(top[:4]) + sum(left) + 4) >> 3
        elif avail_top:
            dc = (sum(top[:4]) + 2) >> 2
        elif avail_left:
            dc = (sum(left) + 2) >> 2
        else:
            dc = 128
        p = [dc] * 16
    elif mode == 3:  # Diagonal Down-Left
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[4 * y + x] = (top[6] + 3 * top[7] + 2) >> 2
                else:
                    p[4 * y + x] = (top[x + y] + 2 * top[x + y + 1]
                                    + top[x + y + 2] + 2) >> 2
    elif mode == 4:  # Diagonal Down-Right
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[4 * y + x] = (top[x - y - 2] + 2 * top[x - y - 1]
                                    + top[x - y] + 2) >> 2
                elif x < y:
                    p[4 * y + x] = (left[y - x - 2] + 2 * left[y - x - 1]
                                    + left[y - x] + 2) >> 2
                else:
                    p[4 * y + x] = (top[0] + 2 * tl + left[0] + 2) >> 2
    elif mode == 5:  # Vertical-Right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    i = x - (y >> 1)
                    p[4 * y + x] = ((top[i - 1] if i >= 1 else tl)
                                    + top[i] + 1) >> 1
                elif z >= 0:
                    i = x - (y >> 1)
                    a = top[i - 2] if i >= 2 else (tl if i == 1 else 0)
                    b = top[i - 1] if i >= 1 else tl
                    p[4 * y + x] = (a + 2 * b + top[i] + 2) >> 2
                elif z == -1:
                    p[4 * y + x] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:
                    p[4 * y + x] = (left[y - 1] + 2 * left[y - 2]
                                    + (left[y - 3] if y >= 3 else tl)
                                    + 2) >> 2
    elif mode == 6:  # Horizontal-Down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    i = y - (x >> 1)
                    p[4 * y + x] = ((left[i - 1] if i >= 1 else tl)
                                    + left[i] + 1) >> 1
                elif z >= 0:
                    i = y - (x >> 1)
                    a = left[i - 2] if i >= 2 else (tl if i == 1 else 0)
                    b = left[i - 1] if i >= 1 else tl
                    p[4 * y + x] = (a + 2 * b + left[i] + 2) >> 2
                elif z == -1:
                    p[4 * y + x] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:
                    p[4 * y + x] = (top[x - 1] + 2 * top[x - 2]
                                    + (top[x - 3] if x >= 3 else tl)
                                    + 2) >> 2
    elif mode == 7:  # Vertical-Left
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[4 * y + x] = (top[i] + top[i + 1] + 1) >> 1
                else:
                    p[4 * y + x] = (top[i] + 2 * top[i + 1]
                                    + top[i + 2] + 2) >> 2
    elif mode == 8:  # Horizontal-Up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z > 5:  # zHU > 5: beyond the last interpolation
                    p[4 * y + x] = left[3]
                elif z == 5:
                    p[4 * y + x] = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    i = y + (x >> 1)
                    p[4 * y + x] = (left[i] + left[i + 1] + 1) >> 1
                else:
                    i = y + (x >> 1)
                    p[4 * y + x] = (left[i] + 2 * left[i + 1]
                                    + left[i + 2] + 2) >> 2
    else:
        raise ValueError("bad intra4x4 mode")
    return p


def _pred_plane(plane, x0, y0, size):
    """Plane prediction (8.3.2.4 luma 16x16 / 8.3.4.4 chroma 8x8)
    over a numpy plane with the block's top-left at (x0, y0).
    Returns a size x size list-of-lists."""
    half = size >> 1
    hmul = 5 if size == 16 else 34
    hsum = 0
    vsum = 0
    for i in range(half):
        hsum += (i + 1) * (int(plane[y0 - 1, x0 + half + i])
                           - int(plane[y0 - 1, x0 + half - 2 - i]))
        vsum += (i + 1) * (int(plane[y0 + half + i, x0 - 1])
                           - int(plane[y0 + half - 2 - i, x0 - 1]))
    a = 16 * (int(plane[y0 + size - 1, x0 - 1])
              + int(plane[y0 - 1, x0 + size - 1]))
    b = (hmul * hsum + 32) >> 6
    c = (hmul * vsum + 32) >> 6
    out = []
    for y in range(size):
        row = []
        for x in range(size):
            row.append(_clip255(
                (a + b * (x - (half - 1)) + c * (y - (half - 1))
                 + 16) >> 5))
        out.append(row)
    return out


# ---------------------------------------------------------------------
# Frame reconstruction state — shared by decoder and fixture encoder
# so both sides run the SAME prediction + reconstruction code.
# ---------------------------------------------------------------------

# z-scan: luma4x4BlkIdx -> (bx, by) within the MB, in 4x4 units
_ZSCAN_POS = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1),
              (3, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2),
              (2, 3), (3, 3)]
_ZSCAN_IDX = {pos: i for i, pos in enumerate(_ZSCAN_POS)}

# Table 9-4, intra column: codeNum -> coded_block_pattern
_CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43,
              45, 46, 16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42,
              44, 1, 2, 4, 8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33,
              34, 36, 40, 38, 41]
_CBP_INTRA_ENC = {v: i for i, v in enumerate(_CBP_INTRA)}


# ---------------------------------------------------------------------
# Inter prediction: quarter-pel luma interpolation (spec 8.4.2.2.1)
# ---------------------------------------------------------------------

#: reference-plane edge padding in luma samples — realizes the spec's
#: out-of-picture sample clamping; bounds the legal MV excursion
_MC_PAD = 32


def _h6(a):
    """6-tap (1,-5,20,20,-5,1) along axis 1; width w+5 -> w,
    UNROUNDED (the spec's b1/h1 intermediates)."""
    return (a[:, 0:-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
            + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])


def _v6(a):
    """6-tap along axis 0; height h+5 -> h, unrounded."""
    return (a[0:-5, :] - 5 * a[1:-4, :] + 20 * a[2:-3, :]
            + 20 * a[3:-2, :] - 5 * a[4:-1, :] + a[5:, :])


def _interp_luma(ref, x0, y0, w, h, mvx, mvy):
    """One w x h quarter-pel luma prediction block from the padded
    reference plane (x0, y0 already include the pad offset). The
    sixteen (xFrac, yFrac) cases follow 8.4.2.2.2's sample grid
    (G a b c / d e f g / h i j k m / n p q r / M ... s): half
    samples from the 6-tap filter, the centre j from the 6-tap over
    UNROUNDED horizontal intermediates, quarter samples as half-up
    averages of their two nearest integer/half neighbours."""
    import numpy as np

    px, py = x0 + (mvx >> 2), y0 + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3
    if fx == 0 and fy == 0:
        return ref[py:py + h, px:px + w].copy()

    def clip(a):
        return np.clip(a, 0, 255)

    def b_at(dy):       # horizontal half row-block shifted dy rows
        a = ref[py + dy:py + dy + h, px - 2:px + w + 3]
        return clip((_h6(a) + 16) >> 5)

    def h_at(dx):       # vertical half col-block shifted dx cols
        a = ref[py - 2:py + h + 3, px + dx:px + dx + w]
        return clip((_v6(a) + 16) >> 5)

    G = ref[py:py + h, px:px + w]
    if fy == 0:         # a, b, c — horizontal only
        b = b_at(0)
        if fx == 2:
            return b
        H = ref[py:py + h, px + 1:px + w + 1]
        return (b + (G if fx == 1 else H) + 1) >> 1
    if fx == 0:         # d, h, n — vertical only
        hh = h_at(0)
        if fy == 2:
            return hh
        M = ref[py + 1:py + h + 1, px:px + w]
        return (hh + (G if fy == 1 else M) + 1) >> 1
    # centre j and the mixed quarters need j and/or two halves
    hv = _h6(ref[py - 2:py + h + 3, px - 2:px + w + 3])   # (h+5, w)
    j = clip((_v6(hv) + 512) >> 10)
    if fx == 2 and fy == 2:
        return j
    if fx == 2:         # f (fy 1) / q (fy 3): j with b / s
        other = b_at(0) if fy == 1 else b_at(1)
        return (j + other + 1) >> 1
    if fy == 2:         # i (fx 1) / k (fx 3): j with h / m
        other = h_at(0) if fx == 1 else h_at(1)
        return (j + other + 1) >> 1
    # diagonal quarters e/g/p/r: nearest horizontal half (b or s)
    # averaged with nearest vertical half (h or m)
    bh = b_at(0) if fy == 1 else b_at(1)
    vh = h_at(0) if fx == 1 else h_at(1)
    return (bh + vh + 1) >> 1


class _FrameState:
    """Reconstruction buffers + neighbor bookkeeping for one frame."""

    def __init__(self, mbw: int, mbh: int):
        import numpy as np

        self.np = np
        self.mbw, self.mbh = mbw, mbh
        self.Y = np.zeros((mbh * 16, mbw * 16), dtype=np.int32)
        self.Cb = np.zeros((mbh * 8, mbw * 8), dtype=np.int32)
        self.Cr = np.zeros((mbh * 8, mbw * 8), dtype=np.int32)
        # per-4x4-block TotalCoeff for CAVLC nC derivation
        self.nc_y = np.zeros((mbh * 4, mbw * 4), dtype=np.int32)
        self.nc_cb = np.zeros((mbh * 2, mbw * 2), dtype=np.int32)
        self.nc_cr = np.zeros((mbh * 2, mbw * 2), dtype=np.int32)
        # intra4x4 pred mode per block; -1 = not an Intra_4x4 block
        self.i4mode = np.full((mbh * 4, mbw * 4), -1, dtype=np.int32)
        # per-MB luma QP + I_PCM flag, recorded for the in-loop
        # deblocking filter (spec 8.7.2: qPp of an I_PCM MB is 0)
        self.qp_map = np.zeros((mbh, mbw), dtype=np.int32)
        self.pcm = np.zeros((mbh, mbw), dtype=bool)
        # inter-prediction state (P slices): per-4x4 motion vector
        # (quarter-pel) and reference index (-1 = intra/unset), a
        # decoded-before grid for neighbor availability (8.4.1.3),
        # per-MB intra flag for deblocking bS (8.7.2.1), and the
        # previous decoded picture's padded planes as reference
        self.mv = np.zeros((mbh * 4, mbw * 4, 2), dtype=np.int32)
        self.ref = np.full((mbh * 4, mbw * 4), -1, dtype=np.int32)
        self.seen = np.zeros((mbh * 4, mbw * 4), dtype=bool)
        self.intra = np.ones((mbh, mbw), dtype=bool)
        self.refpic = None      # (padY, padCb, padCr) or None

    # -- inter prediction (8.4) -----------------------------------------

    def set_ref_picture(self, Y, Cb, Cr):
        """Install the previous DECODED (post-deblock) picture as
        the single L0 reference, edge-padded so MVs may point up to
        _MC_PAD luma samples outside the picture (spec 8.4.2.2.1
        sample clamping, realized by replication)."""
        np = self.np
        self.refpic = (
            np.pad(Y, _MC_PAD, mode="edge").astype(np.int32),
            np.pad(Cb, _MC_PAD // 2, mode="edge").astype(np.int32),
            np.pad(Cr, _MC_PAD // 2, mode="edge").astype(np.int32))

    def store_mv(self, x0, y0, w, h, mv, ref=0):
        """Record one partition's MV/ref over its 4x4 grid cells."""
        gx, gy = x0 // 4, y0 // 4
        self.mv[gy:gy + h // 4, gx:gx + w // 4] = mv
        self.ref[gy:gy + h // 4, gx:gx + w // 4] = ref
        self.seen[gy:gy + h // 4, gx:gx + w // 4] = True

    def mark_intra_mb(self, mbx, mby):
        """Intra MB in a P slice: ref -1, mv 0, but the grid cells
        count as decoded for neighbor availability."""
        self.store_mv(mbx * 16, mby * 16, 16, 16, (0, 0), ref=-1)

    def _nbr(self, gx, gy):
        """(available, ref, mv) of the 4x4 grid cell — unavailable
        outside the picture or not yet decoded (8.4.1.3.2)."""
        if gx < 0 or gy < 0 or gx >= self.mbw * 4 \
                or gy >= self.mbh * 4 or not self.seen[gy, gx]:
            return False, -1, (0, 0)
        return (True, int(self.ref[gy, gx]),
                (int(self.mv[gy, gx, 0]), int(self.mv[gy, gx, 1])))

    def mv_pred(self, x0, y0, w, h, part=None, ref=0):
        """Luma MV predictor (8.4.1.3) for the partition at luma
        offset (x0, y0) size (w, h). ``part`` selects the 16x8/8x16
        directional rules; None = median/16x16/sub-partition path."""
        gx0, gy0 = x0 // 4, y0 // 4
        gw = w // 4
        avail_a, ref_a, mv_a = self._nbr(gx0 - 1, gy0)
        avail_b, ref_b, mv_b = self._nbr(gx0, gy0 - 1)
        avail_c, ref_c, mv_c = self._nbr(gx0 + gw, gy0 - 1)
        if not avail_c:     # C -> D substitution (6.4.11.7)
            avail_c, ref_c, mv_c = self._nbr(gx0 - 1, gy0 - 1)
        # directional rules take priority (8.4.1.3 items 2-5)
        if part == "16x8_top" and ref_b == ref:
            return mv_b
        if part == "16x8_bot" and ref_a == ref:
            return mv_a
        if part == "8x16_left" and ref_a == ref:
            return mv_a
        if part == "8x16_right" and ref_c == ref:
            return mv_c
        # 8.4.1.3.1: B, C (and the D it substituted) all unavailable
        # and A available -> A wins regardless of reference
        if avail_a and not avail_b and not avail_c:
            return mv_a
        matches = [mv for a, rf, mv in
                   ((avail_a, ref_a, mv_a), (avail_b, ref_b, mv_b),
                    (avail_c, ref_c, mv_c)) if a and rf == ref]
        if len(matches) == 1:
            return matches[0]
        med = tuple(
            sorted((mv_a[i], mv_b[i], mv_c[i]))[1] for i in (0, 1))
        return med

    def skip_mv(self, mbx, mby):
        """P_Skip MV derivation (8.4.1.1): zero when A/B are
        unavailable or either is a zero-MV ref-0 block, else the
        16x16 predictor."""
        gx0, gy0 = mbx * 4, mby * 4
        avail_a, ref_a, mv_a = self._nbr(gx0 - 1, gy0)
        avail_b, ref_b, mv_b = self._nbr(gx0, gy0 - 1)
        if not avail_a or not avail_b:
            return (0, 0)
        if ref_a == 0 and mv_a == (0, 0):
            return (0, 0)
        if ref_b == 0 and mv_b == (0, 0):
            return (0, 0)
        return self.mv_pred(mbx * 16, mby * 16, 16, 16)

    def mc_luma(self, x0, y0, w, h, mv):
        """Quarter-pel motion-compensated luma block (8.4.2.2.1),
        int32 (h, w)."""
        return _interp_luma(self.refpic[0], x0 + _MC_PAD,
                            y0 + _MC_PAD, w, h, mv[0], mv[1])

    def mc_chroma(self, plane, x0, y0, w, h, mv):
        """Eighth-pel bilinear chroma MC (8.4.2.2.2). (x0, y0) are
        CHROMA plane offsets; mv stays in quarter-luma units."""
        ref = self.refpic[1 + plane]
        pad = _MC_PAD // 2
        px = x0 + pad + (mv[0] >> 3)
        py = y0 + pad + (mv[1] >> 3)
        dx, dy = mv[0] & 7, mv[1] & 7
        A = ref[py:py + h, px:px + w]
        B = ref[py:py + h, px + 1:px + w + 1]
        C = ref[py + 1:py + h + 1, px:px + w]
        D = ref[py + 1:py + h + 1, px + 1:px + w + 1]
        return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B
                + (8 - dx) * dy * C + dx * dy * D + 32) >> 6

    # -- CAVLC context ------------------------------------------------

    def _nc(self, grid, bx, by):
        a = grid[by, bx - 1] if bx > 0 else None
        b = grid[by - 1, bx] if by > 0 else None
        if a is not None and b is not None:
            return (int(a) + int(b) + 1) >> 1
        if a is not None:
            return int(a)
        if b is not None:
            return int(b)
        return 0

    def luma_nc(self, mbx, mby, blk):
        bx, by = _ZSCAN_POS[blk]
        return self._nc(self.nc_y, mbx * 4 + bx, mby * 4 + by)

    def chroma_nc(self, mbx, mby, blk, plane):
        grid = self.nc_cb if plane == 0 else self.nc_cr
        return self._nc(grid, mbx * 2 + blk % 2, mby * 2 + blk // 2)

    def set_luma_nc(self, mbx, mby, blk, tc):
        bx, by = _ZSCAN_POS[blk]
        self.nc_y[mby * 4 + by, mbx * 4 + bx] = tc

    def set_chroma_nc(self, mbx, mby, blk, plane, tc):
        grid = self.nc_cb if plane == 0 else self.nc_cr
        grid[mby * 2 + blk // 2, mbx * 2 + blk % 2] = tc

    # -- Intra_4x4 mode derivation (8.3.1.1) ---------------------------

    def pred_i4_mode(self, mbx, mby, blk):
        bx, by = _ZSCAN_POS[blk]
        gx, gy = mbx * 4 + bx, mby * 4 + by
        ma = int(self.i4mode[gy, gx - 1]) if gx > 0 else -1
        mb_ = int(self.i4mode[gy - 1, gx]) if gy > 0 else -1
        ma = 2 if ma < 0 else ma
        mb_ = 2 if mb_ < 0 else mb_
        return min(ma, mb_)

    def set_i4_mode(self, mbx, mby, blk, mode):
        bx, by = _ZSCAN_POS[blk]
        self.i4mode[mby * 4 + by, mbx * 4 + bx] = mode

    # -- neighbor sample gathering -------------------------------------

    def _decoded_before(self, gx, gy, mbx, mby, blk):
        """Is 4x4 block (gx, gy) (global 4x4 coords) decoded before
        block blk of MB (mbx, mby)? Raster MB order, z-scan inside."""
        if gx < 0 or gy < 0 or gx >= self.mbw * 4 or gy >= self.mbh * 4:
            return False
        omx, omy = gx // 4, gy // 4
        if (omy, omx) < (mby, mbx):
            return True
        if (omy, omx) > (mby, mbx):
            return False
        return _ZSCAN_IDX[(gx % 4, gy % 4)] < blk

    def luma_neighbors(self, mbx, mby, blk):
        """(top8, left4, tl, avail_top, avail_left) for one 4x4 block
        with the spec's top-right substitution."""
        bx, by = _ZSCAN_POS[blk]
        x0, y0 = mbx * 16 + bx * 4, mby * 16 + by * 4
        Y = self.Y
        avail_top = y0 > 0
        avail_left = x0 > 0
        top = [int(Y[y0 - 1, x0 + i]) for i in range(4)] \
            if avail_top else [0] * 4
        left = [int(Y[y0 + i, x0 - 1]) for i in range(4)] \
            if avail_left else [0] * 4
        tl = int(Y[y0 - 1, x0 - 1]) if (avail_top and avail_left) else 0
        if avail_top:
            tr_ok = self._decoded_before(
                (x0 + 4) // 4, (y0 - 1) // 4, mbx, mby, blk)
            if tr_ok:
                top = top + [int(Y[y0 - 1, x0 + 4 + i])
                             for i in range(4)]
            else:
                top = top + [top[3]] * 4
        else:
            top = top + [0] * 4
        return top, left, tl, avail_top, avail_left

    # -- block reconstruction -------------------------------------------

    def recon_luma4x4(self, mbx, mby, blk, mode, residual):
        """Predict + add residual for one 4x4 luma block (residual is
        a 16-list in raster order, already inverse-transformed)."""
        top, left, tl, at, al = self.luma_neighbors(mbx, mby, blk)
        pred = _pred4x4(mode, top, left, tl, at, al)
        bx, by = _ZSCAN_POS[blk]
        x0, y0 = mbx * 16 + bx * 4, mby * 16 + by * 4
        for y in range(4):
            for x in range(4):
                self.Y[y0 + y, x0 + x] = _clip255(
                    pred[4 * y + x] + residual[4 * y + x])
        return pred

    def pred_luma16(self, mbx, mby, mode):
        """16x16 prediction -> 16x16 list-of-lists."""
        x0, y0 = mbx * 16, mby * 16
        Y = self.Y
        at, al = y0 > 0, x0 > 0
        if mode == 0:  # V
            if not at:
                raise ValueError("I16 V without top")
            row = [int(Y[y0 - 1, x0 + x]) for x in range(16)]
            return [row[:] for _ in range(16)]
        if mode == 1:  # H
            if not al:
                raise ValueError("I16 H without left")
            return [[int(Y[y0 + y, x0 - 1])] * 16 for y in range(16)]
        if mode == 2:  # DC
            if at and al:
                dc = (sum(int(Y[y0 - 1, x0 + x]) for x in range(16))
                      + sum(int(Y[y0 + y, x0 - 1]) for y in range(16))
                      + 16) >> 5
            elif at:
                dc = (sum(int(Y[y0 - 1, x0 + x])
                          for x in range(16)) + 8) >> 4
            elif al:
                dc = (sum(int(Y[y0 + y, x0 - 1])
                          for y in range(16)) + 8) >> 4
            else:
                dc = 128
            return [[dc] * 16 for _ in range(16)]
        if mode == 3:  # Plane
            if not (at and al):
                raise ValueError("I16 plane without neighbors")
            return _pred_plane(Y, x0, y0, 16)
        raise ValueError("bad intra16 mode")

    def pred_chroma(self, mbx, mby, mode, plane):
        """8x8 chroma prediction -> 8x8 list-of-lists."""
        C = self.Cb if plane == 0 else self.Cr
        x0, y0 = mbx * 8, mby * 8
        at, al = y0 > 0, x0 > 0
        if mode == 0:  # DC, per 4x4 sub-block
            out = [[0] * 8 for _ in range(8)]
            for yo in (0, 4):
                for xo in (0, 4):
                    tops = [int(C[y0 - 1, x0 + xo + i])
                            for i in range(4)] if at else None
                    lefts = [int(C[y0 + yo + i, x0 - 1])
                             for i in range(4)] if al else None
                    if xo == 0 and yo == 0 or (xo == 4 and yo == 4):
                        if tops is not None and lefts is not None:
                            dc = (sum(tops) + sum(lefts) + 4) >> 3
                        elif tops is not None:
                            dc = (sum(tops) + 2) >> 2
                        elif lefts is not None:
                            dc = (sum(lefts) + 2) >> 2
                        else:
                            dc = 128
                    elif xo == 4 and yo == 0:
                        if tops is not None:
                            dc = (sum(tops) + 2) >> 2
                        elif lefts is not None:
                            dc = (sum(lefts) + 2) >> 2
                        else:
                            dc = 128
                    else:  # (0, 4)
                        if lefts is not None:
                            dc = (sum(lefts) + 2) >> 2
                        elif tops is not None:
                            dc = (sum(tops) + 2) >> 2
                        else:
                            dc = 128
                    for y in range(4):
                        for x in range(4):
                            out[yo + y][xo + x] = dc
            return out
        if mode == 1:  # Horizontal
            if not al:
                raise ValueError("chroma H without left")
            return [[int(C[y0 + y, x0 - 1])] * 8 for y in range(8)]
        if mode == 2:  # Vertical
            if not at:
                raise ValueError("chroma V without top")
            row = [int(C[y0 - 1, x0 + x]) for x in range(8)]
            return [row[:] for _ in range(8)]
        if mode == 3:  # Plane
            if not (at and al):
                raise ValueError("chroma plane without neighbors")
            return _pred_plane(C, x0, y0, 8)
        raise ValueError("bad chroma mode")

    def add_block(self, plane, x0, y0, pred, residual):
        """pred: list-of-lists; residual: 16-list raster or None."""
        P = (self.Y, self.Cb, self.Cr)[plane]
        for y in range(4):
            for x in range(4):
                r = residual[4 * y + x] if residual is not None else 0
                P[y0 + y, x0 + x] = _clip255(pred[y][x] + r)


# ---------------------------------------------------------------------
# Slice decode
# ---------------------------------------------------------------------


def _parse_slice_header(r: _BitReader, sps, pps, nal_type, nal_ref_idc):
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 not in (0, 2):  # P and I slices
        return None
    is_p = slice_type % 5 == 0
    pps_id = r.ue()
    r.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == 5:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
    if is_p:
        if r.u(1):  # num_ref_idx_active_override_flag
            if r.ue() != 0:   # num_ref_idx_l0_active_minus1
                return None   # single-reference DPB only
        # ref_pic_list_modification (7.3.3.1)
        if r.u(1):            # ref_pic_list_modification_flag_l0
            return None
    if nal_ref_idc:
        if nal_type == 5:
            r.u(1)  # no_output_of_prior_pics
            r.u(1)  # long_term_reference_flag
        else:
            if r.u(1):  # adaptive_ref_pic_marking_mode
                return None
    slice_qp = pps["pic_init_qp"] + r.se()
    disable_deblock = 0
    alpha_off = beta_off = 0
    if pps["deblocking_filter_control"]:
        disable_deblock = r.ue()
        if disable_deblock != 1:
            alpha_off = r.se() * 2    # FilterOffsetA (spec 7.4.3)
            beta_off = r.se() * 2     # FilterOffsetB
    return {"first_mb": first_mb, "slice_qp": slice_qp,
            "pps_id": pps_id, "disable_deblock": disable_deblock,
            "alpha_off": alpha_off, "beta_off": beta_off,
            "is_p": is_p}


def _decode_mb(r, st, mbx, mby, qpy, chroma_qp_offset, mb_type=None):
    """Decode one intra macroblock (I slice, or an intra MB inside a
    P slice when ``mb_type`` is passed pre-adjusted). Returns the
    updated running QPy. Raises ValueError/EOFError on malformed
    input."""
    if mb_type is None:
        mb_type = r.ue()
    if mb_type > 25:
        raise ValueError("bad I mb_type")

    if mb_type == 25:  # I_PCM
        st.pcm[mby, mbx] = True
        st.qp_map[mby, mbx] = qpy
        r.byte_align()
        y0, x0 = mby * 16, mbx * 16
        for y in range(16):
            row = r.bytes_aligned(16)
            for x in range(16):
                st.Y[y0 + y, x0 + x] = row[x]
        for plane in (st.Cb, st.Cr):
            for y in range(8):
                row = r.bytes_aligned(8)
                for x in range(8):
                    plane[mby * 8 + y, mbx * 8 + x] = row[x]
        for blk in range(16):
            st.set_luma_nc(mbx, mby, blk, 16)
        for blk in range(4):
            st.set_chroma_nc(mbx, mby, blk, 0, 16)
            st.set_chroma_nc(mbx, mby, blk, 1, 16)
        return qpy

    if mb_type == 0:  # Intra_4x4
        modes = []
        for blk in range(16):
            pred = st.pred_i4_mode(mbx, mby, blk)
            if r.u(1):
                mode = pred
            else:
                rem = r.u(3)
                mode = rem if rem < pred else rem + 1
            modes.append(mode)
            # record as we go: later blocks in this MB derive from it
            st.set_i4_mode(mbx, mby, blk, mode)
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise ValueError("bad chroma mode")
        cbp_code = r.ue()
        if cbp_code > 47:
            raise ValueError("bad cbp")
        cbp = _CBP_INTRA[cbp_code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qpy = (qpy + r.se() + 52) % 52
        st.qp_map[mby, mbx] = qpy
        for blk in range(16):
            if cbp_luma & (1 << (blk >> 2)):
                nc = st.luma_nc(mbx, mby, blk)
                coeffs, tc = _residual_read(r, nc, 16)
                st.set_luma_nc(mbx, mby, blk, tc)
                raster = [0] * 16
                for k in range(16):
                    raster[_ZIGZAG4[k]] = coeffs[k]
                residual = _itransform4x4(_dequant4x4(raster, qpy))
            else:
                st.set_luma_nc(mbx, mby, blk, 0)
                residual = [0] * 16
            st.recon_luma4x4(mbx, mby, blk, modes[blk], residual)
        _decode_chroma(r, st, mbx, mby, qpy, chroma_qp_offset,
                       chroma_mode, cbp_chroma)
        return qpy

    # Intra_16x16
    mt = mb_type - 1
    pred16_mode = mt % 4
    cbp_chroma = (mt // 4) % 3
    cbp_luma = 15 if mt >= 12 else 0
    chroma_mode = r.ue()
    if chroma_mode > 3:
        raise ValueError("bad chroma mode")
    qpy = (qpy + r.se() + 52) % 52
    st.qp_map[mby, mbx] = qpy
    # luma DC: 16 coefficients, nC derived like block 0
    nc = st.luma_nc(mbx, mby, 0)
    dc_scan, _tc = _residual_read(r, nc, 16)
    dc_raster = [0] * 16
    for k in range(16):
        dc_raster[_ZIGZAG4[k]] = dc_scan[k]
    dc = _dequant_luma_dc(_hadamard4x4(dc_raster), qpy)
    pred = st.pred_luma16(mbx, mby, pred16_mode)
    for blk in range(16):
        if cbp_luma:
            nc = st.luma_nc(mbx, mby, blk)
            coeffs, tc = _residual_read(r, nc, 15)
            st.set_luma_nc(mbx, mby, blk, tc)
            raster = [0] * 16
            for k in range(15):
                raster[_ZIGZAG4[k + 1]] = coeffs[k]
        else:
            st.set_luma_nc(mbx, mby, blk, 0)
            raster = [0] * 16
        deq = _dequant4x4(raster, qpy)
        bx, by = _ZSCAN_POS[blk]
        # raster position of this block's DC inside the DC plane
        deq[0] = dc[by * 4 + bx]
        residual = _itransform4x4(deq)
        x0, y0 = mbx * 16 + bx * 4, mby * 16 + by * 4
        sub = [pred[by * 4 + yy][bx * 4:bx * 4 + 4] for yy in range(4)]
        st.add_block(0, x0, y0, sub, residual)
    _decode_chroma(r, st, mbx, mby, qpy, chroma_qp_offset,
                   chroma_mode, cbp_chroma)
    return qpy


def _decode_chroma(r, st, mbx, mby, qpy, chroma_qp_offset,
                   chroma_mode, cbp_chroma, preds=None):
    """Chroma residual decode + reconstruction. ``preds``: two 8x8
    list-of-lists (inter MC predictions) — when None the intra
    ``chroma_mode`` prediction is used."""
    qpc = _QPC[_clip_qp(qpy + chroma_qp_offset)]
    dc_vals = [[0] * 4, [0] * 4]
    if cbp_chroma:
        for plane in range(2):
            coeffs, _tc = _residual_read(r, -1, 4)
            dc_vals[plane] = _dequant_chroma_dc(
                _chroma_dc_transform(coeffs), qpc)
    ac = [[None] * 4, [None] * 4]
    if cbp_chroma == 2:
        for plane in range(2):
            for blk in range(4):
                nc = st.chroma_nc(mbx, mby, blk, plane)
                coeffs, tc = _residual_read(r, nc, 15)
                st.set_chroma_nc(mbx, mby, blk, plane, tc)
                ac[plane][blk] = coeffs
    else:
        for plane in range(2):
            for blk in range(4):
                st.set_chroma_nc(mbx, mby, blk, plane, 0)
    for plane in range(2):
        pred = preds[plane] if preds is not None \
            else st.pred_chroma(mbx, mby, chroma_mode, plane)
        for blk in range(4):
            raster = [0] * 16
            if ac[plane][blk] is not None:
                for k in range(15):
                    raster[_ZIGZAG4[k + 1]] = ac[plane][blk][k]
            deq = _dequant4x4(raster, qpc)
            deq[0] = dc_vals[plane][blk]
            residual = _itransform4x4(deq)
            xo, yo = (blk % 2) * 4, (blk // 2) * 4
            sub = [pred[yo + yy][xo:xo + 4] for yy in range(4)]
            st.add_block(plane + 1, mbx * 8 + xo, mby * 8 + yo,
                         sub, residual)


# ---------------------------------------------------------------------
# P-slice macroblocks (spec 7.3.5 / 8.4)
# ---------------------------------------------------------------------

#: Table 9-4, Inter column: codeNum -> coded_block_pattern
_CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
              14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43,
              45, 46, 17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30,
              22, 25, 38, 41]
_CBP_INTER_ENC = {v: i for i, v in enumerate(_CBP_INTER)}

#: P mb_type (Table 7-13) -> luma partitions
#: (x_off, y_off, w, h, directional-predictor hint)
_P_PARTS = {
    0: [(0, 0, 16, 16, None)],
    1: [(0, 0, 16, 8, "16x8_top"), (0, 8, 16, 8, "16x8_bot")],
    2: [(0, 0, 8, 16, "8x16_left"), (8, 0, 8, 16, "8x16_right")],
}
#: P sub_mb_type (Table 7-17) -> sub-partitions within one 8x8
_SUB_PARTS = {
    0: [(0, 0, 8, 8)],
    1: [(0, 0, 8, 4), (0, 4, 8, 4)],
    2: [(0, 0, 4, 8), (4, 0, 4, 8)],
    3: [(0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)],
}


def _inter_pred_mb(st, mbx, mby, parts):
    """Motion-compensated 16x16 luma + two 8x8 chroma predictions
    from a list of (x_off, y_off, w, h, mv) partitions."""
    np = st.np
    predY = np.zeros((16, 16), dtype=np.int32)
    predC = [np.zeros((8, 8), dtype=np.int32) for _ in range(2)]
    for xo, yo, w, h, mv in parts:
        predY[yo:yo + h, xo:xo + w] = st.mc_luma(
            mbx * 16 + xo, mby * 16 + yo, w, h, mv)
        for pl in range(2):
            predC[pl][yo // 2:(yo + h) // 2,
                      xo // 2:(xo + w) // 2] = st.mc_chroma(
                pl, mbx * 8 + xo // 2, mby * 8 + yo // 2,
                w // 2, h // 2, mv)
    return predY, predC


def _recon_p_skip(st, mbx, mby, qpy):
    """P_Skip: MC prediction with the skip MV, no residual."""
    mv = st.skip_mv(mbx, mby)
    st.intra[mby, mbx] = False
    st.qp_map[mby, mbx] = qpy
    st.store_mv(mbx * 16, mby * 16, 16, 16, mv)
    predY, predC = _inter_pred_mb(st, mbx, mby,
                                  [(0, 0, 16, 16, mv)])
    st.Y[mby * 16:mby * 16 + 16, mbx * 16:mbx * 16 + 16] = predY
    st.Cb[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = predC[0]
    st.Cr[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = predC[1]
    for blk in range(16):
        st.set_luma_nc(mbx, mby, blk, 0)
    for blk in range(4):
        st.set_chroma_nc(mbx, mby, blk, 0, 0)
        st.set_chroma_nc(mbx, mby, blk, 1, 0)
    return mv


def _read_p_mvs(r, st, mbx, mby, mb_type):
    """Parse mb_pred/sub_mb_pred MVDs and reconstruct this MB's MVs
    in partition order (each prediction sees earlier partitions'
    stored vectors, 8.4.1.3). Returns [(xo, yo, w, h, mv), ...]."""
    x0, y0 = mbx * 16, mby * 16
    parts = []
    if mb_type in (0, 1, 2):
        specs = _P_PARTS[mb_type]
        # 7.3.5.1: ref_idx list first (absent with one reference),
        # then every partition's mvd pair in order
        mvds = [(r.se(), r.se()) for _ in specs]
        for (xo, yo, w, h, hint), (dx, dy) in zip(specs, mvds):
            px, py = st.mv_pred(x0 + xo, y0 + yo, w, h, part=hint)
            mv = (px + dx, py + dy)
            st.store_mv(x0 + xo, y0 + yo, w, h, mv)
            parts.append((xo, yo, w, h, mv))
        return parts
    # P_8x8 / P_8x8ref0 (7.3.5.2): four sub_mb_types, then ref_idx
    # (absent), then mvds grouped by 8x8 block in sub-part order
    subs = []
    for _ in range(4):
        smt = r.ue()
        if smt > 3:
            raise ValueError("bad P sub_mb_type")
        subs.append(smt)
    for blk in range(4):
        bx, by = (blk % 2) * 8, (blk // 2) * 8
        for sxo, syo, w, h in _SUB_PARTS[subs[blk]]:
            dx, dy = r.se(), r.se()
            px, py = st.mv_pred(x0 + bx + sxo, y0 + by + syo, w, h)
            mv = (px + dx, py + dy)
            st.store_mv(x0 + bx + sxo, y0 + by + syo, w, h, mv)
            parts.append((bx + sxo, by + syo, w, h, mv))
    return parts


def _decode_mb_p(r, st, mbx, mby, qpy, chroma_qp_offset):
    """Decode one non-skipped P-slice macroblock. Returns the
    updated running QPy."""
    mb_type = r.ue()
    if mb_type >= 5:
        # intra MB in a P slice: mb_type - 5 indexes Table 7-11
        st.mark_intra_mb(mbx, mby)
        return _decode_mb(r, st, mbx, mby, qpy, chroma_qp_offset,
                          mb_type - 5)
    if mb_type > 4:
        raise ValueError("bad P mb_type")
    st.intra[mby, mbx] = False
    parts = _read_p_mvs(r, st, mbx, mby, mb_type)
    predY, predC = _inter_pred_mb(st, mbx, mby, parts)
    cbp_code = r.ue()
    if cbp_code > 47:
        raise ValueError("bad cbp")
    cbp = _CBP_INTER[cbp_code]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp:
        qpy = (qpy + r.se() + 52) % 52
    st.qp_map[mby, mbx] = qpy
    x0, y0 = mbx * 16, mby * 16
    for blk in range(16):
        bx, by = _ZSCAN_POS[blk]
        if cbp_luma & (1 << (blk >> 2)):
            nc = st.luma_nc(mbx, mby, blk)
            coeffs, tc = _residual_read(r, nc, 16)
            st.set_luma_nc(mbx, mby, blk, tc)
            raster = [0] * 16
            for k in range(16):
                raster[_ZIGZAG4[k]] = coeffs[k]
            residual = _itransform4x4(_dequant4x4(raster, qpy))
        else:
            st.set_luma_nc(mbx, mby, blk, 0)
            residual = [0] * 16
        sub = predY[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
        st.add_block(0, x0 + bx * 4, y0 + by * 4, sub, residual)
    _decode_chroma(r, st, mbx, mby, qpy, chroma_qp_offset,
                   None, cbp_chroma, preds=predC)
    return qpy


# ---------------------------------------------------------------------
# In-loop deblocking filter (spec section 8.7)
# ---------------------------------------------------------------------

#: Table 8-16: alpha'(indexA) and beta'(indexB)
_DB_ALPHA = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
    162, 182, 203, 226, 255, 255)
_DB_BETA = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18)
#: Table 8-17: t'C0(indexA, bS) for bS = 1, 2, 3
_DB_TC0 = (
    (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
    (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
    (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
    (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
    (0, 0, 0), (0, 0, 1), (0, 0, 1), (0, 1, 1),
    (0, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 2),
    (1, 1, 2), (1, 1, 2), (1, 1, 2), (1, 2, 3),
    (1, 2, 3), (2, 2, 3), (2, 2, 4), (2, 3, 4),
    (2, 3, 4), (3, 3, 5), (3, 4, 6), (3, 4, 6),
    (4, 5, 7), (4, 5, 8), (5, 6, 9), (6, 7, 10),
    (6, 8, 11), (7, 9, 12), (8, 10, 13), (9, 11, 15),
    (10, 13, 17), (11, 15, 19), (13, 17, 23), (14, 19, 25),
    (16, 21, 28), (18, 24, 31), (20, 26, 34), (23, 29, 37))


def _deblock_core(P, Q, bs, qpav, off_a, off_b, chroma):
    """Filter one edge (spec 8.7.2.3/8.7.2.4), vectorized over the
    edge's parallel sample lines. ``P``/``Q`` are length-4 lists of
    int32 arrays [x0, x1, x2, x3] = the samples at distance 1..4
    from the edge on each side. Returns the (possibly) modified
    [p0, p1, p2] and [q0, q1, q2] arrays. All shifts are arithmetic
    (numpy ``>>`` floors on negatives, exactly the spec's >>)."""
    import numpy as np

    idx_a = min(51, max(0, qpav + off_a))
    idx_b = min(51, max(0, qpav + off_b))
    alpha, beta = _DB_ALPHA[idx_a], _DB_BETA[idx_b]
    p0, p1, p2, p3 = P
    q0, q1, q2, q3 = Q
    fs = ((np.abs(p0 - q0) < alpha)
          & (np.abs(p1 - p0) < beta)
          & (np.abs(q1 - q0) < beta))
    if not fs.any():
        return [p0, p1, p2], [q0, q1, q2]
    if bs == 4:
        if chroma:
            np0 = np.where(fs, (2 * p1 + p0 + q1 + 2) >> 2, p0)
            nq0 = np.where(fs, (2 * q1 + q0 + p1 + 2) >> 2, q0)
            return [np0, p1, p2], [nq0, q1, q2]
        strong = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        ap = (np.abs(p2 - p0) < beta) & strong
        aq = (np.abs(q2 - q0) < beta) & strong
        np0 = np.where(
            fs, np.where(ap, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1
                              + 4) >> 3,
                         (2 * p1 + p0 + q1 + 2) >> 2), p0)
        np1 = np.where(fs & ap, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
        np2 = np.where(fs & ap,
                       (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
        nq0 = np.where(
            fs, np.where(aq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1
                              + 4) >> 3,
                         (2 * q1 + q0 + p1 + 2) >> 2), q0)
        nq1 = np.where(fs & aq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
        nq2 = np.where(fs & aq,
                       (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
        return [np0, np1, np2], [nq0, nq1, nq2]
    tc0 = _DB_TC0[idx_a][bs - 1]
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    if chroma:
        tc = np.full_like(p0, tc0 + 1)
    else:
        tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
    delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = np.where(fs, np.clip(p0 + delta, 0, 255), p0)
    nq0 = np.where(fs, np.clip(q0 - delta, 0, 255), q0)
    np1, nq1 = p1, q1
    if not chroma:
        dp1 = np.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1,
                      -tc0, tc0)
        dq1 = np.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1,
                      -tc0, tc0)
        np1 = np.where(fs & ap, p1 + dp1, p1)
        nq1 = np.where(fs & aq, q1 + dq1, q1)
    return [np0, np1, p2], [nq0, nq1, q2]


def _deblock_plane_edge(plane, x_edge, y0, n, horiz, bs, qpav,
                        off_a, off_b, chroma):
    """Apply _deblock_core across one straight edge of ``n`` lines.
    Vertical edge: samples plane[y0:y0+n, x_edge±i]; horizontal:
    transposed."""
    if horiz:
        P = [plane[x_edge - 1 - i, y0:y0 + n].astype("int32")
             for i in range(4)]
        Q = [plane[x_edge + i, y0:y0 + n].astype("int32")
             for i in range(4)]
    else:
        P = [plane[y0:y0 + n, x_edge - 1 - i].astype("int32")
             for i in range(4)]
        Q = [plane[y0:y0 + n, x_edge + i].astype("int32")
             for i in range(4)]
    newP, newQ = _deblock_core(P, Q, bs, qpav, off_a, off_b, chroma)
    for i in range(3):
        if horiz:
            plane[x_edge - 1 - i, y0:y0 + n] = newP[i]
            plane[x_edge + i, y0:y0 + n] = newQ[i]
        else:
            plane[y0:y0 + n, x_edge - 1 - i] = newP[i]
            plane[y0:y0 + n, x_edge + i] = newQ[i]


def _edge_bs(st, horiz, mx, my, k, seg):
    """Boundary strength (spec 8.7.2.1) of one 4-sample segment of
    edge k of MB (mx, my): 4/3 when either side is intra (MB edge /
    internal), 2 when either 4x4 block carries non-zero coefficient
    levels, 1 on a >=1-quarter-sample MV difference or different
    references, else 0 (segment unfiltered)."""
    if horiz:
        qgx, qgy = mx * 4 + seg, my * 4 + k
    else:
        qgx, qgy = mx * 4 + k, my * 4 + seg
    pgx, pgy = (qgx, qgy - 1) if horiz else (qgx - 1, qgy)
    p_intra = st.intra[pgy // 4, pgx // 4]
    q_intra = st.intra[qgy // 4, qgx // 4]
    if p_intra or q_intra:
        return 4 if k == 0 else 3
    if st.nc_y[pgy, pgx] > 0 or st.nc_y[qgy, qgx] > 0:
        return 2
    if int(st.ref[pgy, pgx]) != int(st.ref[qgy, qgx]):
        return 1
    if abs(int(st.mv[pgy, pgx, 0]) - int(st.mv[qgy, qgx, 0])) >= 4 \
            or abs(int(st.mv[pgy, pgx, 1])
                   - int(st.mv[qgy, qgx, 1])) >= 4:
        return 1
    return 0


def _deblock_frame(st, sh, chroma_qp_offset):
    """In-loop deblocking (spec 8.7): per MB in raster order, the 4
    vertical luma edges left→right, then the 4 horizontal edges
    top→bottom, then the 2+2 chroma edges — each edge reading the
    samples as modified by every previous edge, the normative
    sequential order. bS comes from _edge_bs per 4-sample segment
    (for all-intra frames it collapses to 4 on MB edges and 3 on
    internal transform edges; P frames add the coefficient/MV
    cases, with chroma segments inheriting the co-located luma
    bS). qPp of an I_PCM MB is 0 (8.7.2), so two adjacent PCM MBs
    average to indexA ≤ offsets — alpha' 0 — and lossless samples
    pass through untouched."""
    off_a, off_b = sh["alpha_off"], sh["beta_off"]

    def qp_of(mx, my):
        return 0 if st.pcm[my, mx] else int(st.qp_map[my, mx])

    def qpc_of(mx, my):
        return _QPC[_clip_qp(qp_of(mx, my) + chroma_qp_offset)]

    def run_edge(plane, edge, base, horiz, seg_bs, qpav, chroma):
        """Filter one straight edge, grouping contiguous equal-bS
        segments into single vectorized calls."""
        seg_n = 2 if chroma else 4
        s = 0
        while s < 4:
            e = s
            while e < 4 and seg_bs[e] == seg_bs[s]:
                e += 1
            if seg_bs[s] > 0:
                _deblock_plane_edge(
                    plane, edge, base + s * seg_n,
                    (e - s) * seg_n, horiz, seg_bs[s], qpav,
                    off_a, off_b, chroma)
            s = e

    for my in range(st.mbh):
        for mx in range(st.mbw):
            qq, qqc = qp_of(mx, my), qpc_of(mx, my)
            for horiz in (False, True):
                # neighbor across the MB edge for this direction
                nx, ny = (mx - 1, my) if not horiz else (mx, my - 1)
                for k in range(4):
                    if k == 0 and (nx < 0 or ny < 0):
                        continue   # picture boundary: never filtered
                    seg_bs = [_edge_bs(st, horiz, mx, my, k, s)
                              for s in range(4)]
                    if not any(seg_bs):
                        continue
                    qp_p = qp_of(nx, ny) if k == 0 else qq
                    qpav = (qp_p + qq + 1) >> 1
                    edge = (my * 16 if horiz else mx * 16) + 4 * k
                    base = mx * 16 if horiz else my * 16
                    run_edge(st.Y, edge, base, horiz, seg_bs, qpav,
                             False)
                    if k in (0, 2):   # chroma edges at luma 0 and 8
                        qpc_p = qpc_of(nx, ny) if k == 0 else qqc
                        qpcav = (qpc_p + qqc + 1) >> 1
                        cedge = (my * 8 if horiz else mx * 8) \
                            + 2 * k
                        cbase = mx * 8 if horiz else my * 8
                        for cp in (st.Cb, st.Cr):
                            run_edge(cp, cedge, cbase, horiz,
                                     seg_bs, qpcav, True)


def decode_h264_frames(payload: bytes, avcc: bytes = None,
                       max_mbs: int = 65536, max_frames: int = 64):
    """Decode every access unit of an H.264 elementary stream —
    IDR/I frames plus P frames (spec 8.4: MV prediction, quarter-pel
    luma / eighth-pel chroma motion compensation, P_Skip, all P
    partition shapes down to 4x4), single-reference baseline.

    payload: Annex B stream (SPS/PPS inline), or length-prefixed
    MP4 samples when ``avcc`` (the avcC extradata box body) is
    given. Returns a list of (width, height, (Y, Cb, Cr)) in
    decode order — or None for anything outside the supported
    subset (CABAC, B slices, interlace, multi-slice pictures,
    multi-reference lists) or malformed."""
    try:
        sps = pps = None
        slices = []
        if avcc is not None:
            if len(avcc) < 7 or avcc[0] != 1:
                return None
            length_size = (avcc[4] & 3) + 1
            n_sps = avcc[5] & 31
            pos = 6
            for _ in range(n_sps):
                ln = int.from_bytes(avcc[pos:pos + 2], "big")
                pos += 2
                cand = parse_sps(avcc[pos:pos + ln])
                sps = sps or cand
                pos += ln
            n_pps = avcc[pos]
            pos += 1
            for _ in range(n_pps):
                ln = int.from_bytes(avcc[pos:pos + 2], "big")
                pos += 2
                cand = parse_pps(avcc[pos:pos + ln])
                pps = pps or cand
                pos += ln
            nals = split_avcc(payload, length_size)
        else:
            nals = split_annexb(payload)
        for nal in nals:
            hdr = _nal_header(nal)
            if hdr is None:
                continue
            ref_idc, ntype = hdr
            if ntype == 7:
                sps = sps or parse_sps(nal)
            elif ntype == 8:
                pps = pps or parse_pps(nal)
            elif ntype in (1, 5):
                slices.append((ref_idc, ntype, nal))
        if sps is None or pps is None or not slices:
            return None
        mbw, mbh = sps["pic_width_mbs"], sps["pic_height_mbs"]
        if mbw * mbh > max_mbs:
            # fuzz/abuse guard: a forged SPS can declare absurd
            # dimensions; cap the allocation (default 4096x4096)
            return None
        n_mbs = mbw * mbh
        cqo = pps["chroma_qp_offset"]
        frames = []
        prev = None     # last decoded picture (uncropped planes)
        for ref_idc, ntype, nal in slices[:max_frames]:
            r = _BitReader(_ebsp_to_rbsp(nal[1:]))
            sh = _parse_slice_header(r, sps, pps, ntype, ref_idc)
            if sh is None or sh["first_mb"] != 0:
                return None
            if sh["is_p"] and prev is None:
                return None     # P with no decoded reference
            st = _FrameState(mbw, mbh)
            if prev is not None:
                st.set_ref_picture(*prev)
            qpy = _clip_qp(sh["slice_qp"])
            if not sh["is_p"]:
                for addr in range(n_mbs):
                    qpy = _decode_mb(r, st, addr % mbw,
                                     addr // mbw, qpy, cqo)
                    if addr < n_mbs - 1 and not r.more_rbsp_data():
                        return None  # truncated multi-MB slice
            else:
                addr = 0
                while addr < n_mbs:
                    run = r.ue()     # mb_skip_run (7.3.4)
                    if addr + run > n_mbs:
                        return None
                    for _ in range(run):
                        _recon_p_skip(st, addr % mbw, addr // mbw,
                                      qpy)
                        addr += 1
                    if addr >= n_mbs:
                        break
                    if not r.more_rbsp_data():
                        return None  # truncated slice
                    qpy = _decode_mb_p(r, st, addr % mbw,
                                       addr // mbw, qpy, cqo)
                    addr += 1
            if sh["disable_deblock"] != 1:
                # in-loop deblocking (spec 8.7); idc 2 only exempts
                # slice boundaries, and single-slice pictures (the
                # only shape accepted) have none that aren't
                # picture edges — identical to idc 0 here
                _deblock_frame(st, sh, cqo)
            # the reference is the post-deblock (in-loop) picture
            prev = (st.Y, st.Cb, st.Cr)
            cl, cr_, ct, cb_ = sps["crop"]
            w, h = sps["width"], sps["height"]
            frames.append((w, h, (
                st.Y[2 * ct:2 * ct + h, 2 * cl:2 * cl + w],
                st.Cb[ct:ct + (h + 1) // 2, cl:cl + (w + 1) // 2],
                st.Cr[ct:ct + (h + 1) // 2, cl:cl + (w + 1) // 2])))
        return frames or None
    except (EOFError, ValueError, IndexError, KeyError):
        return None


def decode_h264_frame(payload: bytes, avcc: bytes = None,
                      max_mbs: int = 65536,
                      approximate: bool = False):
    """Decode the first frame of an H.264 elementary stream (see
    :func:`decode_h264_frames` for the multi-frame API and the
    supported subset). Returns (width, height, (Y, Cb, Cr)) or
    None. ``approximate`` is kept for API compatibility; it no
    longer gates anything (CAVLC intra + P inter are fully
    supported, CABAC/B/interlace streams still return None)."""
    frames = decode_h264_frames(payload, avcc=avcc,
                                max_mbs=max_mbs, max_frames=1)
    return frames[0] if frames else None


# ---------------------------------------------------------------------
# Fixture encoder (I_PCM / Intra_16x16 / Intra_4x4, CAVLC)
# ---------------------------------------------------------------------


def _rgb_to_yuv420(px):
    """BT.601 full-range RGB -> (Y, Cb, Cr) with 2x2-mean chroma
    subsampling; gray input maps to Y with neutral chroma. Same
    convention as the JPEG codec in multimodal.py."""
    import numpy as np

    a = np.asarray(px)
    if a.ndim == 2:
        Y = a.astype(np.float64)
        h, w = a.shape
        cb = np.full(((h + 1) // 2, (w + 1) // 2), 128.0)
        cr = cb.copy()
        return (np.round(Y).astype(np.int32),
                cb.astype(np.int32), cr.astype(np.int32))
    r = a[:, :, 0].astype(np.float64)
    g = a[:, :, 1].astype(np.float64)
    b = a[:, :, 2].astype(np.float64)
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    h, w = Y.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    def sub(p):
        q = np.empty((ph, pw))
        q[:h, :w] = p
        q[h:, :w] = p[h - 1:, :]
        q[:h, w:] = p[:, w - 1:]
        q[h:, w:] = p[h - 1:, w - 1:]
        return np.round((q[0::2, 0::2] + q[0::2, 1::2]
                         + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0)
    return (np.clip(np.round(Y), 0, 255).astype(np.int32),
            np.clip(sub(cb), 0, 255).astype(np.int32),
            np.clip(sub(cr), 0, 255).astype(np.int32))


def _yuv420_to_rgb(Y, Cb, Cr):
    """Inverse of _rgb_to_yuv420 (nearest-neighbor chroma
    upsampling), returning HxWx3 uint8."""
    import numpy as np

    h, w = Y.shape
    cb = Cb.astype(np.float64).repeat(2, 0).repeat(2, 1)[:h, :w] - 128
    cr = Cr.astype(np.float64).repeat(2, 0).repeat(2, 1)[:h, :w] - 128
    y = Y.astype(np.float64)
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _sad(a, b):
    return sum(abs(x - y) for x, y in zip(a, b))


def _write_sps(mbw, mbh, crop, num_ref=0):
    w = _BitWriter()
    w.u(8, 66)   # profile_idc baseline
    w.u(8, 0xC0)  # constraint_set0/1
    w.u(8, 30)   # level 3.0
    w.ue(0)      # sps_id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(2)      # pic_order_cnt_type 2
    w.ue(num_ref)  # max_num_ref_frames
    w.u(1, 0)    # gaps_in_frame_num
    w.ue(mbw - 1)
    w.ue(mbh - 1)
    w.u(1, 1)    # frame_mbs_only
    w.u(1, 0)    # direct_8x8_inference
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(1, 0)
    w.u(1, 0)    # vui_parameters_present
    w.rbsp_trailing()
    return b"\x67" + _rbsp_to_ebsp(w.getvalue())


def _write_pps():
    w = _BitWriter()
    w.ue(0)      # pps_id
    w.ue(0)      # sps_id
    w.u(1, 0)    # entropy_coding_mode: CAVLC
    w.u(1, 0)    # bottom_field_pic_order_in_frame_present
    w.ue(0)      # num_slice_groups_minus1
    w.ue(0)      # num_ref_idx_l0
    w.ue(0)      # num_ref_idx_l1
    w.u(1, 0)    # weighted_pred
    w.u(2, 0)    # weighted_bipred
    w.se(0)      # pic_init_qp_minus26
    w.se(0)      # pic_init_qs_minus26
    w.se(0)      # chroma_qp_index_offset
    w.u(1, 1)    # deblocking_filter_control_present
    w.u(1, 0)    # constrained_intra_pred
    w.u(1, 0)    # redundant_pic_cnt_present
    w.rbsp_trailing()
    return b"\x68" + _rbsp_to_ebsp(w.getvalue())


def _fwd_quant_block(st_plane_src, pred, x0, y0, qp, dc_skip):
    """Residual of one 4x4 (src - pred), forward transform, quantize.
    Returns (levels_raster, w_dc) where w_dc is the unquantized
    forward-transform DC (for the DC-plane paths)."""
    resid = []
    for y in range(4):
        for x in range(4):
            resid.append(int(st_plane_src[y0 + y, x0 + x])
                         - pred[y][x])
    wt = _ftransform4x4(resid)
    return _quant4x4(wt, qp, intra=True, dc_skip=dc_skip), wt[0]


def _encode_mb_i16(w, st, srcY, srcC, mbx, mby, qp, qpc,
                   type_off=0):
    """Encode one Intra_16x16 MB and reconstruct it in st exactly as
    the decoder will. ``type_off``: 5 when inside a P slice (Table
    7-13 maps P mb_type 5.. to the intra table)."""
    x0, y0 = mbx * 16, mby * 16
    at, al = mby > 0, mbx > 0
    cand = [2]
    if at:
        cand.append(0)
    if al:
        cand.append(1)
    if at and al:
        cand.append(3)
    best = None
    for m in cand:
        pred = st.pred_luma16(mbx, mby, m)
        sad = sum(abs(int(srcY[y0 + y, x0 + x]) - pred[y][x])
                  for y in range(16) for x in range(16))
        if best is None or sad < best[0]:
            best = (sad, m, pred)
    _sad16, mode16, pred = best

    dc_w = [0] * 16
    ac_levels = [None] * 16
    for blk in range(16):
        bx, by = _ZSCAN_POS[blk]
        sub = [pred[by * 4 + yy][bx * 4:bx * 4 + 4] for yy in range(4)]
        levels, wdc = _fwd_quant_block(
            srcY, sub, x0 + bx * 4, y0 + by * 4, qp, dc_skip=True)
        ac_levels[blk] = levels
        dc_w[by * 4 + bx] = wdc
    # forward luma-DC Hadamard carries a >>1 before quantization
    # (the decoder's dequant path has the matching 2x gain)
    dc_levels = _quant_dc([x >> 1 for x in _hadamard4x4(dc_w)],
                          qp, mf0_shift=1)
    cbp_luma = 15 if any(any(lv) for lv in ac_levels) else 0

    chroma_mode, cdc_levels, cac_levels, cbp_chroma, cpreds = \
        _encode_chroma_plan(st, srcC, mbx, mby, qpc)

    mt = 1 + mode16 + 4 * cbp_chroma + 12 * (1 if cbp_luma else 0)
    w.ue(type_off + mt)
    w.ue(chroma_mode)
    w.se(0)  # mb_qp_delta
    # luma DC (zigzag over the DC plane)
    dc_scan = [dc_levels[_ZIGZAG4[k]] for k in range(16)]
    _residual_write(w, st.luma_nc(mbx, mby, 0), dc_scan, 16)
    dc_deq = _dequant_luma_dc(_hadamard4x4(
        [dc_levels[i] for i in range(16)]), qp)
    for blk in range(16):
        bx, by = _ZSCAN_POS[blk]
        if cbp_luma:
            nc = st.luma_nc(mbx, mby, blk)
            scan = [ac_levels[blk][_ZIGZAG4[k + 1]] for k in range(15)]
            tc = _residual_write(w, nc, scan, 15)
            st.set_luma_nc(mbx, mby, blk, tc)
            raster = ac_levels[blk][:]
        else:
            st.set_luma_nc(mbx, mby, blk, 0)
            raster = [0] * 16
        deq = _dequant4x4(raster, qp)
        deq[0] = dc_deq[by * 4 + bx]
        residual = _itransform4x4(deq)
        sub = [pred[by * 4 + yy][bx * 4:bx * 4 + 4] for yy in range(4)]
        st.add_block(0, x0 + bx * 4, y0 + by * 4, sub, residual)
    _encode_chroma_write(w, st, mbx, mby, qpc, chroma_mode,
                         cbp_chroma, cdc_levels, cac_levels, cpreds)


def _encode_chroma_plan(st, srcC, mbx, mby, qpc):
    """Choose chroma mode, quantize chroma residuals. Returns
    (mode, dc_levels[2], ac_levels[2][4], cbp_chroma, preds[2])."""
    at, al = mby > 0, mbx > 0
    cand = [0]
    if al:
        cand.append(1)
    if at:
        cand.append(2)
    if at and al:
        cand.append(3)
    best = None
    for m in cand:
        sad = 0
        preds = []
        for plane in range(2):
            pred = st.pred_chroma(mbx, mby, m, plane)
            preds.append(pred)
            S = srcC[plane]
            sad += sum(abs(int(S[mby * 8 + y, mbx * 8 + x])
                           - pred[y][x])
                       for y in range(8) for x in range(8))
        if best is None or sad < best[0]:
            best = (sad, m, preds)
    _s, mode, preds = best
    dc_levels = [None, None]
    ac_levels = [[None] * 4, [None] * 4]
    for plane in range(2):
        dcs = [0] * 4
        for blk in range(4):
            xo, yo = (blk % 2) * 4, (blk // 2) * 4
            sub = [preds[plane][yo + yy][xo:xo + 4] for yy in range(4)]
            levels, wdc = _fwd_quant_block(
                srcC[plane], sub, mbx * 8 + xo, mby * 8 + yo, qpc,
                dc_skip=True)
            ac_levels[plane][blk] = levels
            dcs[blk] = wdc
        dc_levels[plane] = _quant_dc(
            _chroma_dc_transform(dcs), qpc, mf0_shift=1)
    any_ac = any(any(lv) for pl in ac_levels for lv in pl)
    any_dc = any(any(dl) for dl in dc_levels)
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
    return mode, dc_levels, ac_levels, cbp_chroma, preds


def _encode_chroma_write(w, st, mbx, mby, qpc, mode, cbp_chroma,
                         dc_levels, ac_levels, preds):
    """Write chroma residuals and reconstruct exactly as the
    decoder's _decode_chroma does."""
    dc_deq = [[0] * 4, [0] * 4]
    if cbp_chroma:
        for plane in range(2):
            _residual_write(w, -1, dc_levels[plane], 4)
            dc_deq[plane] = _dequant_chroma_dc(
                _chroma_dc_transform(dc_levels[plane]), qpc)
    if cbp_chroma == 2:
        for plane in range(2):
            for blk in range(4):
                nc = st.chroma_nc(mbx, mby, blk, plane)
                scan = [ac_levels[plane][blk][_ZIGZAG4[k + 1]]
                        for k in range(15)]
                tc = _residual_write(w, nc, scan, 15)
                st.set_chroma_nc(mbx, mby, blk, plane, tc)
    else:
        for plane in range(2):
            for blk in range(4):
                st.set_chroma_nc(mbx, mby, blk, plane, 0)
    for plane in range(2):
        for blk in range(4):
            raster = [0] * 16
            if cbp_chroma == 2:
                raster = ac_levels[plane][blk][:]
                raster[0] = 0
            deq = _dequant4x4(raster, qpc)
            deq[0] = dc_deq[plane][blk]
            residual = _itransform4x4(deq)
            xo, yo = (blk % 2) * 4, (blk // 2) * 4
            sub = [preds[plane][yo + yy][xo:xo + 4] for yy in range(4)]
            st.add_block(plane + 1, mbx * 8 + xo, mby * 8 + yo,
                         sub, residual)


# mode -> (needs_top, needs_left, needs_both)
_I4_NEEDS = {0: (True, False), 1: (False, True), 2: (False, False),
             3: (True, False), 4: (True, True), 5: (True, True),
             6: (True, True), 7: (True, False), 8: (False, True)}


def _encode_mb_i4(w, st, srcY, srcC, mbx, mby, qp, qpc):
    """Encode one Intra_4x4 MB (two-pass: plan levels in z-order with
    live reconstruction, then the writes happen inline since nC
    snapshots are taken before each block's set)."""
    x0, y0 = mbx * 16, mby * 16
    modes = [0] * 16
    flags = []          # (prev_flag, rem) per block
    levels_all = [None] * 16
    nc_at = [0] * 16
    tc_all = [0] * 16
    # pass 1: choose modes, quantize, reconstruct (updates st)
    for blk in range(16):
        top, left, tl, at, al = st.luma_neighbors(mbx, mby, blk)
        best = None
        for m in range(9):
            nt, nl = _I4_NEEDS[m]
            if (nt and not at) or (nl and not al):
                continue
            pred = _pred4x4(m, top, left, tl, at, al)
            bx, by = _ZSCAN_POS[blk]
            src = [int(srcY[y0 + by * 4 + yy, x0 + bx * 4 + xx])
                   for yy in range(4) for xx in range(4)]
            sad = _sad(src, pred)
            if best is None or sad < best[0]:
                best = (sad, m, pred)
        _s, mode, pred = best
        pm = st.pred_i4_mode(mbx, mby, blk)
        if mode == pm:
            flags.append((1, 0))
        else:
            flags.append((0, mode if mode < pm else mode - 1))
        modes[blk] = mode
        st.set_i4_mode(mbx, mby, blk, mode)
        bx, by = _ZSCAN_POS[blk]
        pred_ll = [pred[4 * yy:4 * yy + 4] for yy in range(4)]
        levels, _wdc = _fwd_quant_block(
            srcY, pred_ll, x0 + bx * 4, y0 + by * 4, qp,
            dc_skip=False)
        levels_all[blk] = levels
        nc_at[blk] = st.luma_nc(mbx, mby, blk)
        tc_all[blk] = sum(1 for v in levels if v)
        st.set_luma_nc(mbx, mby, blk, tc_all[blk])
        residual = _itransform4x4(_dequant4x4(levels, qp))
        st.add_block(0, x0 + bx * 4, y0 + by * 4, pred_ll, residual)
    cbp_luma = 0
    for g in range(4):
        if any(any(levels_all[4 * g + i]) for i in range(4)):
            cbp_luma |= 1 << g
    chroma_mode, cdc_levels, cac_levels, cbp_chroma, cpreds = \
        _encode_chroma_plan(st, srcC, mbx, mby, qpc)
    # pass 2: write
    w.ue(0)  # mb_type I_NxN
    for prev, rem in flags:
        w.u(1, prev)
        if not prev:
            w.u(3, rem)
    w.ue(chroma_mode)
    cbp = cbp_luma | (cbp_chroma << 4)
    w.ue(_CBP_INTRA_ENC[cbp])
    if cbp:
        w.se(0)  # mb_qp_delta
    for blk in range(16):
        if cbp_luma & (1 << (blk >> 2)):
            scan = [levels_all[blk][_ZIGZAG4[k]] for k in range(16)]
            tc = _residual_write(w, nc_at[blk], scan, 16)
            assert tc == tc_all[blk]
    _encode_chroma_write(w, st, mbx, mby, qpc, chroma_mode,
                         cbp_chroma, cdc_levels, cac_levels, cpreds)


def _encode_mb_pcm(w, st, srcY, srcC, mbx, mby):
    w.ue(25)
    w.byte_align_zero()
    x0, y0 = mbx * 16, mby * 16
    for y in range(16):
        for x in range(16):
            v = int(srcY[y0 + y, x0 + x])
            w.u(8, v)
            st.Y[y0 + y, x0 + x] = v
    for plane in range(2):
        P = (st.Cb, st.Cr)[plane]
        for y in range(8):
            for x in range(8):
                v = int(srcC[plane][mby * 8 + y, mbx * 8 + x])
                w.u(8, v)
                P[mby * 8 + y, mbx * 8 + x] = v
    for blk in range(16):
        st.set_luma_nc(mbx, mby, blk, 16)
    for blk in range(4):
        st.set_chroma_nc(mbx, mby, blk, 0, 16)
        st.set_chroma_nc(mbx, mby, blk, 1, 16)


def _chroma_levels_for_preds(srcC, preds, mbx, mby, qpc,
                             intra=True):
    """Quantized chroma DC/AC levels for FIXED predictions (the
    inter-MB twin of _encode_chroma_plan's quantization step)."""
    dc_levels = [None, None]
    ac_levels = [[None] * 4, [None] * 4]
    for plane in range(2):
        dcs = [0] * 4
        for blk in range(4):
            xo, yo = (blk % 2) * 4, (blk // 2) * 4
            sub = [[int(preds[plane][yo + yy][xo + xx])
                    for xx in range(4)] for yy in range(4)]
            resid = [int(srcC[plane][mby * 8 + yo + yy,
                                     mbx * 8 + xo + xx])
                     - sub[yy][xx]
                     for yy in range(4) for xx in range(4)]
            wt = _ftransform4x4(resid)
            ac_levels[plane][blk] = _quant4x4(
                wt, qpc, intra=intra, dc_skip=True)
            dcs[blk] = wt[0]
        dc_levels[plane] = _quant_dc(
            _chroma_dc_transform(dcs), qpc, mf0_shift=1)
    any_ac = any(any(lv) for pl in ac_levels for lv in pl)
    any_dc = any(any(dl) for dl in dc_levels)
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
    return dc_levels, ac_levels, cbp_chroma


def _encode_mb_p(w, st, srcY, srcC, mbx, mby, qp, qpc, kind):
    """Encode one inter P macroblock (P_L0_16x16 / 16x8 / 8x16 /
    P_8x8 with a deterministic sub-partition mix), reconstructing in
    ``st`` exactly as the decoder will. MVs are a deterministic
    per-position pattern sweeping every quarter-pel phase."""
    x0, y0 = mbx * 16, mby * 16
    st.intra[mby, mbx] = False

    def pick_mv(salt):
        # quarter-pel MV pattern covering all 16 fractional phases
        # and both signs, bounded well inside _MC_PAD
        return (((mbx * 5 + mby * 3 + salt) % 17) - 8,
                ((mbx * 3 + mby * 7 + 2 * salt) % 13) - 6)

    if kind == "p16":
        mb_type, specs = 0, _P_PARTS[0]
    elif kind == "p16x8":
        mb_type, specs = 1, _P_PARTS[1]
    elif kind == "p8x16":
        mb_type, specs = 2, _P_PARTS[2]
    else:   # p8x8
        mb_type = 3
    w.ue(mb_type)
    parts = []
    if mb_type in (0, 1, 2):
        mvs = [pick_mv(i) for i in range(len(specs))]
        # compute mvds with the DECODER's sequential predict-store
        # order (each partition's predictor sees earlier partitions'
        # stored vectors), then serialize them together per 7.3.5.1
        mvds = []
        for (xo, yo, pw, ph, hint), mv in zip(specs, mvs):
            px, py = st.mv_pred(x0 + xo, y0 + yo, pw, ph, part=hint)
            mvds.append((mv[0] - px, mv[1] - py))
            st.store_mv(x0 + xo, y0 + yo, pw, ph, mv)
            parts.append((xo, yo, pw, ph, mv))
        for dx, dy in mvds:
            w.se(dx)
            w.se(dy)
    else:
        subs = [(mbx + mby + i) % 4 for i in range(4)]   # all shapes
        for smt in subs:
            w.ue(smt)
        salt = 0
        for blk in range(4):
            bx, by = (blk % 2) * 8, (blk // 2) * 8
            for sxo, syo, pw, ph in _SUB_PARTS[subs[blk]]:
                mv = pick_mv(salt)
                salt += 1
                px, py = st.mv_pred(x0 + bx + sxo, y0 + by + syo,
                                    pw, ph)
                w.se(mv[0] - px)
                w.se(mv[1] - py)
                st.store_mv(x0 + bx + sxo, y0 + by + syo, pw, ph, mv)
                parts.append((bx + sxo, by + syo, pw, ph, mv))
    predY, predC = _inter_pred_mb(st, mbx, mby, parts)

    # quantize luma residuals (16-coefficient inter blocks)
    levels_all = [None] * 16
    for blk in range(16):
        bx, by = _ZSCAN_POS[blk]
        resid = [int(srcY[y0 + by * 4 + yy, x0 + bx * 4 + xx])
                 - int(predY[by * 4 + yy, bx * 4 + xx])
                 for yy in range(4) for xx in range(4)]
        levels_all[blk] = _quant4x4(_ftransform4x4(resid), qp,
                                    intra=False)
    cbp_luma = 0
    for g in range(4):
        if any(any(levels_all[4 * g + i]) for i in range(4)):
            cbp_luma |= 1 << g
    dc_levels, ac_levels, cbp_chroma = _chroma_levels_for_preds(
        srcC, predC, mbx, mby, qpc, intra=False)
    cbp = cbp_luma | (cbp_chroma << 4)
    w.ue(_CBP_INTER_ENC[cbp])
    if cbp:
        w.se(0)   # mb_qp_delta
    st.qp_map[mby, mbx] = qp
    # luma residual write + reconstruction
    for blk in range(16):
        bx, by = _ZSCAN_POS[blk]
        if cbp_luma & (1 << (blk >> 2)):
            nc = st.luma_nc(mbx, mby, blk)
            scan = [levels_all[blk][_ZIGZAG4[k]] for k in range(16)]
            tc = _residual_write(w, nc, scan, 16)
            st.set_luma_nc(mbx, mby, blk, tc)
            residual = _itransform4x4(
                _dequant4x4(levels_all[blk], qp))
        else:
            st.set_luma_nc(mbx, mby, blk, 0)
            residual = [0] * 16
        sub = predY[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
        st.add_block(0, x0 + bx * 4, y0 + by * 4, sub, residual)
    if cbp_chroma:
        _encode_chroma_write(w, st, mbx, mby, qpc, None, cbp_chroma,
                             dc_levels, ac_levels, predC)
    else:
        # reconstruction without any coded chroma residual
        _encode_chroma_write(w, st, mbx, mby, qpc, None, 0,
                             dc_levels, ac_levels, predC)


def encode_h264_sequence(frames, qp: int = 26,
                         disable_deblock_idc: int = 1,
                         p_kinds=("skip", "p16", "p16x8", "p8x16",
                                  "p8x8", "i16")):
    """Encode a list of same-size images as IDR + P frames (Annex B,
    baseline, CAVLC, one reference). Frame 0 is an Intra_16x16 IDR;
    each later frame is a P frame whose MBs rotate deterministically
    through ``p_kinds`` (P_Skip, every P partition shape down to
    4x4 sub-blocks, and an intra MB inside the P slice), with MVs
    sweeping all sixteen quarter-pel phases. Returns
    (annexb_bytes, [recon_rgb per frame]) where recon is the
    encoder's embedded decoder-identical reconstruction — the exact
    frames a conformant decoder must produce (used by the bit-exact
    fixtures in tests/test_h264.py)."""
    import numpy as np

    assert 6 <= qp <= 51
    pads = []
    for px in frames:
        Y, Cb, Cr = _rgb_to_yuv420(px)
        h, w_ = Y.shape
        assert h % 2 == 0 and w_ % 2 == 0
        mbw, mbh = (w_ + 15) // 16, (h + 15) // 16
        padY = np.empty((mbh * 16, mbw * 16), dtype=np.int32)
        padY[:h, :w_] = Y
        padY[h:, :w_] = Y[h - 1:, :]
        padY[:h, w_:] = padY[:h, w_ - 1:w_]
        padY[h:, w_:] = Y[h - 1, w_ - 1]
        ch, cw = Cb.shape
        padC = []
        for C in (Cb, Cr):
            p = np.empty((mbh * 8, mbw * 8), dtype=np.int32)
            p[:ch, :cw] = C
            p[ch:, :cw] = C[ch - 1:, :]
            p[:ch, cw:] = p[:ch, cw - 1:cw]
            p[ch:, cw:] = C[ch - 1, cw - 1]
            padC.append(p)
        pads.append((padY, padC, h, w_, mbw, mbh))
    padY0, _c, h, w_, mbw, mbh = pads[0]
    crop = (0, (mbw * 16 - w_) // 2, 0, (mbh * 16 - h) // 2)
    qpc = _QPC[_clip_qp(qp)]
    nals = [_write_sps(mbw, mbh, crop, num_ref=1), _write_pps()]
    recons = []
    prev = None
    for fi, (padY, padC, _h, _w, _mw, _mh) in enumerate(pads):
        w = _BitWriter()
        st = _FrameState(mbw, mbh)
        if fi == 0:
            w.ue(0)            # first_mb_in_slice
            w.ue(7)            # slice_type I
            w.ue(0)            # pps_id
            w.u(4, 0)          # frame_num
            w.ue(0)            # idr_pic_id
            w.u(1, 1)          # no_output_of_prior_pics
            w.u(1, 0)          # long_term_reference
            w.se(qp - 26)
            w.ue(disable_deblock_idc)
            if disable_deblock_idc != 1:
                w.se(0)
                w.se(0)
            for addr in range(mbw * mbh):
                mbx, mby = addr % mbw, addr // mbw
                st.qp_map[mby, mbx] = qp
                _encode_mb_i16(w, st, padY, padC, mbx, mby, qp, qpc)
            nal_byte = b"\x65"
        else:
            st.set_ref_picture(*prev)
            w.ue(0)            # first_mb_in_slice
            w.ue(5)            # slice_type P (all-P picture)
            w.ue(0)            # pps_id
            w.u(4, fi % 16)    # frame_num
            w.u(1, 0)          # num_ref_idx_active_override
            w.u(1, 0)          # ref_pic_list_modification_flag_l0
            w.u(1, 0)          # adaptive_ref_pic_marking_mode
            w.se(qp - 26)
            w.ue(disable_deblock_idc)
            if disable_deblock_idc != 1:
                w.se(0)
                w.se(0)
            skip_run = 0
            for addr in range(mbw * mbh):
                mbx, mby = addr % mbw, addr // mbw
                kind = p_kinds[(addr + fi) % len(p_kinds)]
                if kind == "skip":
                    skip_run += 1
                    _recon_p_skip(st, mbx, mby, qp)
                    continue
                w.ue(skip_run)     # mb_skip_run before a coded MB
                skip_run = 0
                if kind == "i16":
                    st.mark_intra_mb(mbx, mby)
                    st.qp_map[mby, mbx] = qp
                    _encode_mb_i16(w, st, padY, padC, mbx, mby,
                                   qp, qpc, type_off=5)
                else:
                    _encode_mb_p(w, st, padY, padC, mbx, mby,
                                 qp, qpc, kind)
            if skip_run:
                w.ue(skip_run)     # trailing skip run
            nal_byte = b"\x41"     # non-IDR slice, nal_ref_idc 2
        w.rbsp_trailing()
        nals.append(nal_byte + _rbsp_to_ebsp(w.getvalue()))
        if disable_deblock_idc != 1:
            _deblock_frame(st, {"alpha_off": 0, "beta_off": 0}, 0)
        prev = (st.Y, st.Cb, st.Cr)
        cl, cr_, ct, cb_ = crop
        recons.append(_yuv420_to_rgb(
            st.Y[2 * ct:2 * ct + h, 2 * cl:2 * cl + w_],
            st.Cb[ct:ct + (h + 1) // 2, cl:cl + (w_ + 1) // 2],
            st.Cr[ct:ct + (h + 1) // 2, cl:cl + (w_ + 1) // 2]))
    stream = b"".join(b"\x00\x00\x00\x01" + n for n in nals)
    return stream, recons


def encode_h264_annexb(px, mode: str = "mixed", qp: int = 26,
                       disable_deblock_idc: int = 1):
    """Encode an image (HxW gray or HxWx3 RGB uint8) as a one-frame
    H.264 Annex B stream (SPS + PPS + IDR, baseline, CAVLC).
    mode: "pcm" (lossless I_PCM), "i16", "i4", or "mixed"
    (deterministic per-MB rotation over all three).
    ``disable_deblock_idc``: 1 (default) signals no in-loop filter;
    0 signals deblocking, in which case the embedded reconstruction
    runs the spec-8.7 filter after the frame is coded (the same
    in-loop step a conformant decoder performs).

    Returns (annexb_bytes, recon_rgb) where recon_rgb is the
    encoder's own reconstruction loop output — the exact frame a
    conformant decoder must produce (for "pcm" with deblocking off
    it equals the input up to the RGB<->YUV 4:2:0 conversion)."""
    import numpy as np

    assert 6 <= qp <= 51, "qp out of supported fixture range"
    Y, Cb, Cr = _rgb_to_yuv420(px)
    h, w_ = Y.shape
    # 4:2:0 frame cropping works in 2-sample units: H.264 yuv420
    # pictures must have even luma dimensions (same constraint real
    # encoders enforce)
    assert h % 2 == 0 and w_ % 2 == 0, "h264 4:2:0 needs even dims"
    mbw, mbh = (w_ + 15) // 16, (h + 15) // 16
    # pad by edge replication; crop signals the original size
    padY = np.empty((mbh * 16, mbw * 16), dtype=np.int32)
    padY[:h, :w_] = Y
    padY[h:, :w_] = Y[h - 1:, :]
    padY[:h, w_:] = padY[:h, w_ - 1:w_]
    padY[h:, w_:] = Y[h - 1, w_ - 1]
    ch, cw = Cb.shape
    padC = []
    for C in (Cb, Cr):
        p = np.empty((mbh * 8, mbw * 8), dtype=np.int32)
        p[:ch, :cw] = C
        p[ch:, :cw] = C[ch - 1:, :]
        p[:ch, cw:] = p[:ch, cw - 1:cw]
        p[ch:, cw:] = C[ch - 1, cw - 1]
        padC.append(p)
    crop = (0, (mbw * 16 - w_) // 2, 0, (mbh * 16 - h) // 2)

    sps_nal = _write_sps(mbw, mbh, crop)
    pps_nal = _write_pps()
    w = _BitWriter()
    # slice header: IDR, slice_type 7 (I), pps 0, frame_num 0
    w.ue(0)           # first_mb_in_slice
    w.ue(7)           # slice_type I (all-I picture)
    w.ue(0)           # pps_id
    w.u(4, 0)         # frame_num (log2_max_frame_num = 4)
    w.ue(0)           # idr_pic_id
    w.u(1, 1)         # no_output_of_prior_pics
    w.u(1, 0)         # long_term_reference
    w.se(qp - 26)     # slice_qp_delta
    w.ue(disable_deblock_idc)
    if disable_deblock_idc != 1:
        w.se(0)       # slice_alpha_c0_offset_div2
        w.se(0)       # slice_beta_offset_div2
    st = _FrameState(mbw, mbh)
    qpc = _QPC[_clip_qp(qp)]
    kinds = {"pcm": ["pcm"], "i16": ["i16"], "i4": ["i4"],
             "mixed": ["i16", "i4", "pcm"]}[mode]
    for addr in range(mbw * mbh):
        mbx, mby = addr % mbw, addr // mbw
        kind = kinds[(mbx + 2 * mby) % len(kinds)]
        st.qp_map[mby, mbx] = qp
        if kind == "pcm":
            st.pcm[mby, mbx] = True
            _encode_mb_pcm(w, st, padY, padC, mbx, mby)
        elif kind == "i16":
            _encode_mb_i16(w, st, padY, padC, mbx, mby, qp, qpc)
        else:
            _encode_mb_i4(w, st, padY, padC, mbx, mby, qp, qpc)
    w.rbsp_trailing()
    idr_nal = b"\x65" + _rbsp_to_ebsp(w.getvalue())
    stream = b"".join(b"\x00\x00\x00\x01" + n
                      for n in (sps_nal, pps_nal, idr_nal))
    if disable_deblock_idc != 1:
        # the embedded reference reconstruction must include the
        # signaled in-loop filter (chroma_qp_index_offset is 0 in
        # _write_pps; the slice writes zero alpha/beta offsets)
        _deblock_frame(st, {"alpha_off": 0, "beta_off": 0}, 0)
    cl, cr_, ct, cb_ = crop
    recon = _yuv420_to_rgb(
        st.Y[2 * ct:2 * ct + h, 2 * cl:2 * cl + w_],
        st.Cb[ct:ct + (h + 1) // 2, cl:cl + (w_ + 1) // 2],
        st.Cr[ct:ct + (h + 1) // 2, cl:cl + (w_ + 1) // 2])
    return stream, recon


def decode_h264_rgb(payload: bytes, avcc: bytes = None,
                    approximate: bool = False):
    """decode_h264_frame + YUV->RGB. Returns (w, h, rgb) or None."""
    out = decode_h264_frame(payload, avcc=avcc,
                            approximate=approximate)
    if out is None:
        return None
    w, h, (Y, Cb, Cr) = out
    return w, h, _yuv420_to_rgb(Y, Cb, Cr)


def build_avcc(stream_or_sps: bytes, pps: bytes = None,
               length_size: int = 4) -> bytes:
    """Build avcC (AVCDecoderConfigurationRecord, 14496-15 §5.2.4)
    extradata from an Annex B stream (SPS/PPS extracted) or explicit
    SPS + PPS NAL bytes."""
    if pps is None:
        sps_nal = pps_nal = None
        for nal in split_annexb(stream_or_sps):
            hdr = _nal_header(nal)
            if hdr is None:
                continue
            if hdr[1] == 7 and sps_nal is None:
                sps_nal = nal
            elif hdr[1] == 8 and pps_nal is None:
                pps_nal = nal
        assert sps_nal and pps_nal, "stream lacks SPS/PPS"
    else:
        sps_nal, pps_nal = stream_or_sps, pps
    out = bytearray()
    out.append(1)                      # configurationVersion
    out += sps_nal[1:4]                # profile / compat / level
    out.append(0xFC | (length_size - 1))
    out.append(0xE0 | 1)               # one SPS
    out += len(sps_nal).to_bytes(2, "big") + sps_nal
    out.append(1)                      # one PPS
    out += len(pps_nal).to_bytes(2, "big") + pps_nal
    return bytes(out)


def annexb_to_avcc_sample(stream: bytes, length_size: int = 4) -> bytes:
    """Re-frame the VCL NALs of an Annex B stream as one
    length-prefixed MP4 sample (SPS/PPS move to avcC)."""
    out = bytearray()
    for nal in split_annexb(stream):
        hdr = _nal_header(nal)
        if hdr is None or hdr[1] in (7, 8):
            continue
        out += len(nal).to_bytes(length_size, "big") + nal
    return bytes(out)
