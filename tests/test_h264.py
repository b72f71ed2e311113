"""H.264 baseline I-frame codec tests.

The decoder (operators/h264.py) is exercised three ways:
1. structural validation of every CAVLC codebook — the spec's VLC
   tables must be prefix-free and Kraft-complete up to the
   standard's known reserved holes, which catches transcription
   errors without needing external streams;
2. bit-exact roundtrips: the fixture encoder embeds a
   decoder-identical reconstruction loop (H.264 decode is pure
   integer math), so decode(encode(px)) must equal the encoder's
   reconstruction EXACTLY, across macroblock kinds, QPs, sizes and
   prediction modes — and I_PCM must reproduce gray input losslessly;
3. the Spark surface: decode_video_frames over MP4(avc1 + avcC) and
   raw Annex B payloads, with NULL rows for undecodable samples.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

import siridb_server_spark.operators.h264 as h
import siridb_server_spark.operators.multimodal as MM


def _check_codebook(name, codes, holes):
    codes = list(codes)
    assert len(set(codes)) == len(codes), name
    for i, a in enumerate(codes):
        for b in codes[i + 1:]:
            assert not b.startswith(a) and not a.startswith(b), \
                (name, a, b)
    kraft = sum(2.0 ** -len(c) for c in codes)
    hole = sum(2.0 ** -len(c) for c in holes)
    assert abs(kraft + hole - 1.0) < 1e-12, (name, kraft, hole)


def test_vlc_tables_prefix_free_and_complete():
    # coeff_token: the reserved (unused) codewords per context are
    # fixed by the spec's table layout
    _check_codebook("ct0", h._COEFF_TOKEN[0],
                    ["0000000000000000", "0000000000000001"])
    _check_codebook("ct1", h._COEFF_TOKEN[1],
                    ["00000000000000", "00000000000001",
                     "00000000001100"])
    _check_codebook("ct2", h._COEFF_TOKEN[2], ["0000000000"])
    _check_codebook("ct3", h._COEFF_TOKEN[3], [])
    for tc in range(15):
        codes = [h._render(ln, b) for ln, b in
                 zip(h._TZ_LEN[tc], h._TZ_BITS[tc])]
        assert len(codes) == 16 - tc
        _check_codebook(f"tz{tc + 1}", codes,
                        ["000000000"] if tc == 0 else [])
    for i, row in enumerate(h._TZ_CDC):
        _check_codebook(f"tzcdc{i}", row, [])
    for i, row in enumerate(h._RUN_BEFORE[:-1]):
        _check_codebook(f"rb{i}", row, [])
    _check_codebook("rb>6", h._RUN_BEFORE[6], ["00000000000"])


def test_residual_cavlc_roundtrip_fuzz():
    rng = random.Random(7)
    for _ in range(3000):
        max_coeff = rng.choice([16, 15, 4])
        nC = (rng.choice([0, 1, 2, 3, 4, 7, 8, 20])
              if max_coeff != 4 else -1)
        coeffs = [0] * max_coeff
        for pos in rng.sample(range(max_coeff),
                              rng.randint(0, max_coeff)):
            coeffs[pos] = rng.choice(
                [1, -1, 2, -2, 3, 5, -9, 17, 200, -1000, 2047])
        w = h._BitWriter()
        tc = h._residual_write(w, nC, coeffs, max_coeff)
        w.rbsp_trailing()
        got, tc2 = h._residual_read(
            h._BitReader(w.getvalue()), nC, max_coeff)
        assert got == coeffs and tc == tc2


def test_exp_golomb_and_ebsp_roundtrip():
    w = h._BitWriter()
    vals = [0, 1, 2, 3, 7, 255, 100000]
    svals = [0, 1, -1, 2, -2, 300, -77777]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    ebsp = h._rbsp_to_ebsp(w.getvalue() + b"\x00\x00\x00\x00\x01")
    r = h._BitReader(h._ebsp_to_rbsp(ebsp))
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals
    assert b"\x00\x00\x00" not in ebsp


_IMAGES = [
    np.full((16, 16), 100, np.uint8),
    np.tile(np.arange(64, dtype=np.uint8) * 4, (48, 1)),
    np.random.RandomState(3).randint(
        0, 256, (32, 48, 3), np.int64).astype(np.uint8),
]


@pytest.mark.parametrize("mode", ["pcm", "i16", "i4", "mixed"])
def test_decode_equals_encoder_reconstruction(mode):
    for px in _IMAGES:
        for qp in (10, 26, 40):
            stream, recon = h.encode_h264_annexb(px, mode=mode, qp=qp)
            out = h.decode_h264_rgb(stream)
            assert out is not None
            w, hh, rgb = out
            assert (w, hh) == (px.shape[1], px.shape[0])
            assert (rgb == recon).all(), (mode, qp, px.shape)


def test_ipcm_is_lossless_for_gray():
    px = np.random.RandomState(5).randint(
        0, 256, (48, 48), np.int64).astype(np.uint8)
    stream, recon = h.encode_h264_annexb(px, mode="pcm", qp=26)
    _, _, rgb = h.decode_h264_rgb(stream)
    assert (rgb[:, :, 0] == px).all()
    assert (rgb[:, :, 1] == px).all()


def test_quality_monotone_in_qp():
    px = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
    errs = []
    for qp in (6, 26, 46):
        stream, _ = h.encode_h264_annexb(px, mode="i4", qp=qp)
        _, _, rgb = h.decode_h264_rgb(stream)
        errs.append(np.abs(rgb[:, :, 0].astype(int)
                           - px.astype(int)).mean())
    assert errs[0] <= errs[1] <= errs[2]
    assert errs[0] == 0.0  # near-lossless floor at qp 6 on gradients


def test_avcc_and_mp4_sample_path():
    px = np.full((32, 32), 77, np.uint8)
    stream, recon = h.encode_h264_annexb(px, mode="mixed", qp=12)
    avcc = h.build_avcc(stream)
    sample = h.annexb_to_avcc_sample(stream)
    out = h.decode_h264_rgb(sample, avcc=avcc)
    assert out is not None and (out[2] == recon).all()
    mp4 = MM.build_minimal_mp4(32, 32, [],
                               sample_payloads=[sample, sample],
                               avcc=avcc)
    meta = MM._parse_mp4(mp4)
    assert meta["codec"] == "avc1" and meta["avcc"] is not None
    off, sz = meta["samples"][1]
    out2 = h.decode_h264_rgb(mp4[off:off + sz], avcc=meta["avcc"])
    assert (out2[2] == recon).all()


def test_unsupported_streams_reject_not_crash():
    px = np.full((16, 16), 50, np.uint8)
    stream, _ = h.encode_h264_annexb(px, mode="i4", qp=20)
    nals = h.split_annexb(stream)
    assert h.decode_h264_frame(b"") is None
    assert h.decode_h264_frame(b"\x00\x00\x01\x67garbage") is None
    # CABAC: flip entropy_coding_mode in the PPS (first bit after
    # pps_id=0/sps_id=0 ue pairs = bits "1","1" -> third bit)
    pps = bytearray(nals[1])
    pps[1] |= 0x20
    bad = b"\x00\x00\x01" + bytes(nals[0]) + b"\x00\x00\x01" \
        + bytes(pps) + b"\x00\x00\x01" + bytes(nals[2])
    assert h.decode_h264_frame(bad) is None
    # truncated slice data
    trunc = stream[:len(stream) - len(nals[2]) // 2]
    assert h.decode_h264_frame(trunc) is None
    # P slice type in the header (slice_type 0 -> ue "1")
    sl = bytearray(nals[2])
    # first_mb ue(0)="1", slice_type ue(7)="0001000": force 0 ("1")
    w = h._BitWriter()
    w.u(1, 1)  # first_mb 0
    w.u(1, 1)  # slice_type 0 (P)
    head = w.buf + bytes([w.acc << (8 - w.nacc)]) if w.nacc else w.buf
    sl2 = bytes([sl[0]]) + bytes(head) + bytes(sl[3:])
    assert h.decode_h264_frame(
        b"\x00\x00\x01" + bytes(nals[0]) + b"\x00\x00\x01"
        + bytes(nals[1]) + b"\x00\x00\x01" + sl2) is None


def test_decode_video_frames_spark(spark):
    tiles = np.zeros((16, 16), np.uint8)
    tiles[:8, 8:], tiles[8:, :8], tiles[8:, 8:] = 50, 100, 250
    streams = [h.encode_h264_annexb(tiles, mode=m, qp=10)
               for m in ("pcm", "i16", "i4")]
    avcc = h.build_avcc(streams[0][0])
    samples = [h.annexb_to_avcc_sample(s) for s, _ in streams]
    mp4 = MM.build_minimal_mp4(16, 16, [], sample_payloads=samples,
                               avcc=avcc)
    color = np.full((32, 48, 3), (200, 50, 120), np.uint8)
    raw, _ = h.encode_h264_annexb(color, mode="pcm", qp=26)
    rows = [(1, "video", mp4, "video/mp4"),
            (2, "video", raw, "video/h264"),
            (3, "video", b"junk", "application/octet-stream"),
            (4, "video", MM.build_minimal_mp4(8, 8, [5, 5]),
             "video/mp4")]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {(r["media_id"], r["frame_idx"]): r
           for r in MM.decode_video_frames(media).collect()}
    for i in range(3):
        assert got[(1, i)]["width"] == 16
        assert got[(1, i)]["mean_r"] == 100.0  # (0+50+100+250)/4
    # raw Annex B single frame; integer-YCbCr PCM roundtrip maps
    # (200, 50, 120) -> (200, 50, 121)
    assert (got[(2, 0)]["mean_r"], got[(2, 0)]["mean_g"],
            got[(2, 0)]["mean_b"]) == (200.0, 50.0, 121.0)
    # non-video emits nothing; avcC-less zero samples yield NULLs
    assert 3 not in {k[0] for k in got}
    assert got[(4, 0)]["width"] is None
    # every_n strides the sample list
    strided = MM.decode_video_frames(media, every_n=2).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in strided
            if r["media_id"] == 1} == {(1, 0), (1, 2)}


def test_decoder_survives_bitstream_corruption():
    """Whatever bytes arrive, decode returns a frame or None —
    never raises (the Spark operator feeds it arbitrary payloads)."""
    px = np.random.RandomState(1).randint(
        0, 256, (32, 32), np.int64).astype(np.uint8)
    stream, _ = h.encode_h264_annexb(px, mode="mixed", qp=24)
    rng = random.Random(99)
    for _ in range(400):
        b = bytearray(stream)
        kind = rng.choice(["flip", "trunc", "insert", "zero"])
        if kind == "flip":
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        elif kind == "trunc":
            b = b[:rng.randrange(len(b))]
        elif kind == "insert":
            b[rng.randrange(len(b)):0] = bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 4)))
        else:
            i = rng.randrange(len(b))
            b[i:i + rng.randint(1, 16)] = b"\x00" * rng.randint(1, 16)
        h.decode_h264_frame(bytes(b))  # must not raise


def test_forged_sps_dimension_guard():
    """A forged SPS declaring absurd dimensions must not allocate:
    the max_mbs cap returns None instead."""
    w = h._BitWriter()
    w.u(8, 66)
    w.u(8, 0xC0)
    w.u(8, 30)
    w.ue(0)
    w.ue(0)
    w.ue(2)
    w.ue(0)
    w.u(1, 0)
    w.ue(9999)   # pic_width_in_mbs_minus1
    w.ue(9999)
    w.u(1, 1)
    w.u(1, 0)
    w.u(1, 0)
    w.u(1, 0)
    w.rbsp_trailing()
    sps = b"\x67" + h._rbsp_to_ebsp(w.getvalue())
    parsed = h.parse_sps(sps)
    assert parsed is not None and parsed["pic_width_mbs"] == 10000
    px = np.full((16, 16), 9, np.uint8)
    stream, _ = h.encode_h264_annexb(px, mode="i4", qp=20)
    nals = h.split_annexb(stream)
    forged = (b"\x00\x00\x01" + sps + b"\x00\x00\x01"
              + bytes(nals[1]) + b"\x00\x00\x01" + bytes(nals[2]))
    assert h.decode_h264_frame(forged) is None


def test_deblock_enabled_streams_decode_conformantly():
    """Streams signaling the in-loop filter decode bit-exactly
    against the encoder-embedded reconstruction WITH the filter
    applied, for every mode and a QP sweep; the filter must
    actually move pixels on lossy content (otherwise the test
    proves nothing), and idc=1 streams stay untouched."""
    rng = np.random.default_rng(7)
    x = np.linspace(0, 255, 80, dtype=np.uint8)
    px = np.stack([np.tile(x, (48, 1))] * 3, axis=-1).astype(np.int64)
    px = np.clip(px + rng.integers(-25, 25, px.shape),
                 0, 255).astype(np.uint8)
    for mode in ("i16", "i4", "mixed"):
        for qp in (20, 26, 38):
            db, recon_db = h.encode_h264_annexb(
                px, mode=mode, qp=qp, disable_deblock_idc=0)
            out = h.decode_h264_rgb(db)
            assert out is not None, (mode, qp)
            assert (out[2] == recon_db).all(), (mode, qp)
            nodb, recon_nodb = h.encode_h264_annexb(
                px, mode=mode, qp=qp, disable_deblock_idc=1)
            assert (h.decode_h264_rgb(nodb)[2] == recon_nodb).all()
            assert (recon_db != recon_nodb).any(), (mode, qp)


def test_deblock_pcm_frames_pass_through_untouched():
    """spec 8.7.2: an I_PCM macroblock filters with QPY = 0, so two
    adjacent PCM MBs average to indexA 0 -> alpha' 0 -> no samples
    change: an all-PCM deblock-enabled frame stays lossless."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    stream, recon = h.encode_h264_annexb(px, mode="pcm", qp=26,
                                         disable_deblock_idc=0)
    out = h.decode_h264_rgb(stream)
    assert (out[2] == recon).all()
    plain, recon2 = h.encode_h264_annexb(px, mode="pcm", qp=26)
    assert (recon == recon2).all()        # filter was a no-op


def _spec_filter_line(p, q, bs, qpav, chroma=False):
    """Independent scalar transcription of spec 8.7.2.3/8.7.2.4 for
    one sample line, used to cross-check the vectorized kernel."""
    a = h._DB_ALPHA[qpav]
    b = h._DB_BETA[qpav]
    p0, p1, p2, p3 = p
    q0, q1, q2, q3 = q
    if not (abs(p0 - q0) < a and abs(p1 - p0) < b
            and abs(q1 - q0) < b):
        return list(p[:3]), list(q[:3])
    if bs == 4:
        if chroma:
            return ([(2 * p1 + p0 + q1 + 2) >> 2, p1, p2],
                    [(2 * q1 + q0 + p1 + 2) >> 2, q1, q2])
        small = abs(p0 - q0) < ((a >> 2) + 2)
        if small and abs(p2 - p0) < b:
            np_ = [(p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   (p2 + p1 + p0 + q0 + 2) >> 2,
                   (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3]
        else:
            np_ = [(2 * p1 + p0 + q1 + 2) >> 2, p1, p2]
        if small and abs(q2 - q0) < b:
            nq = [(q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                  (q2 + q1 + q0 + p0 + 2) >> 2,
                  (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3]
        else:
            nq = [(2 * q1 + q0 + p1 + 2) >> 2, q1, q2]
        return np_, nq
    tc0 = h._DB_TC0[qpav][bs - 1]
    ap, aq = abs(p2 - p0) < b, abs(q2 - q0) < b
    tc = tc0 + 1 if chroma else tc0 + int(ap) + int(aq)
    d = max(-tc, min(tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3))
    np0 = max(0, min(255, p0 + d))
    nq0 = max(0, min(255, q0 - d))
    np1, nq1 = p1, q1
    if not chroma and ap:
        np1 = p1 + max(-tc0, min(
            tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
    if not chroma and aq:
        nq1 = q1 + max(-tc0, min(
            tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
    return [np0, np1, p2], [nq0, nq1, q2]


def test_deblock_core_matches_scalar_spec_transcription():
    """Fuzz the vectorized kernel against an independent scalar
    transcription of the spec formulas across bS, QP, chroma, and
    random sample lines (including edge-flat and high-contrast)."""
    rng = np.random.default_rng(11)
    for bs in (1, 2, 3, 4):
        for qpav in (0, 18, 26, 34, 44, 51):
            for chroma in (False, True):
                n = 64
                base = rng.integers(0, 256, (n, 1))
                spread = rng.integers(-12, 13, (n, 8))
                lines = np.clip(base + spread, 0, 255)
                lines[:8] = rng.integers(0, 256, (8, 8))  # contrast
                lines[8:12] = base[8:12]                  # flat
                P = [lines[:, 3 - i].astype(np.int32)
                     for i in range(4)]
                Q = [lines[:, 4 + i].astype(np.int32)
                     for i in range(4)]
                gotP, gotQ = h._deblock_core(
                    [x.copy() for x in P], [x.copy() for x in Q],
                    bs, qpav, 0, 0, chroma)
                for i in range(n):
                    ep, eq = _spec_filter_line(
                        [int(x[i]) for x in P],
                        [int(x[i]) for x in Q], bs, qpav, chroma)
                    assert [int(x[i]) for x in gotP] == ep, \
                        (bs, qpav, chroma, i)
                    assert [int(x[i]) for x in gotQ] == eq, \
                        (bs, qpav, chroma, i)


def test_deblock_alpha_beta_offsets_respected():
    """Non-zero slice alpha/beta offsets shift the thresholds; a
    stream coded with large negative offsets at low QP must decode
    to the UNFILTERED reconstruction (indexA clamps below 16)."""
    px = np.full((16, 32), 0, np.uint8)
    px[:, 16:] = 200    # hard MB edge
    stream, _ = h.encode_h264_annexb(px, mode="i16", qp=8,
                                     disable_deblock_idc=0)
    # hand-patch is overkill: at qp=8 indexA = 8 < 16 -> alpha 0,
    # so even with deblock signaled nothing changes
    plain, recon = h.encode_h264_annexb(px, mode="i16", qp=8)
    out = h.decode_h264_rgb(stream)
    assert (out[2] == h.decode_h264_rgb(plain)[2]).all()


# ---------------------------------------------------------------- P frames


def _moving_frames(n=3, h_=48, w_=64, noise=True, seed=42):
    rng = np.random.default_rng(seed)
    base = np.zeros((h_, w_, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h_, 0:w_]
    for c in range(3):
        base[:, :, c] = ((xx * (3 + c) + yy * (5 - c)) % 256)
    frames = [np.roll(base, (2 * i, 3 * i), axis=(0, 1))
              for i in range(n)]
    if noise and n > 2:
        frames[2] = np.clip(
            frames[2].astype(int)
            + rng.integers(-8, 9, frames[2].shape),
            0, 255).astype(np.uint8)
    return frames


@pytest.mark.parametrize("idc", [1, 0])
@pytest.mark.parametrize("qp", [18, 24, 33])
def test_p_frame_round_trip_bit_exact(idc, qp):
    """IDR + two P frames rotating through P_Skip and every P
    partition shape (16x16/16x8/8x16/P_8x8 with all four sub-part
    shapes) plus an intra MB inside the P slice, MVs sweeping all
    sixteen quarter-pel phases — the decoder must reproduce the
    encoder's embedded reconstruction bit-for-bit, with and without
    the in-loop deblocking filter (whose inter bS derivation the
    idc=0 case exercises: coefficient/MV/reference rules, 8.7.2.1)."""
    frames = _moving_frames()
    stream, recons = h.encode_h264_sequence(
        frames, qp=qp, disable_deblock_idc=idc)
    out = h.decode_h264_frames(stream)
    assert out is not None and len(out) == 3
    for i, (w_, h2, planes) in enumerate(out):
        assert (w_, h2) == (64, 48)
        rgb = h._yuv420_to_rgb(*planes)
        assert np.array_equal(rgb, recons[i]), f"frame {i} differs"


def test_p_skip_static_content_is_copy():
    """A static scene after the IDR: P_Skip MBs must reproduce the
    reference exactly (zero-MV copy through the MC path)."""
    still = _moving_frames(1)[0]
    stream, recons = h.encode_h264_sequence(
        [still, still], qp=24, p_kinds=("skip",))
    out = h.decode_h264_frames(stream)
    assert out is not None and len(out) == 2
    y0 = out[0][2][0]
    y1 = out[1][2][0]
    assert np.array_equal(y0, y1)       # skip == reference copy
    assert np.array_equal(h._yuv420_to_rgb(*out[1][2]), recons[1])


def test_p_frame_single_mb_picture():
    """16x16 picture: every MV-prediction neighbor is unavailable
    (the 8.4.1.3.1 left-only/zero rules) — round-trips bit-exact."""
    frames = [f[:16, :16] for f in _moving_frames(3)]
    stream, recons = h.encode_h264_sequence(frames, qp=26)
    out = h.decode_h264_frames(stream)
    assert out is not None and len(out) == 3
    for i, (_w, _h, planes) in enumerate(out):
        assert np.array_equal(h._yuv420_to_rgb(*planes), recons[i])


def test_p_frame_first_is_rejected():
    """A P slice with no decoded reference returns None, not junk."""
    frames = _moving_frames(2)
    stream, _ = h.encode_h264_sequence(frames, qp=24)
    nals = h.split_annexb(stream)
    # keep SPS/PPS, drop the IDR, keep the P slice
    keep = [n for n in nals if h._nal_header(n)[1] != 5]
    cut = b"".join(b"\x00\x00\x00\x01" + n for n in keep)
    assert h.decode_h264_frames(cut) is None


def test_p_frame_truncation_rejected():
    frames = _moving_frames(2)
    stream, _ = h.encode_h264_sequence(frames, qp=24)
    assert h.decode_h264_frames(stream[:len(stream) - 8]) is None


def test_decode_h264_frame_returns_first_of_sequence():
    frames = _moving_frames(2)
    stream, recons = h.encode_h264_sequence(frames, qp=24)
    one = h.decode_h264_frame(stream)
    assert one is not None
    assert np.array_equal(h._yuv420_to_rgb(*one[2]), recons[0])


def test_interp_luma_matches_scalar_spec_transcription():
    """Quarter-pel luma interpolation (8.4.2.2) fuzzed against an
    independent scalar transcription of the spec's sample formulas
    (6-tap halves, unrounded-intermediate centre j, half-up quarter
    averages) across random MVs covering all 16 fractional phases."""
    rng = np.random.default_rng(7)
    pic = rng.integers(0, 256, size=(24, 28)).astype(np.int32)
    ref = np.pad(pic, h._MC_PAD, mode="edge")

    def clip(v):
        return max(0, min(255, v))

    def full(x, y):
        return int(ref[y, x])

    def hh_un(x, y):
        return (full(x - 2, y) - 5 * full(x - 1, y)
                + 20 * full(x, y) + 20 * full(x + 1, y)
                - 5 * full(x + 2, y) + full(x + 3, y))

    def hv_un(x, y):
        return (full(x, y - 2) - 5 * full(x, y - 1)
                + 20 * full(x, y) + 20 * full(x, y + 1)
                - 5 * full(x, y + 2) + full(x, y + 3))

    def half_h(x, y):
        return clip((hh_un(x, y) + 16) >> 5)

    def half_v(x, y):
        return clip((hv_un(x, y) + 16) >> 5)

    def center_j(x, y):
        s = (hh_un(x, y - 2) - 5 * hh_un(x, y - 1)
             + 20 * hh_un(x, y) + 20 * hh_un(x, y + 1)
             - 5 * hh_un(x, y + 2) + hh_un(x, y + 3))
        return clip((s + 512) >> 10)

    def scalar(x, y, fx, fy):
        G, H, M = full(x, y), full(x + 1, y), full(x, y + 1)
        if (fx, fy) == (0, 0):
            return G
        if fy == 0:
            b = half_h(x, y)
            return b if fx == 2 else \
                (b + (G if fx == 1 else H) + 1) >> 1
        if fx == 0:
            hh = half_v(x, y)
            return hh if fy == 2 else \
                (hh + (G if fy == 1 else M) + 1) >> 1
        j = center_j(x, y)
        if (fx, fy) == (2, 2):
            return j
        if fx == 2:
            o = half_h(x, y) if fy == 1 else half_h(x, y + 1)
            return (j + o + 1) >> 1
        if fy == 2:
            o = half_v(x, y) if fx == 1 else half_v(x + 1, y)
            return (j + o + 1) >> 1
        bh = half_h(x, y) if fy == 1 else half_h(x, y + 1)
        vh = half_v(x, y) if fx == 1 else half_v(x + 1, y)
        return (bh + vh + 1) >> 1

    for _ in range(120):
        x0 = int(rng.integers(0, 20))
        y0 = int(rng.integers(0, 16))
        mvx = int(rng.integers(-40, 40))
        mvy = int(rng.integers(-40, 40))
        got = np.asarray(h._interp_luma(
            ref, x0 + h._MC_PAD, y0 + h._MC_PAD, 8, 8, mvx, mvy))
        fx, fy = mvx & 3, mvy & 3
        bx = x0 + (mvx >> 2) + h._MC_PAD
        by = y0 + (mvy >> 2) + h._MC_PAD
        want = np.array([[scalar(bx + xx, by + yy, fx, fy)
                          for xx in range(8)] for yy in range(8)])
        assert np.array_equal(got, want), (mvx, mvy, fx, fy)


def test_p_stream_survives_bitstream_corruption():
    """The multi-frame/P decode path under random corruption: frames
    or None, never an exception (the Spark video operator feeds it
    arbitrary payloads; the inter path adds MV/skip/partition parse
    states the intra fuzz never reaches)."""
    stream, _ = h.encode_h264_sequence(_moving_frames(3), qp=24,
                                       disable_deblock_idc=0)
    rng = random.Random(7)
    for _ in range(300):
        b = bytearray(stream)
        kind = rng.choice(["flip", "trunc", "insert", "zero"])
        if kind == "flip":
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        elif kind == "trunc":
            b = b[:rng.randrange(len(b))]
        elif kind == "insert":
            b[rng.randrange(len(b)):0] = bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 4)))
        else:
            i = rng.randrange(len(b))
            b[i:i + rng.randint(1, 16)] = b"\x00" * rng.randint(1, 16)
        out = h.decode_h264_frames(bytes(b))   # must not raise
        if out is not None:
            for w_, h2, planes in out:
                assert (w_, h2) == (64, 48)


def test_p_frames_cropped_dims_long_chain():
    """Non-MB-aligned picture (28x20, cropped from 32x32 MBs) over
    an 8-frame prediction chain: MC reads the padded reconstruction
    at the crop edges and every frame stays bit-exact — at low and
    high QP, with deblocking on."""
    yy, xx = np.mgrid[0:20, 0:28]
    base = np.stack([(yy * 7) % 256, (xx * 5) % 256,
                     ((xx + yy) * 3) % 256], -1).astype(np.uint8)
    frames = [np.roll(base, (i, 2 * i), (0, 1)) for i in range(8)]
    for qp in (16, 30):
        stream, recons = h.encode_h264_sequence(
            frames, qp=qp, disable_deblock_idc=0)
        out = h.decode_h264_frames(stream)
        assert out is not None and len(out) == 8
        for i, (w_, h2, planes) in enumerate(out):
            assert (w_, h2) == (28, 20)
            assert np.array_equal(h._yuv420_to_rgb(*planes),
                                  recons[i]), (qp, i)


def test_p_skip_at_origin_single_mb_chain():
    """P_Skip as the FIRST MB of the picture (A and B neighbors both
    unavailable -> the 8.4.1.1 zero-MV rule) through an 8-frame
    single-MB chain mixing every kind."""
    yy, xx = np.mgrid[0:16, 0:16]
    base = np.stack([(yy * 7) % 256, (xx * 5) % 256,
                     ((xx + yy) * 3) % 256], -1).astype(np.uint8)
    frames = [np.roll(base, (i, 2 * i), (0, 1)) for i in range(8)]
    stream, recons = h.encode_h264_sequence(
        frames, qp=24, p_kinds=("skip", "p8x8", "i16", "p16"))
    out = h.decode_h264_frames(stream)
    assert len(out) == 8
    for i, (_w, _h2, planes) in enumerate(out):
        assert np.array_equal(h._yuv420_to_rgb(*planes), recons[i])
