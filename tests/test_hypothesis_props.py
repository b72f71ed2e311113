"""Hypothesis property tests for the pure-Python layers (no Spark —
milliseconds per example): calc arithmetic must match C semantics on
arbitrary operands, and bucket labels must satisfy the right-closed
END-label invariants for every (ts, group, offset)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from siridb_server_spark.errors import ParseError, QueryError
from siridb_server_spark.plans.parser import Parser
from siridb_server_spark.plans.timeexpr import c_div, c_mod


def calc(q: str) -> int:
    return Parser(q, "s", now=1_000_000).parse().stmt.value


@given(a=st.integers(0, 10 ** 12), b=st.integers(0, 10 ** 12))
@settings(max_examples=200, deadline=None)
def test_calc_add_mul_roundtrip(a, b):
    assert calc(f"{a} + {b}") == a + b
    assert calc(f"{a} * 2 + {b}") == a * 2 + b


@given(a=st.integers(-10 ** 9, 10 ** 9),
       b=st.integers(-10 ** 9, 10 ** 9))
@settings(max_examples=200, deadline=None)
def test_c_division_identity(a, b):
    """C identity: a == (a/b)*b + a%b, truncation toward zero."""
    if b == 0:
        import pytest
        with pytest.raises(QueryError):
            c_div(a, b)
        return
    q, r = c_div(a, b), c_mod(a, b)
    assert q * b + r == a
    assert abs(r) < abs(b)
    # truncation toward zero: quotient magnitude never rounds away
    assert abs(q) == abs(a) // abs(b)


@given(ts=st.integers(0, 2 ** 62), g=st.integers(1, 2 ** 40),
       off_frac=st.floats(0, 1))
@settings(max_examples=300, deadline=None)
def test_bucket_label_invariants(ts, g, off_frac):
    """Right-closed END-labeled buckets (aggregate.c:41-43): the
    label is the smallest multiple of g at-or-after ts (+offset)."""
    off = int(off_frac * (g - 1))
    label = (ts + g - 1) // g * g + off
    assert label >= ts
    assert label - ts < g + off
    assert (label - off) % g == 0
    # a point exactly on an unshifted boundary keeps its own label
    if off == 0 and ts % g == 0:
        assert label == ts


@given(s=st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=40))
@settings(max_examples=300, deadline=None)
def test_arbitrary_input_never_crashes_parser(s):
    """Any unicode input either parses or raises the controlled
    error types — never an unhandled exception."""
    try:
        Parser(s, "s", now=1_000_000).parse()
    except (ParseError, QueryError):
        pass


# --------------------------------------------------------- image codecs
# The hand-rolled codecs are pure Python/numpy — property-test them
# off-Spark: arbitrary rasters must round-trip (PNG, GIF exactly;
# JPEG within DCT rounding bounds) for every filter/palette shape.

@given(st.data())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_raster_any_filters(data):
    import numpy as np

    from siridb_server_spark.operators.multimodal import (
        _parse_png_raster, encode_png)

    h = data.draw(st.integers(1, 12), label="h")
    w = data.draw(st.integers(1, 12), label="w")
    px = np.array(
        data.draw(st.lists(st.integers(0, 255),
                           min_size=h * w * 3, max_size=h * w * 3)),
        dtype=np.uint8).reshape(h, w, 3)
    filters = data.draw(st.lists(st.integers(0, 4),
                                 min_size=h, max_size=h))
    got = _parse_png_raster(encode_png(px, filters=filters))
    assert got is not None
    assert got[:3] == (w, h, 3)
    assert (got[3] == px).all()


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_gif_lzw_roundtrip_any_frame(data):
    import numpy as np

    from siridb_server_spark.operators.multimodal import (
        _parse_gif_raster, encode_gif)

    h = data.draw(st.integers(1, 10), label="h")
    w = data.draw(st.integers(1, 10), label="w")
    ncol = data.draw(st.integers(2, 16), label="ncol")
    pal = [(i * 15 % 256, i * 37 % 256, i * 91 % 256)
           for i in range(ncol)]
    idx = np.array(
        data.draw(st.lists(st.integers(0, ncol - 1),
                           min_size=h * w, max_size=h * w)),
        dtype=np.int64).reshape(h, w)
    interlace = data.draw(st.booleans(), label="interlace")
    got = _parse_gif_raster(
        encode_gif([idx], pal, interlace_first=interlace))
    assert got is not None and (got[0], got[1], got[2]) == (w, h, 1)
    expect = np.array([pal[i] for i in idx.ravel()],
                      np.uint8).reshape(h, w, 3)
    assert (got[3] == expect).all()


@given(st.data())
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_within_dct_rounding(data):
    import numpy as np

    from siridb_server_spark.operators.multimodal import (
        _parse_jpeg_raster, encode_jpeg_baseline)

    h = data.draw(st.integers(1, 20), label="h")
    w = data.draw(st.integers(1, 20), label="w")
    seed = data.draw(st.integers(0, 2 ** 31 - 1), label="seed")
    ri = data.draw(st.integers(0, 3), label="restart")
    gray = np.random.RandomState(seed).randint(
        0, 256, (h, w), dtype=np.int64).astype(np.uint8)
    got = _parse_jpeg_raster(
        encode_jpeg_baseline(gray, restart_interval=ri))
    assert got is not None and (got[0], got[1]) == (w, h)
    # all-ones quant: the only loss is FDCT/IDCT float rounding
    assert np.abs(got[3][:, :, 0].astype(int)
                  - gray.astype(int)).max() <= 1


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_codec_parsers_never_crash_on_garbage(b):
    from siridb_server_spark.operators.multimodal import (
        _parse_gif_raster, _parse_jpeg_raster, _parse_png_raster,
        _parse_ppm_raster, _parse_wav_pcm)

    for parse, sig in ((_parse_png_raster, b"\x89PNG\r\n\x1a\n"),
                       (_parse_gif_raster, b"GIF89a"),
                       (_parse_jpeg_raster, b"\xFF\xD8"),
                       (_parse_ppm_raster, b"P6 "),
                       (_parse_wav_pcm, b"RIFF")):
        # raw garbage AND signature-prefixed garbage: the parsers
        # must return a value or None, never raise
        parse(b)
        parse(sig + b)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_qpack_tcp_frame_roundtrip(data):
    """pack_pkg/read_pkg invert each other over a real socket pair
    for arbitrary pids, types, and payloads; corrupted checkbits are
    rejected (stream.c:182-199 parity)."""
    import socket

    from siridb_server_spark.sources.clserver import (
        PKG_HEADER, pack_pkg, read_pkg)
    from siridb_server_spark.sources.qpack import unpackb

    pid = data.draw(st.integers(0, 0xFFFF), label="pid")
    tp = data.draw(st.integers(0, 255), label="tp")
    payload = data.draw(st.one_of(
        st.none(),
        st.integers(-2 ** 40, 2 ** 40),
        st.text(max_size=40),
        st.lists(st.integers(-1000, 1000), max_size=8),
        st.dictionaries(st.text(min_size=1, max_size=8),
                        st.integers(-99, 99), max_size=4)),
        label="payload")
    a, b = socket.socketpair()
    try:
        a.sendall(pack_pkg(pid, tp, payload))
        got = read_pkg(b)
        assert got is not None
        rpid, rtp, data_bytes = got
        assert (rpid, rtp) == (pid, tp)
        if payload is None:
            assert data_bytes == b""
        else:
            assert unpackb(data_bytes) == payload
        # flip the checkbit: the reader must reject, not misparse
        frame = bytearray(pack_pkg(pid, tp, payload))
        frame[7] ^= 0x01
        a.sendall(bytes(frame))
        try:
            read_pkg(b)
            raised = False
        except ValueError:
            raised = True
        assert raised
    finally:
        a.close()
        b.close()


@given(st.data())
@settings(max_examples=12, deadline=None)
def test_progressive_jpeg_decodes_identical_to_baseline(data):
    """Both encoders quantize the SAME coefficients (all-ones
    tables, identical forward transform), and the progressive scan
    script reconstructs them exactly (successive-approximation
    chain down to Al=0) — so the two decodes must agree
    bit-for-bit, not just within rounding."""
    import numpy as np

    from siridb_server_spark.operators.multimodal import (
        _parse_jpeg_raster, encode_jpeg_baseline,
        encode_jpeg_progressive)

    h = data.draw(st.integers(1, 24), label="h")
    w = data.draw(st.integers(1, 24), label="w")
    seed = data.draw(st.integers(0, 2 ** 31 - 1), label="seed")
    rgb = data.draw(st.booleans(), label="rgb")
    sub = data.draw(st.sampled_from([(1, 1), (2, 2), (2, 1)]),
                    label="subsample") if rgb else (1, 1)
    shape = (h, w, 3) if rgb else (h, w)
    px = np.random.RandomState(seed).randint(
        0, 256, shape, dtype=np.int64).astype(np.uint8)
    base = _parse_jpeg_raster(encode_jpeg_baseline(px, subsample=sub))
    prog = _parse_jpeg_raster(
        encode_jpeg_progressive(px, subsample=sub))
    assert prog is not None
    assert prog[:3] == base[:3]
    assert (prog[3] == base[3]).all()


@given(st.data())
@settings(max_examples=10, deadline=None)
def test_h264_decode_identical_to_encoder_reconstruction(data):
    """H.264's decode loop is pure integer math, and the fixture
    encoder reconstructs with the decoder's own dequant/transform/
    prediction functions — so decode(encode(px)) must equal the
    encoder reconstruction bit-for-bit for every macroblock kind,
    and I_PCM must reproduce gray input losslessly."""
    import numpy as np

    from siridb_server_spark.operators.h264 import (
        decode_h264_rgb, encode_h264_annexb)

    h = data.draw(st.integers(1, 20), label="h") * 2
    w = data.draw(st.integers(1, 20), label="w") * 2
    seed = data.draw(st.integers(0, 2 ** 31 - 1), label="seed")
    rgb = data.draw(st.booleans(), label="rgb")
    mode = data.draw(st.sampled_from(["pcm", "i16", "i4", "mixed"]),
                     label="mode")
    qp = data.draw(st.sampled_from([8, 20, 33, 47]), label="qp")
    shape = (h, w, 3) if rgb else (h, w)
    px = np.random.RandomState(seed).randint(
        0, 256, shape, dtype=np.int64).astype(np.uint8)
    stream, recon = encode_h264_annexb(px, mode=mode, qp=qp)
    out = decode_h264_rgb(stream)
    assert out is not None
    assert (out[0], out[1]) == (w, h)
    assert (out[2] == recon).all()
    if mode == "pcm" and not rgb:
        assert (out[2][:, :, 0] == px).all()


# ---- integer-contract helpers (functions/stable.py) -----------------
# One Spark round-trip per property would be minutes; instead assert
# the SQL fragments against DuckDB (the oracle side) and the python
# ground truth — the Spark side is pinned by the oracle gate, which
# compares the two engines directly on every entry.

@given(st.integers(min_value=1, max_value=10**15),
       st.floats(min_value=0.0, max_value=10.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_int_ppm_sql_is_exact_half_up(den, ratio):
    # the documented domain is ratio-like (num/den well under 9e12,
    # where the BIGINT ppm result fits); contracts pass shares <= 1
    # and weights capped at single digits
    num = int(den * ratio)
    import duckdb

    from siridb_server_spark.functions.stable import INT_PPM_SQL

    got = duckdb.sql("SELECT " + INT_PPM_SQL.format(
        num=str(num), den=str(den))).fetchone()[0]
    # half-up rounding of num*1e6/den in exact integer math
    import fractions
    x = fractions.Fraction(num * 1000000, den)
    expect = int(x) + (1 if x - int(x) >= fractions.Fraction(1, 2)
                       else 0)
    assert got == expect


@given(st.lists(st.floats(min_value=-50, max_value=50,
                          allow_nan=False), min_size=1, max_size=40))
@settings(max_examples=150, deadline=None)
def test_scaled_term_mean_sql_matches_python_fold(xs):
    import math

    import duckdb

    from siridb_server_spark.functions.stable import (
        INT_MEAN_SIGNED_SQL, SCALED_TERM_SQL)

    vals = " UNION ALL ".join(f"SELECT CAST({repr(v)} AS DOUBLE) AS x"
                              for v in xs)
    term = SCALED_TERM_SQL.format(x="x", s=10 ** 6)
    got = duckdb.sql(
        f"WITH t AS ({vals}) SELECT "
        + INT_MEAN_SIGNED_SQL.format(sum=f"sum({term})",
                                     n="count(*)")
        + " FROM t").fetchone()[0]

    def q(v):  # the exact same IEEE ops as the SQL/Spark term
        s = abs(v) * 1e6 + 0.5
        return int(math.floor(s)) * (1 if v >= 0 else -1)

    s, n = sum(q(v) for v in xs), len(xs)
    expect = (2 * s + n) // (2 * n) if s >= 0 \
        else -((-s * 2 + n) // (2 * n))
    assert got == expect


@given(n=st.integers(1, 2 ** 31 - 1))
@settings(max_examples=500, deadline=None)
def test_fixlog2_pure_python_model(n):
    """fixlog2's driver-side model: exponent + 16-bit linear
    mantissa must bracket 2^16·log2(n) from below by at most
    0.0862 bit (chord gap + truncation), be monotone, and be exact
    at powers of two."""
    import math

    e = n.bit_length() - 1
    fix = e * 65536 + ((n << 16) // (1 << e)) - 65536
    err = fix / 65536 - math.log2(n)
    assert -0.0862 <= err <= 0.0
    if n & (n - 1) == 0:
        assert fix == e * 65536
    # monotone: next integer never maps lower
    e2 = (n + 1).bit_length() - 1
    fix2 = e2 * 65536 + (((n + 1) << 16) // (1 << e2)) - 65536
    assert fix2 >= fix


@given(rows=st.lists(st.tuples(st.integers(0, 2 ** 60 - 1),
                               st.floats(-1e6, 1e6)),
                     min_size=0, max_size=400),
       k=st.integers(1, 64),
       nparts=st.integers(1, 7))
@settings(max_examples=200, deadline=None)
def test_bottomk_merge_theorem_model(rows, k, nparts):
    """The quantile/KMV merge theorem on the pure-Python model:
    bottom-k of arbitrary partials' bottom-k equals the one-shot
    bottom-k, for any partitioning."""
    def bottomk(pairs):
        return sorted(pairs)[:k]

    direct = bottomk(rows)
    parts = [rows[i::nparts] for i in range(nparts)]
    merged = bottomk([p for part in parts for p in bottomk(part)])
    assert merged == direct


@given(xs=st.lists(st.floats(-1e3, 1e3, allow_nan=False),
                   min_size=1, max_size=64),
       smax=st.floats(0.1, 1e3))
@settings(max_examples=300, deadline=None)
def test_sq_code_model_bounds_and_roundtrip(xs, smax):
    """Scalar-quantization model: codes of in-range values stay in
    [-128, 128] (floor(x·127/s + .5) hits ±127 only at |x| ≤ s…
    clamp applies to queries), and dequantization error is within
    half a step for |x| ≤ smax."""
    import math

    lim = 127
    for x in xs:
        c = math.floor(x * lim / smax + 0.5)
        if abs(x) <= smax:
            assert -lim - 1 <= c <= lim + 1
            # half-step dequant bound
            assert abs(c * smax / lim - x) <= smax / lim / 2 + 1e-9
