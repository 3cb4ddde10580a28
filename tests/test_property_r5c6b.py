"""Property tests (hypothesis) for the cont6b codecs: GIF round trip
under the degenerate encoder, real-LZW inversion on random pixel
streams (table growth, width bumps, resets), multi-frame integrity,
and the integer resampler's position/coverage invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cassandra_collabfiltering_spark.operators import codecs as C

SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _lzw_encode_real(cs, pixels):
    clear, end = 1 << cs, (1 << cs) + 1
    bw = C._BitWriter()
    table = {bytes((i,)): i for i in range(1 << cs)}
    next_code, w = end + 1, cs + 1
    bw.write(clear, w)
    s = b""
    for p in pixels:
        sp = s + bytes((p,))
        if sp in table:
            s = sp
            continue
        bw.write(table[s], w)
        if next_code < 4096:
            table[sp] = next_code
            next_code += 1
            if next_code - 1 == (1 << w) and w < 12:
                w += 1
        s = bytes((p,))
    bw.write(table[s], w)
    bw.write(end, w)
    return bw.done()


@SETTINGS
@given(px=st.lists(st.integers(0, 15), min_size=1, max_size=4000))
def test_lzw_real_compression_roundtrip(px):
    data = _lzw_encode_real(4, bytes(px))
    assert C._lzw_decode(4, data, len(px)) == bytes(px)


@SETTINGS
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    nf=st.integers(1, 4),
    seed=st.integers(0, 10**6),
)
def test_gif_multiframe_roundtrip(w, h, nf, seed):
    pal = [(i * 17, i * 17, i * 17) for i in range(16)]
    frames = [
        bytes((seed + f * 31 + i * 7) % 16 for i in range(w * h))
        for f in range(nf)
    ]
    gif = C.encode_gif(w, h, frames, pal)
    gw, gh, gp, gf = C.decode_gif(gif)
    assert (gw, gh, gp, gf) == (w, h, pal, frames)


@SETTINGS
@given(
    n=st.integers(2, 200),
    seed=st.integers(0, 10**6),
    num=st.integers(1, 4),
    den=st.integers(1, 4),
)
def test_resample_invariants(n, seed, num, den):
    """Pure-Python replica of the resampler's inner loop: every output
    interpolates between its two bracketing inputs (min <= out <= max),
    identity factors reproduce the prefix, and n_out never reads past
    the input."""
    s = [((seed + i * 5) % 2048) - 1024 for i in range(n)]
    n_out = ((n - 1) * num) // den
    off = 65536 * num
    for j in range(n_out):
        k, frac = divmod(j * den, num)
        assert k < n
        nxt = s[k + 1] if k + 1 < n else s[k]
        v = s[k] + ((nxt - s[k]) * frac + off) // num - off // num
        lo, hi = min(s[k], nxt), max(s[k], nxt)
        assert lo <= v <= hi
        if num == den:
            assert frac == 0 and v == s[k]


@SETTINGS
@given(cut=st.integers(1, 200), seed=st.integers(0, 1000))
def test_truncated_gif_raises_valueerror_only(cut, seed):
    """Any prefix of a valid GIF must raise ValueError (the quarantine
    contract) — never IndexError/struct.error, which would kill the
    Arrow task instead of quarantining the row."""
    pal = [(i * 17, i * 17, i * 17) for i in range(16)]
    frames = [bytes((seed + i) % 16 for i in range(24))]
    gif = C.encode_gif(6, 4, frames, pal)
    prefix = gif[: min(cut, len(gif) - 1)]
    try:
        C.decode_gif(prefix)
    except ValueError:
        pass  # the only acceptable failure mode


@SETTINGS
@given(cut=st.integers(2, 100))
def test_truncated_bmp_raises_valueerror_only(cut):
    px = [((x + y) % 256, x % 256, y % 256) for y in range(4) for x in range(4)]
    bmp = C.encode_bmp_rgb(4, 4, px)
    prefix = bmp[: min(cut, len(bmp) - 1)]
    try:
        C.decode_bmp_rgb(prefix)
    except ValueError:
        pass
