"""Multimodal plumbing tests: the binary column + mapInPandas harness
(schemas, batch shapes, 1→1 and 1→N fan-out) with the stub codec."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import multimodal as mm
from spark_cassandra_collabfiltering_spark.plans.queries import t as load_table

from conftest import SF_SMOKE


def _media(spark):
    return mm.attach_binary_payload(load_table(spark, SF_SMOKE, "documents"))


def test_feature_extraction_matches_jvm_side(spark):
    media = _media(spark)
    feats = mm.extract_media_features(media)
    got = {r["doc_id"]: (r["n_bytes"], r["head_hex"]) for r in feats.collect()}
    want = {
        r["doc_id"]: (r["n"], r["hh"])
        for r in media.select(
            "doc_id",
            F.octet_length("payload").alias("n"),
            F.lower(F.hex(F.substring("payload", 1, 8))).alias("hh"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_resize_fixed_payload(spark):
    out = mm.resize_media(_media(spark), width=16, height=16)
    rows = out.collect()
    assert len(rows) > 0
    assert all(len(r["payload"]) == 256 for r in rows)
    assert all((r["width"], r["height"]) == (16, 16) for r in rows)


def test_frame_sampling_fanout(spark):
    media = _media(spark)
    frames = mm.sample_frames(media, frame_bytes=100, every_n=2)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = {
        r["doc_id"]: r["n_bytes"]
        for r in media.select(
            "doc_id", F.col("media_meta.n_bytes").alias("n_bytes")
        ).collect()
    }
    for doc_id, n_frames in per_doc.items():
        n_chunks = (sizes[doc_id] + 99) // 100
        assert n_frames == (n_chunks + 1) // 2  # every 2nd chunk
    # frame indices are the sampled ones
    idxs = [r["frame_idx"] for r in frames.filter(F.col("doc_id") == min(per_doc)).collect()]
    assert idxs == sorted(idxs) and all(i % 2 == 0 for i in idxs)


# ---------------------------------------------------------------------------
# Real stdlib codecs (round 5): PNG filter reconstruction, WAV framing,
# corrupt-payload quarantine — no Spark needed for the codec contracts.
# ---------------------------------------------------------------------------

from spark_cassandra_collabfiltering_spark.operators import codecs  # noqa: E402


def test_png_roundtrip_exercises_all_filters():
    # height 10 -> row filters 0,1,2,3,4,0,1,2,3,4 (every type twice)
    w, h = 13, 10
    px = bytes((x * 37 + y * 91 + 5) % 256 for y in range(h) for x in range(w))
    payload = codecs.encode_png_gray(w, h, px)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    gw, gh, got = codecs.decode_png_gray(payload)
    assert (gw, gh) == (w, h)
    assert got == px  # bit-exact through zlib + filter reconstruction


def test_png_corrupt_payloads_raise():
    w, h = 4, 3
    payload = codecs.encode_png_gray(w, h, bytes(range(12)))
    import pytest

    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png_gray(b"JUNK" + payload[4:])
    # flip a byte inside IDAT -> CRC mismatch must be caught
    broken = bytearray(payload)
    broken[40] ^= 0xFF
    with pytest.raises(ValueError):
        codecs.decode_png_gray(bytes(broken))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_png_gray(payload[:-6])


def test_wav_roundtrip():
    samples = [((i * 57) % 2048) - 1024 for i in range(200)]
    payload = codecs.encode_wav_pcm16(8000, samples)
    rate, got = codecs.decode_wav_pcm16(payload)
    assert rate == 8000 and got == samples
    import pytest

    with pytest.raises(ValueError):
        codecs.decode_wav_pcm16(b"RIFFgarbage-that-is-not-wav")


def test_decode_media_features_quarantines_corrupt(spark):
    import pandas as pd
    from spark_cassandra_collabfiltering_spark.operators import multimodal as mm

    good_png = codecs.encode_png_gray(3, 2, bytes(range(6)))
    good_wav = codecs.encode_wav_pcm16(8000, [1, -2, 3])
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "payload": [good_png, good_wav, b"\x89PNG\r\n\x1a\nbroken"],
            }
        )
    )
    rows = {r["doc_id"]: r.asDict() for r in mm.decode_media_features(media).collect()}
    assert rows[1]["kind"] == "png" and rows[1]["n_units"] == 6
    assert rows[1]["unit_sum"] == sum(range(6))
    assert rows[2]["kind"] == "wav" and rows[2]["n_units"] == 3
    assert rows[2]["unit_sum"] == 1 + 2 + 3
    assert rows[3]["kind"] == "corrupt" and rows[3]["n_units"] is None


def test_truncated_wav_and_bad_deflate_raise_valueerror():
    """The quarantine contract: header-claims-more-frames-than-data WAV
    and valid-CRC-but-bad-deflate PNG must raise ValueError (not
    struct.error / zlib.error, which would abort the Spark task)."""
    import struct
    import zlib

    import pytest

    from spark_cassandra_collabfiltering_spark.operators import codecs as cx

    good = cx.encode_wav_pcm16(8000, [0, 1000, -1000, 500])
    truncated = good[:-4]  # chop samples; header still claims them
    with pytest.raises(ValueError):
        cx.decode_wav_pcm16(truncated)

    # PNG with a structurally valid chunk stream but garbage deflate
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\xff\xff\xff\xff")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        cx.decode_png_gray(bad)


def test_audio_frame_energy_partial_frame_and_values(spark):
    """Frame 0 energy is the exact sum of squares of the first 32
    samples; the last frame keeps its true (partial) length; energies
    match a direct recompute from the planted PCM formula."""
    from spark_cassandra_collabfiltering_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1,), (3,)], "doc_id bigint")
    got = {
        (r.doc_id, r.frame_idx): (r.n_samples, r.energy)
        for r in mm.audio_energy_query(df).collect()
    }
    for d in (1, 3):
        n = 64 + d % 50
        samples = [((d * 17 + i * 5) % 2048) - 1024 for i in range(n)]
        frames = [samples[i : i + 32] for i in range(0, n, 32)]
        for fi, ch in enumerate(frames):
            assert got[(d, fi)] == (len(ch), sum(s * s for s in ch)), (d, fi)
        assert len(frames[-1]) == n - 32 * (len(frames) - 1)
    # only wav (odd-id) docs produce frames
    evens = mm.audio_energy_query(
        spark.createDataFrame([(2,)], "doc_id bigint")
    ).count()
    assert evens == 0


# --- GIF codec + frame sampling (r5-cont6) ---------------------------------

def _lzw_encode_real(cs, pixels):
    """A REAL GIF LZW compressor (greedy longest-match, growing table,
    width bumps, 12-bit cap with CLEAR) — deliberately a different
    algorithm than the degenerate encoder in codecs.encode_gif, so
    decoding its output is an independent check of the decoder's
    table-growth/KwKwK/reset paths."""
    from spark_cassandra_collabfiltering_spark.operators.codecs import _BitWriter

    clear, end = 1 << cs, (1 << cs) + 1
    bw = _BitWriter()
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
            # the DECODER's table lags one entry (no add on the first
            # code after clear), so bump on ITS schedule: decoder
            # next_code == next_code - 1 here
            if next_code - 1 == (1 << w) and w < 12:
                w += 1
        s = bytes((p,))
    bw.write(table[s], w)
    bw.write(end, w)
    return bw.done()


def test_gif_roundtrip_multiframe():
    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    pal = [(i * 17, i * 17, i * 17) for i in range(16)]
    frames = [
        bytes((3 * f + x) % 16 for x in range(8 * 6)) for f in range(4)
    ]
    gif = C.encode_gif(8, 6, frames, pal)
    w, h, p, fr = C.decode_gif(gif)
    assert (w, h, p, fr) == (8, 6, pal, frames)


def test_gif_lzw_decoder_handles_real_compression():
    """Feed the decoder a genuinely-compressed stream (greedy LZW with
    table growth) including the repetitive pattern that triggers the
    KwKwK corner case; decode must invert it exactly."""
    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    cases = [
        bytes([1, 1, 1, 1, 1, 1, 1, 1]),            # KwKwK immediately
        bytes([0, 1, 2, 3] * 40),                   # growing repeats
        bytes((i * 7 + 3) % 16 for i in range(3000)),  # long mixed stream
    ]
    for px in cases:
        data = _lzw_encode_real(4, px)
        got = C._lzw_decode(4, data, len(px))
        assert got == px


def test_gif_extension_blocks_are_skipped():
    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    pal = [(0, 0, 0), (255, 255, 255)]
    gif = bytearray(C.encode_gif(3, 2, [bytes([0, 1, 0, 1, 0, 1])], pal))
    # splice a graphic-control extension right before the descriptor
    idx = gif.index(0x2C)
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x0A, 0x00, 0x00, 0x00])
    gif[idx:idx] = ext
    w, h, p, fr = C.decode_gif(bytes(gif))
    assert (w, h) == (3, 2) and fr == [bytes([0, 1, 0, 1, 0, 1])]


def test_frame_sampling_takes_every_kth(spark):
    from spark_cassandra_collabfiltering_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = mm.frame_sample_query(docs, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for d, idxs in by_doc.items():
        n_frames = 2 + d % 3
        assert sorted(idxs) == [i for i in range(n_frames) if i % 2 == 0]
    # closed-form spot check: doc 0, frame 0 — pixels (x*3 + y) % 16
    r0 = next(r for r in out if r.doc_id == 0 and r.frame_idx == 0)
    w, h = 8, 6
    want = sum(((x * 3 + y) % 16) * 17 for y in range(h) for x in range(w))
    assert (r0.n_px, r0.gray_sum) == (w * h, want)


def test_audio_resample_identity_and_interp(spark):
    """num==den (identity positions, frac always 0) reproduces the
    input samples' prefix stats; 2/3 downsample matches a
    hand-computed interpolation on a known doc."""
    from spark_cassandra_collabfiltering_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(1,), (3,)], "doc_id long")
    ident = {
        r.doc_id: r for r in mm.audio_resample_query(docs, num=1, den=1).collect()
    }
    for d in (1, 3):
        n = 64 + d % 50
        s = [((d * 17 + i * 5) % 2048) - 1024 for i in range(n)]
        r = ident[d]
        assert r.n_out == n - 1  # ((n-1)*1)//1
        assert r.sum_out == sum(s[: n - 1])
        assert r.energy_out == sum(v * v for v in s[: n - 1])

    down = {
        r.doc_id: r for r in mm.audio_resample_query(docs, num=2, den=3).collect()
    }
    d = 1
    n = 64 + d % 50
    s = [((d * 17 + i * 5) % 2048) - 1024 for i in range(n)]
    n_out = ((n - 1) * 2) // 3
    off = 65536 * 2
    vals = []
    for j in range(n_out):
        k, frac = divmod(j * 3, 2)
        nxt = s[k + 1] if k + 1 < n else s[k]
        vals.append(s[k] + ((nxt - s[k]) * frac + off) // 2 - off // 2)
    r = down[d]
    assert (r.n_in, r.n_out, r.sum_out, r.energy_out) == (
        n, n_out, sum(vals), sum(v * v for v in vals)
    )


def test_bmp_roundtrip_and_decode_harness(spark):
    """BMP (third image container): encode→decode round trip covering
    bottom-up BGR padded rows AND a hand-built top-down (negative
    height) file; BMP payloads flow through the real-decode harness
    with exact channel-sum features."""
    import struct

    from spark_cassandra_collabfiltering_spark.operators import (
        codecs as C,
        multimodal as mm,
    )

    px = [((x * 7 + y) % 256, (y * 5) % 256, (x * 3) % 256)
          for y in range(4) for x in range(5)]
    bmp = C.encode_bmp_rgb(5, 4, px)
    assert C.decode_bmp_rgb(bmp) == (5, 4, px)

    # top-down variant: flip height sign and re-order rows
    top = bytearray(bmp)
    struct.pack_into("<i", top, 22, -4)
    stride = 5 * 3 + (4 - (5 * 3) % 4) % 4
    body = bmp[54:]
    rows = [body[i * stride:(i + 1) * stride] for i in range(4)]
    top[54:] = b"".join(reversed(rows))
    assert C.decode_bmp_rgb(bytes(top)) == (5, 4, px)

    media = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(b"BMgarbage"))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in mm.decode_media_features(media).collect()}
    assert got[1].kind == "bmp" and (got[1].width, got[1].height) == (5, 4)
    assert got[1].unit_sum == sum(r + g + b for r, g, b in px)
    assert got[2].kind == "corrupt"


# ---------------------------------------------------------------------------
# r7: the GIF encoder grew REAL LZW compression (was clear-per-pixel).
# Its width schedule mirrors the decoder's lag-one addition model —
# subtle enough to deserve a standing property pin: any frame content
# must round-trip bit-exactly, including width bumps landing on the
# final data code and the 12-bit-cap CLEAR reset.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    nbits=st.sampled_from([1, 2, 4, 8]),
    w=st.integers(1, 24),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**31),
    mode=st.sampled_from(["random", "periodic", "constant"]),
)
def test_gif_lzw_encoder_roundtrip_property(nbits, w, h, seed, mode):
    import random

    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    rng = random.Random(seed)
    npal = 1 << nbits
    pal = [(i % 256, (i * 3) % 256, (i * 7) % 256) for i in range(npal)]
    n = w * h
    if mode == "random":
        px = bytes(rng.randrange(npal) for _ in range(n))
    elif mode == "periodic":
        px = (bytes([rng.randrange(npal), rng.randrange(npal)]) * n)[:n]
    else:
        px = bytes([seed % npal]) * n
    frames = [px, px[::-1]]
    got = C.decode_gif(C.encode_gif(w, h, frames, pal))
    assert got[:2] == (w, h)
    assert got[3] == frames


def test_gif_lzw_encoder_cap_reset_roundtrip():
    # 120k px of slowly-varying content overflows the 12-bit table →
    # exercises the encoder's CLEAR reset arm; also proves REAL
    # compression happens (payload well under 1 byte/px)
    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    pal = [(i, i, i) for i in range(256)]
    big = bytes((i * 7 + (i >> 3)) % 256 for i in range(120_000))
    gif = C.encode_gif(400, 300, [big], pal)
    W, H, P, FR = C.decode_gif(gif)
    assert (W, H) == (400, 300) and FR == [big]
    assert len(gif) < len(big) // 2


# ---------------------------------------------------------------------------
# r7 cont.: real baseline JPEG (T.81) — exact on the block-constant q100
# subset (the oracled arm), bounded-error on general lossy content,
# quarantine on truncation/progressive/subsampled input.
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    bw=st.integers(1, 5),
    bh=st.integers(1, 4),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
)
def test_jpeg_block_constant_q100_roundtrip_is_bit_exact(bw, bh, seed, color):
    """The lossless-subset contract the mm_jpeg_features oracle relies
    on: block-constant content at quality 100 round-trips exactly,
    through BOTH the grayscale and the 3-component color path (gray-
    valued RGB: Y=c, Cb=Cr=128 exact both ways)."""
    import random

    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    rng = random.Random(seed)
    w, h = bw * 8, bh * 8
    vals = {(x, y): rng.randrange(256) for y in range(bh) for x in range(bw)}
    if color:
        px = [(vals[(x // 8, y // 8)],) * 3 for y in range(h) for x in range(w)]
        enc = C.encode_jpeg_rgb(w, h, px, quality=100)
        W, H, n, out = C.decode_jpeg(enc)
        assert (W, H, n) == (w, h, 3)
        want = bytes(v for p in px for v in p)
        assert out == want
    else:
        px = bytes(vals[(x // 8, y // 8)] for y in range(h) for x in range(w))
        enc = C.encode_jpeg_gray(w, h, px, quality=100)
        W, H, n, out = C.decode_jpeg(enc)
        assert (W, H, n, out) == (w, h, 1, px)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**31),
    quality=st.sampled_from([85, 95, 100]),
)
def test_jpeg_lossy_roundtrip_error_is_bounded(w, h, seed, quality):
    """General content (non-multiple-of-8 dims included: edge-replicated
    padding) must reconstruct within a quantization-scale bound —
    lossy, but never wild. Bound: q100 DCT roundoff only; q>=85 stays
    within a generous but diagnostic envelope."""
    import random

    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    enc = C.encode_jpeg_gray(w, h, px, quality=quality)
    W, H, n, out = C.decode_jpeg(enc)
    assert (W, H, n) == (w, h, 1)
    errs = [abs(a - b) for a, b in zip(out, px)]
    cap = 2 if quality == 100 else 40
    assert max(errs) <= cap, (quality, max(errs))
    assert sum(errs) / len(errs) <= (1 if quality == 100 else 12)


def test_jpeg_color_gradient_roundtrip_close():
    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    px = [
        (x * 7 % 256, y * 11 % 256, (x + y) % 256)
        for y in range(16)
        for x in range(16)
    ]
    enc = C.encode_jpeg_rgb(16, 16, px, quality=100)
    W, H, n, out = C.decode_jpeg(enc)
    assert (W, H, n) == (16, 16, 3)
    flat = [v for p in px for v in p]
    errs = [abs(a - b) for a, b in zip(out, flat)]
    assert max(errs) <= 3  # YCbCr double rounding only at q100


def test_jpeg_quarantine_contract():
    """Truncated, progressive, subsampled and garbage inputs raise
    ValueError (-> the decode stage's corrupt-row quarantine), never
    crash or return wrong pixels."""
    import pytest as _pytest

    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    px = bytes(range(64))
    good = C.encode_jpeg_gray(8, 8, px, quality=100)
    for cut in (2, 10, len(good) // 2, len(good) - 3):
        with _pytest.raises(ValueError):
            C.decode_jpeg(good[:cut])
    with _pytest.raises(ValueError):
        C.decode_jpeg(b"\x00" + good)
    # progressive: flip SOF0 -> SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError, match="baseline"):
        C.decode_jpeg(prog)
    # 2x2-subsampled SOF byte (SOF0 body: len(2) P(1) H(2) W(2) N(1),
    # then per component cid/samp/tq — samp of component 1 = offset 11)
    sub = bytearray(good)
    i = sub.find(b"\xff\xc0")
    sub[i + 11] = 0x22
    with _pytest.raises(ValueError, match="subsampling"):
        C.decode_jpeg(bytes(sub))
    # unknown quant-table selector: malformed, quarantined
    bad_tq = bytearray(good)
    bad_tq[i + 12] = 7
    with _pytest.raises(ValueError, match="malformed"):
        C.decode_jpeg(bytes(bad_tq))


def test_jpeg_decode_features_quarantines_corrupt_payloads(spark):
    """The Arrow decode stage turns a broken JPEG into a corrupt row,
    not a job abort — same contract as the PNG/GIF arms."""
    import pandas as pd

    from spark_cassandra_collabfiltering_spark.operators import (
        codecs as C,
        multimodal as mm,
    )

    good = C.encode_jpeg_gray(8, 8, bytes(range(64)), quality=100)
    rows = [(0, good), (1, good[:20]), (2, b"\xff\xd8\xff")]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["kind"] for r in mm.decode_media_features(media).collect()}
    assert out == {0: "jpeg", 1: "corrupt", 2: "corrupt"}


# ---------------------------------------------------------------------------
# r7 cont.: perceptual image near-dup (dHash over the real codecs)
# ---------------------------------------------------------------------------


def test_dhash_resolution_invariance_and_twin_distance(spark):
    """An upscaled copy keeps its dHash (mean-pool normalization), a
    one-pixel twin stays within hamming distance 2, and an unrelated
    image is far."""
    import numpy as np

    from spark_cassandra_collabfiltering_spark.operators import (
        codecs as C,
        multimodal as mm,
    )

    base = mm._synth_dhash_png(10)  # doc 10 (g=5)
    twin = mm._synth_dhash_png(11)  # one flipped pixel
    other = mm._synth_dhash_png(40)  # different group
    # upscale base 4x with nearest-neighbor: same pooled grid
    w, h, px = C.decode_png_gray(base)
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    big = np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)
    big_png = C.encode_png_gray(w * 4, h * 4, big.tobytes())

    media = spark.createDataFrame(
        [(0, base), (1, twin), (2, other), (3, big_png), (4, b"junk")],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in mm.image_dhash_bands(media).collect()}

    def dist(a, b):
        return sum(
            bin(rows[a][c] ^ rows[b][c]).count("1")
            for c in ("b0", "b1", "b2", "b3")
        )

    assert dist(0, 3) == 0  # resolution-invariant
    assert dist(0, 1) <= 2  # twin
    assert dist(0, 2) > 3  # unrelated
    assert rows[4]["b0"] is None  # corrupt payload quarantined


def test_dhash_banded_join_is_complete_for_small_distances(spark):
    """Pigeonhole completeness: every pair within distance 3 shares a
    band and must surface — verified against a brute-force all-pairs
    distance computation on a planted batch."""
    from itertools import combinations

    from spark_cassandra_collabfiltering_spark.operators import multimodal as mm

    media_rows = [(d, mm._synth_dhash_png(d)) for d in range(60)]
    media = spark.createDataFrame(media_rows, "doc_id long, payload binary")
    bands = mm.image_dhash_bands(media)
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in mm.dhash_near_dup_pairs(bands, max_dist=3).collect()
    }
    rows = {r["doc_id"]: r for r in bands.collect()}
    want = {}
    for a, b in combinations(sorted(rows), 2):
        d = sum(
            bin(rows[a][c] ^ rows[b][c]).count("1")
            for c in ("b0", "b1", "b2", "b3")
        )
        if d <= 3:
            want[(a, b)] = d
    assert got == want and any(v <= 2 for v in want.values())


# ---------------------------------------------------------------------------
# r7 cont.: audio near-dup (amplitude-invariant envelope fingerprint)
# ---------------------------------------------------------------------------


def test_audio_envelope_pairs_volume_twins_not_strangers(spark):
    from spark_cassandra_collabfiltering_spark.operators import (
        codecs as C,
        multimodal as mm,
    )

    base = [((7 * 17 + i * 5) % 1024) - 512 for i in range(512)]
    double = [2 * s for s in base]  # exact 2x gain: energies scale 4x
    other = [((99 * 13 + i * 11) % 1024) - 512 for i in range(512)]
    rows = [
        (0, C.encode_wav_pcm16(8000, base)),
        (1, C.encode_wav_pcm16(8000, double)),
        (2, C.encode_wav_pcm16(8000, other)),
        (3, b"not audio"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = mm.audio_envelope_fingerprint(media, levels=8)
    got = {r["doc_id"]: r["fp"] for r in fps.collect()}
    assert 3 not in got  # non-RIFF payloads never fingerprint
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in mm.audio_near_dup_pairs(fps).collect()
    }
    assert (0, 1) in pairs and not {(0, 2), (1, 2)} & pairs


def test_audio_neardup_query_finds_planted_twins(spark):
    """Deterministic planted batch: every (2g, 2g+1) volume-twin pair
    must surface unless the 1.5x integer gain flips a quantization
    level at a boundary — tolerated, bounded, and deterministic."""
    from spark_cassandra_collabfiltering_spark.operators import multimodal as mm

    docs = spark.range(40).selectExpr("id as doc_id")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in mm.audio_neardup_query(docs).collect()
    }
    twins = {(2 * g, 2 * g + 1) for g in range(20)}
    found = pairs & twins
    assert len(found) >= 18  # at most ~10% boundary flips
    assert not (pairs - twins)  # no cross-group collisions in 20 groups


# ---------------------------------------------------------------------------
# r7 cont.: AVI/MJPEG — true video through from-scratch codecs
# ---------------------------------------------------------------------------


def test_avi_mjpeg_roundtrip_and_quarantine():
    import pytest as _pytest

    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    f1 = C.encode_jpeg_gray(16, 8, bytes([10] * 64 + [200] * 64), quality=100)
    f2 = C.encode_jpeg_gray(16, 8, bytes([99] * 128), quality=100)
    avi = C.encode_avi_mjpeg(16, 8, [f1, f2], fps=5)
    w, h, frames = C.decode_avi_mjpeg(avi)
    assert (w, h) == (16, 8) and frames == [f1, f2]
    # frame payloads decode bit-exactly (lossless subset)
    assert C.decode_jpeg(frames[1])[3] == bytes([99] * 128)
    # quarantine: truncation, non-AVI, foreign codec
    with _pytest.raises(ValueError):
        C.decode_avi_mjpeg(avi[: len(avi) // 2])
    with _pytest.raises(ValueError):
        C.decode_avi_mjpeg(b"RIFFxxxxWAVE" + avi[12:])
    foreign = avi.replace(b"vidsMJPG", b"vidsH264", 1)
    with _pytest.raises(ValueError, match="foreign"):
        C.decode_avi_mjpeg(foreign)
    with _pytest.raises(ValueError):
        C.encode_avi_mjpeg(4, 4, [])


def test_video_frame_features_samples_and_quarantines(spark):
    from spark_cassandra_collabfiltering_spark.operators import (
        codecs as C,
        multimodal as mm,
    )

    avi = mm._synth_mjpeg_avi(5)  # 3 frames -> sampled idx {0, 2}
    media = spark.createDataFrame(
        [(5, avi), (6, b"garbage")], "doc_id long, payload binary"
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): r["unit_sum"]
        for r in mm.video_frame_features(media).collect()
    }
    assert set(rows) == {(5, 0), (5, 2), (6, None)}
    # direct recompute of frame 2's sum from the planted formula
    w, h = 8 * (1 + 5 % 3), 8 * (1 + 5 % 2)
    want = sum(
        (5 * 31 + 2 * 53 + bx * 37 + by * 91) % 256
        for by in range(h // 8)
        for bx in range(w // 8)
    ) * 64
    assert rows[(5, 2)] == want and rows[(6, None)] is None


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(w=st.integers(1, 24), h=st.integers(1, 16), seed=st.integers(0, 2**31))
def test_jpeg_color_roundtrip_error_bounded_on_random_rgb(w, h, seed):
    """Arbitrary RGB content through the full color path (YCbCr both
    ways + double rounding) stays within a tight q100 envelope."""
    import random

    from spark_cassandra_collabfiltering_spark.operators import codecs as C

    rng = random.Random(seed)
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    enc = C.encode_jpeg_rgb(w, h, px, quality=100)
    W, H, n, out = C.decode_jpeg(enc)
    assert (W, H, n) == (w, h, 3)
    flat = [v for p in px for v in p]
    errs = [abs(a - b) for a, b in zip(out, flat)]
    assert max(errs) <= 6 and sum(errs) / len(errs) <= 2.0, max(errs)
