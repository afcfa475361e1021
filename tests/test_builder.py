"""Pipeline builder: compile-time fallibility enforcement, errors-as-
data flow, routing, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrl_spark.pipeline import Pipeline


@pytest.fixture()
def logs(spark):
    rows = [
        (1, '10.0.0.1 - u1 [10/Oct/2020:13:55:36 +0000] "GET /a HTTP/1.1" 200 123'),
        (2, '10.0.0.2 - u2 [10/Oct/2020:13:55:37 +0000] "POST /b HTTP/1.1" 500 45'),
        (3, "not a log line at all"),
    ]
    return spark.createDataFrame(rows, ["id", "line"])


ACCESS = (
    '%{IPV4:ip} - %{USER:user} \\[%{HTTPDATE:ts}\\] '
    '"%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:ver}" '
    '%{NONNEGINT:status} %{NONNEGINT:bytes}'
)


def test_fallible_without_route_refuses_to_build(logs):
    p = Pipeline("p").parse_grok("line", ACCESS, anchored=True)
    with pytest.raises(ValueError, match="fallible"):
        p.build()


def test_bad_grok_fails_at_build_time():
    with pytest.raises(KeyError):
        Pipeline("p").parse_grok("line", "%{DOESNOTEXIST:x}")


def test_errors_are_data_and_route(logs):
    p = (
        Pipeline("weblog")
        .parse_grok("line", ACCESS, anchored=True)
        .coerce("status", "int")
        .route(
            [("server_error", F.col("status_int") >= 500)],
            otherwise="ok",
        )
    )
    out = {r["id"]: r for r in p.apply(logs).collect()}
    assert out[1]["route"] == "ok" and out[1]["status_int"] == 200
    assert out[2]["route"] == "server_error"
    assert out[3]["route"] == "dead_letter"
    assert out[3]["error"] == "unable to parse input with grok pattern"
    assert out[1]["error"] is None


def test_on_error_keep_builds_without_route(logs):
    p = Pipeline("keep", on_error="keep").parse_grok("line", ACCESS, anchored=True)
    out = p.apply(logs)
    assert "route" not in out.columns
    assert out.where(F.col("error").isNotNull()).count() == 1


def test_enrich_and_timestamp(spark, logs):
    dim = spark.createDataFrame(
        [("GET", "read"), ("POST", "write")], ["m", "kind"]
    )
    p = (
        Pipeline("e")
        .parse_grok("line", ACCESS, anchored=True)
        .parse_timestamp("ts", "%d/%b/%Y:%H:%M:%S %z", "ts_parsed")
        .enrich(dim, left_on="method", right_on="m")
        .route([], otherwise="ok")
    )
    out = {r["id"]: r for r in p.apply(logs).collect()}
    assert out[1]["kind"] == "read"
    assert out[2]["kind"] == "write"
    assert str(out[1]["ts_parsed"]) == "2020-10-10 13:55:36"
    assert out[3]["ts_parsed"] is None  # src null -> no new error


def test_explain(logs):
    p = (
        Pipeline("x")
        .parse_grok("line", ACCESS)
        .coerce("status", "int")
        .route([("e", F.col("status_int") >= 500)])
    )
    text = p.explain()
    assert "parse_grok(line) [fallible]" in text
    assert "dead_letter" in text


def test_multimodal_plumbing(spark):
    from vrl_spark.operators import multimodal

    rows = [(i, bytes([i]) * (100 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "media"])
    feats = multimodal.decode_images(df).collect()
    assert len(feats) == 20
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id[3]["meta"]["byte_len"] == 103
    assert len(by_id[3]["embedding"]) == 8
    # determinism: same bytes -> same features
    feats2 = multimodal.decode_images(df).collect()
    assert {r["doc_id"]: r["meta"]["content_sha"] for r in feats2} == {
        r["doc_id"]: r["meta"]["content_sha"] for r in feats
    }
    frames = multimodal.frame_sample(df, every_n=1).collect()
    assert len(frames) == sum(max(1, (100 + i) // 64) for i in range(20))


def _make_bmp(w, h, rgb_rows):
    """Minimal uncompressed 24-bit BMP from [[(r,g,b)...]...] rows
    (top-down input; stored bottom-up per the format default)."""
    import struct

    row_bytes = (w * 3 + 3) & ~3
    pix = b""
    for row in reversed(rgb_rows):
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)
        pix += line + b"\x00" * (row_bytes - len(line))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0))
    return header + pix


def test_multimodal_real_image_kernels(spark):
    import struct

    from vrl_spark.operators import multimodal

    bmp = _make_bmp(2, 2, [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]])
    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + struct.pack(">IIBBBBB", 640, 480, 8, 6, 0, 0, 0) + b"\x00" * 8)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(png)), (3, bytearray(gif))],
        ["doc_id", "media"],
    )
    by = {r["doc_id"]: r for r in multimodal.decode_images(df).collect()}
    assert (by[1]["meta"]["format"], by[1]["meta"]["width"], by[1]["meta"]["height"]) == ("bmp", 2, 2)
    assert (by[2]["meta"]["format"], by[2]["meta"]["width"], by[2]["meta"]["height"]) == ("png", 640, 480)
    assert (by[3]["meta"]["format"], by[3]["meta"]["width"]) == ("gif", 320)
    # BMP raster really decoded: 2x2 resize == original pixels, so
    # cell luminances are the known values for pure R/G/B/white
    emb = by[1]["embedding"]
    assert abs(emb[0] - 0.299) < 1e-4      # red cell luminance
    assert abs(emb[1] - 0.587) < 1e-4      # green
    assert abs(emb[2] - 0.114) < 1e-4      # blue
    assert abs(emb[3] - 1.0) < 1e-4        # white
    # raster decode direct
    px = multimodal.decode_bmp_pixels(bmp)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (255, 0, 0) and tuple(px[1, 0]) == (0, 0, 255)


def test_multimodal_real_audio_kernel(spark):
    import io
    import math
    import struct
    import wave

    from vrl_spark.operators import multimodal

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        # 1 kHz sine, 0.5 amplitude, 800 samples (100 ms)
        frames = b"".join(
            struct.pack("<h", int(0.5 * 32767 * math.sin(2 * math.pi * 1000 * i / 8000)))
            for i in range(800)
        )
        w.writeframes(frames)
    wav = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio at all"))],
        ["doc_id", "media"],
    )
    by = {r["doc_id"]: r for r in multimodal.decode_audio(df).collect()}
    m, f = by[1]["meta"], by[1]["features"]
    assert (m["channels"], m["sample_rate"], m["n_frames"], m["duration_ms"]) == (1, 8000, 800, 100)
    assert abs(f["rms"] - 0.5 / math.sqrt(2)) < 0.01       # sine RMS = A/sqrt(2)
    assert abs(f["peak"] - 0.5) < 0.01
    assert 0.2 < f["zero_cross_rate"] < 0.3                # 1kHz at 8kHz ~ 0.25
    assert by[2]["meta"] is None and by[2]["features"] is None


def test_multimodal_audio_8bit_unsigned(spark):
    """8-bit PCM WAV is UNSIGNED centered at 128: digital silence
    (all-128 bytes) must read as rms≈0/peak≈0, and a full-scale
    square wave as peak≈1."""
    import io
    import wave

    from vrl_spark.operators import multimodal

    def wav8(samples: bytes) -> bytearray:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(samples)
        return bytearray(buf.getvalue())

    silence = wav8(bytes([128] * 400))
    square = wav8(bytes(([0] * 4 + [255] * 4) * 50))
    df = spark.createDataFrame(
        [(1, silence), (2, square)], ["doc_id", "media"]
    )
    by = {r["doc_id"]: r for r in multimodal.decode_audio(df).collect()}
    assert by[1]["meta"]["sample_width"] == 1
    assert by[1]["features"]["rms"] < 1e-9          # silence, not full-scale
    assert by[1]["features"]["peak"] < 1e-9
    assert abs(by[2]["features"]["peak"] - 1.0) < 0.01


def test_builder_parse_groks_rule_list(spark):
    from vrl_spark.pipeline import Pipeline

    logs = spark.createDataFrame(
        [(1, "level=error bytes=99"), (2, "42 fallback"), (3, "???")],
        ["id", "message"],
    )
    P2 = Pipeline
    built = P2("multi", on_error="keep").parse_groks(
        "message",
        patterns=["%{KV} %{KV2}", "%{NONNEGINT:num} %{WORD:word}"],
        aliases={"KV": r"%{WORD:k}=%{NOTSPACE:v}",
                 "KV2": r"%{WORD:k2}=%{NOTSPACE:v2}"},
    )
    out = {r["id"]: r for r in built.apply(logs).collect()}
    assert out[1]["k"] == "level" and out[1]["v"] == "error"
    assert out[1]["num"] is None
    assert out[2]["num"] == "42" and out[2]["word"] == "fallback"
    assert out[2]["k"] is None
    assert out[3]["error"] is not None          # no pattern matched
    assert out[1]["error"] is None

    import pytest as _pt
    with _pt.raises(KeyError):
        P2("bad", on_error="keep").parse_groks("message", patterns=["%{NOPE:x}"])


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", _z.crc32(ctype + body)))


def _make_png(pixels, color_type=2, filters=None):
    """Hand-assemble a PNG: pixels HxWxC list, explicit per-row filter
    types with the filtering applied HERE (independent of the
    decoder)."""
    import struct
    import zlib as _z

    h, w, ch = len(pixels), len(pixels[0]), len(pixels[0][0])
    raw = bytearray()
    prev = [0] * (w * ch)
    filters = filters or [0] * h
    for y in range(h):
        line = [c for px in pixels[y] for c in px]
        ft = filters[y]
        raw.append(ft)
        if ft == 0:
            out = line
        elif ft == 1:    # Sub
            out = [(line[x] - (line[x - ch] if x >= ch else 0)) & 0xFF
                   for x in range(len(line))]
        elif ft == 2:    # Up
            out = [(line[x] - prev[x]) & 0xFF for x in range(len(line))]
        elif ft == 3:    # Average
            out = [(line[x] - (((line[x - ch] if x >= ch else 0) + prev[x]) >> 1)) & 0xFF
                   for x in range(len(line))]
        else:            # Paeth
            out = []
            for x in range(len(line)):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((line[x] - pred) & 0xFF)
        raw.extend(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_raster_decode_golden():
    """decode_png_pixels: exact pixels back through zlib inflate +
    every filter type (None/Sub/Up/Average/Paeth), RGB and RGBA."""
    import numpy as np

    from vrl_spark.operators import multimodal

    # 5 rows x 3 cols RGB, one row per filter type
    pixels = [
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        [[200, 100, 50], [25, 75, 125], [0, 255, 128]],
        [[1, 2, 3], [4, 5, 6], [7, 8, 9]],
        [[128, 128, 128], [255, 255, 255], [0, 0, 0]],
    ]
    png = _make_png(pixels, color_type=2, filters=[0, 1, 2, 3, 4])
    got = multimodal.decode_png_pixels(png)
    assert got is not None and got.shape == (5, 3, 3)
    assert np.array_equal(got, np.array(pixels, dtype=np.uint8))

    # RGBA path
    rgba = [[[255, 0, 0, 255], [0, 255, 0, 128]],
            [[0, 0, 255, 64], [255, 255, 255, 0]]]
    png4 = _make_png(rgba, color_type=6, filters=[0, 4])
    got4 = multimodal.decode_png_pixels(png4)
    assert got4.shape == (2, 2, 4)
    assert np.array_equal(got4, np.array(rgba, dtype=np.uint8))

    # non-PNG and unsupported flavors return None
    assert multimodal.decode_png_pixels(b"not a png") is None


def test_png_embedding_real_pixels(spark):
    """decode_images: a 2x2 R/G/B/white PNG must produce the same REAL
    luminance embedding the BMP path does (pixels, not hash stub)."""
    from vrl_spark.operators import multimodal

    pixels = [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]]
    png = _make_png(pixels, color_type=2, filters=[0, 2])
    df = spark.createDataFrame([(1, bytearray(png))], ["doc_id", "media"])
    row = multimodal.decode_images(df).collect()[0]
    assert row["meta"]["format"] == "png"
    assert (row["meta"]["width"], row["meta"]["height"]) == (2, 2)
    emb = row["embedding"]
    assert abs(emb[0] - 0.299) < 1e-4      # red cell luminance
    assert abs(emb[1] - 0.587) < 1e-4      # green
    assert abs(emb[2] - 0.114) < 1e-4      # blue
    assert abs(emb[3] - 1.0) < 1e-4        # white


def test_video_keyframes_scene_cuts(spark):
    """Three flat-color scenes with tiny in-scene jitter: the cut
    detector must flag exactly frame 0 and the two scene starts, with
    the right mean colors; a fourth doc with a non-RVID payload is
    skipped, and a single-frame video yields just frame 0."""
    import numpy as np

    from vrl_spark.operators import multimodal

    rng = np.random.RandomState(3)

    def scene(color, n, h=8, w=8):
        base = np.full((n, h, w, 3), color, dtype=np.int16)
        jitter = rng.randint(-2, 3, size=base.shape)
        return np.clip(base + jitter, 0, 255).astype(np.uint8)

    frames = np.concatenate([
        scene((200, 10, 10), 5),   # scene A: frames 0-4
        scene((10, 200, 10), 4),   # scene B: frames 5-8
        scene((10, 10, 200), 6),   # scene C: frames 9-14
    ])
    vid = multimodal.encode_rvid(frames)
    single = multimodal.encode_rvid(frames[:1])
    rows = [(1, vid), (2, b"not a video"), (3, single)]
    df = spark.createDataFrame(rows, ["doc_id", "media"])
    out = multimodal.video_keyframes(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 3}
    keys = sorted(r["frame_idx"] for r in by_doc[1])
    assert keys == [0, 5, 9]
    by_idx = {r["frame_idx"]: r for r in by_doc[1]}
    assert by_idx[0]["diff_energy"] == 0.0
    assert by_idx[5]["diff_energy"] > 50  # scene jump, not jitter
    assert by_idx[5]["mean_rgb"][1] > 150  # scene B is green
    assert by_idx[9]["mean_rgb"][2] > 150  # scene C is blue
    # determinism: same bytes -> same shas
    again = {(r["doc_id"], r["frame_idx"]): r["frame_sha"]
             for r in multimodal.video_keyframes(df).collect()}
    assert again == {(r["doc_id"], r["frame_idx"]): r["frame_sha"]
                     for r in out}
    assert [r["frame_idx"] for r in by_doc[3]] == [0]


def test_rvid_roundtrip_and_guards():
    import numpy as np
    import pytest

    from vrl_spark.operators.multimodal import (
        _decode_rvid, encode_rvid,
    )

    frames = np.arange(2 * 4 * 5 * 3, dtype=np.uint8).reshape(2, 4, 5, 3)
    data = encode_rvid(frames)
    back = _decode_rvid(data)
    assert back.shape == (2, 4, 5, 3) and (back == frames).all()
    assert _decode_rvid(data[:-1]) is None      # truncated raster
    assert _decode_rvid(b"RVID") is None        # truncated header
    assert _decode_rvid(b"\x00" * 40) is None   # wrong magic
    with pytest.raises(ValueError):
        encode_rvid(np.zeros((1, 2, 2, 4), dtype=np.uint8))  # RGBA
