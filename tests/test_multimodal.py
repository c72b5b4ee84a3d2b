"""Golden tests for the multimodal binary layer (operators/multimodal.py):
real container bytes built with struct.pack — the parser must read back
exactly what the writer put in, and malformed payloads must degrade to
nulls / zero rows, never errors.
"""

from __future__ import annotations

import struct

from logstash_spark.operators import multimodal as M


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\x0a"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _bmp(w, h):
    return (
        b"BM"
        + struct.pack("<IHHI", 200, 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, 24)
    )


def _jpeg(w, h):
    return (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0\x00\x11\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x22\x00"
    )


def test_image_meta_real_headers(spark):
    rows = [
        (1, _png(640, 480)),
        (2, _gif(320, 200)),
        (3, _bmp(800, 600)),
        (4, _jpeg(1920, 1080)),
        (5, b"hello world"),  # unknown format
        (6, None),  # missing blob
        (7, b"\x89PNG\r\n\x1a\x0a\x00"),  # truncated PNG
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in M.image_meta(df, "payload").collect()
    }
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("png", 640, 480)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("gif", 320, 200)
    assert (out[3]["format"], out[3]["width"], out[3]["height"]) == ("bmp", 800, 600)
    assert (out[4]["format"], out[4]["width"], out[4]["height"]) == (
        "jpeg",
        1920,
        1080,
    )
    assert out[5]["format"] == "unknown" and out[5]["width"] is None
    assert out[6]["width"] is None and out[6]["n_bytes"] is None
    assert out[7]["format"] == "png" and out[7]["width"] is None  # truncated


def test_image_meta_jpeg_progressive_sof2(spark):
    # SOF2 (progressive) must be recognized alongside SOF0
    pay = b"\xff\xd8\xff\xe0\x00\x02" + b"\xff\xc2\x00\x11\x08" + struct.pack(
        ">HH", 32, 64
    ) + b"\x03"
    df = spark.createDataFrame([(1, pay)], "doc_id long, payload binary")
    r = M.image_meta(df, "payload").collect()[0]
    assert (r["format"], r["width"], r["height"]) == ("jpeg", 64, 32)


def _svid(frames: list[bytes]):
    fs = len(frames[0]) if frames else 0
    return b"SVID" + struct.pack(">HH", len(frames), fs) + b"".join(frames)


def test_frame_sample_slices_and_guards(spark):
    frames = [bytes([i] * 4) for i in range(5)]
    good = _svid(frames)
    truncated = b"SVID" + struct.pack(">HH", 9, 4) + b"\x00" * 8
    rows = [(1, good), (2, truncated), (3, b"junk"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = M.frame_sample(df, "payload", every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: frames 0, 2, 4 sampled; payload bytes round-trip exactly
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 2, 4]
    got = {r["frame_idx"]: bytes(r["frame"]) for r in by_doc[1]}
    assert got == {0: frames[0], 2: frames[2], 4: frames[4]}
    assert all(r["n_frames"] == 5 and r["frame_size"] == 4 for r in by_doc[1])
    # malformed containers yield zero rows
    assert 2 not in by_doc and 3 not in by_doc and 4 not in by_doc


def test_frame_features_block_means(spark):
    # frame [10, 20, 30, 40, 50] with 2 blocks -> [ (10+20+30)//3, (40+50)//2 ]
    df = spark.createDataFrame(
        [(1, 0, bytes([10, 20, 30, 40, 50])), (1, 1, None)],
        "doc_id long, frame_idx long, frame binary",
    )
    out = {
        r["frame_idx"]: r["features"]
        for r in M.frame_features(
            df, "frame", n_blocks=2, id_cols=("doc_id", "frame_idx")
        ).collect()
    }
    assert out[0] == [20, 45]
    assert out[1] is None


def _wav(vals, rate=16000, ch=1):
    data = struct.pack(f"<{len(vals)}h", *vals)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_pcm_stats_exact_signed(spark):
    vals = [100, -200, 32767, -32768, 0]
    df = spark.createDataFrame(
        [(1, _wav(vals, rate=44100, ch=2)), (2, b"nope")],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in M.pcm_stats(df, "payload").collect()}
    r = out[1]
    assert (r["audio_format"], r["channels"], r["sample_rate"]) == (1, 2, 44100)
    assert r["bits_per_sample"] == 16 and r["n_samples"] == 5
    assert r["sum_val"] == sum(vals)
    assert r["sum_abs"] == sum(abs(v) for v in vals)
    assert r["peak"] == 32768
    assert r["sum_sq"] == sum(v * v for v in vals)
    assert out[2]["sample_rate"] is None and out[2]["n_samples"] is None


def test_pcm_stats_bounded_prefix(spark):
    vals = list(range(100))
    df = spark.createDataFrame([(1, _wav(vals))], "doc_id long, payload binary")
    r = M.pcm_stats(df, "payload", max_samples=16).collect()[0]
    assert r["n_samples"] == 16
    assert r["sum_val"] == sum(range(16))


def test_image_and_frame_plans_are_shuffle_free(spark):
    df = spark.createDataFrame([(1, _png(2, 2))], "doc_id long, payload binary")
    plan = M.image_meta(df, "payload")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    vdf = spark.createDataFrame([(1, _svid([b"abcd"]))], "doc_id long, payload binary")
    plan2 = (
        M.frame_sample(vdf, "payload")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan2


def test_image_ahash_matches_reference(spark):
    import hashlib

    from pyspark.sql import functions as F

    def ref_ahash(b, blocks=32, cap=256):
        b = b[:cap]
        m = len(b)
        tot = sum(b)
        fp = 0
        for j in range(blocks):
            s, e = (j * m) // blocks, ((j + 1) * m) // blocks
            bl = b[s:e]
            if len(bl) > 0 and sum(bl) * m >= tot * len(bl):
                fp |= 1 << j
        return fp

    rows = [(i, hashlib.md5(f"img{i}".encode()).digest() * 4) for i in range(12)]
    rows += [(90, b"\x05"), (91, b""), (92, None)]  # tiny / empty / null
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", M.image_ahash(F.col("payload")).alias("fp")
        ).collect()
    }
    for i, payload in rows[:12]:
        assert got[i] == ref_ahash(payload), i
    assert got[90] == ref_ahash(b"\x05")  # 1 byte: block 0 set, rest empty
    assert got[91] is None and got[92] is None


def test_image_ahash_near_identical_images_are_close(spark):
    import hashlib

    from pyspark.sql import functions as F

    base = bytearray(hashlib.md5(b"base").digest() * 4)
    tweaked = bytearray(base)
    tweaked[10] = (tweaked[10] + 1) % 256  # one-byte perturbation
    other = hashlib.md5(b"unrelated").digest() * 4
    df = spark.createDataFrame(
        [(1, bytes(base)), (2, bytes(tweaked)), (3, bytes(other))],
        "doc_id long, payload binary",
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", M.image_ahash(F.col("payload")).alias("fp")
        ).collect()
    }
    near = bin(fps[1] ^ fps[2]).count("1")
    far = bin(fps[1] ^ fps[3]).count("1")
    assert near <= 2 < far


def test_image_resize_nearest_matches_reference(spark):
    import hashlib

    from pyspark.sql import functions as F

    def ref_resize(b, sw, sh, dw, dh):
        return bytes(
            b[((r * sh) // dh) * sw + (c * sw) // dw]
            for r in range(dh)
            for c in range(dw)
        )

    rows = []
    for i in range(6):
        sw, sh = 10 + i, 6 + i
        img = (hashlib.md5(f"p{i}".encode()).digest() * 50)[: sw * sh]
        rows.append((i, sw, sh, img))
    rows += [(90, 4, 4, b"abc"), (91, 4, 4, None)]  # too short / null
    df = spark.createDataFrame(rows, "doc_id long, sw int, sh int, payload binary")
    got = {
        r["doc_id"]: bytes(r["th"]) if r["th"] is not None else None
        for r in df.select(
            "doc_id",
            M.image_resize_nearest(
                F.col("payload"), F.col("sw"), F.col("sh"), 8, 8
            ).alias("th"),
        ).collect()
    }
    for i, sw, sh, img in rows[:6]:
        assert got[i] == ref_resize(img, sw, sh, 8, 8), i
    assert got[90] is None and got[91] is None


def test_image_resize_inverts_exact_upscale(spark):
    import hashlib

    from pyspark.sql import functions as F

    base = hashlib.md5(b"thumb").digest() * 4  # 64 bytes = 8x8
    k = 3
    up = bytes(
        base[(r // k) * 8 + (c // k)] for r in range(8 * k) for c in range(8 * k)
    )
    df = spark.createDataFrame([(1, up)], "doc_id long, payload binary")
    r = df.select(
        M.image_resize_nearest(
            F.col("payload"), F.lit(8 * k), F.lit(8 * k), 8, 8
        ).alias("th")
    ).collect()[0]
    assert bytes(r["th"]) == base
