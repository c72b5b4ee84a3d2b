"""Multimodal binary-column operators: image header metadata, video-frame
sampling, and PCM audio stats over opaque `binary` payload columns.

The reference pipeline treats media as opaque blobs fronted by external
tooling; a 100 TB training-data pipeline needs the *container plumbing*
(schema sniffing, dimension extraction, frame slicing, sample stats) to
run distributed, with the expensive codec decode (PIL/ffmpeg) isolated in
one Arrow-batched seam. The split here:

* **Header/container parsing is REAL and zero-UDF** — all byte math runs
  as Catalyst expressions over `hex(payload)` (uppercase in Spark and
  DuckDB alike), so format sniffing, PNG/GIF/BMP/JPEG dimensions, frame
  offsets, and WAV/PCM fields are whole-stage-codegen'd column algebra:
  no Python crosses the row stream, filters on the extracted columns push
  down, and the same algebra replays bit-for-bit in the DuckDB oracles.
* **Codec decode stays stubbed** behind `dataprep.binary_meta_decode`
  (mapInPandas, Arrow) — the only stage that would need PIL/ffmpeg, and
  the only stage that pays a Python hop.

Scale notes: every op here is map-only (ZERO shuffle) — payloads never
leave their input partition; frame sampling explodes to only the sampled
frames (work ∝ kept frames, not container bytes); stats are bounded-prefix
exact integers so no float drift across engines. At 100 TB the binary
column dominates scan bytes — each op narrows its projection to (id,
payload) so Parquet column pruning keeps untouched media columns on disk.

Hex-string convention: byte offset b (0-based), n bytes → hex chars
`substring(hex, 2*b+1, 2*n)`; big-endian = direct `conv(.., 16, 10)`,
little-endian = byte-pair reversal first. DuckDB mirror:
`CAST('0x' || <chars> AS BIGINT)`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "be_uint",
    "le_uint",
    "sniff_format",
    "image_meta",
    "image_ahash",
    "image_resize_nearest",
    "frame_sample",
    "frame_features",
    "pcm_stats",
    "SVID_MAGIC_HEX",
]

# Deterministic synthetic video container used by frame_sample fixtures:
#   bytes 0-3  magic 'SVID'
#   bytes 4-5  frame count, uint16 BE
#   bytes 6-7  frame size in bytes, uint16 BE
#   bytes 8+   n_frames frames of frame_size bytes each
SVID_MAGIC_HEX = "53564944"


def be_uint(hex_col: Column, byte_off: int, n_bytes: int) -> Column:
    """Big-endian unsigned int at byte offset `byte_off` of a hex string."""
    return F.conv(F.substring(hex_col, 2 * byte_off + 1, 2 * n_bytes), 16, 10).cast(
        "long"
    )


def le_uint(hex_col: Column, byte_off: int, n_bytes: int) -> Column:
    """Little-endian unsigned int: reverse the byte pairs, then parse."""
    swapped = F.concat(
        *[F.substring(hex_col, 2 * (byte_off + i) + 1, 2) for i in reversed(range(n_bytes))]
    )
    return F.conv(swapped, 16, 10).cast("long")


# JPEG SOF scan: first SOF0/1/2 marker after SOI, staying byte-aligned
# ((?:..)*? consumes whole bytes only, so an FFC0 bit pattern straddling a
# byte boundary can never false-match). Segment layout after the marker:
# length(2B) precision(1B) height(2B) width(2B). Caveat (documented, not
# hidden): a full JPEG parser walks segment lengths and would skip an
# EXIF-embedded thumbnail's SOF; this bounded regex takes the FIRST SOF,
# which is correct for baseline/progressive files without embedded
# thumbnails — the common case for crawl-scale JPEG payloads.
_JPEG_SOF_RX = (
    "^FFD8(?:[0-9A-F]{2})*?FF(C0|C1|C2)[0-9A-F]{6}([0-9A-F]{4})([0-9A-F]{4})"
)


def sniff_format(hex_col: Column) -> Column:
    """Container format from magic bytes (png/gif/jpeg/bmp/wav/svid/unknown)."""
    return (
        F.when(F.substring(hex_col, 1, 16) == "89504E470D0A1A0A", F.lit("png"))
        .when(F.substring(hex_col, 1, 8) == "47494638", F.lit("gif"))
        .when(F.substring(hex_col, 1, 6) == "FFD8FF", F.lit("jpeg"))
        .when(F.substring(hex_col, 1, 4) == "424D", F.lit("bmp"))
        .when(
            (F.substring(hex_col, 1, 8) == "52494646")
            & (F.substring(hex_col, 17, 8) == "57415645"),
            F.lit("wav"),
        )
        .when(F.substring(hex_col, 1, 8) == SVID_MAGIC_HEX, F.lit("svid"))
        .otherwise(F.lit("unknown"))
    )


def image_meta(
    df: DataFrame,
    payload_col: str,
    *,
    fmt: str = "format",
    width: str = "width",
    height: str = "height",
    n_bytes: str = "n_bytes",
) -> DataFrame:
    """Image container metadata as pure column algebra — REAL parsing, not
    a stub: PNG IHDR (width/height uint32 BE at bytes 16/20), GIF logical
    screen (uint16 LE at 6/8), BMP BITMAPINFOHEADER (int32 LE at 18/22),
    JPEG first-SOF scan (see `_JPEG_SOF_RX`). Unknown/truncated payloads
    get null dimensions, never an error — the malformed-blob channel a
    crawl pipeline needs. Zero shuffle, zero UDF; `filter(width > X)`
    on the output stays a codegen'd scan predicate.
    """
    h = F.hex(F.col(payload_col))
    blen = F.octet_length(F.col(payload_col))
    fmt_c = sniff_format(h)
    jpeg_h = F.regexp_extract(h, _JPEG_SOF_RX, 2)
    jpeg_w = F.regexp_extract(h, _JPEG_SOF_RX, 3)
    w = (
        F.when((fmt_c == "png") & (blen >= 24), be_uint(h, 16, 4))
        .when((fmt_c == "gif") & (blen >= 10), le_uint(h, 6, 2))
        .when((fmt_c == "bmp") & (blen >= 26), le_uint(h, 18, 4))
        .when((fmt_c == "jpeg") & (jpeg_w != ""), F.conv(jpeg_w, 16, 10).cast("long"))
    )
    ht = (
        F.when((fmt_c == "png") & (blen >= 24), be_uint(h, 20, 4))
        .when((fmt_c == "gif") & (blen >= 10), le_uint(h, 8, 2))
        .when((fmt_c == "bmp") & (blen >= 26), le_uint(h, 22, 4))
        .when((fmt_c == "jpeg") & (jpeg_h != ""), F.conv(jpeg_h, 16, 10).cast("long"))
    )
    return (
        df.withColumn(fmt, fmt_c)
        .withColumn(width, w)
        .withColumn(height, ht)
        .withColumn(n_bytes, blen.cast("long"))
    )


def frame_sample(
    df: DataFrame,
    payload_col: str,
    *,
    every: int = 2,
    id_cols: tuple[str, ...] = ("doc_id",),
    frame_col: str = "frame",
    idx_col: str = "frame_idx",
) -> DataFrame:
    """Every-k-th frame sampling over the SVID container (header-declared
    frame count/size — the same slicing algebra applies to any
    fixed-frame-size format, e.g. raw YUV or PCM blocks). Emits one row
    per SAMPLED frame with the frame payload re-materialized as binary
    plus container metadata. Malformed containers (bad magic, truncated
    body) yield ZERO rows rather than errors.

    Plan shape: map-only — sequence/transform builds the sampled-offset
    array, one `explode` fans out to kept frames; no shuffle, and shuffle-
    free means a 10^12-frame sampling job is pure scan throughput.
    """
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    h = F.hex(F.col(payload_col))
    n_frames = be_uint(h, 4, 2)
    fsize = be_uint(h, 6, 2)
    blen = F.octet_length(F.col(payload_col))
    valid = (
        (F.substring(h, 1, 8) == SVID_MAGIC_HEX)
        & (fsize > 0)
        & (blen >= F.lit(8) + n_frames * fsize)
    )
    idxs = F.when(
        valid & (n_frames > 0),
        F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(every).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    frames = F.transform(
        idxs,
        lambda i: F.struct(
            i.alias(idx_col),
            h.substr(
                ((F.lit(8) + i * fsize) * 2 + 1).cast("int"),
                (fsize * 2).cast("int"),
            ).alias("fh"),
        ),
    )
    out = df.select(
        *id_cols,
        n_frames.alias("n_frames"),
        fsize.alias("frame_size"),
        F.explode(frames).alias("_f"),
    )
    return out.select(
        *id_cols,
        "n_frames",
        "frame_size",
        F.col(f"_f.{idx_col}").alias(idx_col),
        F.unhex(F.col("_f.fh")).alias(frame_col),
        F.md5(F.col("_f.fh")).alias("frame_md5"),
    )


def frame_features(
    df: DataFrame,
    frame_col: str,
    *,
    n_blocks: int = 4,
    id_cols: tuple[str, ...] = ("doc_id", "frame_idx"),
    out_col: str = "features",
) -> DataFrame:
    """Per-frame block-mean byte features — the feature-extraction seam a
    real pipeline fills with a vision embedder. This stage IS the Arrow
    path (numpy over mapInPandas): bytes → uint8 vector → `n_blocks`
    equal splits → exact integer mean per block (sum // len, so the
    DuckDB oracle reproduces it without float drift). Demonstrates the
    batch shape production decode needs: one numpy call per Arrow batch,
    never per row; projection narrowed to (ids, frame) so media columns
    not in use never leave Parquet.
    """
    import numpy as np
    import pandas as pd

    id_fields = ", ".join(f"{c} long" for c in id_cols)
    out_schema = f"{id_fields}, {out_col} array<int>"

    def extract(batches):
        for pdf in batches:
            feats = []
            for v in pdf[frame_col]:
                if v is None or len(v) == 0:
                    feats.append(None)
                    continue
                a = np.frombuffer(v, dtype=np.uint8)
                splits = np.array_split(a, n_blocks)
                feats.append(
                    [int(s.sum()) // len(s) if len(s) else 0 for s in splits]
                )
            out = {c: pdf[c] for c in id_cols}
            out[out_col] = feats
            yield pd.DataFrame(out)

    return df.select(*id_cols, frame_col).mapInPandas(extract, out_schema)


def pcm_stats(
    df: DataFrame,
    payload_col: str,
    *,
    max_samples: int = 64,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Canonical-WAV (RIFF/WAVE, 16-bit PCM) header parse + bounded-prefix
    sample stats, all zero-UDF: audio_format/channels/sample_rate/bits
    from the fmt chunk (LE fields), then exact integer stats over the
    first `max_samples` samples — sum, sum of |x|, peak |x|, and sum of
    squares (all int64-exact: 2^15-bounded samples keep even sum_sq well
    inside int64 for any sane prefix). Signed 16-bit LE decode is
    `u - 65536·[u >= 32768]`. Non-WAV / non-16-bit payloads yield null
    stats. Map-only; the bounded prefix means cost is O(max_samples), not
    O(payload) — the "cheap triage before expensive decode" pattern.
    """
    h = F.hex(F.col(payload_col))
    blen = F.octet_length(F.col(payload_col))
    is_wav = (
        (F.substring(h, 1, 8) == "52494646")
        & (F.substring(h, 17, 8) == "57415645")
        & (F.substring(h, 25, 8) == "666D7420")
        & (blen >= 44)
    )
    audio_format = F.when(is_wav, le_uint(h, 20, 2))
    channels = F.when(is_wav, le_uint(h, 22, 2))
    sample_rate = F.when(is_wav, le_uint(h, 24, 4))
    bits = F.when(is_wav, le_uint(h, 34, 2))
    data_size = F.when(is_wav, le_uint(h, 40, 4))
    usable = is_wav & (bits == 16) & (F.substring(h, 73, 8) == "64617461")
    n_avail = F.least(
        F.floor(data_size / 2).cast("long"),
        F.floor((blen - 44) / 2).cast("long"),
        F.lit(max_samples).cast("long"),
    )
    samples = F.when(
        usable & (n_avail > 0),
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_avail - 1),
            lambda i: _signed16(le_uint_dyn(h, F.lit(44) + i * 2)),
        ),
    )
    zero = F.lit(0).cast("long")
    return df.select(
        *id_cols,
        audio_format.alias("audio_format"),
        channels.alias("channels"),
        sample_rate.alias("sample_rate"),
        bits.alias("bits_per_sample"),
        F.when(usable, n_avail).alias("n_samples"),
        F.aggregate(samples, zero, lambda acc, x: acc + x).alias("sum_val"),
        F.aggregate(samples, zero, lambda acc, x: acc + F.abs(x)).alias("sum_abs"),
        F.array_max(F.transform(samples, F.abs)).alias("peak"),
        F.aggregate(samples, zero, lambda acc, x: acc + x * x).alias("sum_sq"),
    )


def image_ahash(payload: Column, *, blocks: int = 32, max_bytes: int = 256) -> Column:
    """Average-hash (aHash) perceptual fingerprint of raw image/frame
    bytes as ONE pure column expression: the first `min(n, max_bytes)`
    bytes are split into `blocks` contiguous slices (block j = bytes
    [j·m/blocks, (j+1)·m/blocks)), and bit j is set when block j's mean
    byte ≥ the global mean. The comparison is division-free
    (`sum_j · m ≥ total · len_j`) so the fingerprint is integer-exact in
    any engine. Returns a `long` with `blocks` significant bits.

    This is the LAION-style image-dedup primitive: near-identical images
    produce fingerprints within a few bits, so `dataprep.simhash_pairs`
    (band join + star guard + exact-Hamming verify) runs unchanged over
    the output via its `fp_table` seam — image near-dup inherits the
    text pipeline's full scale topology. In production the decode/resize
    UDF (8×8 grayscale downsample) runs FIRST and this op fingerprints
    the 64 thumbnail bytes; `max_bytes` bounds expression cost when it
    is pointed at raw payloads instead. Zero shuffle, zero UDF.
    """
    if blocks < 1 or blocks > 62:
        raise ValueError(f"blocks must be in [1, 62], got {blocks}")
    h = F.hex(payload)
    n = F.octet_length(payload)
    m = F.least(n, F.lit(max_bytes)).cast("long")
    byte_at = lambda j: F.conv(  # noqa: E731
        h.substr((j * 2 + 1).cast("int"), F.lit(2)), 16, 10
    ).cast("long")
    bvals = F.transform(
        F.sequence(F.lit(0).cast("long"), m - 1), byte_at
    )
    zero = F.lit(0).cast("long")
    total = F.aggregate(bvals, zero, lambda a, x: a + x)
    # exact in double: j, m bounded so j*m <= 62 * max_bytes << 2^53
    start = lambda j: F.floor(j * m / blocks).cast("long")  # noqa: E731

    def term(j: Column) -> Column:
        s, e = start(j), start(j + 1)
        ln = e - s
        sm = F.aggregate(F.slice(bvals, (s + 1).cast("int"), ln.cast("int")), zero, lambda a, x: a + x)
        bit = (ln > 0) & (sm * m >= total * ln)
        w = F.pow(F.lit(2.0), j.cast("double")).cast("long")
        return F.when(bit, w).otherwise(zero)

    return F.when(
        n > 0,
        F.aggregate(
            F.sequence(F.lit(0).cast("long"), F.lit(blocks - 1).cast("long")),
            zero,
            lambda acc, j: acc + term(j),
        ),
    )


def image_resize_nearest(
    payload: Column,
    src_w: Column,
    src_h: Column,
    dst_w: int,
    dst_h: int,
) -> Column:
    """Nearest-neighbor downsample of a raw row-major grayscale image
    (one byte per pixel) to `dst_w`×`dst_h`, as pure column algebra:
    output pixel (r, c) = input byte at row ⌊r·src_h/dst_h⌋, col
    ⌊c·src_w/dst_w⌋ — the standard nearest-neighbor index map, exact in
    integer arithmetic so any engine reproduces the same thumbnail.
    Returns the resized image as `binary` (dst_w·dst_h bytes); null when
    the payload is null or shorter than src_w·src_h.

    This is the resize stage of the image-dedup recipe (decode →
    RESIZE to a fixed thumbnail → `image_ahash` → banded pairs): the
    fingerprint becomes resolution-invariant because every source size
    maps onto the same dst grid first. Zero shuffle, zero UDF; cost is
    O(dst pixels) per row, independent of source size. A production
    bilinear/Lanczos resize drops into the same seam as a Pandas UDF —
    nearest-neighbor is the exact-arithmetic variant that keeps the
    cross-engine oracle bit-true.
    """
    if dst_w < 1 or dst_h < 1:
        raise ValueError(f"dst dims must be >= 1, got {dst_w}x{dst_h}")
    h = F.hex(payload)
    n = F.octet_length(payload)
    ok = payload.isNotNull() & (n >= src_w * src_h) & (src_w > 0) & (src_h > 0)
    npix = dst_w * dst_h

    def src_pixel_hex(i: Column) -> Column:
        # exact for realistic dims: products stay far below 2^53, and a
        # correctly-rounded double quotient of ints this size floors to
        # the true integer quotient
        src_r = F.floor(F.floor(i / dst_w) * src_h / dst_h).cast("long")
        src_c = F.floor((i % dst_w) * src_w / dst_w).cast("long")
        off = (src_r * src_w + src_c) * 2 + 1
        return h.substr(off.cast("int"), F.lit(2))

    pix = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(npix - 1).cast("long")),
        src_pixel_hex,
    )
    return F.when(ok, F.unhex(F.array_join(pix, "")))


def le_uint_dyn(hex_col: Column, byte_off: Column) -> Column:
    """2-byte little-endian uint at a COLUMN byte offset (hex-char math)."""
    pos = byte_off * 2 + 1
    swapped = F.concat(
        hex_col.substr(pos + 2, F.lit(2)), hex_col.substr(pos, F.lit(2))
    )
    return F.conv(swapped, 16, 10).cast("long")


def _signed16(u: Column) -> Column:
    return F.when(u >= 32768, u - 65536).otherwise(u)
