"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched mapInPandas
stages. This container has no media libraries, so the decode kernels are
STUBS (clearly-marked NotImplementedError or a deterministic fake) — the
Spark-side contract (schemas, batching, partitioning) is real and tested.

At 100 TB: payloads dominate row size, so these stages must (a) never
shuffle payload bytes — key by content hash first, join features back by
hash; (b) cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough
that a batch of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("content_hash", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("magic", T.StringType()),        # sniffed container type
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)

_MAGIC = {b"\x89PNG": "png", b"\xff\xd8\xff": "jpeg", b"RIFF": "riff",
          b"GIF8": "gif", b"\x00\x00\x00": "mp4ish"}


def sniff_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Native-expression metadata: hash, size, magic-byte sniff. Runs in the
    scan; no Python."""
    p = F.col(payload_col)
    magic = F.substring(p, 1, 4)
    cases = F.lit("unknown")
    for sig, name in _MAGIC.items():
        cases = F.when(F.substring(p, 1, len(sig)) == F.lit(bytearray(sig)), name).otherwise(cases)
    return df.select(
        "url",
        F.lit("image").alias("media_type"),
        F.xxhash64(p).alias("content_hash"),
        F.length(p).cast("long").alias("n_bytes"),
        cases.alias("magic"),
    )


def decode_image_stage(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL decode requires an image library absent from this container —
    the stage is a stub with the production signature. Swap `_decode` for
    PIL/libvips in a real deployment; nothing else changes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "image decode requires PIL/libvips — not available in this "
                "container; plumbing (schema/batching) is the tested contract"
            )
            yield pdf  # pragma: no cover

    return df.select("url", payload_col).mapInPandas(gen, DECODED_SCHEMA)


def fake_feature_stage(
    df: DataFrame, payload_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Deterministic fake feature extractor: 'embedding' = normalized bytes
    of a rolling checksum. Stands in for a CLIP-style encoder; exercises the
    exact Arrow batch shape a real model UDF would use."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                b = bytes(payload or b"")
                acc = np.zeros(dim, dtype=np.float64)
                for i, byte in enumerate(b):
                    acc[i % dim] += byte
                norm = float(np.linalg.norm(acc)) or 1.0
                feats.append((acc / norm).astype(np.float32).tolist())
            yield pd.DataFrame({"url": pdf["url"], "features": feats})

    return df.select("url", payload_col).mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: explode frame indices natively, decode
    only sampled frames downstream (decode stub applies). Shows the
    shuffle-free explode-then-process shape."""
    return df.select(
        "url",
        F.explode(F.sequence(F.lit(0), F.lit(every_n * 4), F.lit(every_n))).alias("frame_idx"),
    )


# --- REAL header decode (stdlib-only) --------------------------------------
# Full pixel decode still needs PIL/libvips (decode_image_stage stays the
# documented stub), but container DIMENSIONS live in the first bytes of the
# file and need no media library: PNG IHDR, GIF logical-screen descriptor,
# JPEG SOF frame header, BMP info header. That is the metadata a 100 TB
# multimodal pipeline actually scans for (aspect/size filters, thumbnail
# routing) before any pixel ever decodes.

IMAGE_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_image_dims(b: bytes) -> tuple[str, int | None, int | None]:
    """(format, width, height) from container headers; ('unknown', None,
    None) for unparseable bytes — never raises (F5 error isolation)."""
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            return ("png", int.from_bytes(b[16:20], "big"),
                    int.from_bytes(b[20:24], "big"))
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return ("gif", int.from_bytes(b[6:8], "little"),
                    int.from_bytes(b[8:10], "little"))
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in _SOF_MARKERS:
                    if i + 9 <= len(b):
                        return ("jpeg", int.from_bytes(b[i + 7:i + 9], "big"),
                                int.from_bytes(b[i + 5:i + 7], "big"))
                    break
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    i += 2
                    continue
                i += 2 + int.from_bytes(b[i + 2:i + 4], "big")
            return ("jpeg", None, None)
        if b[:2] == b"BM" and len(b) >= 26:
            return ("bmp", int.from_bytes(b[18:22], "little", signed=True),
                    abs(int.from_bytes(b[22:26], "little", signed=True)))
    except Exception:
        pass
    return ("unknown", None, None)


def image_dimensions(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """One Arrow-batched pass over (url, payload) emitting (url, format,
    width, height) — reads only header bytes per blob; payloads never
    shuffle (the stage is a projection of the payload scan)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for payload in pdf[payload_col]:
                fmt, w, h = parse_image_dims(bytes(payload or b""))
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"url": pdf["url"], "format": fmts,
                 "width": pd.array(ws, dtype="Int32"),
                 "height": pd.array(hs, dtype="Int32")}
            )

    return df.select("url", payload_col).mapInPandas(gen, IMAGE_DIMS_SCHEMA)


def png_bytes(w: int, h: int) -> bytes:
    """Minimal VALID grayscale PNG (correct CRCs, one zlib IDAT)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * (h * (w + 1)))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def gif_bytes(w: int, h: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor + trailer."""
    return (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + b"\x00\x00\x00" + b"\x3b")


def jpeg_bytes(w: int, h: int) -> bytes:
    """Header-valid JPEG: SOI + APP0 JFIF + SOF0 frame header + EOI."""
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (b"\xff\xc0\x00\x11\x08" + h.to_bytes(2, "big")
            + w.to_bytes(2, "big") + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def parse_wav_meta(b: bytes):
    """(format, channels, sample_rate, bits, n_frames) from a RIFF/WAVE
    header — chunk walk to 'fmt ' and 'data'; ('unknown', None×4) for
    anything unparseable. Stdlib-only, never raises."""
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return ("unknown", None, None, None, None)
        i, n = 12, len(b)
        ch = sr = bits = None
        data_len = None
        while i + 8 <= n:
            tag = b[i:i + 4]
            size = int.from_bytes(b[i + 4:i + 8], "little")
            if tag == b"fmt " and i + 24 <= n:
                ch = int.from_bytes(b[i + 10:i + 12], "little")
                sr = int.from_bytes(b[i + 12:i + 16], "little")
                bits = int.from_bytes(b[i + 22:i + 24], "little")
            elif tag == b"data":
                data_len = size
            i += 8 + size + (size & 1)
        if ch and sr and bits and data_len is not None:
            frames = data_len // max(1, ch * (bits // 8))
            return ("wav", ch, sr, bits, frames)
    except Exception:
        pass
    return ("unknown", None, None, None, None)


def audio_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched RIFF/WAVE header scan → (url, format, channels,
    sample_rate, bits_per_sample, n_frames); header bytes only, corrupt
    payloads null-route."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {"format": [], "channels": [], "sample_rate": [],
                    "bits_per_sample": [], "n_frames": []}
            for payload in pdf[payload_col]:
                fmt, ch, sr, bits, fr = parse_wav_meta(bytes(payload or b""))
                cols["format"].append(fmt)
                cols["channels"].append(ch)
                cols["sample_rate"].append(sr)
                cols["bits_per_sample"].append(bits)
                cols["n_frames"].append(fr)
            yield pd.DataFrame(
                {"url": pdf["url"],
                 "format": cols["format"],
                 "channels": pd.array(cols["channels"], dtype="Int32"),
                 "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                 "bits_per_sample": pd.array(cols["bits_per_sample"], dtype="Int32"),
                 "n_frames": pd.array(cols["n_frames"], dtype="Int64")}
            )

    return df.select("url", payload_col).mapInPandas(gen, AUDIO_META_SCHEMA)


def wav_bytes(channels: int, sample_rate: int, bits: int, n_frames: int) -> bytes:
    """Minimal VALID PCM WAV: RIFF + fmt + zeroed data chunk."""
    import struct

    block = channels * (bits // 8)
    data = b"\x00" * (n_frames * block)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_tracks", T.IntegerType()),
    ]
)


def parse_mp4_meta(b: bytes):
    """(format, brand, timescale, duration_ms, width, height, n_tracks)
    from an ISO-BMFF (MP4, ISO 14496-12) box tree: ftyp major brand,
    moov/mvhd timescale+duration (v0 and v1 layouts), the first trak's
    tkhd 16.16 fixed-point presentation dimensions, trak count. Handles
    32-bit, 64-bit (size==1 largesize) and to-end-of-file (size==0)
    boxes. Stdlib-only, header bytes only, never raises — anything
    unparseable returns ('unknown', None×6)."""
    unknown = ("unknown", None, None, None, None, None, None)
    try:
        def boxes(lo, hi):
            i = lo
            while i + 8 <= hi:
                size = int.from_bytes(b[i:i + 4], "big")
                typ = b[i + 4:i + 8]
                if size == 1:
                    if i + 16 > hi:
                        return
                    size = int.from_bytes(b[i + 8:i + 16], "big")
                    body = i + 16
                elif size == 0:
                    size = hi - i
                    body = i + 8
                else:
                    body = i + 8
                if size < 8 or i + size > hi:
                    return
                yield typ, body, i + size
                i += size

        brand = ts = dur = w = h = None
        n_tracks = 0
        for typ, lo, hi in boxes(0, len(b)):
            if typ == b"ftyp" and hi - lo >= 4:
                brand = b[lo:lo + 4].decode("ascii", "replace").strip()
            elif typ == b"moov":
                for t2, lo2, hi2 in boxes(lo, hi):
                    if t2 == b"mvhd" and hi2 - lo2 >= 20:
                        if b[lo2] == 1 and hi2 - lo2 >= 32:   # version 1
                            ts = int.from_bytes(b[lo2 + 20:lo2 + 24], "big")
                            dur = int.from_bytes(b[lo2 + 24:lo2 + 32], "big")
                        else:                                  # version 0
                            ts = int.from_bytes(b[lo2 + 12:lo2 + 16], "big")
                            dur = int.from_bytes(b[lo2 + 16:lo2 + 20], "big")
                    elif t2 == b"trak":
                        n_tracks += 1
                        for t3, lo3, hi3 in boxes(lo2, hi2):
                            need = 96 if b[lo3:lo3 + 1] == b"\x01" else 84
                            if t3 == b"tkhd" and w is None and hi3 - lo3 >= need:
                                off = lo3 + (need - 8)
                                wv = int.from_bytes(b[off:off + 4], "big") >> 16
                                hv = int.from_bytes(b[off + 4:off + 8], "big") >> 16
                                if wv and hv:
                                    w, h = wv, hv
        if brand is not None and ts:
            dms = (dur * 1000) // ts if dur is not None else None
            return ("mp4", brand, ts, dms, w, h, n_tracks)
    except Exception:
        pass
    return unknown


def video_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched ISO-BMFF header scan → (url, format, brand,
    timescale, duration_ms, width, height, n_tracks); header bytes only,
    corrupt payloads null-route (the F5 error-isolation discipline)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in
                    ("format", "brand", "timescale", "duration_ms",
                     "width", "height", "n_tracks")}
            for payload in pdf[payload_col]:
                fmt, br, ts, dms, w, h, nt = parse_mp4_meta(bytes(payload or b""))
                cols["format"].append(fmt)
                cols["brand"].append(br)
                cols["timescale"].append(ts)
                cols["duration_ms"].append(dms)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_tracks"].append(nt)
            yield pd.DataFrame(
                {"url": pdf["url"],
                 "format": cols["format"],
                 "brand": cols["brand"],
                 "timescale": pd.array(cols["timescale"], dtype="Int32"),
                 "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                 "width": pd.array(cols["width"], dtype="Int32"),
                 "height": pd.array(cols["height"], dtype="Int32"),
                 "n_tracks": pd.array(cols["n_tracks"], dtype="Int32")}
            )

    return df.select("url", payload_col).mapInPandas(gen, VIDEO_META_SCHEMA)


def mp4_bytes(timescale: int, duration: int, width: int, height: int,
              n_tracks: int = 1, brand: bytes = b"isom") -> bytes:
    """Minimal VALID ISO-BMFF: ftyp + moov(mvhd v0 + n_tracks × trak(tkhd
    v0)) — every field at its ISO 14496-12 offset, zero-filled where the
    parser has no use for it."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    mvhd = (bytes(4)                       # version 0 + flags
            + bytes(8)                     # ctime/mtime
            + struct.pack(">II", timescale, duration)
            + bytes(80))                   # rate..next_track_id
    tkhd = (bytes(4) + bytes(8) + bytes(4) + bytes(4) + bytes(4)
            + bytes(8) + bytes(8)          # reserved/layer/alt/volume
            + bytes(36)                    # identity-omitted matrix
            + struct.pack(">II", width << 16, height << 16))
    trak = box(b"trak", box(b"tkhd", tkhd))
    moov = box(b"moov", box(b"mvhd", mvhd) + trak * n_tracks)
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    return ftyp + moov


def wav_pcm_bytes(sample_rate: int, n: int, key: int) -> bytes:
    """REAL mono 16-bit PCM WAV with a deterministic sample train
    s_i = ((i·2557 + key·7919) mod 65536) − 32768 — a pure function of
    (n, key), so an oracle can recompute every feature from the FORMULA
    while the engine decodes the actual bytes."""
    import struct

    samples = [((i * 2557 + key * 7919) % 65536) - 32768 for i in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    precomputed: DataFrame | None = None,
) -> DataFrame:
    """REAL audio sample decoding — not a stub: mono 16-bit PCM WAV data
    chunks decoded with ``numpy.frombuffer`` inside an Arrow-batched
    ``mapInPandas`` stage, then INTEGER signal features so the result is
    aggregation-order-independent (hence engine-exact):

    * ``sum_abs``         Σ|s_i| (int64 — the L1 loudness mass)
    * ``peak``            max |s_i|
    * ``zero_crossings``  #{i : sign(s_i) ≠ sign(s_{i−1})} with
                          sign = (s < 0) — the classic voiced/unvoiced /
                          noisiness proxy
    * ``duration_ms``     n·1000 // sample_rate

    Non-WAV / non-PCM16 / corrupt payloads null-route (F5 isolation).
    The RMS/spectral float features a production pipeline adds on top
    are one einsum away in the same kernel; the integer core is what the
    correctness gate certifies. Scale shape: stateless 1→1 map over the
    payload scan, no shuffle.

    ``precomputed``: the pluggable decode seam (see ``image_features``) —
    an externally-computed (url, …features…) table bypasses the WAV
    kernel, cast/projected to ``AUDIO_FEATURES_SCHEMA``.
    """
    import numpy as np

    if precomputed is not None:
        return _from_precomputed(df, precomputed, AUDIO_FEATURES_SCHEMA)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"n_samples": [], "duration_ms": [], "sum_abs": [],
                   "peak": [], "zero_crossings": []}
            for payload in pdf[payload_col]:
                b = bytes(payload or b"")
                fmt, ch, sr, bits, fr = parse_wav_meta(b)
                ok = fmt == "wav" and ch == 1 and bits == 16 and sr
                vals = (None,) * 5
                if ok:
                    try:
                        i, n = 12, len(b)
                        data = None
                        while i + 8 <= n:
                            tag = b[i:i + 4]
                            size = int.from_bytes(b[i + 4:i + 8], "little")
                            if tag == b"data":
                                data = b[i + 8:i + 8 + size]
                                break
                            i += 8 + size + (size & 1)
                        if data is not None and len(data) % 2 == 0:
                            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                            neg = s < 0
                            zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
                            vals = (
                                int(s.size),
                                int(s.size) * 1000 // int(sr),
                                int(np.abs(s).sum()),
                                int(np.abs(s).max()) if s.size else 0,
                                zc,
                            )
                    except Exception:
                        vals = (None,) * 5
                for k, v in zip(out, vals):
                    out[k].append(v)
            yield pd.DataFrame(
                {"url": pdf["url"],
                 "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                 "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                 "sum_abs": pd.array(out["sum_abs"], dtype="Int64"),
                 "peak": pd.array(out["peak"], dtype="Int32"),
                 "zero_crossings": pd.array(out["zero_crossings"], dtype="Int64")}
            )

    return df.select("url", payload_col).mapInPandas(
        gen, AUDIO_FEATURES_SCHEMA
    )


def bmp_bytes(w: int, h: int, key: int) -> bytes:
    """REAL uncompressed 24-bpp BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding) whose stored byte at pixel (x, y) channel ch
    (B,G,R order) is (x·7 + y·13 + ch·29 + key·31) mod 256 — a pure
    integer function, so an oracle recomputes pixel statistics from the
    FORMULA while the engine decodes the actual bytes."""
    import struct

    row_len = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            for ch in range(3):
                row.append((x * 7 + y * 13 + ch * 29 + key * 31) % 256)
        row += b"\x00" * (row_len - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    off = 14 + len(info)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return header + info + data


def _from_precomputed(
    df: DataFrame, precomputed: DataFrame, schema: T.StructType
) -> DataFrame:
    """Pluggable decode seam: project an EXTERNALLY-computed feature table
    (the output of a real codec/featurizer run in an environment that has
    the media libs) into the exact schema the in-repo decode kernel would
    emit, keyed by url. Coverage follows the scanned corpus: urls absent
    from the injected table null-route, exactly like a failed decode (F5
    isolation), so every downstream mm_ operator — neardup banding,
    feature joins, aggregations — runs unchanged whichever side of the
    seam produced the features. Payload bytes never enter this path."""
    cols = [f.name for f in schema.fields]
    missing = [c for c in cols if c not in precomputed.columns]
    if missing:
        raise ValueError(
            f"precomputed feature table is missing columns {missing}; "
            f"expected {cols}"
        )
    feats = precomputed.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    non_key = [c for c in cols if c != "url"]
    # One row per url, enforced: a duplicate url in the injected table
    # would otherwise fan one corpus row into N output rows through the
    # left join, breaking the 1-row-per-input contract the decode
    # kernels guarantee downstream (neardup banding, feature joins).
    # Deterministic pick: the struct-min of the feature tuple — a
    # map-side-combinable agg, no window over the feature table.
    feats = (
        feats.groupBy("url")
        .agg(F.min(F.struct(*non_key)).alias("_f"))
        .select("url", *[F.col(f"_f.{c}").alias(c) for c in non_key])
    )
    return df.select("url").join(feats, "url", "left").select("url", *non_key)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("tl_b", T.IntegerType()),
    ]
)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    precomputed: DataFrame | None = None,
) -> DataFrame:
    """REAL pixel decoding — not a stub: uncompressed 24-bpp BMPs decoded
    with numpy (bottom-up row order and 4-byte padding handled), INTEGER
    per-channel mass so the statistics are engine-exact. Compressed
    formats (JPEG/PNG pixels) remain out of scope — no codec libs in the
    container; their METADATA path is `image_dimensions` and the
    perceptual-feature stage stays a declared stub. Anything non-BMP /
    non-24bpp / truncated null-routes (F5 isolation). Stateless 1→1 map
    over the payload scan, zero shuffle.

    ``precomputed`` is the pluggable decode seam: pass a (url, …feature
    columns…) table produced by an external featurizer (PIL/libvips/CLIP
    run where those libs exist) and the decode kernel is bypassed — the
    table is cast/projected to ``IMAGE_FEATURES_SCHEMA`` and left-joined
    to the corpus urls, so downstream consumers run unchanged and the
    in-container codec gap is never load-bearing."""
    import numpy as np

    if precomputed is not None:
        return _from_precomputed(df, precomputed, IMAGE_FEATURES_SCHEMA)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"width": [], "height": [], "n_pixels": [],
                   "sum_b": [], "sum_g": [], "sum_r": [], "tl_b": []}
            for payload in pdf[payload_col]:
                b = bytes(payload or b"")
                vals = (None,) * 7
                try:
                    if len(b) >= 54 and b[:2] == b"BM":
                        off = int.from_bytes(b[10:14], "little")
                        hsz = int.from_bytes(b[14:18], "little")
                        w = int.from_bytes(b[18:22], "little", signed=True)
                        h = int.from_bytes(b[22:26], "little", signed=True)
                        bpp = int.from_bytes(b[28:30], "little")
                        comp = int.from_bytes(b[30:34], "little")
                        if (hsz >= 40 and bpp == 24 and comp == 0
                                and w > 0 and h > 0):
                            row_len = (w * 3 + 3) & ~3
                            need = off + row_len * h
                            if len(b) >= need:
                                a = np.frombuffer(
                                    b, dtype=np.uint8, count=row_len * h,
                                    offset=off,
                                ).reshape(h, row_len)[:, : w * 3]
                                px = a.reshape(h, w, 3).astype(np.int64)
                                s = px.sum(axis=(0, 1))
                                # stored rows are bottom-up: the image's
                                # top-left pixel is the LAST stored row —
                                # this feature certifies the flip, which
                                # order-free channel sums cannot
                                vals = (w, h, w * h,
                                        int(s[0]), int(s[1]), int(s[2]),
                                        int(px[-1, 0, 0]))
                except Exception:
                    vals = (None,) * 7
                for k, v in zip(out, vals):
                    out[k].append(v)
            yield pd.DataFrame(
                {"url": pdf["url"],
                 "width": pd.array(out["width"], dtype="Int32"),
                 "height": pd.array(out["height"], dtype="Int32"),
                 "n_pixels": pd.array(out["n_pixels"], dtype="Int64"),
                 "sum_b": pd.array(out["sum_b"], dtype="Int64"),
                 "sum_g": pd.array(out["sum_g"], dtype="Int64"),
                 "sum_r": pd.array(out["sum_r"], dtype="Int64"),
                 "tl_b": pd.array(out["tl_b"], dtype="Int32")}
            )

    return df.select("url", payload_col).mapInPandas(
        gen, IMAGE_FEATURES_SCHEMA
    )


IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dhash", T.StringType()),
    ]
)


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    precomputed: DataFrame | None = None,
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded BMP pixels —
    the image near-dup fingerprint (Krawetz's dHash, the standard cheap
    perceptual hash): sample a 9×8 grid of integer-luma values, emit one
    bit per horizontal neighbor comparison → 64 bits, returned as a
    64-char '0'/'1' string so downstream algebra is engine-portable
    (no uint64 sign traps).

    Deterministic integer pipeline end to end: image-oriented pixels
    (stored rows are bottom-up — flipped before sampling, same
    orientation contract `image_features`' tl_b certifies), luma =
    (r + 2·g + b) // 4, grid sample at x=(i·w)//9, y=(j·h)//8
    (nearest-neighbor — images smaller than the grid repeat pixels
    rather than needing a resampler; no codec/resize libs in this
    container, declared like the rest of the BMP path). Non-BMP /
    truncated payloads null-route (F5 isolation). Stateless 1→1 map,
    zero shuffle.

    ``precomputed``: the pluggable decode seam (see ``image_features``) —
    an externally-computed (url, width, height, dhash) table bypasses the
    BMP kernel, so ``dhash_neardup_pairs`` and every other consumer runs
    unchanged from real-codec hashes."""
    import numpy as np

    if precomputed is not None:
        return _from_precomputed(df, precomputed, IMAGE_DHASH_SCHEMA)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, hh = [], [], []
            for payload in pdf[payload_col]:
                b = bytes(payload or b"")
                w = h = None
                bits = None
                try:
                    if len(b) >= 54 and b[:2] == b"BM":
                        off = int.from_bytes(b[10:14], "little")
                        hsz = int.from_bytes(b[14:18], "little")
                        w0 = int.from_bytes(b[18:22], "little", signed=True)
                        h0 = int.from_bytes(b[22:26], "little", signed=True)
                        bpp = int.from_bytes(b[28:30], "little")
                        comp = int.from_bytes(b[30:34], "little")
                        if (hsz >= 40 and bpp == 24 and comp == 0
                                and w0 > 0 and h0 > 0):
                            row_len = (w0 * 3 + 3) & ~3
                            if len(b) >= off + row_len * h0:
                                a = np.frombuffer(
                                    b, dtype=np.uint8, count=row_len * h0,
                                    offset=off,
                                ).reshape(h0, row_len)[:, : w0 * 3]
                                img = a.reshape(h0, w0, 3)[::-1].astype(
                                    np.int64
                                )
                                luma = (
                                    img[:, :, 2] + 2 * img[:, :, 1]
                                    + img[:, :, 0]
                                ) // 4
                                ys = (np.arange(8) * h0) // 8
                                xs = (np.arange(9) * w0) // 9
                                s = luma[np.ix_(ys, xs)]
                                d = (s[:, 1:] > s[:, :-1]).astype(np.uint8)
                                bits = "".join(
                                    "1" if v else "0" for v in d.ravel()
                                )
                                w, h = w0, h0
                except Exception:
                    w = h = bits = None
                ws.append(w)
                hs.append(h)
                hh.append(bits)
            yield pd.DataFrame(
                {"url": pdf["url"],
                 "width": pd.array(ws, dtype="Int32"),
                 "height": pd.array(hs, dtype="Int32"),
                 "dhash": pd.array(hh, dtype="string")}
            )

    return df.select("url", payload_col).mapInPandas(gen, IMAGE_DHASH_SCHEMA)


def dhash_neardup_pairs(
    hashes: DataFrame, max_distance: int = 10, bands: int = 4
) -> DataFrame:
    """Image near-dup candidate pairs by Hamming distance over dHash —
    the simhash pigeonhole discipline applied to the perceptual hash:
    the 64-bit string splits into ``bands`` equal slices, candidates
    must share at least one slice EXACTLY (band equi-join, never a
    cross join; pairs within Hamming < ``bands`` are guaranteed caught,
    farther pairs only when a band happens to match — the declared
    recall contract, same as simhash blocking), then the exact Hamming
    distance filters to ``<= max_distance``. All pair algebra is JVM
    column work over slim (url, 64-char hash) rows; plan shape is one
    band shuffle + one id-keyed hash re-join."""
    width = 64 // int(bands)
    h = hashes.filter(F.col("dhash").isNotNull()).select("url", "dhash")
    slices = h.select(
        "url",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring("dhash", i * width + 1, width).alias("val"),
                )
                for i in range(int(bands))
            ])
        ).alias("s"),
    ).select("url", "s.band", "s.val")
    a, b = slices.alias("a"), slices.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.url") < F.col("b.url")),
        )
        .select(
            F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b")
        )
        .distinct()
    )
    ha = h.select(F.col("url").alias("url_a"), F.col("dhash").alias("da"))
    hb = h.select(F.col("url").alias("url_b"), F.col("dhash").alias("db"))
    return (
        cand.join(ha, "url_a")
        .join(hb, "url_b")
        .withColumn(
            "hamming",
            F.expr(
                "size(filter(sequence(1, 64),"
                " i -> substring(da, i, 1) <> substring(db, i, 1)))"
            ).cast("int"),
        )
        .filter(F.col("hamming") <= int(max_distance))
        .select("url_a", "url_b", "hamming")
    )
