"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, exactly the
pattern the index treats the ``html`` column with (SURVEY.md §1.2).
Decode/feature kernels are actor-pool ``map_batches`` stages loading their
codec once per actor. Two tiers ship here:

- **ImageMetaStage** — a REAL pure-Python container-header decoder
  (PNG IHDR / JPEG SOFn segment walk / GIF logical-screen descriptor /
  BMP DIB header): format, width, height, bit depth, with matching
  byte-exact synthesizers for fixtures. No external libs needed.
- **MediaDecodeStage** — full pixel/sample decode + feature extraction;
  the kernel body remains stubbed (clearly marked) because PIL/ffmpeg/
  soundfile are NOT in this container, while the Ray-side plumbing —
  schema, batch sizing for large binary payloads, actor signature,
  output layout — is real and tested.

Batch-size note (SURVEY.md §7.4.4 / ray_guide "Memory-aware"): binary
payload stages must use a SMALL ``batch_size`` (payload_bytes × batch ×
concurrency must fit the worker heap) and ``batch_format="pyarrow"``
(binary columns don't survive pandas round-trips untouched).
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "binary_meta_batch", "MediaDecodeStage", "SUGGESTED_BINARY_BATCH_SIZE",
    "parse_image_header", "ImageMetaStage",
    "make_png", "make_jpeg", "make_gif", "make_bmp",
    "parse_audio_header", "AudioMetaStage",
    "make_wav", "make_flac", "make_mp3_frame",
    "parse_video_header", "VideoMetaStage",
    "make_mp4", "make_avi",
]

SUGGESTED_BINARY_BATCH_SIZE = 64  # rows per batch for multi-MB payloads


def binary_meta_batch(batch: pa.Table, bin_col: str = "payload") -> pa.Table:
    """Typed metadata for an opaque binary column: byte length (one Arrow
    kernel) + sha1 (per-row by necessity — the digest reads every byte),
    no decode."""
    import pyarrow.compute as pc

    col = batch[bin_col]
    n_bytes = pc.cast(pc.binary_length(col), pa.int64())
    sha1 = [hashlib.sha1(p).hexdigest() for p in col.to_pylist()]
    return batch.append_column("n_bytes", n_bytes).append_column(
        "sha1", pa.array(sha1, type=pa.string())
    )


def parse_image_header(p: bytes) -> Tuple[str, int, int, int]:
    """(format, width, height, bit_depth) from raw image bytes — a pure
    container-header walk, no pixel decode, no external libraries.

    - PNG: 8-byte signature, then the IHDR chunk (width/height uint32 BE,
      bit-depth byte).
    - JPEG: SOI then a segment walk to the first frame header SOF0-SOF15
      (skipping DHT/JPG/DAC, standalone markers and fill bytes); height/
      width uint16 BE, precision byte.
    - GIF: GIF87a/GIF89a signature + logical screen descriptor (uint16
      LE), bit depth from the packed color-resolution field.
    - BMP: 'BM' + BITMAPINFOHEADER (int32 LE, height may be negative for
      top-down rows), bit depth uint16 LE.
    Raises ValueError for unrecognized containers."""
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        if len(p) < 25 or p[12:16] != b"IHDR":
            raise ValueError("truncated PNG header")
        w = int.from_bytes(p[16:20], "big")
        h = int.from_bytes(p[20:24], "big")
        return "png", w, h, p[24]
    if p[:2] == b"\xff\xd8":
        i = 2
        n = len(p)
        while i + 1 < n:
            if p[i] != 0xFF:
                break
            marker = p[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
                continue
            if i + 4 > n:
                break
            seglen = int.from_bytes(p[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    break
                precision = p[i + 4]
                h = int.from_bytes(p[i + 5 : i + 7], "big")
                w = int.from_bytes(p[i + 7 : i + 9], "big")
                return "jpeg", w, h, precision
            i += 2 + seglen
        raise ValueError("no JPEG SOF frame header found")
    if p[:6] in (b"GIF87a", b"GIF89a"):
        if len(p) < 11:
            raise ValueError("truncated GIF header")
        w = int.from_bytes(p[6:8], "little")
        h = int.from_bytes(p[8:10], "little")
        return "gif", w, h, (p[10] & 0x07) + 1
    if p[:2] == b"BM":
        if len(p) < 30:
            raise ValueError("truncated BMP header")
        w = int.from_bytes(p[18:22], "little", signed=True)
        h = abs(int.from_bytes(p[22:26], "little", signed=True))
        return "bmp", w, h, int.from_bytes(p[28:30], "little")
    raise ValueError("unrecognized image container")


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big") + tag + data
        + zlib.crc32(tag + data).to_bytes(4, "big")
    )


def make_png(w: int, h: int, depth: int = 8) -> bytes:
    """Structurally valid minimal PNG (signature + IHDR + empty IDAT +
    IEND, real CRCs) — fixture for the header decoder."""
    import zlib

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, 0, 0, 0, 0])  # grayscale, deflate, adaptive, none
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b""))
        + _png_chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int, precision: int = 8) -> bytes:
    """Minimal JPEG: SOI + JFIF APP0 + SOF0 frame header + EOI."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof = (
        bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 0x11, 0x11, 0])  # one component
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
        + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
        + b"\xff\xd9"
    )


def make_gif(w: int, h: int) -> bytes:
    """Minimal GIF89a: header + screen descriptor (256-entry GCT → bit
    depth 8) + global color table + trailer."""
    return (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0xF7, 0, 0])  # GCT present, 8-bit color resolution
        + b"\x00" * (256 * 3)
        + b"\x3b"
    )


def make_bmp(w: int, h: int, depth: int = 24) -> bytes:
    """Minimal BMP: file header + BITMAPINFOHEADER (no pixel data)."""
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + depth.to_bytes(2, "little")
        + b"\x00" * 24
    )
    return b"BM" + (14 + len(dib)).to_bytes(4, "little") + b"\x00" * 8 + dib


class ImageMetaStage:
    """REAL actor-pool image decode stage (container headers): one batch
    of binary payloads → format/width/height/bit_depth columns via
    ``parse_image_header``. Unrecognized payloads surface as nulls (a
    crawl batch must not die on one corrupt file); the payload column is
    dropped post-decode. Stateless beyond construction, but kept a
    callable CLASS so the wiring matches the heavier codec stages
    (SURVEY.md §2.4: setup once per actor, work per batch)."""

    def __init__(self, bin_col: str = "payload", drop_payload: bool = True):
        self.bin_col = bin_col
        self.drop_payload = drop_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts, ws, hs, ds = [], [], [], []
        for p in batch[self.bin_col].to_pylist():
            try:
                f, w, h, d = parse_image_header(p)
            except (ValueError, IndexError):
                f, w, h, d = None, None, None, None
            fmts.append(f)
            ws.append(w)
            hs.append(h)
            ds.append(d)
        out = batch.drop_columns([self.bin_col]) if self.drop_payload else batch
        return (
            out.append_column("format", pa.array(fmts, type=pa.string()))
            .append_column("width", pa.array(ws, type=pa.int64()))
            .append_column("height", pa.array(hs, type=pa.int64()))
            .append_column("bit_depth", pa.array(ds, type=pa.int64()))
        )


# MPEG1 Layer III tables (frame header indices → kbps / Hz)
_MP3_BITRATE_V1L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, None)
_MP3_RATE_V1 = (44100, 48000, 32000, None)


def parse_audio_header(p: bytes):
    """(format, sample_rate, channels, bits_per_sample, duration_ms)
    from raw audio bytes — pure container-header walks, no sample
    decode, no external libraries (the audio sibling of
    ``parse_image_header``).

    - WAV: RIFF/WAVE chunk walk to 'fmt ' (channels/rate/block-align
      uint LE) and 'data' (size → sample count → duration).
    - FLAC: 'fLaC' + STREAMINFO — rate 20 bits, channels-1 3 bits,
      bits-1 5 bits, total samples 36 bits in one 8-byte BE word.
    - MP3: first MPEG1 Layer III frame header — sync, sample-rate and
      channel-mode fields; bits/duration are None (frame formats carry
      no per-sample width, and duration needs the whole stream).
    Raises ValueError for unrecognized containers."""
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        i, n = 12, len(p)
        rate = channels = bits = block_align = data_size = None
        while i + 8 <= n:
            cid = p[i:i + 4]
            size = int.from_bytes(p[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 24 <= n:
                channels = int.from_bytes(p[i + 10:i + 12], "little")
                rate = int.from_bytes(p[i + 12:i + 16], "little")
                block_align = int.from_bytes(p[i + 20:i + 22], "little")
                bits = int.from_bytes(p[i + 22:i + 24], "little")
            elif cid == b"data":
                data_size = size
            if rate is not None and data_size is not None:
                break
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None:
            raise ValueError("WAV without fmt chunk")
        dur = None
        if data_size is not None and block_align:
            dur = int(1000 * (data_size // block_align) // rate)
        return "wav", rate, channels, bits, dur
    if p[:4] == b"fLaC":
        if len(p) < 26:
            raise ValueError("truncated FLAC STREAMINFO")
        # block header (4B) + min/max blocksize (4B) + min/max frame (6B)
        word = int.from_bytes(p[18:26], "big")
        rate = word >> 44
        channels = ((word >> 41) & 0x7) + 1
        bits = ((word >> 36) & 0x1F) + 1
        total = word & ((1 << 36) - 1)
        dur = int(1000 * total // rate) if rate else None
        return "flac", rate, channels, bits, dur
    if len(p) >= 4 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0:
        version = (p[1] >> 3) & 0x3
        layer = (p[1] >> 1) & 0x3
        if version != 3 or layer != 1:  # MPEG1 Layer III only
            raise ValueError("unsupported MPEG frame variant")
        rate = _MP3_RATE_V1[(p[2] >> 2) & 0x3]
        if rate is None:
            raise ValueError("reserved MP3 sample-rate index")
        mode = (p[3] >> 6) & 0x3
        return "mp3", rate, (1 if mode == 3 else 2), None, None
    raise ValueError("unrecognized audio container")


def make_wav(rate: int, channels: int, n_samples: int,
             bits: int = 16) -> bytes:
    block = channels * (bits // 8)
    data = bytes(n_samples * block)  # silence
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")            # PCM
           + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little")
           + bits.to_bytes(2, "little"))
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def make_flac(rate: int, channels: int, bits: int,
              total_samples: int) -> bytes:
    word = ((rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36)
            | (total_samples & ((1 << 36) - 1)))
    streaminfo = ((4096).to_bytes(2, "big") * 2      # min/max blocksize
                  + bytes(6)                          # min/max frame size
                  + word.to_bytes(8, "big")
                  + bytes(16))                        # md5
    return (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
            + streaminfo)


def make_mp3_frame(rate: int, channels: int,
                   bitrate_kbps: int = 128) -> bytes:
    sr_idx = _MP3_RATE_V1.index(rate)
    br_idx = _MP3_BITRATE_V1L3.index(bitrate_kbps)
    mode = 3 if channels == 1 else 0
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), mode << 6])
    return hdr + bytes(128)  # one (truncated) frame body


class AudioMetaStage:
    """Actor-pool audio header decode — one batch of binary payloads →
    format/sample_rate/channels/bits/duration_ms columns via
    ``parse_audio_header``; corrupt rows surface as nulls, payloads
    dropped post-decode (same wiring contract as ImageMetaStage)."""

    def __init__(self, bin_col: str = "payload", drop_payload: bool = True):
        self.bin_col = bin_col
        self.drop_payload = drop_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {"format": [], "sample_rate": [], "channels": [],
                "bits": [], "duration_ms": []}
        for p in batch[self.bin_col].to_pylist():
            try:
                f, r, c, b, d = parse_audio_header(p)
            except (ValueError, IndexError):
                f = r = c = b = d = None
            cols["format"].append(f)
            cols["sample_rate"].append(r)
            cols["channels"].append(c)
            cols["bits"].append(b)
            cols["duration_ms"].append(d)
        out = (batch.drop_columns([self.bin_col]) if self.drop_payload
               else batch)
        out = out.append_column(
            "format", pa.array(cols["format"], type=pa.string()))
        for name in ("sample_rate", "channels", "bits", "duration_ms"):
            out = out.append_column(
                name, pa.array(cols[name], type=pa.int64()))
        return out


def parse_video_header(p: bytes):
    """(format, width, height, duration_ms) from raw video bytes — pure
    container walks (no frame decode): the video sibling of the image/
    audio parsers.

    - MP4/ISO-BMFF: top-level box walk to 'moov', then a child walk to
      'mvhd' (timescale + duration, version 0 uint32 / version 1
      uint64) and the first 'trak'→'tkhd' (width/height as 16.16 fixed
      point at the box tail).
    - AVI: 'RIFF'+'AVI ' → 'hdrl' LIST → 'avih' (dwMicroSecPerFrame,
      dwTotalFrames, dwWidth, dwHeight — all uint32 LE).
    Raises ValueError for unrecognized containers."""
    if len(p) >= 12 and p[4:8] == b"ftyp":
        def boxes(buf, i, end):
            while i + 8 <= end:
                size = int.from_bytes(buf[i:i + 4], "big")
                tag = buf[i + 4:i + 8]
                body = i + 8
                if size == 1:  # 64-bit largesize
                    if i + 16 > end:
                        return
                    size = int.from_bytes(buf[i + 8:i + 16], "big")
                    body = i + 16
                elif size == 0:  # to end of enclosing box
                    size = end - i
                if size < 8 or i + size > end:
                    return
                yield tag, body, i + size
                i += size

        dur_ms = w = h = None
        for tag, b0, b1 in boxes(p, 0, len(p)):
            if tag != b"moov":
                continue
            for t2, c0, c1 in boxes(p, b0, b1):
                if t2 == b"mvhd" and dur_ms is None:
                    ver = p[c0]
                    if ver == 1:
                        ts = int.from_bytes(p[c0 + 20:c0 + 24], "big")
                        dur = int.from_bytes(p[c0 + 24:c0 + 32], "big")
                    else:
                        ts = int.from_bytes(p[c0 + 12:c0 + 16], "big")
                        dur = int.from_bytes(p[c0 + 16:c0 + 20], "big")
                    if ts:
                        dur_ms = int(1000 * dur // ts)
                elif t2 == b"trak" and w is None:
                    for t3, d0, d1 in boxes(p, c0, c1):
                        if t3 == b"tkhd":
                            # width/height: last 8 bytes, 16.16 fixed
                            w = int.from_bytes(p[d1 - 8:d1 - 4],
                                               "big") >> 16
                            h = int.from_bytes(p[d1 - 4:d1], "big") >> 16
                            break
            if dur_ms is None and w is None:
                raise ValueError("moov without mvhd/tkhd")
            return "mp4", w, h, dur_ms
        raise ValueError("no moov box found")
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        i, n = 12, len(p)
        while i + 8 <= n:
            cid = p[i:i + 4]
            size = int.from_bytes(p[i + 4:i + 8], "little")
            if cid == b"LIST" and p[i + 8:i + 12] == b"hdrl":
                j = i + 12
                while j + 8 <= i + 8 + size:
                    c2 = p[j:j + 4]
                    s2 = int.from_bytes(p[j + 4:j + 8], "little")
                    if c2 == b"avih" and j + 8 + 40 <= n:
                        us_pf = int.from_bytes(p[j + 8:j + 12], "little")
                        frames = int.from_bytes(p[j + 24:j + 28], "little")
                        w = int.from_bytes(p[j + 40:j + 44], "little")
                        h = int.from_bytes(p[j + 44:j + 48], "little")
                        dur = (us_pf * frames // 1000) if us_pf else None
                        return "avi", w, h, dur
                    j += 8 + s2 + (s2 & 1)
            i += 8 + size + (size & 1)
        raise ValueError("AVI without avih header")
    raise ValueError("unrecognized video container")


def _box(tag: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + tag + body


def make_mp4(w: int, h: int, duration_ms: int,
             timescale: int = 1000) -> bytes:
    dur = duration_ms * timescale // 1000
    mvhd = (bytes(1) + bytes(3)            # version 0 + flags
            + bytes(8)                     # ctime/mtime
            + timescale.to_bytes(4, "big")
            + dur.to_bytes(4, "big")
            + bytes(80))                   # rate/volume/matrix/next_track
    tkhd = (bytes(4) + bytes(16)           # ver/flags, times, track id...
            + bytes(56)                    # duration/reserved/matrix
            + (w << 16).to_bytes(4, "big")
            + (h << 16).to_bytes(4, "big"))  # 16.16 fixed, 84-byte v0 body
    moov = _box(b"moov", _box(b"mvhd", mvhd)
                + _box(b"trak", _box(b"tkhd", tkhd)))
    return _box(b"ftyp", b"isom" + bytes(4) + b"isom") + moov


def make_avi(w: int, h: int, n_frames: int,
             us_per_frame: int = 40000) -> bytes:
    avih = (us_per_frame.to_bytes(4, "little")
            + bytes(12)                    # max bytes/sec, padding, flags
            + n_frames.to_bytes(4, "little")
            + bytes(12)                    # initial frames, streams, bufsz
            + w.to_bytes(4, "little")
            + h.to_bytes(4, "little")
            + bytes(16))
    hdrl = b"hdrl" + b"avih" + len(avih).to_bytes(4, "little") + avih
    body = b"AVI " + b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
    return b"RIFF" + len(body).to_bytes(4, "little") + body


class VideoMetaStage:
    """Actor-pool video header decode — binary payloads → format/width/
    height/duration_ms via ``parse_video_header``; corrupt rows null,
    payload dropped (same wiring contract as Image/AudioMetaStage)."""

    def __init__(self, bin_col: str = "payload", drop_payload: bool = True):
        self.bin_col = bin_col
        self.drop_payload = drop_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {"format": [], "width": [], "height": [], "duration_ms": []}
        for p in batch[self.bin_col].to_pylist():
            try:
                f, w, h, d = parse_video_header(p)
            except (ValueError, IndexError):
                f = w = h = d = None
            cols["format"].append(f)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["duration_ms"].append(d)
        out = (batch.drop_columns([self.bin_col]) if self.drop_payload
               else batch)
        out = out.append_column(
            "format", pa.array(cols["format"], type=pa.string()))
        for name in ("width", "height", "duration_ms"):
            out = out.append_column(
                name, pa.array(cols[name], type=pa.int64()))
        return out


class MediaDecodeStage:
    """Actor-pool decode/feature stage. Real plumbing, stubbed kernel.

    Usage: ``ds.map_batches(MediaDecodeStage,
    fn_constructor_kwargs={"kind": "image", "fake": True},
    batch_format="pyarrow", batch_size=SUGGESTED_BINARY_BATCH_SIZE,
    concurrency=N, num_cpus=1)``.

    ``fake=True`` produces a deterministic feature vector derived from the
    payload hash (for pipeline tests); ``fake=False`` raises
    NotImplementedError at the decode call — the marked integration point
    for PIL/ffmpeg/soundfile when available. The REAL header-level image
    decoder (no external libs) is ``ImageMetaStage`` above.
    """

    FEATURE_DIM = 16

    def __init__(self, kind: str = "image", bin_col: str = "payload", fake: bool = True):
        if kind not in ("image", "audio", "video"):
            raise ValueError(kind)
        self.kind = kind
        self.bin_col = bin_col
        self.fake = fake
        # real implementation would load the codec/model HERE, once per actor

    def _decode_features(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                f"{self.kind} decode requires media libraries not present in "
                "this container; wire PIL/ffmpeg here"
            )
        # deterministic fake: 16 bytes of blake2b → float32 in [0, 1)
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 256.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_features(p) for p in batch[self.bin_col].to_pylist()]
        feat_arr = pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))
        out = batch.drop_columns([self.bin_col])  # payload dropped post-decode
        return out.append_column("features", feat_arr)
