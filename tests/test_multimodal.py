"""Image container-header decoder: synthesizer↔parser round trips for
every format, adversarial/malformed payloads, and the actor-pool stage
end-to-end (nulls for corrupt rows, payload dropped)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.functions.multimodal import (
    ImageMetaStage,
    make_bmp,
    make_gif,
    make_jpeg,
    make_png,
    parse_image_header,
)


@pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (640, 480), (65535, 1), (123, 65535)])
def test_header_roundtrip_all_formats(w, h):
    assert parse_image_header(make_png(w, h)) == ("png", w, h, 8)
    assert parse_image_header(make_jpeg(w, h)) == ("jpeg", w, h, 8)
    if w <= 65535 and h <= 65535:
        assert parse_image_header(make_gif(w, h)) == ("gif", w, h, 8)
    assert parse_image_header(make_bmp(w, h)) == ("bmp", w, h, 24)


def test_png_large_dims_and_depth():
    # PNG dims are uint32 BE — beyond the 16-bit formats
    assert parse_image_header(make_png(1_000_000, 2, depth=16)) == (
        "png", 1_000_000, 2, 16)


def test_jpeg_sof_walk_skips_segments():
    # extra APPn/COM/DQT segments before SOF must be walked over; DHT
    # (0xC4) must NOT be mistaken for a frame header
    jp = make_jpeg(321, 123)
    soi, rest = jp[:2], jp[2:]
    com = b"\xff\xfe" + (12).to_bytes(2, "big") + b"0123456789"
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00\x00\x00"
    assert parse_image_header(soi + com + dht + rest) == ("jpeg", 321, 123, 8)


def test_bmp_topdown_negative_height():
    p = bytearray(make_bmp(10, 20))
    p[22:26] = (-20).to_bytes(4, "little", signed=True)
    assert parse_image_header(bytes(p)) == ("bmp", 10, 20, 24)


@pytest.mark.parametrize("payload", [
    b"", b"\x00", b"not an image at all",
    b"\x89PNG\r\n\x1a\n",                      # truncated PNG
    b"\xff\xd8\xff\xd9",                        # JPEG with no SOF
    b"GIF89a" + b"\x01",                        # truncated GIF
    b"BM\x00\x00",                              # truncated BMP
])
def test_malformed_payloads_raise(payload):
    with pytest.raises(ValueError):
        parse_image_header(payload)


def test_image_meta_stage_batch():
    stage = ImageMetaStage()
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "payload": pa.array(
            [make_png(3, 4), make_jpeg(5, 6), make_gif(7, 8), make_bmp(9, 10),
             b"corrupt bytes"],
            type=pa.binary()),
    })
    out = stage(batch).to_pandas()
    assert "payload" not in out.columns
    assert list(out["format"]) == ["png", "jpeg", "gif", "bmp", None]
    assert list(out["width"].astype("Int64")) == [3, 5, 7, 9, None] or (
        out["width"].tolist()[:4] == [3, 5, 7, 9] and np.isnan(out["width"].iloc[4]))
    assert out["height"].tolist()[:4] == [4, 6, 8, 10]
    assert out["bit_depth"].tolist()[:4] == [8, 8, 8, 24]


# ---------------------------------------------------------- audio headers

def test_wav_roundtrip_fields():
    from lucene_solr_ray.functions.multimodal import make_wav, parse_audio_header

    for rate, ch, n, bits in [(8000, 1, 50, 16), (44100, 2, 249, 16),
                              (48000, 2, 1, 8), (22050, 1, 1000, 24)]:
        f, r, c, b, d = parse_audio_header(make_wav(rate, ch, n, bits))
        assert (f, r, c, b) == ("wav", rate, ch, bits)
        assert d == 1000 * n // rate


def test_flac_roundtrip_fields():
    from lucene_solr_ray.functions.multimodal import make_flac, parse_audio_header

    for rate, ch, bits, total in [(44100, 2, 16, 44100), (96000, 8, 24, 7),
                                  (8000, 1, 4, (1 << 36) - 1)]:
        f, r, c, b, d = parse_audio_header(make_flac(rate, ch, bits, total))
        assert (f, r, c, b) == ("flac", rate, ch, bits)
        assert d == 1000 * total // rate


def test_mp3_frame_fields():
    from lucene_solr_ray.functions.multimodal import (
        make_mp3_frame, parse_audio_header)

    for rate, ch in [(44100, 1), (48000, 2), (32000, 2)]:
        f, r, c, b, d = parse_audio_header(make_mp3_frame(rate, ch))
        assert (f, r, c) == ("mp3", rate, ch)
        assert b is None and d is None


def test_audio_parser_rejects_corrupt():
    import pytest as _pytest

    from lucene_solr_ray.functions.multimodal import parse_audio_header

    for bad in [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE",  # no fmt
                b"fLaC\x00\x00", b"\xff\xe0\x00\x00",        # bad version
                b"MThd\x00\x00\x00\x06", b"\x00" * 40]:
        with _pytest.raises(ValueError):
            parse_audio_header(bad)


def test_audio_stage_corrupt_rows_null(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.functions.multimodal import (
        AudioMetaStage, make_wav)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "payload": pa.array(
            [make_wav(16000, 1, 100), b"garbage", make_wav(8000, 2, 10)],
            type=pa.binary()),
    }))
    out = ds.map_batches(AudioMetaStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert out["format"].tolist() == ["wav", None, "wav"]
    assert out["sample_rate"].tolist()[0] == 16000
    assert pd.isna(out["sample_rate"][1])
    assert "payload" not in out.columns


# ---------------------------------------------------------- video headers

def test_mp4_roundtrip_fields():
    from lucene_solr_ray.functions.multimodal import make_mp4, parse_video_header

    for w, h, d, ts in [(1920, 1080, 12345, 1000), (640, 480, 999, 90000),
                        (16, 16, 1, 600), (3840, 2160, 100000, 1000)]:
        f, ww, hh, dd = parse_video_header(make_mp4(w, h, d, timescale=ts))
        assert (f, ww, hh) == ("mp4", w, h)
        # duration round-trips through the timescale conversion exactly
        assert dd == 1000 * (d * ts // 1000) // ts


def test_avi_roundtrip_fields():
    from lucene_solr_ray.functions.multimodal import make_avi, parse_video_header

    for w, h, n, uspf in [(1280, 720, 250, 40000), (320, 240, 100, 33367)]:
        f, ww, hh, dd = parse_video_header(make_avi(w, h, n, uspf))
        assert (f, ww, hh, dd) == ("avi", w, h, uspf * n // 1000)


def test_video_parser_rejects_corrupt():
    import pytest as _pytest

    from lucene_solr_ray.functions.multimodal import parse_video_header

    for bad in [b"", b"\x00\x00\x00\x08ftypisom",      # ftyp only, no moov
                b"RIFF\x00\x00\x00\x04AVI ",            # no avih
                b"\x00" * 24]:
        with _pytest.raises(ValueError):
            parse_video_header(bad)


def test_video_stage_corrupt_rows_null(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.functions.multimodal import VideoMetaStage, make_mp4

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "payload": pa.array([make_mp4(100, 50, 2000), b"junkjunkjunk"],
                            type=pa.binary()),
    }))
    out = ds.map_batches(VideoMetaStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert out["format"].tolist() == ["mp4", None]
    assert out["width"][0] == 100 and pd.isna(out["width"][1])
