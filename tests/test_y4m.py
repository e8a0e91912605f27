"""Y4M video-container codec (llmops/y4m.py) — the video member of the
real-codec family (PNG l76, JPEG l77, WAV l78, Y4M l79), with seek-
based frame sampling and the shared ValueError dead-letter contract."""

from __future__ import annotations

import pytest

from pyspark_recs.llmops.y4m import (
    decode_y4m,
    encode_y4m,
    frame_geometry,
    parse_header,
    synth_frames,
)


def test_roundtrip_mono_exact():
    frames = synth_frames(7, n_frames=5, side=8)
    w, h, cs, n, lumas = decode_y4m(encode_y4m(8, 8, frames))
    assert (w, h, cs, n) == (8, 8, "mono", 5)
    assert lumas == frames  # uncompressed: exact for any content


def test_sampling_by_seek_picks_every_kth_frame():
    frames = synth_frames(3, n_frames=12, side=16)
    data = encode_y4m(16, 16, frames)
    w, h, cs, n, lumas = decode_y4m(data, sample_every=4)
    assert n == 12 and len(lumas) == 3
    assert lumas == [frames[0], frames[4], frames[8]]
    # k=1 degenerates to full decode
    assert decode_y4m(data, sample_every=1)[4] == frames


def test_planar_chroma_geometries():
    # 4:2:0 carries half a luma plane of chroma; 4:4:4 two full planes
    assert frame_geometry(16, 16, "mono") == (256, 256)
    assert frame_geometry(16, 16, "420") == (384, 256)
    assert frame_geometry(16, 16, "444") == (768, 256)
    f420 = bytes(range(256)) * 1 + b"\x80" * 128
    w, h, cs, n, lumas = decode_y4m(encode_y4m(16, 16, [f420], "420"))
    assert cs == "420" and lumas == [f420[:256]]  # luma plane only


def test_header_variants():
    # C420jpeg aliases 420 plane sizes; C absent defaults to 420;
    # unknown X params are metadata and skipped
    w, h, cs, off = parse_header(
        b"YUV4MPEG2 W4 H2 F30000:1001 Ip A128:117 C420jpeg XYSCSS=420JPEG\nFRAME\n"
    )
    assert (w, h, cs) == (4, 2, "420")
    assert parse_header(b"YUV4MPEG2 W4 H2\n")[2] == "420"
    with pytest.raises(ValueError, match="colorspace"):
        parse_header(b"YUV4MPEG2 W4 H2 C422\n")
    with pytest.raises(ValueError, match="W or H"):
        parse_header(b"YUV4MPEG2 F25:1\n")


def test_truncation_raises_valueerror_at_every_cut_point():
    data = encode_y4m(16, 16, synth_frames(5, n_frames=3))
    for cut in (0, 4, 9, 20, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            decode_y4m(data[:cut])
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not video")
    # frame boundaries are validated even for frames sampling skips
    with pytest.raises(ValueError):
        decode_y4m(data[:-3], sample_every=100)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_y4m(0, 0, [])
    with pytest.raises(ValueError, match="colorspace"):
        encode_y4m(4, 4, [b"\x00" * 16], "422")
    with pytest.raises(ValueError, match="expected"):
        encode_y4m(4, 4, [b"\x00" * 15])


def test_synth_frames_match_oracle_formula():
    # The L79_SQL twin recomputes sampled luma sums from this formula
    for doc_id in (0, 3, 999):
        frames = synth_frames(doc_id)
        want = sum(
            256 * ((doc_id * 13 + f * 29) % 256)
            for f in range(12) if f % 4 == 0
        )
        got = sum(sum(frames[f]) for f in (0, 4, 8))
        assert got == want


def test_decode_video_payloads_dead_letters(spark):
    from pyspark_recs.llmops.multimodal import decode_video_payloads

    good = encode_y4m(16, 16, synth_frames(3))
    df = spark.createDataFrame(
        [(1, good), (2, good[:-100]), (3, b"not video")],
        "doc_id bigint, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in decode_video_payloads(df, sample_every=4).collect()
    }
    frames = synth_frames(3)
    assert rows[1].status == "ok"
    assert (rows[1].width, rows[1].height, rows[1].colorspace) == (
        16, 16, "mono",
    )
    assert (rows[1].n_frames, rows[1].n_sampled) == (12, 3)
    assert rows[1].luma_sum == sum(sum(frames[f]) for f in (0, 4, 8))
    assert rows[2].status == "decode_error" and rows[2].luma_sum is None
    assert rows[3].status == "decode_error"
