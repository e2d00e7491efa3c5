"""Degenerate-input robustness: empty tables, single-turn conversations at
full pyramid depth, identical texts (score exactly 100), all-null payloads."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ssimulacra2_spark.config import CheckSuiteConfig
from ssimulacra2_spark.plans.suite import ValidationSuite

CFG = CheckSuiteConfig(n_buckets=4, min_rows_per_partition=1, num_scales=6)
DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_empty_inputs(spark):
    empty = spark.createDataFrame([], DDL)
    v, x = ValidationSuite(CFG).run(spark, empty, empty)
    assert x.count() == 0
    rows = v.collect()
    assert [r.check_id for r in rows] == ["schema"]  # no partitions exist


def test_single_turn_conversation_full_pyramid(spark):
    one = pd.DataFrame(
        {
            "conv_id": ["a"],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["hello"],
            "tool": [None],
            "ts": pd.to_datetime(["2025-01-01"]).astype("datetime64[us]"),
        }
    )
    df = spark.createDataFrame(one)
    v, x = ValidationSuite(CFG).run(spark, df, df)
    assert x.count() == 0
    assert all(r.passed for r in v.collect())


def _same_frame():
    return pd.DataFrame(
        {
            "conv_id": ["a"] * 5 + ["b"] * 3,
            "turn_idx": pd.array(list(range(5)) + list(range(3)), dtype="int32"),
            "role": ["user"] * 8,
            "text": ["same text"] * 8,
            "tool": [None] * 8,
            "ts": pd.to_datetime(["2025-01-01"] * 8).astype("datetime64[us]"),
        }
    )


def test_identical_texts_score_exactly_100(spark):
    df = spark.createDataFrame(_same_frame())
    v, _ = ValidationSuite(CFG).run(spark, df, df)
    for r in v.filter(F.col("check_id") == "drift_score").collect():
        assert r.score == 100.0


def test_all_null_candidate_texts_flagged(spark):
    ref = spark.createDataFrame(_same_frame())
    nulls = _same_frame()
    nulls["text"] = None
    cand = spark.createDataFrame(nulls)
    v, x = ValidationSuite(CFG).run(spark, ref, cand)
    mism = x.filter((F.col("check_id") == "text_parity") & (F.col("class") == "mismatch"))
    assert mism.count() == 8
    tp = v.filter(F.col("check_id") == "text_parity").collect()
    assert all(not r.passed for r in tp)


def test_binary_parsers_fail_loudly_on_corrupt_payloads():
    """The codec-free parsers must never silently mis-parse: wrong
    signatures, desynced segment lengths, and truncated chunk walks all
    raise (pure-pandas check of the mapInPandas bodies)."""
    import struct

    import pandas as pd
    import pytest

    from ssimulacra2_spark.registry.roundops import (
        _jpeg_parse,
        _jpeg_synthesize,
        _wav_parse,
        _wav_synthesize,
    )

    def run(parse_fn, payloads):
        batch = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
        return list(parse_fn(iter([batch])))

    # valid round trips parse
    dims = pd.DataFrame({"doc_id": [3], "width": [100], "height": [50]})
    jpeg = list(_jpeg_synthesize(iter([dims])))[0]["payload"][0]
    out = run(_jpeg_parse, [jpeg])[0]
    assert (out.width[0], out.height[0]) == (100, 50)
    wdims = pd.DataFrame({"doc_id": [3], "sample_rate": [22050], "n_channels": [2]})
    wav = list(_wav_synthesize(iter([wdims])))[0]["payload"][0]
    out = run(_wav_parse, [wav])[0]
    assert (out.sample_rate[0], out.n_channels[0]) == (22050, 2)

    # corrupt signature
    with pytest.raises(ValueError):
        run(_jpeg_parse, [b"\x00\x00" + jpeg[2:]])
    with pytest.raises(ValueError):
        run(_wav_parse, [b"RIFX" + wav[4:]])
    # desynced segment length (JPEG COM length overwritten)
    bad = bytearray(jpeg)
    bad[22:24] = struct.pack(">H", 9999)
    with pytest.raises(ValueError):
        run(_jpeg_parse, [bytes(bad)])
    # RIFF size field not covering the stream
    badw = bytearray(wav)
    badw[4:8] = struct.pack("<I", 4)
    with pytest.raises(ValueError):
        run(_wav_parse, [bytes(badw)])
    # truncated before the target chunk
    with pytest.raises(ValueError):
        run(_jpeg_parse, [jpeg[:6] + b"\xff\xd9"])


def test_gif_parser_fails_loudly_on_corrupt_payloads():
    """GIF framing: wrong signature, missing GCT flag, desynced sub-block
    length, and trailing garbage all raise; a >255-byte comment must span
    sub-blocks and round-trip its exact length."""
    import pandas as pd
    import pytest

    from ssimulacra2_spark.registry.roundops import _gif_parse, _gif_synthesize

    def run(payloads):
        batch = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
        return list(_gif_parse(iter([batch])))

    # valid round trip; doc_id 287 -> comment 287 bytes = 2 sub-blocks
    dims = pd.DataFrame({"doc_id": [287], "width": [640], "height": [480]})
    gif = list(_gif_synthesize(iter([dims])))[0]["payload"][0]
    out = run([gif])[0]
    assert (out.width[0], out.height[0], out.comment_len[0]) == (640, 480, 287)
    assert out.gct_colors[0] == 1 << (287 % 8 + 1)

    with pytest.raises(ValueError):  # signature
        run([b"GIF87a" + gif[6:]])
    bad = bytearray(gif)
    bad[10] &= 0x7F  # GCT flag cleared but table still present
    with pytest.raises(ValueError):
        run([bytes(bad)])
    # desync the SECOND sub-block's length byte (comment = 287 bytes =
    # a full 255 sub-block + a 32 sub-block): the walk then consumes
    # comment bytes as lengths and must fail loudly, not wrap silently
    bad2 = bytearray(gif)
    bad2[13 + 3 * (1 << (287 % 8 + 1)) + 2 + 1 + 255] = 5
    with pytest.raises(ValueError):
        run([bytes(bad2)])
    with pytest.raises(ValueError):  # trailing garbage after trailer
        run([gif + b"\x00"])


def test_mp4_parser_fails_loudly_on_corrupt_payloads():
    """ISO-BMFF framing: a v1 mvhd round-trips a >2^32 duration through
    the 64-bit path; a corrupted box size, a missing mvhd, an unknown
    top-level box, and a truncated header all raise."""
    import pandas as pd
    import pytest

    from ssimulacra2_spark.registry.roundops import _mp4_parse, _mp4_synthesize

    def run(payloads):
        batch = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
        return list(_mp4_parse(iter([batch])))

    # doc_id 7 -> version 1 (64-bit fields), duration above 2^32
    dims = pd.DataFrame(
        {"doc_id": [7, 6], "timescale": [30000, 25000], "duration": [2**32 + 7007, 6006]}
    )
    blobs = list(_mp4_synthesize(iter([dims])))[0]["payload"]
    out = run(list(blobs))[0]
    assert (out.mvhd_version[0], out.timescale[0], out.duration[0]) == (1, 30000, 2**32 + 7007)
    assert (out.mvhd_version[1], out.timescale[1], out.duration[1]) == (0, 25000, 6006)
    assert out.n_top_boxes[0] == 3 and out.n_top_boxes[1] == 2  # 6 % 3 == 0: no free box

    v1 = bytes(blobs[0])
    bad = bytearray(v1)
    bad[3] += 4  # ftyp declares 4 bytes more than it holds -> walk desyncs
    with pytest.raises(ValueError):
        run([bytes(bad)])
    with pytest.raises(ValueError):  # unknown top-level box type
        run([v1[:4] + b"zzzz" + v1[8:]])
    with pytest.raises(ValueError):  # truncated mid-header
        run([v1[:-5]])
    # moov whose only child is udta (mvhd stripped): build via synthesize
    # then splice moov to contain just the udta child
    import struct

    off = 0
    moov_off = None
    while off < len(v1):
        size = int.from_bytes(v1[off : off + 4], "big")
        if v1[off + 4 : off + 8] == b"moov":
            moov_off = off
        off += size
    udta_size = int.from_bytes(v1[moov_off + 8 : moov_off + 12], "big")
    udta = v1[moov_off + 8 : moov_off + 8 + udta_size]
    no_mvhd = v1[:moov_off] + struct.pack(">I", 8 + len(udta)) + b"moov" + udta
    with pytest.raises(ValueError):
        run([no_mvhd])
