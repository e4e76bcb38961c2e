"""Multimodal binary plumbing + Structured-Streaming incremental sync."""

import math

import pytest

from connectors_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    frame_sample,
    register_decoder,
    fake_decode,
)
from connectors_spark.streaming.incremental import (
    run_incremental_batches,
    stream_transcripts,
    streaming_ingest_stats,
)
from connectors_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "aaaabbbb"), (2, "abcdefgh" * 32), (3, "")],
        "doc_id long, text string",
    )
    return attach_fake_media(docs)


def test_media_schema_and_features(spark, media):
    rows = {r.doc_id: r for r in extract_features(media).collect()}
    assert rows["1"].n_bytes == 8
    # 'aaaabbbb': two symbols, p=0.5 -> entropy 1.0
    assert rows["1"].entropy == pytest.approx(1.0)
    assert rows["2"].entropy == pytest.approx(3.0)  # 8 uniform symbols
    assert rows["3"].n_bytes == 0 and rows["3"].entropy == 0.0
    assert rows["1"].mean_byte == pytest.approx(
        (ord("a") * 4 + ord("b") * 4) / 8
    )


def test_decode_stub_raises_without_decoder():
    with pytest.raises(NotImplementedError):
        decode_media("image/png", b"\x89PNG")
    register_decoder("image/png", fake_decode)
    assert list(decode_media("image/png", b"ab")) == [97, 98]


def test_frame_sample(spark, media):
    frames = frame_sample(media, n_frames=4, frame_bytes=16).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc["2"]) == 4
    assert all(len(r.frame) <= 16 for r in by_doc["2"])
    assert "3" not in by_doc  # empty payload -> no frames
    assert [r.frame_idx for r in sorted(by_doc["2"], key=lambda r: r.frame_idx)] == [0, 1, 2, 3]


def test_streaming_incremental_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t1 = synth_transcripts(spark, 10, seed=1)
    t1.write.mode("append").parquet(src)

    seen: list[int] = []

    def on_batch(df, batch_id):
        seen.append(df.count())

    run_incremental_batches(stream_transcripts(spark, src), ckpt, on_batch)
    total1 = sum(seen)
    assert total1 == t1.count()

    # append new files; a rerun must only process the delta (cursor resume)
    t2 = synth_transcripts(spark, 5, seed=2)
    t2.write.mode("append").parquet(src)
    seen.clear()
    run_incremental_batches(stream_transcripts(spark, src), ckpt, on_batch)
    assert sum(seen) == t2.count()


def test_streaming_windowed_stats(spark, tmp_path):
    src = str(tmp_path / "s2")
    synth_transcripts(spark, 20, seed=3).write.mode("append").parquet(src)
    stats = streaming_ingest_stats(stream_transcripts(spark, src))
    q = (
        stats.writeStream.format("memory").queryName("ingest_stats")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2")).start()
    )
    q.awaitTermination()
    # append mode only emits closed windows; completeness is checked via
    # the complete-mode equivalent on the static frame
    static = synth_transcripts(spark, 20, seed=3)
    n_roles = static.select("role").distinct().count()
    assert n_roles >= 2
    got = spark.sql("SELECT sum(n_turns) FROM ingest_stats").first()[0]
    # closed windows only => subset of total
    assert got is None or got <= static.count()


def test_resize_images_shapes_and_determinism(spark):
    """decode(stub) -> nearest-neighbor resize -> raster bytes: output
    shape fixed, math deterministic, batched (no per-row Python UDF)."""
    import numpy as np

    from connectors_spark.operators.multimodal import (
        attach_fake_media, fake_image_decode, resize_images, resize_nearest,
    )

    docs = spark.createDataFrame(
        [("a", "x" * 100), ("b", "hello world"), ("c", "")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in
           resize_images(attach_fake_media(docs), out_w=8, out_h=8).collect()}
    assert set(out) == {"a", "b"}  # empty payload skipped
    for r in out.values():
        assert r.width == 8 and r.height == 8 and len(r.pixels) == 64

    # resize math twin: engine output == direct NumPy on the same bytes
    content = b"x" * 100
    w = int(np.ceil(np.sqrt(100)))  # 10
    h = int(np.ceil(100 / w))       # 10
    img = fake_image_decode(content, w, h)
    exp = resize_nearest(img, 8, 8).astype(np.uint8).tobytes()
    assert out["a"].pixels == exp


def test_resize_nearest_index_math():
    import numpy as np

    from connectors_spark.operators.multimodal import resize_nearest

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    # corners map to corners under nearest-neighbor
    assert up[0, 0] == img[0, 0] and up[7, 7] == img[3, 3]
    down = resize_nearest(img, 2, 2)
    assert down.tolist() == [[0, 2], [8, 10]]


def test_stateful_streaming_error_monitor(spark, tmp_path):
    """applyInPandasWithState ErrorMonitor: per-stream state (consecutive
    errors, total, circular window) carries ACROSS micro-batches via the
    streaming checkpoint; tripped latches once a threshold fires."""
    import datetime

    from connectors_spark.streaming.stateful import streaming_error_monitor

    src = str(tmp_path / "ev_src")
    ckpt = str(tmp_path / "ev_ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def mk(rows):
        base = datetime.datetime(2025, 1, 1)
        return spark.createDataFrame(
            [(i, base + datetime.timedelta(seconds=i), u, et)
             for i, (u, et) in enumerate(rows)], schema,
        )

    def run_batch(df):
        df.write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        out = {}

        def sink(bdf, _bid):
            for r in bdf.collect():
                out[r.user_id] = r

        q = (streaming_error_monitor(stream, max_consecutive=3,
                                     window_size=10, max_rate=1.0)
             .writeStream.foreachBatch(sink)
             .outputMode("update").trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
        q.awaitTermination()
        return out

    # batch 1: user 1 ends on 2 consecutive errors (under the limit of 3)
    got = run_batch(mk([(1, "ok"), (1, "error"), (1, "error"),
                        (2, "ok"), (2, "ok")]))
    assert got[1].consec == 2 and got[1].total_errors == 2
    assert not got[1].tripped and not got[2].tripped

    # batch 2: two more errors CONTINUE the streak across the batch
    # boundary -> 4 consecutive > 3 -> tripped; user 2 stays clean
    got = run_batch(mk([(1, "error"), (1, "error"), (2, "ok")]))
    assert got[1].consec == 4 and got[1].total_errors == 4
    assert got[1].tripped
    assert got[2].n_ops == 3 and not got[2].tripped

    # batch 3: success resets consec but tripped stays latched
    got = run_batch(mk([(1, "ok")]))
    assert got[1].consec == 0 and got[1].tripped


def test_ppm_decoder_roundtrip_and_resize(spark):
    """REAL image decode (uncompressed Netpbm, pure NumPy): encode ->
    decode round-trips exactly, comments/gray variants parse, and
    resize_images runs the REGISTERED decoder (use_fake_decoder=False)
    end to end — the r2 'codec registry still stubbed' boundary now
    covers every uncompressed format."""
    import numpy as np
    from pyspark.sql import functions as F

    from connectors_spark.operators.multimodal import (
        decode_media, decode_ppm, encode_ppm, resize_images,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(5, 9), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)
    # comment in header parses
    with_comment = b"P5\n# a comment\n2 2\n255\n" + bytes([1, 2, 3, 4])
    assert decode_ppm(with_comment).tolist() == [[1, 2], [3, 4]]
    assert np.array_equal(
        decode_media("image/x-portable-graymap", encode_ppm(gray)), gray)

    rows = [("g1", "image/x-portable-graymap", bytearray(encode_ppm(gray)),
             (9, 5, None, None))]
    media = spark.createDataFrame(
        rows,
        "doc_id string, media_type string, content binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>",
    )
    out = resize_images(media, out_w=4, out_h=4,
                        use_fake_decoder=False).collect()
    assert len(out) == 1 and out[0].width == 4 and len(out[0].pixels) == 16
    # deterministic: same input -> same raster
    again = resize_images(media, out_w=4, out_h=4,
                          use_fake_decoder=False).collect()
    assert out[0].pixels == again[0].pixels


def test_wav_pcm_decoder_and_audio_features(spark):
    """REAL audio decode (RIFF/WAVE PCM16, pure NumPy): round-trip,
    stereo shape, and the Arrow-batched audio feature extractor (rms /
    zero-cross / frame energy) over the registered decoder."""
    import numpy as np
    from connectors_spark.operators.multimodal import (
        audio_features, decode_wav_pcm, encode_wav_pcm,
    )

    t = np.arange(1600)
    tone = (10_000 * np.sin(2 * np.pi * 440 * t / 16_000)).astype(np.int16)
    stereo = np.stack([tone, (tone // 2)], axis=1)
    wav = encode_wav_pcm(stereo, sample_rate=16_000)
    back = decode_wav_pcm(wav)
    assert back.shape == (1600, 2) and np.array_equal(back, stereo)

    silence = encode_wav_pcm(np.zeros(800, dtype=np.int16))
    rows = [
        ("a1", "audio/wav", bytearray(wav), (None, None, 16_000, 100)),
        ("a2", "audio/wav", bytearray(silence), (None, None, 16_000, 50)),
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id string, media_type string, content binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>",
    )
    got = {r.doc_id: r for r in audio_features(media).collect()}
    assert got["a1"].n_samples == 1600 and got["a1"].n_channels == 2
    assert got["a1"].rms > 0.1 and got["a1"].zero_cross_rate > 0.01
    assert got["a2"].rms == 0.0 and got["a2"].zero_cross_rate == 0.0
    # compressed codecs remain a declared boundary
    import pytest as _pytest
    from connectors_spark.operators.multimodal import decode_media
    with _pytest.raises(NotImplementedError):
        decode_media("image/jpeg", b"\xff\xd8\xff")


def test_stateful_streaming_sessionize(spark, tmp_path):
    """Gap-based sessions carry state ACROSS micro-batches: a batch-2
    event within the gap extends the live session; one past the gap
    seals the previous session (closed=True) and opens session 1."""
    import datetime

    from connectors_spark.streaming.stateful import streaming_sessionize

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    schema = "event_id long, ts timestamp, user_id long, value double"
    base = datetime.datetime(2025, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [(i, base + datetime.timedelta(minutes=m), u, v)
             for i, (u, m, v) in enumerate(rows)], schema,
        )

    def run_batch(df):
        df.write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        out = []

        def sink(bdf, _bid):
            out.extend(bdf.collect())

        q = (streaming_sessionize(stream, gap_minutes=30)
             .writeStream.foreachBatch(sink)
             .outputMode("update").trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
        q.awaitTermination()
        return out

    # batch 1: user 1 at minutes 0 and 10 -> one live session
    got = run_batch(mk([(1, 0, 2.0), (1, 10, 3.0)]))
    live = [r for r in got if r.user_id == 1]
    assert len(live) == 1 and not live[0].closed
    assert live[0].n_events == 2 and live[0].duration_sec == 600
    assert live[0].total_value == 5.0

    # batch 2: minute 25 extends session 0 (gap 15 < 30); minute 90
    # seals it and opens session 1
    got = run_batch(mk([(1, 25, 1.0), (1, 90, 7.0)]))
    sealed = [r for r in got if r.closed]
    live = [r for r in got if not r.closed]
    assert len(sealed) == 1 and sealed[0].session_no == 0
    assert sealed[0].n_events == 3 and sealed[0].duration_sec == 1500
    assert sealed[0].total_value == 6.0
    assert len(live) == 1 and live[0].session_no == 1
    assert live[0].n_events == 1 and live[0].total_value == 7.0


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    from connectors_spark.streaming.incremental import streaming_dedup

    src = str(tmp_path / "dsrc")
    t = synth_transcripts(spark, 8, seed=11)
    t.write.mode("append").parquet(src)
    # re-deliver a subset as a SECOND file: at-least-once delivery
    t.limit(30).write.mode("append").parquet(src)

    # watermark must cover the synth ts span: micro-batch file order is
    # arbitrary, and rows below the watermark are dropped as LATE (the
    # correct streaming contract) — here we test the dedup contract,
    # so pick a horizon wider than the data
    out = streaming_dedup(
        stream_transcripts(spark, src, max_files_per_trigger=1),
        watermark="400 days")
    q = (
        out.writeStream.format("memory").queryName("dedup_sink")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dck")).start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT conv_id, turn_idx, count(*) AS c FROM dedup_sink "
        "GROUP BY conv_id, turn_idx HAVING count(*) > 1").count()
    assert got == 0, "re-delivered keys must dedup across micro-batches"
    n = spark.sql("SELECT count(*) FROM dedup_sink").first()[0]
    assert n == t.count(), "every distinct key survives exactly once"


def test_bmp_roundtrip_and_layouts():
    import numpy as np
    from connectors_spark.operators.multimodal import (
        decode_bmp, decode_media, encode_bmp)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)  # odd width: pad
    blob = encode_bmp(img)
    back = decode_bmp(blob)
    assert back.shape == (5, 3, 3) and (back == img).all()
    # registry dispatch
    assert (decode_media("image/bmp", blob) == img).all()
    # top-down variant (negative height, no row flip)
    td = bytearray(blob)
    td[22:26] = (-5).to_bytes(4, "little", signed=True)
    rows = bytearray()
    row_bytes = (3 * 3 + 3) & ~3
    for r in range(5):
        rows += img[r, :, ::-1].tobytes() + b"\x00" * (row_bytes - 9)
    td[54:] = rows
    assert (decode_bmp(bytes(td)) == img).all()


def test_bmp_rejects_compressed_and_truncated():
    import numpy as np
    import pytest as _pytest
    from connectors_spark.operators.multimodal import decode_bmp, encode_bmp

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(img))
    blob[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with _pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(blob))
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(img)[:-5])
    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"JUNK")


def test_wav_mulaw_decode_known_vectors():
    import numpy as np
    from connectors_spark.operators.multimodal import decode_wav_pcm

    # ITU-T G.711 reference points: 0x00 -> -32124, 0x80 -> +32124,
    # 0xFF / 0x7F -> 0
    codes = bytes([0x00, 0x80, 0xFF, 0x7F])
    body = (b"fmt " + (18).to_bytes(4, "little")
            + (7).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
            + (0).to_bytes(2, "little"))
    data = b"data" + len(codes).to_bytes(4, "little") + codes
    riff = (b"RIFF" + (4 + len(body) + len(data)).to_bytes(4, "little")
            + b"WAVE" + body + data)
    out = decode_wav_pcm(riff)
    assert out.dtype == np.int16 and out.shape == (4, 1)
    assert out[:, 0].tolist() == [-32124, 32124, 0, 0]
