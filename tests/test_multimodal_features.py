"""Multimodal feature-extraction plumbing: payload → deterministic feature
vector → ANN search over the extracted features (the full decode→embed→
search composition a real multimodal pipeline runs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.operators import similarity
from economic_data_etl_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from economic_data_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestFeatureExtraction:
    def test_deterministic_fixed_dim(self, spark):
        docs = load_table(spark, SF_DIR, "documents").limit(50)
        feats1 = extract_features(attach_binary_payload(docs), dim=16)
        feats2 = extract_features(attach_binary_payload(docs), dim=16)
        assert feats1.schema["features"].dataType.simpleString() == "array<float>"
        r1 = {r["doc_id"]: r["features"] for r in feats1.collect()}
        r2 = {r["doc_id"]: r["features"] for r in feats2.collect()}
        assert r1 == r2
        assert all(len(v) == 16 for v in r1.values())

    def test_resize_opaque_lane_shrinks_by_factor(self, spark):
        # text payloads are not decodable media: the documented
        # degraded lane byte-block-averages them
        from economic_data_etl_spark.operators.multimodal import resize_media

        docs = load_table(spark, SF_DIR, "documents").limit(30)
        resized = resize_media(attach_binary_payload(docs), factor=4)
        rows = resized.collect()
        assert rows
        for r in rows:
            assert r["media_kind"] == "opaque"
            assert r["resized_bytes"] == -(-r["orig_bytes"] // 4)  # ceil div
            assert len(r["resized"]) == r["resized_bytes"]

    def test_resize_image_lane_is_exact_pixel_space(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from economic_data_etl_spark.operators.codecs import (
            decode_png,
            encode_png,
        )
        from economic_data_etl_spark.operators.multimodal import resize_media
        from economic_data_etl_spark.operators.resize import box_resize_exact

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (40, 28)).astype(np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(encode_png(img)))], "doc_id long, payload binary"
        ).withColumn("payload", F.col("payload").cast("binary"))
        row = resize_media(df, factor=4).first()
        assert row["media_kind"] == "image"
        out = decode_png(bytes(row["resized"]))
        assert np.array_equal(out, box_resize_exact(img, 10, 7))

    def test_resize_audio_and_video_lanes(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            decode_wav,
            encode_mjpeg_avi,
            encode_wav,
        )
        from economic_data_etl_spark.operators.multimodal import resize_media

        samples = np.arange(-100, 100, dtype=np.int16)
        frames = [
            np.full((16, 24), c, np.uint8) for c in (10, 10, 200)
        ]
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_wav(samples, 8000))),
                (2, bytearray(encode_mjpeg_avi(frames))),
            ],
            "doc_id long, payload binary",
        ).withColumn("payload", F.col("payload").cast("binary"))
        rows = {r["doc_id"]: r for r in resize_media(df, factor=2).collect()}
        assert rows[1]["media_kind"] == "audio"
        rate, dec = decode_wav(bytes(rows[1]["resized"]))
        assert rate == 4000 and dec.shape[0] == 100
        # group means of consecutive pairs (floor)
        want = (
            samples.astype(np.int64).reshape(-1, 2).sum(axis=1) // 2
        ).astype(np.int16)
        assert np.array_equal(dec[:, 0], want)
        assert rows[2]["media_kind"] == "video"
        small = decode_mjpeg_avi(bytes(rows[2]["resized"]))
        assert len(small) == 3 and small[0].shape == (8, 12)

    def test_resize_audio_8bit_and_float_lanes(self, spark):
        # 8-bit PCM decodes to offset-binary uint8 (midpoint 128) and
        # float32 decodes to [-1, 1]: both must be rescaled into the
        # int16 domain before decimation. The old path kept the raw
        # 0..255 values (DC-offset, 1/256-amplitude output) and would
        # integer-truncate every float sample to zero.
        import struct

        import numpy as np
        from pyspark.sql import functions as F

        from economic_data_etl_spark.operators.codecs import decode_wav
        from economic_data_etl_spark.operators.multimodal import (
            resize_media,
        )

        def wav_raw(data: bytes, fmt_tag: int, bits: int, rate: int):
            fmt = struct.pack(
                "<IHHIIHH", 16, fmt_tag, 1, rate,
                rate * (bits // 8), bits // 8, bits,
            )
            return (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )

        u8 = np.arange(0, 200, dtype=np.uint8)
        f32 = (np.sin(np.arange(200) * 0.1) * 0.5).astype("<f4")
        df = spark.createDataFrame(
            [
                (1, bytearray(wav_raw(u8.tobytes(), 1, 8, 8000))),
                (2, bytearray(wav_raw(f32.tobytes(), 3, 32, 8000))),
            ],
            "doc_id long, payload binary",
        ).withColumn("payload", F.col("payload").cast("binary"))
        rows = {
            r["doc_id"]: r for r in resize_media(df, factor=2).collect()
        }
        assert rows[1]["media_kind"] == "audio"
        _, dec8 = decode_wav(bytes(rows[1]["resized"]))
        want8 = (
            ((u8.astype(np.int64) - 128) * 256).reshape(-1, 2).sum(1)
            // 2
        ).astype(np.int16)
        assert np.array_equal(dec8[:, 0], want8)
        assert rows[2]["media_kind"] == "audio"
        _, decf = decode_wav(bytes(rows[2]["resized"]))
        scaled = np.clip(
            np.rint(f32.astype(np.float64) * 32767.0), -32768, 32767
        ).astype(np.int64)
        wantf = (scaled.reshape(-1, 2).sum(1) // 2).astype(np.int16)
        assert np.array_equal(decf[:, 0], wantf)
        # the old float path truncated everything to zero
        assert np.abs(decf[:, 0].astype(np.int64)).max() > 10000

    def test_feature_lanes_are_content_features(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from economic_data_etl_spark.operators.codecs import (
            encode_mjpeg_avi,
            encode_png,
            encode_wav,
        )
        from economic_data_etl_spark.operators.jpeg import (
            encode_jpeg_gray,
        )
        from economic_data_etl_spark.operators.audiofeat import (
            bin_centered_tone,
        )
        from economic_data_etl_spark.operators.multimodal import (
            extract_features,
        )

        rng = np.random.default_rng(0)
        img = np.repeat(
            np.repeat(rng.integers(0, 256, (8, 8)), 8, 0), 8, 1
        ).astype(np.uint8)
        other = np.repeat(
            np.repeat(rng.integers(0, 256, (8, 8)), 8, 0), 8, 1
        ).astype(np.uint8)
        rows = [
            (1, bytearray(encode_png(img))),
            (2, bytearray(encode_jpeg_gray(img))),  # re-encoded copy
            (3, bytearray(encode_png(other))),
            (4, bytearray(encode_wav(bin_centered_tone(5, 64, 4), 8000))),
            (5, bytearray(encode_wav(bin_centered_tone(29, 64, 4), 8000))),
            (6, bytearray(encode_mjpeg_avi([img, other]))),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary"
        ).withColumn("payload", F.col("payload").cast("binary"))
        feats = {
            r["doc_id"]: np.array(r["features"])
            for r in extract_features(df, dim=16).collect()
        }

        def cos(a, b):
            return float(np.dot(a, b))

        # a re-encoded copy of the SAME image embeds almost on top of
        # the original; a different texture lands measurably away
        assert cos(feats[1], feats[2]) > 0.999
        assert cos(feats[1], feats[3]) < cos(feats[1], feats[2])
        # distinct tones produce distinct spectral embeddings
        assert cos(feats[4], feats[5]) < 0.9
        # video embeds by its first frame — which passed through the
        # lossy MJPEG path, so near-identical to the PNG lane, not
        # bit-equal
        assert cos(feats[6], feats[1]) > 0.999

    def test_features_feed_ann_search(self, spark):
        docs = load_table(spark, SF_DIR, "documents").limit(100)
        feats = extract_features(attach_binary_payload(docs), dim=16)
        corpus = feats.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
            "features", "embedding"
        )
        queries = corpus.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), "embedding"
        )
        topk = similarity.brute_force_topk(corpus, queries, k=5).collect()
        assert len(topk) == 15  # 3 queries x top-5
        assert all(1 <= r["rank"] <= 5 for r in topk)


class TestContainerHeaderParsing:
    """parse_container_header is REAL format parsing (struct unpacks of
    PNG/GIF/BMP/WAV headers), not a stub — pin it against hand-built
    reference byte strings and adversarial inputs."""

    def test_reference_png_bytes(self):
        import struct

        from economic_data_etl_spark.operators.multimodal import (
            parse_container_header,
        )

        # 640x480 PNG header exactly as a real encoder writes it
        png = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", 640, 480)
            + bytes([8, 2, 0, 0, 0])
            + b"\xd4\x92\xbcm"
        )
        m = parse_container_header(png)
        assert (m["format"], m["width"], m["height"]) == ("png", 640, 480)

    def test_reference_wav_bytes(self):
        import struct

        from economic_data_etl_spark.operators.multimodal import (
            parse_container_header,
        )

        wav = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        )
        m = parse_container_header(wav)
        assert (m["format"], m["sample_rate"], m["channels"]) == (
            "wav", 44100, 2,
        )

    def test_bmp_negative_height_topdown(self):
        import struct

        from economic_data_etl_spark.operators.multimodal import (
            parse_container_header,
        )

        # top-down BMPs store negative height; parser reports magnitude
        bmp = (
            b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
            + struct.pack("<I", 40) + struct.pack("<ii", 800, -600)
        )
        m = parse_container_header(bmp)
        assert (m["format"], m["width"], m["height"]) == ("bmp", 800, 600)

    def test_corrupt_and_truncated_are_data_not_exceptions(self):
        from economic_data_etl_spark.operators.multimodal import (
            parse_container_header,
        )

        for junk in (b"", b"\x89PNG\r\n", b"RIFFxxxx", b"GIF89a\x01",
                     b"BM\x00", b"\x00" * 100):
            assert parse_container_header(junk)["format"] == "unknown"

    def test_builder_parser_roundtrip_all_formats(self):
        from economic_data_etl_spark.operators.multimodal import (
            build_sample_container,
            parse_container_header,
        )

        for d in range(256):
            m = parse_container_header(build_sample_container(d))
            assert m["format"] == ["png", "gif", "bmp", "wav"][d % 4]
            if m["format"] == "wav":
                assert m["sample_rate"] == 8000 + (d % 8) * 1000
                assert m["channels"] == 1 + d % 2
            else:
                assert m["width"] == 16 + d % 64
                assert m["height"] == 16 + (d // 64) % 64

    def test_parser_never_raises_on_fuzzed_bytes(self):
        """Corrupt payloads are data, not exceptions: the parser must
        classify arbitrary byte soup — including truncated magic
        prefixes — without raising."""
        import random

        from economic_data_etl_spark.operators.multimodal import (
            build_sample_container,
            parse_container_header,
        )

        rng = random.Random(42)
        magics = [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"RIFF", b""]
        for _ in range(500):
            base = rng.choice(magics)
            n = rng.randrange(0, 40)
            payload = base + bytes(rng.randrange(256) for _ in range(n))
            payload = payload[: rng.randrange(0, len(payload) + 1)]
            m = parse_container_header(payload)
            assert m["format"] in {"png", "gif", "bmp", "wav", "unknown"}
        # truncating a VALID container at every prefix length never raises
        for d in (0, 1, 2, 3):
            full = build_sample_container(d)
            for i in range(len(full)):
                parse_container_header(full[:i])


class TestSampledVideoFrames:
    def test_sampled_equals_subset_of_full_decode(self, spark):
        """sample_video_frames must return exactly the every-Nth subset
        of the full decode — the container-level seek changes COST, not
        answers."""
        import numpy as np

        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
        )
        from economic_data_etl_spark.operators.multimodal import (
            sample_video_frames,
        )

        payloads = []
        for d in (0, 1, 2):
            frames = [
                block_constant_pattern(d + f, 24, 16) for f in range(5)
            ]
            payloads.append((d, bytearray(encode_mjpeg_avi(frames))))
        df = spark.createDataFrame(
            [(d, bytes(p)) for d, p in payloads],
            "doc_id long, payload binary",
        )
        got = {
            (r.doc_id, r.frame_idx, r.val_sum)
            for r in sample_video_frames(df, every_n=2).collect()
        }
        want = set()
        for d, p in payloads:
            for idx, frame in enumerate(decode_mjpeg_avi(bytes(p))):
                if idx % 2 == 0:
                    want.add(
                        (d, idx, int(frame.astype(np.int64).sum()))
                    )
        assert got == want
        assert len(got) == 9  # 3 docs x frames 0,2,4

    def test_max_frames_caps_output(self, spark):
        from economic_data_etl_spark.operators.codecs import (
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
        )
        from economic_data_etl_spark.operators.multimodal import (
            sample_video_frames,
        )

        payload = encode_mjpeg_avi(
            [block_constant_pattern(f, 16, 16) for f in range(6)]
        )
        df = spark.createDataFrame(
            [(1, payload)], "doc_id long, payload binary"
        )
        rows = sample_video_frames(df, every_n=1, max_frames=2).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 1]
