"""Multimodal plumbing tests: schema flow, Arrow batching, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logflow.operators.multimodal import (
    fake_features,
    frame_sample,
    media_from_documents,
)
from logflow.sources.tables import load_table

MM_QUERIES = [
    "multimodal_meta_summary",
    "multimodal_frame_sample",
    "multimodal_features",
    "trace_hash_sampling",
    "logscan_grep",
    "multimodal_wav_roundtrip",
    "multimodal_image_resize",
    "multimodal_video_frame_stats",
    "multimodal_color_to_gray",
    "multimodal_audio_frame_energy",
]


@pytest.mark.parametrize("name", MM_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_multimodal_features_liveness(spark, sf_dir):
    """multimodal_features is registered with oracle=None (rows-only at the
    driver): assert schema + row count here, complementing the
    expression-twin value check below."""
    from logflow.queries import load_all

    df = load_all()["multimodal_features"].fn(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "media_id", "kind", "n_bytes", "mean_byte", "feature_dim"
    ]
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert df.count() == n_docs


def test_fake_features_matches_expression_twin(spark, sf_dir):
    """The mapInPandas path must agree with pure-JVM byte statistics."""
    media = media_from_documents(load_table(spark, "documents", sf_dir))
    got = fake_features(media).toPandas().set_index("media_id").sort_index()
    want = (
        media.select(
            "media_id",
            F.length("payload").cast("long").alias("n_bytes"),
            (
                F.aggregate(
                    F.transform(
                        F.sequence(F.lit(1), F.length("payload")),
                        lambda i: F.ascii(F.substring(F.col("payload").cast("string"), i, 1)).cast(
                            "long"
                        ),
                    ),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                ).cast("double")
                / F.length("payload")
            ).alias("mean_byte"),
        )
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert (got["n_bytes"] == want["n_bytes"]).all()
    assert (got["mean_byte"] - want["mean_byte"]).abs().max() < 1e-9


def test_frame_sample_counts(spark):
    df = spark.createDataFrame([(2, "video", b"x" * 200), (5, "video", b"y" * 10)],
                               "media_id long, kind string, payload binary")
    rows = {r.media_id: (r.n_frames, [bytes(f) for f in r.frames]) for r in frame_sample(df).collect()}
    assert rows[2][0] == 3  # 200 // 64
    assert rows[2][1][0] == b"x" * 8
    assert rows[5][0] == 0


def test_synthesized_wav_is_a_real_riff_container(spark, sf_dir):
    """The payload must be an actual RIFF/WAVE file — magic bytes and a
    stdlib-independent header readback — not a fake blob: byte 0-3 'RIFF',
    8-11 'WAVE', and the container round-trips through wave.open."""
    import io
    import wave

    from logflow.operators.multimodal import synthesize_wav
    from logflow.sources.tables import load_table

    ids = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("media_id")
    ).limit(5)
    rows = synthesize_wav(ids).collect()
    assert rows
    for r in rows:
        b = bytes(r.payload)
        assert b[0:4] == b"RIFF" and b[8:12] == b"WAVE"
        with wave.open(io.BytesIO(b), "rb") as w:
            m = r.media_id
            assert w.getframerate() == 8000 + (m % 4) * 4000
            assert w.getnframes() == 400 + (m % 7) * 100
            assert w.getnchannels() == 1 and w.getsampwidth() == 1


def test_decode_wav_raises_on_corrupt_payload(spark):
    """Corrupt media must surface as an error, not silently decode."""
    import pytest as _pytest

    from logflow.operators.multimodal import decode_wav

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a wav file at all"))], "media_id long, payload binary"
    )
    with _pytest.raises(Exception):
        decode_wav(bad).collect()


def test_pgm_truncated_header_raises(spark):
    """A header that ends before its three tokens must raise, not spin."""
    import pytest as _pytest

    from logflow.operators.multimodal import decode_pgm

    bad = spark.createDataFrame(
        [(1, bytearray(b"P5\n16 12"))], "media_id long, payload binary"
    )
    with _pytest.raises(Exception):
        decode_pgm(bad).collect()


def test_wav_decode_handles_16bit_and_rejects_wider(spark):
    """decode_wav must decode 16-bit PCM as signed samples (not raw
    container bytes) and refuse widths it can't decode."""
    import io
    import struct
    import wave

    import pytest as _pytest

    from logflow.operators.multimodal import decode_wav

    def make(width, samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            if width == 2:
                w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
            else:
                w.writeframes(bytes(samples))
        return buf.getvalue()

    s16 = [-1000, 2000, 3000, -4000]
    df = spark.createDataFrame(
        [(1, bytearray(make(2, s16)))], "media_id long, payload binary"
    )
    row = decode_wav(df).collect()[0]
    assert row.sample_width == 2
    assert row.mean_sample == sum(s16) / len(s16)

    wide = spark.createDataFrame(
        [(2, bytearray(make(4, [0, 0])))], "media_id long, payload binary"
    )
    with _pytest.raises(Exception):
        decode_wav(wide).collect()


def test_y4m_non_420_colorspace_rejected(spark):
    import pytest as _pytest

    from logflow.operators.multimodal import decode_y4m_sampled

    payload = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n" + b"FRAME\n" + bytes(48)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    with _pytest.raises(Exception):
        decode_y4m_sampled(df).collect()


def test_y4m_every_k_validated():
    import pytest as _pytest

    from logflow.operators.multimodal import decode_y4m_sampled

    with _pytest.raises(ValueError):
        decode_y4m_sampled(None, every_k=0)


def test_ppm_gray_conversion_is_byte_exact(spark):
    """The P6→P5 luma conversion recomputes exactly in numpy on the raw
    synthesized bytes, and malformed P6 payloads raise."""
    import numpy as np
    import pytest

    from logflow.operators.multimodal import (
        _parse_ppm,
        decode_pgm,
        ppm_to_gray_pgm,
        synthesize_ppm,
    )

    ids = spark.range(0, 8).selectExpr("id AS media_id")
    color = {r.media_id: bytes(r.payload) for r in synthesize_ppm(ids).collect()}
    gray = {
        r.media_id: r.mean_pixel
        for r in decode_pgm(ppm_to_gray_pgm(synthesize_ppm(ids))).collect()
    }
    for m, payload in color.items():
        w, h, _mv, img = _parse_ppm(payload)
        px = img.astype("int64")
        luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        assert gray[m] == int(luma.sum(dtype="int64")) / (w * h)
        assert luma.max() <= 255
    with pytest.raises(ValueError):
        _parse_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)  # wrong magic
    with pytest.raises(ValueError):
        _parse_ppm(b"P6\n4 4\n255\n" + b"\x00" * 10)  # truncated pixels


def test_audio_frame_energy_numpy_replay(spark, sf_dir):
    """Independent numpy replay of the synthesis formula reproduces every
    frame's energy / zero-crossings / rms exactly, and frame counts match
    n_samples // 128 per media."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["multimodal_audio_frame_energy"].fn(spark, sf_dir).toPandas()
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    )
    ids = load_table(spark, "documents", sf_dir).select("doc_id").toPandas()["doc_id"]
    rows = []
    for m in sorted(ids):
        m = int(m)
        n = 400 + (m % 7) * 100
        s = np.array([(m * 31 + i * 17) % 256 for i in range(n)], dtype=np.int64) - 128
        nf = n // 128
        fr = s[: nf * 128].reshape(nf, 128)
        en = (fr * fr).sum(axis=1)
        pos = fr >= 0
        zc = (pos[:, 1:] != pos[:, :-1]).sum(axis=1)
        for f in range(nf):
            rows.append((m, f, int(en[f]), int(zc[f])))
    assert len(rows) == len(pdf)
    got = list(
        pdf[["media_id", "frame_idx", "energy", "zero_crossings"]]
        .itertuples(index=False, name=None)
    )
    assert rows == [tuple(map(int, g)) for g in got]
    assert (pdf["energy"] >= 0).all() and (pdf["zero_crossings"] <= 127).all()


def test_image_histogram_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "multimodal_image_histogram", sf_dir)


def test_image_histogram_partitions_all_pixels(spark, sf_dir):
    """Histogram counts sum to the exact total pixel count of the
    synthesized corpus (independently recomputed from the dims formula)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["multimodal_image_histogram"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, "documents", sf_dir).select("doc_id").toPandas()
    expect = int(
        ((16 + (docs["doc_id"] % 5) * 8) * (12 + (docs["doc_id"] % 3) * 8)).sum()
    )
    assert int(pdf["n_pixels"].sum()) == expect
    assert pdf["bin"].between(0, 15).all()
    assert abs(pdf["share"].sum() - 1.0) <= 1e-4


def test_image_psnr_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "multimodal_image_psnr", sf_dir)


def test_image_psnr_matches_theory(spark, sf_dir):
    """4-bit uniform quantization of a near-uniform luma source has
    MSE close to E[(U%16)^2] = 77.5 (residues 0..15 uniform) and PSNR
    = 10*log10(65025/MSE) — check the reported pair is self-consistent
    and in a sane band."""
    import math

    from logflow.queries import load_all

    row = load_all()["multimodal_image_psnr"].fn(spark, sf_dir).toPandas().iloc[0]
    assert row["sse"] > 0 and row["n_pixels"] > 0
    mse = row["sse"] / row["n_pixels"]
    assert abs(row["mse"] - round(mse, 6)) < 1e-9
    assert 60 <= mse <= 95  # near-uniform residues: E = 77.5
    expect_psnr = 10.0 * math.log10(65025.0 / mse)
    assert abs(row["psnr_db"] - expect_psnr) < 0.01


def test_video_shot_detection_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "multimodal_video_shot_detection", sf_dir)


def test_video_scene_deltas_match_numpy_decode(spark, sf_dir):
    """The byte-level SAD rows must equal a direct numpy recompute from
    the generator formula, and the boundary rule's ledger holds
    (0 <= n_boundaries < n_transitions: the max can't be under the mean
    unless all transitions are equal)."""
    import numpy as np

    from logflow.operators.multimodal import synthesize_y4m, y4m_scene_deltas
    from logflow.queries import load_all
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, "documents", sf_dir)
        .select(F.col("doc_id").alias("media_id"))
        .limit(20)
    )
    got = (
        y4m_scene_deltas(synthesize_y4m(docs))
        .toPandas()
        .sort_values(["media_id", "frame"])
    )
    for r in got.itertuples():
        m, w, h = int(r.media_id), int(r.width), int(r.height)
        i = np.arange(w * h, dtype=np.int64)
        ya = ((m * 11 + (r.frame - 1) * 251 + i) * 7) % 256
        yb = ((m * 11 + r.frame * 251 + i) * 7) % 256
        assert r.sad == int(np.abs(yb - ya).sum())
    pdf = load_all()["multimodal_video_shot_detection"].fn(spark, sf_dir).toPandas()
    assert (pdf["n_transitions"] == pdf["n_frames"] - 1).all()
    assert (pdf["n_boundaries"] >= 0).all()
    assert (pdf["n_boundaries"] < pdf["n_transitions"]).all() or (
        pdf["n_transitions"] == 1
    ).any()
