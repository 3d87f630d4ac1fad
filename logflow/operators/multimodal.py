"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a ``kind`` tag
and a metadata struct — the 100 TB layout where payload bytes stay
columnar (parquet binary, never decoded until an explicit operator asks).

Decode/feature ops run as Arrow-batched ``mapInPandas`` so payload bytes
cross into Python once per batch, not per row.  All three modalities carry
REAL codecs with zero external dependencies: AUDIO via ``synthesize_wav``
/ ``decode_wav`` (genuine RIFF/WAVE containers, stdlib ``wave``), IMAGE
via ``synthesize_pgm`` / ``decode_pgm`` / ``resize_pgm_half`` (genuine
netpbm P5 grayscale containers + a real strided 2× downsample), and VIDEO
via ``synthesize_y4m`` / ``decode_y4m_sampled`` (genuine YUV4MPEG2
streams + real every-k-th frame sampling), each oracle-checked end to
end. Rich-format decode (JPEG/PNG/MP4) is out of scope (PIL/ffmpeg absent
here); ``fake_features`` provides a deterministic stand-in that exercises
the full Spark plumbing, and the netpbm/WAV/Y4M paths above are the real
decode surface.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, mean_byte double, feature_dim long"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media frame (test fixture):
    payload = utf-8 bytes, kind assigned round-robin by id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.length("text").cast("long").alias("content_length"),
        ).alias("meta"),
    )


def fake_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Deterministic stand-in feature extraction over Arrow batches.

    Computes per-payload byte statistics — same batch shape, schema flow,
    and partitioning a real decoder would use (swap the body for
    PIL/torchvision when available).
    """
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "feature_dim": pdf["kind"].map(
                        {"image": 2048, "audio": 512, "video": 4096}
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, frame_len: int = 8) -> DataFrame:
    """'Frame sampling' for video payloads: every n-th byte window, as a
    pure Spark expression (no Python) — the columnar slice pattern."""
    n = (F.length("payload") / every_n_bytes).cast("int")
    make = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.substring(F.col("payload"), (i - 1) * every_n_bytes + 1, frame_len),
    )
    # guard: sequence(1, 0) DESCENDS in Spark — short payloads get no frames
    frames = F.when(n >= 1, make).otherwise(F.array().cast("array<binary>"))
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        frames.alias("frames"),
        F.size(frames).cast("long").alias("n_frames"),
    )


# ---------------------------------------------------------------------------
# REAL codec path: WAV/PCM audio via the Python standard library (no external
# decoder needed — `wave` + BytesIO ship with CPython). This closes the
# "decode is stubbed" gap for the audio modality end-to-end: payloads are
# genuine RIFF/WAVE containers, and decode parses the actual binary format,
# not a stand-in.
# ---------------------------------------------------------------------------

WAV_DECODE_SCHEMA = (
    "media_id long, sample_rate long, n_channels long, sample_width long, "
    "n_frames long, mean_sample double"
)


def synthesize_wav(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic 8-bit mono PCM WAV payloads, one per input id.

    Sample i of media m is ``(m*31 + i*17) % 256`` (unsigned 8-bit PCM),
    frame count ``400 + (m % 7) * 100``, rate ``8000 + (m % 4) * 4000`` —
    pure integer formulas, so any engine can PREDICT the decoded stats
    arithmetically while the payload itself is a real RIFF/WAVE container
    written by the stdlib ``wave`` module. Arrow-batched mapInPandas:
    bytes are built executor-side, never on the driver.
    """
    import io
    import wave

    import pandas as pd

    def synth(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for m in pdf[id_col]:
                m = int(m)
                n = 400 + (m % 7) * 100
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)  # 8-bit PCM (unsigned in WAV)
                    w.setframerate(8000 + (m % 4) * 4000)
                    w.writeframes(bytes((m * 31 + i * 17) % 256 for i in range(n)))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"), "payload": payloads})

    return ids.select(id_col).mapInPandas(synth, "media_id long, payload binary")


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode: parse each payload as a RIFF/WAVE container with
    the stdlib ``wave`` reader — header fields (rate, channels, width,
    frame count) come from the actual chunk structure, and ``mean_sample``
    is the exact-integer-sum over exact-count of the decoded PCM samples —
    ONE IEEE division, emitted RAW (callers round Spark-side with F.round;
    Python round() is half-to-even and banned in pandas UDFs, CLAUDE.md).
    A malformed payload raises, which is the correct behavior for a decode
    operator: corrupt media must surface, not silently zero out."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in
                   ("media_id", "sample_rate", "n_channels", "sample_width",
                    "n_frames", "mean_sample")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    width = w.getsampwidth()
                    frames = w.readframes(w.getnframes())
                    # decode PCM by sample width — summing raw container
                    # bytes would be silently wrong for 16-bit audio
                    # (interleaved lo/hi bytes), violating the "unsupported
                    # media must surface" rule. 8-bit WAV is unsigned,
                    # 16-bit is signed little-endian; channels interleave
                    # and the mean is over all channels' samples.
                    if width == 1:
                        samples = np.frombuffer(frames, dtype=np.uint8)
                    elif width == 2:
                        samples = np.frombuffer(frames, dtype="<i2")
                    else:
                        raise NotImplementedError(
                            f"unsupported WAV sample width {width} (8/16-bit only)"
                        )
                    out["media_id"].append(int(mid))
                    out["sample_rate"].append(w.getframerate())
                    out["n_channels"].append(w.getnchannels())
                    out["sample_width"].append(width)
                    out["n_frames"].append(w.getnframes())
                    # exact integer sum over exact count -> one IEEE division
                    out["mean_sample"].append(
                        int(samples.sum(dtype="int64")) / samples.size
                        if samples.size
                        else 0.0
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, WAV_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image path: PGM (P5, binary grayscale) — a genuine image container
# (readable by PIL/ImageMagick/netpbm) that needs zero external libraries
# to write or parse. Synth → decode → nearest-neighbor resize are all real
# byte-level image operations; stats stay arithmetically predictable so the
# whole path is oracle-checkable.
# ---------------------------------------------------------------------------

PGM_DECODE_SCHEMA = (
    "media_id long, width long, height long, maxval long, mean_pixel double"
)


def synthesize_pgm(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic P5 grayscale images: width ``16 + (m%5)*8``, height
    ``12 + (m%3)*8``, pixel(x,y) = ``((m*7 + y*w + x) * 13) % 256``."""
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for m in pdf[id_col]:
                m = int(m)
                w, h = 16 + (m % 5) * 8, 12 + (m % 3) * 8
                header = f"P5\n{w} {h}\n255\n".encode()
                pixels = bytes(((m * 7 + i) * 13) % 256 for i in range(w * h))
                payloads.append(header + pixels)
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"), "payload": payloads})

    return ids.select(id_col).mapInPandas(synth, "media_id long, payload binary")


def _parse_pgm(payload: bytes):
    """Parse a P5 header (magic, width, height, maxval, raw pixel block);
    raises on malformed input — corrupt media must surface."""
    import numpy as np

    if payload[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    # header = 4 whitespace-separated tokens, then exactly one whitespace
    # byte, then w*h raw bytes
    tokens, pos, tok = [], 2, b""
    while len(tokens) < 3:
        if pos >= len(payload):  # header ends early → raise, don't spin
            raise ValueError("truncated PGM header")
        c = payload[pos:pos + 1]
        pos += 1
        if c.isspace():
            if tok:
                tokens.append(int(tok))
                tok = b""
        else:
            tok += c
    w, h, maxval = tokens
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
    if pixels.size != w * h:
        raise ValueError("truncated pixel block")
    return w, h, maxval, pixels.reshape(h, w)


def decode_pgm(media: DataFrame) -> DataFrame:
    """REAL image decode: parse the P5 container, return header fields and
    the exact-integer pixel mean (raw IEEE quotient; rounding is the
    caller's, Spark-side)."""
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in ("media_id", "width", "height", "maxval", "mean_pixel")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, maxval, img = _parse_pgm(bytes(payload))
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(maxval)
                out["mean_pixel"].append(int(img.sum(dtype="int64")) / (w * h))
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, PGM_DECODE_SCHEMA)


def resize_pgm_half(media: DataFrame) -> DataFrame:
    """REAL nearest-neighbor 2x downsample: decode, stride the pixel
    matrix ``[::2, ::2]``, re-encode as a valid (smaller) P5 payload."""
    import pandas as pd

    def rs(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, maxval, img = _parse_pgm(bytes(payload))
                small = img[::2, ::2]
                sh, sw = small.shape
                payloads.append(f"P5\n{sw} {sh}\n{maxval}\n".encode() + small.tobytes())
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return media.mapInPandas(rs, "media_id long, payload binary")


# ---------------------------------------------------------------------------
# REAL video path: Y4M (YUV4MPEG2), the uncompressed video interchange
# format every ffmpeg/mjpegtools install reads — plain-text stream header,
# then per-frame FRAME markers + raw YUV 4:2:0 planes. Zero external
# dependencies to write or parse; frame SAMPLING (the operation a training
# pipeline actually runs on video) is byte-exact and oracle-predictable.
# ---------------------------------------------------------------------------

Y4M_STATS_SCHEMA = (
    "media_id long, width long, height long, n_frames long, "
    "n_sampled long, mean_y double"
)


def synthesize_y4m(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic YUV4MPEG2 clips: ``16 + (m%3)*8`` × 12 @ 25fps, 4:2:0,
    ``6 + (m%5)`` frames; luma pixel i of frame f is
    ``((m*11 + f*251 + i) * 7) % 256``, chroma neutral (128)."""
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for m in pdf[id_col]:
                m = int(m)
                w, h, nf = 16 + (m % 3) * 8, 12, 6 + (m % 5)
                chroma = bytes([128]) * ((w // 2) * (h // 2))
                parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
                for f in range(nf):
                    parts.append(b"FRAME\n")
                    parts.append(bytes(((m * 11 + f * 251 + i) * 7) % 256 for i in range(w * h)))
                    parts.append(chroma)  # U plane
                    parts.append(chroma)  # V plane
                payloads.append(b"".join(parts))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"), "payload": payloads})

    return ids.select(id_col).mapInPandas(synth, "media_id long, payload binary")


def decode_y4m_sampled(media: DataFrame, every_k: int = 2) -> DataFrame:
    """REAL video decode + frame sampling: parse the YUV4MPEG2 stream
    header (W/H/C420 tags), walk the FRAME markers, and keep every
    ``every_k``-th frame's luma plane — the decode-then-sample pass a
    video training pipeline runs. ``mean_y`` is the exact integer mean
    over the SAMPLED frames' Y bytes, emitted raw (round Spark-side).
    Malformed streams (bad magic, missing FRAME marker, truncated
    planes) raise."""
    import numpy as np
    import pandas as pd

    if every_k < 1:  # fail loud driver-side, not ZeroDivision in a task
        raise ValueError(f"every_k must be >= 1, got {every_k}")

    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in
                   ("media_id", "width", "height", "n_frames", "n_sampled", "mean_y")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                nl = b.index(b"\n")
                header = b[:nl].decode()
                tags = header.split(" ")
                if tags[0] != "YUV4MPEG2":
                    raise ValueError("not a YUV4MPEG2 stream")
                w = h = None
                cspace = "C420"  # the Y4M default when no C tag is present
                for t in tags[1:]:
                    if t.startswith("W"):
                        w = int(t[1:])
                    elif t.startswith("H"):
                        h = int(t[1:])
                    elif t.startswith("C"):
                        cspace = t
                if not w or not h:
                    raise ValueError("missing W/H tags")
                # plane sizes below assume 4:2:0 — any other colorspace
                # (C444, C422, Cmono) would shift every frame offset, so
                # reject it loudly rather than walk garbage
                if cspace not in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
                    raise NotImplementedError(
                        f"unsupported Y4M colorspace {cspace} (4:2:0 only)"
                    )
                frame_bytes = w * h + 2 * (w // 2) * (h // 2)
                pos, ysum, ycount, nf, ns = nl + 1, 0, 0, 0, 0
                while pos < len(b):
                    if b[pos:pos + 6] != b"FRAME\n":
                        raise ValueError("missing FRAME marker")
                    pos += 6
                    if pos + frame_bytes > len(b):
                        raise ValueError("truncated frame planes")
                    if nf % every_k == 0:
                        y = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=pos)
                        ysum += int(y.sum(dtype="int64"))
                        ycount += w * h
                        ns += 1
                    pos += frame_bytes
                    nf += 1
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["n_sampled"].append(ns)
                out["mean_y"].append(ysum / ycount if ycount else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, Y4M_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# REAL color-image path: PPM (netpbm P6), the RGB sibling of the P5 path —
# interleaved R,G,B bytes after the text header. Channel extraction and
# integer luma conversion are the two byte-level ops a multimodal training
# pipeline runs on color images before any model sees them.
# ---------------------------------------------------------------------------

PPM_CHANNEL_SCHEMA = (
    "media_id long, width long, height long, "
    "mean_r double, mean_g double, mean_b double"
)


def synthesize_ppm(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic P6 color images: same dims as the P5 synth, byte
    stream ``b[j] = ((m*7 + j) * 13) % 256`` over the interleaved
    R,G,B,R,G,B,... pixel block (j in 0..3wh-1)."""
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for m in pdf[id_col]:
                m = int(m)
                w, h = 16 + (m % 5) * 8, 12 + (m % 3) * 8
                header = f"P6\n{w} {h}\n255\n".encode()
                pixels = bytes(((m * 7 + j) * 13) % 256 for j in range(3 * w * h))
                payloads.append(header + pixels)
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return ids.select(id_col).mapInPandas(synth, "media_id long, payload binary")


def _parse_ppm(payload: bytes):
    """Parse a P6 header; returns (w, h, maxval, pixels[h, w, 3]).
    Raises on malformed input — corrupt media must surface."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens, pos, tok = [], 2, b""
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos:pos + 1]
        pos += 1
        if c.isspace():
            if tok:
                tokens.append(int(tok))
                tok = b""
        else:
            tok += c
    w, h, maxval = tokens
    pixels = np.frombuffer(payload, dtype=np.uint8, count=3 * w * h, offset=pos)
    if pixels.size != 3 * w * h:
        raise ValueError("truncated pixel block")
    return w, h, maxval, pixels.reshape(h, w, 3)


def decode_ppm_channels(media: DataFrame) -> DataFrame:
    """REAL color decode: parse the P6 container and return exact
    per-channel pixel means (integer sums over exact counts — one IEEE
    division each)."""
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                k: []
                for k in ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _maxval, img = _parse_ppm(bytes(payload))
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                n = w * h
                for ci, col in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[col].append(int(img[:, :, ci].sum(dtype="int64")) / n)
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, PPM_CHANNEL_SCHEMA)


def ppm_to_gray_pgm(media: DataFrame) -> DataFrame:
    """REAL colorspace conversion: integer ITU-R 601 luma
    ``(299R + 587G + 114B) // 1000`` per pixel, re-encoded as a valid P5
    grayscale payload (decodable by decode_pgm) — all-integer so the
    result is byte-exact and oracle-predictable."""
    import pandas as pd

    def conv(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, maxval, img = _parse_ppm(bytes(payload))
                px = img.astype("int64")
                luma = (
                    299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                ) // 1000
                payloads.append(
                    f"P5\n{w} {h}\n{maxval}\n".encode()
                    + luma.astype("uint8").tobytes()
                )
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return media.mapInPandas(conv, "media_id long, payload binary")


def ppm_color_gray_stats(media: DataFrame) -> DataFrame:
    """Fused color pipeline: P6 parse → per-channel means → integer ITU-R
    601 luma → re-encode as a REAL P5 payload → P5 parse → gray mean, all
    in ONE Arrow pass.  Identical codec steps to decode_ppm_channels +
    ppm_to_gray_pgm + decode_pgm composed, without synthesizing the corpus
    twice or joining the two decode branches on media_id (the join was the
    only shuffle in the query — fused, the whole pipeline is map-side)."""
    import pandas as pd

    def stats(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                k: []
                for k in (
                    "media_id",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "mean_gray",
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, maxval, img = _parse_ppm(bytes(payload))
                n = w * h
                px = img.astype("int64")
                luma = (
                    299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                ) // 1000
                # Round-trip through the genuine P5 container so the gray
                # mean is measured from decoded bytes, not the luma array.
                gray_payload = (
                    f"P5\n{w} {h}\n{maxval}\n".encode() + luma.astype("uint8").tobytes()
                )
                gw, gh, _gm, gpix = _parse_pgm(gray_payload)
                if (gw, gh) != (w, h):
                    raise ValueError("gray round-trip dimension mismatch")
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                for ci, col in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[col].append(int(img[:, :, ci].sum(dtype="int64")) / n)
                out["mean_gray"].append(int(gpix.sum(dtype="int64")) / n)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        stats,
        "media_id long, width long, height long, mean_r double, "
        "mean_g double, mean_b double, mean_gray double",
    )


def wav_frame_features(media: DataFrame, frame_len: int = 128) -> DataFrame:
    """Frame-level audio features from REAL WAV payloads: per full frame
    of ``frame_len`` PCM samples, the exact integer energy
    ``sum((s-128)²)`` (8-bit unsigned PCM centers at 128) and the
    zero-crossing count (sign-bit changes of the centered signal) — the
    two features every VAD / audio-quality gate starts from.

    All math is exact int64 on the decoded bytes, so the output is
    bit-identical to any engine that can predict the synthesis formula —
    the audio analog of the PGM/Y4M oracle trick. Trailing partial
    frames are dropped (both sides agree by construction). One
    Arrow-batched map-side pass; a 100 TB corpus fans out per-frame rows
    map-side with zero shuffle. Malformed payloads raise (decode
    operators must surface corruption, never zero it out).
    """
    import io
    import wave

    import numpy as np
    import pandas as pd

    def feats(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in ("media_id", "frame_idx", "energy", "zero_crossings")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    raw = w.readframes(w.getnframes())
                s = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
                nf = len(s) // frame_len
                fr = s[: nf * frame_len].reshape(nf, frame_len)
                energy = (fr * fr).sum(axis=1)
                pos = fr >= 0
                zc = (pos[:, 1:] != pos[:, :-1]).sum(axis=1).astype(np.int64)
                out["media_id"].append(np.full(nf, int(mid), dtype=np.int64))
                out["frame_idx"].append(np.arange(nf, dtype=np.int64))
                out["energy"].append(energy)
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(
                {k: np.concatenate(v) if v else np.array([], dtype=np.int64)
                 for k, v in out.items()}
            )

    return media.select("media_id", "payload").mapInPandas(
        feats, "media_id long, frame_idx long, energy long, zero_crossings long"
    )


def decode_pgm_histogram(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """REAL image decode → per-image luma histogram: parse the P5
    container and bucket pixels into ``n_bins`` equal-width bins
    (bin = pixel // (256 // n_bins)) — exact integer counts, the
    Arrow-batched map-side shape of every decode-and-featurize stage."""
    import pandas as pd

    width = 256 // n_bins

    def dec(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            out = {"media_id": [], "bin": [], "n_pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, img = _parse_pgm(bytes(payload))
                counts = np.bincount(img.ravel() // width, minlength=n_bins)
                for b in range(n_bins):
                    if counts[b]:
                        out["media_id"].append(int(mid))
                        out["bin"].append(b)
                        out["n_pixels"].append(int(counts[b]))
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, "media_id long, bin long, n_pixels long")


def decode_pgm_quantize_sse(media: DataFrame, levels: int = 16) -> DataFrame:
    """REAL image decode → per-image quantization error: parse the P5
    container, quantize pixels to ``levels`` uniform levels (q = (p //
    step) * step, step = 256 // levels) and return the exact integer
    sum of squared errors plus the pixel count — the map-side half of a
    corpus PSNR audit (error = p % step, so sse fits int64 trivially:
    max (step-1)^2 per pixel)."""
    import pandas as pd

    step = 256 // levels

    def dec(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            out = {"media_id": [], "sse": [], "n_pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, img = _parse_pgm(bytes(payload))
                res = (img.ravel().astype(np.int64)) % step
                out["media_id"].append(int(mid))
                out["sse"].append(int((res * res).sum()))
                out["n_pixels"].append(int(img.size))
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, "media_id long, sse long, n_pixels long")


Y4M_SCENE_SCHEMA = (
    "media_id long, width long, height long, n_frames long, "
    "frame long, sad long"
)


def y4m_scene_deltas(media: DataFrame) -> DataFrame:
    """REAL video temporal analysis: decode the YUV4MPEG2 stream and emit
    one row per consecutive-frame transition carrying the exact integer
    SAD (sum of absolute luma differences) — the per-transition signal a
    shot-boundary detector thresholds. Reuses the strict Y4M walk of
    :func:`decode_y4m_sampled` (bad magic / missing FRAME / truncated
    planes raise; 4:2:0 only)."""
    import numpy as np
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {k: [] for k in
                    ("media_id", "width", "height", "n_frames", "frame", "sad")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                nl = b.index(b"\n")
                tags = b[:nl].decode().split(" ")
                if tags[0] != "YUV4MPEG2":
                    raise ValueError("not a YUV4MPEG2 stream")
                w = h = None
                cspace = "C420"
                for t in tags[1:]:
                    if t.startswith("W"):
                        w = int(t[1:])
                    elif t.startswith("H"):
                        h = int(t[1:])
                    elif t.startswith("C"):
                        cspace = t
                if not w or not h:
                    raise ValueError("missing W/H tags")
                if cspace not in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
                    raise NotImplementedError(
                        f"unsupported Y4M colorspace {cspace} (4:2:0 only)"
                    )
                frame_bytes = w * h + 2 * (w // 2) * (h // 2)
                pos, nf = nl + 1, 0
                prev = None
                sads = []
                while pos < len(b):
                    if b[pos:pos + 6] != b"FRAME\n":
                        raise ValueError("missing FRAME marker")
                    pos += 6
                    if pos + frame_bytes > len(b):
                        raise ValueError("truncated frame planes")
                    y = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=pos)
                    if prev is not None:
                        sads.append(
                            int(np.abs(y.astype(np.int64) - prev).sum())
                        )
                    prev = y.astype(np.int64)
                    pos += frame_bytes
                    nf += 1
                for f, sad in enumerate(sads, start=1):
                    rows["media_id"].append(int(mid))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_frames"].append(nf)
                    rows["frame"].append(f)
                    rows["sad"].append(sad)
            yield pd.DataFrame(rows)

    return media.mapInPandas(dec, Y4M_SCENE_SCHEMA)
