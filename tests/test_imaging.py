"""Pure-stdlib PNG codec (operators/imaging.py) + real multimodal paths."""

import struct
import zlib

import numpy as np
import pytest

from patternly_spark.operators.imaging import (
    UnsupportedImageError,
    decode_png,
    grid_features,
    resize_nearest,
)
from patternly_spark.pfsa.draw import encode_png


def _png(ihdr_fields, chunks):
    out = b"\x89PNG\r\n\x1a\n"
    payload = struct.pack(">IIBBBBB", *ihdr_fields)
    for tag, body in [(b"IHDR", payload)] + chunks + [(b"IEND", b"")]:
        out += struct.pack(">I", len(body)) + tag + body
        out += struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    return out


def test_rgb_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_filters_1_to_4():
    # encode with each filter type explicitly and check reconstruction
    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3) * 3
    for ftype in (1, 2, 3, 4):
        rows = []
        prev = np.zeros(12, dtype=np.int32)
        for r in range(5):
            line = img[r].reshape(-1).astype(np.int32)
            enc = line.copy()
            for i in range(12):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                if ftype == 1:
                    enc[i] = (line[i] - left) % 256
                elif ftype == 2:
                    enc[i] = (line[i] - prev[i]) % 256
                elif ftype == 3:
                    enc[i] = (line[i] - ((left + prev[i]) >> 1)) % 256
                else:
                    p = left + prev[i] - ul
                    pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (prev[i] if pb <= pc else ul)
                    enc[i] = (line[i] - pred) % 256
            rows.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
            prev = line
        raw = zlib.compress(b"".join(rows))
        png = _png((4, 5, 8, 2, 0, 0, 0), [(b"IDAT", raw)])
        assert (decode_png(png) == img).all(), f"filter {ftype}"


def test_gray_palette_rgba():
    # gray (type 0)
    gray = np.array([[0, 128], [255, 64]], dtype=np.uint8)
    raw = zlib.compress(b"".join(b"\x00" + gray[r].tobytes() for r in range(2)))
    png = _png((2, 2, 8, 0, 0, 0, 0), [(b"IDAT", raw)])
    out = decode_png(png)
    assert out.shape == (2, 2, 3) and (out[0, 1] == 128).all()
    # palette (type 3)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = zlib.compress(b"".join(b"\x00" + idx[r].tobytes() for r in range(2)))
    png = _png((2, 2, 8, 3, 0, 0, 0), [(b"PLTE", plte), (b"IDAT", raw)])
    out = decode_png(png)
    assert (out[0, 0] == [255, 0, 0]).all() and (out[1, 0] == [0, 0, 255]).all()
    # RGBA (type 6): alpha dropped
    rgba = np.dstack([np.full((2, 2), 9, np.uint8)] * 3 + [np.full((2, 2), 7, np.uint8)])
    raw = zlib.compress(b"".join(b"\x00" + rgba[r].tobytes() for r in range(2)))
    png = _png((2, 2, 8, 6, 0, 0, 0), [(b"IDAT", raw)])
    assert (decode_png(png) == 9).all()


def test_unsupported_rejected():
    with pytest.raises(UnsupportedImageError, match="signature"):
        decode_png(b"JFIF not a png")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    png16 = bytearray(encode_png(img))
    png16[24] = 16  # bit depth byte in IHDR
    with pytest.raises(UnsupportedImageError, match="depth"):
        decode_png(bytes(png16))


def test_resize_and_features():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, 4:] = 255  # left black, right white
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert (small[:, :2] == 0).all() and (small[:, 2:] == 255).all()
    f = grid_features(img, grid=2)
    assert f.shape == (4,)
    assert f[0] == 0.0 and f[1] == 1.0 and f[2] == 0.0 and f[3] == 1.0


def test_spark_png_codec_paths(spark):
    from patternly_spark.operators.multimodal import extract_features, resize_images

    imgs = []
    for mid in range(4):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:, : 2 * mid] = 255  # varying white fraction
        imgs.append((mid, "image", encode_png(img), "image/png", 8, 8, None))
    media = spark.createDataFrame(
        imgs,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, dim=4, codec="png").collect()
    }
    # mean brightness rises with media_id (2*mid white columns of 8)
    means = [float(np.mean(feats[m])) for m in range(4)]
    assert means == sorted(means) and means[0] == 0.0
    assert abs(means[2] - 0.5) < 1e-6

    resized = resize_images(media, width=4, height=4, codec="png").collect()
    for r in resized:
        assert r["width"] == 4 and r["height"] == 4
        out = decode_png(bytes(r["payload"]))
        assert out.shape == (4, 4, 3)


def test_wav_roundtrip_and_features():
    from patternly_spark.operators.audio import (
        UnsupportedAudioError,
        decode_wav,
        encode_wav,
        rms_windows,
        zero_crossing_rate,
    )

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=100, dtype=np.int16)
    payload = encode_wav(samples, sample_rate=8000)
    got, rate = decode_wav(payload)
    assert rate == 8000 and (got == samples.astype(np.int32)).all()

    # constant-amplitude clip: RMS equals the amplitude everywhere
    const = np.full(64, 1000, dtype=np.int16)
    f = rms_windows(decode_wav(encode_wav(const))[0], 8)
    assert np.allclose(f, 1000.0)
    # alternating-sign clip: zcr = 1
    alt = np.array([500, -500] * 32, dtype=np.int16)
    assert zero_crossing_rate(alt.astype(np.int32)) == 1.0
    assert zero_crossing_rate(const.astype(np.int32)) == 0.0

    with pytest.raises(UnsupportedAudioError):
        decode_wav(b"not a wav at all")


def test_wav_stereo_to_mono():
    import io
    import wave

    from patternly_spark.operators.audio import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        # L=100, R=200 interleaved -> mono (100+200)//2 = 150
        w.writeframes(np.array([100, 200] * 10, dtype="<i2").tobytes())
    mono, rate = decode_wav(buf.getvalue())
    assert rate == 16000 and (mono == 150).all() and len(mono) == 10


def test_spark_wav_codec_path(spark):
    from patternly_spark.operators.audio import encode_wav
    from patternly_spark.operators.multimodal import extract_features

    rows = []
    for mid, amp in enumerate((0, 100, 1000, 30000)):
        samples = np.full(64, amp, dtype=np.int16)
        rows.append((mid, "audio", encode_wav(samples), "audio/wav", None, None, 4))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, dim=8, codec="wav").collect()
    }
    for mid, amp in enumerate((0, 100, 1000, 30000)):
        assert np.allclose(feats[mid], float(amp)), mid


def _toy_image(seed: int, h: int = 32, w: int = 32):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # smooth gradients so dhash has structure to latch on to
    gx = np.linspace(0, 255, w, dtype=np.uint8)
    base[:, :, 0] = gx[None, :]
    return base


def test_image_dhash_identical_and_noised(spark):
    import numpy as np

    from patternly_spark.operators.multimodal import image_dhash
    from patternly_spark.pfsa.draw import encode_png

    img = _toy_image(1)
    noised = img.copy()
    noised[5, 7, 2] ^= 3  # one-pixel tweak
    other = _toy_image(99)
    other[:, :, 0] = 255 - other[:, :, 0]  # reversed gradient
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(encode_png(img))),
        (3, bytearray(encode_png(noised))),
        (4, bytearray(encode_png(other))),
        (5, bytearray(b"not a png at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in image_dhash(df).collect()}
    assert out[1]["ok"] and out[1]["dhash"] == out[2]["dhash"]
    # one-pixel noise: tiny hamming distance
    d13 = bin((out[1]["dhash"] ^ out[3]["dhash"]) & ((1 << 64) - 1)).count("1")
    assert d13 <= 4
    # reversed gradient: far away
    d14 = bin((out[1]["dhash"] ^ out[4]["dhash"]) & ((1 << 64) - 1)).count("1")
    assert d14 > 16
    # undecodable payload reported, not dropped
    assert out[5]["ok"] is False and out[5]["dhash"] is None
    assert "PNG" in out[5]["err"] or "png" in out[5]["err"]


def test_image_neardup_pairs_complete_and_precise(spark):
    from patternly_spark.operators.multimodal import image_dhash, image_neardup_pairs
    from patternly_spark.pfsa.draw import encode_png

    imgs = {1: _toy_image(1), 3: _toy_image(7)}
    noised = imgs[1].copy()
    noised[3, 3, 1] ^= 2
    imgs[2] = noised
    other = _toy_image(50)
    other[:, :, 0] = 255 - other[:, :, 0]
    imgs[4] = other
    rows = [(k, bytearray(encode_png(v))) for k, v in sorted(imgs.items())]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in image_neardup_pairs(df, max_hamming=4).collect()}
    # brute-force truth from the hashes themselves (completeness check)
    hs = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    want = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
            if d <= 4:
                want[(a, b)] = d
    assert got == want and (1, 2) in got


def test_audio_energy_hash_identical_noised_and_bad(spark):
    import numpy as np

    from patternly_spark.operators.audio import encode_wav
    from patternly_spark.operators.multimodal import audio_energy_hash

    rng = np.random.default_rng(5)
    clip = (rng.integers(-2000, 2000, size=256) * np.linspace(0.2, 3.0, 256)).astype(
        "<i2"
    )
    noised = clip.copy()
    noised[100] += 7
    silence_then_loud = np.concatenate(
        [np.zeros(128, dtype="<i2"), np.full(128, 8000, dtype="<i2")]
    )
    rows = [
        (1, bytearray(encode_wav(clip))),
        (2, bytearray(encode_wav(clip))),
        (3, bytearray(encode_wav(noised))),
        (4, bytearray(encode_wav(silence_then_loud))),
        (5, bytearray(b"RIFFgarbage")),
        (6, bytearray(encode_wav(np.zeros(4, dtype="<i2")))),  # too short
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_energy_hash(df, frames=32).collect()}
    assert out[1]["ok"] and out[1]["ehash"] == out[2]["ehash"]
    assert out[1]["n_samples"] == 256
    d13 = bin(out[1]["ehash"] ^ out[3]["ehash"]).count("1")
    assert d13 <= 2
    d14 = bin(out[1]["ehash"] ^ out[4]["ehash"]).count("1")
    assert d14 >= 5
    assert out[5]["ok"] is False and out[5]["ehash"] is None
    assert out[6]["ok"] is False and "frames" in out[6]["err"]


def test_audio_energy_hash_python_replay(spark):
    import numpy as np

    from patternly_spark.operators.audio import encode_wav
    from patternly_spark.operators.multimodal import audio_energy_hash

    samples = np.arange(-50, 78, dtype="<i2")  # 128 samples
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples)))], "media_id long, payload binary"
    )
    got = audio_energy_hash(df, frames=16).collect()[0]["ehash"]
    s = samples.astype(np.int64)
    en = [int((s[i * 8:(i + 1) * 8] ** 2).sum()) for i in range(16)]
    want = 0
    for a, b in zip(en, en[1:]):
        want = (want << 1) | int(b > a)
    assert got == want


def test_neardup_band_width_guard(spark):
    """max_hamming+1 bands must fit in the hash: a zero-width band would
    collapse every block value to 0 and cross-product the corpus."""
    from patternly_spark.operators.multimodal import image_neardup_pairs
    from patternly_spark.streaming.multimodal import streaming_image_dedup_registry

    df = spark.createDataFrame([(1, bytearray(b""))], "media_id long, payload binary")
    with pytest.raises(ValueError, match="max_hamming"):
        image_neardup_pairs(df, hash_size=2, max_hamming=4)
    with pytest.raises(ValueError, match="max_hamming"):
        streaming_image_dedup_registry(
            df, "/tmp/x", "/tmp/y", checkpoint_path="/tmp/z",
            hash_size=2, max_hamming=4,
        )


def test_streaming_image_dedup_registry_equals_batch(spark, tmp_path):
    from patternly_spark.operators.multimodal import image_neardup_pairs
    from patternly_spark.streaming.multimodal import (
        streaming_image_dedup_registry,
    )
    from patternly_spark.pfsa.draw import encode_png

    base = _toy_image(1)
    n1 = base.copy(); n1[2, 2, 0] ^= 2          # near-dup of base
    n2 = base.copy(); n2[4, 6, 1] ^= 1          # near-dup, arrives later
    far = _toy_image(9); far[:, :, 0] = 255 - far[:, :, 0]
    b0 = [(1, bytearray(encode_png(base))), (2, bytearray(encode_png(n1))),
          (5, bytearray(encode_png(far)))]
    b1 = [(3, bytearray(encode_png(n2))), (4, bytearray(encode_png(far))),
          (1, bytearray(encode_png(base)))]   # id 1 re-sent: idempotent
    schema = "media_id long, payload binary"
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    q = streaming_image_dedup_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "registry"),
        str(tmp_path / "pairs"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_hamming=4,
        trigger_once=True,
    )
    q.awaitTermination(180)

    from patternly_spark.streaming.exactly_once import read_appended, read_registry

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in read_appended(spark, str(tmp_path / "pairs")).collect()
    }
    allm = spark.createDataFrame(b0 + b1[:2], schema)  # each id once
    want = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(allm, max_hamming=4).collect()
    }
    assert got == want
    assert (1, 3) in got and (4, 5) in got  # cross-batch pairs found
    reg = read_registry(spark, str(tmp_path / "registry"))
    assert reg.count() == 5  # id 1 stored once despite the re-send
