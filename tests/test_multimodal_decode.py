"""Real pure-Python multimodal decoders: PGM (P5/P2) and RIFF/WAVE PCM.
Round-trip against the encoders, plus header-edge and malformed-input cases.
"""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.multimodal import (
    PgmDecodeTransformer,
    WavDecodeTransformer,
    decode_pgm,
    decode_wav,
    encode_pgm,
    encode_wav,
)


def test_pgm_p5_roundtrip():
    px = np.arange(48) % 256
    payload = encode_pgm(8, 6, 255, px)
    w, h, mv, out = decode_pgm(payload)
    assert (w, h, mv) == (8, 6, 255)
    np.testing.assert_array_equal(out, px.astype(np.float64))


def test_pgm_16bit_and_comments():
    px = np.arange(12) * 300  # needs 16-bit
    payload = encode_pgm(4, 3, 65535, px)
    w, h, mv, out = decode_pgm(payload)
    assert (w, h, mv) == (4, 3, 65535)
    np.testing.assert_array_equal(out, px.astype(np.float64))
    # P2 ASCII with a comment line
    ascii_pgm = b"P2\n# a comment\n3 2\n255\n1 2 3\n4 5 6\n"
    w, h, mv, out = decode_pgm(ascii_pgm)
    assert (w, h, mv) == (3, 2, 255)
    np.testing.assert_array_equal(out, [1, 2, 3, 4, 5, 6])


def test_pgm_malformed():
    with pytest.raises(ValueError, match="magic"):
        decode_pgm(b"JPEG....")
    with pytest.raises(ValueError, match="truncated"):
        decode_pgm(b"P5\n100 100\n255\nxx")


def test_wav_roundtrip():
    s = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
    payload = encode_wav(44100, 1, s)
    sr, ch, n, samples = decode_wav(payload)
    assert (sr, ch, n) == (44100, 1, 1000)
    np.testing.assert_allclose(samples, s / 32768.0)


def test_wav_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_actor_pool_transform_over_dataset(ray_session):
    ray = pytest.importorskip("ray")
    payloads = [encode_pgm(4, 4, 255, (np.arange(16) * k) % 256) for k in range(1, 9)]
    tbl = pa.table({"pid": pa.array(range(8)), "img": pa.array(payloads, pa.binary())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = PgmDecodeTransformer(input_col="img", output_col="img", batch_size=2, concurrency=(1, 2)).transform(ds)
    df = out.to_pandas().sort_values("pid")
    assert (df["img_width"] == 4).all()
    expect_means = [float(((np.arange(16) * k) % 256).mean()) for k in range(1, 9)]
    np.testing.assert_allclose(df["img_mean"].to_numpy(), expect_means)


def test_wav_transform_table():
    s = np.full(100, 16384, np.int16)
    tbl = pa.table({"wav": pa.array([encode_wav(8000, 1, s)], pa.binary())})
    out = WavDecodeTransformer(input_col="wav", output_col="wav").transform(tbl)
    assert out.column("wav_sample_rate").to_pylist() == [8000]
    assert out.column("wav_n_samples").to_pylist() == [100]
    np.testing.assert_allclose(out.column("wav_rms").to_pylist(), [0.5])


def test_pgm_resize_nearest():
    import pyarrow as pa

    from kamae_ray.stages.multimodal import PgmResizeTransformer

    w, h = 8, 4
    px = bytes(range(w * h))
    payload = b"P5\n%d %d\n255\n" % (w, h) + px
    t = pa.table({"img": pa.array([payload, None], pa.binary())})
    out = PgmResizeTransformer(input_col="img", width=4, height=2, output_col="small").transform_batch(t)
    small = out.column("small").to_pylist()
    assert small[1] is None
    w2, h2, mv2, px2 = decode_pgm(small[0])
    assert (w2, h2, mv2) == (4, 2, 255)
    # nearest-neighbor floor mapping: dst(x,y) = src(x*8//4, y*4//2)
    src = np.frombuffer(px, np.uint8).reshape(h, w)
    expect = src[::2, ::2].reshape(-1).astype(np.float64)
    assert np.array_equal(px2, expect)
    # composable: resize output decodes through the decode actor pool path
    from kamae_ray.stages.multimodal import PgmDecodeTransformer

    dec = PgmDecodeTransformer(input_col="small", output_col="img2").transform_batch(out)
    assert dec.column("img2_width").to_pylist()[0] == 4


def test_spectrogram_transformer(ray_session):
    """Band energies localize a pure tone; exact numpy-reference parity;
    actor-pool Dataset path == Table path; short/empty payload handling."""
    import ray

    from kamae_ray.stages import SpectrogramTransformer

    sr, n = 8000, 4096
    t_ax = np.arange(n) / sr
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t_ax) * 32767).astype(np.int16)
    low = (0.5 * np.sin(2 * np.pi * 100 * t_ax) * 32767).astype(np.int16)
    tbl = pa.table({
        "wav": pa.array(
            [encode_wav(sr, 1, tone), encode_wav(sr, 1, low), b"", encode_wav(sr, 1, tone[:64])],
            pa.binary(),
        )
    })
    tf = SpectrogramTransformer(input_col="wav", output_col="spec",
                                n_fft=256, hop=128, n_bands=8)
    out = tf.transform_batch(tbl)
    bands = out.column("spec_bands").to_pylist()
    nf = out.column("spec_n_frames").to_pylist()
    # 1 kHz at sr=8000 -> bin 32 of 129 -> band 2 (edges [0,16,32,48,...]);
    # 100 Hz -> bin 3 -> band 0
    assert int(np.argmax(bands[0])) == 2
    assert int(np.argmax(bands[1])) == 0
    assert bands[2] is None and nf[2] == 0  # empty payload
    assert nf[3] == 0 and max(bands[3]) == 0.0  # shorter than one frame
    assert nf[0] == 1 + (n - 256) // 128
    # numpy reference for the tone row
    from kamae_ray.stages.multimodal import decode_wav

    _, _, _, samples = decode_wav(encode_wav(sr, 1, tone))
    w = np.hanning(256)
    frames = samples[(np.arange(256)[None, :] + 128 * np.arange(nf[0])[:, None])] * w
    p = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    edges = np.linspace(0, 129, 9).astype(np.int64)
    ref = np.log1p(np.add.reduceat(p, edges[:-1], axis=1).mean(axis=0))
    assert np.allclose(np.array(bands[0], dtype=np.float64), ref, rtol=1e-6)
    # Dataset actor-pool path
    ds = ray.data.from_arrow(tbl)
    got = pa.concat_tables(
        [pa.table(b) for b in tf.transform(ds).iter_batches(batch_format="pyarrow")]
    )
    assert got.column("spec_n_frames").to_pylist() == nf


def test_pgm_average_hash(ray_session):
    import ray

    from kamae_ray.stages.multimodal import PgmAverageHashTransformer, encode_pgm

    # 4x4 image == its own thumbnail: bits where px*16 > sum
    px = np.arange(16, dtype=np.int64) * 10  # sum=1200; bit_j: j*160 > 1200 -> j >= 8
    img = encode_pgm(4, 4, 255, px)
    want = sum(1 << j for j in range(8, 16))
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "img": pa.array([img, None], pa.binary())})
    out = PgmAverageHashTransformer(input_col="img", output_col="ahash").transform(t)
    assert out.column("ahash").to_pylist() == [want, None]
    # constant image: no pixel strictly above the mean -> hash 0
    flat = encode_pgm(4, 4, 255, np.full(16, 7, np.int64))
    t2 = pa.table({"id": pa.array([1], pa.int64()),
                   "img": pa.array([flat], pa.binary())})
    assert PgmAverageHashTransformer(input_col="img", output_col="ahash") \
        .transform(t2).column("ahash").to_pylist() == [0]
    # 8x8 -> 4x4 thumbnail path matches the explicit nearest-neighbor gather
    big = (np.arange(64, dtype=np.int64) * 37) % 256
    img8 = encode_pgm(8, 8, 255, big)
    j = np.arange(16)
    src = ((j // 4) * 8 // 4) * 8 + ((j % 4) * 8) // 4
    th = big[src]
    want8 = int(((1 << j)[(th * 16) > th.sum()]).sum())
    t3 = pa.table({"id": pa.array([1], pa.int64()),
                   "img": pa.array([img8], pa.binary())})
    assert PgmAverageHashTransformer(input_col="img", output_col="ahash") \
        .transform(t3).column("ahash").to_pylist() == [want8]
    # Dataset path agrees
    ds = ray.data.from_arrow(t3)
    got = PgmAverageHashTransformer(input_col="img", output_col="ahash") \
        .transform(ds).take_all()
    assert got[0]["ahash"] == want8


def test_ppm_decode_roundtrip_and_ascii(ray_session):
    import ray

    from kamae_ray.stages.multimodal import (PpmDecodeTransformer, decode_ppm,
                                             encode_ppm)

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (12, 3))
    p6 = encode_ppm(4, 3, 255, rgb)
    w, h, mv, px = decode_ppm(p6)
    assert (w, h, mv) == (4, 3, 255)
    assert np.array_equal(px, rgb.astype(np.float64))
    # P3 ASCII with a comment parses identically
    body = " ".join(str(int(v)) for v in rgb.reshape(-1))
    p3 = f"P3\n# comment\n4 3\n255\n{body}\n".encode()
    assert np.array_equal(decode_ppm(p3)[3], rgb.astype(np.float64))
    with pytest.raises(ValueError, match="not a PPM"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(p6[:-5])
    # transformer: exact channel sums + one-division mean; Dataset actor path
    t = PpmDecodeTransformer(input_col="img", output_col="im")
    tbl = pa.table({"img": pa.array([p6, p3], pa.binary())})
    out = t.transform(tbl)
    assert out.column("im_r_sum").to_pylist() == [int(rgb[:, 0].sum())] * 2
    assert out.column("im_mean")[0].as_py() == int(rgb.sum()) / 36.0
    d = t.transform(ray.data.from_arrow(tbl))
    dt = pa.concat_tables([pa.table(b) for b in
                           d.iter_batches(batch_format="pyarrow")])
    assert dt.select(out.column_names).equals(out)
