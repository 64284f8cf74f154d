"""Multimodal plumbing: schema, actor-pool decode, stub behavior."""

import numpy as np
import pytest


def test_fake_decode_pipeline(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.multimodal import decode_media, make_fake_media_table

    ds = rd.from_arrow(make_fake_media_table(n=64, seed=3))
    out = decode_media(ds, decoder="fake", concurrency=2, batch_size=16)
    df = out.to_pandas()
    assert len(df) == 64
    feats = np.stack(df["features"].to_numpy())
    assert feats.shape == (64, 16)
    np.testing.assert_allclose(feats.sum(axis=1), 1.0, atol=1e-5)


def test_fake_decode_deterministic(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.multimodal import decode_media, make_fake_media_table

    t = make_fake_media_table(n=32, seed=5)
    a = decode_media(rd.from_arrow(t), batch_size=8).to_pandas().sort_values("media_id")
    b = decode_media(rd.from_arrow(t), batch_size=32).to_pandas().sort_values("media_id")
    np.testing.assert_array_equal(
        np.stack(a["features"].to_numpy()), np.stack(b["features"].to_numpy())
    )


def test_stub_decoder_raises():
    from cleanlab_ray.stages.multimodal import MediaDecoder, make_fake_media_table

    dec = MediaDecoder(decoder="stub")
    with pytest.raises(NotImplementedError, match="codec"):
        dec(make_fake_media_table(n=2))


def test_frame_sampler(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.multimodal import FrameSampler, make_fake_media_table

    ds = rd.from_arrow(make_fake_media_table(n=8, seed=1, payload_bytes=1000))
    out = ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"num_frames": 4},
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert all(len(f) == 4 for f in out["frames"])
    assert all(len(f[0]) == 250 for f in out["frames"])


def test_real_image_decode_pipeline(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.multimodal import (
        decode_media,
        decode_raster,
        make_fake_media_table,
        raster_features,
    )

    t = make_fake_media_table(n=32, seed=9, mode="ppm")
    out = decode_media(rd.from_arrow(t), decoder="image", batch_size=8).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (32, 16)
    # features match a direct local decode of the same payloads
    payloads = t["payload"].to_pylist()
    for i in (0, 7, 31):
        img = decode_raster(payloads[i])
        assert img.shape == (int(t["height"][i].as_py()), int(t["width"][i].as_py()), 3)
        np.testing.assert_allclose(feats[i], raster_features(img), rtol=1e-6)


def test_bmp_decode_roundtrip():
    import struct

    from cleanlab_ray.stages.multimodal import decode_raster

    # hand-built 2x2 24-bit BMP (bottom-up rows, BGR, 4-byte row padding)
    w, h = 2, 2
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = b"".join(bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0]]) for x in range(w))
        rows += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    img = decode_raster(header + info + rows)
    np.testing.assert_array_equal(img, px)


def test_netpbm_rejects_garbage():
    from cleanlab_ray.stages.multimodal import decode_raster

    with pytest.raises(ValueError, match="raster"):
        decode_raster(b"\x89PNG\r\n\x1a\n not supported")


def test_frame_sampler_matches_slicing(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.multimodal import FrameSampler, make_fake_media_table

    t = make_fake_media_table(n=16, seed=2, payload_bytes=997)  # non-divisible
    out = (
        rd.from_arrow(t)
        .map_batches(FrameSampler, fn_constructor_kwargs={"num_frames": 4},
                     batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    payloads = t["payload"].to_pylist()
    for i in range(16):
        data = payloads[i]
        step = max(1, len(data) // 4)
        expected = [data[j * step : (j + 1) * step] for j in range(4)]
        got = [bytes(f) for f in out["frames"][i]]
        assert got == expected
