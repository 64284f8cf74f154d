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
