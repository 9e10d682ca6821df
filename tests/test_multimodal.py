

def test_video_roundtrip_and_frame_sample(ray_session):
    import numpy as np
    import ray.data as rd

    from ddsketch_ray.stages.multimodal import (
        KIND_VIDEO,
        VideoFrameSampleStage,
        decode_fake_media,
        encode_fake_media,
        video_table,
    )

    blob = encode_fake_media(KIND_VIDEO, 4, 3, 10, seed=9)
    kind, dims, arr = decode_fake_media(blob)
    assert kind == KIND_VIDEO and dims == (4, 3, 10) and arr.shape == (10, 3, 4)

    ds = rd.from_arrow(video_table(40, seed=7)).repartition(3)
    out = ds.map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", batch_size=16,
        concurrency=2, fn_constructor_kwargs={"stride": 4, "max_frames": 8},
    ).to_pandas()
    # every video contributes ceil-limited sampled frames at stride 4
    t = video_table(40, seed=7)
    for mid, blob in zip(t.column("media_id").to_pylist(), t.column("payload").to_pylist()):
        _, (w, h, nf), arr = decode_fake_media(blob)
        want_idx = list(range(0, nf, 4))[:8]
        got = out[out.media_id == mid].sort_values("frame_idx")
        assert got["frame_idx"].tolist() == want_idx
        for j, fi in enumerate(want_idx):
            assert got["frame_mean"].iloc[j] == float(arr[fi].mean())
