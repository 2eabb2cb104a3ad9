

def test_ppmvid_split_and_sample(ray_session):
    """Concatenated-P6 container roundtrip + uniform strided sampling."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataxray.functions.multimodal import (
        PpmDecoder, VideoFrameSampler, split_ppmvid, synth_ppmvid_bytes)

    b = synth_ppmvid_bytes(9, w=16, h=12, n_frames=10)
    frames = split_ppmvid(b)
    assert len(frames) == 10 and b"".join(frames) == b
    assert split_ppmvid(b + b"XX")  # trailing garbage tolerated
    # frames differ over time (temporal signal exists)
    img0 = PpmDecoder.decode_one(frames[0])[2]
    img9 = PpmDecoder.decode_one(frames[9])[2]
    assert not np.array_equal(img0, img9)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b, b""], pa.large_binary()),
    }))
    out = ds.map_batches(VideoFrameSampler("payload", "doc_id", 4),
                         batch_format="pyarrow").take_all()
    got = [(r["doc_id"], r["frame_idx"]) for r in out]
    assert got == [(1, 0), (1, 2), (1, 5), (1, 7)]  # i*10//4, empty skipped
    for r in out:
        assert 0.0 <= r["mean_luma"] <= 255.0
        assert (r["width"], r["height"]) == (16, 12)
