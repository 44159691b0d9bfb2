"""AsyncCheckpointer behavior and length-sorted batching option."""

import os
import pickle

import numpy as np
import pytest

from seq2seq_abcd_vae_tpu.train.checkpoint import (AsyncCheckpointer,
                                                   load_checkpoint)


def test_async_save_roundtrip(tmp_path):
    c = AsyncCheckpointer()
    c.save(str(tmp_path), {"epoch": 1, "x": np.arange(4)})
    c.save(str(tmp_path), {"epoch": 2, "x": np.arange(5)})  # waits for 1st
    c.wait()
    got = load_checkpoint(str(tmp_path / "checkpoint.pt"))
    assert got["epoch"] == 2
    np.testing.assert_array_equal(got["x"], np.arange(5))


def test_async_save_error_surfaces(tmp_path):
    c = AsyncCheckpointer()
    c.save(str(tmp_path / "does-not-exist"), {"epoch": 1})
    with pytest.raises(Exception):
        c.wait()
    # checkpointer is reusable after an error
    c.save(str(tmp_path), {"epoch": 3})
    c.wait()
    assert load_checkpoint(str(tmp_path / "checkpoint.pt"))["epoch"] == 3


def test_unpicklable_payload_keeps_previous_checkpoint(tmp_path):
    c = AsyncCheckpointer()
    c.save(str(tmp_path), {"epoch": 7})
    c.wait()
    c.save(str(tmp_path), {"bad": lambda: None})  # pickling fails
    with pytest.raises(Exception):
        c.wait()
    assert load_checkpoint(str(tmp_path / "checkpoint.pt"))["epoch"] == 7


def test_length_sorted_batches(tmp_path, rng):
    import pandas as pd
    import scipy.io.wavfile as spw

    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec

    fs = 16000
    wav = (rng.normal(size=8 * fs) * 3000).astype(np.int16)
    spw.write(tmp_path / "w.wav", fs, wav)
    rows, cursor = [], 0.02
    durations = [0.1, 0.8, 0.12, 0.75, 0.11, 0.82, 0.13, 0.78]
    for d in durations:
        rows.append(("w.wav", round(cursor, 3), round(cursor + d, 3),
                     "train"))
        cursor += d + 0.02
    pd.DataFrame(rows, columns=["input_path", "onset", "offset",
                                "data_type"]).to_csv(tmp_path / "a.csv",
                                                     index=False)
    p = AnnotationParser(str(tmp_path), str(tmp_path / "a.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(128, 64)

    sorted_loader = DataLoader(ds, fe, batch_size=4, shuffle=True,
                               length_sorted=True)
    buckets = sorted([b.bucket_frames for b in sorted_loader])
    # short (~0.1s -> 27-35 frames) and long (~0.8s -> ~200 frames)
    # segments separate into distinct buckets
    assert buckets[0] < buckets[1], buckets
    # all segments still covered exactly once
    seen = [ix for b in sorted_loader for ix in b.ixs]
    assert sorted(seen) == sorted(ds.df_annotation.index)

    mixed = DataLoader(ds, fe, batch_size=4, shuffle=True, seed=0,
                       batching_mode="uniform")
    mixed_buckets = [b.bucket_frames for b in mixed]
    assert max(mixed_buckets) == max(buckets)


def test_bucket_shuffled_batches(tmp_path, rng):
    import pandas as pd
    import scipy.io.wavfile as spw

    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec

    fs = 16000
    wav = (rng.normal(size=20 * fs) * 3000).astype(np.int16)
    spw.write(tmp_path / "w.wav", fs, wav)
    rows, cursor = [], 0.02
    durations = ([0.1, 0.11, 0.12, 0.13, 0.1, 0.12]
                 + [0.8, 0.75, 0.82, 0.78, 0.8, 0.76])
    for d in durations:
        rows.append(("w.wav", round(cursor, 3), round(cursor + d, 3),
                     "train"))
        cursor += d + 0.02
    pd.DataFrame(rows, columns=["input_path", "onset", "offset",
                                "data_type"]).to_csv(tmp_path / "a.csv",
                                                     index=False)
    p = AnnotationParser(str(tmp_path), str(tmp_path / "a.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(128, 64)

    loader = DataLoader(ds, fe, batch_size=4, shuffle=True, seed=0,
                        batching_mode="bucket_shuffled",
                        pad_to_batch_size=False)
    batches = list(loader)
    # exact cover: every row exactly once per epoch
    seen = [ix for b in batches for ix in b.ixs]
    assert sorted(seen) == sorted(ds.df_annotation.index)
    assert len(batches) == loader.get_num_batches()
    # bucket-homogeneous: no batch mixes the short (~30 frame) and long
    # (~200 frame) populations, so short batches keep a small bucket
    assert min(b.bucket_frames for b in batches) < 64
    for b in batches:
        assert (b.num_frames[:b.num_real] <= b.bucket_frames).all()
    # composition reshuffles across epochs (within-bucket permutation)
    first = [tuple(b.ixs) for b in batches]
    second = [tuple(b.ixs) for b in loader]
    assert sorted(x for t in first for x in t) == \
        sorted(x for t in second for x in t)
    # padding waste is below the uniform loader's
    waste_b = loader.epoch_padding_stats()["frame_waste_frac"]
    uni = DataLoader(ds, fe, batch_size=4, shuffle=True, seed=0,
                     batching_mode="uniform", pad_to_batch_size=False)
    waste_u = uni.epoch_padding_stats()["frame_waste_frac"]
    assert waste_b < waste_u, (waste_b, waste_u)
