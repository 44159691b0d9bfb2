"""Persistent encode server: micro-batching, parity with the batch
pipeline, NDJSON socket transport."""

import json
import os
import socket
import threading

import numpy as np
import pytest

import jax

from seq2seq_abcd_vae_tpu.configs import (ABCDSamplerConfig, DecoderConfig,
                                          EncoderConfig)
from seq2seq_abcd_vae_tpu.models import vae
from seq2seq_abcd_vae_tpu.train import checkpoint as ckpt

FS = 16000  # frame = 128 samples, 65 bins, step = 64


def _write_checkpoint(save_dir: str) -> str:
    enc = EncoderConfig(65, 8)
    lat = ABCDSamplerConfig(enc.hidden_size_total, 8, 4, 6)
    dec = DecoderConfig(65, 8, 8, 6)
    cfg = vae.ModelConfig(enc, lat, dec)
    params = vae.model_init(jax.random.PRNGKey(0), cfg)
    latent_init = dict(lat.pack_init_parameters())
    latent_init["epoch_init_iter_counts"] = 0
    payload = {
        "epoch": 1,
        "latent_type": "abcd",
        "encoder": ckpt.tree_to_numpy(params["encoder"]),
        "encoder_init_parameters": enc.pack_init_parameters(),
        "feature_sampler": ckpt.tree_to_numpy(params["feature_sampler"]),
        "feature_sampler_init_parameters": latent_init,
        "decoder": ckpt.tree_to_numpy(params["decoder"]),
        "decoder_init_parameters": dec.pack_init_parameters(),
        "gradient_clip": 1.0,
        "random_state": np.asarray(jax.random.PRNGKey(0)),
    }
    return ckpt.save_checkpoint(save_dir, payload)


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from seq2seq_abcd_vae_tpu.serve import EncodeService
    path = _write_checkpoint(str(tmp_path_factory.mktemp("serve_ckpt")))
    svc = EncodeService(path, 11.0, FS, device="cpu", mode="probs",
                        buckets=(8, 16), batch_size=4, max_wait_ms=2.0)
    yield svc
    svc.close()


def _seg(rng, n):
    return (rng.normal(size=n) * 100).astype(np.float32)


def test_probs_shape_and_sum(service, rng):
    p = service.encode(_seg(rng, 300), fs=FS)
    assert p.shape == (4,)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)


def test_batch_invariance(service, rng):
    """A segment's answer must not depend on its batch companions."""
    x = _seg(rng, 300)
    alone = service.encode(x)
    futs = [service.submit(_seg(rng, 200 + 30 * i)) for i in range(3)]
    futs.append(service.submit(x))
    together = futs[-1].result()
    for f in futs:
        f.result()
    np.testing.assert_allclose(alone, together, rtol=1e-6)


def test_micro_batching_groups_by_bucket(tmp_path, rng):
    from seq2seq_abcd_vae_tpu.serve import EncodeService
    path = _write_checkpoint(str(tmp_path))
    svc = EncodeService(path, 11.0, FS, device="cpu", buckets=(8, 16),
                        batch_size=4, autostart=False)
    try:
        futs = [svc.submit(_seg(rng, 200)) for _ in range(3)]       # bucket 8
        futs += [svc.submit(_seg(rng, 700)) for _ in range(2)]      # bucket 16
        assert svc.stats.batches == 0
        svc.drain_once()
        for f in futs:
            assert f.result().shape == (4,)
        # 3 short requests share one compiled dispatch; 2 long another
        assert svc.stats.batches == 2
        assert svc.stats.per_bucket == {8: 1, 16: 1}
        assert svc.stats.rows_real == 5 and svc.stats.rows_padded == 3
        # overflow beyond batch_size splits
        futs = [svc.submit(_seg(rng, 200)) for _ in range(6)]
        svc.drain_once()
        for f in futs:
            f.result()
        assert svc.stats.per_bucket[8] == 3
    finally:
        svc.close()


def test_request_validation(service, rng):
    with pytest.raises(ValueError):  # wrong sampling rate
        service.encode(_seg(rng, 300), fs=8000)
    with pytest.raises(ValueError):  # longer than the largest bucket
        service.submit(_seg(rng, 64 * 40)).result()
    with pytest.raises(ValueError):  # too short to reflect-pad
        service.submit(_seg(rng, 10)).result()
    assert service.stats.errors >= 2


def test_matches_offline_encode_step(service, rng):
    """Served values equal the offline batch pipeline's for the same
    padded row (same _encode_step, same centering layout)."""
    from seq2seq_abcd_vae_tpu.data import audio as audio_mod
    from seq2seq_abcd_vae_tpu.infer.encode import _encode_step
    x = _seg(rng, 300)
    served = service.encode(x)
    fe = service.frontend
    row = np.zeros((1, fe.buffer_len(8)), np.float32)
    audio_mod.center_pad_segment(x, fe.pad, row[0])
    nf = np.asarray([fe.frames_for_samples(x.shape[0])], np.int32)
    direct = np.asarray(_encode_step(
        service._encoder.params, row, nf, statics=service._statics,
        bucket_frames=8, mode="probs"))[0]
    np.testing.assert_allclose(served, direct, rtol=1e-6)


def test_socket_transport(service, tmp_path, rng):
    from seq2seq_abcd_vae_tpu.serve import serve_forever
    sock_path = str(tmp_path / "abcd.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve_forever,
                         args=(service, sock_path, ready), daemon=True)
    t.start()
    assert ready.wait(10)
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(sock_path)
    f = c.makefile("rwb")

    def rpc(obj):
        f.write(json.dumps(obj).encode() + b"\n")
        f.flush()
        return json.loads(f.readline())

    pong = rpc({"cmd": "ping"})
    assert pong["ok"] and pong["mode"] == "probs" and pong["fs"] == FS

    x = _seg(rng, 300)
    r = rpc({"id": 7, "samples": x.tolist(), "fs": FS})
    assert r["id"] == 7
    np.testing.assert_allclose(r["values"], service.encode(x), rtol=1e-6)

    bad = rpc({"id": 8, "samples": x.tolist(), "fs": 8000})
    assert bad["id"] == 8 and "error" in bad

    wav_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                           "fixtures", "toy_data")
    wav = os.path.abspath(os.path.join(
        wav_dir, "20170806-080002_89.2-94.22.1ch.wav"))
    if os.path.isfile(wav):
        from seq2seq_abcd_vae_tpu.data.audio import WavCache
        fs = WavCache(os.path.dirname(wav)).sample_freq(
            os.path.basename(wav))
        r = rpc({"id": 9, "wav": wav, "onset": 0.5, "offset": 0.52})
        if fs == FS:
            assert "values" in r
        else:  # service pinned to another fs: must reject, not crash
            assert "error" in r and str(fs) in r["error"]

    assert rpc({"cmd": "shutdown"})["ok"]
    f.close()
    c.close()
    t.join(timeout=10)
    assert not t.is_alive()


def test_warmup_compiles_all_buckets(tmp_path, rng):
    from seq2seq_abcd_vae_tpu.serve import EncodeService
    path = _write_checkpoint(str(tmp_path))
    svc = EncodeService(path, 11.0, FS, device="cpu", buckets=(8, 16),
                        batch_size=2, max_wait_ms=0.0)
    try:
        svc.warmup()
        assert set(svc.stats.per_bucket) == {8, 16}
    finally:
        svc.close()
