"""Serving daemon: HTTP generate/healthz against a live server thread."""

import http.client
import io
import json
import socket
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import serve as serve_mod
from diffusion_models_collection_tpu.datasets import (
    DataLoader,
    DiffusionDataset,
    ImageTransform,
)
from diffusion_models_collection_tpu.diffusion import DDPM
from diffusion_models_collection_tpu.factory import get_model
from diffusion_models_collection_tpu.utils import DiffusionTrainer
from diffusion_models_collection_tpu.utils.tracker import NullTracker


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_ckpt")
    cfg = {
        "model_type": "unet",
        "model_params": {
            "image_size": (8, 8), "in_channels": 3, "model_channels": 16,
            "out_channels": 3, "num_res_blocks": 1,
            "attention_resolutions": (4,), "channel_mult": (1, 2),
        },
        "image_size": (8, 8),
        "conditional": True,
        "num_classes": 4,
        "num_timesteps": 10,
        "beta_start": 1e-4, "beta_end": 0.02, "beta_schedule": "linear",
        "loss_type": "l2", "epochs": 1, "batch_size": 8,
        "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 0.0,
        "gradient_accumulation_steps": 1, "use_ema": True, "ema_decay": 0.9,
        "cfg_dropout_prob": 0.2, "cfg_scale": 1.5,
        "num_inference_steps": 4, "ddim_eta": 0.0,
        "use_scheduler": False,
        "save_dir": str(tmp / "ckpt"), "sample_dir": str(tmp / "samples"),
        "save_interval": 10, "sample_interval": 100,
        "sample_start_epoch": 100, "num_samples": 4,
        "seed": 0, "use_swanlab": False,
    }
    ds = DiffusionDataset(
        "synthetic", conditional=True,
        transform=ImageTransform((8, 8), train=True), image_size=(8, 8),
        n_train=16, num_classes=4,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    trainer = DiffusionTrainer(
        get_model(cfg), DDPM(10), loader, config=cfg, tracker=NullTracker()
    )
    trainer.train_epoch(1)
    trainer.save_checkpoint(1)
    return str(tmp / "ckpt" / "current_model.ckpt")


server_service = {}


@pytest.fixture(scope="module")
def server(checkpoint):
    service = serve_mod.SamplerService(
        checkpoint, sampling_method="ddim", num_inference_steps=3,
        batch_size=4, use_ema=True,
    )
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_mod.make_handler(service)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    server_service[httpd.server_address] = service
    yield httpd.server_address
    httpd.shutdown()
    httpd.server_close()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request(method, path, body=json.dumps(body) if body else None)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_healthz(server):
    status, ctype, data = _request(server, "GET", "/healthz")
    assert status == 200
    info = json.loads(data)
    assert info["status"] == "ok"
    assert info["conditional"] is True
    assert info["max_batch"] == 4


def test_generate_npy(server):
    status, ctype, data = _request(
        server, "POST", "/generate",
        {"num_samples": 2, "labels": [0, 3], "seed": 5, "format": "npy"},
    )
    assert status == 200, data
    images = np.load(io.BytesIO(data))
    assert images.shape == (2, 8, 8, 3)
    assert images.min() >= 0.0 and images.max() <= 1.0

    # determinism at fixed seed
    _, _, data2 = _request(
        server, "POST", "/generate",
        {"num_samples": 2, "labels": [0, 3], "seed": 5, "format": "npy"},
    )
    np.testing.assert_array_equal(images, np.load(io.BytesIO(data2)))


def test_generate_png(server):
    status, ctype, data = _request(
        server, "POST", "/generate", {"num_samples": 3}
    )
    assert status == 200
    assert ctype == "image/png"
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_generate_validation(server):
    status, _, data = _request(
        server, "POST", "/generate", {"num_samples": 99}
    )
    assert status == 400
    status, _, data = _request(
        server, "POST", "/generate", {"num_samples": 1, "labels": [9]}
    )
    assert status == 400
    assert b"labels" in data


def test_generate_default_labels_wrap(checkpoint):
    """Default labels wrap at num_classes: num_samples > num_classes must
    not 400 (the server's own default used to exceed the class range)."""
    service = serve_mod.SamplerService(
        checkpoint, sampling_method="ddim", num_inference_steps=2,
        batch_size=6, use_ema=True,
    )
    images = service.generate(6)  # num_classes=4 < 6
    assert images.shape[0] == 6


def test_unconditional_rejects_labels(tmp_path, checkpoint):
    """Labels/cfg_scale on an unconditional model are a client error, not
    silently ignored."""
    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    payload = load_checkpoint(checkpoint)
    cfg = dict(payload["config"], conditional=False, num_classes=None)
    path = tmp_path / "uncond.ckpt"
    save_checkpoint(
        path, epoch=1, params=payload["model_state_dict"], opt_state={},
        best_loss=1.0, config=cfg,
    )
    service = serve_mod.SamplerService(
        str(path), sampling_method="ddim", num_inference_steps=2,
        batch_size=2,
    )
    with pytest.raises(ValueError, match="unconditional"):
        service.generate(1, labels=[0])
    with pytest.raises(ValueError, match="unconditional"):
        service.generate(1, cfg_scale=2.0)
    assert service.generate(1).shape[0] == 1


def test_malformed_requests_are_400(server):
    conn = http.client.HTTPConnection(*server, timeout=300)
    conn.request("POST", "/generate", body=b"[1, 2]")
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()
    conn.close()
    status, _, _ = _request(
        server, "POST", "/generate", {"num_samples": 1, "labels": 5}
    )
    assert status == 400
    status, _, _ = _request(
        server, "POST", "/generate", {"num_samples": 1, "labels": ["a"]}
    )
    assert status == 400


def test_healthz_responsive_during_generate(server, monkeypatch):
    """/healthz answers while a generate is verifiably in flight: the
    generation lock is instrumented so the health check runs INSIDE the
    generate critical section (a single-threaded server or a whole-handler
    lock would deadlock/timeouts here, not pass by accident)."""
    import serve as serve_mod

    in_generate = threading.Event()
    release = threading.Event()
    service = server_service[server]
    real_lock = service._lock

    class SignallingLock:
        def __enter__(self):
            real_lock.acquire()
            in_generate.set()
            release.wait(timeout=120)
            return self

        def __exit__(self, *exc):
            real_lock.release()
            return False

    monkeypatch.setattr(service, "_lock", SignallingLock())
    results = {}

    def gen():
        try:
            results["gen"] = _request(
                server, "POST", "/generate",
                {"num_samples": 2, "format": "npy"},
            )
        except Exception as e:  # surface instead of KeyError
            results["gen"] = ("exception", str(e), b"")

    t = threading.Thread(target=gen)
    t.start()
    assert in_generate.wait(timeout=120), "generate never reached the lock"
    status, _, _ = _request(server, "GET", "/healthz")
    assert status == 200  # answered while generate held the lock
    release.set()
    t.join(timeout=300)
    assert not t.is_alive()
    assert results["gen"][0] == 200, results["gen"]


def test_generate_queue_cap_503(checkpoint):
    """Beyond max_queue concurrent generates, the server sheds load with
    503 instead of accumulating threads."""
    service = serve_mod.SamplerService(
        checkpoint, sampling_method="ddim", num_inference_steps=2,
        batch_size=2, use_ema=True, max_queue=1,
    )
    assert service.try_acquire_slot()      # occupy the only slot
    assert not service.try_acquire_slot()  # next request would 503
    service.release_slot()
    assert service.try_acquire_slot()
    service.release_slot()


def test_serve_consistency_checkpoint(tmp_path):
    """Few-step checkpoints serve through the same daemon: a
    `diffusion_type: 'consistency'` checkpoint (the train.py CT /
    tools/distill.py output format) dispatches to ConsistencyModel via
    the factory and answers /generate."""
    import jax

    from diffusion_models_collection_tpu.diffusion import ConsistencyModel
    from diffusion_models_collection_tpu.factory import init_model_params
    from diffusion_models_collection_tpu.utils import (
        checkpoint as ckpt_lib,
    )

    cfg = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 16, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": (8, 8), "conditional": True, "num_classes": 4,
        "diffusion_type": "consistency",
        "num_timesteps": 10, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "num_inference_steps": 2,
        "sigma_data": 0.5, "timestep_scaling": 10.0, "cfg_scale": 1.0,
    }
    params = init_model_params(
        get_model(cfg), jax.random.PRNGKey(0), (8, 8), 3, True
    )
    path = tmp_path / "cm.ckpt"
    ckpt_lib.save_checkpoint(path, epoch=1, params=params, opt_state=None,
                             best_loss=1.0, config=cfg, ema_params=params)

    service = serve_mod.SamplerService(str(path), batch_size=4,
                                       use_ema=True)
    assert isinstance(service.diffusion, ConsistencyModel)
    assert service.diffusion.num_inference_steps == 2

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_mod.make_handler(service)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        status, ctype, data = _request(
            httpd.server_address, "POST", "/generate",
            {"num_samples": 2, "labels": [1, 2], "format": "npy"},
        )
        assert status == 200, data
        arr = np.load(io.BytesIO(data))
        assert arr.shape == (2, 8, 8, 3)
        assert np.isfinite(arr).all()
        # the stepwise DDIM engine must refuse non-VP checkpoints
        with pytest.raises(ValueError, match="VP"):
            serve_mod.SamplerService(str(path), batch_size=4,
                                     continuous=True)
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_tome_rejected_for_non_dit(checkpoint):
    """--tome_ratio (ops/tome.py) is a DiT knob; the UNet checkpoint is
    refused at service construction, before any compile."""
    with pytest.raises(ValueError, match="DiT"):
        serve_mod.SamplerService(checkpoint, batch_size=4, tome_ratio=0.5)
