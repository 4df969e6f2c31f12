"""Minimal production serving daemon (beyond the reference).

Loads a checkpoint (native .ckpt/orbax, or a reference PyTorch .pth —
converted on the fly) and serves image generation over HTTP with ONE
compiled program: requests are padded to the fixed serving batch, so the
TPU never retraces. CFG scale and seed are runtime inputs (traced
scalars), not compile-time constants.

    python serve.py --checkpoint ckpt/best_model.ckpt --port 8000 \
        --sampling_method dpm++ --num_inference_steps 16 --use_ema

    GET  /healthz            -> {"status": "ok", ...}
    POST /generate           JSON {"num_samples": 4, "labels": [0,1,2,3],
                                   "seed": 7, "cfg_scale": 1.8,
                                   "format": "png"|"npy"}
      -> image/png grid (or application/octet-stream .npy of
         (N, H, W, C) float32 in [0, 1])

Generation is serialized by a lock (one chip, one compiled sampler —
the chip saturates at the serving batch already, docs/benchmarks.md)
with the device computation MATERIALIZED inside the lock (JAX dispatch
is async — releasing before block_until_ready would let a second
sampling program overlap on the chip). /healthz and error responses stay
responsive on separate threads; queued generates beyond `--max_queue`
get 503 instead of unbounded thread growth.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_collection_tpu.platform_setup import (
    configure_compile_cache,
)

configure_compile_cache()

from diffusion_models_collection_tpu.factory import (
    dp_sampling_sharding,
    eval_model_fn,
    get_diffusion,
    load_model_for_inference,
    sharded_init_noise,
)
from diffusion_models_collection_tpu.utils.checkpoint import load_checkpoint
from diffusion_models_collection_tpu.utils.helpers import (
    make_grid,
    resolve_image_size,
)


class SamplerService:
    """Owns the model, params and the one compiled sampler."""

    def __init__(self, checkpoint_path: str, *, sampling_method: str = "ddim",
                 num_inference_steps: int | None = None, batch_size: int = 16,
                 use_ema: bool = False, config: dict | None = None,
                 mixed_precision: str | None = None, max_queue: int = 8,
                 continuous: bool = False, steps_per_tick: int = 1,
                 tome_ratio: float = 0.0,
                 tome_mlp: bool = False, quantize: str | None = None):
        payload = load_checkpoint(checkpoint_path)
        self.config = config or payload.get("config")
        if self.config is None:
            raise ValueError("checkpoint has no embedded config; pass one")
        if mixed_precision is not None:
            self.config = dict(self.config, mixed_precision=mixed_precision)
        if tome_ratio > 0:
            # Token Merging (ops/tome.py) — parameter-free DiT serving
            # acceleration; rejected for other model types
            if str(self.config.get("model_type", "")).lower() != "dit":
                raise ValueError("tome_ratio applies to DiT checkpoints")
            mp = dict(self.config.get("model_params", {}),
                      tome_ratio=float(tome_ratio))
            if tome_mlp:
                mp["tome_mlp"] = True
            self.config = dict(self.config, model_params=mp)
        if quantize:
            # int8 w8a8 serving (ops/quant.py); composes with tome
            if str(self.config.get("model_type", "")).lower() != "dit":
                raise ValueError("quantize applies to DiT checkpoints")
            self.config = dict(
                self.config,
                model_params=dict(self.config.get("model_params", {}),
                                  quant=str(quantize)),
            )
        if self.config.get("super_resolution"):
            raise ValueError(
                "super-resolution checkpoints are not servable: each "
                "request would need an LR conditioning image (use "
                "sample.py --sr_source or tools/cascade.py)"
            )
        self.model, params = load_model_for_inference(
            payload, self.config, use_ema
        )
        self.params = jax.device_put(params)
        self.diffusion = get_diffusion(self.config, sampling_method)
        if num_inference_steps and hasattr(self.diffusion,
                                           "set_inference_steps"):
            self.diffusion.set_inference_steps(num_inference_steps)
        self.batch_size = int(batch_size)
        # Latent diffusion (extension): sample latents, decode per request
        from diffusion_models_collection_tpu.utils.latent import LatentCodec

        self.codec = LatentCodec.from_config(self.config)
        self.pixel_hw = resolve_image_size(self.config["image_size"])
        if self.codec is not None:
            # the sampler works at latent geometry; /generate responses
            # and /healthz still speak pixels (decode happens per request)
            self.image_hw = self.codec.latent_hw()
            self.channels = self.codec.latent_channels
        else:
            self.image_hw = self.pixel_hw
            self.channels = self.config.get("model_params", {}).get(
                "in_channels", 3
            )
        self.conditional = bool(self.config.get("conditional", False))
        self.num_classes = self.config.get("num_classes")
        self.default_cfg = float(self.config.get("cfg_scale", 1.8))

        self._model_fn = eval_model_fn(self.model, self.params)
        self._lock = threading.Lock()  # serialize device work
        # bounded queue: in-flight + waiting generates; beyond this -> 503
        self._slots = threading.BoundedSemaphore(max(1, int(max_queue)))

        # continuous batching (extension): slot-based stepwise engine —
        # requests join mid-flight instead of waiting for whole batches
        self.engine = None
        if continuous:
            from diffusion_models_collection_tpu.diffusion import DDIM
            from diffusion_models_collection_tpu.serving_engine import (
                ContinuousBatchingEngine,
            )

            if sampling_method != "ddim":
                raise ValueError(
                    "--continuous runs the stepwise DDIM engine; pass "
                    "--sampling_method ddim"
                )
            # the factory gives flow/edm/consistency checkpoints their
            # own process class regardless of sampling_method — stepping
            # those with DDIM updates would silently produce garbage
            if not isinstance(self.diffusion, DDIM):
                raise ValueError(
                    "--continuous requires a VP (DDPM/DDIM-family) "
                    "checkpoint; this one has diffusion_type="
                    f"{self.config.get('diffusion_type', 'ddpm')!r}"
                )
            if float(self.diffusion.eta) != 0.0:
                raise ValueError(
                    "--continuous is the deterministic (eta = 0) engine; "
                    f"this config sets ddim_eta={self.diffusion.eta}"
                )

            h, w = self.image_hw
            self.engine = ContinuousBatchingEngine(
                self.diffusion.schedule,
                self.diffusion._pair_fn(self._model_fn),
                image_shape=(h, w, self.channels),
                num_slots=self.batch_size,
                num_timesteps=self.diffusion.num_timesteps,
                # honor the sampler's exact grid (karras spacing etc.)
                timesteps=self.diffusion.inference_timesteps,
                guidance_rescale=self.diffusion.guidance_rescale,
                cfg_interval=self.diffusion.cfg_interval,
                conditional=self.conditional,
                clip_denoised=self.diffusion.clip_sample,
                steps_per_tick=steps_per_tick,
            ).start()

    def _resolve_labels(self, num_samples: int, labels):
        """Default + validate request labels (shared by both modes)."""
        if labels is None:
            # round-robin default, wrapping at num_classes (the
            # sample.py per-row convention)
            labels = [
                i % (self.num_classes or 1) for i in range(num_samples)
            ]
        if len(labels) != num_samples:
            raise ValueError("labels length must equal num_samples")
        if self.num_classes and any(
            not (0 <= l < self.num_classes) for l in labels
        ):
            raise ValueError(f"labels must be in [0, {self.num_classes})")
        return labels

    def warmup(self):
        t0 = time.time()
        self.generate(1, labels=[0] if self.conditional else None, seed=0)
        return time.time() - t0

    def generate(self, num_samples: int, labels=None, seed: int = 0,
                 cfg_scale: float | None = None) -> np.ndarray:
        """Images (num_samples, H, W, C) float32 in [0, 1]. Requests pad to
        the fixed serving batch so the compiled shape never changes."""
        if not (1 <= num_samples <= self.batch_size):
            raise ValueError(
                f"num_samples must be in [1, {self.batch_size}]"
            )
        if labels is not None and (
            not isinstance(labels, (list, tuple))
            or not all(isinstance(l, int) for l in labels)
        ):
            raise ValueError("labels must be a list of integers")
        h, w = self.image_hw

        if self.engine is not None:
            # continuous batching: submit and let the engine schedule;
            # no padding, no service-level lock — slots interleave
            rng = jax.random.PRNGKey(int(seed))
            _, init_rng = jax.random.split(rng)
            noise = np.asarray(jax.random.normal(
                init_rng, (num_samples, h, w, self.channels), jnp.float32
            ))
            if self.conditional:
                labels = self._resolve_labels(num_samples, labels)
                out = self.engine.submit(
                    noise, np.asarray(labels, np.int32) + 1,
                    cfg_scale=float(
                        self.default_cfg if cfg_scale is None else cfg_scale
                    ),
                )
            else:
                if labels is not None or cfg_scale is not None:
                    raise ValueError(
                        "this model is unconditional: labels/cfg_scale "
                        "are not supported"
                    )
                out = self.engine.submit(noise)
            if self.codec is not None:
                out = np.asarray(self.codec.decode(jnp.asarray(out)))
            return np.clip((out + 1.0) / 2.0, 0.0, 1.0).astype(np.float32)

        shape = (self.batch_size, h, w, self.channels)
        rng = jax.random.PRNGKey(int(seed))
        # multi-device host: shard the fixed serving batch over a 'data'
        # mesh (same trajectories; see factory.dp_sampling_sharding)
        dp_sharding = dp_sampling_sharding(self.batch_size)
        init_noise = (
            sharded_init_noise(rng, shape, dp_sharding)
            if dp_sharding is not None else None
        )

        if self.conditional:
            labels = self._resolve_labels(num_samples, labels)
            y = np.zeros((self.batch_size,), np.int32)
            y[:num_samples] = np.asarray(labels) + 1  # +1 shift, 0 = null
            y = jnp.asarray(y)
            if dp_sharding is not None:
                y = jax.device_put(y, dp_sharding)
            with self._lock:
                out = self.diffusion.sample_with_cfg(
                    self._model_fn, shape, y, rng,
                    cfg_scale=float(
                        self.default_cfg if cfg_scale is None else cfg_scale
                    ),
                    init_noise=init_noise,
                )
                if self.codec is not None:
                    out = self.codec.decode(out)
                # materialize INSIDE the lock: dispatch is async, so the
                # device is still running until this host transfer completes
                out = np.asarray(out[:num_samples])
        else:
            if labels is not None or cfg_scale is not None:
                raise ValueError(
                    "this model is unconditional: labels/cfg_scale are "
                    "not supported"
                )
            with self._lock:
                out = self.diffusion.sample(self._model_fn, shape, rng,
                                            init_noise=init_noise)
                if self.codec is not None:
                    out = self.codec.decode(out)
                out = np.asarray(out[:num_samples])
        return np.clip((out + 1.0) / 2.0, 0.0, 1.0).astype(np.float32)

    def try_acquire_slot(self) -> bool:
        return self._slots.acquire(blocking=False)

    def release_slot(self):
        self._slots.release()


def _png_grid(images: np.ndarray) -> bytes:
    from PIL import Image

    nrow = max(1, int(np.ceil(np.sqrt(len(images)))))
    grid = make_grid((np.clip(images, 0, 1) * 255).round().astype(np.uint8),
                     nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    buf = io.BytesIO()
    Image.fromarray(grid).save(buf, format="PNG")
    return buf.getvalue()


def make_handler(service: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                h, w = service.pixel_hw
                self._send_json(200, {
                    "status": "ok",
                    "model_type": service.config.get("model_type"),
                    "image_size": [h, w],
                    "conditional": service.conditional,
                    "num_classes": service.num_classes,
                    "max_batch": service.batch_size,
                })
            else:
                self._send_json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send_json(404, {"error": "not found"})
                return
            if not service.try_acquire_slot():
                self._send_json(503, {"error": "server overloaded"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                t0 = time.time()
                images = service.generate(
                    int(req.get("num_samples", 1)),
                    labels=req.get("labels"),
                    seed=int(req.get("seed", 0)),
                    cfg_scale=req.get("cfg_scale"),
                )
                elapsed = time.time() - t0
                if req.get("format", "png") == "npy":
                    buf = io.BytesIO()
                    np.save(buf, images)
                    self._send(200, buf.getvalue(),
                               "application/octet-stream")
                else:
                    self._send(200, _png_grid(images), "image/png")
                print(f"generated {len(images)} in {elapsed:.2f}s",
                      flush=True)
            except (ValueError, TypeError, KeyError,
                    json.JSONDecodeError) as e:
                self._send_json(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                service.release_slot()

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description="Serve a diffusion model")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--batch_size", type=int, default=16,
                        help="Fixed serving batch (requests pad to it)")
    parser.add_argument("--sampling_method", type=str, default="ddim",
                        choices=["ddpm", "ddim", "dpm++", "dpm++sde",
                                 "unipc"])
    parser.add_argument("--num_inference_steps", type=int, default=None)
    parser.add_argument("--use_ema", action="store_true")
    parser.add_argument("--mixed_precision", type=str, default=None,
                        choices=["bf16", "none"],
                        help="Override the checkpoint config's compute "
                             "dtype (bf16 inference on fp32 checkpoints)")
    parser.add_argument("--max_queue", type=int, default=8,
                        help="Max queued generate requests before 503")
    parser.add_argument("--continuous", action="store_true",
                        help="Continuous batching (extension): a stepwise "
                             "DDIM engine over --batch_size slots; requests "
                             "join mid-flight instead of waiting for whole "
                             "batch trajectories")
    parser.add_argument("--steps_per_tick", type=int, default=1,
                        help="with --continuous: denoising steps per "
                             "compiled engine tick — >1 amortizes the "
                             "per-dispatch host round-trip (decisive on "
                             "remote/tunneled runtimes) at the cost of "
                             "admission granularity of that many steps")
    parser.add_argument("--tome_ratio", type=float, default=0.0,
                        help="Token Merging (DiT checkpoints): merge this "
                             "fraction of patch tokens per block — "
                             "training-free serving speedup; 0 = off")
    parser.add_argument("--tome_mlp", action="store_true",
                        help="extend --tome_ratio merging to block MLPs")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="w8a8 int8 serving (DiT checkpoints): block "
                             "matmuls on the MXU int8 path")
    args = parser.parse_args(argv)

    service = SamplerService(
        args.checkpoint,
        sampling_method=args.sampling_method,
        num_inference_steps=args.num_inference_steps,
        batch_size=args.batch_size,
        use_ema=args.use_ema,
        mixed_precision=args.mixed_precision,
        max_queue=args.max_queue,
        continuous=args.continuous,
        steps_per_tick=args.steps_per_tick,
        tome_ratio=args.tome_ratio,
        tome_mlp=args.tome_mlp,
        quantize=args.quantize,
    )
    print("Warming up (compiling the sampler)...", flush=True)
    dt = service.warmup()
    print(f"Warmup done in {dt:.1f}s", flush=True)

    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(service)
    )
    print(f"Serving on http://{args.host}:{server.server_address[1]}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main(sys.argv[1:])
