#!/usr/bin/env python3
"""Molecule-generation server.

A lightweight serving layer over a trained checkpoint — the deployment
surface the reference lacks entirely (its generation is reachable only by
writing Python against ``ARCVAE.generate``). Stdlib-only (``http.server``),
no new dependencies.

Design for the single-accelerator serving reality:

* **Warm compiles**: both samplers (stochastic + greedy) are jitted at a
  FIXED server batch size at startup, so no request ever pays a compile
  (dynamic per-request values — temperature, targets, seed — are jit
  inputs; per-request sizes are served by padding the fixed batch and
  trimming). Remote-TPU compiles take 60-120s; paying them per-request
  would be fatal.
* **One device, one queue**: requests execute under a lock (JAX dispatch
  is not re-entrant-safe across threads for one chip); the HTTP layer is
  threaded so health checks never queue behind generation.
* **Checkpoint-embedded stats**: raw property targets are z-scored with
  the train-set stats exactly like ``generate.py`` (``cli/common.py``);
  ``--data`` overrides.

Endpoints::

    GET  /health            -> {"status": "ok", "model": {...}}
    POST /generate          <- {"num_molecules": 1000, "target": [90.0],
                                "temperature": 0.8, "greedy": false,
                                "seed": 0, "return_tokens": false}
                            -> {"selfies": [...], "validity": ..,
                                "uniqueness": .., "mols_per_sec": ..}

``top_k``/``top_p`` are jit-static in the sampler and would recompile per
distinct value — unsupported here by design; use ``generate.py`` for
truncated sampling. Requests above ``--max_molecules`` are rejected rather
than queued unboundedly.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Serve molecule generation over HTTP")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--data", type=str, default=None,
                   help="Dataset JSON (stats + alphabet; else from checkpoint)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch_size", type=int, default=4096,
                   help="Fixed jit batch; requests are padded/looped to it")
    p.add_argument("--max_length", type=int, default=64)
    p.add_argument("--max_molecules", type=int, default=1_000_000,
                   help="Reject larger requests instead of queueing them")
    p.add_argument("--no_normalize", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    from mlx_vae_tpu.utils.compile_cache import add_cache_flags
    add_cache_flags(p)
    return p


class GenerationService:
    """Checkpoint + two warm jitted samplers + the device lock."""

    def __init__(self, args):
        from mlx_vae_tpu.cli.common import resolve_property_stats
        from mlx_vae_tpu.cli.generate import infer_model_shape
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models.sampling import generate_with_temperature
        from mlx_vae_tpu.ops.pallas_decoder import (pallas_generate,
                                                    pallas_generate_supported)
        from mlx_vae_tpu.train.checkpoint import load_checkpoint

        ckpt = load_checkpoint(args.checkpoint)
        dec = ckpt["params"]["decoder"]
        self.shape = infer_model_shape(dec)
        self.cfg = ModelConfig(compute_dtype=args.compute_dtype,
                               use_pallas=jax.default_backend() == "tpu",
                               **self.shape)
        self.mean, self.std, self.alphabet, _ = resolve_property_stats(
            args.data, args.no_normalize, ckpt, self.cfg.num_conditions)
        self.batch = args.batch_size
        self.max_length = args.max_length
        self.max_molecules = args.max_molecules
        self.lock = threading.Lock()

        # Unlike generate.py's make_generate_fn (temperature baked at
        # closure time), the server takes temperature as a jit INPUT —
        # both samplers treat it as a traced operand (pallas_generate
        # feeds it through SMEM), so every request shares two programs.
        def make(greedy):
            fused = pallas_generate_supported(self.cfg, self.batch,
                                              greedy=greedy)
            gen = pallas_generate if fused else generate_with_temperature

            def local(z, cond, kg, temperature):
                return gen(dec, self.cfg, z, cond, kg,
                           max_length=self.max_length,
                           temperature=temperature, greedy=greedy)
            return jax.jit(local)

        self.fns = {greedy: make(greedy) for greedy in (False, True)}

        # Warm both compiled paths so the first request is fast.
        t0 = time.perf_counter()
        for greedy in (False, True):
            np.asarray(self._run_batch(greedy, 1.0,
                                       np.zeros((1, self.cfg.num_conditions),
                                                np.float32),
                                       jax.random.PRNGKey(0)))
        print(f"Warmed stochastic+greedy samplers in "
              f"{time.perf_counter() - t0:.1f}s (batch {self.batch})")

    def _run_batch(self, greedy, temperature, target_norm, key):
        kz, kg = jax.random.split(key)
        z = jax.random.normal(kz, (self.batch, self.cfg.latent_dim),
                              jnp.float32)
        cond = jnp.broadcast_to(
            jnp.asarray(target_norm, jnp.float32),
            (self.batch, self.cfg.num_conditions))
        toks = self.fns[greedy](z, cond, kg, jnp.float32(temperature))
        # Quarter the device->host transfer when ids fit a byte
        # (generate.py does the same).
        return toks.astype(jnp.uint8) if self.cfg.vocab_size < 256 else toks

    @staticmethod
    def _number(req: dict, field: str, default, kind):
        """Fetch a numeric request field, rejecting JSON booleans — bool is
        an int subclass, so ``{"seed": true}`` would otherwise silently
        coerce (``int(True) == 1``) instead of returning the 400 the
        validation contract promises (ADVICE r3)."""
        v = req.get(field, default)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(f"{field} must be a number, got {v!r}")
        return kind(v)

    def generate(self, req: dict) -> dict:
        from mlx_vae_tpu.cli.common import normalized_targets
        from mlx_vae_tpu.data.metrics import uniqueness
        from mlx_vae_tpu.data.prepare import decode_tokens, selfies_validity

        n = req.get("num_molecules", 100)
        # Must be an exact int (no bools, no floats): tokens[:True] would
        # silently generate 1 molecule.
        if isinstance(n, bool) or not isinstance(n, int) \
                or not 1 <= n <= self.max_molecules:
            raise ValueError(f"num_molecules must be an int in "
                             f"[1, {self.max_molecules}], got {n!r}")
        temperature = self._number(req, "temperature", 1.0, float)
        if temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        greedy = bool(req.get("greedy", False))
        if "top_k" in req or "top_p" in req:
            raise ValueError("top_k/top_p are not served (jit-static in the "
                             "sampler); use generate.py for truncation")
        target = req.get("target", [90.0])
        if not isinstance(target, list) or any(
                isinstance(t, bool) or not isinstance(t, (int, float))
                for t in target):
            raise ValueError(f"target must be a list of numbers, got {target!r}")
        target = [float(t) for t in target]
        tn = normalized_targets(target, self.mean, self.std,
                                self.cfg.num_conditions)
        key = jax.random.PRNGKey(self._number(req, "seed", 0, int))

        with self.lock:
            t0 = time.perf_counter()
            chunks = []
            for _ in range(-(-n // self.batch)):
                key, k = jax.random.split(key)
                toks = self._run_batch(greedy, temperature, tn, k)
                if hasattr(toks, "copy_to_host_async"):
                    toks.copy_to_host_async()
                chunks.append(toks)
            tokens = np.concatenate([np.asarray(c) for c in chunks])[:n]
            dt = time.perf_counter() - t0

        out = {
            "num_molecules": int(n),
            "target": target,
            "temperature": temperature,
            "greedy": greedy,
            "mols_per_sec": n / dt,
            "validity": selfies_validity(tokens, self.alphabet or []),
            "uniqueness": uniqueness(tokens),
        }
        if self.alphabet:
            limit = self._number(req, "max_selfies", 1000, int)
            out["selfies"] = [decode_tokens(t, self.alphabet)
                              for t in tokens[:limit]]
        if req.get("return_tokens"):
            out["tokens"] = tokens.tolist()
        return out

    def health(self) -> dict:
        return {"status": "ok", "model": self.shape,
                "batch_size": self.batch, "max_length": self.max_length,
                "backend": jax.default_backend(),
                "alphabet_size": len(self.alphabet or [])}


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, service.health())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                self._send(200, service.generate(req))
            except (ValueError, TypeError, KeyError, json.JSONDecodeError,
                    SystemExit) as e:
                # TypeError covers wrong JSON field types (e.g. a scalar
                # where a list is required, or null seed) — without it the
                # handler thread dies and the client sees a connection
                # reset instead of the JSON 400 contract.
                self._send(400, {"error": str(e)})

        def log_message(self, fmt, *fmt_args):  # quiet per-request stderr
            pass

    return Handler


def serve_forever(args, ready_event=None):
    """Build the service, bind, and serve. ``ready_event`` (tests) is set
    once the socket is bound and samplers are warm; the bound server is
    stashed on the event for shutdown."""
    service = GenerationService(args)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    if ready_event is not None:
        ready_event.server = server
        ready_event.set()
    print(f"Serving on http://{server.server_address[0]}:"
          f"{server.server_address[1]} (POST /generate, GET /health)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


def main(argv=None):
    from mlx_vae_tpu.utils.compile_cache import setup_cache_from_args
    args = build_parser().parse_args(argv)
    setup_cache_from_args(args)
    serve_forever(args)


if __name__ == "__main__":
    main()
