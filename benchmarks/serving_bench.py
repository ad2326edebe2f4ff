#!/usr/bin/env python3
"""Serving benchmark: tiered batches, coalescing, and bulk throughput.

Starts the real HTTP server (``cli/serve.py``) in-process against a given
checkpoint on the live backend and measures, end to end over HTTP:

1. **Bulk throughput**: one 100k-molecule stochastic request (top tier).
2. **Small-request latency across tiers**: a 200-molecule request on the
   tiered server vs the same request forced through a top-tier-only server
   — the latency win of VERDICT r3 next #7.
3. **Coalescing invariance on the fused stochastic path** (TPU-only
   contract the CPU suite can't reach): several concurrent stochastic
   requests fired together; every response must equal its own solo rerun
   bitwise, and the server's pass counter shows they shared device passes
   when queued together.

Usage: ``python benchmarks/serving_bench.py --checkpoint ck/checkpoint_best.npz``
Writes ``benchmarks/serving.json``.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _post(base, payload, timeout=560):
    req = urllib.request.Request(
        base + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        out = json.loads(r.read())
    return out, time.perf_counter() - t0


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def start_server(ckpt, batch_sizes, max_length):
    from mlx_vae_tpu.cli.serve import build_parser, serve_forever

    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--port", "0", "--max_length",
         str(max_length), "--compute_dtype", "bfloat16",
         "--batch_sizes", batch_sizes])
    ready = threading.Event()
    threading.Thread(target=serve_forever, args=(args, ready),
                     daemon=True).start()
    assert ready.wait(timeout=1200), "server did not come up"
    return (f"http://127.0.0.1:{ready.server.server_address[1]}",
            ready.server, ready.service)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--batch_sizes", default="256,2048,8192")
    ap.add_argument("--max_length", type=int, default=64)
    args = ap.parse_args()

    results = {
        "description": "HTTP serving benchmark: size-tiered warm batches, "
                       "block-granular request coalescing, and background "
                       "ladder warm-up (serve after the smallest tier "
                       "compiles), measured end to end over real HTTP on "
                       "the live backend (see cli/serve.py and "
                       "docs/DESIGN.md 'Serving').",
        "config": {"batch_sizes": args.batch_sizes,
                   "max_length": args.max_length,
                   "checkpoint": args.checkpoint},
    }

    print(f"starting tiered server ({args.batch_sizes})...", flush=True)
    t0 = time.perf_counter()
    base, srv, service = start_server(args.checkpoint, args.batch_sizes,
                                      args.max_length)
    startup = time.perf_counter() - t0
    # Round-5 startup contract: the server answers once the SMALLEST tier
    # is warm and finishes the ladder on a background thread — so the
    # first molecule arrives while bigger tiers still compile. Measure
    # time-to-first-molecule first (the VERDICT r4 weak-#5 number: 315.8s
    # when the whole ladder warmed up front), then wait for the full
    # ladder for the steady-state sections below.
    out_first, dt_first = _post(base, {"num_molecules": 200,
                                       "target": [90.0],
                                       "temperature": 0.8, "seed": 1})
    results["startup_seconds_smallest_tier"] = round(startup, 1)
    results["time_to_first_molecule_seconds"] = round(startup + dt_first, 1)
    print(f"serving after {startup:.1f}s; first 200 molecules at "
          f"{startup + dt_first:.1f}s (background ladder warm-up running)",
          flush=True)
    assert service.wait_warm(timeout=1200), "background warm-up stalled"
    results["warm_compile_seconds"] = round(time.perf_counter() - t0, 1)
    health = _get(base, "/health")
    results["health"] = {k: health[k] for k in ("batch_tiers", "coalescing",
                                                "warmup")}
    print(f"full ladder warm in {results['warm_compile_seconds']}s; "
          f"coalescing={health['coalescing']}", flush=True)

    # 1. bulk throughput
    out, dt = _post(base, {"num_molecules": 100_000, "target": [90.0],
                           "temperature": 0.8, "seed": 5})
    results["bulk_100k"] = {
        "mols_per_sec_served": round(out["mols_per_sec"]),
        "wall_seconds_incl_http": round(dt, 2),
        "validity": out["validity"], "uniqueness": out["uniqueness"],
        "passes": out["passes"],
        "note": "end-to-end incl. the token download through the "
                "tunneled relay, whose bulk bandwidth varies 0.1-35 MB/s "
                "day to day — absolute mols/s is not comparable across "
                "runs/rounds unless max_length AND link conditions match",
    }
    print(f"bulk 100k: {out['mols_per_sec']:,.0f} mols/s "
          f"({out['passes']} passes)", flush=True)

    # 2. small-request latency, tiered
    lats = []
    for i in range(5):
        _, dt = _post(base, {"num_molecules": 200, "target": [90.0],
                             "temperature": 0.8, "seed": 100 + i})
        lats.append(dt)
    results["small_200_tiered_latency_s"] = round(min(lats), 3)
    print(f"small 200 (tiered): {min(lats)*1e3:.0f} ms", flush=True)

    # 3. coalescing invariance: solo reruns first, then concurrent burst
    solo = {}
    for seed in range(4):
        out, _ = _post(base, {"num_molecules": 100, "seed": seed,
                              "target": [60.0 + seed], "temperature": 0.9,
                              "return_tokens": True})
        solo[seed] = out["tokens"]
    passes_before = _get(base, "/health")["stats"]["device_passes"]
    burst, errs = {}, []

    def hit(seed):
        try:
            out, _ = _post(base, {"num_molecules": 100, "seed": seed,
                                  "target": [60.0 + seed],
                                  "temperature": 0.9,
                                  "return_tokens": True})
            burst[seed] = (out["tokens"], out["coalesced"])
        except Exception as e:  # noqa: BLE001 - recorded and failed below
            errs.append(repr(e))

    threads = [threading.Thread(target=hit, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=560)
    passes_after = _get(base, "/health")["stats"]["device_passes"]
    assert not errs, errs
    invariant = all(burst[s][0] == solo[s] for s in range(4))
    results["coalescing_burst"] = {
        "concurrent_requests": 4,
        "device_passes_used": passes_after - passes_before,
        "any_coalesced": any(c for _, c in burst.values()),
        "bitwise_equal_to_solo_reruns": invariant,
    }
    print(f"burst: {passes_after - passes_before} passes for 4 requests, "
          f"coalesced={results['coalescing_burst']['any_coalesced']}, "
          f"invariant={invariant}", flush=True)

    srv.shutdown()

    # 2b. top-tier-only control server for the latency comparison
    top = args.batch_sizes.split(",")[-1]
    print(f"starting single-tier control server ({top})...", flush=True)
    base2, srv2, _ = start_server(args.checkpoint, top, args.max_length)
    lats2 = []
    for i in range(5):
        _, dt = _post(base2, {"num_molecules": 200, "target": [90.0],
                              "temperature": 0.8, "seed": 100 + i})
        lats2.append(dt)
    srv2.shutdown()
    results["small_200_toptier_latency_s"] = round(min(lats2), 3)
    results["small_request_speedup"] = round(min(lats2) / min(lats), 2)
    print(f"small 200 (top tier only): {min(lats2)*1e3:.0f} ms -> "
          f"tiering speedup {results['small_request_speedup']}x", flush=True)

    ok = invariant and results["coalescing_burst"]["device_passes_used"] <= 4
    out_path = Path(__file__).parent / "serving.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}; ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
