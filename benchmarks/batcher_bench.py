#!/usr/bin/env python
"""Serving-front microbench: request latency and sustained throughput
through the native batcher plane (runtime_native/iinsvae_batcher.cc) vs
the python fallback, with a no-op compute (measures the QUEUEING plane,
not the model). Run with the default platform env — no device is touched.
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np

from iinsvae_tpu.runtime.batcher import BatchServer

L = 157


def _compute(cirs):
    return cirs.mean(axis=1), np.zeros(len(cirs), dtype=np.int64)


def _make_compute(step_ms: float):
    if step_ms <= 0:
        return _compute

    def fn(cirs):
        # stand-in for a fixed-duration accelerator step; time.sleep
        # releases the GIL exactly like an XLA dispatch does, so N workers
        # genuinely overlap
        time.sleep(step_ms / 1e3)
        return _compute(cirs)

    return fn


def bench(prefer_native: bool, n_clients: int, reqs_per_client: int,
          workers: int = 1, step_ms: float = 0.0):
    lat = []
    lock = threading.Lock()

    fns = [_make_compute(step_ms) for _ in range(workers)]
    with BatchServer(fns, cir_len=L, batch_size=64, max_pending=4096,
                     deadline_ms=2.0, prefer_native=prefer_native) as srv:
        mode = "native" if srv.native else "python"

        def client(i):
            rng = np.random.default_rng(i)
            mine = []
            for _ in range(reqs_per_client):
                x = rng.normal(size=L)
                t0 = time.perf_counter()
                out = srv.submit(x, timeout_s=30.0)
                mine.append(time.perf_counter() - t0)
                assert out is not None
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

    lat = np.sort(np.asarray(lat))
    n = len(lat)
    return {
        "mode": mode,
        "workers": workers,
        "step_ms": step_ms,
        "clients": n_clients,
        "requests": n,
        "throughput_rps": round(n / wall),
        "p50_ms": round(float(lat[n // 2]) * 1e3, 3),
        "p99_ms": round(float(lat[int(n * 0.99)]) * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--reqs", type=int, default=200)
    ap.add_argument("--workers", type=int, default=1,
                    help="compute workers pulling from the shared queue")
    ap.add_argument("--step_ms", type=float, default=0.0,
                    help="simulated per-batch compute duration (sleep, "
                         "GIL-releasing) — shows multi-worker overlap")
    args = ap.parse_args()
    for native in (True, False):
        print(json.dumps(bench(native, args.clients, args.reqs,
                               args.workers, args.step_ms)), flush=True)


if __name__ == "__main__":
    main()
