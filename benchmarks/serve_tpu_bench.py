#!/usr/bin/env python
"""End-to-end serving measurement ON THE CHIP (VERDICT round-3 item 5):
native unix-socket front -> C++ batcher -> device-pinned Predictor running
the REAL jitted flagship forward on the TPU — not the no-op queue-plane
bench (benchmarks/batcher_bench.py).

Caveat documented inline with the numbers: this environment reaches its
one v5e chip through a relay tunnel, so EVERY synced batch dispatch
carries a ~33 ms round trip and host<->device transfer runs ~5 MB/s
(CLAUDE.md). The measured req/s is therefore a LOWER bound dominated by
tunnel latency, not by the model (0.2 ms of compute per 500-row batch);
on a directly-attached chip the same stack's ceiling is the queue plane
(46.8k req/s, batcher_bench) against the model's 4M samples/sec batch
inference. Run on the default platform env:

    python benchmarks/serve_tpu_bench.py --clients 8 --reqs 40 --rows 64
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import threading
import time

import numpy as np

L = 157


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=40, help="requests per client")
    ap.add_argument("--rows", type=int, default=64, help="CIR rows per request")
    ap.add_argument("--serve_batch", type=int, default=500)
    ap.add_argument("--deadline_ms", type=float, default=5.0)
    args = ap.parse_args()

    import jax

    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.serving import Predictor
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state
    from iinsvae_tpu.runtime.batcher import (
        SocketFront, serve_predictor, socket_client_request,
    )

    platform = jax.devices()[0].platform
    model = IInsVAE(cir_len=L, num_classes=5, style_dim=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.ones((2, L), np.float32))
    state = create_train_state(
        model, variables, make_optimizer(n_epochs=10, decay_start_epoch=5))
    predictor = Predictor(model, state, batch_size=args.serve_batch)

    # warm the compile + one roundtrip before timing
    warm = predictor(np.zeros((4, L), np.float32))
    assert np.isfinite(warm.err_est).all()

    with serve_predictor(predictor, batch_size=args.serve_batch,
                         deadline_ms=args.deadline_ms) as srv:
        if not srv.native:
            raise SystemExit("native batcher plane unavailable")
        sock = os.path.join(tempfile.mkdtemp(), "iins_bench.sock")
        front = SocketFront(srv, sock)
        lat, lock = [], threading.Lock()

        def client(i):
            rng = np.random.default_rng(i)
            mine = []
            for _ in range(args.reqs):
                x = rng.normal(size=(args.rows, L))
                t0 = time.perf_counter()
                err, label, *_ = socket_client_request(sock, x, timeout_s=120.0)
                mine.append(time.perf_counter() - t0)
                assert np.isfinite(err).all(), "server returned failed rows"
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        front.stop()

    lat = np.sort(np.asarray(lat))
    n_req = args.clients * args.reqs
    out = {
        "metric": "serving_e2e_real_model",
        "platform": platform,
        "req_per_s": round(n_req / wall, 1),
        "rows_per_s": round(n_req * args.rows / wall, 1),
        "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 2),
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1e3, 2),
        "clients": args.clients,
        "rows_per_req": args.rows,
        "serve_batch": args.serve_batch,
        "note": "tunnel-bound on this environment (~33 ms/dispatch RT)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
