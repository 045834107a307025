"""`serve` entry: the deployment surface of the framework (new-build —
the reference has no serving path, SURVEY.md §5.8).

Loads a trained semi-path checkpoint into a ``serving.Predictor`` (one
fixed-shape jitted forward) and fronts it with the native request batcher
and, optionally, the unix-socket listener — external clients then speak
the framed protocol (``runtime/batcher.py::socket_client_request``) and
share batches with in-process traffic.

    python serve.py --dataset_env room_full --epoch 400 \
        --socket /tmp/iins.sock --serve_batch 256 --deadline_ms 3

Without --socket it runs a self-test loop (N random requests through the
full stack) and exits — the smoke mode the CLI tests drive.
"""

from __future__ import annotations

import time

import numpy as np

from iinsvae_tpu.config import Config, parse


def main(argv=None, cfg: Config | None = None):
    import argparse

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--socket", default="", help="unix socket path; empty = self-test mode")
    extra.add_argument("--tcp_port", type=int, default=-1,
                       help="TCP listen port (0 = ephemeral); -1 = no TCP front")
    extra.add_argument("--probs", action="store_true",
                       help="append env-class probabilities to every result")
    extra.add_argument("--recon", action="store_true",
                       help="append the reconstructed CIR to every result")
    extra.add_argument("--serve_batch", type=int, default=256)
    extra.add_argument("--deadline_ms", type=float, default=3.0)
    extra.add_argument("--selftest_n", type=int, default=64)
    extra.add_argument("--serve_devices", type=int, default=1,
                       help="data-parallel serving: one device-pinned "
                            "predictor + worker per chip, sharing the "
                            "request queue")
    ns, rest = extra.parse_known_args(argv)
    cfg = cfg or parse(rest)

    from iinsvae_tpu.serving import Predictor
    from iinsvae_tpu.runtime.batcher import (
        BatchServer, SocketFront, TcpFront, serve_predictor,
    )

    predictor = Predictor.from_checkpoint(cfg, epoch=cfg.epoch if cfg.epoch > 0 else None,
                                          batch_size=ns.serve_batch,
                                          return_recon=ns.recon)
    predictors = predictor
    if ns.serve_devices > 1:
        import jax
        devs = jax.devices()
        if ns.serve_devices > len(devs):
            raise ValueError(
                f"--serve_devices {ns.serve_devices} > {len(devs)} visible "
                f"devices")
        predictors = [Predictor(predictor.model, predictor.state,
                                batch_size=ns.serve_batch,
                                return_recon=ns.recon, device=d)
                      for d in devs[: ns.serve_devices]]
    server = serve_predictor(predictors, cir_len=cfg.cir_len,
                             batch_size=ns.serve_batch,
                             deadline_ms=ns.deadline_ms,
                             with_probs=ns.probs, with_recon=ns.recon)
    plane = "native" if server.native else "python-fallback"
    print(f"[serve] predictor ready (cir_len={cfg.cir_len}, "
          f"batch={ns.serve_batch}, workers={len(server._compute_fns)}, "
          f"plane={plane}, payload=err,label+{server.n_extra})", flush=True)

    try:
        if ns.socket or ns.tcp_port >= 0:
            fronts = []
            if ns.socket:
                fronts.append(SocketFront(server, ns.socket))
                print(f"[serve] listening on {ns.socket}", flush=True)
            if ns.tcp_port >= 0:
                tcp = TcpFront(server, ns.tcp_port)
                fronts.append(tcp)
                print(f"[serve] listening on tcp port {tcp.port}", flush=True)
            print("[serve] Ctrl-C to stop", flush=True)
            try:
                while True:
                    time.sleep(3600)
            except KeyboardInterrupt:
                pass
            finally:
                for f in fronts:
                    f.stop()
        else:
            rng = np.random.default_rng(0)
            cirs = rng.normal(size=(ns.selftest_n, cfg.cir_len))
            t0 = time.perf_counter()
            outs = [server.submit(cirs[i], timeout_s=300.0)
                    for i in range(ns.selftest_n)]
            dt = time.perf_counter() - t0
            assert all(o is not None for o in outs), "self-test request lost"
            errs = np.array([o[0] for o in outs])
            print(f"[serve] self-test ok: {ns.selftest_n} requests in "
                  f"{dt:.2f}s, err range ({errs.min():.4f}, {errs.max():.4f})",
                  flush=True)
    finally:
        st = server.stats()
        print(f"[serve] stats: {st['submitted']} submitted, "
              f"{st['batches']} batches (mean occupancy "
              f"{st['mean_occupancy']:.1f}/{ns.serve_batch}, "
              f"{st['full_batches']} full), mean queue "
              f"{st['mean_queue_ms']:.2f} ms, {st['wait_timeouts']} client "
              f"timeouts, {st['reclaimed']} reclaimed", flush=True)
        server.stop()


if __name__ == "__main__":
    main()
