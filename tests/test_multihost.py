"""Multi-host (DCN) distributed training, tested with REAL separate
processes: 2 jax.distributed processes x 4 virtual CPU devices each, Gloo
cross-process collectives, driving the actual user-facing CLI
(`train_semi --dist_coordinator ... --dist_procs 2 --dist_rank R`).

Asserts the multi-controller contract end-to-end: both ranks finish, the
replicated params are BIT-IDENTICAL across processes after training, only
the primary writes checkpoints/artifacts, and the primary's final eval
produces finite metrics. (The reference has no distributed code at all —
SURVEY.md §5.8; this is the new-build runtime's multi-host layer,
parallel/multihost.py.)
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import hashlib, sys
import numpy as np
rank, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
sys.path.insert(0, {repo!r})
from iinsvae_tpu.cli.train_semi import main

state, m = main([
    "--dist_coordinator", "127.0.0.1:" + port,
    "--dist_procs", "2",
    "--dist_rank", str(rank),
    "--n_epochs", "2",
    "--batch_size", "64",
    "--synthetic_n", "192",
    "--dataset_env", "room_full",
    "--supervision_rate", "1.0",
    "--checkpoint_interval", "-1",
    "--sample_interval", "0",
    "--no_data_cache",
    "--model_dir", tmp + "/models",
    "--out_dir", tmp + "/results",
])
import jax
leaves = jax.tree.leaves(state.params)
digest = hashlib.sha256(
    b"".join(np.asarray(l).tobytes() for l in leaves)
).hexdigest()
print("DIGEST", digest, flush=True)
if m:
    print("RMSE", float(m["rmse"]), flush=True)
print("WORKER-OK", rank, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+\s*",
        "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count=4".strip()
    )
    return env


JOINT_WORKER = """
import hashlib, sys
import numpy as np
rank, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
sys.path.insert(0, {repo!r})
from iinsvae_tpu.cli.run import main

state, m = main([
    "--dist_coordinator", "127.0.0.1:" + port,
    "--dist_procs", "2",
    "--dist_rank", str(rank),
    "--net_ablation", "loop",
    "--n_epochs", "2",
    "--batch_size", "64",
    "--synthetic_n", "160",
    "--dataset_env", "nlos",
    "--checkpoint_interval", "-1",
    "--sample_interval", "0",
    "--no_data_cache",
    "--model_dir", tmp + "/models",
    "--out_dir", tmp + "/results",
])
import jax
leaves = jax.tree.leaves(state.params)
digest = hashlib.sha256(
    b"".join(np.asarray(l).tobytes() for l in leaves)
).hexdigest()
print("DIGEST", digest, flush=True)
if m:
    print("RMSE", float(m["rmse"]), flush=True)
print("WORKER-OK", rank, flush=True)
"""


def _launch_pair(tmp_path, worker_src):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(worker_src.format(repo=REPO))
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"WORKER-OK {r}" in out, out[-2000:]
    return outs


def test_two_process_dp_training(tmp_path):
    outs = _launch_pair(tmp_path, WORKER)

    # bit-identical replicated params on both processes
    digests = [re.search(r"DIGEST (\w+)", o).group(1) for o in outs]
    assert digests[0] == digests[1], f"params diverged: {digests}"

    # the primary evaluated (finite metrics) and owns the checkpoint tree;
    # the non-primary wrote neither checkpoints nor artifacts
    rmse = float(re.search(r"RMSE ([0-9.eE+-]+)", outs[0]).group(1))
    assert 0.0 < rmse < 10.0, rmse
    assert "RMSE" not in outs[1]
    model_root = tmp_path / "models"
    ckpts = [
        d for _, dirs, _ in os.walk(model_root) for d in dirs
        if d.startswith("epoch_")
    ]
    assert ckpts, "primary wrote no final checkpoint"
    rank_logs = [
        f for _, _, files in os.walk(tmp_path / "results") for f in files
        if f == "train_log.rank1.log"
    ]
    assert rank_logs, "non-primary rank log missing"


def test_two_process_joint_driver(tmp_path):
    """The supervised joint driver (run.py) over the same multi-host layer:
    both ranks converge to bit-identical params; the primary runs the full
    test_gem evaluation (SVM comparison included) alone."""
    outs = _launch_pair(tmp_path, JOINT_WORKER)
    digests = [re.search(r"DIGEST (\w+)", o).group(1) for o in outs]
    assert digests[0] == digests[1], f"params diverged: {digests}"
    rmse = float(re.search(r"RMSE ([0-9.eE+-]+)", outs[0]).group(1))
    assert 0.0 < rmse < 10.0, rmse
    assert "RMSE" not in outs[1]
