"""Typed config + the union argparse surface.

The reference's flag system drifted across scripts (SURVEY.md §2.4): shared
``get_args`` (utils.py:17-54) defines --identifier_type/--regressor_type/
--filters/--env_dim, while train_semi.py consumes --conv_type/--dim/
--range_dim/--restorer_type/--classifier_type and test_semi.py adds
--ae_type. This module defines the UNION, with aliases resolving to one
typed Config, plus the env -> (num_classes, cir_len) derivation tables
(run.py:40-55, train_semi.py:46-63).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, asdict

NUM_CLASSES = {
    "nlos": 2,
    "room_full": 5,
    "obstacle_full": 10,
    "room_part": 3,
    "room_full_rough": 3,
    "obstacle_part": 4,
    "obstacle_part2": 2,
    "room_full_rough2": 2,
    "paper": 4,
}

CIR_LEN = {"zenodo": 157, "ewine": 152}

_NET_NAMES = {1: "Linear", 2: "Conv1d", 3: "Conv2d",
              "1": "Linear", "2": "Conv1d", "3": "Conv2d",
              "Linear": "Linear", "Conv1d": "Conv1d", "Conv2d": "Conv2d"}


@dataclass
class Config:
    # learning (utils.py:20-23)
    epoch: int = 0
    n_epochs: int = 500
    test_epoch: int = 500
    # optimization (utils.py:25-30)
    batch_size: int = 500
    lr: float = 1e-4
    b1: float = 0.5
    b2: float = 0.999
    decay_epoch: int = 100
    n_cpu: int = 8
    # network choice (utils.py:33)
    net_ablation: str = "loop"  # loop | loops
    # network structure (utils.py:36-42 + train_semi drift)
    n_residual: int = 3
    n_downsample: int = 4
    filters: int = 16
    env_dim: int = 16
    use_soft: bool = False
    identifier_type: str = "Linear"
    regressor_type: str = "Linear"
    conv_type: int = 1
    dim: int = 4
    range_dim: int = 2
    restorer_type: str = "Linear"
    classifier_type: str = "Linear"
    # data (utils.py:45-48)
    dataset_name: str = "zenodo"
    dataset_env: str = "nlos"
    mode: str = "full"
    split_factor: float = 0.8
    # intervals (utils.py:51-52)
    sample_interval: int = 20
    checkpoint_interval: int = 50
    keep_last: int = -1  # checkpoint GC: keep newest N (+best); <=0 keeps all
    # semi (train_semi.py:34)
    supervision_rate: float = 0.1
    mask_mode: str = "sample"  # sample (intent) | batch (reference literal)
    kl_free_bits: float = 0.0  # per-dim KL floor; 0 = reference-exact
    profile_dir: str = ""  # jax.profiler trace dir ('' = off)
    # runtime (new)
    n_devices: int = 1  # data-parallel shards (1 = single device)
    # multi-host (parallel/multihost.py): join a jax.distributed cluster and
    # train DP over ALL processes' devices; only the per-step gradient
    # pmean crosses DCN. dist_procs <= 1 = single-host (no coordinator dial)
    dist_coordinator: str = ""
    dist_procs: int = 1
    dist_rank: int = -1
    seed: int = 0
    data_root: str = "./data/data_zenodo/dataset.pkl"
    out_dir: str = "./saved_results"
    model_dir: str = "./saved_models"
    compute_dtype: str = "float32"
    # env-branch conv init: 'reference' = weights_init_normal N(0, 0.02)
    # (reference models.py:8-14); 'torch' = torch's Conv default — opt-in
    # deviation, +8 points env accuracy at equal range RMSE (BASELINE.md)
    env_conv_init: str = "reference"
    allow_synthetic: bool = True  # fall back to the synthetic fixture
    data_cache: bool = True  # mmap binary cache of the assembled split
    synthetic_n: int = 8192
    # synthetic fixture generator version (data/synthetic.py): v2 adds
    # learnable material signatures; v1 kept for pre-round-5 continuity
    fixture_version: int = 2

    # ------- derived -------
    @property
    def cir_len(self) -> int:
        return CIR_LEN[self.dataset_name]

    @property
    def num_classes(self) -> int:
        if self.dataset_name == "ewine":
            return 2
        return NUM_CLASSES[self.dataset_env]

    @property
    def expand(self) -> bool:
        return self.conv_type != 1

    @property
    def range_code_shape(self):
        l = 128 // (2**self.n_downsample)
        if self.conv_type == 1:
            return (l, self.range_dim)
        return (l, l, self.range_dim)

    def to_dict(self) -> dict:
        return asdict(self)


def add_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """The union CLI. Every reference flag plus the drifted aliases."""
    d = Config()
    a = parser.add_argument
    a("--epoch", type=int, default=d.epoch, help="epoch to start training from")
    a("--n_epochs", type=int, default=d.n_epochs)
    a("--test_epoch", type=int, default=d.test_epoch)
    a("--batch_size", type=int, default=d.batch_size)
    a("--lr", type=float, default=d.lr)
    a("--b1", type=float, default=d.b1)
    a("--b2", type=float, default=d.b2)
    a("--decay_epoch", type=int, default=d.decay_epoch)
    a("--n_cpu", type=int, default=d.n_cpu)
    a("--net_ablation", type=str, default=d.net_ablation, choices=["loop", "loops"])
    a("--n_residual", type=int, default=d.n_residual)
    a("--n_downsample", type=int, default=d.n_downsample)
    a("--filters", type=int, default=d.filters)
    a("--env_dim", type=int, default=d.env_dim)
    a("--use_soft", action="store_true", default=d.use_soft)
    a("--identifier_type", type=str, default="1", help="1 Linear / 2 Conv1d / 3 Conv2d")
    a("--regressor_type", type=str, default="1")
    a("--conv_type", type=int, default=d.conv_type, help="1 Conv1d / 2 Conv2d (expand)")
    a("--ae_type", type=int, default=None, help="alias of --conv_type (test_semi.py)")
    a("--dim", type=int, default=d.dim)
    a("--range_dim", type=int, default=d.range_dim)
    a("--restorer_type", type=str, default="Linear")
    a("--classifier_type", type=str, default="Linear")
    a("--dataset_name", type=str, default=d.dataset_name, choices=["zenodo", "ewine"])
    a("--dataset_env", type=str, default=d.dataset_env)
    a("--mode", type=str, default=d.mode, choices=["full", "paper"])
    a("--split_factor", type=float, default=d.split_factor)
    a("--sample_interval", type=int, default=d.sample_interval)
    a("--checkpoint_interval", type=int, default=d.checkpoint_interval)
    a("--keep_last", type=int, default=d.keep_last,
      help="checkpoint GC: keep only the newest N epoch checkpoints (plus the best); <=0 keeps all")
    a("--supervision_rate", type=float, default=d.supervision_rate)
    a("--mask_mode", type=str, default=d.mask_mode, choices=["sample", "batch"])
    a("--kl_free_bits", type=float, default=d.kl_free_bits,
      help="floor each env-latent dim's KL at this value (free bits; 0 = "
           "reference-exact plain KL). Opt-in stabilizer for the measured "
           "1-D KL-collapse seed variance (BASELINE.md round 4)")
    a("--profile_dir", type=str, default=d.profile_dir, help="write a jax.profiler trace here")
    a("--n_devices", type=int, default=d.n_devices,
      help="shard training batches over N local devices (shard_map DP over a "
           "1-axis mesh; params replicated, grads pmean'd over ICI)")
    a("--dist_coordinator", type=str, default=d.dist_coordinator,
      help="multi-host: jax.distributed coordinator host:port")
    a("--dist_procs", type=int, default=d.dist_procs,
      help="multi-host: total number of processes (1 = single-host)")
    a("--dist_rank", type=int, default=d.dist_rank,
      help="multi-host: this process's id in [0, dist_procs)")
    a("--seed", type=int, default=d.seed)
    a("--data_root", type=str, default=d.data_root)
    a("--out_dir", type=str, default=d.out_dir)
    a("--model_dir", type=str, default=d.model_dir)
    a("--compute_dtype", type=str, default=d.compute_dtype)
    a("--env_conv_init", type=str, default=d.env_conv_init,
      choices=["reference", "torch"])
    a("--no_synthetic", action="store_true", help="fail instead of falling back to the synthetic fixture")
    a("--no_data_cache", action="store_true", help="disable the mmap binary dataset cache")
    a("--synthetic_n", type=int, default=d.synthetic_n)
    a("--fixture_version", type=int, default=d.fixture_version, choices=[1, 2],
      help="synthetic fixture generation: 2 (default) adds scale-invariant "
           "material resonance signatures; 1 is the pre-round-5 generator")
    return parser


def from_args(args: argparse.Namespace) -> Config:
    cfg = Config()
    for k in vars(args):
        if hasattr(cfg, k):
            setattr(cfg, k, getattr(args, k))
    if getattr(args, "ae_type", None) is not None:
        cfg.conv_type = args.ae_type
    if getattr(args, "no_synthetic", False):
        cfg.allow_synthetic = False
    if getattr(args, "no_data_cache", False):
        cfg.data_cache = False
    # normalize the two net-type vocabularies
    cfg.identifier_type = _NET_NAMES[getattr(args, "identifier_type", "1")]
    cfg.regressor_type = _NET_NAMES[getattr(args, "regressor_type", "1")]
    cfg.restorer_type = _NET_NAMES[args.restorer_type]
    cfg.classifier_type = _NET_NAMES[args.classifier_type]
    if cfg.dataset_env not in NUM_CLASSES and cfg.dataset_name == "zenodo":
        raise ValueError(
            f"Unknown environment {cfg.dataset_env!r}; choices: {sorted(NUM_CLASSES)}"
        )
    if cfg.env_conv_init == "torch" and cfg.conv_type == 2:
        raise ValueError(
            "--env_conv_init torch diverges (NaN within the first epochs, "
            "measured f32 AND bf16 — BASELINE.md round-3 'Scope caveat') on "
            "the conv_type=2 expanded path: the 2-D env encoder has no "
            "normalization (reference models.py:304-350), so torch-default "
            "init leaves the (mu, log_sigma) head O(1)+ and the KL blows up. "
            "Use the default --env_conv_init reference with conv_type=2."
        )
    if cfg.n_devices > 1 and cfg.batch_size % cfg.n_devices:
        raise ValueError(
            f"--batch_size {cfg.batch_size} must be divisible by "
            f"--n_devices {cfg.n_devices}"
        )
    if cfg.dist_procs > 1:
        if not cfg.dist_coordinator or cfg.dist_rank < 0:
            raise ValueError(
                "--dist_procs > 1 needs --dist_coordinator host:port and "
                "--dist_rank (0-based process id)"
            )
        if cfg.n_devices > 1:
            raise ValueError(
                "--n_devices is single-host only; multi-host DP "
                "(--dist_procs) always uses every process's devices"
            )
    return cfg


def parse(argv=None) -> Config:
    parser = argparse.ArgumentParser()
    add_args(parser)
    return from_args(parser.parse_args(argv))
