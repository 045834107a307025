"""Data-inspection driver: the reference's manual smoke-test mains
(data_tools.py:453-486, dataset.py:139-241) as one command.

  python -m iinsvae_tpu.cli.inspect_data --dataset_name zenodo --dataset_env room_full

Prints shapes, value ranges (pre/post scaling), split sizes, pipeline wall
time, and saves a sample-CIR plot.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from iinsvae_tpu.config import Config, add_args, from_args
from iinsvae_tpu.cli.common import resolve_data
from iinsvae_tpu.data.zenodo import label_int2str
from iinsvae_tpu.data.pipeline import UWBDataset


def verify_data_main(cfg: Config) -> int:
    """--verify_data: validate real-dataset placement (schema + documented
    scale) without training anything. Exit code 0 = usable schema."""
    from iinsvae_tpu.data.verify import print_report, verify_ewine, verify_zenodo

    if cfg.dataset_name == "zenodo":
        report = verify_zenodo(cfg.data_root)
        print_report("zenodo %s" % cfg.data_root, report)
    else:
        # --data_root points at the zenodo pickle by default; for ewine,
        # verify the directory the user names, falling back to the
        # conventional ./data/data_ewine ONLY when --data_root was left at
        # its (zenodo) default — never silently substitute a different
        # tree for one the user asked about
        if cfg.data_root == Config().data_root:
            base = "./data/data_ewine"
        else:
            base = cfg.data_root
        report = verify_ewine(base)
        print_report("ewine %s" % base, report)
    return 0 if report["ok"] else 1


def main(argv=None, cfg: Config | None = None):
    if cfg is None:
        parser = add_args(argparse.ArgumentParser())
        parser.add_argument(
            "--verify_data", action="store_true",
            help="validate real-dataset placement (schema + documented "
                 "counts) and exit; see docs/data.md",
        )
        args = parser.parse_args(argv)
        cfg = from_args(args)
        if args.verify_data:
            raise SystemExit(verify_data_main(cfg))
    t0 = time.time()
    data_train, data_test = resolve_data(cfg)
    dt = time.time() - t0
    train_cir, train_err, train_label = data_train
    test_cir, _, _ = data_test

    print(f"pipeline time: {dt:.2f}s")
    print(f"train: cir {train_cir.shape} err {train_err.shape} label {train_label.shape}")
    print(f"test:  cir {test_cir.shape}")
    print(f"scaled cir range: ({train_cir.min():.4f}, {train_cir.max():.4f})")
    print(f"err range: ({train_err.min():.4f}, {train_err.max():.4f})")
    classes, counts = np.unique(train_label.astype(int), return_counts=True)
    env = cfg.dataset_env if cfg.dataset_name == "zenodo" else "nlos"
    for c, n in zip(classes, counts):
        print(f"class {c} ({label_int2str(env, c)}): {n}")

    ds = UWBDataset(data_train)
    item = ds[0]
    print("item shapes:", {k: v.shape for k, v in item.items()})

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(cfg.out_dir, exist_ok=True)
    plt.plot(train_cir[0], color="blue")
    out = os.path.join(
        cfg.out_dir,
        "%s_sample_%s.png" % (cfg.dataset_name, label_int2str(env, int(train_label[0][0]))),
    )
    plt.savefig(out)
    plt.close()
    print("wrote", out)
    return data_train, data_test


if __name__ == "__main__":
    main()
