"""SVM baseline driver (reference baseline.py __main__): features + SVR/SVC
with CDF plots."""

from __future__ import annotations

import os

from iinsvae_tpu.config import Config, parse
from iinsvae_tpu.baseline.svm import svm_regressor, svm_classifier
from iinsvae_tpu.evaluation.viz import save_cdf_comparison
from iinsvae_tpu.cli.common import resolve_data


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse(argv)
    data_train, data_test = resolve_data(cfg)

    res_svm, err_gt, rmse, svr_time = svm_regressor(data_train, data_test)
    save_path = os.path.join(
        cfg.out_dir,
        "data_%s_%s_mode_%s" % (cfg.dataset_name, cfg.dataset_env, cfg.mode),
        "SVR",
    )
    save_cdf_comparison(
        save_path, "CDF_svm.png",
        [(err_gt, "y"), (res_svm, "c")],
        ["Original error", "SVM"],
    )
    accuracy, _, svc_time = svm_classifier(data_train, data_test)
    return {"svm_rmse": rmse, "svm_accuracy": accuracy}


if __name__ == "__main__":
    main()
