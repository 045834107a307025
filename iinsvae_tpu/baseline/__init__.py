from iinsvae_tpu.baseline.svm import svm_regressor, svm_classifier

__all__ = ["svm_regressor", "svm_classifier"]
