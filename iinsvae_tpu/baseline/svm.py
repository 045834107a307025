"""Classical baseline: hand-crafted features + SVR/SVC
(reference baseline.py:15-70), with the vectorized feature extractor.

Return contracts fixed to what the callers expect (test.py:128-130 unpacks
4/3 values from functions that return 3/2 in the reference):
  svm_regressor -> (residual |est-gt|, |gt|, rmse, test_time)
  svm_classifier -> (accuracy, label_est, test_time)
"""

from __future__ import annotations

import time

import numpy as np
from sklearn.pipeline import make_pipeline
from sklearn.preprocessing import StandardScaler
from sklearn.svm import SVR, SVC

from iinsvae_tpu.ops.features import feature_extraction_np


def svm_regressor(data_train, data_test, verbose: bool = True):
    cir_train, err_train, _ = data_train
    cir_test, err_test, _ = data_test

    t0 = time.time()
    features_train = feature_extraction_np(cir_train)
    reg = make_pipeline(StandardScaler(), SVR(gamma="auto"))
    reg.fit(features_train, np.asarray(err_train).ravel())
    train_time = time.time() - t0

    t0 = time.time()
    features_test = feature_extraction_np(cir_test)
    err_est = reg.predict(features_test)
    test_time = time.time() - t0

    err_test = np.asarray(err_test).reshape(-1)
    rmse = float(np.sqrt(np.mean((err_est - err_test) ** 2)))
    abs_err = float(np.mean(np.abs(err_est - err_test)))
    if verbose:
        print(
            "SVM Regression Results: rmse %f, abs %f, time %f/%f"
            % (rmse, abs_err, train_time, test_time)
        )
    return np.abs(err_est - err_test), np.abs(err_test), rmse, test_time


def svm_classifier(data_train, data_test, verbose: bool = True):
    cir_train, _, label_train = data_train
    cir_test, _, label_test = data_test

    t0 = time.time()
    features_train = feature_extraction_np(cir_train)
    cls = make_pipeline(StandardScaler(), SVC(gamma="auto"))
    cls.fit(features_train, np.asarray(label_train).ravel())
    train_time = time.time() - t0

    t0 = time.time()
    features_test = feature_extraction_np(cir_test)
    label_est = cls.predict(features_test)
    test_time = time.time() - t0

    label_test = np.asarray(label_test).reshape(-1)
    accuracy = float(np.mean(label_est == label_test))
    if verbose:
        print(
            "SVM Classification Result: accuracy %f, time %f/%f"
            % (accuracy, train_time, test_time)
        )
    return accuracy, label_est, test_time
