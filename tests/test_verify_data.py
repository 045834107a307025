"""--verify_data: the real-dataset placement validator (docs/data.md),
dry-run against the synthetic fixture per VERDICT round-3 item 9."""

import numpy as np
import pandas as pd
import pytest

from iinsvae_tpu.data.synthetic import synthetic_zenodo_frame, synthetic_ewine_csv
from iinsvae_tpu.data.verify import verify_zenodo, verify_ewine


@pytest.fixture(scope="module")
def fixture_pkl(tmp_path_factory):
    path = tmp_path_factory.mktemp("vd") / "dataset.pkl"
    synthetic_zenodo_frame(n=600, seed=0).to_pickle(path)
    return str(path)


def test_fixture_passes_schema_with_scale_warnings(fixture_pkl):
    report = verify_zenodo(fixture_pkl)
    assert report["ok"], report["errors"]
    assert report["stats"]["rows"] == 600
    assert len(report["stats"]["sha256"]) == 64
    # the fixture is NOT the real deposit: scale warnings must fire
    assert any("55,158" in w for w in report["warnings"])


def test_missing_file_reports_doi(tmp_path):
    report = verify_zenodo(str(tmp_path / "nope.pkl"))
    assert not report["ok"]
    assert "zenodo.4290069" in report["errors"][0]


def test_wrong_cir_length_is_error(tmp_path):
    frame = synthetic_zenodo_frame(n=50, seed=1)
    frame["CIR"] = [row[:150] for row in frame["CIR"]]
    path = tmp_path / "dataset.pkl"
    frame.to_pickle(path)
    report = verify_zenodo(str(path))
    assert not report["ok"]
    assert any("157 taps" in e for e in report["errors"])


def test_missing_column_is_error(tmp_path):
    frame = synthetic_zenodo_frame(n=50, seed=1).drop(columns=["Obstacles"])
    path = tmp_path / "dataset.pkl"
    frame.to_pickle(path)
    report = verify_zenodo(str(path))
    assert not report["ok"]
    assert any("missing columns" in e for e in report["errors"])


def test_malformed_obstacles_and_bad_room(tmp_path):
    frame = synthetic_zenodo_frame(n=50, seed=2)
    frame.loc[frame.index[:3], "Obstacles"] = "11"
    frame.loc[frame.index[:2], "Room"] = 9
    path = tmp_path / "dataset.pkl"
    frame.to_pickle(path)
    report = verify_zenodo(str(path))
    assert not report["ok"]
    assert any("malformed Obstacles" in e for e in report["errors"])
    assert any("Room values" in e for e in report["errors"])


def test_nonfinite_error_column(tmp_path):
    frame = synthetic_zenodo_frame(n=50, seed=3)
    frame.loc[frame.index[0], "Error"] = np.nan
    path = tmp_path / "dataset.pkl"
    frame.to_pickle(path)
    report = verify_zenodo(str(path))
    assert not report["ok"]
    assert any("non-finite" in e for e in report["errors"])


def test_ewine_fixture_passes_with_scale_warning(tmp_path):
    synthetic_ewine_csv(str(tmp_path / "dataset1" / "tag_room0.csv"), n=40, seed=0)
    report = verify_ewine(str(tmp_path))
    assert report["ok"], report["errors"]
    assert report["stats"]["csv_files"] == 1
    assert any("31,489" in w for w in report["warnings"])


def test_ewine_missing_dir(tmp_path):
    report = verify_ewine(str(tmp_path / "none"))
    assert not report["ok"]


def test_ewine_too_few_columns(tmp_path):
    path = tmp_path / "dataset1" / "bad.csv"
    path.parent.mkdir(parents=True)
    pd.DataFrame(np.zeros((5, 30))).to_csv(path, index=False)
    report = verify_ewine(str(tmp_path))
    assert not report["ok"]
    assert any("columns" in e for e in report["errors"])


def test_cli_verify_data_exit_codes(fixture_pkl, tmp_path, capsys):
    from iinsvae_tpu.cli.inspect_data import main

    with pytest.raises(SystemExit) as exc:
        main(["--verify_data", "--data_root", fixture_pkl])
    assert exc.value.code == 0
    assert "OK" in capsys.readouterr().out

    with pytest.raises(SystemExit) as exc:
        main(["--verify_data", "--data_root", str(tmp_path / "absent.pkl")])
    assert exc.value.code == 1
