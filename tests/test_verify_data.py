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


def test_zenodo_empty_frame_is_error(tmp_path):
    frame = synthetic_zenodo_frame(n=10, seed=0).iloc[0:0]
    path = tmp_path / "dataset.pkl"
    frame.to_pickle(path)
    report = verify_zenodo(str(path))
    assert not report["ok"]
    assert any("0 rows" in e for e in report["errors"])


def test_zenodo_scalar_cir_cell_is_error(tmp_path):
    frame = synthetic_zenodo_frame(n=10, seed=0)
    frame["CIR"] = [1.0] * 10  # scalars, not sequences
    path = tmp_path / "dataset.pkl"
    frame.to_pickle(path)
    report = verify_zenodo(str(path))
    assert not report["ok"]
    assert any("157 taps" in e for e in report["errors"])


def test_ewine_verifier_matches_loader_contract(tmp_path):
    """The verifier must accept exactly what data/ewine.py's loader
    accepts: >= 152 columns, window at ABSOLUTE column fp+15 clamped into
    [0, cols-152] (round-4 review finding: the old check was off by the
    18 header columns)."""
    import pandas as pd
    from iinsvae_tpu.data.ewine import extract_reg_arrays

    # 160 columns: fewer than 18+152 but valid for the loader
    rng = np.random.default_rng(0)
    arr = np.abs(rng.normal(size=(6, 160))) + 0.1
    arr[:, 8] = 0.0   # window [15, 167) fits in 160? 15+152=167 > 160 -> clamped
    arr[:3, 8] = -15.0  # window starts at 0 exactly: identity clamp
    path = tmp_path / "d1" / "t.csv"
    path.parent.mkdir(parents=True)
    pd.DataFrame(arr).to_csv(path, index=False)

    cir, err, label = extract_reg_arrays(arr)  # loader accepts it
    assert cir.shape == (6, 152)
    report = verify_ewine(str(tmp_path))
    assert report["ok"], report["errors"]  # verifier must too
    # the 3 rows with fp=0 get clamped (start 15 > cols-152=8) -> warning
    assert any("clamps" in w for w in report["warnings"])


def test_cli_verify_data_ewine_explicit_root_not_substituted(tmp_path):
    from iinsvae_tpu.cli.inspect_data import main

    with pytest.raises(SystemExit) as exc:
        main(["--verify_data", "--dataset_name", "ewine",
              "--data_root", str(tmp_path / "not_there")])
    assert exc.value.code == 1


def test_ewine_unrelated_csv_is_warning_not_error(tmp_path):
    """Round-4 advisor finding: a real eWine download carries other-schema
    measurement CSVs the loader never reads — those must not fail the
    report when the loader's own path set is present and clean."""
    synthetic_ewine_csv(str(tmp_path / "dataset1" / "tag_room0.csv"), n=20, seed=0)
    pd.DataFrame(np.zeros((3, 7))).to_csv(tmp_path / "other_schema.csv", index=False)
    report = verify_ewine(str(tmp_path))
    assert report["ok"], report["errors"]
    assert any("outside loader paths" in w for w in report["warnings"])


def test_ewine_nonnumeric_csv_reported_not_fatal(tmp_path):
    """Round-4 advisor finding: non-numeric cells must produce a report
    entry, not an uncaught ValueError crashing --verify_data."""
    p = tmp_path / "dataset1" / "tag_room0.csv"
    p.parent.mkdir(parents=True)
    with open(p, "w") as f:
        f.write("a,b,c\n1,notanumber,3\n")
    report = verify_ewine(str(tmp_path))
    assert not report["ok"]
    assert any("unreadable" in e for e in report["errors"])


def test_ewine_bad_loader_path_is_error(tmp_path):
    """A schema violation AT a loader-consumed path stays a hard error."""
    synthetic_ewine_csv(str(tmp_path / "dataset1" / "tag_room1.csv"), n=20, seed=0)
    pd.DataFrame(np.zeros((5, 30))).to_csv(
        tmp_path / "dataset1" / "tag_room0.csv", index=False
    )
    report = verify_ewine(str(tmp_path))
    assert not report["ok"]
    assert any("columns" in e and "tag_room0" in e for e in report["errors"])
