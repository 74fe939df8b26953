"""CLI entry point (python -m pinn / the `pinn` console script)."""

import json
import os

import pytest

from pinn import cli


def test_info_runs(capsys):
    assert cli.main(["info"]) == 0
    out = capsys.readouterr().out
    assert "jax" in out and "backend=" in out


def test_run_list_names_experiments(capsys):
    assert cli.main(["run", "--list"]) == 0
    names = capsys.readouterr().out.split()
    for expected in ("inf_cont_burgers", "inf_cont_schrodinger",
                     "ide_disc_burgers"):
        assert expected in names
    # Infrastructure scripts don't leak into the listing.
    assert "run_campaign" not in names and "viz" not in names


def test_parse_set_json_then_string():
    got = cli._parse_set(["N_f=500", "layers=[2,8,1]", "dtype=float32",
                          "tpu_mesh=true"])
    assert got == {"N_f": 500, "layers": [2, 8, 1], "dtype": "float32",
                   "tpu_mesh": True}
    with pytest.raises(SystemExit):
        cli._parse_set(["novalue"])


def test_run_experiment_with_overrides(capsys, tmp_path):
    hp_path = tmp_path / "hp.json"
    hp_path.write_text(json.dumps({"N_u": 20, "N_f": 200,
                                   "layers": [2, 8, 1],
                                   "tf_epochs": 5, "nt_epochs": 0,
                                   "log_frequency": 100}))
    assert cli.main(["run", "inf_cont_burgers", str(hp_path),
                     "--set", "tf_epochs=3"]) == 0
    out = capsys.readouterr().out
    assert "rel-L2 error:" in out


def test_unknown_command_and_missing_experiment():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])
    with pytest.raises(SystemExit):
        cli.main(["run", "no_such_experiment_xyz"])


def test_experiments_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("PINN_EXPERIMENTS", str(tmp_path))
    assert cli._experiments_dir() == str(tmp_path)
    monkeypatch.delenv("PINN_EXPERIMENTS")
    assert os.path.isdir(cli._experiments_dir())
