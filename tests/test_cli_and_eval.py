"""Config presets, CLI dispatch, eval/pickle path, CSV aggregation."""

import pickle

import numpy as np
import pytest

from sciml_pde_tpu.utils.config import load_config
from sciml_pde_tpu.sim.diff_react import DiffReactConfig
from sciml_pde_tpu.sim.gen_diff_react import generate_dataset
from sciml_pde_tpu.train.cli import main_aux
from sciml_pde_tpu.eval.analyse import collect

pytestmark = pytest.mark.slow


def test_load_config_presets_and_overrides():
    cfg = load_config("config_dr", "basic_ds8", ["epochs=3", "width=8"])
    assert cfg["train_subsample"] == [8, 4, 12]
    assert cfg["epochs"] == 3 and cfg["width"] == 8
    assert cfg["num_channels"] == 2
    cfg_ns = load_config("config_ns", "basic_ds2")
    assert cfg_ns["train_subsample"] == [0.5, 0.25, 24]
    cfg_3d = load_config("config_ns_3d", "basic_ds4")
    assert cfg_3d["num_channels"] == 4


@pytest.fixture(scope="module")
def dr_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("dr_cli")
    small = dict(xdim=16, ydim=16, t=2.0, tdim=13)
    generate_dataset(folder / "2D_diff-react_test_all.h5", 10,
                     DiffReactConfig(sim_type="all", **small), verbose=False)
    generate_dataset(folder / "2D_diff-react_test_diff.h5", 30,
                     DiffReactConfig(sim_type="diff", **small), verbose=False)
    return folder


def test_cli_train_then_eval_pickle_then_csv(dr_folder, tmp_path):
    run_dir = tmp_path / "run"
    common = [
        f"base_path={str(dr_folder)}/",
        f"aux_path={str(dr_folder)}/",
        f"run_dir={str(run_dir)}",
        "model_name=DR_ds4_FNO",
        "epochs=2", "width=8", "modes=4", "initial_step=5",
        "batch_size=8", "log_every=1000",
    ]
    res = main_aux(["--config", "config_dr", "--dataset", "basic_ds4"] + common)
    assert np.isfinite(res.best_val)

    res2 = main_aux(
        ["--config", "config_dr", "--dataset", "basic_ds4"]
        + common + ["if_training=False", "rollout_test=2", "iLow=2", "iHigh=6"]
    )
    pkl = run_dir / "DR_ds4_FNO.pickle"
    assert pkl.exists()
    with pkl.open("rb") as f:
        errs = pickle.load(f)
    assert len(errs) == 6 and all(np.isfinite(v) for v in errs)

    df = collect(run_dir)
    assert len(df) == 1
    assert np.isfinite(df["nRMSE"].iloc[0])


def test_cli_rejects_unknown_override():
    from sciml_pde_tpu.train.cli import main_transformer

    with pytest.raises(SystemExit, match="bogus_key"):
        main_transformer(
            ["--config", "config_dr", "--dataset", "basic_ds4", "bogus_key=1"]
        )


def test_transformer_cli_aliases_num_channels(monkeypatch):
    from sciml_pde_tpu.train import cli

    seen = {}

    def fake_run(in_chans=None, num_channels=None):
        seen.update(in_chans=in_chans, num_channels=num_channels)

    monkeypatch.setattr(
        "sciml_pde_tpu.train.transformer_train.run_transformer_training",
        fake_run,
    )
    cli.main_transformer(["--config", "config_dr", "--dataset", "basic_ds4"])
    # config_dr carries num_channels: 2 — must land as in_chans for the ViT
    assert seen["in_chans"] == 2
    assert seen["num_channels"] is None
