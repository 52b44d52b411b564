"""OFormer/Hyena DR comparison driver, tiny e2e."""

import numpy as np
import pytest

from sciml_pde_tpu.sim.diff_react import DiffReactConfig
from sciml_pde_tpu.sim.gen_diff_react import generate_dataset
from sciml_pde_tpu.comparisons.oformer_dr2d import (
    run_comparison_training,
    evaluate_comparison,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dr_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("dr_cmp")
    generate_dataset(
        folder / "2D_diff-react_test_all.h5", 6,
        DiffReactConfig(sim_type="all", xdim=12, ydim=12, t=2.0, tdim=11),
        verbose=False,
    )
    return folder


def test_oformer_dr_train_and_eval(dr_folder, tmp_path):
    res = run_comparison_training(
        base_path=str(dr_folder) + "/", model_type="oformer",
        train_subsample=4, initial_step=4, batch_size=8, epochs=2,
        in_emb_dim=16, latent_channels=16, heads=2, depth=2,
        run_dir=str(tmp_path), log_every=1000,
    )
    assert np.isfinite(res.history[-1]["train_rel_l2"])

    from sciml_pde_tpu.data.dr import load_dr_baseline
    from sciml_pde_tpu.models.oformer import OFormer2D

    ds = load_dr_baseline(str(dr_folder) + "/", train_subsample=4,
                          initial_step=4, rollout_test=3)
    model = OFormer2D(input_channels=4 * 2 + 2, out_channels=2, in_emb_dim=16,
                      latent_channels=16, heads=2, depth=2, out_steps=1,
                      propagator_depth=1)
    m = evaluate_comparison(model, res.params, ds.test, initial_step=4, rollout_steps=3)
    assert len(m["rel_l2_by_step"]) == 3
    assert np.isfinite(m["rollout_rel_l2"]) and np.isfinite(m["accumulated_mse"])


def test_rollout_protocol_oformer_and_hyena(dr_folder, tmp_path):
    """Reference-protocol path: one encode + latent rollout, normalized
    data, five-number metric set (eval_oformer_rd2d.py:121-127)."""
    from sciml_pde_tpu.comparisons.oformer_dr2d import run_rollout_protocol

    for mt in ("oformer", "hyena"):
        m, params = run_rollout_protocol(
            base_path=str(dr_folder) + "/", model_type=mt,
            in_seq_len=4, out_seq_len=4, spatial_down=1, channel=0,
            train_subsample=5, batch_size=2, epochs=1,
            in_emb_dim=16, latent_channels=16, heads=2, depth=2,
            run_dir=str(tmp_path), model_name=f"{mt}_proto",
        )
        for k in ("avg_rel_l2", "accumulated_mse", "final_rel_l2",
                  "nrmse_rollout", "nrmse_final"):
            assert np.isfinite(m[k]), (mt, k, m)
