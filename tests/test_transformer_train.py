"""Transformer trainer e2e on tiny synthetic NS + DR data."""

import numpy as np
import jax.numpy as jnp
import pytest

from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig
from sciml_pde_tpu.sim.gen_ns_incomp import generate_ns_file, VARIANTS
from sciml_pde_tpu.train.transformer_train import (
    run_transformer_training,
    make_transformer_optimizer,
    transformer_nrmse,
)

pytestmark = pytest.mark.slow

TINY = dict(
    grid_size=(16, 16), dt=1e-3, n_steps=16, frame_int=2, n_batch=2,
    nu=0.01, cg_tol=1e-4, cg_max_iter=100,
)
TFK = dict(
    img_size=16, patch_size=8, tubelet_size=2, in_chans=3,
    encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=4,
    decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
    initial_step=4, batch_size=8, epochs=2, bf16=False, log_every=1000,
)


@pytest.fixture(scope="module")
def ns_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("ns_tf")
    for i in [0, 250]:
        generate_ns_file(folder / f"ns_incom_inhom_2d_256-{i}.h5", i, NSIncompConfig(**TINY))
    aux_cfg = NSIncompConfig(**{**TINY, **VARIANTS["convection"]})
    for i in range(2):
        generate_ns_file(folder / f"ns_aux_2d_256-{i}.h5", 100 + i, aux_cfg)
    generate_ns_file(folder / "ns_aux_2d_256-250.h5", 300, aux_cfg)
    return folder


def test_transformer_nrmse_zero_on_exact():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    assert float(transformer_nrmse(y, y)) == 0.0


def test_optimizer_grad_accum_state():
    import jax

    tx = make_transformer_optimizer(1e-3, 1e-3, 100, grad_accum=4)
    params = {"backbone_w": jnp.ones((3,)), "head_primary": {"k": jnp.ones((2,))}}
    state = tx.init(params)
    g = {"backbone_w": jnp.ones((3,)), "head_primary": {"k": jnp.ones((2,))}}
    # first 3 updates: accumulated, params unchanged by zero updates
    for i in range(3):
        upd, state = tx.update(g, state, params)
        assert all(float(jnp.abs(u).max()) == 0.0 for u in jax.tree_util.tree_leaves(upd))
    upd, state = tx.update(g, state, params)
    assert any(float(jnp.abs(u).max()) > 0.0 for u in jax.tree_util.tree_leaves(upd))


def test_transformer_aux_training_ns(ns_folder, tmp_path):
    res = run_transformer_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(1, 1, 2), num_aux_samples=2,
        test_range=(250, 251),
        run_dir=str(tmp_path), model_name="t_vmae", **TFK,
    )
    assert np.isfinite(res.best_val)
    assert len(res.history) == 2


def test_transformer_aux_training_ns_bf16_stores(ns_folder, tmp_path):
    """Both device stores in bf16: the HBM-fit path for the production
    NS transformer aux run (compute promotes to fp32 from the gather on)."""
    res = run_transformer_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(1, 1, 2), num_aux_samples=2,
        test_range=(250, 251),
        aux_store_dtype="bf16", primary_store_dtype="bf16",
        run_dir=str(tmp_path), model_name="t_vmae_bf16", **TFK,
    )
    assert np.isfinite(res.best_val)


def test_transformer_baseline_with_accum_and_warmup(ns_folder, tmp_path):
    res = run_transformer_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=False,
        train_subsample=(1, 1, 2), grad_accum=2, warmup_steps=2, clip=1.0,
        test_range=(250, 251),
        run_dir=str(tmp_path), model_name="t_vmae_base", **TFK,
    )
    assert np.isfinite(res.best_val)


def test_loss_variants():
    import jax.numpy as jnp
    import numpy as np

    from sciml_pde_tpu.train.transformer_train import (
        transformer_nrmse,
        transformer_nrmse_perchannel,
        transformer_nrmse_sqrt,
    )

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(3, 8, 8, 2)).astype(np.float32))
    p = y + 0.1 * jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    l2 = float(transformer_nrmse(p, y))
    ls = float(transformer_nrmse_sqrt(p, y))
    lc = float(transformer_nrmse_perchannel(p, y))
    assert 0 < l2 < ls < 1  # squared < sqrt for rel err < 1
    assert abs(ls - lc) < 0.05  # balanced channels: per-channel ~ joint
    # a tiny channel with large relative error inflates ONLY the
    # per-channel loss
    y2 = y.at[..., 1].multiply(1e-3)
    p2 = y2.at[..., 1].add(0.01)
    assert float(transformer_nrmse_perchannel(p2, y2)) > 3 * float(
        transformer_nrmse_sqrt(p2, y2)
    )


def test_transformer_aux_shared_head_with_swa(ns_folder, tmp_path):
    """DR-style aux (ViT2dAux: shared decoder output, no heads) + SWA
    window: swa_params returned and finite, params carry no head keys."""
    import jax

    res = run_transformer_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(1, 1, 2), num_aux_samples=2,
        test_range=(250, 251), aux_shared_head=True, swa_frac=0.5,
        run_dir=str(tmp_path), model_name="t_vmae_swa", **TFK,
    )
    assert np.isfinite(res.best_val)
    assert res.swa_params is not None
    keys = {k for k in res.params.keys()}
    assert "head_primary" not in keys and "head_auxiliary" not in keys
    for leaf in jax.tree_util.tree_leaves(res.swa_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_weighted_epoch_batches_oversamples():
    import numpy as np
    from sciml_pde_tpu.data.windows import weighted_epoch_batches

    idx = np.array([(n, t) for n in range(2) for t in range(50)])
    w = 1.0 + 9.0 * (idx[:, 1] <= 10)
    rng = np.random.default_rng(0)
    drawn = np.concatenate(list(weighted_epoch_batches(idx, 10, rng, w)))
    frac_early = float(np.mean(drawn[:, 1] <= 10))
    # weights: 22 rows at 10x vs 78 at 1x -> expected early fraction
    # 220/298 = 0.74; uniform would give 0.22
    assert frac_early > 0.5
    assert len(drawn) == 100  # same steps-per-epoch as the uniform sampler


def test_transformer_host_stream_matches_device_store(ns_folder, tmp_path):
    """host_stream=True trains both variants from host-RAM stores and the
    aux variant reproduces the device-store loss trajectory (same seed,
    same pairing) to float tolerance at epoch end."""
    for if_aux, name in ((True, "hs_aux"), (False, "hs_base")):
        res = run_transformer_training(
            base_path=str(ns_folder), dataset_family="ns", if_aux=if_aux,
            train_subsample=(1, 1, 2), num_aux_samples=2,
            test_range=(250, 251), host_stream=True,
            run_dir=str(tmp_path), model_name=f"t_{name}", **TFK,
        )
        assert np.isfinite(res.best_val), name
        assert len(res.history) == 2


def test_transformer_host_stream_rejects_early_boost(ns_folder, tmp_path):
    with pytest.raises(NotImplementedError):
        run_transformer_training(
            base_path=str(ns_folder), dataset_family="ns", if_aux=False,
            train_subsample=(1, 1, 2), test_range=(250, 251),
            host_stream=True, early_window_boost=2.0,
            run_dir=str(tmp_path), model_name="t_hs_bad", **TFK,
        )
