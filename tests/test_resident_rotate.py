"""Device-resident pool rotation (``run_training(resident_rotate=R)``).

The single-chip path to train pools beyond one chip's HBM: the full pool
stays in host RAM, a 1/R trajectory slice is device-resident, slices swap
between epochs (block-cyclic data order).  Equivalence oracle: a pool
whose R slices are byte-identical must train EXACTLY like the unrotated
single-slice run — same rng stream, same steps/epoch, same schedule —
so the FULL train/val loss history is asserted (ADVICE r3: the scalar
best-val relaxation had no power against rotation-order/rng-stream
regressions, exactly the bug class schedule changes can introduce).
"""

import h5py
import numpy as np
import pytest

from sciml_pde_tpu.train.fno_train import run_training

SIM = "ns_incom_inhom_2d_256"
AUX = "ns_aux_2d_256"


def _write_ns(path, arr):
    """arr (B, T, X, Y, 3) -> reference NS file schema (velocity+particles)."""
    with h5py.File(path, "w") as f:
        f.create_dataset("velocity", data=arr[..., :2])
        f.create_dataset("particles", data=arr[..., 2:])


@pytest.fixture(scope="module")
def ns_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("ns_rotate")
    rng = np.random.default_rng(3)
    prim = rng.normal(size=(2, 8, 12, 12, 3)).astype(np.float32)
    aux = rng.normal(size=(2, 8, 12, 12, 3)).astype(np.float32)
    test = rng.normal(size=(1, 8, 12, 12, 3)).astype(np.float32)
    # files 1 duplicate files 0 -> rotation slices are byte-identical
    _write_ns(folder / f"{SIM}-0.h5", prim)
    _write_ns(folder / f"{SIM}-1.h5", prim)
    _write_ns(folder / f"{AUX}-0.h5", aux)
    _write_ns(folder / f"{AUX}-1.h5", aux)
    _write_ns(folder / f"{SIM}-250.h5", test)
    return str(folder)


def _common(folder, out, name):
    return dict(
        base_path=folder, aux_path=folder, dataset_family="ns",
        aux_name=AUX, test_range=(250, 251), num_channels=3,
        modes=4, width=8, initial_step=3, rollout_test=1,
        batch_size=2, epochs=2, seed=7, run_dir=str(out), model_name=name,
        log_every=0,
    )


def test_rotation_matches_unrotated_on_identical_slices(ns_folder, tmp_path):
    res_rot = run_training(
        if_aux=True, train_subsample=(2, 2, 2), num_aux_samples=1,
        resident_rotate=2, **_common(ns_folder, tmp_path, "rotA"),
    )
    res_ref = run_training(
        if_aux=True, train_subsample=(1, 1, 1), num_aux_samples=1,
        **_common(ns_folder, tmp_path, "rotB"),
    )
    assert np.isfinite(res_rot.best_val)
    np.testing.assert_allclose(res_rot.best_val, res_ref.best_val, rtol=1e-5)
    # full-history equivalence: identical slices + identical rng stream
    # must reproduce every per-epoch train and val loss, not just best-val
    assert len(res_rot.history) == len(res_ref.history)
    for h_rot, h_ref in zip(res_rot.history, res_ref.history):
        np.testing.assert_allclose(
            h_rot["train_loss"], h_ref["train_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(h_rot["val_loss"], h_ref["val_loss"], rtol=1e-5)


def test_rotation_baseline_runs_and_rotates(ns_folder, tmp_path):
    kw = _common(ns_folder, tmp_path, "rotbase")
    # epochs=3, R=2 under the block schedule: ep0/ep1 on slice 0, ep2 on
    # slice 1 — both slices visited via a single swap, run ends on slice 1
    kw["epochs"] = 3
    res = run_training(
        if_aux=False, train_subsample=(2, 2, 2), resident_rotate=2,
        primary_store_dtype="bf16", **kw,
    )
    assert np.isfinite(res.best_val)


def test_rotation_interleave_matches_unrotated(ns_folder, tmp_path):
    """The interleave schedule (2 half-run passes, both LR bands per
    slice) must satisfy the same identical-slice exact equivalence."""
    kw = _common(ns_folder, tmp_path, "rotI")
    kw["epochs"] = 4
    res_rot = run_training(
        if_aux=False, train_subsample=(2, 2, 2), resident_rotate=2,
        resident_rotate_schedule="interleave", **dict(kw, model_name="rotIA"),
    )
    res_ref = run_training(
        if_aux=False, train_subsample=(1, 1, 1),
        **dict(kw, model_name="rotIB"),
    )
    assert len(res_rot.history) == len(res_ref.history)
    for h_rot, h_ref in zip(res_rot.history, res_ref.history):
        np.testing.assert_allclose(
            h_rot["train_loss"], h_ref["train_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(h_rot["val_loss"], h_ref["val_loss"], rtol=1e-5)


def test_rotation_rejects_bad_combos(ns_folder, tmp_path):
    kw = _common(ns_folder, tmp_path, "rotbad")
    with pytest.raises(ValueError, match="resident_rotate"):
        run_training(
            if_aux=False, train_subsample=(2, 2, 2), resident_rotate=2,
            host_stream=True, **kw,
        )
    with pytest.raises(ValueError, match="divide"):
        run_training(
            if_aux=False, train_subsample=(2, 2, 2), resident_rotate=3, **kw,
        )


def test_transformer_rotation_matches_unrotated(ns_folder, tmp_path):
    from sciml_pde_tpu.train.transformer_train import run_transformer_training

    tfk = dict(
        base_path=ns_folder, aux_path=ns_folder, dataset_family="ns",
        aux_name=AUX, test_range=(250, 251), in_chans=3,
        img_size=12, patch_size=4, tubelet_size=1,
        encoder_embed_dim=16, encoder_depth=1, encoder_num_heads=2,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        initial_step=3, batch_size=2, epochs=2, bf16=False,
        num_aux_samples=1, seed=7, run_dir=str(tmp_path), log_every=0,
    )
    res_rot = run_transformer_training(
        if_aux=True, train_subsample=(2, 2, 2), resident_rotate=2,
        model_name="tfrotA", **tfk,
    )
    res_ref = run_transformer_training(
        if_aux=True, train_subsample=(1, 1, 1), model_name="tfrotB", **tfk,
    )
    assert np.isfinite(res_rot.best_val)
    np.testing.assert_allclose(res_rot.best_val, res_ref.best_val, rtol=1e-5)
