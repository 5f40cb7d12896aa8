"""Autoencoder: structure, normalization, training convergence, CLI roundtrip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat_tpu.models.autoencoder import (Autoencoder, ae_loss, cos_loss,
                                              init_autoencoder, l2_loss)


def test_shapes_and_normalization():
    model, variables = init_autoencoder(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 512))
    z = model.apply(variables, x, train=False, method="encode")
    assert z.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0, rtol=1e-5)
    y = model.apply(variables, z, train=False, method="decode")
    assert y.shape == (8, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1), 1.0, rtol=1e-5)


def test_cos_loss_batch_axis_quirk():
    # identical tensors -> 0; orthogonal along batch axis -> 1
    a = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    assert float(cos_loss(a, a)) < 1e-6
    b = jnp.stack([a[1], -a[0] * 0 + a[3], a[0] * 0 + 1, a[2]])  # scrambled
    assert float(cos_loss(a, b)) > 0.01


def test_training_reduces_loss():
    import optax
    rng = np.random.default_rng(0)
    # synthetic clustered unit features (like CLIP embeddings of similar crops)
    centers = rng.normal(size=(5, 512))
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    data = centers[rng.integers(0, 5, 512)] + 0.05 * rng.normal(size=(512, 512))
    data = (data / np.linalg.norm(data, axis=-1, keepdims=True)).astype(np.float32)

    model, variables = init_autoencoder(jax.random.key(0))
    params, bs = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state, batch):
        def loss_fn(p):
            out, upd = model.apply({"params": p, "batch_stats": bs}, batch,
                                   train=True, mutable=["batch_stats"])
            return ae_loss(out, batch), upd["batch_stats"]
        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, nopt = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), nbs, nopt, loss

    first = last = None
    for epoch in range(30):
        for i in range(0, 512, 64):
            params, bs, opt_state, loss = step(params, bs, opt_state,
                                               jnp.asarray(data[i:i + 64]))
            if first is None:
                first = float(loss)
    last = float(loss)
    assert last < first * 0.5, (first, last)


@pytest.mark.slow
def test_cli_train_and_encode_roundtrip(tmp_path, monkeypatch):
    from langsplat_tpu.cli.autoencoder_cli import test_main, train_main

    lf = tmp_path / "scene" / "language_features"
    lf.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(2):
        feats = rng.normal(size=(20, 512)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        np.save(lf / f"img_{i}_f.npy", feats)
        np.save(lf / f"img_{i}_s.npy",
                rng.integers(-1, 20, (4, 8, 8)).astype(np.int32))

    monkeypatch.chdir(tmp_path)
    train_main(["--dataset_path", str(tmp_path / "scene"), "--dataset_name", "t",
                "--num_epochs", "5", "--batch_size", "16"])
    assert os.path.exists(tmp_path / "ckpt" / "t" / "best_ckpt.npz")
    test_main(["--dataset_path", str(tmp_path / "scene"), "--dataset_name", "t"])
    out = tmp_path / "scene" / "language_features_dim3"
    enc = np.load(out / "img_0_f.npy")
    assert enc.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(enc, axis=-1), 1.0, rtol=1e-5)
    assert (out / "img_0_s.npy").exists() and (out / "img_1_s.npy").exists()
