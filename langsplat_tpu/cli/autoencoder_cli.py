"""Autoencoder train/test CLIs: the TPU-native `/root/reference/autoencoder/{train,test}.py`.

train: concat all `<scene>/language_features/*_f.npy` -> Adam, batch 64, loss
L2 + 0.001*cos, best-checkpoint selection on epochs > eval_from (reference: 95 of 100;
`autoencoder/train.py:90-104`). Checkpoints are npz pytrees under ckpt/<name>/.

test: encode every 512-d feature to 3-d, write `language_features_dim3/*_f.npy` and copy
the `*_s.npy` seg maps (`autoencoder/test.py:37-77`) — produces the GT the feature phase
trains against.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

import numpy as np


def load_feature_dataset(data_dir: str):
    """-> (data [N,512], {file_name: row_count}) (reference Autoencoder_dataset)."""
    names = sorted(glob.glob(os.path.join(data_dir, "*f.npy")))
    if not names:
        raise FileNotFoundError(f"no *_f.npy under {data_dir}")
    data_dic = {}
    chunks = []
    for path in names:
        feats = np.load(path)
        data_dic[os.path.basename(path).split(".")[0]] = feats.shape[0]
        chunks.append(feats)
    return np.concatenate(chunks, axis=0).astype(np.float32), data_dic


def save_ae_checkpoint(path: str, variables) -> None:
    import jax
    leaves, _ = jax.tree.flatten(variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_ae_checkpoint(path: str, variables_template):
    import jax
    import jax.numpy as jnp
    data = np.load(path, allow_pickle=False)
    _, treedef = jax.tree.flatten(variables_template)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(treedef.num_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def train_main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--dataset_name", type=str, required=True)
    parser.add_argument("--num_epochs", type=int, default=100)
    parser.add_argument("--lr", type=float, default=0.0007)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--encoder_dims", nargs="+", type=int,
                        default=[256, 128, 64, 32, 3])
    parser.add_argument("--decoder_dims", nargs="+", type=int,
                        default=[16, 32, 64, 128, 256, 256, 512])
    parser.add_argument("--eval_from_frac", type=float, default=0.95,
                        help="best-ckpt eval starts after this fraction of epochs")
    parser.add_argument("--ckpt_root", type=str, default="ckpt")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from langsplat_tpu.models.autoencoder import ae_loss, cos_loss, init_autoencoder, \
        l2_loss

    data, _ = load_feature_dataset(os.path.join(args.dataset_path,
                                                "language_features"))
    n = data.shape[0]
    print(f"dataset: {n} features of dim {data.shape[1]}")

    rng = jax.random.key(args.seed)
    rng, init_rng = jax.random.split(rng)
    model, variables = init_autoencoder(init_rng, args.encoder_dims,
                                        args.decoder_dims, data.shape[1])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, train=True,
                mutable=["batch_stats"])
            return ae_loss(out, batch), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_bs, new_opt, loss

    @jax.jit
    def eval_batch(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats}, batch,
                          train=False)
        return (l2_loss(out, batch) + cos_loss(out, batch)) * batch.shape[0]

    bs = args.batch_size
    steps = (n + bs - 1) // bs
    pad = steps * bs - n
    ckpt_dir = os.path.join(args.ckpt_root, args.dataset_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    best_eval, best_epoch = float("inf"), -1
    eval_from = int(args.num_epochs * args.eval_from_frac)

    np_rng = np.random.default_rng(args.seed)
    for epoch in range(args.num_epochs):
        perm = np_rng.permutation(n)
        shuffled = np.concatenate([data[perm], data[perm[:pad]]], axis=0) if pad \
            else data[perm]
        epoch_loss = 0.0
        for i in range(steps):
            batch = jnp.asarray(shuffled[i * bs:(i + 1) * bs])
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch)
            epoch_loss += float(loss)
        if epoch % 10 == 0:
            print(f"epoch {epoch}: train_loss={epoch_loss / steps:.6f}")

        if epoch > eval_from:
            total = 0.0
            for i in range(0, n, 4096):
                total += float(eval_batch(params, batch_stats,
                                          jnp.asarray(data[i:i + 4096])))
            eval_loss = total / n
            print(f"eval_loss:{eval_loss:.8f}")
            if eval_loss < best_eval:
                best_eval, best_epoch = eval_loss, epoch
                save_ae_checkpoint(os.path.join(ckpt_dir, "best_ckpt.npz"),
                                   {"params": params, "batch_stats": batch_stats})

    if best_epoch < 0:  # short runs: always save the final state
        save_ae_checkpoint(os.path.join(ckpt_dir, "best_ckpt.npz"),
                           {"params": params, "batch_stats": batch_stats})
    print(f"best_epoch: {best_epoch}")
    print(f"best_loss: {best_eval:.8f}")


def test_main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--dataset_name", type=str, required=True)
    parser.add_argument("--encoder_dims", nargs="+", type=int,
                        default=[256, 128, 64, 32, 3])
    parser.add_argument("--decoder_dims", nargs="+", type=int,
                        default=[16, 32, 64, 128, 256, 256, 512])
    parser.add_argument("--ckpt_root", type=str, default="ckpt")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from langsplat_tpu.models.autoencoder import init_autoencoder

    data_dir = os.path.join(args.dataset_path, "language_features")
    output_dir = os.path.join(args.dataset_path, "language_features_dim3")
    os.makedirs(output_dir, exist_ok=True)
    for filename in os.listdir(data_dir):
        if filename.endswith("_s.npy"):
            shutil.copy(os.path.join(data_dir, filename),
                        os.path.join(output_dir, filename))

    data, data_dic = load_feature_dataset(data_dir)
    model, variables = init_autoencoder(jax.random.key(0), args.encoder_dims,
                                        args.decoder_dims, data.shape[1])
    variables = load_ae_checkpoint(
        os.path.join(args.ckpt_root, args.dataset_name, "best_ckpt.npz"), variables)

    @jax.jit
    def encode(batch):
        return model.apply(variables, batch, train=False, method="encode")

    outs = []
    for i in range(0, len(data), 4096):
        outs.append(np.asarray(encode(jnp.asarray(data[i:i + 4096]))))
    features = np.concatenate(outs, axis=0)

    start = 0
    for name, count in data_dic.items():
        np.save(os.path.join(output_dir, name), features[start:start + count])
        start += count
    print(f"wrote {len(data_dic)} feature files to {output_dir}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["test"]:
        test_main(sys.argv[2:])
    else:
        train_main(sys.argv[1:])
