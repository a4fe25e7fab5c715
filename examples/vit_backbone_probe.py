"""ViT-as-backbone linear probe — script form of the reference's
vit_base_as_backbone / vit_small_as_backbone exploration notebooks: freeze the
encoder, extract CLS features, train a linear classifier on them.

  python examples/vit_backbone_probe.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--backend", default="cpu", choices=["default", "cpu", "tpu"])
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args()
    if args.backend != "default":
        jax.config.update("jax_platforms", args.backend)

    from ssp_x_vit_tpu.cli.common import resolve_model, resolve_dataset
    from ssp_x_vit_tpu.models.vit import vit_forward

    params, cfg = resolve_model(args.model, num_classes=10)
    train, test, _ = resolve_dataset("synthetic", cfg)

    @jax.jit
    def features(params, px):
        _, aux = vit_forward(params, px, cfg)
        return aux["cls_repr"]

    def extract(pipe, n_batches):
        X, y = [], []
        for i, b in enumerate(pipe):
            if i >= n_batches:
                break
            X.append(np.asarray(features(params, b["pixel_values"])))
            y.append(np.asarray(b["labels"]))
        return np.concatenate(X), np.concatenate(y)

    Xtr, ytr = extract(train, 8)
    Xte, yte = extract(test, 4)
    print(f"features: {Xtr.shape} train, {Xte.shape} test")

    # simple softmax probe with full-batch gradient descent
    import optax

    W = jnp.zeros((cfg.hidden_size, 10))
    b = jnp.zeros((10,))
    opt = optax.adam(1e-2)
    state = opt.init((W, b))

    @jax.jit
    def step(Wb, state, X, y):
        def loss_fn(Wb):
            logits = X @ Wb[0] + Wb[1]
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        loss, g = jax.value_and_grad(loss_fn)(Wb)
        upd, state = opt.update(g, state)
        return optax.apply_updates(Wb, upd), state, loss

    Wb = (W, b)
    Xtr_j, ytr_j = jnp.asarray(Xtr), jnp.asarray(ytr)
    for e in range(args.epochs):
        Wb, state, loss = step(Wb, state, Xtr_j, ytr_j)
        if e % max(1, args.epochs // 5) == 0:
            print(f"epoch {e}: loss {float(loss):.4f}")

    acc = float(np.mean(np.argmax(Xte @ np.asarray(Wb[0]) + np.asarray(Wb[1]), axis=1) == yte))
    print(f"linear-probe test accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
