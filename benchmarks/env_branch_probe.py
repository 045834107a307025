"""Can the env branch LEARN the fixture-v2 material task, in isolation?

Trains ONLY EnvEncoder1d + Classifier (supervised cross-entropy, no VAE
losses) on the paper task, both conv inits, mirroring the flagship budget.
Separates 'the fixture signal is too weak' from 'the semi objective /
KL dynamics suppress it' — if this probe learns and the full semi run
doesn't, the gap is the objective, not the data.

Run forced-CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/env_branch_probe.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from iinsvae_tpu.data.synthetic import synthetic_arrays
from iinsvae_tpu.data.splits import Standardizer
from iinsvae_tpu.models.encoders import EnvEncoder1d
from iinsvae_tpu.models.heads import Classifier


class EnvBranch(nn.Module):
    conv_init: str = "reference"
    num_classes: int = 4

    @nn.compact
    def __call__(self, x):
        b, l = x.shape
        cat = EnvEncoder1d(16, 2, 16, conv_init=self.conv_init)(x.reshape(b, l, 1))
        return Classifier(num_classes=self.num_classes, net_type="Linear")(cat)


def run(conv_init: str, epochs: int = 400, lr: float = 1e-4):
    cir, err, label, room = synthetic_arrays(n=10000, seed=0, option="paper", version=2)
    y = label.ravel().astype(int)
    k = int(0.8 * len(y))
    sc = Standardizer.fit(cir[:k])
    xtr, xte = sc.transform(cir[:k]), sc.transform(cir[k:])
    ytr, yte = y[:k], y[k:]

    model = EnvBranch(conv_init=conv_init)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, cir.shape[1])))
    tx = optax.adam(lr, b1=0.5, b2=0.999)
    opt = tx.init(params)

    bs = 500
    nb = len(ytr) // bs
    xtr_b = jnp.asarray(xtr[: nb * bs].reshape(nb, bs, -1), jnp.float32)
    ytr_b = jnp.asarray(ytr[: nb * bs].reshape(nb, bs))

    def loss_fn(p, xb, yb):
        logits = model.apply(p, xb)
        return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

    @jax.jit
    def epoch(p, opt):
        def body(carry, xy):
            p, opt = carry
            g = jax.grad(loss_fn)(p, xy[0], xy[1])
            up, opt = tx.update(g, opt)
            return (optax.apply_updates(p, up), opt), 0.0
        (p, opt), _ = jax.lax.scan(body, (p, opt), (xtr_b, ytr_b))
        return p, opt

    @jax.jit
    def acc(p, xb, yb):
        return (jnp.argmax(model.apply(p, xb), -1) == yb).mean()

    for e in range(epochs):
        params, opt = epoch(params, opt)
        if (e + 1) % 100 == 0:
            a = float(acc(params, jnp.asarray(xte, jnp.float32), jnp.asarray(yte)))
            print(f"[{conv_init}] epoch {e+1}: test acc {a:.4f}", flush=True)
    return float(acc(params, jnp.asarray(xte, jnp.float32), jnp.asarray(yte)))


if __name__ == "__main__":
    import sys
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    for init in ("reference", "torch"):
        a = run(init, epochs=epochs)
        print(f"FINAL {init}: {a:.4f}", flush=True)
