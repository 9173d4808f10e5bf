"""ML-training test: gradient flow through the solver.

Reference parity: differt/tests/benchmarks/test_training.py — an MLP
line-of-sight classifier trained with optax against ``trace_paths(order=0)``
masks, exercising grad-through-the-tracing-pipeline end to end.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # optax-MLP training integration (~10 s)

from differt_tpu.geometry import Mesh, Scene


class LOSModel(nn.Module):
    """Tiny MLP predicting line-of-sight probability from TX/RX positions."""

    hidden: int = 32

    @nn.compact
    def __call__(self, tx_rx: jax.Array) -> jax.Array:
        x = tx_rx
        x = nn.silu(nn.Dense(self.hidden)(x))
        x = nn.silu(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]


@pytest.fixture(scope="module")
def los_dataset():
    # A wall with a gap pattern: LOS depends on geometry in a learnable way.
    mesh = Mesh.box(1.0, 8.0, 8.0, with_top=True)
    key = jax.random.key(0)
    key_tx, key_rx = jax.random.split(key)
    num = 256
    tx = jax.random.uniform(
        key_tx, (num, 3), minval=jnp.array([-6.0, -5.0, -5.0]),
        maxval=jnp.array([-2.0, 5.0, 5.0]),
    )
    rx = jax.random.uniform(
        key_rx, (num, 3), minval=jnp.array([2.0, -5.0, -5.0]),
        maxval=jnp.array([6.0, 5.0, 5.0]),
    )

    def los_label(tx_i, rx_i):
        scene = Scene(transmitters=tx_i, receivers=rx_i, mesh=mesh)
        return scene.trace_paths(order=0).mask.reshape(())

    labels = jax.vmap(los_label)(tx, rx)
    return tx, rx, labels


def test_los_labels_are_mixed(los_dataset) -> None:
    _, _, labels = los_dataset
    frac = float(labels.mean())
    assert 0.05 < frac < 0.95  # Both classes present.


def test_train_step_reduces_loss(los_dataset) -> None:
    tx, rx, labels = los_dataset
    features = jnp.concatenate((tx, rx), axis=-1)
    targets = labels.astype(jnp.float32)

    model = LOSModel()
    params = model.init(jax.random.key(1), features)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, features)
            return optax.sigmoid_binary_cross_entropy(logits, targets).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(50):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    assert losses[-1] < losses[0] * 0.7
    # The trained model must beat chance.
    logits = model.apply(params, features)
    accuracy = float(((logits > 0) == (targets > 0.5)).mean())
    assert accuracy > 0.8
