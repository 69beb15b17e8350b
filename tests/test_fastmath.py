"""exact_div32: correctly-rounded f32 division (ops/fastmath.py).

TPU f32 division is reciprocal-approximated (~1e-6 rel error) — enough to
flip alignment ties (observed at 10k-sequence scale). The Markstein/Dekker
sequence must be bit-equal to IEEE division; here it's checked on the CPU
backend (the TPU check lives in the on-device fuzz harnesses)."""
import numpy as np

import jax
import jax.numpy as jnp

from twilight_tpu.ops.fastmath import exact_div32


def test_exact_div32_bit_equal(rng):
    f = jax.jit(exact_div32)
    for _ in range(10):
        x = (rng.uniform(-1e6, 1e6, 4096)
             * 10.0 ** rng.uniform(-4, 1, 4096)).astype(np.float32)
        y = np.floor(rng.uniform(1, 10.0 ** rng.uniform(0, 8, 4096))
                     ).astype(np.float32)
        out = np.asarray(f(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_array_equal(out, (x / y).astype(np.float32))


def test_exact_div32_exact_cases():
    f = jax.jit(exact_div32)
    x = jnp.asarray([126.0, 1.0, 0.0, -126.0], jnp.float32)
    y = jnp.asarray([7.0, 3.0, 5.0, 7.0], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(f(x, y)),
        np.asarray([18.0, np.float32(1.0 / 3.0), 0.0, -18.0], np.float32))
