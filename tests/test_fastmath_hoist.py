"""The hoisted in-kernel division (talco_pallas_g8.exact_div_den) must be
bit-equal to fastmath.exact_div32, which is itself bit-equal to IEEE f32
division. The hoist only precomputes the divisor-dependent terms (the
reciprocal and the Veltkamp split of y); this test re-derives the same
lean sequence and fuzzes it against float32 IEEE division on CPU."""
import numpy as np

import jax
import jax.numpy as jnp

from twilight_tpu.ops.fastmath import exact_div32


def _hoisted_div(x, y):
    # mirror of the sequence inlined in talco_pallas_g8 (divisor terms
    # precomputed once)
    s = jnp.float32(4097.0)
    r = jnp.float32(1.0) / y
    b1 = y * s
    bh = b1 - (b1 - y)
    bl = y - bh
    q0 = x * r
    p = q0 * y
    a1 = q0 * s
    ah = a1 - (a1 - q0)
    al = q0 - ah
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    resid = (x - p) - err
    return q0 + resid * r


def test_hoisted_div_bit_equals_exact_div32_and_ieee(rng):
    with jax.default_device(jax.devices("cpu")[0]):
        for mag in (1.0, 1e-6, 1e6):
            x = (rng.standard_normal(4096) * mag).astype(np.float32)
            y = (rng.uniform(0.5, 50.0, 4096) * mag).astype(np.float32)
            a = np.asarray(exact_div32(jnp.asarray(x), jnp.asarray(y)))
            b = np.asarray(_hoisted_div(jnp.asarray(x), jnp.asarray(y)))
            ieee = x / y   # numpy f32 division is correctly rounded
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(b, ieee)
