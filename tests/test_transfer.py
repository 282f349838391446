"""Packed device transfer (harness/transfer.py): structure, values, dtypes,
and placement survive the pack/unpack round trip across the 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from benlsip_tpu.harness.transfer import pack_device_put


def test_pack_device_put_round_trip():
    rng = np.random.default_rng(0)
    tree = {
        "a": jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal(11).astype(np.float32)),
        "c": (
            jnp.asarray(rng.standard_normal((2, 2, 2)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 9, 5).astype(np.int32)),
        ),
    }
    dev = jax.devices()[1]
    out = pack_device_put(tree, dev)
    assert jax.tree.structure(out) == jax.tree.structure(tree)
    for o, t in zip(jax.tree.leaves(out), jax.tree.leaves(tree)):
        assert o.shape == t.shape and o.dtype == t.dtype
        assert dev in o.devices()
        np.testing.assert_array_equal(np.asarray(o), np.asarray(t))


def test_pack_device_put_mixed_dtypes_and_singleton():
    # A dtype group with a single leaf takes the direct path.
    tree = (
        jnp.arange(4, dtype=jnp.float64),
        jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        jnp.arange(8, dtype=jnp.float32),
    )
    dev = jax.devices()[0]
    out = pack_device_put(tree, dev)
    for o, t in zip(out, tree):
        assert o.dtype == t.dtype
        np.testing.assert_array_equal(np.asarray(o), np.asarray(t))


def test_pack_device_put_empty_tree():
    assert pack_device_put({}, jax.devices()[0]) == {}
