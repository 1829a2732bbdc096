"""CRC kernel vs bit-serial long-division oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_3gpp_tpu.ops.crc import crc_attach, crc_check, crc_numpy

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("crc", ["CRC24A", "CRC24B", "CRC16"])
@pytest.mark.parametrize("A", [1, 16, 100, 3824, 8424])
def test_attach_matches_oracle(crc, A):
    a = RNG.integers(0, 2, size=(4, A)).astype(np.int8)
    b = np.asarray(jax.jit(lambda x: crc_attach(x, crc))(jnp.asarray(a)))
    for i in range(a.shape[0]):
        expected = crc_numpy(a[i], crc)
        np.testing.assert_array_equal(b[i, A:], expected)
        np.testing.assert_array_equal(b[i, :A], a[i])


@pytest.mark.parametrize("crc", ["CRC24A", "CRC24B", "CRC16"])
def test_check_roundtrip(crc):
    a = RNG.integers(0, 2, size=(8, 200)).astype(np.int8)
    b = crc_attach(jnp.asarray(a), crc)
    fails = np.asarray(jax.jit(lambda x: crc_check(x, crc))(b))
    assert not fails.any()
    # single bit flip anywhere must be detected
    bb = np.asarray(b).copy()
    for i in range(8):
        bb[i, RNG.integers(0, bb.shape[1])] ^= 1
    assert np.asarray(crc_check(jnp.asarray(bb), crc)).all()


def test_none_crc_is_identity():
    a = jnp.asarray(RNG.integers(0, 2, size=(3, 10)))
    assert crc_attach(a, "None").shape == a.shape
    assert not np.asarray(crc_check(a, "None")).any()


def test_known_vector():
    # All-zero message has zero CRC; impulse message exercises the feedback.
    zero = jnp.zeros((1, 32), jnp.int8)
    np.testing.assert_array_equal(np.asarray(crc_attach(zero, "CRC16"))[0, 32:], 0)
    one = np.zeros(8, np.int8)
    one[-1] = 1  # message = ...0001 -> remainder of x^16 mod g
    expected = crc_numpy(one, "CRC16")
    got = np.asarray(crc_attach(jnp.asarray(one[None]), "CRC16"))[0, 8:]
    np.testing.assert_array_equal(got, expected)
