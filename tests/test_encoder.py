"""QC-LDPC encoder property tests: H @ c = 0 across the lifting space."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_3gpp_tpu.ops.encoder import encode, syndrome
from ldpc_3gpp_tpu.spec.params import LDPCParams
from ldpc_3gpp_tpu.spec.tables import ALL_LIFTING_SIZES

RNG = np.random.default_rng(7)


def _params_for_Z(bg: int, Z: int) -> LDPCParams:
    """Construct params that select exactly lifting size Z."""
    kb_full = 22 if bg == 1 else 10
    # Choose K' = kb * Z for the largest K_b consistent with Z, then derive A.
    if bg == 1:
        kb = 22
    else:
        # K_b depends on K'; iterate to a consistent choice.
        for kb in (10, 9, 8, 6):
            K_prime = kb * Z
            kb_check = 10 if K_prime > 640 else 9 if K_prime > 560 else 8 if K_prime > 192 else 6
            if kb_check == kb:
                break
    K_prime = kb * Z
    L = 16  # keep A <= 3824 so TB CRC16; only single-CB configs here
    A = K_prime - L
    if A <= 0 or A > (8448 if bg == 1 else 3840) - L:
        return None
    G = 3 * A + (-3 * A) % 2
    try:
        p = LDPCParams(BG=bg, A=A, G=G, Q_m=2)
    except Exception:
        return None
    if p.Z_c != Z:
        return None
    return p


@pytest.mark.slow
@pytest.mark.parametrize("bg", [1, 2])
def test_parity_all_lifting_sizes(bg):
    """Every (BG, Z) combo yields codewords with zero syndrome."""
    tested = 0
    for Z in ALL_LIFTING_SIZES:
        p = _params_for_Z(bg, Z)
        if p is None:
            continue
        c = RNG.integers(0, 2, size=(2, p.K)).astype(np.uint8)
        c[:, p.K_prime :] = 0
        # eager on CPU: ~90 configs would pay ~90 jit compiles otherwise
        cw = encode(p, jnp.asarray(c))
        syn = np.asarray(syndrome(p, cw))
        assert syn.max() == 0, f"BG{bg} Z={Z} (i_LS={p.i_LS}) has nonzero syndrome"
        # systematic property
        np.testing.assert_array_equal(np.asarray(cw)[:, : p.K], c)
        tested += 1
    assert tested >= 40, f"only exercised {tested} lifting sizes"


@pytest.mark.parametrize("bg", [1, 2])
def test_encode_mxu_matches_rolls(bg):
    """The dense-generator MXU path is bit-identical to the structured path,
    both with the generator as a jit constant and as a traced argument
    (the form that works over remote-device transports)."""
    from ldpc_3gpp_tpu.ops.encoder import encode_mxu, parity_generator_device

    p = LDPCParams(BG=bg, A=200, G=600, Q_m=2)
    c = RNG.integers(0, 2, size=(4, p.K)).astype(np.uint8)
    c[:, p.K_prime :] = 0
    c = jnp.asarray(c)
    ref = np.asarray(encode(p, c))
    np.testing.assert_array_equal(np.asarray(encode_mxu(p, c)), ref)
    Gp = parity_generator_device(p)
    jitted = jax.jit(lambda cb, g: encode_mxu(p, cb, g))
    np.testing.assert_array_equal(np.asarray(jitted(c, Gp)), ref)


def test_syndrome_detects_corruption():
    p = LDPCParams(BG=2, A=100, G=300, Q_m=2)
    c = RNG.integers(0, 2, size=(1, p.K)).astype(np.uint8)
    c[:, p.K_prime :] = 0
    cw = np.array(encode(p, jnp.asarray(c)))  # np.array: writable copy
    cw[0, 3] ^= 1
    assert np.asarray(syndrome(p, jnp.asarray(cw))).max() == 1


def test_encode_against_dense_gf2_oracle():
    """Cross-check the structured encoder against a dense GF(2) solve."""
    for bg in (1, 2):
        p = LDPCParams(BG=bg, A=40, G=120, Q_m=2)
        Z = p.Z_c
        rows, cols, shifts = p.edges
        R, Ncols = p.num_rows * Z, p.num_cols * Z
        H = np.zeros((R, Ncols), dtype=np.uint8)
        for r, c_, s in zip(rows, cols, shifts):
            for z in range(Z):
                H[r * Z + z, c_ * Z + (z + s) % Z] ^= 1
        cbits = RNG.integers(0, 2, size=(p.K,)).astype(np.uint8)
        cbits[p.K_prime :] = 0
        cw = np.asarray(encode(p, jnp.asarray(cbits[None])))[0]
        assert ((H @ cw) % 2).max() == 0
        # parity part solves H_sys @ c + H_par @ par = 0; verify uniqueness by
        # checking the dense solve agrees
        Hs, Hp = H[:, : p.K], H[:, p.K :]
        rhs = (Hs @ cbits) % 2
        # Gaussian elimination over GF(2)
        M = np.concatenate([Hp, rhs[:, None]], axis=1).astype(np.uint8)
        npar = Hp.shape[1]
        piv = 0
        for col in range(npar):
            sel = np.nonzero(M[piv:, col])[0]
            if sel.size == 0:
                continue
            M[[piv, piv + sel[0]]] = M[[piv + sel[0], piv]]
            mask = M[:, col] == 1
            mask[piv] = False
            M[mask] ^= M[piv]
            piv += 1
        sol = np.zeros(npar, np.uint8)
        for i in range(piv):
            col = np.nonzero(M[i, :npar])[0][0]
            sol[col] = M[i, npar]
        np.testing.assert_array_equal(cw[p.K :], sol)
