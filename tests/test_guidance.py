"""Unit tests for the validity-guidance energies and count sampling
(reference `utils/sample_utils.py:28-37,135-165`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoregen_tpu.sample.sampler import (Sampler, atom_prox_energy,
                                         center_prox_energy)


def test_atom_prox_energy_hinge():
    # two atoms bonded at distance 5 (> max_d 3) -> hinge = 2 per bond
    pos = jnp.asarray([[[0., 0., 0.], [5., 0., 0.], [0., 0., 0.]]])
    lig_mask = jnp.asarray([[True, True, False]])
    bond_mask = (lig_mask[:, :, None] & lig_mask[:, None, :]
                 & ~jnp.eye(3, dtype=bool))
    h_edge = jax.nn.one_hot(
        jnp.asarray([[[0, 1, 0], [1, 0, 0], [0, 0, 0]]]), 6)
    e = atom_prox_energy(pos, h_edge, bond_mask, lig_mask, 1.0, 3.0)
    assert float(e) == pytest.approx(2.0, abs=1e-5)

    # distance inside [min_d, max_d] -> zero energy
    pos2 = jnp.asarray([[[0., 0., 0.], [2., 0., 0.], [0., 0., 0.]]])
    e2 = atom_prox_energy(pos2, h_edge, bond_mask, lig_mask, 1.0, 3.0)
    assert float(e2) == pytest.approx(0.0, abs=1e-6)

    # too close (0.5 < min_d 1.0) -> hinge 0.5
    pos3 = jnp.asarray([[[0., 0., 0.], [0.5, 0., 0.], [0., 0., 0.]]])
    e3 = atom_prox_energy(pos3, h_edge, bond_mask, lig_mask, 1.0, 3.0)
    assert float(e3) == pytest.approx(0.5, abs=1e-5)


def test_center_prox_energy():
    pos = jnp.asarray([[[1., 0., 0.], [3., 0., 0.]]])   # centroid (2,0,0)
    lig_mask = jnp.ones((1, 2), bool)
    phore_center = jnp.asarray([[2., 4., 0.]])
    e = center_prox_energy(pos, lig_mask, phore_center)
    assert float(e) == pytest.approx(4.0, abs=1e-5)


def test_guidance_gradient_direction():
    """d(atom_prox)/d(pos) pulls an overstretched bond together."""
    lig_mask = jnp.asarray([[True, True]])
    bond_mask = (lig_mask[:, :, None] & lig_mask[:, None, :]
                 & ~jnp.eye(2, dtype=bool))
    h_edge = jax.nn.one_hot(jnp.asarray([[[0, 1], [1, 0]]]), 6)

    def energy(pos):
        return atom_prox_energy(pos, h_edge, bond_mask, lig_mask, 1.0, 3.0)

    pos = jnp.asarray([[[0., 0., 0.], [5., 0., 0.]]])
    g = jax.grad(energy)(pos)
    # subtracting the gradient moves atom 1 toward atom 0 and vice versa
    assert float(g[0, 1, 0]) > 0 and float(g[0, 0, 0]) < 0


def test_sample_counts_bounds():
    key = jax.random.PRNGKey(0)
    cu = Sampler.sample_counts(key, 10, 20, 64, mode="uniform")
    assert cu.min() >= 10 and cu.max() <= 20
    cn = Sampler.sample_counts(key, 10, 20, 64, mode="normal", scale=6.0)
    assert cn.min() >= 10 and cn.max() <= 20
    with pytest.raises(NotImplementedError):
        Sampler.sample_counts(key, 10, 20, 4, mode="bogus")


def test_frag_attract_energy():
    """Connected chain ~ zero energy; two separated clusters -> positive
    energy whose gradient pulls the clusters together."""
    from phoregen_tpu.sample.sampler import frag_attract_energy

    # 6-atom chain at bond length: connected -> tiny energy. Also at a
    # STRETCHED 1.8 A bond (the false-positive regime that motivated the
    # n_hops=7 operating point).
    for bond in (1.5, 1.8):
        chain = jnp.asarray(
            [[[bond * i, 0., 0.] for i in range(6)] + [[0., 0., 0.]] * 2])
        mask = jnp.asarray([[True] * 6 + [False] * 2])
        e_conn = float(frag_attract_energy(chain, mask))
        assert e_conn < 0.05, (bond, e_conn)

    # two 3-atom clusters 12 A apart -> large unreached fraction
    split = jnp.asarray(
        [[[1.5 * i, 0., 0.] for i in range(3)]
         + [[12.0 + 1.5 * i, 0., 0.] for i in range(3)]
         + [[0., 0., 0.]] * 2])
    e_split = float(frag_attract_energy(split, mask))
    assert e_split > 10 * max(e_conn, 1e-6), (e_split, e_conn)

    # the FRAG_AB_r05 post-mortem regime: a 4 A nearest-atom gap (where
    # bond perception disconnects but the round-4 exp kernel was exactly
    # zero) must yield BOTH energy and gradient
    near = jnp.asarray(
        [[[1.5 * i, 0., 0.] for i in range(3)]
         + [[3.0 + 4.0 + 1.5 * i, 0., 0.] for i in range(3)]
         + [[0., 0., 0.]] * 2])
    e_near, g_near = jax.value_and_grad(
        lambda p: frag_attract_energy(p, mask))(near)
    assert float(e_near) > 0.02, float(e_near)
    assert float(jnp.max(jnp.abs(g_near))) > 1e-3

    # gradient pulls the far cluster toward the seed cluster (negative x)
    g = jax.grad(lambda p: frag_attract_energy(p, mask))(split)
    g = np.asarray(g)[0]
    assert np.isfinite(g).all()
    # moving the far cluster in -x must reduce the energy
    far_x = g[3:6, 0]
    assert far_x.sum() > 0.0, far_x  # dE/dx > 0 -> descent moves -x

    # padded atoms get zero gradient
    np.testing.assert_allclose(g[6:], 0.0, atol=1e-9)
