"""Differential hardening of the toolkit-free chemistry (VERDICT item 6).

The RDKit-gated code is normally validated against `tests/fake_rdkit.py`,
which mirrors only the attribute surface our code touches — it cannot catch
wrong valence semantics. These tests pin the semantics with an INDEPENDENT
second implementation written from the chemistry rules directly, over
generated edge cases, so either side drifting breaks the build:

1. `sanitize_simple` vs an independently-written valence checker over a
   generated corpus of valid + corrupted molecules;
2. property-based checks of the repair heuristics' *contracts*
   (`fix_valence`: N with 4 sigma bonds is repairable, 5 is not —
   reference `utils/sample_utils.py:421-441`);
3. hand-built golden vectors for the liGAN bond-order perception and the
   EDM distance tables on exact bond-length geometries.
"""
import numpy as np
import pytest

from phoregen_tpu.constants import ATOMIC_NUMBERS
from phoregen_tpu.sample.chem import (ALLOWED_VALENCES, ELEMENT_SYMBOLS,
                                      SimpleMol, is_connected,
                                      sanitize_simple)


# ---------------------------------------------------------------------------
# 1. independent valence model (deliberately re-derived, different shape)
# ---------------------------------------------------------------------------

def independent_sanitize(mol: SimpleMol) -> bool:
    """Re-derivation of the acceptance rule from the chemistry directly:
    total bond order per atom (aromatic=1.5) must not exceed max allowed
    valence (+0.5 kekulization slack on aromatic atoms, +1 charge slack on
    N), and aromatic bonds must form degree->=2 subgraphs."""
    n = mol.num_atoms()
    if n == 0:
        return False
    orders = {}
    arom = {}
    for i, j, t in mol.undirected_bonds():
        o = {1: 1.0, 2: 2.0, 3: 3.0, 4: 1.5}[t]
        for a in (i, j):
            orders[a] = orders.get(a, 0.0) + o
            if t == 4:
                arom[a] = arom.get(a, 0) + 1
    for idx in range(n):
        sym = ELEMENT_SYMBOLS.get(int(mol.elements[idx]))
        if sym is None:
            return False
        cap = max(ALLOWED_VALENCES[sym])
        if arom.get(idx, 0) == 1:
            return False
        if arom.get(idx, 0) >= 2:
            cap += 0.5
        if sym == "N":
            cap += 1.0
        if orders.get(idx, 0.0) > cap + 1e-6:
            return False
    return True


def _random_mol(rng, corrupt: str = "none"):
    """Small random molecule; `corrupt` injects a specific defect."""
    from phoregen_tpu.data.realcorpus import grow_free
    n = int(rng.integers(5, 16))
    (types, pos, bidx, battr), mb = grow_free(rng, n)
    els = [ATOMIC_NUMBERS[t] for t in types]
    bidx = None if bidx is None else np.array(bidx)
    battr = None if battr is None else np.array(battr)
    if corrupt == "hypervalent" and battr is not None:
        # upgrade every bond of atom 0 to triple: blows any valence cap
        sel = (bidx[0] == 0) | (bidx[1] == 0)
        battr = battr.copy()
        battr[sel] = 3
    elif corrupt == "dangling_aromatic" and battr is not None:
        battr = battr.copy()
        battr[0] = 4          # one directed aromatic bond out of a pair
        battr[1] = 4          # (its mirror) -> exactly one aromatic bond
        # on each endpoint unless they already had aromatic bonds
    return SimpleMol(els, pos, bidx, battr)


def test_sanitize_matches_independent_model_on_valid_corpus():
    rng = np.random.default_rng(0)
    agree = 0
    for _ in range(120):
        mol = _random_mol(rng)
        assert sanitize_simple(mol) == independent_sanitize(mol)
        agree += 1
    assert agree == 120


def test_sanitize_matches_independent_model_on_corrupted():
    rng = np.random.default_rng(1)
    n_rejected = 0
    for _ in range(80):
        mol = _random_mol(rng, corrupt="hypervalent")
        a, b = sanitize_simple(mol), independent_sanitize(mol)
        assert a == b, "valence semantics drifted between implementations"
        n_rejected += not a
    assert n_rejected > 40  # the corruption is usually fatal


def test_dangling_aromatic_rejected_by_both():
    rng = np.random.default_rng(2)
    seen_reject = False
    for _ in range(60):
        mol = _random_mol(rng, corrupt="dangling_aromatic")
        a, b = sanitize_simple(mol), independent_sanitize(mol)
        assert a == b
        seen_reject |= not a
    assert seen_reject


# ---------------------------------------------------------------------------
# 2. repair-heuristic contracts (under the fake toolkit where needed)
# ---------------------------------------------------------------------------

def test_n_plus_slack_contract():
    """The N+ repair parity: 4 sigma bonds on N sanitize (charged ammonium,
    reference fix_valence `utils/sample_utils.py:421-441`), 5 do not."""
    def star(n_arms):
        els = [7] + [6] * n_arms
        pos = np.zeros((n_arms + 1, 3), np.float32)
        pos[1:] = np.eye(3).repeat(2, 0)[:n_arms] * 1.5 if n_arms <= 6 \
            else 0
        src = [0] * n_arms + list(range(1, n_arms + 1))
        dst = list(range(1, n_arms + 1)) + [0] * n_arms
        attr = [1] * (2 * n_arms)
        return SimpleMol(els, pos, np.array([src, dst]), np.array(attr))

    assert sanitize_simple(star(3))
    assert sanitize_simple(star(4))       # N+ slack
    assert not sanitize_simple(star(5))   # beyond any N charge state


def test_carbon_has_no_charge_slack():
    els = [6] + [6] * 5
    src = [0] * 5 + list(range(1, 6))
    dst = list(range(1, 6)) + [0] * 5
    mol = SimpleMol(els, np.zeros((6, 3), np.float32),
                    np.array([src, dst]), np.array([1] * 10))
    assert not sanitize_simple(mol)


# ---------------------------------------------------------------------------
# 3. golden vectors: distance-based bond orders on exact geometries
# ---------------------------------------------------------------------------

def test_edm_bond_orders_on_exact_lengths():
    """EDM tables (reference `utils/predict_bonds.py:11-60`): C-C single
    1.54 A, double 1.34, triple 1.20 — exact entries must perceive the
    right order; a 3.0 A pair must perceive none."""
    from phoregen_tpu.sample.predict_bonds import get_bond_order

    assert get_bond_order("C", "C", 1.54) == 1
    assert get_bond_order("C", "C", 1.34) == 2
    assert get_bond_order("C", "C", 1.20) == 3
    assert get_bond_order("C", "C", 3.00) == 0
    assert get_bond_order("C", "N", 1.47) == 1
    assert get_bond_order("C", "O", 1.43) == 1


def test_ligan_bond_perception_simple_chain():
    """The toolkit-free liGAN rebuild connects a 1.5-A-spaced carbon chain
    into exactly the chain bonds (reference `utils/sample_utils.py:168-769`
    pipeline)."""
    from phoregen_tpu.sample.ligan_bonds import (connect_the_dots,
                                                 perceive_bond_orders)

    n = 5
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.arange(n) * 1.5
    bonds = connect_the_dots([6] * n, pos)
    orders = perceive_bond_orders([6] * n, pos, bonds)
    assert sorted(orders) == [(i, i + 1) for i in range(n - 1)]
    assert all(o == 1 for o in orders.values())
