"""Molecule stability metrics + graph statistics."""

import numpy as np
import pytest

from reed_tpu.eval.graph_stats import (
    all_graph_stats,
    clustering_coefficients,
    degree_stats,
    mmd,
)
from reed_tpu.eval.molecule_metrics import (
    DistributionNodes,
    MoleculeMetrics,
    check_stability,
    get_bond_order,
)

# H2O geometry (Angstrom): O-H bond ~0.96
WATER_POS = np.array([[0.0, 0.0, 0.0],        # O
                      [0.96, 0.0, 0.0],       # H
                      [-0.24, 0.93, 0.0]])    # H
WATER_TYPES = [3, 0, 0]  # O, H, H in QM9 decoder [H,C,N,O,F]

# CH4: C at origin, 4 H at ~1.09 tetrahedral
CH4_POS = np.array([[0, 0, 0],
                    [0.63, 0.63, 0.63],
                    [-0.63, -0.63, 0.63],
                    [-0.63, 0.63, -0.63],
                    [0.63, -0.63, -0.63]], float)
CH4_TYPES = [1, 0, 0, 0, 0]


def test_bond_orders():
    assert get_bond_order("O", "H", 0.96) == 1
    assert get_bond_order("C", "C", 1.54) == 1
    assert get_bond_order("C", "C", 1.34) == 2
    assert get_bond_order("C", "C", 1.20) == 3
    assert get_bond_order("C", "C", 3.0) == 0


def test_water_stable():
    stable, n_stable, n = check_stability(WATER_POS, WATER_TYPES)
    assert stable and n_stable == 3


def test_methane_stable():
    stable, n_stable, n = check_stability(CH4_POS, CH4_TYPES)
    assert stable and n_stable == 5


def test_broken_molecule_unstable():
    pos = WATER_POS.copy()
    pos[1] += 5.0  # H flies away -> O has 1 bond, lone H has 0
    stable, n_stable, _ = check_stability(pos, WATER_TYPES)
    assert not stable and n_stable == 1  # only the remaining O-H H is stable


def test_metrics_aggregation():
    mols = [(WATER_POS, np.array(WATER_TYPES)),
            (CH4_POS, np.array(CH4_TYPES)),
            (WATER_POS + np.array([5, 0, 0]), np.array(WATER_TYPES))]
    m = MoleculeMetrics().evaluate(mols)
    assert m["mol_stable"] == 1.0
    assert m["atom_stable"] == 1.0
    assert m["validity"] == 1.0
    # two identical water graphs -> uniqueness 2/3
    assert m["uniqueness"] == pytest.approx(2 / 3)


def test_geom_vocab_with_phosphorus_does_not_crash():
    """The semla vocab is GEOM-scale; pairs like P-P are absent from the
    qm9 bond tables and must score bond order 0 via the geom predictor's
    check_exists path instead of raising (regression: eval-semla KeyError
    'P'; reference bond_analyze.py:135-144)."""
    from reed_tpu.data.molecule import CORE_ATOMS, OTHER_ATOMS

    decoder = tuple(["H", "H"] + CORE_ATOMS + OTHER_ATOMS)
    p_idx = decoder.index("P")
    mols = [(np.array([[0.0, 0, 0], [2.2, 0, 0], [1.1, 1.9, 0]], float),
             np.array([p_idx, p_idx, decoder.index("Hg")])),
            (WATER_POS, np.array([decoder.index(s)
                                  for s in ("O", "H", "H")]))]
    m = MoleculeMetrics(atom_decoder=decoder, dataset="geom").evaluate(mols)
    assert 0.0 <= m["validity"] <= 1.0
    # water is still recognized as stable through the geom path
    assert m["atom_stable"] >= 0.5


def test_distribution_nodes():
    rng = np.random.default_rng(0)
    d = DistributionNodes({5: 10.0, 9: 30.0})
    s = d.sample(rng, 4000)
    assert set(np.unique(s)) == {5, 9}
    assert abs((s == 9).mean() - 0.75) < 0.03
    lp = d.log_prob(np.array([5, 9, 7]))
    assert lp[2] < -60  # unseen size ~ -inf


def test_mmd_zero_for_identical():
    hists = [np.array([0.5, 0.5]), np.array([0.2, 0.8])]
    assert mmd(hists, hists) == pytest.approx(0.0, abs=1e-12)


def test_graph_stats_discriminate():
    rng = np.random.default_rng(0)
    # ref: triangles; pred_same: triangles; pred_diff: paths
    tri = (3, np.array([[0, 1], [1, 2], [0, 2]]))
    path = (3, np.array([[0, 1], [1, 2]]))
    stats_same = all_graph_stats([tri] * 4, [tri] * 4)
    stats_diff = all_graph_stats([tri] * 4, [path] * 4)
    for k in stats_same:
        if k.endswith("_mmd"):
            assert stats_same[k] == pytest.approx(0.0, abs=1e-9), k
            assert stats_diff[k] > stats_same[k] - 1e-12, k
    assert stats_diff["orbit_mmd"] > 0 or stats_diff["degree_mmd"] > 0
    # both triangle and path graphs are connected
    assert stats_same["connected_frac"] == 1.0
    assert stats_diff["connected_frac"] == 1.0


def test_spectral_and_nspdk_discriminate():
    from reed_tpu.eval.graph_stats import (connected_fraction,
                                           nspdk_stats, spectral_stats)

    tri = (3, np.array([[0, 1], [1, 2], [0, 2]]))
    path = (3, np.array([[0, 1], [1, 2]]))
    assert spectral_stats([tri] * 4, [tri] * 4) == pytest.approx(0, abs=1e-9)
    assert spectral_stats([tri] * 4, [path] * 4) > 1e-4
    assert nspdk_stats([tri] * 4, [tri] * 4) == pytest.approx(0, abs=1e-9)
    assert nspdk_stats([tri] * 4, [path] * 4) > 1e-4
    # nspdk with node labels distinguishes label distributions too
    same_graph_diff_labels = nspdk_stats(
        [tri] * 4, [tri] * 4,
        ref_labels=[[0, 0, 0]] * 4, pred_labels=[[1, 1, 1]] * 4)
    assert same_graph_diff_labels > 1e-4
    # disconnected graph detection
    two_comp = (4, np.array([[0, 1], [2, 3]]))
    assert connected_fraction([two_comp, tri]) == 0.5


def test_clustering_coefficients():
    tri = (3, np.array([[0, 1], [1, 2], [0, 2]]))
    assert np.allclose(clustering_coefficients(tri), 1.0)
    star = (4, np.array([[0, 1], [0, 2], [0, 3]]))
    assert np.allclose(clustering_coefficients(star), 0.0)


def test_relaxed_validity_largest_fragment_and_charges():
    from reed_tpu.eval.molecule_metrics import compute_relaxed_validity

    # methane-like: C with 4 H at proper distances -> strictly valid
    c = np.zeros((1, 3))
    hs = np.array([[1.09, 0, 0], [-1.09, 0, 0], [0, 1.09, 0], [0, -1.09, 0]])
    pos = np.concatenate([c, hs]).astype(np.float32)
    types = np.array([1, 0, 0, 0, 0])  # C,H,H,H,H in QM9 decoder
    assert compute_relaxed_validity([(pos, types)]) == 1.0

    # ammonium-like N with 4 H: invalid strictly (N allows 3) but relaxed
    # valid (N+ allows 4)
    n_pos = np.concatenate([c, hs * (1.01 / 1.09)]).astype(np.float32)
    n_types = np.array([2, 0, 0, 0, 0])
    from reed_tpu.eval.molecule_metrics import MoleculeMetrics

    m = MoleculeMetrics().evaluate([(n_pos, n_types)])
    assert m["validity"] == 0.0  # strict valence check fails
    assert m["relaxed_validity"] == 1.0

    # two disconnected CH4 fragments: relaxed validity judges the largest
    far = pos + np.array([50.0, 0, 0], np.float32)
    both = np.concatenate([pos, far])
    both_types = np.concatenate([types, types])
    assert compute_relaxed_validity([(both, both_types)]) == 1.0


def test_posebusters_checks():
    from reed_tpu.eval.molecule_metrics import posebusters_checks

    c = np.zeros((1, 3))
    hs = np.array([[1.09, 0, 0], [-1.09, 0, 0], [0, 1.09, 0], [0, -1.09, 0]])
    good = (np.concatenate([c, hs]).astype(np.float32),
            np.array([1, 0, 0, 0, 0]))
    out = posebusters_checks([good])
    assert out["bond_lengths"] == 1.0
    assert out["all_atoms_connected"] == 1.0
    assert out["pb_valid"] == 1.0

    # squeeze two H onto nearly the same spot: angle + clash failures
    bad_hs = hs.copy()
    bad_hs[1] = [0.0, 1.02, 0.35]  # close to H at (0, 1.09, 0)
    bad = (np.concatenate([c, bad_hs]).astype(np.float32),
           np.array([1, 0, 0, 0, 0]))
    out = posebusters_checks([bad])
    assert out["pb_valid"] == 0.0


def test_chain_family_ground_truth_is_valid_and_diverse():
    """The 1,089-class decorated-chain family (data/synthetic.py) is the
    convergence-run target for validity AND uniqueness: its ideal conformers
    must score perfectly under the same metrics the run uses, and a 256-mol
    sample must carry real diversity (else the family can't prove the model
    generates rather than memorizes)."""
    from reed_tpu.data.synthetic import chain_classes, chain_templates

    fam = chain_templates()
    assert len(fam) == len(chain_classes()) == 1089
    m = MoleculeMetrics()
    r = np.random.default_rng(0)
    mols = [(fam[i]["coords"], fam[i]["types"])
            for i in r.integers(0, len(fam), size=256)]
    scores = m.evaluate(mols)
    assert scores["mol_stable"] == 1.0
    assert scores["validity"] == 1.0
    assert scores["atom_stable"] == 1.0
    assert scores["uniqueness"] >= 0.5


def _orders_from_bondlist(n, bonds):
    o = np.zeros((n, n), np.int64)
    for i, j, order in bonds:
        o[i, j] = o[j, i] = order
    return o


def test_graph_metrics_semla_semantics():
    """GraphMoleculeMetrics scores the PREDICTED bond graph with the
    reference SemlaFlow rules (fm.py:276-306 + util/metrics.py:12-60):
    charge-aware valences, aromatic bonds count 1.5, validity needs every
    valence legal, fc_validity additionally connectivity."""
    from reed_tpu.eval.molecule_metrics import GraphMoleculeMetrics

    gm = GraphMoleculeMetrics()
    # methane: C + 4 H, all single bonds — coords deliberately WRONG
    # (graph metrics must not care as long as geometry audit is separate)
    pos = np.zeros((5, 3), np.float32)
    pos[1:] = np.array([[5, 0, 0], [0, 5, 0], [0, 0, 5], [3, 3, 3]],
                       np.float32)
    types = np.array([1, 0, 0, 0, 0])
    orders = _orders_from_bondlist(5, [(0, i, 1) for i in range(1, 5)])
    m = gm.evaluate([(pos, types, orders, None)])
    assert m["mol_stable"] == 1.0
    assert m["validity"] == 1.0
    assert m["fc_validity"] == 1.0
    assert m["uniqueness"] == 1.0

    # drop one H bond: carbon valence 3 is allowed for semla (radical),
    # but the H with zero bonds is unstable -> invalid
    orders2 = _orders_from_bondlist(5, [(0, i, 1) for i in range(1, 4)])
    m2 = gm.evaluate([(pos, types, orders2, None)])
    assert m2["mol_stable"] == 0.0
    assert m2["validity"] == 0.0
    assert m2["atom_stable"] == 4 / 5


def test_graph_metrics_aromatic_counts_half():
    """Aromatic bond order (4) contributes 1.5 to the valence sum, truncated
    like the reference (adj[adj==4]=1.5; .sum().long()): a benzene carbon
    with 2 aromatic + 1 single-H = 4.0 -> stable."""
    from reed_tpu.eval.molecule_metrics import check_graph_stability

    n = 12  # benzene C6H6
    bonds = []
    for i in range(6):
        bonds.append((i, (i + 1) % 6, 4))     # aromatic ring
        bonds.append((i, 6 + i, 1))           # C-H
    orders = _orders_from_bondlist(n, bonds)
    types = np.array([1] * 6 + [0] * 6)
    stable, n_stable, total = check_graph_stability(types, orders)
    assert stable and n_stable == total == 12


def test_graph_metrics_charge_aware_valence():
    """N at +1 with 4 single bonds is stable; at charge 0 it is not
    (ALLOWED_VALENCIES['N'] = {0: [2,3], 1: [2,3,4]})."""
    from reed_tpu.eval.molecule_metrics import check_graph_stability

    # NH4: N + 4 H
    types = np.array([2, 0, 0, 0, 0])
    orders = _orders_from_bondlist(5, [(0, i, 1) for i in range(1, 5)])
    ok_plus, _, _ = check_graph_stability(types, orders,
                                          charges=[1, 0, 0, 0, 0])
    ok_zero, _, _ = check_graph_stability(types, orders,
                                          charges=[0, 0, 0, 0, 0])
    assert ok_plus and not ok_zero


def test_graph_metrics_fc_validity_needs_connectivity():
    """Two valence-perfect fragments in one 'molecule': validity passes
    (sanitize has no connectivity requirement — reference Validity()),
    fc_validity fails (Validity(connected=True))."""
    from reed_tpu.eval.molecule_metrics import GraphMoleculeMetrics

    # two H2 molecules far apart
    pos = np.array([[0, 0, 0], [0.74, 0, 0], [10, 0, 0], [10.74, 0, 0]],
                   np.float32)
    types = np.array([0, 0, 0, 0])
    orders = _orders_from_bondlist(4, [(0, 1, 1), (2, 3, 1)])
    m = GraphMoleculeMetrics().evaluate([(pos, types, orders, None)])
    assert m["validity"] == 1.0
    assert m["fc_validity"] == 0.0


def test_graph_metrics_uniqueness_counts_distinct_graphs():
    from reed_tpu.eval.molecule_metrics import GraphMoleculeMetrics

    pos = np.zeros((2, 3), np.float32)
    pos[1, 0] = 0.74
    h2 = (pos, np.array([0, 0]), _orders_from_bondlist(2, [(0, 1, 1)]), None)
    pos_o = np.zeros((3, 3), np.float32)
    pos_o[1, 0] = 0.96
    pos_o[2, 1] = 0.96
    water = (pos_o, np.array([3, 0, 0]),
             _orders_from_bondlist(3, [(0, 1, 1), (0, 2, 1)]), None)
    m = GraphMoleculeMetrics().evaluate([h2, h2, water])
    assert m["validity"] == 1.0
    assert m["uniqueness"] == 2 / 3


def test_chain_family_graph_ground_truth_is_valid_and_diverse():
    """The convergence-run acceptance metric (semla protocol = predicted
    graph) scores the chain family's ground truth perfectly with real
    diversity: the model only has to reproduce its own co-generated graph
    consistently, not hit 0.03-A coordinate windows."""
    from reed_tpu.data.synthetic import chain_templates
    from reed_tpu.eval.molecule_metrics import GraphMoleculeMetrics

    fam = chain_templates()
    r = np.random.default_rng(0)
    mols = []
    for i in r.integers(0, len(fam), size=256):
        t = fam[i]
        n = len(t["types"])
        mols.append((t["coords"], t["types"],
                     _orders_from_bondlist(n, t["bonds"]), None))
    m = GraphMoleculeMetrics().evaluate(mols)
    assert m["mol_stable"] == 1.0
    assert m["validity"] == 1.0
    assert m["fc_validity"] == 1.0
    assert m["atom_stable"] == 1.0
    assert m["uniqueness"] >= 0.5
    assert m["pb_valid"] == 1.0
