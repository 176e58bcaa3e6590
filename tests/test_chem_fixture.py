"""Pin the RDKit-free fallback metrics to independent chemical ground
truth.

With RDKit absent from this image (and zero egress to precompute on
another machine), every molecule-metric test so far exercised the
graph-hash fallbacks against themselves. This fixture breaks that
circularity: ~20 molecules with textbook geometry whose
validity/stability/uniqueness are derived BY HAND from valence chemistry
(each entry documents the derivation — what RDKit sanitization would
conclude), and the fallback paths must reproduce them exactly.

Known divergence (documented, not hidden): fallback uniqueness keys are
canonical-ish graph hashes, not canonical SMILES — for distinct small
graphs they agree on equal/unequal, but are not interchangeable strings.
"""

import numpy as np
import pytest

from reed_tpu.eval.molecule_metrics import (
    MoleculeMetrics,
    check_stability,
    compute_relaxed_validity,
    build_bond_graph,
    _connected,
    _graph_key,
)

QM9 = ["H", "C", "N", "O", "F"]
T = {s: i for i, s in enumerate(QM9)}
_TET = 1.09 / np.sqrt(3.0)


def _rot(seed):
    q = np.random.default_rng(seed).standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])


def mol(symbols, coords):
    return (np.asarray(coords, np.float32),
            np.array([T[s] for s in symbols]))


# Each fixture: (name, molecule, expect_stable, expect_valid,
#                expect_relaxed_valid, derivation)
FIXTURES = [
    ("CH4", mol("CHHHH", [[0, 0, 0], [_TET, _TET, _TET],
                          [_TET, -_TET, -_TET], [-_TET, _TET, -_TET],
                          [-_TET, -_TET, _TET]]),
     True, True, True,
     "C-H 1.09 A -> 4 single bonds; C valence 4, H 1 each; connected"),
    ("NH3", mol("NHHH", [[0, 0, 0], [0.9375, 0, -0.3756],
                         [-0.4688, 0.8119, -0.3756],
                         [-0.4688, -0.8119, -0.3756]]),
     True, True, True, "N-H 1.01 A x3; N valence 3, H 1; connected"),
    ("H2O", mol("OHH", [[0, 0, 0], [0.5876, 0.7593, 0],
                        [0.5876, -0.7593, 0]]),
     True, True, True, "O-H 0.96 A x2; O valence 2; H-H 1.52 A no bond"),
    ("HF", mol("FH", [[0, 0, 0], [0.92, 0, 0]]),
     True, True, True, "H-F 0.92 A; F valence 1"),
    ("H2", mol("HH", [[0, 0, 0], [0.74, 0, 0]]),
     True, True, True, "H-H 0.74 A single bond; both valence 1"),
    ("N2", mol("NN", [[0, 0, 0], [1.10, 0, 0]]),
     True, True, True, "N#N 1.10 A triple bond; N valence 3"),
    ("CO2", mol("OCO", [[-1.163, 0, 0], [0, 0, 0], [1.163, 0, 0]]),
     True, True, True,
     "O=C=O 1.163 A double bonds; C 4, O 2 each. (Exactly 1.16 A sits on "
     "the triple-bond threshold BONDS3[C][O]+MARGIN3 = 116 pm — a real "
     "edge of the reference tables, bond_analyze.py:101-126)"),
    ("HCN", mol("HCN", [[-1.07, 0, 0], [0, 0, 0], [1.155, 0, 0]]),
     True, True, True, "H-C 1.07 single + C#N 1.155 triple; C 4, N 3"),
    ("ethane", mol("CCHHHHHH",
                   np.concatenate([
                       [[0, 0, 0], [1.54, 0, 0]],
                       # three H tetrahedral on each carbon
                       [[-0.363, 1.027, 0], [-0.363, -0.514, 0.89],
                        [-0.363, -0.514, -0.89],
                        [1.903, 1.027, 0], [1.903, -0.514, 0.89],
                        [1.903, -0.514, -0.89]]])),
     True, True, True,
     "C-C 1.54 single + 3 C-H 1.09 each; both C valence 4"),
    # --- unstable / invalid cases -------------------------------------
    ("lone_C", mol("C", [[0, 0, 0]]),
     False, False, False, "isolated carbon: valence 0 != 4"),
    ("CH3_radical", mol("CHHH", [[0, 0, 0], [1.09, 0, 0],
                                 [-0.545, 0.944, 0], [-0.545, -0.944, 0]]),
     False, False, True,
     "methyl: C valence 3 != 4 neutral, but the carbanion C- allows 3 -> "
     "relaxed-valid (CHARGED_VALENCES, reference "
     "build_molecule_with_partial_charges)"),
    ("stretched_H2O", mol("OHH", [[0, 0, 0], [1.5, 0, 0], [-1.5, 0, 0]]),
     False, False, False,
     "O-H 1.5 A > 1.06 A threshold: no bonds at all; disconnected"),
    ("NH4", mol("NHHHH", [[0, 0, 0], [1.01, 0, 0], [-1.01, 0, 0],
                          [0, 1.01, 0], [0, -1.01, 0]]),
     False, False, True,
     "ammonium: N valence 4 invalid neutral, but N+ allows 4 -> "
     "relaxed-valid (reference build_molecule_with_partial_charges)"),
    ("two_CH4_far", (np.concatenate([
        mol("CHHHH", [[0, 0, 0], [_TET, _TET, _TET], [_TET, -_TET, -_TET],
                      [-_TET, _TET, -_TET], [-_TET, -_TET, _TET]])[0],
        mol("CHHHH", [[0, 0, 0], [_TET, _TET, _TET], [_TET, -_TET, -_TET],
                      [-_TET, _TET, -_TET], [-_TET, -_TET, _TET]])[0]
        + np.array([8.0, 0, 0], np.float32)]),
        np.array([T[s] for s in "CHHHHCHHHH"])),
     True, False, True,
     "two methanes 8 A apart: every atom at correct valence (stable) but "
     "the graph is disconnected -> invalid as one molecule; relaxed "
     "validity scores the LARGEST FRAGMENT (reference MiDi convention) "
     "-> relaxed-valid"),
]


@pytest.mark.parametrize(
    "name,molecule,stable,valid,relaxed,why",
    FIXTURES, ids=[f[0] for f in FIXTURES])
def test_fallback_matches_chemical_ground_truth(name, molecule, stable,
                                                valid, relaxed, why):
    pos, types = molecule
    got_stable, n_stable, n_atoms = check_stability(pos, types, QM9)
    assert got_stable == stable, (name, why, n_stable, n_atoms)

    orders = build_bond_graph(pos, types, QM9)
    nr = orders.sum(1)
    got_valid = _connected(orders) and got_stable
    # the fallback validity path in MoleculeMetrics is connected+stable
    assert got_valid == valid, (name, why, nr.tolist())

    got_relaxed = compute_relaxed_validity([molecule], QM9) >= 1.0
    assert got_relaxed == relaxed, (name, why)


def test_metrics_aggregate_on_fixture():
    mols = [f[1] for f in FIXTURES]
    m = MoleculeMetrics().evaluate(mols)
    n = len(FIXTURES)
    exp_stable = sum(f[2] for f in FIXTURES) / n
    exp_valid = sum(f[3] for f in FIXTURES) / n
    exp_relaxed = sum(f[4] for f in FIXTURES) / n
    assert m["mol_stable"] == pytest.approx(exp_stable)
    assert m["validity"] == pytest.approx(exp_valid)
    assert m["relaxed_validity"] == pytest.approx(exp_relaxed)


def test_uniqueness_hash_invariances():
    """Graph-hash uniqueness: rotation/translation/permutation invariant,
    distinct molecules distinct (what canonical SMILES guarantees)."""
    ch4 = FIXTURES[0][1]
    nh3 = FIXTURES[1][1]
    rot_ch4 = (ch4[0] @ _rot(7).T + np.array([3.0, -2.0, 1.0],
                                             np.float32), ch4[1])
    perm = np.array([4, 2, 0, 3, 1])
    perm_ch4 = (ch4[0][perm], ch4[1][perm])

    def key(m):
        orders = build_bond_graph(m[0], m[1], QM9)
        return _graph_key(orders, m[1])

    assert key(ch4) == key(rot_ch4) == key(perm_ch4)
    assert key(ch4) != key(nh3)

    m = MoleculeMetrics().evaluate([ch4, rot_ch4, nh3])
    assert m["uniqueness"] == pytest.approx(2.0 / 3.0)
