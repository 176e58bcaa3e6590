"""Tiny-scale convergence acceptance tests (CPU tier of the full TPU runs
in tools/convergence_*.py, whose committed results live in
CONVERGENCE_*.json at the repo root).

Each test trains on the learnable synthetic distribution from
data/synthetic.py, then *generates and scores* — the reference's own QC
loop (SURVEY.md §4.3) — and asserts the metric clearly beats the untrained
baseline. Thresholds are conservative: the full runs reach 0.86-1.0."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_protein_recovery_improves():
    from tools.convergence_protein import main

    res = main(["--tiny", "--cpu", "--steps", "250",
                "--out", "/tmp/conv_protein_test.json"])
    assert res["step0"] < 0.15          # untrained ~ chance (0.05)
    assert res["final"] > res["step0"] + 0.10
    assert res["final"] > 0.15


def test_semla_stability_improves():
    """Multi-metric direction gate on the chains family under the graph
    protocol (VERDICT r4 task 8): a recipe regression that hurts generated-
    molecule quality must fail this test, not land silently. Calibrated
    2026-08-20 on the honest reference recipe (coord_noise 0.2, churn 1,
    coord_std scaling): tiny/150 steps reaches atom_stable ~0.23 params /
    ~0.16 ema from 0.0; mol_stable stays ~0 at this scale (full runs are
    the validity evidence, CONVERGENCE_SEMLA.json)."""
    from tools.convergence_semla import main

    res = main(["--tiny", "--cpu", "--steps", "150", "--n-eval", "48",
                "--out", "/tmp/conv_semla_test.json"])
    assert res["final"]["atom_stable"] > res["step0"]["atom_stable"] + 0.1
    assert res["final_ema"]["atom_stable"] > \
        res["step0"]["atom_stable"] + 0.05
    # direction-only on the remaining graph metrics: never worse than
    # the untrained model on any of them
    for k in ("mol_stable", "validity", "fc_validity", "uniqueness"):
        assert res["final"][k] >= res["step0"][k], k
    assert res["config"]["family"] == "chains"
    assert res["config"]["coord_std"] > 1.0  # normalized-space training


def test_image_class_fidelity_improves():
    from tools.convergence_image import main

    res = main(["--tiny", "--cpu", "--steps", "300",
                "--out", "/tmp/conv_image_test.json"])
    assert res["step0"]["class_accuracy"] < 0.4
    assert res["final"]["class_accuracy"] > res["step0"]["class_accuracy"]
    assert res["final"]["mean_dist_to_class_mean"] < \
        res["step0"]["mean_dist_to_class_mean"] * 0.8


def test_edm_stability_improves():
    from tools.convergence_edm import main

    res = main(["--tiny", "--cpu", "--steps", "250", "--n-eval", "48",
                "--out", "/tmp/conv_edm_test.json"])
    assert res["step0"]["atom_stable"] < 0.1
    assert res["final"]["atom_stable"] > res["step0"]["atom_stable"] + 0.05


def test_multiflow_codesign_improves():
    from tools.convergence_multiflow import main

    res = main(["--tiny", "--cpu", "--steps", "120",
                "--out", "/tmp/conv_multiflow_test.json"])
    assert res["step0"]["recovery"] < 0.25      # untrained ~ chance (0.05)
    assert res["final"]["recovery"] > res["step0"]["recovery"] + 0.2
    assert res["final"]["ca_rmsd"] < res["step0"]["ca_rmsd"] * 0.5
    assert res["final"]["ca_bond_err"] < res["step0"]["ca_bond_err"] * 0.3


def test_rdm_class_conditional_improves():
    from tools.convergence_rdm import main

    res = main(["--tiny", "--cpu", "--steps", "300",
                "--out", "/tmp/conv_rdm_test.json"])
    assert res["step0"]["class_acc"] < 0.5      # untrained ~ chance (0.25)
    assert res["final"]["class_acc"] > 0.9
    assert res["final"]["class_mean_err"] < \
        res["step0"]["class_mean_err"] * 0.5
