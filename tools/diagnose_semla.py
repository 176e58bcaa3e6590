"""Offline probes on a saved semla convergence run (--save-params pickle).

Decomposes WHY generated chains fail stability:
  1. type coherence: is each generated type multiset feasible for its size
     (= matches some class of the chains family)?
  2. geometry: bond-window failure breakdown — heavy-heavy vs X-H inferred
     bonds, valence too-high vs too-low per atom type.
  3. late-t precision: masked coord MSE of the x1 prediction at fixed
     interpolation times (the aggregate train loss is dominated by the
     irreducible early-t variance, so it can't distinguish a good late-t
     fit from a bad one).

Usage: python tools/diagnose_semla.py /tmp/semla_chains_params.pkl [--cpu]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pickle")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-gen", type=int, default=64)
    ap.add_argument("--which", default="ema", choices=("ema", "params"))
    ap.add_argument("--from-t", action="store_true",
                    help="bisect probe: start the integrator from a "
                         "teacher-forced interpolant at t0 and score the "
                         "final molecules — locates WHERE the generated "
                         "trajectory leaves the data manifold")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from reed_tpu.core.config import CurriculumConfig, OptimConfig
    from reed_tpu.data.synthetic import (CHAIN_MAX_ATOMS, TEMPLATE_NUM_TYPES,
                                         chain_templates,
                                         template_molecule_batch)
    from reed_tpu.diffusion.molecule_fm import (IntegratorConfig,
                                                MoleculeInterpolantConfig,
                                                MoleculePriorConfig,
                                                interpolate_batch)
    from reed_tpu.eval.molecule_metrics import (QM9_ATOM_DECODER,
                                                build_bond_graph)
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    with open(args.pickle, "rb") as f:
        saved = pickle.load(f)
    run = saved["args"]
    params = saved[args.which]
    family = chain_templates()
    max_n = CHAIN_MAX_ATOMS
    n_bond_types, n_charge_types = 5, 7

    cfg = SemlaTrainConfig(
        vocab_size=TEMPLATE_NUM_TYPES, n_bond_types=n_bond_types,
        n_charge_types=n_charge_types, max_atoms=max_n,
        d_model=run["d_model"], d_message=run["d_model"] // 2,
        n_layers=run["layers"], n_coord_sets=run["coord_sets"],
        d_message_hidden=run["d_model"] // 2, d_edge=64, n_attn_heads=8,
        size_emb=16, d_rep=None, rep_alignment=False,
        interpolant=MoleculeInterpolantConfig(
            prior=MoleculePriorConfig(vocab_size=TEMPLATE_NUM_TYPES,
                                      n_bond_types=n_bond_types)),
        integrator=IntegratorConfig(steps=run["integrator_steps"]),
        batch_size=run["batch_size"], compute_dtype=run["dtype"],
        optim=OptimConfig(lr=run["lr"], grad_clip=1.0),
        curriculum=CurriculumConfig(proj_coeff=0.0, diffusion_warmup_steps=0,
                                    ema_decay=0.995),
    )
    trainer = SemlaTrainer(cfg)

    # feasible multisets per size, from the family itself
    feasible = {}
    for t in family:
        n = len(t["types"])
        feasible.setdefault(n, set()).add(
            tuple(sorted(Counter(t["types"].tolist()).items())))

    def build_data(raw):
        m = raw["mask"]
        atomics = np.eye(TEMPLATE_NUM_TYPES, dtype=np.float32)[
            raw["types"]] * m[..., None]
        bonds = np.eye(n_bond_types, dtype=np.float32)[
            np.minimum(raw["bond_orders"], n_bond_types - 1)]
        charges = np.zeros(m.shape + (n_charge_types,), np.float32)
        charges[..., 0] = m
        return {"coords": raw["coords"], "atomics": atomics, "bonds": bonds,
                "charges": charges, "mask": m}

    if args.from_t:
        # Bisect: teacher-forced interpolant at t0 -> integrate t0->1 with
        # the SAME compiled scan (steps count fixed so one compile serves
        # every t0; step density over [t0,1] therefore grows with t0, which
        # only helps late starts). Full generation failing while from-t0
        # succeeds at small t0 would indict the integrator; from-t0 failing
        # until large t0 means the learned field is only accurate near the
        # teacher-forced manifold.
        import dataclasses

        from reed_tpu.eval.molecule_metrics import MoleculeMetrics
        metrics = MoleculeMetrics()
        steps = run["integrator_steps"]
        for t0 in (0.0, 0.2, 0.4, 0.6, 0.8, 0.9, 0.95):
            icfg = dataclasses.replace(cfg.interpolant, fixed_time=t0)
            raw = template_molecule_batch(np.random.default_rng(321),
                                          args.n_gen, max_n,
                                          templates=family)
            data = build_data(raw)
            _, interp, _ = interpolate_batch(np.random.default_rng(9), icfg,
                                             data)
            tp = np.linspace(t0, 1.0, steps + 1)
            curr = {k: jnp.asarray(v) for k, v in interp.items()}
            cond = {"coords": jnp.zeros_like(curr["coords"]),
                    "atomics": jnp.zeros_like(curr["atomics"]),
                    "bonds": jnp.zeros_like(curr["bonds"])}
            final = trainer._generate_run(
                params, jax.random.PRNGKey(11), curr, None, cond,
                jnp.asarray(tp[:-1], jnp.float32),
                jnp.asarray(np.diff(tp), jnp.float32),
                steps=steps, t_final=float(tp[-2]))
            coords = np.asarray(jax.device_get(final["coords"]))
            types = np.argmax(np.asarray(jax.device_get(final["atomics"])),
                              axis=-1)
            sizes = raw["mask"].sum(-1).astype(int)
            mols = [(coords[b, :sizes[b]], types[b, :sizes[b]])
                    for b in range(args.n_gen)]
            m = metrics.evaluate(mols)
            tacc = ((types == raw["types"]) * raw["mask"]).sum() \
                / raw["mask"].sum()
            err = ((coords - data["coords"]) ** 2
                   * raw["mask"][..., None]).sum() / (raw["mask"].sum() * 3)
            print(f"from t0={t0}: atom_stable={m['atom_stable']:.3f} "
                  f"mol_stable={m['mol_stable']:.3f} "
                  f"validity={m['validity']:.3f} type_acc(vs src)={tacc:.3f} "
                  f"coord_rms(vs src)={np.sqrt(err):.3f} A", flush=True)
        return

    # ---- probe 1+2: generate and decompose failures -----------------------
    r = np.random.default_rng(77)
    sizes = np.array([len(family[i]["types"])
                      for i in r.integers(0, len(family), size=args.n_gen)])
    mask = (np.arange(max_n)[None, :] < sizes[:, None]).astype(np.float32)
    prior = trainer.sample_prior(r, mask)
    final = trainer.generate(params, jax.random.PRNGKey(7), prior)
    coords = np.asarray(jax.device_get(final["coords"]))
    types = np.argmax(np.asarray(jax.device_get(final["atomics"])), axis=-1)

    n_feas = 0
    val_hi = Counter()   # type -> atoms with too-many inferred bonds
    val_lo = Counter()   # type -> atoms with too-few
    bond_kinds = Counter()
    from reed_tpu.eval.molecule_metrics import ALLOWED_BONDS
    for b in range(args.n_gen):
        n = sizes[b]
        pos, tys = coords[b, :n], types[b, :n]
        ms = tuple(sorted(Counter(tys.tolist()).items()))
        n_feas += int(ms in feasible.get(n, set()))
        orders = build_bond_graph(pos, tys, QM9_ATOM_DECODER, "qm9")
        nb = orders.sum(1)
        for t, k in zip(tys, nb):
            allowed = ALLOWED_BONDS[QM9_ATOM_DECODER[t]]
            a = allowed if isinstance(allowed, int) else max(allowed)
            lo = allowed if isinstance(allowed, int) else min(allowed)
            if k > a:
                val_hi[QM9_ATOM_DECODER[t]] += 1
            elif k < lo:
                val_lo[QM9_ATOM_DECODER[t]] += 1
        ij = np.argwhere(np.triu(orders) > 0)
        for i, j in ij:
            kind = "".join(sorted(QM9_ATOM_DECODER[tys[i]]
                                  + QM9_ATOM_DECODER[tys[j]]))
            bond_kinds[kind] += 1
    print(f"type multiset feasible: {n_feas}/{args.n_gen}", flush=True)
    print(f"valence too-HIGH by type: {dict(val_hi)}", flush=True)
    print(f"valence too-LOW  by type: {dict(val_lo)}", flush=True)
    print(f"inferred bond kinds: {dict(bond_kinds)}", flush=True)

    # ---- probe 3: coord MSE at fixed interpolation times ------------------
    import dataclasses
    import functools

    @functools.partial(jax.jit)
    def probe_apply(p, coords_t, atomics_t, bonds_t, mask_t, times_t):
        zc = jnp.zeros_like(coords_t)
        za = jnp.zeros_like(atomics_t)
        zb = jnp.zeros_like(bonds_t)
        return trainer.model.apply(
            {"params": p}, coords_t, atomics_t, edge_feats=bonds_t,
            cond_coords=zc, cond_atomics=za, cond_bonds=zb,
            atom_mask=mask_t, rep=None, times=times_t)[:2]

    for tb in (0.5, 0.8, 0.9, 0.95, 0.99):
        icfg = dataclasses.replace(cfg.interpolant, fixed_time=tb)
        raw = template_molecule_batch(np.random.default_rng(123), 128, max_n,
                                      templates=family)
        m = raw["mask"]
        atomics = np.eye(TEMPLATE_NUM_TYPES, dtype=np.float32)[
            raw["types"]] * m[..., None]
        bonds = np.eye(n_bond_types, dtype=np.float32)[
            np.minimum(raw["bond_orders"], n_bond_types - 1)]
        charges = np.zeros((128, max_n, n_charge_types), np.float32)
        charges[..., 0] = m
        data = {"coords": raw["coords"], "atomics": atomics, "bonds": bonds,
                "charges": charges, "mask": m}
        pr, interp, times = interpolate_batch(np.random.default_rng(5), icfg,
                                              data)
        out = probe_apply(params, jnp.asarray(interp["coords"]),
                          jnp.asarray(interp["atomics"]),
                          jnp.asarray(interp["bonds"]),
                          jnp.asarray(interp["mask"]),
                          jnp.asarray(times))
        pred = np.asarray(jax.device_get(out[0]))
        ptypes = np.asarray(jax.device_get(out[1]))
        err = ((pred - data["coords"]) ** 2 * m[..., None]).sum() \
            / (m.sum() * 3)
        tacc = ((np.argmax(ptypes, -1) == raw["types"]) * m).sum() / m.sum()
        print(f"t={tb}: coord MSE/atom-dim {err:.5f} "
              f"(rms {np.sqrt(err):.3f} A), type acc {tacc:.3f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
