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
    ap.add_argument("--graph-audit", action="store_true",
                    help="audit the PREDICTED graph: valence breakdown per "
                         "type from generated bonds, bond marginals vs "
                         "family, bond/coord consistency, teacher-forced "
                         "type/bond accuracies at fixed t")
    ap.add_argument("--trace-traj", action="store_true",
                    help="step-by-step trajectory trace from t0=0.95: "
                         "per-step prediction/current accuracy vs the "
                         "source molecules, with self-conditioning on vs "
                         "zeroed — isolates the corruption channel")
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
                                      n_bond_types=n_bond_types),
            coord_noise_std=run.get("train_coord_noise", 0.0)),
        integrator=IntegratorConfig(
            steps=run["integrator_steps"],
            cat_noise_level=run.get("cat_noise_level", 0.0)),
        batch_size=run["batch_size"], compute_dtype=run["dtype"],
        coord_skip=run.get("coord_skip", False),
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

    # runs after the coord_std fix train in scaled space (reference
    # scriptutil.py:68-76); probes must interpolate scaled data and
    # unscale before any Angstrom-space audit
    coord_std = run.get("coord_std", 1.0)
    if coord_std <= 0:
        coord_std = 1.0
    if coord_std != 1.0:
        print(f"coord_std {coord_std:.4f} (model space = A / coord_std)",
              flush=True)

    def build_data(raw):
        m = raw["mask"]
        atomics = np.eye(TEMPLATE_NUM_TYPES, dtype=np.float32)[
            raw["types"]] * m[..., None]
        bonds = np.eye(n_bond_types, dtype=np.float32)[
            np.minimum(raw["bond_orders"], n_bond_types - 1)]
        charges = np.zeros(m.shape + (n_charge_types,), np.float32)
        charges[..., 0] = m
        return {"coords": raw["coords"] / coord_std, "atomics": atomics,
                "bonds": bonds, "charges": charges, "mask": m}

    if args.trace_traj:
        # Per-step trace of the integration from a teacher-forced t0=0.95
        # start, under (a) normal self-conditioning, (b) zeroed cond (the
        # 50% of training steps with cond=0 make zeros in-distribution),
        # (c) frozen ground-truth types/bonds (only coords integrate).
        # Whichever knob restores late-t accuracy names the feedback
        # channel that corrupts generation.
        import dataclasses
        import functools

        import jax.numpy as jnp2  # noqa: F401

        t0 = 0.95
        steps = run["integrator_steps"]
        icfg = dataclasses.replace(cfg.interpolant, fixed_time=t0)
        raw = template_molecule_batch(np.random.default_rng(321),
                                      args.n_gen, max_n, templates=family)
        data = build_data(raw)
        _, interp, _ = interpolate_batch(np.random.default_rng(9), icfg,
                                         data)
        tp = np.linspace(t0, 1.0, steps + 1)
        times_arr = jnp.asarray(tp[:-1], jnp.float32)
        sizes_arr = jnp.asarray(np.diff(tp), jnp.float32)
        src_coords = jnp.asarray(data["coords"])
        src_types = jnp.asarray(raw["types"])
        msk = jnp.asarray(raw["mask"])
        nmask = msk.sum() * 1.0

        from reed_tpu.diffusion.molecule_fm import integrator_step

        @functools.partial(jax.jit, static_argnames=("mode",))
        def traced(p, rng, curr0, mode):
            b = curr0["coords"].shape[0]

            def predict(curr, t_vec, cond_batch):
                coords, tl, bl, cl, _ = trainer.model.apply(
                    {"params": p}, curr["coords"], curr["atomics"],
                    edge_feats=curr["bonds"],
                    cond_coords=cond_batch["coords"],
                    cond_atomics=cond_batch["atomics"],
                    cond_bonds=cond_batch["bonds"],
                    atom_mask=curr["mask"], rep=None, times=t_vec)
                return {"coords": coords,
                        "atomics": jax.nn.softmax(tl, axis=-1),
                        "bonds": jax.nn.softmax(bl, axis=-1),
                        "charges": jax.nn.softmax(cl, axis=-1)}

            zero_cond = {"coords": jnp.zeros_like(curr0["coords"]),
                         "atomics": jnp.zeros_like(curr0["atomics"]),
                         "bonds": jnp.zeros_like(curr0["bonds"])}

            def body(carry, i):
                curr, cond_batch = carry
                t_vec = jnp.full((b,), times_arr[i])
                predicted = predict(curr, t_vec, cond_batch)
                new = integrator_step(jax.random.fold_in(rng, i),
                                      trainer.cfg.integrator, curr,
                                      predicted, curr0, t_vec, sizes_arr[i])
                if mode == "frozen_cat":
                    new = dict(new)
                    new["atomics"] = curr0["atomics"]
                    new["bonds"] = curr0["bonds"]
                new_cond = (zero_cond if mode == "zero_cond" else
                            {"coords": predicted["coords"],
                             "atomics": predicted["atomics"],
                             "bonds": predicted["bonds"]})
                pe = jnp.sqrt(((predicted["coords"] - src_coords) ** 2
                               * msk[..., None]).sum() / (nmask * 3))
                ce = jnp.sqrt(((new["coords"] - src_coords) ** 2
                               * msk[..., None]).sum() / (nmask * 3))
                pa = ((predicted["atomics"].argmax(-1) == src_types)
                      * msk).sum() / nmask
                ca = ((new["atomics"].argmax(-1) == src_types)
                      * msk).sum() / nmask
                return (new, new_cond), (pe, ce, pa, ca)

            (_, _), aux = jax.lax.scan(body, (curr0, zero_cond),
                                       jnp.arange(steps))
            return aux

        curr0 = {k: jnp.asarray(v) for k, v in interp.items()}
        for mode in ("normal", "zero_cond", "frozen_cat"):
            pe, ce, pa, ca = [np.asarray(jax.device_get(x))
                              for x in traced(params, jax.random.PRNGKey(11),
                                              curr0, mode)]
            print(f"--- mode={mode} (t0={t0}, {steps} steps) ---",
                  flush=True)
            for i in (0, 20, 40, 60, 80, 90, 95, 99):
                print(f"  step {i:3d} t={tp[i]:.4f}: "
                      f"pred_rms={pe[i] * coord_std:.4f} "
                      f"curr_rms={ce[i] * coord_std:.4f} "
                      f"pred_acc={pa[i]:.4f} "
                      f"curr_acc={ca[i]:.4f}", flush=True)
        return

    if args.graph_audit:
        # Where does the PREDICTED graph go wrong? (a) full generation:
        # valence breakdown per atom type from the predicted bonds, bond
        # marginals vs the family's, bond/coord consistency; (b) teacher-
        # forced single-call accuracy of types/bonds/charges at fixed t —
        # the bond channel was never measured separately before.
        import dataclasses

        from reed_tpu.eval.molecule_metrics import graph_valences

        r = np.random.default_rng(77)
        sizes = np.array([len(family[i]["types"])
                          for i in r.integers(0, len(family),
                                              size=args.n_gen)])
        mask = (np.arange(max_n)[None, :] < sizes[:, None]).astype(np.float32)
        prior = trainer.sample_prior(r, mask)
        final = trainer.generate(params, jax.random.PRNGKey(7), prior)
        coords = np.asarray(jax.device_get(final["coords"])) * coord_std
        types = np.argmax(np.asarray(jax.device_get(final["atomics"])), -1)
        orders = np.argmax(np.asarray(jax.device_get(final["bonds"])), -1)

        val_stat = {s: Counter() for s in QM9_ATOM_DECODER}
        bond_marg = Counter()
        bond_dists = {1: [], 0: []}
        allowed = {"H": 1, "C": 4, "N": 3, "O": 2, "F": 1}
        for b in range(args.n_gen):
            n = sizes[b]
            o = orders[b, :n, :n]
            o = np.triu(o, 1) + np.triu(o, 1).T  # count upper, mirror
            v = graph_valences(o)
            for i in range(n):
                sym = QM9_ATOM_DECODER[types[b, i]]
                a = allowed.get(sym, 0)
                key = ("ok" if v[i] == a else
                       ("high" if v[i] > a else "low"))
                val_stat[sym][key] += 1
            iu = np.triu_indices(n, 1)
            for t_b in o[iu]:
                bond_marg[int(t_b)] += 1
            d = np.linalg.norm(coords[b, :n, None] - coords[b, None, :n],
                               axis=-1)
            for i, j in zip(*iu):
                if o[i, j] == 1:
                    bond_dists[1].append(d[i, j])
                elif d[i, j] < 1.8:
                    bond_dists[0].append(d[i, j])
        print("valence from PREDICTED bonds (generated):", flush=True)
        for sym, c in val_stat.items():
            if c:
                print(f"  {sym}: {dict(c)}", flush=True)
        tot = sum(bond_marg.values())
        fam_pairs = Counter()
        for t in family:
            n = len(t["types"])
            fam_pairs[1] += len(t["bonds"])
            fam_pairs[0] += n * (n - 1) // 2 - len(t["bonds"])
        ftot = sum(fam_pairs.values())
        print(f"bond marginals gen: "
              f"{ {k: round(v / tot, 4) for k, v in bond_marg.items()} } "
              f"family: { {k: round(v / ftot, 4) for k, v in fam_pairs.items()} }",
              flush=True)
        b1 = np.asarray(bond_dists[1])
        print(f"predicted single bonds: n={len(b1)} "
              f"dist mean={b1.mean():.3f} std={b1.std():.3f} "
              f"frac>1.8A={float((b1 > 1.8).mean()):.3f}", flush=True)
        print(f"close pairs (<1.8A) predicted NON-bonded: "
              f"{len(bond_dists[0])}", flush=True)

        # (b) teacher-forced single-call accuracies
        for t0 in (0.5, 0.8, 0.9, 0.95, 0.99):
            icfg = dataclasses.replace(cfg.interpolant, fixed_time=t0)
            raw = template_molecule_batch(np.random.default_rng(321),
                                          args.n_gen, max_n,
                                          templates=family)
            data = build_data(raw)
            _, interp, times = interpolate_batch(
                np.random.default_rng(9), icfg, data)
            curr = {k: jnp.asarray(v) for k, v in interp.items()}
            _, tl, bl, _, _ = trainer.model.apply(
                {"params": params}, curr["coords"], curr["atomics"],
                edge_feats=curr["bonds"],
                cond_coords=jnp.zeros_like(curr["coords"]),
                cond_atomics=jnp.zeros_like(curr["atomics"]),
                cond_bonds=jnp.zeros_like(curr["bonds"]),
                atom_mask=curr["mask"], rep=None,
                times=jnp.asarray(times))
            ptypes = np.argmax(np.asarray(jax.device_get(tl)), -1)
            pbonds = np.argmax(np.asarray(jax.device_get(bl)), -1)
            m2 = raw["mask"]
            pm = m2[:, :, None] * m2[:, None, :]
            src_bonds = np.minimum(raw["bond_orders"], n_bond_types - 1)
            tacc = ((ptypes == raw["types"]) * m2).sum() / m2.sum()
            bacc = ((pbonds == src_bonds) * pm).sum() / pm.sum()
            # bonds are ~93% 'none': also report accuracy on TRUE bonds only
            isb = (src_bonds > 0) * pm
            bacc_pos = ((pbonds == src_bonds) * isb).sum() / isb.sum()
            # coherence of the JOINT prediction: score the predicted graph
            # itself (argmax type/bond marginals need not form a consistent
            # molecule even when per-element accuracy is high)
            from reed_tpu.eval.molecule_metrics import GraphMoleculeMetrics
            szs = m2.sum(-1).astype(int)
            gm = GraphMoleculeMetrics().evaluate(
                [(raw["coords"][b, :szs[b]], ptypes[b, :szs[b]],
                  pbonds[b, :szs[b], :szs[b]], None)
                 for b in range(args.n_gen)])
            print(f"t={t0}: type_acc={tacc:.4f} bond_acc={bacc:.4f} "
                  f"bond_acc(true bonds)={bacc_pos:.4f} | pred-graph "
                  f"validity={gm['validity']:.3f} "
                  f"atom_stable={gm['atom_stable']:.3f}", flush=True)
        return

    if args.from_t:
        # Bisect: teacher-forced interpolant at t0 -> integrate t0->1 with
        # the SAME compiled scan (steps count fixed so one compile serves
        # every t0; step density over [t0,1] therefore grows with t0, which
        # only helps late starts). Full generation failing while from-t0
        # succeeds at small t0 would indict the integrator; from-t0 failing
        # until large t0 means the learned field is only accurate near the
        # teacher-forced manifold.
        import dataclasses

        from reed_tpu.eval.molecule_metrics import GraphMoleculeMetrics
        metrics = GraphMoleculeMetrics()
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
            coords = np.asarray(jax.device_get(final["coords"])) * coord_std
            types = np.argmax(np.asarray(jax.device_get(final["atomics"])),
                              axis=-1)
            orders = np.argmax(np.asarray(jax.device_get(final["bonds"])),
                               axis=-1)
            sizes = raw["mask"].sum(-1).astype(int)
            mols = [(coords[b, :sizes[b]], types[b, :sizes[b]],
                     orders[b, :sizes[b], :sizes[b]], None)
                    for b in range(args.n_gen)]
            m = metrics.evaluate(mols)
            tacc = ((types == raw["types"]) * raw["mask"]).sum() \
                / raw["mask"].sum()
            err = ((coords - raw["coords"]) ** 2
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
    coords = np.asarray(jax.device_get(final["coords"])) * coord_std
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
        data = {"coords": raw["coords"] / coord_std, "atomics": atomics,
                "bonds": bonds, "charges": charges, "mask": m}
        pr, interp, times = interpolate_batch(np.random.default_rng(5), icfg,
                                              data)
        out = probe_apply(params, jnp.asarray(interp["coords"]),
                          jnp.asarray(interp["atomics"]),
                          jnp.asarray(interp["bonds"]),
                          jnp.asarray(interp["mask"]),
                          jnp.asarray(times))
        pred = np.asarray(jax.device_get(out[0])) * coord_std
        ptypes = np.asarray(jax.device_get(out[1]))
        err = ((pred - raw["coords"]) ** 2 * m[..., None]).sum() \
            / (m.sum() * 3)
        tacc = ((np.argmax(ptypes, -1) == raw["types"]) * m).sum() / m.sum()
        print(f"t={tb}: coord MSE/atom-dim {err:.5f} "
              f"(rms {np.sqrt(err):.3f} A), type acc {tacc:.3f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
