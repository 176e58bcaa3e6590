"""Convergence acceptance run: SemlaFlow learns a rigid molecule family to
high stability/validity AND uniqueness.

Mirrors the reference's generation-based validation
(molecule/semlaflow/flowmodels/fm.py:677-693: sample with the Integrator,
score stability/validity/uniqueness every val epoch): train the Semla
generator on a synthetic family, then integrate from the prior and score
with eval/molecule_metrics.

Families (--family):
  chains (default): 1,089 decorated heavy-atom chains — enough combinatorial
      entropy that a non-memorizing model reaches uniqueness >= 0.5 on top of
      validity >= 0.9 (the round-3 runs on 4 templates capped uniqueness at
      ~4/n_eval).
  templates: the 4 rigid QM9 templates (fast smoke).

Usage:
  python tools/convergence_semla.py                  # TPU, full run
  python tools/convergence_semla.py --tiny --cpu     # smoke scale
Writes CONVERGENCE_SEMLA.json at the repo root (or --out).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--coord-sets", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--schedule", default="constant",
                    choices=("constant", "cosine"),
                    help="cosine decays to 0 over --steps; the constant-LR "
                         "gradient-noise floor (~0.28A coord RMS at 3e-4) is "
                         "too coarse for bond-length stability on the "
                         "1,089-class chains family")
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--score-every", type=int, default=0,
                    help="score EMA params mid-run every N steps (0 = off)")
    ap.add_argument("--integrator-steps", type=int, default=100)
    ap.add_argument("--train-coord-noise", type=float, default=0.2,
                    help="TRAIN-time coordinate noise std (reference "
                         "train.py:62 DEFAULT_COORD_NOISE_STD_DEV=0.2): "
                         "teaches the model to denoise off-manifold "
                         "geometry; without it the sampler's own coord "
                         "error compounds and the co-generated graph goes "
                         "inconsistent (round-4 graph audit)")
    ap.add_argument("--cat-noise-level", type=float, default=1.0,
                    help="sampling-time categorical churn (reference "
                         "train.py:61 DEFAULT_CAT_SAMPLING_NOISE_LEVEL=1)")
    ap.add_argument("--n-eval", type=int, default=256)
    ap.add_argument("--family", default="chains",
                    choices=("chains", "templates"))
    ap.add_argument("--out", default="CONVERGENCE_SEMLA.json")
    ap.add_argument("--save-params", default="",
                    help="pickle final params/ema here for offline probes")
    ap.add_argument("--batch-pool", type=int, default=0,
                    help="pre-generate N host batches and cycle them (the "
                         "per-step numpy batch gen + per-sample Kabsch OT "
                         "otherwise dominates small-N steps). NOTE a fixed "
                         "pool freezes the interpolation noise/time draws — "
                         "the model memorizes them instead of learning "
                         "robustness (use --pool-refresh)")
    ap.add_argument("--pool-refresh", type=int, default=0,
                    help="regenerate the batch pool every N steps so the "
                         "interpolation noise stays fresh (0 = never)")
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (bfloat16 validates the "
                         "mixed-precision path: f32 coords, bf16 features)")
    ap.add_argument("--coord-skip", action="store_true",
                    help="residual coord head (x1_hat = x_t + delta): the "
                         "absolute head's late-t coordinate floor (~0.06 A "
                         "rms) exceeds the bond-window tolerance (~0.03 A) "
                         "on the rigid chains family")
    ap.add_argument("--rep-condition", action="store_true",
                    help="REED two-stage path: condition the CFM on a "
                         "per-class representation (the reference trains "
                         "semla with --rep_condition on frozen-encoder "
                         "reps and samples reps at generation, "
                         "fm.py:1006-1014; here the rep sampler is the "
                         "exact empirical class-embedding distribution, "
                         "isolating the GENERATOR for acceptance — the "
                         "RDM has its own gate, convergence_rdm.py). "
                         "Mechanism: the rep resolves WHICH molecule to "
                         "build from t=0; the unconditional flow's mid-t "
                         "posterior over templates is genuinely mixed and "
                         "per-atom commitment errors compound with size "
                         "(validity 1.00/0.44/0.18/0.09 for 4-7/8-11/"
                         "12-15/16-19 atoms, round-5 audit)")
    ap.add_argument("--d-rep", type=int, default=64)
    ap.add_argument("--cond-type", default="adaLN",
                    choices=("adaLN", "cross_attn"))
    ap.add_argument("--categorical-strategy", default="uniform-sample",
                    choices=("uniform-sample", "mask"),
                    help="reference train.py --categorical_strategy: "
                         "'mask' (DFM masking, arXiv:2402.04997) keeps "
                         "every mid-trajectory categorical state a PARTIAL "
                         "TRUE graph (true-or-MASK, never wrong-class "
                         "noise) — on a sparse rigid family the "
                         "uniform-sample trajectory passes through "
                         "incoherent states the model never trained on "
                         "(teacher-forced pred-graph validity 0.48 at "
                         "t=0.8 vs 0.95 at t=0.99, round-5 audit)")
    ap.add_argument("--coord-std", type=float, default=-1.0,
                    help="coordinate normalization divisor (reference "
                         "scriptutil.py:68-76 scales every molecule by "
                         "1/dataset_std so data matches the unit-Gaussian "
                         "prior; fm.py:1046 rescales generated coords). "
                         "-1 = compute from the family; 1.0 disables "
                         "(the pre-round-5 behavior)")
    ap.add_argument("--no-self-cond", action="store_true",
                    help="train WITHOUT self-conditioning — the reference "
                         "recipe's setting (molecule/README.md:38 does not "
                         "pass --self_condition; train.py:503 defaults it "
                         "False)")
    ap.add_argument("--f32-warmup", type=int, default=0,
                    help="run the first N steps at float32 compute, then "
                         "hand the state to the --dtype trainer. Probes the "
                         "bf16 early-training trap on the chains family: "
                         "bf16-from-scratch plateaus AT the unconditional "
                         "solution (loss 0.35 vs f32 0.13) — the gradient "
                         "that opens the rep-conditioning gates is below "
                         "the bf16 activation-rounding noise floor, so the "
                         "conditioning pathway never engages")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from reed_tpu.core.config import CurriculumConfig, OptimConfig
    from reed_tpu.data.synthetic import (
        CHAIN_MAX_ATOMS,
        MOLECULE_TEMPLATES,
        TEMPLATE_MAX_ATOMS,
        TEMPLATE_NUM_TYPES,
        chain_templates,
        template_molecule_batch,
    )
    from reed_tpu.diffusion.molecule_fm import (
        IntegratorConfig,
        MoleculeInterpolantConfig,
        MoleculePriorConfig,
        interpolate_batch,
    )
    from reed_tpu.eval.molecule_metrics import (SEMLA_IDX_CHARGES,
                                                GraphMoleculeMetrics)
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    if args.tiny:
        args.steps = min(args.steps, 500)
        args.batch_size = 32
        args.d_model = 64
        args.layers = 2
        args.coord_sets = 8
        args.integrator_steps = 50
        args.n_eval = 64

    if args.family == "chains":
        family = chain_templates()
        max_n = CHAIN_MAX_ATOMS
    else:
        family = list(MOLECULE_TEMPLATES)
        max_n = TEMPLATE_MAX_ATOMS
    coord_std = args.coord_std
    if coord_std <= 0:
        coord_std = float(np.sqrt(np.mean(np.concatenate(
            [t["coords"] for t in family], axis=0) ** 2)))
    args.coord_std = coord_std  # resolved value lands in the params pickle
    print(f"coord_std: {coord_std:.4f} (training in scaled space; "
          f"metrics on coords * coord_std)", flush=True)
    # mask strategy appends a mask token to both vocabularies (reference
    # scriptutil.get_n_bond_types / the vocab's mask token)
    masking = args.categorical_strategy == "mask"
    vocab_size = TEMPLATE_NUM_TYPES + (1 if masking else 0)
    n_bond_types = 5 + (1 if masking else 0)
    type_mask_index = TEMPLATE_NUM_TYPES if masking else None
    bond_mask_index = 5 if masking else None
    n_charge_types = 7
    # deterministic per-class embedding table = the exact rep distribution
    class_embs = (np.random.default_rng(4242)
                  .standard_normal((len(family), args.d_rep))
                  .astype(np.float32) / np.sqrt(args.d_rep)
                  if args.rep_condition else None)

    cfg = SemlaTrainConfig(
        vocab_size=vocab_size,
        n_bond_types=n_bond_types,
        n_charge_types=n_charge_types,
        max_atoms=max_n,
        d_model=args.d_model,
        d_message=args.d_model // 2,
        n_layers=args.layers,
        n_coord_sets=args.coord_sets,
        d_message_hidden=args.d_model // 2,
        d_edge=64,
        n_attn_heads=8,
        size_emb=16,
        d_rep=args.d_rep if args.rep_condition else None,
        cond_type=args.cond_type if args.rep_condition else "none",
        rep_alignment=False,
        type_strategy="mask" if masking else "ce",
        bond_strategy="mask" if masking else "ce",
        interpolant=MoleculeInterpolantConfig(
            prior=MoleculePriorConfig(
                vocab_size=vocab_size, n_bond_types=n_bond_types,
                type_noise=args.categorical_strategy,
                bond_noise=args.categorical_strategy,
                type_mask_index=type_mask_index,
                bond_mask_index=bond_mask_index),
            coord_noise_std=args.train_coord_noise),
        integrator=IntegratorConfig(
            steps=args.integrator_steps,
            cat_noise_level=args.cat_noise_level,
            type_strategy=args.categorical_strategy,
            bond_strategy=args.categorical_strategy,
            type_mask_index=type_mask_index,
            bond_mask_index=bond_mask_index),
        batch_size=args.batch_size,
        compute_dtype=args.dtype,
        coord_skip=args.coord_skip,
        self_cond=not args.no_self_cond,
        optim=OptimConfig(lr=args.lr, grad_clip=1.0,
                          schedule=args.schedule, warmup_steps=args.warmup,
                          total_steps=args.steps),
        # ema horizon ~1/(1-decay) steps must fit the run length for the
        # final_ema score to be meaningful (full runs are 2-5k steps)
        curriculum=CurriculumConfig(proj_coeff=0.0, diffusion_warmup_steps=0,
                                    ema_decay=0.995),
    )
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()

    warm_trainer = None
    if args.f32_warmup and args.dtype != "float32":
        import dataclasses
        warm_trainer = SemlaTrainer(
            dataclasses.replace(cfg, compute_dtype="float32"))

    def host_batch(r: np.random.Generator):
        raw = template_molecule_batch(r, args.batch_size, max_n,
                                      templates=family)
        raw["coords"] = raw["coords"] / coord_std
        mask = raw["mask"]
        # data one-hots live in the (possibly mask-extended) vocab; the mask
        # class itself never appears in data — real bond orders stay 0-4
        atomics = np.eye(vocab_size, dtype=np.float32)[
            raw["types"]] * mask[..., None]
        bonds = np.eye(n_bond_types, dtype=np.float32)[
            np.minimum(raw["bond_orders"], 4)]
        charges = np.zeros((args.batch_size, max_n, n_charge_types),
                           np.float32)
        charges[..., 0] = mask
        data = {"coords": raw["coords"], "atomics": atomics, "bonds": bonds,
                "charges": charges, "mask": mask}
        prior, interpolated, times = interpolate_batch(r, cfg.interpolant,
                                                       data)
        out = {"data": data, "prior": prior, "interpolated": interpolated,
               "times": times}
        if class_embs is not None:
            out["rep"] = class_embs[raw["template_idx"]]
        return jax.tree.map(jnp.asarray, out)

    # SemlaFlow co-generates bond categories: score the PREDICTED graph
    # (stability from the predicted adjacency, validity/uniqueness over the
    # built molecule — reference fm.py:677-693 + :276-306), not bonds
    # re-inferred from coordinate distances (that is the EDM metric).
    metrics_eval = GraphMoleculeMetrics()
    charge_map = np.asarray(SEMLA_IDX_CHARGES, np.int64)

    def score(params, seed: int):
        r = np.random.default_rng(30_000 + seed)
        cls = r.integers(0, len(family), size=args.n_eval)
        sizes = np.array([len(family[i]["types"]) for i in cls])
        mask = (np.arange(max_n)[None, :] < sizes[:, None]).astype(np.float32)
        prior = trainer.sample_prior(r, mask)
        # rep sampling at generation (reference fm.py:1006-1014 samples
        # reps from the RDM; the empirical class distribution is the
        # idealized rep sampler for this family)
        rep = (jnp.asarray(class_embs[cls]) if class_embs is not None
               else None)
        final = trainer.generate(params, jax.random.PRNGKey(seed), prior,
                                 rep=rep)
        coords = jax.device_get(final["coords"]) * coord_std
        # x1 never contains the mask token; argmax over the real classes
        # (the trained model leaves ~0 mass on mask at t~1, this only
        # guards the decoder index range)
        atom_logits = jax.device_get(final["atomics"])[..., :TEMPLATE_NUM_TYPES]
        bond_logits = jax.device_get(final["bonds"])[..., :5]
        types = np.argmax(atom_logits, axis=-1)
        orders = np.argmax(bond_logits, axis=-1)
        charges = charge_map[np.argmax(jax.device_get(final["charges"]),
                                       axis=-1)]
        mols = [(coords[b, :sizes[b]], types[b, :sizes[b]],
                 orders[b, :sizes[b], :sizes[b]], charges[b, :sizes[b]])
                for b in range(args.n_eval)]
        return metrics_eval.evaluate(mols)

    t0 = time.time()
    m0 = score(state.params, 0)
    print(f"step-0: {m0} ({time.time()-t0:.1f}s)", flush=True)

    pool = None
    if args.batch_pool:
        t0 = time.time()
        pool = [host_batch(np.random.default_rng(i))
                for i in range(args.batch_pool)]
        print(f"batch pool: {args.batch_pool} batches "
              f"({time.time()-t0:.1f}s)", flush=True)

    rng = trainer.train_rng
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        if (pool and args.pool_refresh and step
                and step % args.pool_refresh == 0):
            pool = [host_batch(np.random.default_rng(step * 131_071 + i))
                    for i in range(args.batch_pool)]
        batch = (pool[step % args.batch_pool] if pool
                 else host_batch(np.random.default_rng(step)))
        tr = (warm_trainer if (warm_trainer is not None
                               and step < args.f32_warmup) else trainer)
        state, metrics = tr.train_step(state, batch, rng)
        if step % 200 == 0 or step == args.steps - 1:
            loss = float(jax.device_get(metrics["denoising_loss"]))
            cl = float(jax.device_get(metrics["coord_loss"]))
            losses.append({"step": step, "loss": loss, "coord": cl})
            print(f"step {step}: loss={loss:.4f} coord={cl:.4f}", flush=True)
        if (args.score_every and step and step % args.score_every == 0):
            print(f"step {step} ema: {score(state.ema_params, 1)}",
                  flush=True)
    train_secs = time.time() - t0

    m_ema = score(state.ema_params, 1)
    m_final = score(state.params, 1)
    print(f"final: params={m_final} ema={m_ema}", flush=True)

    if args.save_params:
        import pickle
        with open(args.save_params, "wb") as f:
            pickle.dump({"params": jax.device_get(state.params),
                         "ema": jax.device_get(state.ema_params),
                         "args": vars(args)}, f)
        print(f"params saved: {args.save_params}", flush=True)

    result = {
        "domain": "molecule_semla",
        "metric": "mol_stable/atom_stable/validity",
        "step0": m0,
        "final": m_final,
        "final_ema": m_ema,
        "steps": args.steps,
        "train_seconds": round(train_secs, 1),
        "platform": jax.devices()[0].platform,
        "config": {"batch_size": args.batch_size, "d_model": args.d_model,
                   "layers": args.layers, "coord_sets": args.coord_sets,
                   "lr": args.lr, "schedule": args.schedule,
                   "warmup": args.warmup,
                   "integrator_steps": args.integrator_steps,
                   "dtype": args.dtype, "f32_warmup": args.f32_warmup,
                   "coord_skip": args.coord_skip,
                   "train_coord_noise": args.train_coord_noise,
                   "cat_noise_level": args.cat_noise_level,
                   "self_cond": not args.no_self_cond,
                   "coord_std": coord_std,
                   "categorical_strategy": args.categorical_strategy,
                   "rep_condition": args.rep_condition,
                   "family": args.family,
                   "n_classes": len(family),
                   "n_eval": args.n_eval},
        "loss_curve": losses,
        "command": "python tools/convergence_semla.py"
                   + (" --tiny --cpu" if args.tiny else ""),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"}))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
