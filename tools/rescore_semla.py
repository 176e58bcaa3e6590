"""Rescore a saved semla convergence run under different sampling settings
(schedule, step count) without retraining — isolates integration error from
model error. Usage:
  python tools/rescore_semla.py /tmp/semla_chains_params.pkl \
      --strategy log --steps 100
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pickle")
    ap.add_argument("--strategy", default="log", choices=("linear", "log"))
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--n-eval", type=int, default=256)
    ap.add_argument("--which", default="ema", choices=("ema", "params"))
    ap.add_argument("--cat-noise", type=float, default=None,
                    help="override sampling-time categorical churn "
                         "(default: the run's training-time value)")
    ap.add_argument("--pred-temp", type=float, default=1.0,
                    help="temperature on the predicted categorical dists "
                         "the integrator consumes (<1 commits the "
                         "trajectory toward coherent argmaxes; extension, "
                         "see SemlaTrainer.generate)")
    ap.add_argument("--coord-noise", type=float, default=0.0,
                    help="sampling-time coordinate noise std in MODEL "
                         "space (the reference Integrator's own "
                         "coord_noise_std, fm.py:29/67 — default 0 there "
                         "too). The model is trained to denoise "
                         "train_coord_noise-scale jitter, so noising the "
                         "trajectory keeps its states inside the trained "
                         "basin")
    ap.add_argument("--final", default="last", choices=("last", "extra"),
                    help="final-prediction protocol (see "
                         "SemlaTrainer.generate)")
    ap.add_argument("--zero-cond", action="store_true",
                    help="zero the self-conditioning input through sampling")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from reed_tpu.core.config import CurriculumConfig, OptimConfig
    from reed_tpu.data.synthetic import (CHAIN_MAX_ATOMS, TEMPLATE_NUM_TYPES,
                                         chain_templates)
    from reed_tpu.diffusion.molecule_fm import (IntegratorConfig,
                                                MoleculeInterpolantConfig,
                                                MoleculePriorConfig)
    from reed_tpu.eval.molecule_metrics import (SEMLA_IDX_CHARGES,
                                                GraphMoleculeMetrics,
                                                MoleculeMetrics)
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    with open(args.pickle, "rb") as f:
        saved = pickle.load(f)
    run = saved["args"]
    params = saved[args.which]
    family = chain_templates()
    max_n = CHAIN_MAX_ATOMS

    cfg = SemlaTrainConfig(
        vocab_size=TEMPLATE_NUM_TYPES, n_bond_types=5, n_charge_types=7,
        max_atoms=max_n, d_model=run["d_model"],
        d_message=run["d_model"] // 2, n_layers=run["layers"],
        n_coord_sets=run["coord_sets"], d_message_hidden=run["d_model"] // 2,
        d_edge=64, n_attn_heads=8, size_emb=16, d_rep=None,
        rep_alignment=False,
        interpolant=MoleculeInterpolantConfig(
            prior=MoleculePriorConfig(vocab_size=TEMPLATE_NUM_TYPES,
                                      n_bond_types=5),
            coord_noise_std=run.get("train_coord_noise", 0.0)),
        integrator=IntegratorConfig(
            steps=args.steps,
            coord_noise_std=args.coord_noise,
            cat_noise_level=(run.get("cat_noise_level", 0.0)
                             if args.cat_noise is None else args.cat_noise)),
        batch_size=run["batch_size"], compute_dtype=run["dtype"],
        coord_skip=run.get("coord_skip", False),
        self_cond=not run.get("no_self_cond", False),
        optim=OptimConfig(lr=run["lr"], grad_clip=1.0),
        curriculum=CurriculumConfig(proj_coeff=0.0, diffusion_warmup_steps=0,
                                    ema_decay=0.995),
    )
    trainer = SemlaTrainer(cfg)

    r = np.random.default_rng(30_001)
    sizes = np.array([len(family[i]["types"])
                      for i in r.integers(0, len(family), size=args.n_eval)])
    mask = (np.arange(max_n)[None, :] < sizes[:, None]).astype(np.float32)
    prior = trainer.sample_prior(r, mask)
    final = trainer.generate(params, jax.random.PRNGKey(1), prior,
                             sampling_strategy=args.strategy,
                             final_protocol=args.final,
                             zero_cond=args.zero_cond,
                             pred_temp=args.pred_temp)
    coord_std = run.get("coord_std", 1.0)
    if coord_std <= 0:  # unresolved -1 from older pickles
        coord_std = 1.0
    coords = np.asarray(jax.device_get(final["coords"])) * coord_std
    types = np.argmax(np.asarray(jax.device_get(final["atomics"])), axis=-1)
    orders = np.argmax(np.asarray(jax.device_get(final["bonds"])), axis=-1)
    charges = np.asarray(SEMLA_IDX_CHARGES, np.int64)[
        np.argmax(np.asarray(jax.device_get(final["charges"])), axis=-1)]
    gmols = [(coords[b, :sizes[b]], types[b, :sizes[b]],
              orders[b, :sizes[b], :sizes[b]], charges[b, :sizes[b]])
             for b in range(args.n_eval)]
    m = GraphMoleculeMetrics().evaluate(gmols)
    # per-size validity: the coherence ceiling predicts failure rate
    # grows with atom count (more joint constraints, more blending
    # ambiguity mid-trajectory)
    by_n = {}
    for g, n in zip(gmols, sizes):
        ok = GraphMoleculeMetrics().evaluate([g])["validity"]
        lo = (int(n) // 4) * 4
        k = f"{lo}-{lo + 3}"
        a, b = by_n.get(k, (0, 0))
        by_n[k] = (a + ok, b + 1)
    print("validity by n_atoms: "
          + " ".join(f"{k}:{a / b:.2f}(n={b})"
                     for k, (a, b) in sorted(by_n.items())), flush=True)
    print(f"strategy={args.strategy} steps={args.steps} which={args.which} "
          f"cat_noise={args.cat_noise} coord_noise={args.coord_noise} "
          f"pred_temp={args.pred_temp} final={args.final} "
          f"zero_cond={args.zero_cond}: graph(semla protocol): {m}",
          flush=True)
    mols = [(coords[b, :sizes[b]], types[b, :sizes[b]])
            for b in range(args.n_eval)]
    md = MoleculeMetrics().evaluate(mols)
    print(f"  distance-inferred (EDM protocol, diagnostic): {md}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
