"""Convergence acceptance run: EDM learns a rigid molecule family to high
atom/molecule stability AND uniqueness.

Mirrors the reference's metrics-as-acceptance loop (analyze_and_save at
molecule/train_test.py:170-233 scoring analyze_stability_for_molecules):
train EnVariationalDiffusion on a randomly-rotated rigid family —
--family chains (default): 1,089 decorated heavy-atom chains, enough
combinatorial entropy to prove uniqueness >= 0.5 alongside validity;
--family templates: the 4 rigid QM9 templates (fast smoke) —
then sample molecules and score stability/validity/uniqueness with
eval/molecule_metrics.MoleculeMetrics. Untrained: ~0 stability. Learned:
atoms land inside the bond-order distance windows.

Usage:
  python tools/convergence_edm.py                  # TPU, full run
  python tools/convergence_edm.py --tiny --cpu     # smoke scale
Writes CONVERGENCE_EDM.json at the repo root (or --out).
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
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--schedule", default="constant",
                    choices=("constant", "cosine"),
                    help="cosine decays to 0 over --steps (the constant-LR "
                         "noise floor under-fits the 1,089-class family)")
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--score-every", type=int, default=0,
                    help="score EMA params mid-run every N steps (0 = off)")
    ap.add_argument("--timesteps", type=int, default=500)
    ap.add_argument("--n-eval", type=int, default=256)
    ap.add_argument("--family", default="chains",
                    choices=("chains", "templates"))
    ap.add_argument("--rep-condition", action="store_true",
                    help="condition the EGNN on a per-class representation "
                         "(GeoRCG's own two-stage design: the reference "
                         "trains EDM conditioned on frozen-encoder reps and "
                         "samples reps from the RDM, "
                         "molecule/models/__init__.py get_model rep path; "
                         "here the rep sampler is the exact empirical class "
                         "distribution. On the chains family the rep "
                         "resolves WHICH molecule to build — mid-t "
                         "posteriors over 1,089 templates are otherwise "
                         "mixed; see docs/semla_chains_coherence.md)")
    ap.add_argument("--d-rep", type=int, default=64)
    ap.add_argument("--out", default="CONVERGENCE_EDM.json")
    ap.add_argument("--save-params", default="",
                    help="pickle final params/ema here for offline probes")
    ap.add_argument("--batch-pool", type=int, default=0,
                    help="pre-generate N host batches and cycle them")
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
    from reed_tpu.diffusion.edm import EDMConfig
    from reed_tpu.eval.molecule_metrics import MoleculeMetrics
    from reed_tpu.train.molecule_edm import MoleculeEDMConfig, MoleculeEDMTrainer

    if args.tiny:
        args.steps = min(args.steps, 600)
        args.batch_size = 32
        args.hidden = 64
        args.layers = 2
        args.timesteps = 100
        args.n_eval = 64

    if args.family == "chains":
        family = chain_templates()
        max_n = CHAIN_MAX_ATOMS
    else:
        family = list(MOLECULE_TEMPLATES)
        max_n = TEMPLATE_MAX_ATOMS
    cfg = MoleculeEDMConfig(
        num_atom_types=TEMPLATE_NUM_TYPES,
        include_charges=True,
        max_nodes=max_n,
        hidden_nf=args.hidden,
        n_layers=args.layers,
        rep_nf=args.d_rep if args.rep_condition else None,
        rep_dropout_prob=0.0,             # idealized rep sampler, no CFG
        edm=EDMConfig(timesteps=args.timesteps),
        batch_size=args.batch_size,
        optim=OptimConfig(lr=args.lr, grad_clip=1.0,
                          schedule=args.schedule, warmup_steps=args.warmup,
                          total_steps=args.steps),
        # ema horizon ~1/(1-decay) steps must fit the run length for the
        # final_ema score to be meaningful (full runs are 2-5k steps)
        curriculum=CurriculumConfig(proj_coeff=0.0, diffusion_warmup_steps=0,
                                    ema_decay=0.995),
    )
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()

    # deterministic per-class embedding table = the exact rep distribution
    # (mirrors tools/convergence_semla.py: the idealized RDM for this family)
    class_embs = (np.random.default_rng(7)
                  .standard_normal((len(family), args.d_rep))
                  .astype(np.float32) / np.sqrt(args.d_rep)
                  if args.rep_condition else None)

    def host_batch(r: np.random.Generator):
        raw = template_molecule_batch(r, args.batch_size, max_n,
                                      templates=family)
        mask = raw["mask"][..., None]
        diag = np.eye(max_n, dtype=np.float32)[None, :, :, None]
        edge_mask = mask[:, :, None, :] * mask[:, None, :, :] * (1.0 - diag)
        one_hot = np.eye(TEMPLATE_NUM_TYPES, dtype=np.float32)[
            raw["types"]] * mask
        out = {
            "positions": jnp.asarray(raw["coords"]),
            "one_hot": jnp.asarray(one_hot),
            "charges": jnp.asarray(raw["charges"][..., None] * mask),
            "node_mask": jnp.asarray(mask),
            "edge_mask": jnp.asarray(edge_mask),
        }
        if class_embs is not None:
            out["rep"] = jnp.asarray(class_embs[raw["template_idx"]])
        return out

    metrics_eval = MoleculeMetrics()

    def score(params, seed: int):
        """Sample n_eval molecules (template-matched sizes) and score."""
        r = np.random.default_rng(20_000 + seed)
        cls = r.integers(0, len(family), size=args.n_eval)
        sizes = np.array([len(family[i]["types"]) for i in cls])
        mask = (np.arange(max_n)[None, :] < sizes[:, None]
                ).astype(np.float32)[..., None]
        diag = np.eye(max_n, dtype=np.float32)[None, :, :, None]
        edge_mask = mask[:, :, None, :] * mask[:, None, :, :] * (1.0 - diag)
        # rep sampling at generation: the empirical class distribution is
        # the idealized rep sampler for this family (GeoRCG samples reps
        # from the trained RDM instead)
        rep = (jnp.asarray(class_embs[cls]) if class_embs is not None
               else None)
        x, h_cat, _ = trainer.sample(
            params, jax.random.PRNGKey(seed), args.n_eval,
            jnp.asarray(mask), jnp.asarray(edge_mask), rep=rep)
        x = jax.device_get(x)
        types = np.argmax(jax.device_get(h_cat), axis=-1)
        mols = [(x[b, :sizes[b]], types[b, :sizes[b]])
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
        batch = (pool[step % args.batch_pool] if pool
                 else host_batch(np.random.default_rng(step)))
        state, metrics = trainer.train_step(state, batch, rng)
        if step % 200 == 0 or step == args.steps - 1:
            loss = float(jax.device_get(metrics["denoising_loss"]))
            losses.append({"step": step, "nll": loss})
            print(f"step {step}: nll={loss:.4f}", flush=True)
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
        "domain": "molecule_edm",
        "metric": "mol_stable/atom_stable/validity",
        "step0": m0,
        "final": m_final,
        "final_ema": m_ema,
        "steps": args.steps,
        "train_seconds": round(train_secs, 1),
        "platform": jax.devices()[0].platform,
        "config": {"batch_size": args.batch_size, "hidden": args.hidden,
                   "layers": args.layers, "lr": args.lr,
                   "schedule": args.schedule, "warmup": args.warmup,
                   "timesteps": args.timesteps, "family": args.family,
                   "rep_condition": args.rep_condition,
                   "n_classes": len(family), "n_eval": args.n_eval},
        "loss_curve": losses,
        "command": "python tools/convergence_edm.py"
                   + (" --tiny --cpu" if args.tiny else ""),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"}))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
