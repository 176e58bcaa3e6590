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
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--fsdp", type=int, default=None)
    p.add_argument("--tp", type=int, default=None)
    p.add_argument("--sp", type=int, default=None,
                   help="sequence-parallel axis size (image domain: shards "
                        "SiT tokens over the 'seq' mesh axis)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 3-8")
    p.add_argument("--config", type=str, default=None,
                   help="JSON config tree (full or partial TrainConfig)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE",
                   help="dotted-path config override, e.g. optim.lr=3e-4 or "
                        "loss.enc_names='[\"dinov2\",\"qwen2vl\"]'")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "runs (TPU pods; reads cluster env)")


def _resolve_cfg(cls, args, defaults=None):
    """defaults <- --config file <- explicit legacy flags <- --set."""
    from reed_tpu.core import configlib

    cfg = configlib.build(cls, defaults or {})
    if args.config:
        cfg = configlib.merge(cfg, configlib.load_file(args.config))
    legacy = {}
    if getattr(args, "model", None) is not None:
        legacy["model"] = args.model
    if args.batch_size is not None:
        legacy["batch_size"] = args.batch_size
    if args.lr is not None:
        legacy["optim"] = {"lr": args.lr}
    if args.seed is not None:
        legacy["seed"] = args.seed
    mesh = {k: v for k, v in
            {"data": args.dp, "fsdp": args.fsdp, "tensor": args.tp,
             "seq": getattr(args, "sp", None)}.items()
            if v is not None}
    if mesh:
        legacy["mesh"] = mesh
    if legacy:
        cfg = configlib.merge(cfg, legacy)
    if args.overrides:
        cfg = configlib.apply_overrides(cfg, args.overrides)
    if getattr(args, "distributed", False):
        jax.distributed.initialize()
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    return cfg


def _run_loop(trainer, state, batch_iter, args, samples_per_step,
              sample_hook=None, cfg=None):
    from reed_tpu.core.logging import MetricLogger

    logger = MetricLogger(log_dir=args.ckpt_dir)
    if cfg is not None and args.ckpt_dir and jax.process_index() == 0:
        from reed_tpu.core import configlib

        path = configlib.snapshot(cfg, args.ckpt_dir)
        print(f"config snapshot -> {path}")
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


def _find_split(data_dir: str, split: str) -> str:
    """Locate a split file: <dir>/<split>.(rsmol|npz) or <dir> itself."""
    if os.path.isfile(data_dir):
        return data_dir
    # np.savez appends .npz, so save_dataset('train.rsmol') lands as
    # train.rsmol.npz
    for ext in (".rsmol", ".rsmol.npz", ".npz"):
        p = os.path.join(data_dir, split + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"no {split}.rsmol[.npz] or {split}.npz under {data_dir}")


def _load_reps(data_dir: str, d_rep, n: int):
    """Precomputed frozen-encoder reps aligned with the dataset (written by
    tools/precompute_*; reference computes them per batch from the frozen
    torch encoder, semlaflow/train.py:300-330). Zero-fills with a warning
    when the reps file is absent so smoke runs stay possible."""
    if d_rep is None:
        return None
    if os.path.isfile(data_dir):
        data_dir = os.path.dirname(data_dir)
    for name in ("reps.npy", "train_reps.npy"):
        p = os.path.join(data_dir, name)
        if os.path.exists(p):
            reps = np.load(p)
            assert len(reps) == n, (len(reps), n)
            assert reps.shape[1] == d_rep, (reps.shape, d_rep)
            return reps.astype(np.float32)
    print(f"WARNING: no reps.npy in {data_dir}; rep conditioning/alignment "
          f"will see zeros (train with d_rep=null to silence)")
    return np.zeros((n, d_rep), np.float32)


def train_image(args):
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    defaults = {"exact_gelu": True} if getattr(args, "ref_ckpt", None) \
        else {}
    cfg = _resolve_cfg(ImageTrainConfig, args, defaults=defaults)
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()
    if getattr(args, "ref_ckpt", None):
        # warm-start training from a converted reference torch checkpoint
        # (migration path; reference resumes its own ckpts at
        # image/train.py:282-291)
        from reed_tpu.encoders.sit_convert import load_reference_checkpoint

        variables = load_reference_checkpoint(
            args.ref_ckpt, depth=trainer.model.depth,
            num_projectors=len(cfg.z_dims))
        params = jax.tree.map(jnp.asarray, variables["params"])
        state = state.replace(
            params=params, ema_params=jax.tree.map(jnp.copy, params))
        print(f"warm-started from reference checkpoint {args.ref_ckpt}")
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

        encoders = None
        ds_cfg = ImageDatasetConfig(args.data_dir)
        if args.enc_type:
            # in-loop frozen-encoder features from raw pixel crops
            # (reference: image/train.py:348-360) instead of the
            # precompute-to-disk path
            from reed_tpu.encoders.registry import (encode_features,
                                                    load_encoders)

            encoders, _, _ = load_encoders(args.enc_type,
                                           encoder_dir=args.encoder_dir)
            ds_cfg = ImageDatasetConfig(args.data_dir,
                                        pixels_subdir=args.pixels_subdir)
        ds = CachedLatentDataset(ds_cfg)

        def gen():
            epoch = 0
            while True:
                for batch in epoch_batches(ds, cfg.batch_size,
                                           cfg.seed + epoch,
                                           jax.process_index(),
                                           jax.process_count()):
                    if encoders is not None:
                        pixels = batch.pop("pixels")
                        batch["zs"] = (encode_features(encoders, pixels)
                                       + list(batch["zs"]))
                    yield batch
                epoch += 1
        batches = gen()

    decode_fn = None
    if args.sample_every:
        from reed_tpu.eval.fid import make_vae_decode_fn

        decode_fn = make_vae_decode_fn(getattr(args, "vae", None),
                                       latent_size=cfg.input_size,
                                       latent_channels=cfg.in_channels)

    def sample_hook(state, step):
        """In-loop preview sampling (reference: image/train.py:431-454):
        Euler-sample from EMA weights, VAE-decode to pixels when a decoder
        is available (latent-channel grid otherwise)."""
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

        out = generate_samples(model_fn, state.ema_params, gen_cfg,
                               decode_fn=decode_fn)
        if decode_fn is None:
            # visualize first 3 latent channels as RGB
            vis = out[..., :3]
            vis = (vis - vis.min()) / (vis.max() - vis.min() + 1e-8)
            out = (vis * 255).astype(np.uint8)
        path = f"{args.ckpt_dir or '.'}/preview_{step:07d}.png"
        save_image_grid(path, out)
        print(f"saved sample preview -> {path}")

    _run_loop(trainer, state, batches, args, cfg.batch_size,
              sample_hook=sample_hook if args.sample_every else None,
              cfg=cfg)


def train_protein(args):
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    cfg = _resolve_cfg(ProteinTrainConfig, args)
    trainer = ProteinTrainer(cfg)
    state = trainer.init_state()
    if getattr(args, "ref_ckpt", None):
        # warm-start from a converted reference fmif checkpoint (migration
        # path; reference --previous_checkpoint, train_fmif.py:225-237)
        from reed_tpu.encoders.fmif_convert import load_torch_fmif_checkpoint

        conv = jax.tree.map(jnp.asarray,
                            load_torch_fmif_checkpoint(args.ref_ckpt))
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"warm-started from reference checkpoint {args.ref_ckpt}")

    if args.synthetic or not args.data_dir:
        def gen():
            i = 0
            while True:
                yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                i += 1
    else:
        from reed_tpu.data.protein import (BufferPool, PDBParams,
                                           build_training_clusters,
                                           sample_cluster_chains,
                                           token_bucket_batches)

        params = PDBParams(args.data_dir,
                           repr_dir=os.path.join(args.data_dir, "repr")
                           if os.path.isdir(os.path.join(args.data_dir,
                                                         "repr")) else None)
        train_clusters, _, _ = build_training_clusters(params)
        # the trainer schema always carries repr tensors; featurize
        # zero-fills them when the AF3 embedding dir is absent (alignment
        # then sees zeros — train with --set load_repr=false in that case)
        repr_dims = {"single": cfg.single_dim, "pair": cfg.pair_dim,
                     "structure": cfg.structure_dim}
        if params.repr_dir is None and cfg.load_repr:
            print("WARNING: no repr/ dir under --data-dir; AF3 alignment "
                  "targets are zero-filled")

        # recycled featurize buffers: first-touch page faults on the
        # [B,L,L,128] pair tensor cost ~10 s/batch otherwise (measured);
        # depth 4 > the in-flight batch count of this loop
        pool = BufferPool(depth=4)

        def gen():
            epoch = 0
            while True:
                rng = np.random.default_rng((args.seed or 0) + epoch)
                entries = sample_cluster_chains(rng, train_clusters, params,
                                                max_length=cfg.max_len)
                # each bucket length compiles once; per-epoch reshuffle
                for batch in token_bucket_batches(
                        entries, token_budget=args.token_budget,
                        repr_dims=repr_dims, shuffle_rng=rng, pool=pool):
                    yield {k: jnp.asarray(v) for k, v in batch.items()}
                epoch += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size, cfg=cfg)


def train_molecule_edm(args):
    from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                             MoleculeEDMTrainer)

    cfg = _resolve_cfg(MoleculeEDMConfig, args)
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()
    if getattr(args, "ref_ckpt", None):
        # warm-start from a converted reference EDM checkpoint (migration
        # path; reference Hydra resume, self_condition_train_qm9.py:78-101)
        from reed_tpu.encoders.edm_convert import load_torch_edm_checkpoint

        conv, _gamma = load_torch_edm_checkpoint(args.ref_ckpt)
        conv = jax.tree.map(jnp.asarray, conv)
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"warm-started from reference checkpoint {args.ref_ckpt}")

    if args.synthetic or not args.data_dir:
        def gen():
            i = 0
            while True:
                yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                i += 1
    else:
        from reed_tpu.data.molecule import edm_epoch_batches, load_qm9_edm_npz

        data = load_qm9_edm_npz(_find_split(args.data_dir, "train"))
        reps = _load_reps(args.data_dir, cfg.rep_nf, len(data["positions"]))

        def gen():
            epoch = 0
            while True:
                rng = np.random.default_rng((args.seed or 0) + epoch)
                yield from edm_epoch_batches(
                    data, cfg.batch_size, rng, reps=reps,
                    max_nodes=cfg.max_nodes,
                    num_atom_types=cfg.num_atom_types,
                    include_charges=cfg.include_charges)
                epoch += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size, cfg=cfg)


def train_molecule_semla(args):
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = _resolve_cfg(SemlaTrainConfig, args)
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()
    if getattr(args, "ref_ckpt", None):
        # reference torch SemlaFlow/Lightning checkpoint, converted on load
        # (encoders/semla_convert.py); dims must match via --set
        from reed_tpu.encoders.semla_convert import load_torch_semla_checkpoint

        conv = jax.tree.map(jnp.asarray,
                            load_torch_semla_checkpoint(args.ref_ckpt))
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"warm-started from reference checkpoint {args.ref_ckpt}")

    if args.synthetic or not args.data_dir:
        def gen():
            i = 0
            while True:
                yield jax.tree.map(jnp.asarray,
                                   trainer.example_batch(cfg.batch_size, 32,
                                                         seed=i))
                i += 1
        samples_per_step = cfg.batch_size
    else:
        from reed_tpu.data.molecule import (GEOM_COORDS_STD_DEV,
                                            QM9_COORDS_STD_DEV,
                                            load_dataset, mol_transform,
                                            semla_epoch_batches)

        coord_std = (args.coord_std if args.coord_std is not None
                     else GEOM_COORDS_STD_DEV if args.dataset == "geom"
                     else QM9_COORDS_STD_DEV)
        mols = [mol_transform(m, coord_std)
                for m in load_dataset(_find_split(args.data_dir, "train"))]
        reps = _load_reps(args.data_dir, cfg.d_rep, len(mols))
        print(f"loaded {len(mols)} molecules from {args.data_dir}")

        def gen():
            epoch = 0
            while True:
                rng = np.random.default_rng((args.seed or 0) + epoch)
                yield from semla_epoch_batches(
                    mols, cfg.interpolant, rng, reps=reps,
                    batch_cost=args.batch_cost,
                    vocab_size=cfg.vocab_size,
                    n_bond_types=cfg.n_bond_types,
                    n_charge_types=cfg.n_charge_types)
                epoch += 1
        samples_per_step = args.batch_cost // 64  # rough avg for throughput
    _run_loop(trainer, state, gen(), args,
              cfg.batch_size if args.synthetic or not args.data_dir
              else samples_per_step, cfg=cfg)


def train_multiflow(args):
    from reed_tpu.train.multiflow import MultiflowTrainConfig, MultiflowTrainer

    cfg = _resolve_cfg(MultiflowTrainConfig, args)
    trainer = MultiflowTrainer(cfg)
    state = trainer.init_state()
    if getattr(args, "ref_ckpt", None):
        # reference torch MultiFlow/Lightning checkpoint, converted on load
        # (encoders/multiflow_convert.py); dims must match via --set
        from reed_tpu.encoders.multiflow_convert import \
            load_torch_multiflow_checkpoint

        conv = jax.tree.map(jnp.asarray, load_torch_multiflow_checkpoint(
            args.ref_ckpt, num_blocks=cfg.num_blocks,
            seq_tfmr_num_layers=cfg.seq_tfmr_num_layers))
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"warm-started from reference checkpoint {args.ref_ckpt}")

    if args.synthetic or not args.data_dir:
        def gen():
            i = 0
            while True:
                yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                i += 1
    else:
        from reed_tpu.data.protein import multiflow_epoch_batches

        def gen():
            epoch = 0
            while True:
                rng = np.random.default_rng((args.seed or 0) + epoch)
                yield from multiflow_epoch_batches(
                    args.data_dir, cfg.batch_size, rng,
                    max_len=cfg.max_len,
                    trans_batch_ot=cfg.interpolant.trans_batch_ot,
                    trans_scale=cfg.interpolant.trans_scale)
                epoch += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size, cfg=cfg)


def train_rdm(args):
    from reed_tpu.eval.rep_samplers import DDIMRepSampler
    from reed_tpu.train.rdm import RDMTrainConfig, RDMTrainer

    cfg = _resolve_cfg(RDMTrainConfig, args)
    trainer = RDMTrainer(cfg)
    state = trainer.init_state()

    if args.synthetic or not args.data_dir:
        def gen():
            i = 0
            while True:
                yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                i += 1
    else:
        # precomputed encoder reps + molecule sizes on disk
        # (reference: molecule/src/rdm/main_rdm_sampling.py data loading)
        reps = np.load(os.path.join(args.data_dir, "reps.npy"))
        sizes = np.load(os.path.join(args.data_dir, "sizes.npy"))
        assert reps.shape[1] == cfg.channels, (reps.shape, cfg.channels)

        def gen():
            epoch = 0
            while True:
                rng = np.random.default_rng((args.seed or 0) + epoch)
                order = rng.permutation(len(reps))
                for i in range(0, len(order) - cfg.batch_size + 1,
                               cfg.batch_size):
                    idx = order[i:i + cfg.batch_size]
                    yield {"rep": jnp.asarray(reps[idx]),
                           "num_atoms": jnp.asarray(
                               sizes[idx].astype(np.int32))}
                epoch += 1

    state = _run_loop(trainer, state, gen(), args, cfg.batch_size, cfg=cfg)
    # smoke-sample a few reps through DDIM to close the two-stage loop
    sampler = DDIMRepSampler(trainer.diffusion(state.ema_params), eta=1.0,
                             step_num=10)
    reps = sampler.sample(jax.random.PRNGKey(0), np.array([9, 12, 15]))
    print("sampled reps:", reps.shape,
          "finite:", bool(jnp.all(jnp.isfinite(reps))))


def train_property(args):
    """Train the EGNN property regressor on a QM9-layout npz with property
    columns (reference: qm9/property_prediction/main_qm9_prop.py), or with
    --linear-probe a linear head on frozen-encoder reps from reps.npy
    (reference: main_qm9_prop_pretrainedEnc_linear.py)."""
    from reed_tpu.train.property import (LinearProbeConfig,
                                         LinearProbeTrainer,
                                         PropertyTrainConfig, PropertyTrainer,
                                         compute_mean_mad,
                                         property_epoch_batches)

    defaults = {}
    data = None
    if args.data_dir and not args.synthetic:
        from reed_tpu.data.molecule import load_qm9_edm_npz

        data = load_qm9_edm_npz(_find_split(args.data_dir, "train"))
        if args.property not in data:
            raise SystemExit(f"property '{args.property}' not in npz keys "
                             f"{sorted(data)}")
        mean, mad = compute_mean_mad(data[args.property])
        defaults = {"mean": mean, "mad": mad}
        print(f"property {args.property}: mean={mean:.4f} mad={mad:.4f}")

    if args.linear_probe:
        reps = None
        if data is not None:
            reps = np.load(os.path.join(args.data_dir, "reps.npy")
                           ).astype(np.float32)
            labels = np.asarray(data[args.property], np.float32)
            assert len(reps) == len(labels), (reps.shape, labels.shape)
            defaults["rep_dim"] = reps.shape[1]
        cfg = _resolve_cfg(LinearProbeConfig, args,
                           defaults={**defaults, "property": args.property})
        trainer = LinearProbeTrainer(cfg)
        state = trainer.init_state()

        if reps is None:
            def gen():
                i = 0
                while True:
                    yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                    i += 1
        else:
            def gen():
                epoch = 0
                while True:
                    rng = np.random.default_rng((args.seed or 0) + epoch)
                    order = rng.permutation(len(reps))
                    for i in range(0, len(order) - cfg.batch_size + 1,
                                   cfg.batch_size):
                        idx = order[i:i + cfg.batch_size]
                        yield {"rep": reps[idx], "label": labels[idx]}
                    epoch += 1

        _run_loop(trainer, state, gen(), args, cfg.batch_size, cfg=cfg)
        return

    cfg = _resolve_cfg(PropertyTrainConfig, args,
                       defaults={**defaults, "property": args.property})
    trainer = PropertyTrainer(cfg)
    state = trainer.init_state()

    if data is None:
        def gen():
            i = 0
            while True:
                yield trainer.synthetic_batch(jax.random.PRNGKey(i))
                i += 1
    else:
        def gen():
            epoch = 0
            while True:
                rng = np.random.default_rng((args.seed or 0) + epoch)
                yield from property_epoch_batches(
                    data, cfg.property, cfg.batch_size, rng,
                    max_nodes=cfg.max_nodes,
                    num_atom_types=cfg.num_atom_types)
                epoch += 1

    _run_loop(trainer, state, gen(), args, cfg.batch_size, cfg=cfg)


def eval_conditional(args):
    """Conditional-generation MAE: sample property-conditioned molecules
    from an EDM checkpoint and score them with a trained property
    classifier (reference: molecule/eval_src/eval_conditional_qm9.py)."""
    from reed_tpu.eval.molecule_metrics import (DistributionNodes,
                                                DistributionProperty)
    from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                             MoleculeEDMTrainer)
    from reed_tpu.train.property import (PropertyTrainConfig, PropertyTrainer,
                                         compute_mean_mad)

    np_rng = np.random.default_rng(args.seed or 0)
    gen_cfg = _resolve_cfg(MoleculeEDMConfig, args,
                           defaults={"batch_size": args.n_samples,
                                     "context_node_nf": 1,
                                     "edm": {"timesteps": args.num_steps}})
    trainer = MoleculeEDMTrainer(gen_cfg)
    state = trainer.init_state()
    if args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        state = CheckpointManager(args.ckpt_dir).restore(
            jax.eval_shape(lambda: state))

    # property/size distributions from the training split when available
    if args.data_dir:
        from reed_tpu.data.molecule import load_qm9_edm_npz

        data = load_qm9_edm_npz(_find_split(args.data_dir, "train"))
        sizes_src = np.minimum(np.asarray(data["num_atoms"], np.int64),
                               gen_cfg.max_nodes)
        values = np.asarray(data[args.property], np.float64)
        mean, mad = compute_mean_mad(values)
    else:
        sizes_src = np_rng.integers(gen_cfg.max_nodes // 2,
                                    gen_cfg.max_nodes + 1, 512)
        values = np_rng.standard_normal(512)
        mean, mad = 0.0, 1.0
    node_dist = DistributionNodes(
        {int(s): float((sizes_src == s).sum())
         for s in np.unique(sizes_src)})
    prop_dist = DistributionProperty(sizes_src, values)

    clf_cfg = PropertyTrainConfig(
        property=args.property, mean=mean, mad=mad,
        num_atom_types=gen_cfg.num_atom_types, max_nodes=gen_cfg.max_nodes,
        mesh=gen_cfg.mesh)
    if args.classifier_ckpt:
        # model dims + normalizer come from the training run's own config
        # snapshot (written by train-property next to the checkpoints)
        snap_path = os.path.join(args.classifier_ckpt, "config.json")
        if os.path.exists(snap_path):
            from reed_tpu.core import configlib

            snap = configlib.load_file(snap_path)
            snap["mesh"] = gen_cfg.mesh.__dict__
            clf_cfg = configlib.merge(clf_cfg, snap)
    clf = PropertyTrainer(clf_cfg)
    clf_state = clf.init_state()
    if args.classifier_ckpt:
        from reed_tpu.core.checkpoint import CheckpointManager

        clf_state = CheckpointManager(args.classifier_ckpt).restore(
            jax.eval_shape(lambda: clf_state))

    n = gen_cfg.max_nodes
    maes, all_targets = [], []
    sweep_rows = None
    for rep_i in range(args.n_replicates):
        if args.sweep:
            # fixed size, property linspace over the observed range
            # (reference: qm9/sampling.py:186 sample_sweep_conditional +
            # eval_src/process_sweep.py classifier readback)
            size = int(np.median(sizes_src))
            sizes = np.full(args.n_samples, size, np.int64)
            lo, hi = float(values.min()), float(values.max())
            targets = np.linspace(lo, hi, args.n_samples)
        else:
            sizes = node_dist.sample(np_rng, args.n_samples)
            targets = prop_dist.sample(np_rng, sizes)     # label units
        norm_t = (targets - mean) / mad                   # context units
        node_mask = (np.arange(n)[None, :] < sizes[:, None]
                     ).astype(np.float32)[..., None]
        diag = np.eye(n, dtype=np.float32)[None, :, :, None]
        edge_mask = (node_mask[:, :, None, :] * node_mask[:, None, :, :]
                     * (1 - diag))
        context = np.broadcast_to(
            norm_t[:, None, None].astype(np.float32),
            (args.n_samples, n, 1)) * node_mask
        rep = None
        if gen_cfg.rep_nf:
            rep = np_rng.standard_normal(
                (args.n_samples, gen_cfg.rep_nf)).astype(np.float32)
        x, h_cat, h_int = trainer.sample(
            state.ema_params, jax.random.PRNGKey((args.seed or 0) + rep_i),
            args.n_samples, jnp.asarray(node_mask), jnp.asarray(edge_mask),
            rep=None if rep is None else jnp.asarray(rep),
            context=jnp.asarray(context))
        preds = clf.predict(clf_state.ema_params, h_cat, x,
                            jnp.asarray(node_mask), jnp.asarray(edge_mask))
        mae = float(jnp.mean(jnp.abs(jnp.asarray(preds)
                                     - jnp.asarray(targets))))
        maes.append(mae)
        all_targets.append(targets)
        if args.sweep and sweep_rows is None:
            sweep_rows = [{"target": float(t), "pred": float(p)}
                          for t, p in zip(targets, np.asarray(preds))]
        if args.out and rep_i == 0:
            # dump sampled molecules as xyz + 3D PNG renders next to
            # property values (reference: eval_src/eval_visualize_samples.py
            # + qm9/visualizer.py plot_data3d)
            from reed_tpu.data.molecule import QM9_ATOM_DECODER
            from reed_tpu.eval.visualize import (plot_molecule_3d,
                                                 save_xyz_file)

            os.makedirs(args.out, exist_ok=True)
            types = np.argmax(np.asarray(h_cat), axis=-1)
            nmask = np.asarray(node_mask)[..., 0].astype(bool)
            for i in range(min(args.n_samples, 100)):
                save_xyz_file(
                    os.path.join(args.out, f"mol_{i:03d}.xyz"),
                    np.asarray(x)[i][nmask[i]], types[i][nmask[i]],
                    atom_decoder=QM9_ATOM_DECODER,
                    comment=f"{args.property}={targets[i]:.4f}")
                plot_molecule_3d(
                    os.path.join(args.out, f"mol_{i:03d}.png"),
                    np.asarray(x)[i][nmask[i]], types[i][nmask[i]],
                    atom_decoder=QM9_ATOM_DECODER,
                    title=f"{args.property}={targets[i]:.3f}")
            with open(os.path.join(args.out, "property_values.log"),
                      "w") as f:
                f.write("\n".join(f"{t:.6f}" for t in targets))
    out = {"property": args.property,
           "mae": float(np.mean(maes)),
           "mae_std": float(np.std(maes)),
           "n_samples": args.n_samples * args.n_replicates,
           # naive predict-the-mean floor for context (ref logs it too)
           "mad_of_targets": float(np.abs(
               np.concatenate(all_targets)
               - np.concatenate(all_targets).mean()).mean())}
    if sweep_rows is not None:
        out["sweep"] = sweep_rows
        t = np.array([r["target"] for r in sweep_rows])
        p = np.array([r["pred"] for r in sweep_rows])
        if len(t) > 2 and t.std() > 0 and p.std() > 0:
            out["sweep_pearson_r"] = float(np.corrcoef(t, p)[0, 1])
    print(json.dumps(out, indent=2))


def eval_protein(args):
    """Inverse-folding eval: Euler-unmask sampling conditioned on backbones,
    sequence recovery + (optional) Kabsch RMSD against the native structure
    (reference: protein/fmif/train_fmif.py:464-540)."""
    from reed_tpu.core.config import OptimConfig
    from reed_tpu.eval.protein_metrics import sequence_recovery, tokens_to_sequence
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    cfg = _resolve_cfg(ProteinTrainConfig, args,
                       defaults={"batch_size": 4})
    cfg = cfg.__class__(**{**cfg.__dict__, "interpolant": cfg.interpolant.
                           __class__(**{**cfg.interpolant.__dict__,
                                        "num_timesteps": args.num_steps})})
    trainer = ProteinTrainer(cfg)
    state = trainer.init_state()
    if args.ref_ckpt:
        # reference torch fmif checkpoint (epoch_last.pt), converted on
        # load; model flags must match via --set
        from reed_tpu.encoders.fmif_convert import load_torch_fmif_checkpoint

        conv = jax.tree.map(jnp.asarray,
                            load_torch_fmif_checkpoint(args.ref_ckpt))
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"loaded reference torch checkpoint {args.ref_ckpt}")
    elif args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        state = CheckpointManager(args.ckpt_dir).restore(
            jax.eval_shape(lambda: state))
    if args.data_dir:
        # real validation clusters (reference: train_fmif.py:464-540 scores
        # recovery over the valid split each epoch)
        from reed_tpu.data.protein import (PDBParams,
                                           build_training_clusters,
                                           sample_cluster_chains,
                                           token_bucket_batches)

        params = PDBParams(args.data_dir)
        _, valid_clusters, _ = build_training_clusters(params)
        rng_np = np.random.default_rng(cfg.seed)
        entries = sample_cluster_chains(rng_np, valid_clusters, params,
                                        max_length=cfg.max_len,
                                        limit=args.max_chains)
        if not entries:
            raise SystemExit(f"no valid-split chains under {args.data_dir}")
        repr_dims = {"single": cfg.single_dim, "pair": cfg.pair_dim,
                     "structure": cfg.structure_dim}
        recs, weights = [], []
        sample_seq = None
        for batch in token_bucket_batches(entries, repr_dims=repr_dims):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            pred, tokens = trainer.sample(
                state.ema_params, batch, jax.random.PRNGKey(cfg.seed + 1))
            m = np.asarray(batch["mask"] * batch["chain_M"])
            recs.append(sequence_recovery(np.asarray(pred),
                                          np.asarray(batch["S"]), m))
            weights.append(m.sum())
            if sample_seq is None:
                sample_seq = tokens_to_sequence(
                    np.asarray(tokens[0]), np.asarray(batch["mask"][0]))
        rec = float(np.average(recs, weights=weights))
        print(json.dumps({
            "split": "valid",
            "num_chains": len(entries),
            "sequence_recovery": rec,
            "sample_0": (sample_seq or "")[:80],
        }, indent=2))
        return

    batch = trainer.synthetic_batch(jax.random.PRNGKey(cfg.seed),
                                    length=args.length)
    pred, tokens = trainer.sample(state.ema_params, batch,
                                  jax.random.PRNGKey(cfg.seed + 1))
    rec = sequence_recovery(np.asarray(pred), np.asarray(batch["S"]),
                            np.asarray(batch["mask"] * batch["chain_M"]))
    print(json.dumps({
        "split": "synthetic",
        "sequence_recovery": rec,
        "sample_0": tokens_to_sequence(np.asarray(tokens[0]),
                                       np.asarray(batch["mask"][0]))[:80],
    }, indent=2))


def compute_fid(args):
    """In-repo FID between two inputs, each either a stats npz ({mu,sigma})
    or an ADM-style image npz (uint8 [N,H,W,3], key arr_0/samples/images —
    the file generate-image writes). Image inputs need --inception-npz
    (converted InceptionV3 pool3 weights, encoders/inception.py).

    The reference delegates this statistic to the external ADM suite
    (image/README.md:49-63); here it is owned end to end."""
    from reed_tpu.eval.frechet import compute_activation_stats, frechet_distance

    feature_fn = None

    def stats_for(path):
        nonlocal feature_fn
        data = np.load(path)
        if "mu" in data.files and "sigma" in data.files:
            return {"mu": data["mu"], "sigma": data["sigma"]}
        key = next(k for k in ("arr_0", "samples", "images")
                   if k in data.files)
        images = data[key]
        if feature_fn is None:
            if not args.inception_npz:
                raise SystemExit(
                    "--inception-npz required to featurize image npz "
                    "(convert once: encoders/inception.py "
                    "load_torch_inception_checkpoint + save_variables_npz)")
            from reed_tpu.encoders.inception import (load_variables_npz,
                                                     make_feature_fn)

            feature_fn = make_feature_fn(load_variables_npz(
                args.inception_npz))
        stats = compute_activation_stats(images, feature_fn,
                                         batch_size=args.batch_size)
        if args.save_stats:
            out = os.path.splitext(path)[0] + "_stats.npz"
            np.savez(out, **stats)
            print(f"saved stats to {out}")
        return stats

    s1, s2 = stats_for(args.ref), stats_for(args.gen)
    fid = frechet_distance(s1["mu"], s1["sigma"], s2["mu"], s2["sigma"])
    print(json.dumps({"fid": fid}))


def eval_semla(args):
    """SemlaFlow generation eval: N replicates x M molecules integrated
    from the prior, scored with stability/validity metrics, mean+/-std
    (reference protocol: molecule/semlaflow/evaluate.py:22-120 — 3
    replicates x 1000 molecules, 100 integration steps)."""
    from reed_tpu.eval.molecule_metrics import (SEMLA_IDX_CHARGES,
                                                GraphMoleculeMetrics)
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = _resolve_cfg(SemlaTrainConfig, args, defaults={"batch_size": 16})
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()
    if getattr(args, "ref_ckpt", None):
        from reed_tpu.encoders.semla_convert import load_torch_semla_checkpoint

        conv = jax.tree.map(jnp.asarray,
                            load_torch_semla_checkpoint(args.ref_ckpt))
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"loaded reference torch checkpoint {args.ref_ckpt}")
    elif args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        state = CheckpointManager(args.ckpt_dir).restore(
            jax.eval_shape(lambda: state))

    # default decoder = the semla vocab (data/molecule.py: PAD/MASK + 16
    # elements); molecules predicting PAD/MASK types score as invalid
    from reed_tpu.data.molecule import CORE_ATOMS, OTHER_ATOMS

    if args.atom_decoder:
        decoder = tuple(args.atom_decoder.split(","))
        first_real = 0
    else:
        decoder = tuple(["H", "H"] + CORE_ATOMS + OTHER_ATOMS)
        first_real = 2
    # score the PREDICTED molecule graph (bonds + charges are co-generated;
    # reference evaluate.py builds mols from the predicted tensors, not from
    # coordinate distances — fm.py:249-306)
    metrics_eval = GraphMoleculeMetrics(atom_decoder=decoder,
                                        dataset=args.dataset or "qm9")
    charge_map = np.asarray(SEMLA_IDX_CHARGES, np.int64)
    # stand-in scored for molecules with PAD/MASK predictions: two distant
    # unbonded H atoms -> zero valence -> unstable, disconnected, invalid
    invalid_mol = (np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]], np.float32),
                   np.array([decoder.index("H")] * 2),
                   np.zeros((2, 2), np.int64), np.zeros(2, np.int64))
    coord_std = args.coord_std if args.coord_std is not None else 1.0

    cfg_i = cfg.__class__(**{**cfg.__dict__, "integrator": cfg.integrator.
                             __class__(**{**cfg.integrator.__dict__,
                                          "steps": args.num_steps})})
    trainer.cfg = cfg_i

    replicates = []
    for rep_i in range(args.n_replicates):
        rng_np = np.random.default_rng(1000 + rep_i)
        mols = []
        done = 0
        while done < args.n_samples:
            bs = min(cfg.batch_size, args.n_samples - done)
            sizes = rng_np.integers(args.n_atoms_min,
                                    args.n_atoms_max + 1, size=bs)
            mask = (np.arange(cfg.max_atoms)[None, :] < sizes[:, None]
                    ).astype(np.float32)
            prior = trainer.sample_prior(rng_np, mask)
            rep_v = (jnp.asarray(rng_np.standard_normal(
                (bs, cfg.d_rep)).astype(np.float32))
                if cfg.d_rep and cfg.cond_type != "none" else None)
            final = trainer.generate(
                state.ema_params, jax.random.PRNGKey(rep_i * 1000 + done),
                prior, rep=rep_v, sampling_strategy=args.sampling_strategy)
            coords = np.asarray(jax.device_get(final["coords"])) * coord_std
            types = np.argmax(np.asarray(jax.device_get(final["atomics"])),
                              axis=-1)
            pred_bonds = (np.argmax(np.asarray(
                jax.device_get(final["bonds"])), axis=-1)
                if final.get("bonds") is not None else None)
            pred_charges = (charge_map[np.argmax(np.asarray(
                jax.device_get(final["charges"])), axis=-1)]
                if final.get("charges") is not None else None)
            for b in range(bs):
                t_b = types[b, :sizes[b]]
                n_b = sizes[b]
                if (t_b < first_real).any() or (t_b >= len(decoder)).any():
                    mols.append(invalid_mol)
                else:
                    mols.append((
                        coords[b, :n_b], t_b,
                        (pred_bonds[b, :n_b, :n_b] if pred_bonds is not None
                         else np.zeros((n_b, n_b), np.int64)),
                        (pred_charges[b, :n_b] if pred_charges is not None
                         else None)))
                if args.out and rep_i == 0:
                    # predicted-bond SDF + xyz (reference: semlaflow
                    # predict.py writes sampled molecules to SDF)
                    from reed_tpu.eval.visualize import (save_sdf_file,
                                                         save_xyz_file)

                    idx = done + b
                    n_b = sizes[b]
                    save_xyz_file(os.path.join(
                        args.out, f"mol_{idx:04d}.xyz"),
                        coords[b, :n_b], types[b, :n_b], decoder)
                    if pred_bonds is not None:
                        save_sdf_file(os.path.join(
                            args.out, f"mol_{idx:04d}.sdf"),
                            coords[b, :n_b], types[b, :n_b],
                            pred_bonds[b, :n_b, :n_b], decoder,
                            name=f"mol_{idx}")
            done += bs
        replicates.append(metrics_eval.evaluate(mols))

    summary = {}
    for k in replicates[0]:
        vals = [r[k] for r in replicates]
        if isinstance(vals[0], bool):  # e.g. 'rdkit' semantics marker
            summary[k] = vals[0]
            continue
        summary[k] = float(np.mean(vals))
        summary[f"{k}_std"] = float(np.std(vals))
    summary.update(n_replicates=args.n_replicates, n_samples=args.n_samples,
                   num_steps=args.num_steps)
    print(json.dumps(summary))


def eval_molecule(args):
    """Two-stage molecule eval: RDM-sampled (or synthetic Gt) reps ->
    EDM sampling -> stability/validity metrics with replicate mean/std
    (reference: molecule/eval_src/eval_analyze.py)."""
    from reed_tpu.eval.molecule_metrics import DistributionNodes, MoleculeMetrics
    from reed_tpu.eval.rep_samplers import GtSampler
    from reed_tpu.eval.two_stage import (TwoStageSampler, evaluate_replicates,
                                         molecules_from_samples)
    from reed_tpu.train.molecule_edm import MoleculeEDMConfig, MoleculeEDMTrainer

    cfg = _resolve_cfg(MoleculeEDMConfig, args,
                       defaults={"batch_size": 16,
                                 "edm": {"timesteps": args.num_steps}})
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()
    gamma_params = None
    if args.ref_ckpt:
        # reference torch checkpoint (generative_model[_ema].npy), converted
        # on load; model flags must match via --set (hidden_nf, n_layers, …)
        from reed_tpu.encoders.edm_convert import load_torch_edm_checkpoint

        conv, gamma_params = load_torch_edm_checkpoint(args.ref_ckpt)
        conv = jax.tree.map(jnp.asarray, conv)
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"loaded reference torch checkpoint {args.ref_ckpt}"
              + (" (learned gamma)" if gamma_params is not None else ""))
    elif args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        state = CheckpointManager(args.ckpt_dir).restore(
            jax.eval_shape(lambda: state))

    np_rng = np.random.default_rng(cfg.seed)
    reps_path = (os.path.join(args.data_dir, "reps.npy")
                 if args.data_dir else None)
    if reps_path and os.path.exists(reps_path):
        # real training-set encoder reps + molecule sizes (reference:
        # rep_samplers.py:159-226 GtSampler over dataset reps)
        reps = np.load(reps_path).astype(np.float32)
        sizes = np.load(os.path.join(args.data_dir, "sizes.npy"))
        assert reps.shape[1] == cfg.rep_nf, (reps.shape, cfg.rep_nf)
        print(f"GtSampler over {len(reps)} dataset reps from "
              f"{args.data_dir}")
    else:
        if args.data_dir:
            print(f"WARNING: no reps.npy under {args.data_dir}; "
                  f"using random stand-in reps")
        reps = np_rng.standard_normal((256, cfg.rep_nf)).astype(np.float32)
        sizes = np_rng.integers(cfg.max_nodes // 2, cfg.max_nodes + 1, 256)
    sizes = np.minimum(sizes.astype(np.int64), cfg.max_nodes)
    if args.rdm_ref_ckpt:
        # two-stage eval with a converted reference RDM as the rep sampler
        # (reference: eval_src/eval_analyze.py DDIMSampler path)
        from reed_tpu.diffusion.rdm import RDMConfig, RDMDiffusion
        from reed_tpu.encoders.rdm_convert import load_torch_rdm_checkpoint
        from reed_tpu.eval.rep_samplers import DDIMRepSampler
        from reed_tpu.models.rdm_mlp import SimpleMLP

        rdm_params = jax.tree.map(jnp.asarray, load_torch_rdm_checkpoint(
            args.rdm_ref_ckpt, num_classes=cfg.max_nodes + 1))
        mc = rdm_params["input_proj"]["kernel"].shape[1]
        rdm_model = SimpleMLP(
            in_channels=cfg.rep_nf, out_channels=cfg.rep_nf,
            model_channels=mc,
            bottleneck_channels=rdm_params["res_0"]["in_fc"]["kernel"
                                                            ].shape[1],
            time_embed_dim=rdm_params["time_fc1"]["kernel"].shape[1],
            num_res_blocks=sum(1 for k in rdm_params
                               if k.startswith("res_")),
            num_classes=cfg.max_nodes,
            context_channels=rdm_params.get(
                "class_embedder", {"embedding": np.zeros((1, cfg.rep_nf))}
            )["embedding"].shape[1])

        def rdm_fn(x_t, t, n_nodes):
            return rdm_model.apply({"params": rdm_params}, x_t, t, n_nodes)

        rep_sampler = DDIMRepSampler(
            RDMDiffusion(RDMConfig(channels=cfg.rep_nf), rdm_fn))
        print(f"DDIM rep sampler from converted RDM {args.rdm_ref_ckpt}")
    else:
        rep_sampler = GtSampler(reps, sizes)
    node_dist = DistributionNodes(
        {int(s): float((sizes == s).sum()) for s in np.unique(sizes)})

    def mol_sampler(rng, node_mask, edge_mask, rep):
        return trainer.sample(state.ema_params, rng, node_mask.shape[0],
                              node_mask, edge_mask, rep=rep,
                              gamma_params=gamma_params)

    sampler = TwoStageSampler(rep_sampler, mol_sampler)
    metrics = MoleculeMetrics()

    def sample_replicate(r):
        nodes = node_dist.sample(np_rng, cfg.batch_size)
        x, h_cat, h_int, node_mask = sampler.sample(
            jax.random.PRNGKey(cfg.seed + r), nodes, cfg.max_nodes,
            np_rng=np_rng)
        return molecules_from_samples(x, h_cat, node_mask)

    out = evaluate_replicates(sample_replicate, metrics,
                              n_replicates=args.n_replicates)

    if args.out:
        # dump one replicate as xyz + 3D PNG renders (reference:
        # eval_src/{eval_visualize_samples,process_uncondition_random}.py)
        from reed_tpu.data.molecule import QM9_ATOM_DECODER
        from reed_tpu.eval.visualize import plot_molecule_3d, save_xyz_file

        # GEOM-with-H decoder for >5 atom types (reference
        # configs/datasets_config.py geom_with_h)
        decoder = QM9_ATOM_DECODER if cfg.num_atom_types <= 5 else [
            "H", "B", "C", "N", "O", "F", "Al", "Si", "P", "S", "Cl",
            "As", "Br", "I", "Hg", "Bi"]
        os.makedirs(args.out, exist_ok=True)
        for i, (pos, types) in enumerate(sample_replicate(0)[:100]):
            save_xyz_file(os.path.join(args.out, f"mol_{i:03d}.xyz"),
                          pos, types, atom_decoder=decoder)
            plot_molecule_3d(os.path.join(args.out, f"mol_{i:03d}.png"),
                             pos, types, atom_decoder=decoder)
        print(f"sample dumps -> {args.out}")

    # MOSES distribution block vs a held-out test set when available
    # (reference: eval_src/evaluation/molsets.py get_all_metrics)
    if args.data_dir:
        from reed_tpu.data.molecule import (QM9_ATOM_DECODER, load_dataset)
        from reed_tpu.eval.molsets import (geometric_mols_from_samples,
                                           moses_metrics)

        try:
            test_path = _find_split(args.data_dir, "test")
            test_mols = load_dataset(test_path)
        except FileNotFoundError:
            test_mols = None
        if test_mols:
            samples = sample_replicate(args.n_replicates)
            gen_mols = geometric_mols_from_samples(samples, QM9_ATOM_DECODER)
            out["moses"] = moses_metrics(gen_mols, test_mols,
                                         vocab_tokens=QM9_ATOM_DECODER)
            # MiDi distribution distances (test.rsmol must use the same
            # atom-type index space as the sampler's decoder)
            from reed_tpu.eval.midi_metrics import midi_sampling_metrics

            out["midi"] = midi_sampling_metrics(
                gen_mols, test_mols, num_atom_types=len(QM9_ATOM_DECODER))
    print(json.dumps(out, indent=2))


def eval_multiflow(args):
    """Sample SE(3) backbones + sequences, write PDB files, report backbone
    geometry stats (reference: multiflow/experiments/inference_se3_flows.py;
    folding designability needs external binaries and stays gated)."""
    from reed_tpu.eval.protein_metrics import (backbone_geometry_report,
                                               tokens_to_sequence,
                                               write_pdb_backbone)
    from reed_tpu.ops.residue_constants import to_atom37
    from reed_tpu.train.multiflow import MultiflowTrainConfig, MultiflowTrainer

    cfg = _resolve_cfg(MultiflowTrainConfig, args)
    trainer = MultiflowTrainer(cfg)
    state = trainer.init_state()
    if getattr(args, "ref_ckpt", None):
        from reed_tpu.encoders.multiflow_convert import \
            load_torch_multiflow_checkpoint

        conv = jax.tree.map(jnp.asarray, load_torch_multiflow_checkpoint(
            args.ref_ckpt, num_blocks=cfg.num_blocks,
            seq_tfmr_num_layers=cfg.seq_tfmr_num_layers))
        state = state.replace(params=conv,
                              ema_params=jax.tree.map(jnp.copy, conv))
        print(f"loaded reference torch checkpoint {args.ref_ckpt}")
    elif args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        state = CheckpointManager(args.ckpt_dir).restore(
            jax.eval_shape(lambda: state))

    out = trainer.sample(state.ema_params, jax.random.PRNGKey(cfg.seed),
                         args.num_samples, args.length,
                         num_timesteps=args.num_steps)
    trans = np.asarray(out["trans"])
    rotmats = np.asarray(out["rotmats"])
    aatypes = np.asarray(out["aatypes"])
    atom37 = np.asarray(to_atom37(jnp.asarray(trans), jnp.asarray(rotmats)))

    reports = []
    out_dir = args.out or "out/multiflow_samples"
    for i in range(args.num_samples):
        rep = backbone_geometry_report(atom37[i])
        rep["pdb"] = write_pdb_backbone(
            os.path.join(out_dir, f"sample_{i}.pdb"), atom37[i],
            aatypes=aatypes[i])
        from reed_tpu.ops.residue_constants import RESTYPES

        rep["sequence"] = "".join(
            (RESTYPES[int(t)] if 0 <= int(t) < 20 else "X")
            for t in aatypes[i])
        reports.append(rep)
    mean = {k: float(np.mean([r[k] for r in reports]))
            for k in ("ca_ca_dist_mean", "radius_of_gyration",
                      "ca_clash_fraction")}
    print(json.dumps({"mean": mean, "samples": reports}, indent=2))


def generate_image(args):
    """FID sample generation: sample latents -> VAE-decode to 256x256 uint8
    pixels -> ADM-suite npz (reference: image/generate.py:106-174)."""
    from reed_tpu.eval.fid import (FIDGenConfig, generate_samples,
                                   make_vae_decode_fn)
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    defaults = {}
    if args.ref_ckpt:
        # torch-parity inference from a converted reference checkpoint
        defaults["exact_gelu"] = True
    tcfg = _resolve_cfg(ImageTrainConfig, args, defaults=defaults)
    trainer = ImageTrainer(tcfg)
    state = trainer.init_state()
    if args.ref_ckpt:
        from reed_tpu.encoders.sit_convert import load_reference_checkpoint

        variables = load_reference_checkpoint(
            args.ref_ckpt, depth=trainer.model.depth,
            num_projectors=len(tcfg.z_dims))
        params = variables["params"]
        state = state.replace(
            params=params, ema_params=jax.tree.map(jnp.copy, params))
        print(f"loaded reference checkpoint {args.ref_ckpt} "
              f"(exact_gelu={tcfg.exact_gelu})")
    elif args.ckpt_dir:
        from reed_tpu.core.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        state = mgr.restore(jax.eval_shape(lambda: state))

    def model_fn(params, x, t, y):
        v, _ = trainer.model.apply({"params": params}, x, t, y, train=False)
        return v

    decode_fn = make_vae_decode_fn(args.vae, latent_size=tcfg.input_size,
                                   latent_channels=tcfg.in_channels)
    if decode_fn is None:
        print("WARNING: no --vae decoder npz given; npz will hold raw "
              "latents, not the 256x256 uint8 pixels the ADM FID suite "
              "expects (convert with tools/convert_vae.py)")

    cfg = FIDGenConfig(num_samples=args.num_samples,
                       batch_size=args.batch_size or 64,
                       num_classes=tcfg.num_classes,
                       latent_size=tcfg.input_size,
                       latent_channels=tcfg.in_channels,
                       mode=args.mode, num_steps=args.num_steps,
                       cfg_scale=args.cfg_scale,
                       guidance_low=args.guidance_low,
                       guidance_high=args.guidance_high,
                       seed=tcfg.seed)
    generate_samples(model_fn, state.ema_params, cfg, decode_fn=decode_fn,
                     out_npz=args.out)


def main(argv=None):
    parser = argparse.ArgumentParser("reed_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-image")
    p.add_argument("--model", default=None, help="e.g. SiT-XL/2")
    p.add_argument("--sample-every", type=int, default=0)
    p.add_argument("--vae", default=None,
                   help="converted SD-VAE decoder npz for preview decoding")
    p.add_argument("--enc-type", default=None,
                   help="in-loop frozen encoders, e.g. dinov2-vit-b "
                        "(needs --encoder-dir weights + pixel crops)")
    p.add_argument("--encoder-dir", default=None,
                   help="dir of converted encoder npz weights")
    p.add_argument("--pixels-subdir", default="pixels",
                   help="dataset subdir of raw uint8 crops")
    p.add_argument("--ref-ckpt", default=None,
                   help="warm-start from a reference torch SiT checkpoint "
                        "(forces exact_gelu)")
    _add_common(p)
    p.set_defaults(fn=train_image)

    p = sub.add_parser("train-protein")
    p.add_argument("--token-budget", type=int, default=20_000,
                   help="tokens per batch (reference batch_size=20000)")
    p.add_argument("--ref-ckpt", default=None,
                   help="warm-start from a reference torch fmif checkpoint")
    _add_common(p)
    p.set_defaults(fn=train_protein)

    p = sub.add_parser("train-molecule-edm")
    p.add_argument("--ref-ckpt", default=None,
                   help="warm-start from a reference torch EDM checkpoint")
    _add_common(p)
    p.set_defaults(fn=train_molecule_edm)

    p = sub.add_parser("train-molecule-semla")
    p.add_argument("--ref-ckpt", default=None,
                   help="reference torch SemlaFlow/Lightning checkpoint to "
                        "warm-start from (converted on load)")
    p.add_argument("--batch-cost", type=int, default=4096,
                   help="padded-atom budget per batch (reference batch_cost)")
    p.add_argument("--dataset", default="qm9", choices=["qm9", "geom"],
                   help="selects the coord-normalization std")
    p.add_argument("--coord-std", type=float, default=None,
                   help="explicit coord std (overrides --dataset)")
    _add_common(p)
    p.set_defaults(fn=train_molecule_semla)

    p = sub.add_parser("train-multiflow")
    p.add_argument("--ref-ckpt", default=None,
                   help="reference torch MultiFlow/Lightning checkpoint to "
                        "warm-start from (converted on load)")
    _add_common(p)
    p.set_defaults(fn=train_multiflow)

    p = sub.add_parser("train-rdm")
    _add_common(p)
    p.set_defaults(fn=train_rdm)

    p = sub.add_parser("train-property")
    p.add_argument("--property", default="alpha",
                   help="QM9 property column: alpha|gap|homo|lumo|mu|Cv|...")
    p.add_argument("--linear-probe", action="store_true",
                   help="linear head on frozen-encoder reps (reps.npy) "
                        "instead of the EGNN regressor")
    _add_common(p)
    p.set_defaults(fn=train_property)

    p = sub.add_parser("eval-protein")
    p.add_argument("--num-steps", type=int, default=100)
    p.add_argument("--length", type=int, default=64)
    p.add_argument("--max-chains", type=int, default=None,
                   help="cap on valid-split chains to score")
    p.add_argument("--ref-ckpt", default=None,
                   help="reference torch fmif checkpoint (epoch_last.pt), "
                        "converted on load")
    _add_common(p)
    p.set_defaults(fn=eval_protein)

    p = sub.add_parser("compute-fid")
    p.add_argument("ref", help="reference stats npz ({mu,sigma}) or image npz")
    p.add_argument("gen", help="generated stats npz or image npz")
    p.add_argument("--inception-npz", default=None,
                   help="converted InceptionV3 pool3 weights npz "
                        "(needed for image npz inputs)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--save-stats", action="store_true",
                   help="save computed stats next to each image npz")
    p.set_defaults(fn=compute_fid)

    p = sub.add_parser("eval-semla")
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--n-replicates", type=int, default=3)
    p.add_argument("--num-steps", type=int, default=100)
    p.add_argument("--n-atoms-min", type=int, default=8)
    p.add_argument("--n-atoms-max", type=int, default=24)
    p.add_argument("--sampling-strategy", default="linear",
                   choices=["linear", "log"])
    # the semla vocab is GEOM-scale (P/S/Br/...); the qm9 bond tables only
    # cover H/C/N/O/F pairs, so the geom predictor (check_exists semantics,
    # reference bond_analyze.py:135-144) is the correct default here
    p.add_argument("--dataset", default="geom", choices=["qm9", "geom"])
    p.add_argument("--coord-std", type=float, default=None,
                   help="unscale generated coords by the dataset coord std")
    p.add_argument("--atom-decoder", default=None,
                   help="comma-separated element symbols per vocab index "
                        "(default: the semla vocab)")
    p.add_argument("--ref-ckpt", default=None,
                   help="reference torch SemlaFlow/Lightning checkpoint "
                        "(converted on load; dims via --set)")
    p.add_argument("--out", default=None,
                   help="write replicate-0 samples as predicted-bond .sdf "
                        "+ .xyz files here")
    _add_common(p)
    p.set_defaults(fn=eval_semla)

    p = sub.add_parser("eval-molecule")
    p.add_argument("--n-replicates", type=int, default=3)
    p.add_argument("--num-steps", type=int, default=100)
    p.add_argument("--ref-ckpt", default=None,
                   help="reference torch EDM checkpoint "
                        "(generative_model[_ema].npy), converted on load")
    p.add_argument("--rdm-ref-ckpt", default=None,
                   help="reference torch RDM checkpoint -> DDIM rep "
                        "sampler (two-stage eval) instead of GtSampler")
    p.add_argument("--out", default=None,
                   help="xyz + 3D PNG sample dumps (reference "
                        "eval_visualize_samples.py)")
    _add_common(p)
    p.set_defaults(fn=eval_molecule)

    p = sub.add_parser("eval-conditional")
    p.add_argument("--property", default="alpha")
    p.add_argument("--n-samples", type=int, default=16)
    p.add_argument("--n-replicates", type=int, default=2)
    p.add_argument("--num-steps", type=int, default=50)
    p.add_argument("--classifier-ckpt", default=None,
                   help="train-property checkpoint dir")
    p.add_argument("--sweep", action="store_true",
                   help="fixed-size property-linspace sweep (reference "
                        "sample_sweep_conditional + process_sweep)")
    p.add_argument("--out", default=None,
                   help="xyz + property_values.log output dir (reference "
                        "eval_visualize_samples.py)")
    _add_common(p)
    p.set_defaults(fn=eval_conditional)

    p = sub.add_parser("eval-multiflow")
    p.add_argument("--num-samples", type=int, default=4)
    p.add_argument("--length", type=int, default=64)
    p.add_argument("--num-steps", type=int, default=100)
    p.add_argument("--out", default=None, help="PDB output dir")
    p.add_argument("--ref-ckpt", default=None,
                   help="reference torch MultiFlow/Lightning checkpoint "
                        "(converted on load; dims via --set)")
    _add_common(p)
    p.set_defaults(fn=eval_multiflow)

    p = sub.add_parser("generate-image")
    p.add_argument("--model", default=None, help="e.g. SiT-XL/2")
    p.add_argument("--num-samples", type=int, default=64)
    p.add_argument("--mode", default="sde", choices=["sde", "ode"])
    p.add_argument("--num-steps", type=int, default=50)
    p.add_argument("--cfg-scale", type=float, default=1.0)
    p.add_argument("--guidance-low", type=float, default=0.0)
    p.add_argument("--guidance-high", type=float, default=1.0)
    p.add_argument("--vae", default=None,
                   help="converted SD-VAE decoder npz (tools/convert_vae.py)"
                        "; required for ADM-suite pixel npz output")
    p.add_argument("--ref-ckpt", default=None,
                   help="reference torch .pt checkpoint (converted on load; "
                        "forces exact_gelu for parity)")
    p.add_argument("--out", default=None)
    _add_common(p)
    p.set_defaults(fn=generate_image)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
