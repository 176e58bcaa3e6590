"""SemlaFlow molecule trainer: equivariant flow matching with
self-conditioning and REED representation alignment.

TPU-native rebuild of MolecularCFM
(molecule/semlaflow/flowmodels/fm.py:362-1010): coord MSE + type/bond/charge
CE losses with masking-strategy variants, linear diffusion-loss warm-up to
`diffusion_loss_max_step`, REPA cosine alignment of sum-pooled projected
activations against a frozen-encoder global rep, 50%-probability
self-conditioning second pass, EMA — all inside one jitted train step.
Generation is the Integrator under lax.scan (linear or log schedule).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.core.ema import ema_init
from reed_tpu.core.train_state import TrainState, make_optimizer
from reed_tpu.core.trainer import jit_train_step, make_train_step
from reed_tpu.diffusion.molecule_fm import (
    IntegratorConfig,
    MoleculeInterpolantConfig,
    integrator_step,
    interpolate_batch,
    sample_prior_batch,
)
from reed_tpu.models.semla import SemlaGenerator, adj_from_node_mask
from reed_tpu.parallel import mesh as meshlib


@dataclass(frozen=True)
class SemlaTrainConfig:
    arch: str = "semla"              # semla | egnn | eqgat (train.py:120-160)
    vocab_size: int = 18
    n_bond_types: int = 5
    n_charge_types: int = 7
    max_atoms: int = 256
    d_model: int = 384
    d_message: int = 128
    n_layers: int = 12
    n_coord_sets: int = 64
    d_message_hidden: int = 128
    d_edge: int = 128
    n_attn_heads: int = 32
    size_emb: int = 64
    self_cond: bool = True
    # rep conditioning / alignment
    d_rep: Optional[int] = 512
    cond_type: str = "none"          # none | cross_attn | adaLN
    rep_alignment: bool = True
    align_depth: Sequence[int] = (4,)
    repa_loss_weight: float = 0.2
    # losses
    type_strategy: str = "ce"        # ce | mse | mask
    bond_strategy: str = "ce"        # ce | mask
    # reference training recipe defaults (semlaflow/train.py:51-62):
    # type loss downweighted 0.2; TRAIN-time coordinate noise 0.2 A teaches
    # the model to snap noisy geometry back to the manifold (without it the
    # sampler's own coordinate error compounds: generated graphs drift
    # off-manifold and type/bond predictions go inconsistent — round-4
    # graph audit); sampling-time categorical churn level 1.
    type_loss_weight: float = 0.2
    bond_loss_weight: float = 1.0
    charge_loss_weight: float = 1.0
    diffusion_loss_max_step: int = 0
    # interpolant / integrator
    interpolant: MoleculeInterpolantConfig = MoleculeInterpolantConfig(
        coord_noise_std=0.2)
    integrator: IntegratorConfig = IntegratorConfig(cat_noise_level=1.0)
    batch_size: int = 64
    # grad_clip 1.0 = reference parity (semlaflow/train.py:50
    # DEFAULT_GRADIENT_CLIP_VAL); the convergence tooling already clipped
    optim: OptimConfig = OptimConfig(lr=3e-4, schedule="constant",
                                     grad_clip=1.0)
    curriculum: CurriculumConfig = CurriculumConfig(proj_coeff=0.2,
                                                    diffusion_warmup_steps=0)
    mesh: MeshConfig = MeshConfig()
    compute_dtype: str = "float32"
    # residual coord head (x1_hat = x_t + delta); param-tree-neutral, off by
    # default for reference parity — see models/semla.py EquiInvDynamics
    coord_skip: bool = False
    seed: int = 0


def build_model(cfg: SemlaTrainConfig):
    if cfg.arch == "egnn":
        from reed_tpu.models.semla_alt import VanillaEgnnGenerator

        return VanillaEgnnGenerator(
            d_model=cfg.d_model, vocab_size=cfg.vocab_size,
            n_atom_feats=cfg.vocab_size, d_edge=cfg.d_edge,
            n_edge_types=cfg.n_bond_types,
            n_charge_types=cfg.n_charge_types, n_layers=cfg.n_layers,
            self_cond=cfg.self_cond, d_rep=cfg.d_rep,
            rep_alignment=cfg.rep_alignment,
            align_depth=tuple(cfg.align_depth),
            dtype=jnp.dtype(cfg.compute_dtype))
    if cfg.arch == "eqgat":
        from reed_tpu.models.semla_alt import EqgatGenerator

        return EqgatGenerator(
            d_model=cfg.d_model, vocab_size=cfg.vocab_size,
            n_atom_feats=cfg.vocab_size, d_edge=cfg.d_edge,
            n_edge_types=cfg.n_bond_types,
            n_charge_types=cfg.n_charge_types, n_layers=cfg.n_layers,
            self_cond=cfg.self_cond, d_rep=cfg.d_rep,
            dtype=jnp.dtype(cfg.compute_dtype))
    return SemlaGenerator(
        d_model=cfg.d_model,
        vocab_size=cfg.vocab_size,
        n_atom_feats=cfg.vocab_size,
        d_edge=cfg.d_edge,
        n_edge_types=cfg.n_bond_types,
        self_cond=cfg.self_cond,
        size_emb=cfg.size_emb,
        max_atoms=cfg.max_atoms,
        n_charge_types=cfg.n_charge_types,
        rep_alignment=cfg.rep_alignment,
        d_message=cfg.d_message,
        n_coord_sets=cfg.n_coord_sets,
        n_layers=cfg.n_layers,
        n_attn_heads=cfg.n_attn_heads,
        d_message_hidden=cfg.d_message_hidden,
        d_rep=cfg.d_rep,
        cond_type=cfg.cond_type,
        align_depth=tuple(cfg.align_depth),
        coord_skip=cfg.coord_skip,
        dtype=jnp.dtype(cfg.compute_dtype),
    )


def semla_losses(cfg: SemlaTrainConfig, data, interpolated, predicted,
                 eps: float = 1e-3):
    """Coord MSE + type/bond/charge CE (reference: fm.py:842-905,966)."""
    mask = data["mask"]
    mask2 = mask[..., None]
    coord_loss = ((predicted["coords"] - data["coords"]) ** 2 * mask2
                  ).mean(axis=(1, 2))

    # type loss
    pred_logits = predicted["atomics"]
    if cfg.type_strategy == "mse":
        type_loss = ((pred_logits - data["atomics"]) ** 2)
        # reference _type_loss sums over the vocab dim and divides by n_atoms
        # only (fm.py:853-858) — no vocab-size factor in the denominator
        type_loss = (type_loss * mask2).sum(axis=(1, 2)) / (mask.sum(-1) + eps)
    else:
        labels = jnp.argmax(data["atomics"], axis=-1)
        logp = jax.nn.log_softmax(pred_logits, axis=-1)
        tl = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        n_atoms = mask.sum(-1) + eps
        if cfg.type_strategy == "mask":
            masked = (jnp.argmax(interpolated["atomics"], axis=-1)
                      == cfg.integrator.type_mask_index)
            n_atoms = masked.sum(-1) + eps
            tl = tl * masked
        type_loss = (tl * mask).sum(-1) / n_atoms

    # bond loss (includes self-connections, as the reference's
    # adj_from_node_mask(self_connect=True))
    labels_b = jnp.argmax(data["bonds"], axis=-1)
    logp_b = jax.nn.log_softmax(predicted["bonds"], axis=-1)
    bl = -jnp.take_along_axis(logp_b, labels_b[..., None], axis=-1)[..., 0]
    adj = adj_from_node_mask(mask, self_connect=True)
    n_bonds = adj.sum(axis=(1, 2)) + eps
    if cfg.bond_strategy == "mask":
        masked_b = (jnp.argmax(interpolated["bonds"], axis=-1)
                    == cfg.integrator.bond_mask_index)
        n_bonds = masked_b.sum(axis=(1, 2)) + eps
        bl = bl * masked_b
    bond_loss = (bl * adj).sum(axis=(1, 2)) / n_bonds

    # charge loss
    labels_c = jnp.argmax(data["charges"], axis=-1)
    logp_c = jax.nn.log_softmax(predicted["charges"], axis=-1)
    cl = -jnp.take_along_axis(logp_c, labels_c[..., None], axis=-1)[..., 0]
    charge_loss = (cl * mask).sum(-1) / (mask.sum(-1) + eps)

    return {
        "coord_loss": coord_loss.mean(),
        "type_loss": type_loss.mean() * cfg.type_loss_weight,
        "bond_loss": bond_loss.mean() * cfg.bond_loss_weight,
        "charge_loss": charge_loss.mean() * cfg.charge_loss_weight,
    }


def make_loss_fn(model: SemlaGenerator, cfg: SemlaTrainConfig):
    def apply_model(params, interpolated, times, cond_batch, rep):
        return model.apply(
            {"params": params}, interpolated["coords"],
            interpolated["atomics"],
            edge_feats=interpolated["bonds"],
            cond_coords=cond_batch["coords"] if cfg.self_cond else None,
            cond_atomics=cond_batch["atomics"] if cfg.self_cond else None,
            cond_bonds=cond_batch["bonds"] if cfg.self_cond else None,
            atom_mask=interpolated["mask"], rep=rep, times=times)

    def loss_fn(params, batch, rng, step):
        data = batch["data"]
        interpolated = batch["interpolated"]
        times = batch["times"]
        rep = batch.get("rep") if cfg.cond_type != "none" else None
        z_rep = batch.get("rep") if cfg.rep_alignment else None
        rng_sc = jax.random.fold_in(rng, 1)

        cond_batch = {
            "coords": jnp.zeros_like(interpolated["coords"]),
            "atomics": jnp.zeros_like(interpolated["atomics"]),
            "bonds": jnp.zeros_like(interpolated["bonds"]),
        }
        if cfg.self_cond:
            # 50% of steps: build self-conditioning inputs with a no-grad pass
            def build_cond(_):
                out = apply_model(jax.lax.stop_gradient(params), interpolated,
                                  times, cond_batch, rep)
                c, t_logits, b_logits, _, _ = out
                return {"coords": jax.lax.stop_gradient(c),
                        "atomics": jax.lax.stop_gradient(
                            jax.nn.softmax(t_logits, axis=-1)),
                        "bonds": jax.lax.stop_gradient(
                            jax.nn.softmax(b_logits, axis=-1))}

            use_sc = jax.random.uniform(rng_sc, ()) > 0.5
            cond_batch = jax.lax.cond(use_sc, build_cond,
                                      lambda _: cond_batch, None)

        coords, type_logits, bond_logits, charge_logits, zs = apply_model(
            params, interpolated, times, cond_batch, rep)
        predicted = {"coords": coords, "atomics": type_logits,
                     "bonds": bond_logits, "charges": charge_logits}
        losses = semla_losses(cfg, data, interpolated, predicted)
        denoising = sum(losses.values())

        metrics = {**losses, "denoising_loss": denoising}
        if cfg.rep_alignment and z_rep is not None and zs:
            zn = z_rep / (jnp.linalg.norm(z_rep, axis=-1, keepdims=True) + 1e-8)
            proj = 0.0
            for z_j in zs:
                zjn = z_j / (jnp.linalg.norm(z_j, axis=-1, keepdims=True) + 1e-8)
                proj += -(zjn * zn).sum(-1)
            proj = (proj / len(zs)).mean()
            metrics["proj_loss"] = proj
        else:
            metrics["proj_loss"] = jnp.zeros(())
        return metrics

    return loss_fn


class SemlaTrainer:
    def __init__(self, cfg: SemlaTrainConfig, mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor)
        self.optimizer = make_optimizer(cfg.optim)
        rng = jax.random.PRNGKey(cfg.seed)
        self.init_rng, self.train_rng = jax.random.split(rng)

        # reference combines REPA at repa_loss_weight with no decay by
        # default; warm-up applies to the diffusion losses
        # (fm.py:655-662,860-865)
        curriculum = CurriculumConfig(**{
            **cfg.curriculum.__dict__,
            "proj_coeff": cfg.repa_loss_weight,
            "diffusion_warmup_steps": max(cfg.diffusion_loss_max_step,
                                          cfg.curriculum.diffusion_warmup_steps),
        })
        step_fn = make_train_step(make_loss_fn(self.model, cfg),
                                  self.optimizer, curriculum,
                                  accum_steps=cfg.optim.accum_steps)
        abstract_state = jax.eval_shape(self._init_state, self.init_rng)
        param_sharding = meshlib.shard_params(
            abstract_state.params, self.mesh, meshlib.SEMLA_TP_RULES,
            fsdp_min_size=cfg.mesh.fsdp_min_size)
        rep = meshlib.replicated(self.mesh)
        from reed_tpu.train.image import _opt_state_shardings

        self.state_shardings = TrainState(
            step=rep, params=param_sharding, ema_params=param_sharding,
            opt_state=_opt_state_shardings(abstract_state.opt_state,
                                           abstract_state.params,
                                           param_sharding, rep))
        bsh = meshlib.batch_sharding(self.mesh)
        self.batch_sharding = jax.tree.map(
            lambda _: bsh, self.example_batch(4),
            is_leaf=lambda x: hasattr(x, "shape"))
        self.train_step = jit_train_step(step_fn, self.mesh,
                                         self.state_shardings,
                                         self.batch_sharding)

    def example_batch(self, batch_size: int, max_n: int = 16,
                      seed: int = 0) -> Dict:
        """Synthetic interpolated batch with the training schema (prior OT
        coupling + interpolation happen host-side, like the reference's
        collate)."""
        cfg = self.cfg
        rng = np.random.default_rng(seed)
        sizes = rng.integers(max(2, max_n // 2), max_n + 1, size=batch_size)
        mask = (np.arange(max_n)[None, :] < sizes[:, None]).astype(np.float32)
        coords = rng.standard_normal((batch_size, max_n, 3)).astype(np.float32)
        coords = coords * mask[..., None]
        types = rng.integers(0, cfg.vocab_size, size=(batch_size, max_n))
        atomics = np.eye(cfg.vocab_size, dtype=np.float32)[types] * mask[..., None]
        bonds_idx = rng.integers(0, cfg.n_bond_types,
                                 size=(batch_size, max_n, max_n))
        bonds_idx = np.triu(bonds_idx, 1) + np.triu(bonds_idx, 1).transpose(0, 2, 1)
        bonds = np.eye(cfg.n_bond_types, dtype=np.float32)[bonds_idx]
        charges_idx = rng.integers(0, cfg.n_charge_types,
                                   size=(batch_size, max_n))
        charges = np.eye(cfg.n_charge_types, dtype=np.float32)[charges_idx]
        data = {"coords": coords, "atomics": atomics, "bonds": bonds,
                "charges": charges, "mask": mask}
        prior, interpolated, times = interpolate_batch(rng, cfg.interpolant,
                                                       data)
        batch = {"data": data, "prior": prior, "interpolated": interpolated,
                 "times": times}
        if cfg.d_rep is not None:
            batch["rep"] = rng.standard_normal(
                (batch_size, cfg.d_rep)).astype(np.float32)
        return batch

    def _init_state(self, rng) -> TrainState:
        batch = jax.tree.map(jnp.asarray, self.example_batch(2, 8))
        cfg = self.cfg
        cond = {"coords": jnp.zeros_like(batch["interpolated"]["coords"]),
                "atomics": jnp.zeros_like(batch["interpolated"]["atomics"]),
                "bonds": jnp.zeros_like(batch["interpolated"]["bonds"])}
        variables = self.model.init(
            {"params": rng},
            batch["interpolated"]["coords"], batch["interpolated"]["atomics"],
            edge_feats=batch["interpolated"]["bonds"],
            cond_coords=cond["coords"] if cfg.self_cond else None,
            cond_atomics=cond["atomics"] if cfg.self_cond else None,
            cond_bonds=cond["bonds"] if cfg.self_cond else None,
            atom_mask=batch["interpolated"]["mask"],
            rep=batch.get("rep") if cfg.d_rep else None,
            times=batch["times"])
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema_params=ema_init(params, cfg.curriculum.ema_dtype),
                          opt_state=self.optimizer.init(params))

    def init_state(self) -> TrainState:
        with self.mesh:
            return jax.jit(self._init_state,
                           out_shardings=self.state_shardings)(self.init_rng)

    def generate(self, params, rng, prior: Dict, rep=None,
                 sampling_strategy: str = "linear",
                 final_protocol: str = "last", zero_cond: bool = False,
                 pred_temp: float = 1.0):
        """Integrate the ODE from prior to data (reference: fm.py:974-1040).
        prior: dict of jnp arrays (coords/atomics/bonds/mask).

        final_protocol:
          "last" (default, reference-exact): the returned molecule is the
              prediction made during the LAST integrator iteration — the
              model is never evaluated on the fully-jumped t=1.0 state
              (fm.py:1017-1046 returns `predicted` from the loop body).
          "extra": one additional model call on the post-loop state (t=1.0)
              with times clamped to the last grid point.
        zero_cond: keep the self-conditioning input at zeros through the
          whole trajectory (diagnostic; reference always feeds the previous
          prediction when self_condition=True).
        pred_temp: temperature on the predicted type/bond distributions the
          INTEGRATOR consumes (softmax(logits/T); the returned molecule and
          the self-conditioning input keep T=1). T<1 commits trajectory
          categoricals toward the coherent argmax instead of sampling the
          marginals' error mass — an extension, not a reference knob
          (diversity on a rigid family comes from the coordinate prior,
          uniqueness is unaffected)."""
        cfg = self.cfg
        steps = cfg.integrator.steps
        if sampling_strategy == "linear":
            time_points = np.linspace(0, 1, steps + 1)
        elif sampling_strategy == "log":
            time_points = (1 - np.geomspace(0.01, 1.0, steps + 1))[::-1].copy()
        else:
            raise ValueError(sampling_strategy)
        times_arr = jnp.asarray(time_points[:-1], jnp.float32)
        sizes_arr = jnp.asarray(np.diff(time_points), jnp.float32)

        cond = {"coords": jnp.zeros_like(prior["coords"]),
                "atomics": jnp.zeros_like(prior["atomics"]),
                "bonds": jnp.zeros_like(prior["bonds"])}
        return self._generate_run(params, rng, prior, rep, cond, times_arr,
                                  sizes_arr, steps=steps,
                                  t_final=float(time_points[-2]),
                                  final_protocol=final_protocol,
                                  zero_cond=zero_cond,
                                  pred_temp=float(pred_temp))

    @functools.cached_property
    def _generate_run(self):
        """Built once per trainer: a jit defined inside generate() would
        throw away its compile cache on every call (one full remote
        recompile per eval batch). params/rng/prior/rep enter as jit
        arguments (closures would bake every weight into the lowered
        module as a constant)."""
        cfg = self.cfg

        @functools.partial(jax.jit, static_argnames=(
            "steps", "t_final", "final_protocol", "zero_cond", "pred_temp"))
        def run(params, rng, prior, rep, cond, times_arr, sizes_arr,
                steps, t_final, final_protocol="last", zero_cond=False,
                pred_temp=1.0):
            b = prior["coords"].shape[0]

            def predict(curr, t_vec, cond_batch):
                coords, tl, bl, cl, _ = self.model.apply(
                    {"params": params}, curr["coords"], curr["atomics"],
                    edge_feats=curr["bonds"],
                    cond_coords=(cond_batch["coords"]
                                 if cfg.self_cond else None),
                    cond_atomics=(cond_batch["atomics"]
                                  if cfg.self_cond else None),
                    cond_bonds=(cond_batch["bonds"]
                                if cfg.self_cond else None),
                    atom_mask=curr["mask"], rep=rep, times=t_vec)
                return {"coords": coords,
                        "atomics": jax.nn.softmax(tl, axis=-1),
                        "bonds": jax.nn.softmax(bl, axis=-1),
                        "charges": jax.nn.softmax(cl, axis=-1)}

            def body(carry, i):
                curr, cond_batch, _ = carry
                t_vec = jnp.full((b,), times_arr[i])
                predicted = predict(curr, t_vec, cond_batch)
                step_pred = predicted
                if pred_temp != 1.0:
                    inv_t = 1.0 / pred_temp
                    step_pred = dict(predicted)
                    for k in ("atomics", "bonds"):
                        p = predicted[k] ** inv_t
                        step_pred[k] = p / (p.sum(-1, keepdims=True) + 1e-12)
                new = integrator_step(jax.random.fold_in(rng, i),
                                      cfg.integrator, curr, step_pred, prior,
                                      t_vec, sizes_arr[i])
                new_cond = cond_batch if zero_cond else {
                    "coords": predicted["coords"],
                    "atomics": predicted["atomics"],
                    "bonds": predicted["bonds"]}
                return (new, new_cond, predicted), None

            # zero-init carry slot for the last prediction; dtypes must match
            # the model's outputs exactly (bf16 configs emit bf16 logits)
            pred0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(predict, dict(prior),
                               jnp.zeros((b,), jnp.float32), cond))
            (curr, cond2, last_pred), _ = jax.lax.scan(
                body, (dict(prior), cond, pred0), jnp.arange(steps))
            if final_protocol == "last":
                final = dict(last_pred)
            else:
                final = predict(curr, jnp.full((b,), t_final), cond2)
            final["mask"] = prior["mask"]
            return final

        return run

    def sample_prior(self, rng_np: np.random.Generator, mask: np.ndarray):
        return {k: jnp.asarray(v) for k, v in sample_prior_batch(
            rng_np, self.cfg.interpolant.prior, mask).items()}
