"""Property-classifier trainer: EGNN regressor for QM9 scalar properties.

TPU-native rebuild of molecule/qm9/property_prediction/main_qm9_prop.py:
one-hot node features, L1 loss on the mad-normalized property
(main_qm9_prop.py:88 `loss_l1(pred, (label - mean) / mad)`), Adam with
cosine-annealed LR (:229-231). The trained classifier is the evaluator
for conditional-generation MAE (eval_src/eval_conditional_qm9.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.core.ema import ema_init
from reed_tpu.core.train_state import TrainState, make_optimizer
from reed_tpu.core.trainer import jit_train_step, make_train_step
from reed_tpu.models.property_classifier import PropertyClassifier
from reed_tpu.parallel import mesh as meshlib

QM9_PROPERTIES = ("alpha", "gap", "homo", "lumo", "mu", "Cv", "G", "H",
                  "r2", "U", "U0", "zpve")


def compute_mean_mad(values: np.ndarray) -> Tuple[float, float]:
    """Mean and mean absolute deviation of a property column (reference:
    qm9/utils.py compute_mean_mad_from_dataloader)."""
    values = np.asarray(values, np.float64)
    mean = float(values.mean())
    mad = float(np.abs(values - mean).mean())
    return mean, max(mad, 1e-12)


@dataclass(frozen=True)
class PropertyTrainConfig:
    property: str = "alpha"
    num_atom_types: int = 5
    max_nodes: int = 29
    hidden_nf: int = 128                 # reference --nf 128
    n_layers: int = 7                    # reference --n_layers 7
    attention: bool = True
    mean: float = 0.0                    # property normalizer (train split)
    mad: float = 1.0
    batch_size: int = 96                 # reference --batch_size 96
    curriculum: CurriculumConfig = CurriculumConfig(
        proj_coeff=0.0, diffusion_warmup_steps=0)
    optim: OptimConfig = OptimConfig(lr=1e-3, weight_decay=1e-16,
                                     schedule="cosine", warmup_steps=0,
                                     total_steps=100_000)
    mesh: MeshConfig = MeshConfig()
    seed: int = 1


class PropertyTrainer:
    def __init__(self, cfg: PropertyTrainConfig, mesh=None):
        self.cfg = cfg
        self.model = PropertyClassifier(hidden_nf=cfg.hidden_nf,
                                        n_layers=cfg.n_layers,
                                        attention=cfg.attention)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor)
        self.optimizer = make_optimizer(cfg.optim)
        rng = jax.random.PRNGKey(cfg.seed)
        self.init_rng, self.train_rng = jax.random.split(rng)

        def loss_fn(params, batch, rng, step):
            del rng, step
            pred = self.model.apply({"params": params}, batch["one_hot"],
                                    batch["positions"], batch["node_mask"],
                                    batch["edge_mask"])
            target = (batch["label"] - cfg.mean) / cfg.mad
            loss = jnp.abs(pred - target).mean()
            return {"denoising_loss": loss, "proj_loss": jnp.zeros(())}

        curriculum = CurriculumConfig(**{**cfg.curriculum.__dict__,
                                         "max_steps": cfg.optim.total_steps})
        step_fn = make_train_step(loss_fn, self.optimizer, curriculum,
                                  accum_steps=cfg.optim.accum_steps)
        abstract_state = jax.eval_shape(self._init_state, self.init_rng)
        param_sharding = meshlib.shard_params(
            abstract_state.params, self.mesh, meshlib.EGNN_TP_RULES,
            fsdp_min_size=cfg.mesh.fsdp_min_size)
        rep = meshlib.replicated(self.mesh)
        from reed_tpu.train.image import _opt_state_shardings

        self.state_shardings = TrainState(
            step=rep, params=param_sharding, ema_params=param_sharding,
            opt_state=_opt_state_shardings(abstract_state.opt_state,
                                           abstract_state.params,
                                           param_sharding, rep))
        bsh = meshlib.batch_sharding(self.mesh)
        self.batch_sharding = {k: bsh for k in
                               ("one_hot", "positions", "node_mask",
                                "edge_mask", "label")}
        self.train_step = jit_train_step(step_fn, self.mesh,
                                         self.state_shardings,
                                         self.batch_sharding)

    def _init_state(self, rng) -> TrainState:
        cfg = self.cfg
        n = cfg.max_nodes
        variables = self.model.init(
            {"params": rng},
            jnp.zeros((1, n, cfg.num_atom_types)), jnp.zeros((1, n, 3)),
            jnp.ones((1, n, 1)), jnp.ones((1, n, n, 1)))
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema_params=ema_init(params),
                          opt_state=self.optimizer.init(params))

    def init_state(self) -> TrainState:
        with self.mesh:
            return jax.jit(self._init_state,
                           out_shardings=self.state_shardings)(self.init_rng)

    def synthetic_batch(self, rng=None, batch_size=None):
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        r = jax.random.split(rng, 4)
        n = cfg.max_nodes
        sizes = jax.random.randint(r[0], (bs,), max(2, n // 2), n + 1)
        node_mask = (jnp.arange(n)[None, :] < sizes[:, None]
                     ).astype(jnp.float32)[..., None]
        diag = jnp.eye(n)[None, :, :, None]
        edge_mask = (node_mask[:, :, None, :] * node_mask[:, None, :, :]
                     * (1 - diag))
        x = jax.random.normal(r[1], (bs, n, 3)) * node_mask
        types = jax.random.randint(r[2], (bs, n), 0, cfg.num_atom_types)
        one_hot = jax.nn.one_hot(types, cfg.num_atom_types) * node_mask
        # synthetic label correlated with composition so the loss can move
        label = (one_hot.sum(axis=(1, 2)) * 0.1
                 + jax.random.normal(r[3], (bs,)) * 0.01)
        return {"one_hot": one_hot, "positions": x, "node_mask": node_mask,
                "edge_mask": edge_mask, "label": label}

    @functools.cached_property
    def _fwd_jit(self):
        # built once per trainer: a jit defined inside predict() would
        # recompile on every call (predict runs per batch in eval loops)
        @jax.jit
        def _fwd(params, one_hot, positions, node_mask, edge_mask):
            return self.model.apply({"params": params}, one_hot, positions,
                                    node_mask, edge_mask)

        return _fwd

    def predict(self, params, one_hot, positions, node_mask, edge_mask,
                denormalize: bool = True):
        """Property prediction; with denormalize=True returns values in
        label units (reference eval: mad * pred + mean,
        main_qm9_prop.py:92-94)."""
        _fwd = self._fwd_jit
        # inputs may come from another trainer's device layout; replicate
        # them onto this trainer's mesh so jit sees one device set
        rep = meshlib.replicated(self.mesh)
        one_hot, positions, node_mask, edge_mask = jax.device_put(
            (jnp.asarray(one_hot), jnp.asarray(positions),
             jnp.asarray(node_mask), jnp.asarray(edge_mask)), rep)
        pred = _fwd(params, one_hot, positions, node_mask, edge_mask)
        if denormalize:
            pred = pred * self.cfg.mad + self.cfg.mean
        return pred


@dataclass(frozen=True)
class LinearProbeConfig:
    """Frozen-encoder linear probe for property prediction (reference:
    qm9/property_prediction/main_qm9_prop_pretrainedEnc_linear.py:132-171 —
    Encoder_Linear: frozen Frad encoder + Linear(rep_dim, 1), L1 on the
    mad-normalized label). Here the encoder forward is the precompute-to-
    disk reps path (reps.npy), so the probe trains on rep vectors."""

    property: str = "alpha"
    rep_dim: int = 256
    mean: float = 0.0
    mad: float = 1.0
    batch_size: int = 96
    optim: OptimConfig = OptimConfig(lr=1e-3, weight_decay=1e-16,
                                     schedule="cosine", warmup_steps=0,
                                     total_steps=100_000)
    mesh: MeshConfig = MeshConfig()
    seed: int = 1


class LinearProbeTrainer:
    def __init__(self, cfg: LinearProbeConfig, mesh=None):
        import flax.linen as nn

        self.cfg = cfg
        self.model = nn.Dense(1)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor)
        self.optimizer = make_optimizer(cfg.optim)
        self.init_rng, self.train_rng = jax.random.split(
            jax.random.PRNGKey(cfg.seed))

        def loss_fn(params, batch, rng, step):
            del rng, step
            pred = self.model.apply({"params": params}, batch["rep"])[..., 0]
            target = (batch["label"] - cfg.mean) / cfg.mad
            return {"denoising_loss": jnp.abs(pred - target).mean(),
                    "proj_loss": jnp.zeros(())}

        curriculum = CurriculumConfig(proj_coeff=0.0,
                                      diffusion_warmup_steps=0,
                                      max_steps=cfg.optim.total_steps)
        step_fn = make_train_step(loss_fn, self.optimizer, curriculum,
                                  accum_steps=cfg.optim.accum_steps)
        rep = meshlib.replicated(self.mesh)
        self.state_shardings = TrainState(step=rep, params=rep,
                                          ema_params=rep, opt_state=rep)
        bsh = meshlib.batch_sharding(self.mesh)
        self.batch_sharding = {"rep": bsh, "label": bsh}
        self.train_step = jit_train_step(step_fn, self.mesh,
                                         self.state_shardings,
                                         self.batch_sharding)

    def _init_state(self, rng) -> TrainState:
        params = self.model.init(rng, jnp.zeros((1, self.cfg.rep_dim))
                                 )["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema_params=ema_init(params),
                          opt_state=self.optimizer.init(params))

    def init_state(self) -> TrainState:
        with self.mesh:
            return jax.jit(self._init_state,
                           out_shardings=self.state_shardings)(self.init_rng)

    def synthetic_batch(self, rng=None, batch_size=None):
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        r1, r2 = jax.random.split(rng)
        rep = jax.random.normal(r1, (bs, cfg.rep_dim))
        # label linearly related to the rep so the probe can fit it
        w = jax.random.normal(r2, (cfg.rep_dim,)) / np.sqrt(cfg.rep_dim)
        return {"rep": rep, "label": rep @ w}

    def predict(self, params, rep, denormalize: bool = True):
        pred = self.model.apply({"params": params}, jnp.asarray(rep))[..., 0]
        if denormalize:
            pred = pred * self.cfg.mad + self.cfg.mean
        return pred


def property_epoch_batches(data: Dict[str, np.ndarray], prop: str,
                           batch_size: int, rng: np.random.Generator,
                           max_nodes: int = 29, num_atom_types: int = 5
                           ) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled epochs of PropertyTrainer-schema batches from the EDM QM9
    npz layout, carrying the property column as the label."""
    from reed_tpu.data.molecule import edm_epoch_batches

    labels = np.asarray(data[prop], np.float32)
    m = len(np.asarray(data["positions"]))
    order = rng.permutation(m)
    for i in range(0, m - batch_size + 1, batch_size):
        idx = order[i:i + batch_size]
        sub = {k: np.asarray(v)[idx] for k, v in data.items()
               if k in ("positions", "charges", "one_hot", "num_atoms")}
        batch = next(edm_epoch_batches(
            sub, batch_size, np.random.default_rng(0), shuffle=False,
            max_nodes=max_nodes, num_atom_types=num_atom_types))
        del batch["charges"]
        batch["label"] = labels[idx]
        yield batch
