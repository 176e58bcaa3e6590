"""reed_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
representation-guided generative model training (REED capabilities).

Three domain pipelines share one core:
  * image:    SiT flow-matching latent diffusion with REPA-style alignment
  * protein:  discrete flow-matching inverse folding with AF3-embedding alignment
  * molecule: equivariant flow matching / diffusion with UniMol/Frad alignment

Design notes (clean-room, built from SURVEY.md of ChenyuWang-Monica/REED):
  - single jitted train step with donated buffers per domain
  - one jax.sharding.Mesh ('data','fsdp','tensor'); DP via batch sharding,
    optional FSDP / tensor sharding via param PartitionSpec rules
  - samplers are lax.scan bodies; curricula are pure functions of step
  - bf16 compute / f32 params + f32 integrator state
"""

__version__ = "0.1.0"
