"""snark_tpu: a TPU-native zkSNARK proving framework.

Capabilities of arkworks-rs/snark (ark-relations + ark-snark) plus the kernel
stack beneath them (ark-ff / ark-poly / ark-ec / groth16), re-designed for
TPU: host-side constraint synthesis producing device-ready CSR matrices, and
JAX/XLA/Pallas kernels for multi-limb Montgomery field arithmetic, radix-2
NTT, curve arithmetic, Pippenger MSM, and the Groth16 prover, scaled over
device meshes with shard_map collectives.

Layer map (mirrors SURVEY.md §1):
    snark_tpu.snark      — SNARK trait layer (L5)
    snark_tpu.relations  — circuit-authoring API + constraint-system core (L4-L2)
    snark_tpu.fields     — field kernel layer, host + device (L1)
    snark_tpu.ops        — device kernels: NTT, curve, MSM (L1)
    snark_tpu.groth16    — the flagship proof system
    snark_tpu.parallel   — mesh/sharding layer (multi-chip scaling)
    snark_tpu.models     — example circuits ("model zoo")
"""

__version__ = "0.1.0"
