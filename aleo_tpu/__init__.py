"""aleo-tpu: a TPU-native zero-knowledge proving framework.

A from-scratch re-design of the capabilities of the Aleo SDK
(demox-labs/aleo, mounted at /root/reference) for TPU hardware:

  * crypto kernels (BLS12-377 field/curve arithmetic, Poseidon, NTT, MSM,
    KZG polynomial commitments, a Marlin-family SNARK prover) as
    JAX/XLA/Pallas programs sharded over device meshes, and
  * the SDK capability surface (accounts, program management, execution,
    transactions, REST client/server, CLI) as an idiomatic Python layer.

Layer map (bottom-up): params -> reference (host oracle) -> fields -> curves
-> hash -> ntt/msm -> pcs -> snark -> program -> sdk -> devserver/cli.
"""

__version__ = "0.1.0"

from . import params  # noqa: F401
