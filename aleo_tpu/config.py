"""Framework configuration (env-var overridable defaults).

The reference's config surface is clap flags + hardcoded network defaults
(`https://vm.aleo.org/api` + `testnet3`, `/root/reference/rust/src/api/mod.rs:48-54`;
dev server `0.0.0.0:4040` + peer default, `rust/develop/src/lib.rs:191-195`).
This module centralizes the equivalents, each overridable by environment
variable (the idiomatic config channel for a deployed TPU service):

  ALEO_TPU_NETWORK        network id               (default: testnet3)
  ALEO_TPU_ENDPOINT       node REST endpoint       (default: local devnet)
  ALEO_TPU_DEVNET_PATH    pickled dev-ledger path  (~/.aleo_tpu/devnet.pkl)
  ALEO_TPU_SRS_DIR        SRS cache directory      (~/.aleo_tpu/srs)
  ALEO_TPU_KEY_DIR        function-key cache dir   (~/.aleo_tpu/keys)
  ALEO_TPU_XLA_CACHE      XLA compile cache dir    (~/.cache/aleo_tpu_xla)
  ALEO_TPU_SERVER_HOST    dev server bind host     (0.0.0.0)
  ALEO_TPU_SERVER_PORT    dev server port          (4040)
  ALEO_TPU_PROFILE        enable stage profiling   (0)
  ALEO_TPU_TRACE_DIR      jax.profiler trace dir   (unset)
"""

from __future__ import annotations

import os


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


NETWORK = _env("ALEO_TPU_NETWORK", "testnet3")
ENDPOINT = _env("ALEO_TPU_ENDPOINT", "")          # "" = in-process dev ledger
DEVNET_PATH = os.path.expanduser(
    _env("ALEO_TPU_DEVNET_PATH", "~/.aleo_tpu/devnet.pkl")
)
SRS_DIR = os.path.expanduser(_env("ALEO_TPU_SRS_DIR", "~/.aleo_tpu/srs"))
KEY_DIR = os.path.expanduser(_env("ALEO_TPU_KEY_DIR", "~/.aleo_tpu/keys"))
XLA_CACHE = os.path.expanduser(
    _env("ALEO_TPU_XLA_CACHE", "~/.cache/aleo_tpu_xla")
)
SERVER_HOST = _env("ALEO_TPU_SERVER_HOST", "0.0.0.0")
SERVER_PORT = int(_env("ALEO_TPU_SERVER_PORT", "4040"))

# Minimum transform size for the int8-MXU MatNTT path on TPU (ntt/matntt.py);
# below it the flat VPU butterfly network wins on dispatch/compile overhead.
# Raise past every working size (e.g. 1 << 30) to disable MatNTT.
MATNTT_MIN_N = int(_env("ALEO_TPU_MATNTT_MIN", str(1 << 14)))

# Fixed-base commit MSMs (msm/fixed_base.py): precomputed per-window shifted
# SRS tables turn every KZG commitment into a single-window bucket pipeline.
# "auto" = on for TPU commits of >= FIXED_BASE_MIN_N points; "0" disables
# (variable-base Pippenger per commit, the r1-r4 path).
#
# DEFAULT OFF (r5): with the fixed-base path enabled, the simple_token
# transfer proof fails its g2_shift_a degree-bound pairing check on TPU,
# while every isolated oracle check of the same machinery passes
# (variable/fixed, shifts, clamped non-pow2 sizes, batched groups at
# 2048-8192 — see BASELINE.md "fixed-base status"). Until the failing
# (n=32767, k=4, shift=3) commit-group case is root-caused, proofs ride
# the r4-proven variable-base pipeline; set ALEO_TPU_FIXED_BASE=auto to
# re-enable for debugging.
FIXED_BASE_MODE = _env("ALEO_TPU_FIXED_BASE", "0")
FIXED_BASE_MIN_N = int(_env("ALEO_TPU_FIXED_BASE_MIN", "2048"))

# Fused Montgomery-reduce Pallas kernel for the MatNTT stage chain
# (fields/fmat_pallas.mont_reduce8): the whole carry/Wnp/carry/Wp/add/carry
# chain in one VMEM pass (~5x less reduce HBM traffic). The body is
# CPU-validated bit-exact (tests/test_fmat.py); "1" enables on TPU.
FUSED_REDUCE = _env("ALEO_TPU_FUSED_REDUCE", "1") not in ("0", "false")

# Batch-affine MSM accumulation (curves/g1_affine.py): ~7 Montgomery muls per
# bucket add vs 11 for the projective mixed add. "auto" = affine on TPU,
# projective off-TPU (the CPU einsum path pays per-add Fermat inversions that
# only the TPU's fused ladder kernel amortizes); "1" forces affine everywhere
# (the CPU coverage test), "0" forces the r1-r4 projective pipeline (A/B).
MSM_AFFINE_MODE = _env("ALEO_TPU_MSM_AFFINE", "auto")


def enable_compile_cache() -> None:
    """Attach the persistent XLA compile cache (Mosaic/limb-graph compiles
    cost minutes cold; see BASELINE.md). Safe to call repeatedly."""
    import jax

    jax.config.update("jax_compilation_cache_dir", XLA_CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
