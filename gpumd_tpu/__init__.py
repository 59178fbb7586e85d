"""gpumd_tpu — a TPU-native molecular dynamics + machine-learned-potential framework.

Re-implements the capabilities of GPUMD (gpumd/nep/gnep executables) as an
idiomatic JAX/XLA/Pallas framework: functional state pytrees, statically
shaped neighbor tensors, `lax.scan` step loops, and `shard_map` domain
decomposition over TPU meshes.

Public input formats (run.in / nep.in / model.xyz / nep.txt and the *.out
file catalog) are kept byte-compatible with the reference
(see SURVEY.md Appendix A).
"""

__version__ = "0.1.0"

from gpumd_tpu import units  # noqa: F401
