"""Pallas TPU kernels for the hot compute paths.

Kernels fall back to pure-XLA implementations off-TPU so the package is
portable; tests exercise the Mosaic lowering via interpret mode.

Import the submodule (`from lmrl_gym_tpu.ops import flash_attention`)
rather than re-exporting its functions here: a same-named function
re-export would shadow the module attribute.
"""
