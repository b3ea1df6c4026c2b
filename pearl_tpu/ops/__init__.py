"""Pallas TPU kernels for the hot ops (SURVEY.md §2 preamble: custom kernels
where XLA fusion is insufficient)."""

from pearl_tpu.ops.fused_mlp import fused_mlp, fused_mlp_from_flax, use_fused_mlp

__all__ = ["fused_mlp", "fused_mlp_from_flax", "use_fused_mlp"]
