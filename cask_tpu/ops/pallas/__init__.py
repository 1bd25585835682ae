"""Pallas TPU kernels — the hot compute paths (cask analog: the MaxJ
hardware kernels, SURVEY.md §2 R5).

Kernels run compiled on TPU and in interpret mode elsewhere, so the same
code is unit-tested on CPU (the Maxeler "simulation mode" analog,
SURVEY.md §4)."""
