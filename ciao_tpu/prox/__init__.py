"""Prox kernel library (replaces ProximalOperators.jl's nonsmooth side;
SURVEY.md §2.2). Separable ops fuse into Pallas TPU kernels on device."""

from ciao_tpu.prox.base import ProxOperator, register_prox
from ciao_tpu.prox.separable import (
    Zero,
    NormL1,
    NormL2,
    SqrNormL2,
    ElasticNet,
    IndBox,
    IndBallL2,
    IndSimplex,
    NormNuclear,
)

__all__ = [
    "ProxOperator",
    "register_prox",
    "Zero",
    "NormL1",
    "NormL2",
    "SqrNormL2",
    "ElasticNet",
    "IndBox",
    "IndBallL2",
    "IndSimplex",
    "NormNuclear",
]
