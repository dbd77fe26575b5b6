"""Prox kernel library (replaces ProximalOperators.jl's nonsmooth side;
SURVEY.md §2.2). The solvers' fused Pallas paths handle the hot
separable proxes in-kernel (ops/fused_block); everything here is the
identical closed-form XLA formula, usable standalone and on CPU CI."""

from ciao_tpu.prox.base import ProxOperator, register_prox
from ciao_tpu.prox.separable import (
    Zero,
    GroupNormL21,
    NormL1,
    NormL2,
    SqrNormL2,
    ElasticNet,
    IndBox,
    IndBallL2,
    IndSimplex,
    NormNuclear,
)
from ciao_tpu.prox.extended import (
    NormL0,
    NormL21,
    SqrDistPoint,
    NormLinf,
    IndBallL1,
    IndBallLinf,
    IndNonnegative,
    IndNonpositive,
    IndHalfspace,
    IndPoint,
    IndAffine,
    IndSphereL2,
    LogBarrier,
    HingeLoss,
    MCP,
    SCAD,
)

__all__ = [
    "ProxOperator",
    "register_prox",
    "Zero",
    "NormL1",
    "GroupNormL21",
    "NormL2",
    "SqrNormL2",
    "ElasticNet",
    "IndBox",
    "IndBallL2",
    "IndSimplex",
    "NormNuclear",
    "NormL0",
    "NormL21",
    "SqrDistPoint",
    "NormLinf",
    "IndBallL1",
    "IndBallLinf",
    "IndNonnegative",
    "IndNonpositive",
    "IndHalfspace",
    "IndPoint",
    "IndAffine",
    "IndSphereL2",
    "LogBarrier",
    "HingeLoss",
    "MCP",
    "SCAD",
]
