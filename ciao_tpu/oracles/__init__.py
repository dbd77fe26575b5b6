"""Smooth-term oracle library (the layer the reference outsources to
ProximalOperators.jl — see SURVEY.md §2.2)."""

from ciao_tpu.oracles.base import SmoothOracle, register_oracle, static_field
from ciao_tpu.oracles.least_squares import LeastSquaresRows
from ciao_tpu.oracles.huber import HuberRows
from ciao_tpu.oracles.sqhinge import SquaredHingeRows
from ciao_tpu.oracles.poisson import PoissonRows
from ciao_tpu.oracles.logistic import LogisticRows
from ciao_tpu.oracles.sparse import (
    SparseLeastSquaresELL,
    HybridSparseLeastSquares,
    SparseLogisticELL,
    HybridSparseLogistic,
)
from ciao_tpu.oracles.quadratic import DiagQuadratic, DenseQuadratic, SqrDistBox
from ciao_tpu.oracles.compose import SumOracle, ZeroOracle, CustomOracle, Precompose

__all__ = [
    "SmoothOracle",
    "register_oracle",
    "static_field",
    "LeastSquaresRows",
    "HuberRows",
    "SquaredHingeRows",
    "PoissonRows",
    "LogisticRows",
    "SparseLeastSquaresELL",
    "HybridSparseLeastSquares",
    "SparseLogisticELL",
    "HybridSparseLogistic",
    "DiagQuadratic",
    "DenseQuadratic",
    "SqrDistBox",
    "SumOracle",
    "ZeroOracle",
    "CustomOracle",
    "Precompose",
]
