"""ciao_tpu — TPU-native finite-sum composite optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
CIAOAlgorithms.jl (kul-optec/CIAOAlgorithms.jl): incremental aggregated
proximal-gradient solvers for

    minimize (1/N) sum_{i=1}^N f_i(x) + g(x)          (finite-sum)
    minimize (1/N) sum_i f_i(x_i) + g(sum_i x_i)      (sharing)

Solver families (reference: README.md:22-30):
  * Finito/MISO/DIAG  — basic, low-memory (LFinito), adaptive, minibatch
  * ProShI            — sharing formulation
  * SAGA / SAG
  * SVRG / SVRG++

Architecture is TPU-first, not a port: oracles are data-driven (arrays of
data, not arrays of closures), per-sample index sets are batched on device,
gradient/iterate tables are HBM-resident (optionally sharded over a device
mesh), hot loops run under ``jax.lax.scan``, and the prox library dispatches
to fused Pallas kernels on TPU.
"""

from ciao_tpu import oracles, prox
from ciao_tpu.oracles import (
    HuberRows,
    SquaredHingeRows,
    PoissonRows,
    LeastSquaresRows,
    SparseLeastSquaresELL,
    HybridSparseLeastSquares,
    LogisticRows,
    DiagQuadratic,
    SqrDistBox,
    SumOracle,
    ZeroOracle,
    CustomOracle,
)
from ciao_tpu.prox import (
    NormL1,
    NormL2,
    SqrNormL2,
    ElasticNet,
    IndBox,
    IndBallL2,
    IndSimplex,
    NormNuclear,
    Zero,
    NormL0,
    NormL21,
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
from ciao_tpu.ops.linmap import DenseMap, FirstDifference, IdentityMap
from ciao_tpu.solvers import (
    Finito,
    FISTA,
    ForwardBackward,
    DavisYin,
    DouglasRachford,
    CondatVu,
    ChambollePock,
    PANOC,
    ZeroFPR,
    Katyusha,
    LKatyusha,
    LSVRG,
    PointSAGA,
    SARAH,
    Proshi,
    SAGA,
    SAG,
    SSNM,
    SVRG,
    iterator,
    solution,
    DeepSolveInfo,
    deep_solve,
    DeepSharingInfo,
    deep_solve_sharing,
    proshi_resync,
    sharing_objective,
    StagedInfo,
    staged_saga,
    fista_polish,
    power_lmax,
)
from ciao_tpu.solvers.base import Status

__version__ = "0.1.0"

__all__ = [
    "oracles",
    "prox",
    "Finito",
    "ForwardBackward",
    "FISTA",
    "DavisYin",
    "DouglasRachford",
    "CondatVu",
    "ChambollePock",
    "IdentityMap",
    "DenseMap",
    "FirstDifference",
    "PANOC",
    "ZeroFPR",
    "Katyusha",
    "LSVRG",
    "LKatyusha",
    "PointSAGA",
    "SARAH",
    "Proshi",
    "SAGA",
    "SAG",
    "SSNM",
    "SVRG",
    "iterator",
    "solution",
    "Status",
    "DeepSolveInfo",
    "deep_solve",
    "DeepSharingInfo",
    "deep_solve_sharing",
    "proshi_resync",
    "sharing_objective",
    "StagedInfo",
    "staged_saga",
    "fista_polish",
    "power_lmax",
    "LeastSquaresRows",
    "HuberRows",
    "SquaredHingeRows",
    "PoissonRows",
    "SparseLeastSquaresELL",
    "HybridSparseLeastSquares",
    "LogisticRows",
    "DiagQuadratic",
    "SqrDistBox",
    "SumOracle",
    "ZeroOracle",
    "CustomOracle",
    "NormL1",
    "NormL2",
    "SqrNormL2",
    "ElasticNet",
    "IndBox",
    "IndBallL2",
    "IndSimplex",
    "NormNuclear",
    "Zero",
    "NormL0",
    "NormL21",
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
