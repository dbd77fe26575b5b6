"""Solver facades: Finito/MISO (basic, LFinito, adaptive), ProShI,
SAGA/SAG, SVRG/SVRG++ — mirroring the reference's public surface
(constructors, functor-style ``solver(x0; F, g, L, N)`` calls,
``iterator``, ``solution``)."""

from ciao_tpu.solvers.base import SolverIterable, Status, loop, solution, take
from ciao_tpu.solvers.fb import FISTA, ForwardBackward
from ciao_tpu.solvers.dys import DavisYin, DouglasRachford
from ciao_tpu.solvers.primal_dual import ChambollePock, CondatVu
from ciao_tpu.solvers.panoc import PANOC, ZeroFPR
from ciao_tpu.solvers.finito import Finito
from ciao_tpu.solvers.katyusha import Katyusha
from ciao_tpu.solvers.lsvrg import LKatyusha, LSVRG
from ciao_tpu.solvers.point_saga import PointSAGA
from ciao_tpu.solvers.proshi import Proshi
from ciao_tpu.solvers.saga import SAG, SAGA
from ciao_tpu.solvers.ssnm import SSNM
from ciao_tpu.solvers.staged import StagedInfo, staged_saga
from ciao_tpu.solvers.deep import DeepSolveInfo, deep_solve
from ciao_tpu.solvers.deep_sharing import DeepSharingInfo, deep_solve_sharing
from ciao_tpu.solvers.deep_pd import (DeepPDInfo, deep_solve_pd,
                                      tv_refine, tv_refine3)
from ciao_tpu.solvers.proshi import proshi_resync, sharing_objective
from ciao_tpu.solvers.polish import (
    PolishResult,
    fista_polish,
    grad_mean_chunked,
    grad_mean_chunked_blocks,
    grad_sum_chunked,
    grad_sum_chunked_blocks,
    lsq_power_lmax,
    power_lmax,
    power_lmax_quadratic,
    power_lmax_weighted,
)
from ciao_tpu.solvers.sarah import SARAH
from ciao_tpu.solvers.svrg import SVRG


def iterator(solver, x0, **kwargs):
    """Streaming mode (reference ``Finito.jl:186-234``): returns a bare
    iterable of states; the solver's maxit/verbose/freq are ignored."""
    return solver.iterator(x0, **kwargs)


__all__ = [
    "Finito",
    "ForwardBackward",
    "FISTA",
    "DavisYin",
    "DouglasRachford",
    "CondatVu",
    "ChambollePock",
    "PANOC",
    "ZeroFPR",
    "Katyusha",
    "LSVRG",
    "LKatyusha",
    "SARAH",
    "Proshi",
    "PointSAGA",
    "SAGA",
    "SSNM",
    "StagedInfo",
    "staged_saga",
    "DeepSolveInfo",
    "deep_solve",
    "DeepSharingInfo",
    "deep_solve_sharing",
    "DeepPDInfo",
    "deep_solve_pd",
    "tv_refine",
    "tv_refine3",
    "proshi_resync",
    "sharing_objective",
    "PolishResult",
    "fista_polish",
    "grad_mean_chunked",
    "grad_mean_chunked_blocks",
    "grad_sum_chunked",
    "grad_sum_chunked_blocks",
    "lsq_power_lmax",
    "power_lmax",
    "power_lmax_quadratic",
    "SAG",
    "SVRG",
    "iterator",
    "solution",
    "take",
    "loop",
    "SolverIterable",
    "Status",
]
