"""Mesh/topology module and data-parallel solver paths.

The reference has no parallelism (SURVEY.md §2.3) — its finite-sum index
is the natural partition axis. This package owns the mapping onto TPU
device meshes: mesh construction and placement rules (:mod:`mesh`) and
shard_map'd solver families with psum aggregation (:mod:`dp`).
"""

from ciao_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_specs,
    make_mesh,
    make_mesh_2d,
    put_specs,
    replicated_specs,
    shard_finite_sum,
)
from ciao_tpu.parallel.tp import (
    TPFinito,
    TPLFinito,
    TPSAGA,
    TPSVRG,
    TPKatyusha,
    TPSARAH,
    TPFISTA,
    TPForwardBackward,
    TPPointSAGA,
    TPProshi,
    data_model_specs,
    shard_finite_sum_2d,
)
from ciao_tpu.parallel.dp import (
    DPCfg,
    DPFinito,
    DPFISTA,
    DPForwardBackward,
    DPKatyusha,
    DPLKatyusha,
    DPLSVRG,
    DPPointSAGA,
    DPProshi,
    DPSAG,
    DPSAGA,
    DPSARAH,
    DPSVRG,
    build_dp_functions,
    local_indices,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_specs",
    "make_mesh",
    "make_mesh_2d",
    "put_specs",
    "replicated_specs",
    "shard_finite_sum",
    "DPCfg",
    "DPFinito",
    "DPForwardBackward",
    "DPFISTA",
    "DPKatyusha",
    "DPLSVRG",
    "DPLKatyusha",
    "DPPointSAGA",
    "DPProshi",
    "DPSAG",
    "DPSAGA",
    "DPSARAH",
    "DPSVRG",
    "build_dp_functions",
    "local_indices",
    "TPFinito",
    "TPLFinito",
    "TPSAGA",
    "TPSVRG",
    "TPKatyusha",
    "TPSARAH",
    "TPPointSAGA",
    "TPForwardBackward",
    "TPFISTA",
    "TPProshi",
    "data_model_specs",
    "shard_finite_sum_2d",
]
