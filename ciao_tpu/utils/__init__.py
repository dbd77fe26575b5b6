from ciao_tpu.utils.problems import (
    LassoProblem,
    SparseLassoProblem,
    make_sparse_lasso_ell,
    LogisticProblem,
    SharingProblem,
    PlantedSharingProblem,
    make_sharing_planted,
    PlantedFusedLassoProblem,
    make_fused_lasso_planted,
    make_lasso,
    make_logistic_l1,
    make_sharing,
)

__all__ = [
    "LassoProblem",
    "SparseLassoProblem",
    "make_sparse_lasso_ell",
    "LogisticProblem",
    "SharingProblem",
    "PlantedSharingProblem",
    "make_sharing_planted",
    "PlantedFusedLassoProblem",
    "make_fused_lasso_planted",
    "make_lasso",
    "make_logistic_l1",
    "make_sharing",
]
