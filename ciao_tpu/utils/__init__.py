from ciao_tpu.utils.problems import (
    LassoProblem,
    LogisticProblem,
    SharingProblem,
    make_lasso,
    make_logistic_l1,
    make_sharing,
)

__all__ = [
    "LassoProblem",
    "LogisticProblem",
    "SharingProblem",
    "make_lasso",
    "make_logistic_l1",
    "make_sharing",
]
