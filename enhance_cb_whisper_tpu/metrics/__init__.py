from .pr_curve import (
    binary_pr_curve,
    operating_point,
    prf_at_threshold,
    find_best_threshold_idx,
    recall_at_k,
)
from .bootstrap import evaluate_with_conf_int
from .tokenizer import PriberamTokenizer, Token
from .nw_align import needleman_wunsch
from .entity_recall import entity_recall

__all__ = [
    "binary_pr_curve",
    "operating_point",
    "prf_at_threshold",
    "find_best_threshold_idx",
    "recall_at_k",
    "evaluate_with_conf_int",
    "PriberamTokenizer",
    "Token",
    "needleman_wunsch",
    "entity_recall",
]
