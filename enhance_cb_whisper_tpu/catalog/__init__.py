from .store import load_hidden_states, save_hidden_states
from .database import (
    KeywordCatalog,
    calibration_sim_maps,
    device_put_catalog,
    make_catalog_score_fn,
)

__all__ = [
    "load_hidden_states",
    "save_hidden_states",
    "KeywordCatalog",
    "calibration_sim_maps",
    "device_put_catalog",
    "make_catalog_score_fn",
]
