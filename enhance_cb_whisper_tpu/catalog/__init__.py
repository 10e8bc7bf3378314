from .store import load_hidden_states, save_hidden_states
from .database import KeywordCatalog, device_put_catalog, make_catalog_score_fn

__all__ = [
    "load_hidden_states",
    "save_hidden_states",
    "KeywordCatalog",
    "device_put_catalog",
    "make_catalog_score_fn",
]
