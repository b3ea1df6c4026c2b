from pearl_tpu.utils.pytree import (
    compare,
    soft_update,
    tree_allclose,
    tree_select,
)

__all__ = ["compare", "soft_update", "tree_allclose", "tree_select"]
