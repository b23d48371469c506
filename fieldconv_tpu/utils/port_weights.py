"""Port reference (torch) weights into flax params.

The flax modules mirror the reference parameter names and shapes 1:1
(nn/modules.py), so a torch ``state_dict`` — exported to numpy with
``{k: v.numpy() for k, v in model.state_dict().items()}`` — maps onto the
params tree by joining the flax path with dots.  The only shape adaptation
is TangentNonLin's bias, stored (1, C) by the reference
(tangent_nonlin.py:19) and (C,) here.

Use for golden-activation parity tests: run the reference once, export the
state dict + inputs, then `net.apply(port(state, template), ...)`.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def torch_state_dict_to_flax(state: Dict[str, np.ndarray], params_template):
    """Returns a params pytree with the template's structure filled from the
    torch-style flat dict.  Raises KeyError on missing entries."""
    flat = jax.tree_util.tree_flatten_with_path(params_template)
    leaves, treedef = flat
    new_leaves = []
    for path, leaf in leaves:
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys and keys[0] == "params":
            keys = keys[1:]
        torch_key = ".".join(keys)
        if torch_key not in state:
            raise KeyError(
                f"torch state_dict missing '{torch_key}' "
                f"(have e.g. {list(state)[:5]})"
            )
        arr = np.asarray(state[torch_key])
        want = np.shape(leaf)
        if arr.shape != want:
            squeezed = np.squeeze(arr)
            if squeezed.shape == tuple(s for s in want if s != 1) or \
                    squeezed.shape == want:
                arr = squeezed.reshape(want)
            else:
                raise ValueError(
                    f"shape mismatch for '{torch_key}': torch {arr.shape} "
                    f"vs flax {want}"
                )
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def flax_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse direction (for inspecting / exporting trained weights)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys and keys[0] == "params":
            keys = keys[1:]
        out[".".join(keys)] = np.asarray(leaf)
    return out
