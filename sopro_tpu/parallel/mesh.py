"""Device mesh construction and sharding rules.

Strategy for a 135M conv/attention TTS stack (SURVEY.md §2.4):

* **dp** — batch data parallelism: the serving batch and training batch shard
  over `dp`; gradients all-reduce over ICI (GSPMD inserts the psums).
* **tp** — tensor parallelism over the model's wide matmuls: the 4x FFN and
  GLU expansions shard their hidden axis, the AR head shards its vocab axis,
  and the big embedding tables shard their row (vocab) axis. At d_model=384
  this matters less for capacity than for fitting batched serving activations,
  so tp defaults small.

Sequence/pipeline/expert parallelism are structurally N/A for this model
family (max 400 frames, O(1)-in-T conv state, no MoE — SURVEY.md §5); the
mesh API still accepts higher-dim layouts so larger variants can add axes.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
    """Mesh over the first n devices with axes ("dp", "tp"). Defaults: tp=2
    when the device count is even and > 2 (exercises both axis kinds), else
    tp=1."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"make_mesh: need {n} devices, have {len(devices)} "
            f"({devices[0].platform} backend). For an N-device CPU mesh set "
            "JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_"
            "count=N before JAX initializes."
        )
    devices = devices[:n]
    if tp is None:
        tp = 2 if (n % 2 == 0 and n > 2) else 1
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n}")
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


# Rules matched against "/"-joined pytree paths; the FIRST matching rule
# whose axes divide the leaf's dimensions wins (a non-dividing rule falls
# through, so a pattern may appear twice with a fallback layout).
# Axis meanings follow the sopro_tpu layouts: linear w [in, out],
# dwconv w [k, 1, D], embeddings [rows, D].
_RULES: Tuple[Tuple[str, P], ...] = (
    # FFN / GLU expansions: shard the wide hidden axis
    (r".*/ff1/w$", P(None, "tp")),
    (r".*/ff1/b$", P("tp")),
    (r".*/ff2/w$", P("tp", None)),
    (r".*/glu/pro/w$", P(None, "tp")),
    (r".*/glu/pro/b$", P("tp")),
    # AR head: shard the vocab axis; the flagship vocab is odd
    # (codebook_size+1 EOS = 2049), so fall back to the input (d_model) axis
    (r".*ar/head/w$", P(None, "tp")),
    (r".*ar/head/w$", P("tp", None)),
    (r".*ar/head/b$", P("tp")),
    # NAR per-codebook heads: shard the codebook-vocab axis
    (r".*heads/./\d+/w$", P(None, "tp")),
    (r".*heads/./\d+/b$", P("tp")),
    # big embedding tables: shard rows (vocab); the fused codebook table has
    # odd rows at flagship size (Q*V+1 BOS = 65537), so fall back to the
    # d_model axis rather than silently replicating ~100 MB
    (r".*(cb_embed|text_enc/embed|token2sv/emb)/emb$", P("tp", None)),
    (r".*(cb_embed|text_enc/embed|token2sv/emb)/emb$", P(None, "tp")),
    # Mimi transformer MLPs
    (r".*/fc1/w$", P(None, "tp")),
    (r".*/fc2/w$", P("tp", None)),
    # Mimi dequant tables: shard the codebook-entry rows
    (r".*quantizer/(dec_)?embed$", P(None, "tp", None)),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_pspec(path, leaf) -> P:
    s = _path_str(path)
    for pat, spec in _RULES:
        if re.match(pat, s):
            # guard: axis must divide the dimension, else replicate
            dims = np.shape(leaf)
            ok = True
            for d, ax in zip(dims, tuple(spec) + (None,) * (len(dims) - len(spec))):
                if ax is not None and d % _axis_size(ax) != 0:
                    ok = False
            if ok:
                return spec
    return P()


def _axis_size(ax) -> int:
    mesh = _CURRENT_MESH[0]
    return int(mesh.shape[ax]) if mesh is not None else 1


_CURRENT_MESH = [None]


def param_shardings(mesh: Mesh, params: Dict[str, Any]):
    """NamedSharding pytree for a parameter pytree under `mesh`."""
    _CURRENT_MESH[0] = mesh
    try:
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf)), params
        )
    finally:
        _CURRENT_MESH[0] = None


def batch_sharding(mesh: Mesh):
    """Batch arrays shard their leading axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
