"""Device meshes and sharding vocabularies.

Axis conventions:

- ``data`` — shards corpus rows (retrieval) and example batches
  (training/eval). Collectives on this axis are top-k merges
  (all-gather) and loss reductions (psum); they ride ICI.
- ``model`` — shards encoder weights (tensor parallelism): QKV/MLP
  columns forward, output projections rows, vocabulary rows of the
  token embedding. Only worthwhile for the Nemotron-class 4096-d
  encoder; the 384-d MiniLM-class usually replicates.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on the
    data axis (pure corpus/data parallelism)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def encoder_param_specs(params: Dict[str, jax.Array]) -> Dict[str, P]:
    """Tensor-parallel PartitionSpecs for the encoder param pytree
    (:func:`trueno_rag_tpu.models.encoder.init_encoder_params` layout).

    Megatron-style: QKV and MLP-in shard output columns, attention-out
    and MLP-out shard input rows, so each block needs one psum (inserted
    automatically by GSPMD at the row-sharded matmuls). LayerNorms and
    biases of row-sharded matmuls stay replicated.
    """
    spec: Dict[str, P] = {}
    for name in params:
        if name in ("qkv_w", "mlp_w1"):
            spec[name] = P(None, None, "model")  # [L, H, out] — shard out
        elif name in ("qkv_b", "mlp_b1"):
            spec[name] = P(None, "model")  # [L, out]
        elif name in ("attn_out_w", "mlp_w2"):
            spec[name] = P(None, "model", None)  # [L, in, H] — shard in
        elif name == "tok_emb":
            spec[name] = P("model", None)  # shard vocabulary rows
        else:
            spec[name] = P()  # layernorms, pos_emb, row-matmul biases
    return spec


def shard_params(params: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a param pytree onto the mesh with tensor-parallel shardings."""
    specs = encoder_param_specs(params)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in params.items()
    }


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
