"""Sharded execution: DP train step, catalog sharding, Whisper TP specs.

* :func:`make_sharded_train_step` — the KWS train step jitted with the
  batch sharded over the ``data`` axis and params/opt-state replicated.
  XLA's SPMD partitioner turns the loss/grad reductions into ``psum`` over
  ICI — the TPU-native replacement for Lightning DDP + ``sync_dist=True``
  (SURVEY.md §2.7).
* :func:`shard_catalog` — the keyword catalog's leading (keyword) dim over
  the ``model`` axis: each device scores its keyword shard against the
  replicated utterance; per-keyword probabilities are all-gathered by XLA
  on output.  This is the domain-specific scaling axis (the reference's
  groups-of-100 python loop, cb_whisper.py:110-129) done as collectives.
* :func:`whisper_param_sharding` — tensor-parallel PartitionSpecs for the
  Whisper encoder/decoder (attention heads and MLP hidden over ``model``,
  megatron-style: column-split qkv/fc1, row-split out/fc2), the optional
  scaling lever for whisper-large-v3 (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_train_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Jit a ``step(params, stats, opt_state, batch, rng, beta, supp)`` with
    the batch sharded over ``data`` and every state replicated.

    Placement is jit-managed via ``in_shardings`` — NOT per-call
    ``device_put`` of the param pytree (the "relay pytree rule": re-uploading
    replicated params every step costs a host→device transfer per leaf per
    step through the relay).  The first call places host arrays once;
    outputs come back with the same shardings, so feeding step N's outputs
    to step N+1 moves zero parameter bytes (asserted by
    tests/test_parallel.py::test_dp_train_step_reuses_placements)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, data, repl, repl, repl),
    )


def shard_catalog(catalog_dev: Dict[str, Any], mesh: Mesh, axis: str = "model"):
    """Place the catalog arrays with keywords split over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), catalog_dev)


def _attn_specs(column: P, row: P) -> Dict[str, Any]:
    return {
        "q_proj": {"weight": column, "bias": P("model")},
        "k_proj": {"weight": column},
        "v_proj": {"weight": column, "bias": P("model")},
        "out_proj": {"weight": row, "bias": P()},
    }


def whisper_param_sharding(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree for the Whisper params: megatron TP over the
    ``model`` axis; everything without a rule is replicated."""
    column = P(None, "model")  # [in, out] split over out
    row = P("model", None)  # [in, out] split over in

    def layer_specs(is_decoder: bool) -> Dict[str, Any]:
        specs = {
            "self_attn": _attn_specs(column, row),
            "self_attn_layer_norm": {"weight": P(), "bias": P()},
            "fc1": {"weight": column, "bias": P("model")},
            "fc2": {"weight": row, "bias": P()},
            "final_layer_norm": {"weight": P(), "bias": P()},
        }
        if is_decoder:
            specs["encoder_attn"] = _attn_specs(column, row)
            specs["encoder_attn_layer_norm"] = {"weight": P(), "bias": P()}
        return specs

    def layers_specs(layers, is_decoder: bool):
        if isinstance(layers, dict):
            # stacked (scan) layout: every leaf carries a leading [n_layers]
            # axis that stays unsharded — prepend None to each spec
            return jax.tree.map(
                lambda spec: P(None, *spec),
                layer_specs(is_decoder),
                is_leaf=lambda x: isinstance(x, P),
            )
        return [layer_specs(is_decoder) for _ in layers]

    spec_tree = {
        "encoder": {
            "conv1": {"weight": P(), "bias": P()},
            "conv2": {"weight": P(), "bias": P()},
            "embed_positions": {"weight": P()},
            "layer_norm": {"weight": P(), "bias": P()},
            "layers": layers_specs(params["encoder"]["layers"], False),
        },
        "decoder": {
            "embed_tokens": {"weight": P()},
            "embed_positions": {"weight": P()},
            "layer_norm": {"weight": P(), "bias": P()},
            "layers": layers_specs(params["decoder"]["layers"], True),
        },
    }
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def device_put_with_specs(params: Dict[str, Any], shardings: Dict[str, Any]):
    return jax.tree.map(jax.device_put, params, shardings)
