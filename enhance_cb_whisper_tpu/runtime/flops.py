"""Static FLOP accounting from jaxprs, for honest MFU numbers.

XLA's ``Compiled.cost_analysis()`` counts the body of a ``while``/``scan``
loop ONCE regardless of trip count, so any program built around
``lax.map``-chunked scoring (the catalog scorers) under-reports FLOPs by the
chunk count — round-2 bench.py published 2.9% MFU for a program that
profiler traces show running at >40% MFU.  This module counts matmul/conv
FLOPs by walking the jaxpr instead: ``scan`` bodies are multiplied by their
static ``length``, nested calls are recursed into.

Only MXU work (dot_general / conv_general_dilated) is counted — the same
convention as XLA's "flops" key and the standard MFU definition.
"""

from __future__ import annotations

import math

import jax


def _dot_general_flops(eqn) -> float:
    (lhs_contract, _), (lhs_batch, _) = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    batch = math.prod(lhs.shape[d] for d in lhs_batch)
    contract = math.prod(lhs.shape[d] for d in lhs_contract)
    lhs_free = math.prod(lhs.shape) // max(batch * contract, 1)
    rhs_free = math.prod(rhs.shape) // max(batch * contract, 1)
    return 2.0 * batch * contract * lhs_free * rhs_free


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    kernel_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    in_ch = rhs.shape[dn.rhs_spec[1]]  # per feature group
    groups = eqn.params.get("batch_group_count", 1)
    return 2.0 * math.prod(out.shape) * kernel_spatial * in_ch * max(groups, 1)


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # no static trip count: count the body once (lower bound), like XLA
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(
                (_jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]), default=0.0
            )
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    total += _jaxpr_flops(
                        inner.jaxpr if hasattr(inner, "jaxpr") else inner
                    )
                    break
    return total


def estimate_flops(fn, *args, **kwargs) -> float:
    """Matmul+conv FLOPs of one call of ``fn(*args, **kwargs)`` (static count
    from the jaxpr; ``lax.scan``/``lax.map`` bodies multiplied by their trip
    count — unlike XLA cost analysis, which counts them once)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(closed.jaxpr)


def device_peak_flops(dtype: str = "bfloat16") -> float:
    """Per-chip peak for the current backend (v5e default; override with
    ECW_PEAK_TFLOPS)."""
    import os

    peak_tf = float(os.environ.get("ECW_PEAK_TFLOPS", "0")) or None
    if peak_tf is None:
        # TPU v5e: 394 TOPS int8 / 197 TFLOP/s bf16; fp32 via bf16 passes
        peak_tf = {"int8": 394.0, "bfloat16": 197.0}.get(dtype, 49.0)
    return peak_tf * 1e12


__all__ = ["estimate_flops", "device_peak_flops"]
