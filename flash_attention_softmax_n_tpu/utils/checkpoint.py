"""Checkpoint save/restore with surgery metadata.

The reference has no first-party checkpointing; its surgery must re-apply on
every load (``required_on_load()=True``, reference attention_softmax_n.py:
93-95) because monkey-patching is not persistent. Here surgery is part of
the checkpoint itself (SURVEY §5 design): the config — including
``softmax_n`` — is serialized next to the weights, so a restored model is
already soft-maxed-N; re-applying is idempotent.

Uses Orbax for the array tree and JSON for the config/metadata. Quantized
(QTensor) parameter trees round-trip: the pytree is flattened to arrays +
a structure descriptor.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_softmax_n_tpu.models.bert import BertConfig
from flash_attention_softmax_n_tpu.models.decoder import DecoderConfig
from flash_attention_softmax_n_tpu.models.xlnet import XLNetConfig
from flash_attention_softmax_n_tpu.quant.qtensor import QTensor

__all__ = ["save_checkpoint", "load_checkpoint",
           "save_train_checkpoint", "load_train_checkpoint"]

_CONFIG_TYPES = {"DecoderConfig": DecoderConfig, "BertConfig": BertConfig,
                 "XLNetConfig": XLNetConfig}


def _config_to_json(config) -> Dict[str, Any]:
    d = dataclasses.asdict(config)
    for k, v in list(d.items()):
        if isinstance(v, type):  # dtypes
            d[k] = np.dtype(v).name if v is not jnp.bfloat16 else "bfloat16"
        elif hasattr(v, "dtype") or v.__class__.__module__.startswith("jax"):
            d[k] = str(v)
    # jnp dtypes stored as strings
    if "dtype" in d and not isinstance(d["dtype"], str):
        d["dtype"] = jnp.dtype(d["dtype"]).name
    return {"type": type(config).__name__, "fields": d}


def _config_from_json(blob: Dict[str, Any]):
    cls = _CONFIG_TYPES[blob["type"]]
    fields = dict(blob["fields"])
    if "dtype" in fields:
        fields["dtype"] = jnp.dtype(fields["dtype"])
    return cls(**fields)


def _flatten_params(params) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Pytree -> flat {path: array} + structure descriptor (QTensor-aware)."""
    flat = {}
    structure = {}

    def walk(node, path):
        if isinstance(node, QTensor):
            flat[path + "/__values"] = np.asarray(node.values)
            flat[path + "/__scales"] = np.asarray(node.scales)
            structure[path] = {"kind": "qtensor", "bits": node.bits,
                               "packed_axis": node.packed_axis}
        elif isinstance(node, dict):
            structure[path] = {"kind": "dict", "keys": sorted(node.keys())}
            for k in node:
                walk(node[k], f"{path}/{k}" if path else k)
        else:
            flat[path] = np.asarray(node)
            structure[path] = {"kind": "array"}

    walk(params, "")
    return flat, structure


def _unflatten_params(flat: Dict[str, np.ndarray], structure: Dict):
    def build(path):
        desc = structure[path]
        if desc["kind"] == "dict":
            return {k: build(f"{path}/{k}" if path else k)
                    for k in desc["keys"]}
        if desc["kind"] == "qtensor":
            return QTensor(jnp.asarray(flat[path + "/__values"]),
                           jnp.asarray(flat[path + "/__scales"]),
                           bits=desc["bits"],
                           packed_axis=desc["packed_axis"])
        return jnp.asarray(flat[path])

    return build("")


def _save_npz(path: Path, flat: Dict[str, np.ndarray]) -> Dict[str, str]:
    """npz for portability (no orbax version coupling for the array payload;
    bf16/fp8 stored via integer views). Returns the dtype map needed to
    reverse the views on load."""
    arrays = {}
    dtypes = {}
    for k, v in flat.items():
        if v.dtype == jnp.bfloat16:
            arrays[k] = v.view(np.uint16)
            dtypes[k] = "bfloat16"
        elif str(v.dtype) == "float8_e4m3fn":
            arrays[k] = v.view(np.uint8)
            dtypes[k] = "float8_e4m3fn"
        else:
            arrays[k] = v
            dtypes[k] = str(v.dtype)
    np.savez(path, **{k.replace("/", "|"): v for k, v in arrays.items()})
    return dtypes


def _load_npz(path: Path, dtypes: Dict[str, str]) -> Dict[str, np.ndarray]:
    npz = np.load(path)
    flat = {}
    for key in npz.files:
        p = key.replace("|", "/")
        arr = npz[key]
        dt = dtypes[p]
        if dt == "bfloat16":
            arr = arr.view(jnp.bfloat16)
        elif dt == "float8_e4m3fn":
            arr = arr.view(jnp.float8_e4m3fn)
        flat[p] = arr
    return flat


def save_checkpoint(directory: str, config, params,
                    metadata: Dict[str, Any] | None = None) -> Path:
    """Write config + params (+ user metadata) under ``directory``."""
    out = Path(directory)
    out.mkdir(parents=True, exist_ok=True)
    flat, structure = _flatten_params(params)
    dtypes = _save_npz(out / "params.npz", flat)

    blob = {
        "config": _config_to_json(config),
        "structure": structure,
        "dtypes": dtypes,
        "metadata": dict(metadata or {}),
        "format_version": 1,
    }
    with open(out / "checkpoint.json", "w") as f:
        json.dump(blob, f, indent=2)
    return out


def load_checkpoint(directory: str):
    """Returns (config, params, metadata)."""
    out = Path(directory)
    with open(out / "checkpoint.json") as f:
        blob = json.load(f)
    flat = _load_npz(out / "params.npz", blob["dtypes"])
    # JSON round-trips dict keys; restore packed_axis None correctly
    structure = blob["structure"]
    params = _unflatten_params(flat, structure)
    config = _config_from_json(blob["config"])
    return config, params, blob["metadata"]


def save_train_checkpoint(directory: str, config, params, opt_state,
                          step: int = 0,
                          metadata: Dict[str, Any] | None = None) -> Path:
    """Full training checkpoint: config + params + optimizer state + step.

    The optax state is an arbitrary pytree of namedtuples; it is saved as
    positional leaves (host-gathered — sharded/ZeRO-1 states round-trip),
    so restore needs the SAME optimizer to rebuild the structure
    (``load_train_checkpoint(..., optimizer=tx)``). The params checkpoint
    stays independently loadable via plain ``load_checkpoint`` (inference
    never pays for optimizer bytes).
    """
    meta = dict(metadata or {})
    meta["train_step"] = int(step)
    out = save_checkpoint(directory, config, params, metadata=meta)
    leaves = jax.tree_util.tree_leaves(opt_state)
    flat = {f"leaf_{i:05d}": np.asarray(leaf)
            for i, leaf in enumerate(leaves)}
    dtypes = _save_npz(out / "opt_state.npz", flat)
    with open(out / "opt_state.json", "w") as f:
        json.dump({"n_leaves": len(leaves), "dtypes": dtypes}, f)
    return out


def load_train_checkpoint(directory: str, optimizer):
    """Returns (config, params, opt_state, step, metadata).

    ``optimizer`` must be the optax transformation used at save time: its
    ``init(params)`` rebuilds the state STRUCTURE, which is refilled with
    the saved leaves (shape/dtype-checked leaf by leaf).
    """
    config, params, metadata = load_checkpoint(directory)
    out = Path(directory)
    with open(out / "opt_state.json") as f:
        blob = json.load(f)
    flat = _load_npz(out / "opt_state.npz", blob["dtypes"])
    template = optimizer.init(params)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != blob["n_leaves"]:
        raise ValueError(
            f"optimizer structure mismatch: checkpoint has "
            f"{blob['n_leaves']} leaves, optimizer.init gives "
            f"{len(t_leaves)} — pass the optimizer used at save time")
    loaded = []
    for i, tl in enumerate(t_leaves):
        arr = flat[f"leaf_{i:05d}"]
        if tuple(arr.shape) != tuple(np.shape(tl)):
            raise ValueError(
                f"opt-state leaf {i} shape {arr.shape} != expected "
                f"{np.shape(tl)} — optimizer or model changed since save")
        loaded.append(jnp.asarray(arr))
    opt_state = jax.tree_util.tree_unflatten(treedef, loaded)
    return (config, params, opt_state, metadata.get("train_step", 0),
            metadata)
