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

__all__ = ["save_checkpoint", "load_checkpoint"]

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


def save_checkpoint(directory: str, config, params,
                    metadata: Dict[str, Any] | None = None) -> Path:
    """Write config + params (+ user metadata) under ``directory``."""
    out = Path(directory)
    out.mkdir(parents=True, exist_ok=True)
    flat, structure = _flatten_params(params)

    # npz for portability (no orbax version coupling for the array payload;
    # bf16 stored via uint16 view)
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
    np.savez(out / "params.npz", **{k.replace("/", "|"): v
                                    for k, v in arrays.items()})

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
    npz = np.load(out / "params.npz")
    flat = {}
    for key in npz.files:
        path = key.replace("|", "/")
        arr = npz[key]
        dt = blob["dtypes"][path]
        if dt == "bfloat16":
            arr = arr.view(jnp.bfloat16)
        elif dt == "float8_e4m3fn":
            arr = arr.view(jnp.float8_e4m3fn)
        flat[path] = arr
    # JSON round-trips dict keys; restore packed_axis None correctly
    structure = blob["structure"]
    params = _unflatten_params(flat, structure)
    config = _config_from_json(blob["config"])
    return config, params, blob["metadata"]
