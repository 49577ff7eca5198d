"""Surgery policy registry: architecture -> checkpoint-rewrite function.

Re-designs the reference's ``PolicyRegistry``
(surgery/surgery_functions/utils.py:12-97). The reference maps *torch module
classes* to functions that mutate live module objects; TPU-natively, surgery
is a **pure rewrite of (config, params)** — no live-object monkey-patching —
so the registry maps *architecture keys* (our config dataclass types, or HF
``model_type`` strings like 'bert') to converter functions.

The reference's defensive signature validation is kept (utils.py:63-84):
a converter must take exactly three parameters, the third named
``softmax_n_param`` and annotated ``float``; duplicate registration and
non-architecture keys are rejected.
"""

from __future__ import annotations

import inspect
import logging
from typing import Callable, Dict, Tuple, Type, Union

log = logging.getLogger(__name__)

__all__ = ["PolicyRegistry", "policy_registry", "SurgeryFn"]

# converter: (config, params, softmax_n_param) -> (config, params)
SurgeryFn = Callable[[object, dict, float], Tuple[object, dict]]

ArchKey = Union[str, Type]


class PolicyRegistry(Dict[ArchKey, SurgeryFn]):
    """Dict of architecture key -> rewrite function, with validation."""

    def register(self, *keys: ArchKey) -> Callable[[SurgeryFn], SurgeryFn]:
        """Decorator: register a converter for one or more architectures.

        Keys may be config dataclass types (e.g. ``BertConfig``) or HF
        ``model_type`` strings (e.g. ``'bert'``, ``'roberta'``).
        """
        if not keys:
            raise ValueError("register requires at least one architecture key")

        def wrapper(fn: SurgeryFn) -> SurgeryFn:
            self._validate_signature(fn)
            for key in keys:
                self._validate_key(key)
                if key in self:
                    raise ValueError(
                        f"architecture {key!r} already has a registered converter"
                    )
                self[key] = fn
            return fn

        return wrapper

    @staticmethod
    def _validate_key(key: ArchKey) -> None:
        if isinstance(key, str):
            if not key:
                raise ValueError("architecture string key must be non-empty")
            return
        if isinstance(key, type):
            return
        raise TypeError(
            f"architecture key must be a config type or model_type string, "
            f"got {key!r}"
        )

    @staticmethod
    def _validate_signature(fn: SurgeryFn) -> None:
        sig = inspect.signature(fn)
        params = list(sig.parameters.values())
        if len(params) != 3:
            raise TypeError(
                f"converter {fn.__name__} must take exactly (config, params, "
                f"softmax_n_param), got {len(params)} parameters"
            )
        third = params[2]
        if third.name != "softmax_n_param":
            raise TypeError(
                f"converter {fn.__name__}'s third parameter must be named "
                f"'softmax_n_param', got {third.name!r}"
            )
        # annotation may be the type or its string form (PEP 563)
        if third.annotation not in (float, "float", inspect.Parameter.empty):
            raise TypeError(
                f"converter {fn.__name__}'s softmax_n_param must be annotated "
                f"float, got {third.annotation!r}"
            )

    def lookup(self, config) -> Union[SurgeryFn, None]:
        """Find a converter for a config object (by type, then model_type)."""
        fn = self.get(type(config))
        if fn is not None:
            return fn
        model_type = getattr(config, "model_type", None)
        if model_type is not None:
            return self.get(str(model_type))
        return None


# Module-level singleton (reference utils.py:97).
policy_registry = PolicyRegistry()
