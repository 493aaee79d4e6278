"""Config system: JSON configs with dotted-key access and CLI overrides.

TPU-native counterpart of the reference's two config generations
(reference: tools/configer.py:20-298 `Configer`, and configs/__init__.py
`set_cfg_from_file` python-dict configs). One class serves both roles: it
loads either a JSON file or a python dict and exposes `get / exists / add /
update / plus_one` plus dotted-key CLI overrides parsed with
`ast.literal_eval` (reference: tools/configer.py:58-145).
"""

from __future__ import annotations

import ast
import copy
import importlib.util
import json
import os
from typing import Any, Dict, List, Optional, Sequence


def _literal(value: str) -> Any:
    """Parse a CLI override value like the reference's literal_eval path."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


class Configer:
    """Nested-dict config with the reference Configer's API surface.

    `get('lr', 'max_iter')` walks nested keys; `get('n_datasets')` reads a
    top-level key. Missing keys return None from `get` (the reference raises
    for some paths and returns None for others; we return None and offer
    `get_strict` for the raising behavior).
    """

    def __init__(
        self,
        config_file: Optional[str] = None,
        configs: Optional[Dict[str, Any]] = None,
        args_parser: Optional[Sequence[str]] = None,
    ):
        if config_file is not None:
            self.params_root = self._load_file(config_file)
        elif configs is not None:
            self.params_root = copy.deepcopy(configs)
        else:
            self.params_root = {}
        if args_parser:
            self.apply_overrides(args_parser)

    # -- loading ---------------------------------------------------------
    @staticmethod
    def _load_file(path: str) -> Dict[str, Any]:
        if path.endswith(".json"):
            with open(path, "r") as f:
                return json.load(f)
        if path.endswith(".py"):
            # python-dict config generation (reference: configs/__init__.py):
            # the module must expose a dict named `cfg`.
            spec = importlib.util.spec_from_file_location(
                "cfg_mod_" + os.path.basename(path)[:-3], path
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)  # type: ignore[union-attr]
            if hasattr(mod, "cfg"):
                return dict(mod.cfg)
            raise ValueError(f"python config {path} must define a dict `cfg`")
        raise ValueError(f"unsupported config file type: {path}")

    # -- core API ---------------------------------------------------------
    def get(self, *keys: str, default: Any = None) -> Any:
        node: Any = self.params_root
        for k in keys:
            if not isinstance(node, dict) or k not in node:
                return default
            node = node[k]
        return node

    def get_strict(self, *keys: str) -> Any:
        sentinel = object()
        v = self.get(*keys, default=sentinel)
        if v is sentinel:
            raise KeyError(f"config key not found: {'.'.join(keys)}")
        return v

    def exists(self, *keys: str) -> bool:
        sentinel = object()
        return self.get(*keys, default=sentinel) is not sentinel

    def add(self, keys, value: Any) -> None:
        if isinstance(keys, str):
            keys = [keys]
        node = self.params_root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        if keys[-1] in node:
            raise KeyError(f"key already exists: {'.'.join(keys)}")
        node[keys[-1]] = value

    def update(self, keys, value: Any) -> None:
        if isinstance(keys, str):
            keys = [keys]
        node = self.params_root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def set(self, keys, value: Any) -> None:
        """add-or-update."""
        if isinstance(keys, str):
            keys = [keys]
        self.update(list(keys), value)

    def plus_one(self, *keys: str) -> int:
        """Increment an integer counter in the config (the reference keeps the
        training iteration inside the configer; tools/configer.py:224)."""
        v = self.get(*keys, default=0) or 0
        self.update(list(keys), v + 1)
        return v + 1

    # -- CLI overrides -----------------------------------------------------
    def apply_overrides(self, remain: Sequence[str]) -> None:
        """Apply `a.b.c value` or `a.b.c=value` dotted-key overrides."""
        toks: List[str] = []
        for t in remain:
            if "=" in t and not t.startswith("-"):
                toks.extend(t.split("=", 1))
            else:
                toks.append(t.lstrip("-"))
        if len(toks) % 2 != 0:
            raise ValueError(f"odd number of override tokens: {toks}")
        for key, val in zip(toks[::2], toks[1::2]):
            self.update(key.split("."), _literal(val))

    # -- convenience --------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self.params_root)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.params_root, f, indent=2)

    def clone(self) -> "Configer":
        return Configer(configs=self.params_root)

    # dataset helpers used throughout (reference json schema: top-level
    # `n_datasets` and `dataset{i}` objects; configs/ltbgnn_7_datasets_snp.json)
    @property
    def n_datasets(self) -> int:
        return int(self.get("n_datasets", default=1))

    def dataset_cfg(self, i: int) -> Dict[str, Any]:
        """1-indexed like the reference's `dataset1..datasetN` keys."""
        d = self.get(f"dataset{i + 1}")
        if d is None:
            raise KeyError(f"dataset{i + 1} not in config")
        return d

    def n_cats(self, i: int) -> int:
        return int(self.dataset_cfg(i)["n_cats"])

    @property
    def conditions(self) -> "_ConditionHelper":
        return _ConditionHelper(self)

    def __repr__(self) -> str:
        return f"Configer({json.dumps(self.params_root)[:200]}…)"


class _ConditionHelper:
    """Config predicate helper (reference: tools/configer.py:243-298,
    exposed as `configer.conditions`)."""

    def __init__(self, configer: Configer):
        self.configer = configer

    @property
    def use_multi_dataset(self) -> bool:
        # our schema: top-level n_datasets (the reference's data.data_dir
        # list predicate plays the same role)
        return self.configer.n_datasets > 1

    @property
    def pred_sw_offset(self) -> bool:
        return self.configer.exists("data", "pred_sw_offset")

    @property
    def pred_dt_offset(self) -> bool:
        return self.configer.exists("data", "pred_dt_offset")

    @property
    def use_sw_offset(self) -> bool:
        return self.configer.exists("data", "use_sw_offset")

    @property
    def use_dt_offset(self) -> bool:
        return self.configer.exists("data", "use_dt_offset")

    @property
    def use_ground_truth(self) -> bool:
        return self.config_equals(("use_ground_truth",), True)

    @property
    def pred_ml_dt_offset(self) -> bool:
        return self.configer.exists("data", "pred_ml_dt_offset")

    def loss_contains(self, name: str) -> bool:
        return name in (self.configer.get("loss", "type", default="") or "")

    def model_contains(self, name: str) -> bool:
        return name in (self.configer.get("model_name", default="") or "")

    def config_equals(self, key: Sequence[str], value: Any) -> bool:
        if not self.configer.exists(*key):
            return False
        return self.configer.get(*key) == value

    def config_exists(self, key: Sequence[str]) -> bool:
        return self.configer.exists(*key)

    def environ_exists(self, key: str) -> bool:
        return os.environ.get(key) is not None


def set_cfg_from_file(path: str) -> Configer:
    """Reference-parity alias (configs/__init__.py:set_cfg_from_file)."""
    return Configer(config_file=path)
