"""YACS-style configuration tree with attribute access.

Fresh implementation of the config surface the reference uses
(``nerf-pytorch/nerf/cfgnode.py``): ``CfgNode(dict)`` wrapping nested YAML
with dot access, ``dump()``, ``merge_from_file`` / ``merge_from_other_cfg`` /
``merge_from_list``, ``freeze``/``defrost``, a deprecated/renamed key
registry, and loading configs from YAML files or Python source modules.

The entry scripts only need construction + attribute reads + ``dump()``
(SURVEY.md §1), but the full merge/freeze API is provided for parity.
"""

from __future__ import annotations

import copy
import importlib.util
from ast import literal_eval
from typing import Any, Dict, List, Optional

import yaml

_VALID_TYPES = {tuple, list, str, int, float, bool, type(None)}


class CfgNode(dict):
    """A dict subclass whose items are also attributes, recursively."""

    IMMUTABLE = "__immutable__"
    DEPRECATED_KEYS = "__deprecated_keys__"
    RENAMED_KEYS = "__renamed_keys__"

    def __init__(
        self,
        init_dict: Optional[Dict] = None,
        key_list: Optional[List[str]] = None,
    ):
        init_dict = {} if init_dict is None else init_dict
        key_list = [] if key_list is None else key_list
        init_dict = self._create_config_tree_from_dict(init_dict, key_list)
        super().__init__(init_dict)
        self.__dict__[CfgNode.IMMUTABLE] = False
        self.__dict__[CfgNode.DEPRECATED_KEYS] = set()
        self.__dict__[CfgNode.RENAMED_KEYS] = {}

    @classmethod
    def _create_config_tree_from_dict(cls, dic: Dict, key_list: List[str]) -> Dict:
        dic = copy.deepcopy(dic)
        for k, v in dic.items():
            if isinstance(v, dict):
                dic[k] = cls(v, key_list=key_list + [str(k)])
            else:
                _assert_valid_type(v, key_list + [str(k)])
        return dic

    # -- attribute protocol -------------------------------------------------

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"attempted to set {name} on an immutable CfgNode"
            )
        _assert_valid_type(value, [name])
        self[name] = value

    def __str__(self) -> str:
        def indent(text, num_spaces=2):
            lines = text.split("\n")
            return "\n".join(
                (" " * num_spaces + line) if i else line
                for i, line in enumerate(lines)
            )

        parts = []
        for k, v in sorted(self.items()):
            if isinstance(v, CfgNode):
                parts.append(f"{k}:\n{indent(str(v))}")
            else:
                parts.append(f"{k}: {v}")
        return "\n".join(parts)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({super().__repr__()})"

    # -- serialization ------------------------------------------------------

    def dump(self, **kwargs) -> str:
        """YAML string of the (plain-dict) config tree."""

        def to_dict(node):
            if isinstance(node, CfgNode):
                return {k: to_dict(v) for k, v in node.items()}
            return node

        return yaml.safe_dump(to_dict(self), **kwargs)

    # -- merging ------------------------------------------------------------

    def merge_from_file(self, cfg_filename: str) -> None:
        with open(cfg_filename, "r") as f:
            cfg = self.load_cfg(f)
        self.merge_from_other_cfg(cfg)

    def merge_from_other_cfg(self, cfg_other: "CfgNode") -> None:
        _merge_a_into_b(cfg_other, self, self, [])

    def merge_from_list(self, cfg_list: List[Any]) -> None:
        """Merge dotted-key/value pairs, e.g. ``["optimizer.lr", 1e-4]``."""
        if len(cfg_list) % 2 != 0:
            raise ValueError("merge_from_list expects [key, value, ...] pairs")
        root = self
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if root.key_is_deprecated(full_key):
                continue
            if root.key_is_renamed(full_key):
                root.raise_key_rename_error(full_key)
            key_parts = full_key.split(".")
            d = self
            for sub in key_parts[:-1]:
                if sub not in d:
                    raise KeyError(f"non-existent key: {full_key}")
                d = d[sub]
            sub = key_parts[-1]
            if sub not in d:
                raise KeyError(f"non-existent key: {full_key}")
            value = _decode_cfg_value(v)
            value = _check_and_coerce_cfg_value_type(value, d[sub], sub, full_key)
            d[sub] = value

    # -- immutability -------------------------------------------------------

    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def _set_immutable(self, value: bool) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = value
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(value)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    # -- deprecated / renamed keys ------------------------------------------

    def register_deprecated_key(self, key: str) -> None:
        self.__dict__[CfgNode.DEPRECATED_KEYS].add(key)

    def register_renamed_key(
        self, old_name: str, new_name: str, message: Optional[str] = None
    ) -> None:
        value = (new_name, message) if message else new_name
        self.__dict__[CfgNode.RENAMED_KEYS][old_name] = value

    def key_is_deprecated(self, full_key: str) -> bool:
        return full_key in self.__dict__[CfgNode.DEPRECATED_KEYS]

    def key_is_renamed(self, full_key: str) -> bool:
        return full_key in self.__dict__[CfgNode.RENAMED_KEYS]

    def raise_key_rename_error(self, full_key: str) -> None:
        new_key = self.__dict__[CfgNode.RENAMED_KEYS][full_key]
        msg = ""
        if isinstance(new_key, tuple):
            new_key, msg = new_key[0], f" Note: {new_key[1]}"
        raise KeyError(
            f"key {full_key} was renamed to {new_key}.{msg}"
        )

    # -- loading ------------------------------------------------------------

    @classmethod
    def load_cfg(cls, cfg_file_obj_or_str) -> "CfgNode":
        """Load from a YAML string, a file object (.yaml/.yml), or a .py
        module path defining a dict named ``cfg`` (or module-level keys)."""
        if isinstance(cfg_file_obj_or_str, str):
            return cls(yaml.safe_load(cfg_file_obj_or_str) or {})
        name = getattr(cfg_file_obj_or_str, "name", "")
        if name.endswith(".py"):
            return cls._load_cfg_py_source(name)
        return cls(yaml.safe_load(cfg_file_obj_or_str) or {})

    @classmethod
    def _load_cfg_py_source(cls, filename: str) -> "CfgNode":
        spec = importlib.util.spec_from_file_location("_dexnerf_cfg_module", filename)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        if hasattr(module, "cfg"):
            return cls(dict(module.cfg))
        attrs = {
            k: v
            for k, v in vars(module).items()
            if not k.startswith("_")
            and (type(v) in _VALID_TYPES or isinstance(v, dict))
        }
        return cls(attrs)


def _assert_valid_type(value: Any, key_list: List[str]) -> None:
    if type(value) not in _VALID_TYPES and not isinstance(value, CfgNode):
        raise ValueError(
            f"invalid config value type {type(value)} for key "
            f"{'.'.join(key_list)}"
        )


def _merge_a_into_b(a: CfgNode, b: CfgNode, root: CfgNode, key_list: List[str]) -> None:
    for k, v_ in a.items():
        full_key = ".".join(key_list + [str(k)])
        v = copy.deepcopy(v_)
        v = _decode_cfg_value(v)
        if k in b:
            v = _check_and_coerce_cfg_value_type(v, b[k], k, full_key)
            if isinstance(v, CfgNode):
                _merge_a_into_b(v, b[k], root, key_list + [str(k)])
            else:
                b[k] = v
        elif root.key_is_deprecated(full_key):
            continue
        elif root.key_is_renamed(full_key):
            root.raise_key_rename_error(full_key)
        else:
            b[k] = v


def _decode_cfg_value(value: Any) -> Any:
    """Strings that parse as Python literals become those literals."""
    if isinstance(value, dict):
        return CfgNode(value)
    if not isinstance(value, str):
        return value
    try:
        return literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _check_and_coerce_cfg_value_type(replacement, original, key, full_key):
    original_type = type(original)
    replacement_type = type(replacement)
    if replacement_type == original_type or original is None or replacement is None:
        return replacement
    # allowed coercions
    casts = [(tuple, list), (list, tuple), (int, float)]
    for src, dst in casts:
        if replacement_type == src and original_type == dst:
            return dst(replacement)
    raise ValueError(
        f"type mismatch ({replacement_type} vs {original_type}) for key {full_key}"
    )
