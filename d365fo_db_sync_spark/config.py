"""Engine configuration profiles (S12).

The reference persists named JSON profiles with a last-used pointer and
validated profile names (Helpers/ConfigManager.cs:46-180, name rule
:185-191). Same mechanics here, minus secret obfuscation — credentials
belong in the cluster's secret manager, not in engine config files.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field


@dataclass
class EngineConfig:
    """The engine's knob surface (Models/AppConfiguration.cs:3-89)."""

    default_record_count: int = 10_000
    parallel_workers: int = 10
    truncate_threshold_percent: float = 40.0
    sequence_gap: int = 10_000
    include_patterns: list[str] = field(default_factory=lambda: ["*"])
    exclude_patterns: list[str] = field(default_factory=list)
    excluded_fields: list[str] = field(default_factory=list)
    strategy_text: str = ""
    key_column: str = "RecId"
    version_column: str = "SysRowVersion"


_NAME_RE = re.compile(r"^[A-Za-z0-9_-]+$")


class ConfigStore:
    """Named profiles in one JSON file + last-used pointer."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._data: dict = {"profiles": {}, "last_used": None}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                self._data = json.load(f)

    @staticmethod
    def is_valid_name(name: str) -> bool:
        """Alnum + underscore + dash only (ConfigManager.cs:185-191)."""
        return bool(_NAME_RE.fullmatch(name))

    def save(self, name: str, config: EngineConfig) -> None:
        if not self.is_valid_name(name):
            raise ValueError(f"invalid profile name: {name!r}")
        self._data["profiles"][name] = asdict(config)
        self._data["last_used"] = name
        self._flush()

    def load(self, name: str | None = None) -> EngineConfig:
        name = name or self._data.get("last_used")
        if name is None or name not in self._data["profiles"]:
            raise KeyError(f"no such profile: {name!r}")
        self._data["last_used"] = name
        self._flush()
        return EngineConfig(**self._data["profiles"][name])

    def names(self) -> list[str]:
        return sorted(self._data["profiles"])

    def _flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self._data, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)  # atomic, like the state store
