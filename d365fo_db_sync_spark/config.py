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


def obfuscate_secret(plain: str) -> str:
    """Base64 obfuscation of a stored secret — EXPLICITLY obfuscation,
    not security (EncryptionHelper.cs:8-25 carries the same warning):
    it only keeps credentials out of casual view in config files.
    Real deployments should use the cluster's secret manager; this
    exists for config-file parity with the reference."""
    import base64

    if not plain:
        return ""
    return base64.b64encode(plain.encode("utf-8")).decode("ascii")


def deobfuscate_secret(obfuscated: str) -> str:
    """Inverse of :func:`obfuscate_secret`; anything that is not valid
    base64 is passed through unchanged, so legacy plain-text configs
    keep working (EncryptionHelper.cs:30-45)."""
    import base64
    import binascii

    if not obfuscated:
        return ""
    try:
        return base64.b64decode(obfuscated, validate=True).decode("utf-8")
    except (binascii.Error, UnicodeDecodeError, ValueError):
        return obfuscated


_SECTION_RE = re.compile(r"^\[(.+)\]$")


def read_default_sections(path: str) -> dict[str, str]:
    """INI-style ``[Section]`` blocks -> {section: content} —
    case-insensitive section names, leading/trailing blank lines
    stripped, internal blanks preserved (DefaultValuesHelper.cs:16-48;
    the reference seeds system-excluded-table lists from such a file).
    Missing file -> empty dict, like the reference."""
    if not os.path.exists(path):
        return {}

    class _CI(dict):
        def __getitem__(self, k):
            return super().__getitem__(k.lower())

        def __setitem__(self, k, v):
            super().__setitem__(k.lower(), v)

        def __contains__(self, k):
            return super().__contains__(k.lower())

        def get(self, k, default=None):
            return super().get(k.lower(), default)

    def _join(lines: list[str]) -> str:
        start = 0
        while start < len(lines) and not lines[start].strip():
            start += 1
        end = len(lines) - 1
        while end >= start and not lines[end].strip():
            end -= 1
        return "\n".join(lines[start : end + 1])

    sections: dict[str, str] = _CI()
    current: str | None = None
    buf: list[str] = []
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.rstrip("\n").rstrip("\r")
            m = _SECTION_RE.match(line.strip())
            if m:
                if current is not None:
                    sections[current] = _join(buf)
                current = m.group(1)
                buf = []
            elif current is not None:
                buf.append(line.rstrip())
    if current is not None:
        sections[current] = _join(buf)
    return sections


def read_default_section(path: str, name: str) -> str | None:
    """One section's content, or None (DefaultValuesHelper.cs:50-54)."""
    return read_default_sections(path).get(name)
