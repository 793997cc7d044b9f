"""Self-contained readfish-experiment configuration for the decision loop.

The reference delegates this layer to the external `readfish` package
(readfish._config.Conf, consumed by /root/reference/boss/readfish_boss.py:451,
511-512 and boss/_cli_base.py). This module implements the same protocol —
`regions`, `barcodes`, `get_conditions(channel, barcode)`, `get_region`,
`write_channels_toml(run_dir)` — from the same TOML schema (see
/root/reference/tests/config/BOSS_RUNS_RF.toml), so the BOSS decision loop
runs with or without readfish installed. When readfish exists on the host its
own Conf can be passed anywhere this one is accepted (duck-typed, the method
names match).

Channel assignment: channels 1..N are split into len(regions) contiguous
blocks (readfish splits the physical flowcell grid into columns; the boss
side only consumes the resulting channel *sets* via channels.toml, so any
disjoint equal split is protocol-equivalent).
"""
from __future__ import annotations

import dataclasses
import tomllib
from enum import Enum
from pathlib import Path

from .decision import Decision


class Action(str, Enum):
    unblock = "unblock"
    stop_receiving = "stop_receiving"
    proceed = "proceed"


class Chemistry(str, Enum):
    SIMPLEX = "simplex"
    DUPLEX_SIMPLE = "duplex_simple"
    DUPLEX = "duplex"


#: decision outcomes that a region/barcode condition must map to an action
_DECISION_KEYS = (
    "single_on", "single_off", "multi_on", "multi_off", "no_map", "no_seq",
)


@dataclasses.dataclass
class Condition:
    """One region/barcode block of the readfish TOML: decision -> action."""

    name: str
    control: bool = False
    min_chunks: int = 0
    max_chunks: int = 2
    actions: dict[str, Action] = dataclasses.field(default_factory=dict)
    above_max_chunks: Action = Action.unblock
    below_min_chunks: Action = Action.proceed

    @classmethod
    def from_dict(cls, d: dict) -> "Condition":
        actions = {}
        for key in _DECISION_KEYS:
            if key in d:
                actions[key] = Action(d[key])
        return cls(
            name=d["name"],
            control=bool(d.get("control", False)),
            min_chunks=int(d.get("min_chunks", 0)),
            max_chunks=int(d.get("max_chunks", 2)),
            actions=actions,
            above_max_chunks=Action(d.get("above_max_chunks", "unblock")),
            below_min_chunks=Action(d.get("below_min_chunks", "proceed")),
        )

    def get_action(self, decision: Decision) -> Action:
        """Action for a decision; unmapped decisions proceed (wait for more
        signal), mirroring readfish's default."""
        return self.actions.get(decision.value, Action.proceed)


class RFConf:
    """Parsed readfish TOML: caller/mapper settings + region/barcode plan."""

    def __init__(
        self,
        regions: list[Condition],
        barcodes: dict[str, Condition] | None = None,
        caller_settings: dict | None = None,
        mapper_settings: dict | None = None,
        channel_count: int = 512,
    ):
        if not regions:
            raise ValueError("readfish TOML must define at least one region")
        self.regions = regions
        self.barcodes = barcodes or {}
        self.caller_settings = caller_settings or {}
        self.mapper_settings = mapper_settings or {}
        self.channel_count = channel_count
        # contiguous equal split of channels among regions
        self._channel_region: dict[int, int] = {}
        n = len(regions)
        per = channel_count // n
        for ch in range(1, channel_count + 1):
            self._channel_region[ch] = min((ch - 1) // per, n - 1)

    @classmethod
    def from_file(cls, path: str | Path, channel_count: int = 512) -> "RFConf":
        return cls.from_toml_str(Path(path).read_text(encoding="utf-8"), channel_count)

    @classmethod
    def from_toml_str(cls, text: str, channel_count: int = 512) -> "RFConf":
        d = tomllib.loads(text)
        return cls(
            regions=[Condition.from_dict(r) for r in d.get("regions", [])],
            barcodes={k: Condition.from_dict(v) for k, v in d.get("barcodes", {}).items()},
            caller_settings=d.get("caller_settings", {}),
            mapper_settings=d.get("mapper_settings", {}),
            channel_count=channel_count,
        )

    # ------------------------------------------------------------ protocol --

    def get_region(self, channel: int) -> Condition | None:
        idx = self._channel_region.get(channel)
        return self.regions[idx] if idx is not None else None

    def get_conditions(self, channel: int, barcode: str | None) -> tuple[bool, Condition]:
        """(control, condition) for a read (readfish _config semantics: a
        classified barcode's block overrides the region's)."""
        region = self.get_region(channel)
        control = bool(region.control) if region is not None else False
        if barcode is not None and barcode in self.barcodes:
            return control, self.barcodes[barcode]
        if region is None:
            # unknown channel: fail open with the first non-control region
            for r in self.regions:
                if not r.control:
                    return False, r
            return True, self.regions[0]
        return control, region

    def write_channels_toml(self, run_dir: str | Path) -> Path:
        """Write the channel->region map the BOSS process polls for
        (readfish_boss.py:451 -> boss/live.py:96-154)."""
        out = Path(run_dir) / "channels.toml"
        lines = [
            "# This file is written as part of BOSS* and details the channel "
            "assignments of regions on the flowcell\n"
        ]
        for i, region in enumerate(self.regions, start=1):
            channels = sorted(
                ch for ch, idx in self._channel_region.items()
                if self.regions[idx] is region
            )
            lines.append(f"[conditions.{i}]")
            lines.append(f'name = "{region.name}"')
            lines.append(f"channels = {channels}")
            lines.append("")
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = out.with_suffix(".toml_tmp")
        tmp.write_text("\n".join(lines), encoding="utf-8")
        tmp.rename(out)
        return out
