"""Typed settings tree (reference: internal/conf — viper YAML config,
defaults, validation, env overrides, hot-reload control signals)."""

from birdnet_go_tpu.config.settings import (
    Settings,
    load_settings,
    default_settings,
)
from birdnet_go_tpu.config.control import ControlSignal, ControlBus

__all__ = [
    "Settings",
    "load_settings",
    "default_settings",
    "ControlSignal",
    "ControlBus",
]
