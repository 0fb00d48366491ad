"""Chain-free pallet equivalent (extrinsics, events, errors, verifier)."""

from .chain import InfimumPallet, PalletError, Error, Event, RuntimeConfig

__all__ = ["InfimumPallet", "PalletError", "Error", "Event", "RuntimeConfig"]
